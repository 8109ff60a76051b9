package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{dsum, ts}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of the stock-SQL surface (SURVEY.md §2.2): cube and
  * grouping sets, pivot, generate/explode, correlated subqueries through
  * the SQL entry point, and semi-structured JSON extraction. */
object Relational2 {

  /** Typed row for the q61 Dataset pipeline. */
  final case class Doc(doc_id: Long, lang: String, source: String, n_chars: Long)

  val defs: Seq[QueryDef] = Seq(

    // ---- q61: typed Dataset API (case-class Encoder + groupByKey) -------
    // The Dataset[T] surface: case-class encoder, typed lambda filter,
    // groupByKey on a tuple key, TypedColumn aggregates. (A lambda filter
    // deliberately trades pushdown for compile-time types — the point of
    // the typed API; keep scans declarative when types aren't needed.)
    QueryDef(
      "q61_typed_dataset",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val ds = t.documents
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .as[Doc]
        ds.filter((d: Doc) => d.n_chars >= 200 && d.lang != "de")
          .groupByKey((d: Doc) => (d.lang, d.source))
          .agg(
            count(lit(1)).as[Long],
            sum(col("n_chars")).as[Long],
            max(col("doc_id")).as[Long])
          .toDF("key", "n", "chars", "max_id")
          .select(col("key._1").as("lang"), col("key._2").as("source"),
            col("n"), col("chars"), col("max_id"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT lang, source, COUNT(*) AS n,
        CAST(SUM(n_chars) AS BIGINT) AS chars, MAX(doc_id) AS max_id
        FROM documents WHERE n_chars >= 200 AND lang <> 'de'
        GROUP BY lang, source ORDER BY lang, source""")),

    // ---- q34: CUBE over two dimensions -----------------------------------
    QueryDef(
      "q34_cube",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 4).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ---- q35: pivot (wide conditional aggregation) -----------------------
    QueryDef(
      "q35_pivot",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(col("l_quantity")))
          .withColumnRenamed("A", "qty_a")
          .withColumnRenamed("N", "qty_n")
          .withColumnRenamed("R", "qty_r")
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
        SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_a,
        SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qty_n,
        SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qty_r
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- q36: generate/explode — token frequencies -----------------------
    QueryDef(
      "q36_explode_tokens",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("token"))
          .limit(20)
      },
      Some("""SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 20""")),

    // ---- q37: GROUPING SETS with grouping() disambiguation ---------------
    QueryDef(
      "q37_grouping_sets",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents.createOrReplaceTempView("graft_docs_gs")
        s.sql("""
          SELECT lang, source, CAST(grouping(lang) AS BIGINT) AS g_lang,
                 CAST(grouping(source) AS BIGINT) AS g_source, COUNT(*) AS n
          FROM graft_docs_gs
          GROUP BY GROUPING SETS ((lang), (source), ())
          ORDER BY g_lang, g_source, lang ASC NULLS FIRST, source ASC NULLS FIRST""")
      },
      Some("""SELECT lang, source, CAST(GROUPING(lang) AS BIGINT) AS g_lang,
        CAST(GROUPING(source) AS BIGINT) AS g_source, COUNT(*) AS n
        FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
        ORDER BY g_lang, g_source, lang ASC NULLS FIRST, source ASC NULLS FIRST""")),

    // ---- q38: correlated EXISTS / NOT EXISTS through SQL -----------------
    QueryDef(
      "q38_correlated_subqueries",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.createOrReplaceTempView("graft_orders_sq")
        t.lineitem.createOrReplaceTempView("graft_lineitem_sq")
        s.sql("""
          SELECT o_orderstatus, COUNT(*) AS n
          FROM graft_orders_sq
          WHERE EXISTS (SELECT 1 FROM graft_lineitem_sq
                        WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
            AND NOT EXISTS (SELECT 1 FROM graft_lineitem_sq
                            WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
          GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
          AND NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- q43: window-function battery — ntile / lead / lag / first_value -
    QueryDef(
      "q43_window_battery",
      (s, dir) => {
        val t = Tables(s, dir)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t.orders
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("prev_key", lag(col("o_orderkey"), 1).over(w))
          .withColumn("cheapest",
            first(col("o_orderkey")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"), col("quartile"),
            col("next_price"), col("prev_key"), col("cheapest"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, quartile, next_price, prev_key, cheapest
        FROM (
          SELECT o_orderkey, o_orderstatus,
            NTILE(4) OVER w AS quartile,
            LEAD(o_totalprice, 1) OVER w AS next_price,
            LAG(o_orderkey, 1) OVER w AS prev_key,
            FIRST_VALUE(o_orderkey) OVER
              (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cheapest
          FROM orders
          WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey))
        WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""")),

    // ---- q44: date-part extraction and date arithmetic -------------------
    QueryDef(
      "q44_date_parts",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .groupBy(
            year(col("o_orderdate")).cast("long").as("y"),
            quarter(col("o_orderdate")).cast("long").as("q"))
          .agg(count(lit(1)).as("n"),
            countDistinct(month(col("o_orderdate"))).as("months"),
            max(dayofmonth(col("o_orderdate"))).cast("long").as("max_dom"))
          .orderBy(col("y"), col("q"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
        COUNT(*) AS n,
        CAST(COUNT(DISTINCT EXTRACT(month FROM o_orderdate)) AS BIGINT) AS months,
        CAST(MAX(EXTRACT(day FROM o_orderdate)) AS BIGINT) AS max_dom
        FROM orders GROUP BY 1, 2 ORDER BY y, q""")),

    // ---- q46: RANGE-frame window — trailing-hour per-user activity -------
    QueryDef(
      "q46_range_frame",
      (s, dir) => {
        val t = Tables(s, dir)
        import org.apache.spark.sql.expressions.Window
        val hourNs = 3600L * 1000000000L
        // RANGE frame needs a numeric order key → the normalized ts_ns
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
          .rangeBetween(-hourNs, 0)
        t.events
          .withColumn("hr_events", count(lit(1)).over(w))
          .withColumn("hr_value",
            sum(col("value").cast("decimal(18,4)")).over(w).cast("double"))
          .filter(col("event_id") % 25 === 0)
          .select(col("event_id"), col("user_id"), col("hr_events"), col("hr_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, hr_events, hr_value FROM (
          SELECT event_id, user_id,
            COUNT(*) OVER w AS hr_events,
            CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS hr_value
          FROM (SELECT event_id, user_id, epoch_ns(ts) AS tns, value FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY tns
                       RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW))
        WHERE event_id % 25 = 0 ORDER BY event_id""")),

    // ---- q52: native session_window aggregation (gap-merged sessions) ----
    // Spark's session_window operator (the batch form of streaming session
    // windows); the oracle rebuilds sessions with the lag/cumsum idiom —
    // two independent formulations must agree on every session boundary.
    QueryDef(
      "q52_session_window",
      (s, dir) => {
        val t = Tables(s, dir)
        // `ts` is TIMESTAMP_NTZ via Tables.normalizeEventTime
        t.events.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value"), 4).as("total_value"))
          .select(col("user_id"),
            date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_start"),
            col("n_events"), col("total_value"))
          .orderBy(col("user_id"), col("sess_start"))
      },
      Some("""WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS tus, value,
            CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL
                   OR epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 1800000000000
                 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
        sess AS (
          SELECT user_id, tus, value,
            SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM e)
        SELECT user_id,
          strftime(MIN(tus), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""")),

    // ---- q53: rank / dense_rank / percent_rank / cume_dist ---------------
    // percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are exact
    // integer ratios — deterministic doubles on both engines.
    QueryDef(
      "q53_rank_functions",
      (s, dir) => {
        val t = Tables(s, dir)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
        t.customer
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("prank", percent_rank().over(w))
          .withColumn("cdist", cume_dist().over(w))
          .filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), col("c_mktsegment"), col("rnk"),
            col("drnk"), col("prank"), col("cdist"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment, rnk, drnk, prank, cdist FROM (
          SELECT c_custkey, c_mktsegment,
            RANK() OVER w AS rnk,
            DENSE_RANK() OVER w AS drnk,
            PERCENT_RANK() OVER w AS prank,
            CUME_DIST() OVER w AS cdist
          FROM customer
          WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal))
        WHERE c_custkey % 7 = 0 ORDER BY c_custkey""")),

    // ---- q54: scalar-function battery (string + exact math) --------------
    // Functions restricted to those with bit-identical semantics across
    // engines: string ops, abs/ceil/floor/sign/mod, and sqrt (IEEE
    // correctly-rounded everywhere); transcendentals (log/exp/pow) are
    // deliberately excluded — they are not correctly-rounded and differ
    // in final ulps between libm implementations.
    QueryDef(
      "q54_scalar_battery",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up"),
            reverse(col("p_type")).as("rev"),
            substring(col("p_name"), 2, 5).as("sub"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("novowel"),
            concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
            length(col("p_name")).cast("long").as("len"),
            abs(col("p_retailprice") - 1000.0).as("absdiff"),
            ceil(col("p_retailprice")).cast("long").as("ceilp"),
            floor(col("p_retailprice") / 10.0).cast("long").as("floorp"),
            (col("p_size") % 7).cast("long").as("modp"),
            sqrt(col("p_size").cast("double")).as("sq"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
        upper(p_name) AS up,
        reverse(p_type) AS rev,
        substr(p_name, 2, 5) AS sub,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowel,
        concat_ws('|', p_brand, p_type) AS cat,
        CAST(length(p_name) AS BIGINT) AS len,
        abs(p_retailprice - 1000.0) AS absdiff,
        CAST(ceil(p_retailprice) AS BIGINT) AS ceilp,
        CAST(floor(p_retailprice / 10.0) AS BIGINT) AS floorp,
        CAST(p_size % 7 AS BIGINT) AS modp,
        sqrt(CAST(p_size AS DOUBLE)) AS sq
        FROM part ORDER BY p_partkey""")),

    // ---- q39: semi-structured JSON extraction from event props -----------
    QueryDef(
      "q39_json_extract",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy((col("k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
          .orderBy(col("k_mod"))
      },
      Some("""SELECT CAST(k % 10 AS BIGINT) AS k_mod, COUNT(*) AS n,
        CAST(MAX(k) AS BIGINT) AS max_k
        FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        GROUP BY k % 10 ORDER BY k_mod""")),

    // ---- q110: binned range join (point-in-interval at scale) ------------
    // "How many lineitems were ordered-but-not-yet-shipped on each probe
    // date?" — each lineitem carries a fulfillment interval
    // [o_orderdate, l_shipdate]; a bare BETWEEN join is
    // BroadcastNestedLoop/cartesian (the 100 TB cliff). RangeJoin grids the
    // date axis (binWidth=64 days ≈ the typical transit time): intervals
    // explode to covered bins, each probe date maps to ONE bin, and the
    // plan becomes a plain shuffled equi-join + residual filter. DuckDB
    // verifies with the naive BETWEEN join.
    QueryDef(
      "q110_range_join",
      (s, dir) => {
        val t = Tables(s, dir)
        val epoch = lit("1970-01-01").cast("date")
        val iv = t.lineitem
          .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
          .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(
            datediff(col("o_orderdate").cast("date"), epoch).as("lo"),
            datediff(col("l_shipdate").cast("date"), epoch).as("hi"),
            col("l_quantity"))
        val probes = t.orders
          .filter(col("o_orderdate") >= ts("1995-03-01") &&
            col("o_orderdate") < ts("1995-03-11"))
          .select(col("o_orderdate").cast("date").as("probe_date"))
          .distinct()
          .withColumn("p", datediff(col("probe_date"), epoch))
        graft.plans.RangeJoin.pointInInterval(probes, "p", iv, "lo", "hi", 64L)
          .groupBy(col("probe_date"))
          .agg(count(lit(1)).as("n_open"), dsum(col("l_quantity")).as("open_qty"))
          .orderBy(col("probe_date"))
      },
      Some("""SELECT p.probe_date, COUNT(*) AS n_open,
        CAST(SUM(CAST(iv.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS open_qty
        FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS probe_date FROM orders
              WHERE o_orderdate >= TIMESTAMP '1995-03-01'
                AND o_orderdate < TIMESTAMP '1995-03-11') p
        JOIN (SELECT CAST(o.o_orderdate AS DATE) AS lo,
                     CAST(l.l_shipdate AS DATE) AS hi, l.l_quantity
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) iv
          ON p.probe_date BETWEEN iv.lo AND iv.hi
        GROUP BY p.probe_date ORDER BY p.probe_date""")),

    // ---- q115: time-series resample — gap-fill + forward-fill ------------
    // Events resampled onto a regular 6-hour grid per event_type over a
    // fixed 10-day window: empty buckets materialize with n=0 and carry
    // the last non-empty bucket's sum forward (the standard
    // sensor/metrics gap-fill). Scale shape: one aggregate over the
    // events, a generated grid (types × 40 bucket ordinals — tiny), one
    // window per type for the fill — no self-join, no driver loop.
    QueryDef(
      "q115_gap_fill",
      (s, dir) => {
        val t = Tables(s, dir)
        val t0 = 1704412800L * 1000000000L // 2024-01-05T00:00Z in epoch ns
        val w = 21600L * 1000000000L // 6 hours
        val nBuckets = 40L
        val agg = t.events
          .filter(col("ts_ns") >= t0 && col("ts_ns") < t0 + nBuckets * w)
          .withColumn("bucket", expr(s"cast((ts_ns - ${t0}L) div ${w}L as bigint)"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n0"), dsum(col("value")).as("s"))
        val grid = t.events.select(col("event_type")).distinct()
          .withColumn("bucket", explode(sequence(lit(0L), lit(nBuckets - 1))))
        val win = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(agg, Seq("event_type", "bucket"), "left")
          .withColumn("n", coalesce(col("n0"), lit(0L)))
          .withColumn("ffill_sum",
            coalesce(last(col("s"), ignoreNulls = true).over(win), lit(0.0)))
          .select(col("event_type"), col("bucket"), col("n"), col("ffill_sum"))
          .orderBy(col("event_type"), col("bucket"))
      },
      Some("""WITH ev AS (
          SELECT event_type,
            (epoch_ns(ts) - 1704412800000000000) // 21600000000000 AS bucket, value
          FROM events
          WHERE epoch_ns(ts) >= 1704412800000000000
            AND epoch_ns(ts) < 1704412800000000000 + 40 * 21600000000000),
        agg AS (
          SELECT event_type, bucket, COUNT(*) AS n0,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM ev GROUP BY event_type, bucket),
        grid AS (
          SELECT t.event_type, g.bucket
          FROM (SELECT DISTINCT event_type FROM events) t
          CROSS JOIN (SELECT CAST(x AS BIGINT) AS bucket FROM range(0, 40) t2(x)) g)
        SELECT g.event_type, g.bucket, CAST(COALESCE(a.n0, 0) AS BIGINT) AS n,
          COALESCE(last_value(a.s IGNORE NULLS) OVER (
            PARTITION BY g.event_type ORDER BY g.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS ffill_sum
        FROM grid g LEFT JOIN agg a USING (event_type, bucket)
        ORDER BY g.event_type, g.bucket"""))
  )
}
