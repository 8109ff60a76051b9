package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{dsum, ts}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY.md §2.2): the reference inherits all of
  * this from stock Spark by re-declaring the standard strategy list; our
  * engine exercises the same surface declaratively so Catalyst plans it
  * (pushdown/pruning to parquet, broadcast vs shuffle join selection, AQE).
  *
  * Every query is deterministic (total ORDER BY) and every aggregate over
  * doubles goes through [[graft.QueryDef.dsum]] so results are exact and
  * hash-comparable against the DuckDB oracle.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(
    // ---- q01: TPC-H Q1-style pricing summary (scan + filter + hash agg) --
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice"), 4).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
              .as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        SUM(l_quantity) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---- q02: multi-predicate pushdown (range + IN + IS NOT NULL) --------
    QueryDef(
      "q02_filter_pushdown",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(
            col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1996-07-01 00:00:00") &&
            col("l_quantity").isin(1.0, 2.0, 3.0) &&
            col("l_returnflag").isNotNull)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
          AND l_quantity IN (1.0, 2.0, 3.0) AND l_returnflag IS NOT NULL
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- q03: TPC-H Q3-style shipping priority (3-way join + agg + topK) -
    QueryDef(
      "q03_shipping_priority",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.filter(col("c_mktsegment") === "BUILDING")
          .join(t.orders.filter(col("o_orderdate") < ts("1998-01-01 00:00:00")),
            col("c_custkey") === col("o_custkey"))
          .join(t.lineitem.filter(col("l_shipdate") > ts("1998-01-01 00:00:00")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(desc("revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- q04: EXISTS → left-semi join (TPC-H Q4 pattern) -----------------
    QueryDef(
      "q04_order_priority",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.lineitem.filter(col("l_quantity") >= 45).select(col("l_orderkey"))
        t.orders
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1997-01-01 00:00:00"))
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q05: 6-table star join, revenue by nation (TPC-H Q5 pattern) ----
    QueryDef(
      "q05_local_supplier_volume",
      (s, dir) => {
        val t = Tables(s, dir)
        // region/nation/supplier are tiny → Catalyst broadcasts them; the
        // only large shuffle is lineitem⋈orders on orderkey.
        t.region.filter(col("r_name") === "ASIA")
          .join(t.nation, col("n_regionkey") === col("r_regionkey"))
          .join(t.customer, col("c_nationkey") === col("n_nationkey"))
          .join(t.orders.filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1998-01-01 00:00:00")),
            col("o_custkey") === col("c_custkey"))
          .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
          .join(t.supplier,
            col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM region JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---- q06: selective scan-heavy aggregate (TPC-H Q6 pattern) ----------
    QueryDef(
      "q06_forecast_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00") &&
            col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
          .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""")),

    // ---- q07: NOT EXISTS → left-anti join --------------------------------
    QueryDef(
      "q07_customers_without_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        val h1 = t.orders
          .filter(col("o_orderdate") >= ts("1995-01-01 00:00:00") &&
            col("o_orderdate") < ts("1995-07-01 00:00:00"))
          .select(col("o_custkey"))
        t.customer
          .join(h1, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00')
        ORDER BY c_custkey""")),

    // ---- q08: window function top-N per group ----------------------------
    QueryDef(
      "q08_top_orders_per_customer",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        t.orders
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ---- q09: distinct aggregation per group -----------------------------
    QueryDef(
      "q09_distinct_parts_per_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .groupBy(col("l_suppkey"))
          .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
            count(lit(1)).as("n_items"))
          .orderBy(col("l_suppkey"))
      },
      Some("""SELECT l_suppkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
        COUNT(*) AS n_items FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""")),

    // ---- q10: set operations (INTERSECT / EXCEPT) ------------------------
    QueryDef(
      "q10_set_ops",
      (s, dir) => {
        val t = Tables(s, dir)
        val cn = t.customer.select(col("c_nationkey").as("nk"))
        val sn = t.supplier.select(col("s_nationkey").as("nk"))
        val inter = cn.intersect(sn).withColumn("op", lit("intersect"))
        val excpt = cn.except(sn).withColumn("op", lit("except"))
        inter.unionByName(excpt).select(col("op"), col("nk")).orderBy(col("op"), col("nk"))
      },
      Some("""SELECT op, nk FROM (
          SELECT 'intersect' AS op, nk FROM
            (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
          UNION ALL
          SELECT 'except' AS op, nk FROM
            (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier))
        ORDER BY op, nk""")),

    // ---- q11: ROLLUP grouping sets ---------------------------------------
    QueryDef(
      "q11_rollup",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- q12: conditional aggregation (CASE WHEN inside SUM) -------------
    QueryDef(
      "q12_priority_shipping",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_totalprice") > 100000.0, 1L).otherwise(0L)).as("big_orders"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("finished"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS big_orders,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished,
        COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q13: left outer join + agg incl. empty groups (TPC-H Q13) -------
    QueryDef(
      "q13_orders_per_customer",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("order_cnt"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // ---- q14: string predicates — contains / startsWith / endsWith -------
    // The reference swaps StartsWith/EndsWith filter translation
    // (SURVEY.md §2.1 #9, HBaseSparkFilterUtils.scala:114-120); we keep
    // correct semantics and verify them against the oracle here.
    QueryDef(
      "q14_string_predicates",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part
          .filter(col("p_name").startsWith("blue") ||
            col("p_name").endsWith("bolt") ||
            col("p_type").contains("PROMO"))
          .select(col("p_partkey"), col("p_name"), col("p_type"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_name, p_type FROM part
        WHERE p_name LIKE 'blue%' OR p_name LIKE '%bolt' OR p_type LIKE '%PROMO%'
        ORDER BY p_partkey""")),

    // ---- q15: top supplier by revenue (CTE + scalar-subquery max) --------
    QueryDef(
      "q15_top_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val rev = t.lineitem
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00"))
          .groupBy(col("l_suppkey"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_rev"))
        // max as a 1-row aggregate broadcast back onto rev: both sides
        // compute the identical exact double, so equality selection is
        // deterministic — and unlike max().over(Window.partitionBy())
        // there is no single-partition global sort at 100x suppliers.
        val mx = rev.agg(max(col("total_rev")).as("mx"))
        val top = rev.join(broadcast(mx), col("total_rev") === col("mx"))
        t.supplier
          .join(top, col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (
          SELECT l_suppkey,
            CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM rev) ORDER BY s_suppkey""")),

    // ---- q16: time-bucketed event aggregation (batch analog of a
    //           streaming windowed aggregation) ----------------------------
    QueryDef(
      "q16_events_hourly",
      (s, dir) => {
        val t = Tables(s, dir)
        // `ts` is TIMESTAMP_NTZ via Tables.normalizeEventTime — native
        // date_trunc, no epoch arithmetic
        t.events
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("total_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
        COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ---- q17: sessionization via lag + gap > 30 min ----------------------
    QueryDef(
      "q17_sessionize",
      (s, dir) => {
        val t = Tables(s, dir)
        // exact gap arithmetic on the normalized epoch-nanos column
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        val gapNs = 30L * 60L * 1000000000L
        t.events
          .withColumn("prev", lag(col("ts_ns"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev").isNull || col("ts_ns") - col("prev") > gapNs, 1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
          SELECT user_id, epoch_ns(ts) AS tns, event_id,
                 LAG(epoch_ns(ts)) OVER (PARTITION BY user_id
                                         ORDER BY epoch_ns(ts), event_id) AS prev
          FROM events)
        SELECT user_id,
          CAST(SUM(CASE WHEN prev IS NULL OR tns - prev > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_sessions,
          COUNT(*) AS n_events
        FROM e GROUP BY user_id ORDER BY user_id""")),

    // ---- q18: as-of join (latest signup at-or-before each purchase). -----
    // Spark lacks a native as-of join; the scalable composition is
    // union + per-user ordered window carrying the last signup forward —
    // one shuffle on user_id, no pairwise blowup. DuckDB verifies with its
    // native ASOF JOIN.
    QueryDef(
      "q18_asof_join",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        signups.unionByName(purchases)
          .withColumn("signup_id",
            last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id").as("purchase_id"), col("user_id"), col("signup_id"))
          .orderBy(col("purchase_id"))
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, l.event_id AS signup_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') l
          ON p.user_id = l.user_id AND p.ts >= l.ts
        ORDER BY purchase_id""")),

    // ---- q41: the same as-of join through the NATIVE custom operator -----
    // graft.plans.AsOfJoinExec: co-partitioned sorted merge (logical node +
    // strategy + physical exec registered via GraftExtensions) — no union,
    // no window state; verified against DuckDB's native ASOF JOIN.
    QueryDef(
      "q41_asof_native",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("s_ts"))
        graft.plans.AsOf.joinBackward(purchases, signups, Seq("user_id"), "ts", "s_ts")
          .select(col("purchase_id"), col("user_id"), col("signup_id"))
          .orderBy(col("purchase_id"))
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, l.event_id AS signup_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') l
          ON p.user_id = l.user_id AND p.ts >= l.ts
        ORDER BY purchase_id"""))
  )
}
