package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 pipeline widening, part 2: deterministic corpus sampling,
  * tokenizer-design analytics, and event attribution. All single-pass
  * window/aggregate shapes — no self-joins, no driver collects, linear at
  * 100 TB.
  */
object Pipeline3 {

  /** Deterministic uniform in [0, 2^60) from a salted md5 of the doc id —
    * the shared engine-portable construction ([[QueryDef.md5Long60]]). */
  private val HashExpr =
    QueryDef.md5Long60("concat('sample:', cast(doc_id as string))")

  val defs: Seq[QueryDef] = Seq(

    // ---- q133: deterministic corpus sampling (uniform-k + weighted) ------
    // The two sampling primitives a mixture pipeline needs, both pure
    // functions of the doc id (stable across runs, engines, and
    // partitionings — re-running the pipeline reproduces the sample):
    //  - UNIFORM fixed-k per source: rank docs by a salted hash, keep the
    //    first 10 (one window per source partition);
    //  - WEIGHTED Bernoulli: keep a doc with probability n_chars/1000
    //    (longer docs proportionally more likely — the length-balanced
    //    subsample), decided row-locally with zero shuffle.
    // At 100 TB: the uniform sample is one window over each source
    // partition; the weighted sample is a scan-only filter.
    QueryDef(
      "q133_weighted_sample",
      (s, dir) => {
        val t = Tables(s, dir)
        val d = t.documents.withColumn("h", expr(HashExpr))
        val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        val uni = d.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("k"),
            sum(col("doc_id")).cast("long").as("uni_id_sum"),
            sum(col("n_chars")).cast("long").as("uni_chars"))
        val wtd = d.filter(pmod(col("h"), lit(1000)) < col("n_chars"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("w_kept"),
            sum(col("n_chars")).cast("long").as("w_chars"))
        uni.join(wtd, Seq("source"), "left")
          .na.fill(0L, Seq("w_kept", "w_chars"))
          .orderBy(col("source"))
      },
      Some {
        val hex15 = QueryDef.duckMd5Long60("m")
        s"""WITH h AS (
          SELECT source, doc_id, n_chars, ($hex15) AS h
          FROM (SELECT source, doc_id, n_chars,
                  md5('sample:' || CAST(doc_id AS VARCHAR)) AS m
                FROM documents)),
        uni AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(doc_id) AS BIGINT) AS uni_id_sum,
                 CAST(SUM(n_chars) AS BIGINT) AS uni_chars
          FROM (SELECT source, doc_id, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
                FROM h)
          WHERE rk <= 10 GROUP BY source),
        wtd AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS w_kept,
                 CAST(SUM(n_chars) AS BIGINT) AS w_chars
          FROM h WHERE h % 1000 < n_chars GROUP BY source)
        SELECT uni.source, k, uni_id_sum, uni_chars,
               COALESCE(w_kept, 0) AS w_kept, COALESCE(w_chars, 0) AS w_chars
        FROM uni LEFT JOIN wtd ON uni.source = wtd.source
        ORDER BY uni.source"""
      }),

    // ---- q134: vocabulary coverage curve ---------------------------------
    // Tokenizer design: what share of total token MASS do the top-N
    // vocabulary entries cover? Token counts (vocabulary-sized, not
    // corpus-sized), one global rank + running-sum window over the
    // vocabulary, coverage in exact integer parts-per-million
    // (cum * 1e6 div total — no float division). The head of this curve
    // decides vocab size; the window runs over thousands of rows even
    // when the corpus is 100 TB.
    QueryDef(
      "q134_vocab_coverage",
      (s, dir) => {
        val t = Tables(s, dir)
        val tok = t.documents
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("cf"))
        // top-25 via ORDER BY + LIMIT (TakeOrdered: per-partition heaps,
        // never a single-partition global window over the vocabulary —
        // this query used to be the one WindowExec "No Partition Defined"
        // WARN in the bench tail); the running coverage sum is then an
        // array fold over exactly those 25 rows. array_sort on the
        // (-cf, token) struct reproduces the (cf DESC, token ASC) rank.
        val top = tok.orderBy(desc("cf"), col("token")).limit(25)
          .select(col("token"), col("cf").cast("long").as("cf"))
        top
          .agg(expr("array_sort(collect_list(struct(-cf AS neg, token, cf)))").as("a"))
          .crossJoin(broadcast(tok.agg(sum(col("cf")).as("total"))))
          .select(expr(
            """explode(transform(a, (x, i) -> struct(
              |  cast(i + 1 as bigint) AS rank, x.token AS token, x.cf AS cf,
              |  aggregate(slice(a, 1, i + 1), 0L, (acc, y) -> acc + y.cf) AS cum)))
              |""".stripMargin).as("r"), col("total"))
          .select(col("r.rank").as("rank"), col("r.token").as("token"),
            col("r.cf").as("cf"),
            expr("cast(r.cum * 1000000 div total as bigint)").as("ppm"))
          .orderBy(col("rank"))
      },
      Some("""WITH tok AS (
          SELECT token, COUNT(*) AS cf
          FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          GROUP BY token),
        ranked AS (
          SELECT token, cf,
            ROW_NUMBER() OVER (ORDER BY cf DESC, token) AS rank,
            SUM(cf) OVER (ORDER BY cf DESC, token
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM tok)
        SELECT CAST(rank AS BIGINT) AS rank, token, CAST(cf AS BIGINT) AS cf,
               CAST(cum * 1000000 // (SELECT SUM(cf) FROM tok) AS BIGINT) AS ppm
        FROM ranked WHERE rank <= 25 ORDER BY rank""")),

    // ---- q136: last-touch attribution over the event stream --------------
    // For every purchase, attribute the most recent PRIOR click of the
    // same user (classic marketing attribution; also the "join each fact
    // to its latest preceding dimension state" shape). One window per
    // user — `last(click_ts) IGNORE NULLS` over rows-unbounded-preceding —
    // instead of the naive purchase×click self-join, which explodes on
    // active users. Latencies in exact integer microseconds.
    QueryDef(
      "q136_attribution",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t.events
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ns"))
          .withColumn("lc",
            last(when(col("event_type") === "click", col("ts_ns")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).cast("long").as("purchases"),
            count(col("lc")).cast("long").as("attributed"),
            sum(expr("(ts_ns - lc) div 1000")).cast("long").as("latency_us_sum"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
        a AS (
          SELECT user_id, event_type, ts_ns,
            last_value(CASE WHEN event_type = 'click' THEN ts_ns END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
          FROM e)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS purchases,
               CAST(COUNT(lc) AS BIGINT) AS attributed,
               CAST(SUM((ts_ns - lc) // 1000) AS BIGINT) AS latency_us_sum
        FROM a WHERE event_type = 'purchase'
        GROUP BY user_id ORDER BY user_id""")),

    // ---- q139: repetition screens (the Gopher battery shape) -------------
    // The within-document repetition signals used to drop machine-
    // generated / boilerplate text: the TOP word-2-gram's share of
    // character mass and the share of tokens that are repeats of an
    // already-seen word. Both per-doc aggregates in exact integer ppm;
    // the flag column applies the standard thresholds. Explode → per-doc
    // aggregate, linear, no self-joins.
    QueryDef(
      "q139_repetition_screens",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = t.documents.select(col("doc_id"), col("n_chars"),
          split(col("text"), " ").as("sp"))
        val grams = base.filter(size(col("sp")) >= 2)
          .select(col("doc_id"), col("n_chars"),
            explode(expr("transform(sequence(0, size(sp) - 2), " +
              "i -> concat_ws(' ', sp[i], sp[i+1]))")).as("g"))
          .groupBy(col("doc_id"), col("n_chars"), col("g"))
          .agg(count(lit(1)).as("cnt"))
        // the top 2-gram by (count, gram) — deterministic tie-break
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(desc("cnt"), col("g"))
        val top2 = grams.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"),
            expr("cast(cnt * length(g) * 1000000 div n_chars as bigint)").as("top2_ppm"))
        val dupTok = base
          .select(col("doc_id"), size(col("sp")).cast("long").as("n_tok"),
            size(array_distinct(col("sp"))).cast("long").as("n_uniq"))
          .select(col("doc_id"),
            expr("cast((n_tok - n_uniq) * 1000000 div n_tok as bigint)").as("dup_tok_ppm"))
        top2.join(dupTok, "doc_id")
          .withColumn("flagged",
            (col("top2_ppm") > 180000L || col("dup_tok_ppm") > 800000L).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
          SELECT doc_id, n_chars, string_split(text, ' ') AS sp FROM documents),
        grams AS (
          SELECT doc_id, n_chars, g, COUNT(*) AS cnt
          FROM (SELECT doc_id, n_chars, sp[i + 1] || ' ' || sp[i + 2] AS g
                FROM (SELECT doc_id, n_chars, sp, unnest(range(len(sp) - 1)) AS i
                      FROM base WHERE len(sp) >= 2))
          GROUP BY doc_id, n_chars, g),
        top2 AS (
          SELECT doc_id,
                 CAST(cnt * length(g) * 1000000 // n_chars AS BIGINT) AS top2_ppm
          FROM (SELECT doc_id, n_chars, g, cnt,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) AS rn
                FROM grams)
          WHERE rn = 1),
        dup AS (
          SELECT doc_id,
                 CAST((len(sp) - len(list_distinct(sp))) * 1000000 // len(sp) AS BIGINT)
                   AS dup_tok_ppm
          FROM base)
        SELECT t.doc_id, t.top2_ppm, d.dup_tok_ppm,
               CAST(CASE WHEN t.top2_ppm > 180000 OR d.dup_tok_ppm > 800000
                    THEN 1 ELSE 0 END AS BIGINT) AS flagged
        FROM top2 t JOIN dup d ON d.doc_id = t.doc_id
        ORDER BY t.doc_id""")),

    // ---- q140: token-budget mixture draw ---------------------------------
    // Assemble a training mix under a TOTAL token budget with per-source
    // weights: each source gets weight × budget tokens, filled by its
    // docs in deterministic salted-hash order until the per-source budget
    // is hit (first doc crossing the line is included — budgets are
    // floors). One running-sum window per source partition; the selection
    // is a pure function of (doc_id, weights), reproducible anywhere.
    QueryDef(
      "q140_token_budget_mix",
      (s, dir) => {
        val t = Tables(s, dir)
        val budget = 4000L // tokens overall — small enough that caps BIND
        val d = t.documents
          .withColumn("tok", size(split(col("text"), " ")).cast("long"))
          .withColumn("h", expr(HashExpr))
          .withColumn("cap",
            expr(s"coalesce(element_at(map('src0', 40L, 'src1', 30L, 'src2', 20L, " +
              s"'src3', 10L), source), 0L) * $budget div 100"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        d.withColumn("before", coalesce(sum(col("tok")).over(w), lit(0L)))
          .filter(col("before") < col("cap"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("tok")).cast("long").as("tokens"),
            sum(col("doc_id")).cast("long").as("id_sum"))
          .orderBy(col("source"))
      },
      Some {
        val hex15 = QueryDef.duckMd5Long60("m")
        s"""WITH d AS (
          SELECT source, doc_id, len(string_split(text, ' ')) AS tok, ($hex15) AS h,
            CASE source WHEN 'src0' THEN 40 WHEN 'src1' THEN 30
                        WHEN 'src2' THEN 20 WHEN 'src3' THEN 10 ELSE 0 END
              * 4000 // 100 AS cap
          FROM (SELECT source, doc_id, text,
                  md5('sample:' || CAST(doc_id AS VARCHAR)) AS m
                FROM documents)),
        r AS (
          SELECT source, doc_id, tok, cap,
            COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM d)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS tokens,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM r WHERE before < cap GROUP BY source ORDER BY source"""
      })
  )
}
