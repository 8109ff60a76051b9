package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.dsum
import org.apache.spark.sql.functions._

/** Round-6 pipeline/SQL-surface widening: PII redaction (the standard
  * pre-training scrub pass), ROLLUP/GROUPING-SETS corpus reporting, and
  * PIVOT reshaping. All per-row expression pipelines or single aggregates —
  * codegen-friendly, no UDFs, linear at 100 TB.
  */
object Pipeline2 {

  /** Shared regexes — Java regex and RE2 (DuckDB) agree on this subset
    * (character classes, bounded repetition, \b word boundaries; no
    * lookaround). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val defs: Seq[QueryDef] = Seq(

    // ---- q124: PII detection + redaction ---------------------------------
    // The scrub pass every crawl corpus needs before training: find and
    // mask emails / phone numbers / IP addresses. The corpus text is
    // synthetic word soup with no PII, so each doc is ENRICHED with
    // deterministic doc_id-derived entities first (same construction on
    // both engines) — the regex counts and the redacted digest then verify
    // real matches, not vacuous zeros. Scale shape: pure per-row regex
    // expressions, whole-stage codegen, no shuffle before the final sort.
    QueryDef(
      "q124_pii_redact",
      (s, dir) => {
        val t = Tables(s, dir)
        val enriched = t.documents.select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"),
            lit("@mail"), pmod(col("doc_id"), lit(7)), lit(".example.com"),
            lit(" call +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" from 10."), pmod(col("doc_id"), lit(256)),
            lit("."), pmod(col("doc_id") * 7, lit(256)),
            lit("."), pmod(col("doc_id"), lit(250))).as("text"))
        val redacted = regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          IpRe, "<IP>")
        enriched.select(
            col("doc_id"),
            regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_email"),
            regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phone"),
            regexp_count(col("text"), lit(IpRe)).cast("long").as("n_ip"),
            length(redacted).cast("long").as("red_len"),
            md5(redacted.cast("binary")).as("red_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH enriched AS (
          SELECT doc_id,
            text || ' contact user' || doc_id || '@mail' || (doc_id % 7)
              || '.example.com call +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
              || '.' || (doc_id % 250) AS text
          FROM documents),
        red AS (
          SELECT doc_id, text,
            regexp_replace(
              regexp_replace(
                regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
                '$PhoneRe', '<PHONE>', 'g'),
              '$IpRe', '<IP>', 'g') AS rtext
          FROM enriched)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phone,
          CAST(len(regexp_extract_all(text, '$IpRe')) AS BIGINT) AS n_ip,
          CAST(length(rtext) AS BIGINT) AS red_len,
          md5(rtext) AS red_md5
        FROM red ORDER BY doc_id""")),

    // ---- q125: ROLLUP corpus report --------------------------------------
    // The corpus-composition report (docs/chars per source × lang, per
    // source, and grand total) in ONE aggregation pass — GROUP BY ROLLUP
    // computes all three grouping sets with a single shuffle instead of
    // three scans + a union. GROUPING() disambiguates a real value from
    // the rollup NULL.
    QueryDef(
      "q125_rollup_report",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .rollup(col("source"), col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).cast("long").as("chars"),
            grouping(col("source")).cast("long").as("g_src"),
            grouping(col("lang")).cast("long").as("g_lang"))
          .select(
            coalesce(col("source"), lit("ALL")).as("src"),
            coalesce(col("lang"), lit("ALL")).as("lng"),
            col("g_src"), col("g_lang"), col("n"), col("chars"))
          .orderBy(col("src"), col("lng"), col("g_src"), col("g_lang"))
      },
      Some("""SELECT COALESCE(source, 'ALL') AS src, COALESCE(lang, 'ALL') AS lng,
        CAST(GROUPING(source) AS BIGINT) AS g_src,
        CAST(GROUPING(lang) AS BIGINT) AS g_lang,
        COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY ROLLUP (source, lang)
        ORDER BY src, lng, g_src, g_lang""")),

    // ---- q126: PIVOT reshape ---------------------------------------------
    // Long→wide reshape of event counts (user bucket × event type). The
    // explicit value list keeps it ONE aggregation pass (Spark's pivot
    // without values runs an extra distinct job over the corpus — the
    // 100 TB version must always pin the columns).
    QueryDef(
      "q126_pivot_events",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .groupBy(pmod(col("user_id"), lit(10)).as("u"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .select(col("u"),
            coalesce(col("click"), lit(0L)).as("click"),
            coalesce(col("error"), lit(0L)).as("error"),
            coalesce(col("purchase"), lit(0L)).as("purchase"),
            coalesce(col("signup"), lit(0L)).as("signup"),
            coalesce(col("view"), lit(0L)).as("view"))
          .orderBy(col("u"))
      },
      Some("""SELECT user_id % 10 AS u,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events GROUP BY 1 ORDER BY u""")),

    // ---- q127: UNPIVOT (melt) — the inverse reshape ----------------------
    // Wide→long over per-flag lineitem aggregates via the native
    // Dataset.unpivot operator (one Expand node — each input row emits one
    // row per measure in the SAME pass, no self-union re-scan; at 100 TB
    // the UNION-ALL formulation scans the fact table three times, this
    // scans once). Oracle uses the UNION ALL spelling — two formulations
    // must agree.
    QueryDef(
      "q127_unpivot",
      (s, dir) => {
        val t = Tables(s, dir)
        val wide = t.lineitem
          .groupBy(col("l_returnflag").as("flag"))
          .agg(dsum(col("l_quantity")).as("qty"),
            dsum(col("l_extendedprice")).as("price"),
            dsum(col("l_discount"), 6).as("disc"))
        wide.unpivot(
            Array(col("flag")),
            Array(col("qty"), col("price"), col("disc")),
            "measure", "value")
          .orderBy(col("flag"), col("measure"))
      },
      Some("""WITH wide AS (
          SELECT l_returnflag AS flag,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS price,
            CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS disc
          FROM lineitem GROUP BY 1)
        SELECT flag, measure, value FROM (
          SELECT flag, 'qty' AS measure, qty AS value FROM wide
          UNION ALL SELECT flag, 'price', price FROM wide
          UNION ALL SELECT flag, 'disc', disc FROM wide)
        ORDER BY flag, measure""")),

    // ---- q128: conversion funnel (first-touch attribution) ---------------
    // The event-analytics staple: per user, the FIRST click and the first
    // purchase AT OR AFTER it; conversion count and exact total
    // click→purchase latency. Scale shape: one aggregate for first
    // clicks, one user_id-keyed join back (co-partitioned with the
    // second aggregate's shuffle), everything in epoch-nanos longs —
    // integer-exact on both engines.
    QueryDef(
      "q128_funnel",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events
        val firstClick = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"))
          .agg(min(col("ts_ns")).as("click_ns"))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(firstClick, "user_id")
          .filter(col("ts_ns") >= col("click_ns"))
          .groupBy(col("user_id"), col("click_ns"))
          .agg(min(col("ts_ns")).as("purchase_ns"))
        firstClick.join(conv.select(col("user_id"), col("purchase_ns"), col("click_ns").as("c2")),
            Seq("user_id"), "left")
          .agg(
            count(lit(1)).as("n_clickers"),
            count(col("purchase_ns")).as("n_converted"),
            sum(col("purchase_ns") - col("c2")).cast("long").as("total_latency_ns"))
      },
      Some("""WITH fc AS (
          SELECT user_id, MIN(epoch_ns(ts)) AS click_ns
          FROM events WHERE event_type = 'click' GROUP BY user_id),
        conv AS (
          SELECT e.user_id, fc.click_ns, MIN(epoch_ns(e.ts)) AS purchase_ns
          FROM events e JOIN fc USING (user_id)
          WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= fc.click_ns
          GROUP BY e.user_id, fc.click_ns)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_clickers,
          CAST(COUNT(conv.purchase_ns) AS BIGINT) AS n_converted,
          CAST(SUM(conv.purchase_ns - conv.click_ns) AS BIGINT) AS total_latency_ns
        FROM fc LEFT JOIN conv USING (user_id)"""))
  )
}
