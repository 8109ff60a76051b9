package graft.queries

import graft.QueryDef
import org.apache.spark.sql.SparkSession

/** End-to-end exercises of the graft DSv2 engine (catalog → write → scan)
  * inside the correctness gate: data flows documents.parquet → CTAS/INSERT
  * into a graft-catalog table → SQL over the graft scan, and the oracle
  * checks the round-trip against the raw parquet. */
object Engine {

  private def ensureCatalog(s: SparkSession, dir: String): String = {
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.gcat.warehouse", s"/tmp/graft_wh_$id")
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.corpus")
    "gcat.corpus"
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q30: CTAS into the graft catalog, filtered scan back ------------
    QueryDef(
      "q30_catalog_roundtrip",
      (s, dir) => {
        val ns = ensureCatalog(s, dir)
        s.sql(s"DROP TABLE IF EXISTS $ns.docs")
        s.sql(s"CREATE TABLE $ns.docs AS SELECT * FROM parquet.`$dir/documents.parquet`")
        s.sql(
          s"""SELECT doc_id, lang, n_chars FROM $ns.docs
             |WHERE n_chars >= 200 AND lang = 'en' ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id, lang, n_chars FROM documents
        WHERE n_chars >= 200 AND lang = 'en' ORDER BY doc_id""")),

    // ---- q31: INSERT with generated row keys — uniqueness invariants -----
    QueryDef(
      "q31_rowkey_insert",
      (s, dir) => {
        val ns = ensureCatalog(s, dir)
        s.sql(s"DROP TABLE IF EXISTS $ns.keyed")
        s.sql(
          s"""CREATE TABLE $ns.keyed (row_key STRING, doc_id BIGINT, fp STRING)
             |TBLPROPERTIES ('${graft.functions.RowKeyGenerator.Property}' =
             |  'graft.functions.DefaultRowKeyGenerator')""".stripMargin)
        // two identical appends: the generator must mint fresh unique keys
        // for every row of both writes (supplied '' is overridden)
        for (_ <- 1 to 2)
          s.sql(
            s"""INSERT INTO $ns.keyed
               |SELECT '', doc_id, md5(lower(text)) FROM parquet.`$dir/documents.parquet`"""
              .stripMargin)
        s.sql(
          s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             |       CAST(COUNT(DISTINCT row_key) AS BIGINT) AS n_keys,
             |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
             |FROM $ns.keyed""".stripMargin)
      },
      Some("""SELECT CAST(COUNT(*) * 2 AS BIGINT) AS n_rows,
        CAST(COUNT(*) * 2 AS BIGINT) AS n_keys,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM documents""")),

    // ---- q55: CREATE VIEW over a graft table, query THROUGH the view -----
    // Exercises the full view path: DDL bridged to the ViewCatalog, view
    // text stored in _view.yml, expanded at resolution on read
    // (capability analog of HBaseSessionCatalog.scala:63-155).
    QueryDef(
      "q55_view_roundtrip",
      (s, dir) => {
        val ns = ensureCatalog(s, dir)
        s.sql(s"DROP VIEW IF EXISTS $ns.long_docs")
        s.sql(s"DROP TABLE IF EXISTS $ns.vdocs")
        s.sql(s"CREATE TABLE $ns.vdocs AS SELECT * FROM parquet.`$dir/documents.parquet`")
        s.sql(
          s"""CREATE VIEW $ns.long_docs AS
             |SELECT lang, doc_id, n_chars FROM $ns.vdocs WHERE n_chars >= 300"""
            .stripMargin)
        s.sql(
          s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(n_chars) AS BIGINT) AS chars
             |FROM $ns.long_docs GROUP BY lang ORDER BY lang""".stripMargin)
      },
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents WHERE n_chars >= 300 GROUP BY lang ORDER BY lang"""))
  )
}
