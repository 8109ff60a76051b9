package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal pipeline exercised through the correctness gate: binary
  * payload column → partition-wise (stub) decode → typed features. The
  * oracle recomputes the md5-derived fake-decoder outputs in SQL, proving
  * the Spark-side plumbing (binary transport, mapPartitions decode, schema)
  * end-to-end. */
object Media {

  /** DuckDB: value of md5 hex chars [2i+1, 2i+2] as an unsigned byte. */
  private def duckByte(i: Int): String = {
    val hi = s"(strpos('0123456789abcdef', substr(m, ${2 * i + 1}, 1)) - 1)"
    val lo = s"(strpos('0123456789abcdef', substr(m, ${2 * i + 2}, 1)) - 1)"
    s"($hi * 16 + $lo)"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q33_multimodal_decode",
      (s, dir) => {
        val t = Tables(s, dir)
        val media = Multimodal.mediaTable(t.documents)
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            // surface one feature component (rescaled) to pin the vector path
            round(element_at(col("feature"), 1).cast("double") * 256.0, 0).cast("long")
              .as("f0"))
          .orderBy(col("media_id"))
      },
      Some(s"""SELECT media_id, kind, n_bytes,
        CAST(16 + ${duckByte(0)} AS BIGINT) AS width,
        CAST(16 + ${duckByte(1)} AS BIGINT) AS height,
        CAST(${duckByte(2)} AS BIGINT) AS f0
        FROM (
          SELECT doc_id AS media_id,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS kind,
            CAST(length(text) AS BIGINT) AS n_bytes,
            md5(text) AS m
          FROM documents)
        ORDER BY media_id"""))
  )
}
