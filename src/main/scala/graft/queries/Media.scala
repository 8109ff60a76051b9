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
        ORDER BY media_id""")),

    // ---- q62: frame sampling over media payloads -------------------------
    // k=4 evenly-spaced byte ranges per asset, each hashed (stub frame
    // decode). The oracle recomputes the ranges with character substrings
    // (payloads are ASCII text bytes, so byte and char offsets agree) —
    // proving offsets, lengths, and per-frame content all match.
    QueryDef(
      "q62_media_frames",
      (s, dir) => {
        val t = Tables(s, dir)
        val media = Multimodal.mediaTable(t.documents)
        Multimodal.sampleFrames(media, 4)
          .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("off"), col("flen"), col("fhash"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, text,
                    CAST(length(text) AS BIGINT) AS n FROM documents),
        f AS (SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
                n * i // 4 AS off, n * (i + 1) // 4 - n * i // 4 AS flen, text, n
              FROM m CROSS JOIN range(0, 4) r(i) WHERE n >= 4)
        SELECT media_id, frame_idx, off, flen,
          md5(substr(text, CAST(off + 1 AS INT), CAST(flen AS INT))) AS fhash
        FROM f ORDER BY media_id, frame_idx"""))
  )
}
