package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media assets travel as opaque `binary`
  * payloads plus typed metadata, and per-asset decode / feature-extraction
  * runs partition-wise over the binary column — the shape a 100 TB
  * image/audio corpus pipeline needs (payloads never hit the driver; the
  * decode stage is a narrow map over whatever partitioning the scan
  * produced, so it scales with executors).
  *
  * The actual byte→pixels/samples decode is STUBBED with a deterministic
  * md5-based fake ([[FakeDecoder]]) because no media libraries exist in
  * this environment — the Spark-side contract (schema, binary transport,
  * partition-wise iteration, fixed-width feature output) is real and
  * oracle-tested; swapping `FakeDecoder.decode` for a JNI/javacv call is
  * the only change a real deployment needs.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** STUB decoder: stands in for image/audio decoding (not available in
    * this container). Deterministic per payload: dimensions and features
    * derive from the payload's md5, so tests and the DuckDB oracle can
    * verify the pipeline end-to-end. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val md5 = MessageDigest.getInstance("MD5").digest(payload)
      def hex2(i: Int): Int = ((md5(i) & 0xff))
      val width = 16 + hex2(0)   // 16..271 — fake pixel dims
      val height = 16 + hex2(1)
      // fixed-width "embedding" of the decoded asset: 8 bytes of digest,
      // scaled to [0,1) — a real decoder would emit pooled features here
      val feature = (2 until 10).map(i => (md5(i) & 0xff) / 256.0f).toArray
      (width, height, feature)
    }
  }

  /** Build a deterministic media table from `documents`: payload = UTF-8
    * text bytes, kind cycles image/audio/video. (The corpus ships no
    * binary column; this is the documented stand-in.) */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Partition-wise decode + feature extraction over the binary column.
    * Streaming iterator-to-iterator transform: constant memory per
    * partition regardless of partition size. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, feat) = FakeDecoder.decode(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, w, h, feat)
      }
    }
  }

  final case class Frame(
      media_id: Long, frame_idx: Int, off: Long, flen: Long, fhash: String)

  /** Uniform frame sampling over a video/audio payload: k evenly-spaced
    * byte ranges per asset, each "decoded" to its md5 (stub for a real
    * frame grab). flatMap keeps it one streaming pass — k output rows per
    * asset, payloads never collected; a real deployment replaces the md5
    * with a codec frame-extract at the same offsets. */
  def sampleFrames(media: DataFrame, k: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val n = m.payload.length.toLong
        (0 until k).iterator.filter(_ => n >= k).map { i =>
          val off = n * i / k
          val end = n * (i + 1) / k
          md.reset()
          md.update(m.payload, off.toInt, (end - off).toInt)
          val hex = md.digest().map("%02x".format(_)).mkString
          Frame(m.media_id, i, off, end - off, hex)
        }
      }
    }
  }
}
