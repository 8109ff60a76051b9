package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal pipeline exercised through the correctness gate: binary
  * payload column → partition-wise REAL decode (P6 PPM header+pixel parse,
  * RIFF/WAVE chunk walk + 16-bit sample pass) → typed features. Payloads
  * are fixture-generated from document text (pixels/samples cycle the text
  * bytes), so the oracle replays the decoded dimensions and exact
  * pixel/sample sums with pure SQL arithmetic over character codes —
  * proving the byte-level decoders, not just the plumbing. */
object Media {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q33_multimodal_decode",
      (s, dir) => {
        val t = Tables(s, dir)
        // REAL round trip: text → P6 PPM / PCM WAV bytes → header+payload
        // parse → exact integer features
        val media = Multimodal.mediaAssets(t.documents)
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            // feature(0) = exact pixel-sum (PPM) / abs-sample-sum (WAV)
            element_at(col("feature"), 1).cast("long").as("f0"))
          .orderBy(col("media_id"))
      },
      // replay the construction arithmetically: dims from text length,
      // sums over the cycled character codes (docs are ASCII; byte == char)
      Some("""WITH m AS (
          -- empty text becomes a single space, mirroring AssetGen.textBytes
          -- (keeps i % len well-defined on both engines)
          SELECT doc_id AS media_id,
                 CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS text,
                 CAST(CASE WHEN length(text) = 0 THEN 1
                      ELSE length(text) END AS BIGINT) AS len,
                 CAST(doc_id % 3 AS INT) AS k
          FROM documents),
        dims AS (
          SELECT media_id, text, len, k,
                 4 + len % 13 AS w, 4 + len % 11 AS h,
                 16 + len % 64 AS nsamp,
                 CASE WHEN k = 1 THEN 16 + len % 64
                      ELSE (4 + len % 13) * (4 + len % 11) * 3 END AS nvals
          FROM m),
        px AS (
          SELECT media_id, k, len, text, unnest(range(nvals)) AS i FROM dims),
        sums AS (
          SELECT media_id,
            CAST(SUM(CASE WHEN k = 1
                 THEN abs((ascii(substr(text, CAST(i % len + 1 AS INT), 1)) - 96) * 128)
                 ELSE ascii(substr(text, CAST(i % len + 1 AS INT), 1)) END)
              AS BIGINT) AS f0
          FROM px GROUP BY media_id)
        SELECT d.media_id,
          CASE d.k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          CAST(CASE WHEN d.k = 1 THEN 44 + 2 * d.nsamp
               ELSE 3 + length(CAST(d.w AS VARCHAR)) + 1 + length(CAST(d.h AS VARCHAR))
                    + 1 + 4 + d.w * d.h * 3 END AS BIGINT) AS n_bytes,
          CAST(CASE WHEN d.k = 1 THEN d.nsamp ELSE d.w END AS BIGINT) AS width,
          CAST(CASE WHEN d.k = 1 THEN 1 ELSE d.h END AS BIGINT) AS height,
          s.f0
        FROM dims d JOIN sums s USING (media_id)
        ORDER BY d.media_id""")),

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
        FROM f ORDER BY media_id, frame_idx""")),

    // ---- q130: REAL frame sampling through the raster geometry -----------
    // k=4 evenly-spaced pixel ROWS per decoded PPM asset (image/video
    // docs), each reduced to its exact byte sum — exercises the header
    // offset and the w*3 row stride, not just opaque byte ranges (q62).
    // The oracle replays each sampled row arithmetically from the
    // construction: pixel byte j of the raster is the cycled text code at
    // j % len, and row y spans [y*w*3, (y+1)*w*3).
    QueryDef(
      "q130_frame_rows",
      (s, dir) => {
        val t = Tables(s, dir)
        val media = Multimodal.mediaAssets(t.documents)
        Multimodal.samplePixelRows(media, 4)
          .select(col("media_id"), col("row_idx").cast("long").as("row_idx"),
            col("y").cast("long").as("y"), col("row_sum"))
          .orderBy(col("media_id"), col("row_idx"))
      },
      Some("""WITH m AS (
          SELECT doc_id AS media_id,
                 CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS text,
                 CAST(CASE WHEN length(text) = 0 THEN 1
                      ELSE length(text) END AS BIGINT) AS len
          FROM documents WHERE CAST(doc_id % 3 AS INT) != 1),
        dims AS (
          SELECT media_id, text, len,
                 4 + len % 13 AS w, 4 + len % 11 AS h
          FROM m),
        rws AS (
          SELECT media_id, text, len, w, h, unnest(range(4)) AS i FROM dims),
        px AS (
          SELECT media_id, i, h * i // 4 AS y, text, len, w,
                 unnest(range(w * 3)) AS t
          FROM rws)
        SELECT media_id, CAST(i AS BIGINT) AS row_idx, CAST(y AS BIGINT) AS y,
          CAST(SUM(ascii(substr(text,
            CAST((y * w * 3 + t) % len + 1 AS INT), 1))) AS BIGINT) AS row_sum
        FROM px GROUP BY media_id, i, y
        ORDER BY media_id, row_idx""")),

    // ---- q147: REAL codec round trip via the JDK's ImageIO ---------------
    // The shared text-derived raster is ENCODED through real codecs (PNG
    // deflate+filters, baseline JPEG, BMP, GIF LZW — javax.imageio, pure
    // JVM) and DECODED back partition-wise. Dimensions verify for every
    // format; for the lossless ones (PNG/BMP) the decoded pixel sum must
    // equal the source raster's, which the oracle replays arithmetically
    // from the text — any defect in either half of the round trip (or in
    // the sniffing) breaks the hash match. JPEG/GIF sums are
    // quantizer-dependent, so they are masked to NULL on both sides.
    QueryDef(
      "q147_codec_decode",
      (s, dir) => {
        val t = Tables(s, dir)
        val media = Multimodal.codecAssets(t.documents)
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            when(col("kind").isin("png", "bmp"),
              element_at(col("feature"), 1).cast("long")).as("pixel_sum"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
          SELECT doc_id AS media_id,
                 CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS text,
                 CAST(CASE WHEN length(text) = 0 THEN 1
                      ELSE length(text) END AS BIGINT) AS len,
                 CAST(doc_id % 4 AS INT) AS k
          FROM documents),
        dims AS (
          SELECT media_id, text, len, k,
                 4 + len % 13 AS w, 4 + len % 11 AS h
          FROM m),
        px AS (
          SELECT media_id, text, len, unnest(range(w * h * 3)) AS i
          FROM dims WHERE k IN (0, 2)),
        sums AS (
          SELECT media_id,
            CAST(SUM(ascii(substr(text, CAST(i % len + 1 AS INT), 1)))
              AS BIGINT) AS pixel_sum
          FROM px GROUP BY media_id)
        SELECT d.media_id,
          CASE d.k WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
               WHEN 2 THEN 'bmp' ELSE 'gif' END AS kind,
          CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
          s.pixel_sum
        FROM dims d LEFT JOIN sums s USING (media_id)
        ORDER BY d.media_id""")),

    // ---- q148: REAL video decode — AVI container walk + per-frame codec --
    // Each document becomes a real AVI (RIFF hdrl/movi structure) whose
    // 2+len%3 frames carry the shift-f raster through a real codec; the
    // decode side walks the container and decodes every frame via ImageIO.
    // The oracle replays frame count, per-frame dims, and — for the
    // lossless MPNG codec — the exact per-frame pixel sum from the
    // construction (frame f's pixel byte i is the text code at (i+f)%len).
    // A defect in the container writer, the chunk walk, the frame order,
    // or either codec half breaks the hash match.
    QueryDef(
      "q148_video_frames",
      (s, dir) => {
        val t = Tables(s, dir)
        val media = Multimodal.videoAssets(t.documents)
        Multimodal.decodeVideoFrames(media)
          .select(col("media_id"), col("kind"),
            col("n_frames").cast("long").as("n_frames"),
            col("frame_idx").cast("long").as("frame_idx"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            when(col("kind") === "mpng", col("pixel_sum")).as("frame_sum"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""WITH m AS (
          SELECT doc_id AS media_id,
                 CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS text,
                 CAST(CASE WHEN length(text) = 0 THEN 1
                      ELSE length(text) END AS BIGINT) AS len,
                 CASE WHEN doc_id % 2 = 0 THEN 'mjpg' ELSE 'mpng' END AS kind
          FROM documents),
        dims AS (
          SELECT media_id, text, len, kind,
                 4 + len % 13 AS w, 4 + len % 11 AS h, 2 + len % 3 AS n
          FROM m),
        frames AS (
          SELECT media_id, text, len, kind, w, h, n,
                 unnest(range(n)) AS f
          FROM dims),
        px AS (
          SELECT media_id, text, len, f, unnest(range(w * h * 3)) AS i
          FROM frames WHERE kind = 'mpng'),
        sums AS (
          SELECT media_id, f,
            CAST(SUM(ascii(substr(text, CAST((i + f) % len + 1 AS INT), 1)))
              AS BIGINT) AS frame_sum
          FROM px GROUP BY media_id, f)
        SELECT fr.media_id, fr.kind, CAST(fr.n AS BIGINT) AS n_frames,
          CAST(fr.f AS BIGINT) AS frame_idx,
          CAST(fr.w AS BIGINT) AS width, CAST(fr.h AS BIGINT) AS height,
          s.frame_sum
        FROM frames fr LEFT JOIN sums s ON fr.media_id = s.media_id AND fr.f = s.f
        ORDER BY fr.media_id, fr.f"""))
  )
}
