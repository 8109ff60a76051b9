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
  * Decode is REAL for every pure-JVM format: binary P6 PPM bitmaps
  * ([[MediaDecoder.decodePpm]] — header parse incl. comments, then a
  * streaming pixel pass), PCM RIFF/WAVE audio ([[MediaDecoder.decodeWav]]
  * — chunk walk, fmt fields, 16-bit sample pass), and the mainstream
  * image codecs PNG / JPEG / BMP / GIF / TIFF
  * ([[MediaDecoder.decodeImage]] — the JDK's own `javax.imageio`
  * decoders, headless, no external libraries). Only formats with no JDK
  * codec at all (H.264/H.265 video, MP3/AAC audio) fall back to the
  * deterministic md5 [[FakeDecoder]] stub, clearly marked; swapping that
  * arm for a JNI/javacv call is the only change a real deployment needs.
  */
object Multimodal {

  /** AWT must come up headless on executors (no display in a cluster);
    * the property only matters before the first AWT class initializes,
    * so every ImageIO call site forces this first. */
  private object Headless {
    private lazy val done: Unit = {
      if (System.getProperty("java.awt.headless") == null)
        System.setProperty("java.awt.headless", "true")
    }
    def ensure(): Unit = done
  }

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** STUB decoder: stands in for the codecs no JDK ships (H.264/H.265,
    * MP3/AAC). Deterministic per payload: dimensions and features
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

  /** Real byte-level decoders for the pure-JVM media formats. Features are
    * EXACT integer sums carried as floats (all values ≤ 2^24, so the float
    * representation is lossless and the DuckDB oracle replays them
    * arithmetically):
    *  - PPM: (width, height, [pixelSum, rSum, gSum, bSum])
    *  - WAV: (nSamples, channels, [absSampleSum, sampleRate, bits, channels])
    */
  object MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) =
      if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
        decodePpm(payload)
      else if (isRiff(payload, "WAVE")) decodeWav(payload)
      else if (isRiff(payload, "AVI ")) {
        // motion-video summary: dims of the first decoded frame, feature
        // = [frameCount]; per-frame work goes through [[aviFrames]]
        val frames = aviFrames(payload)
        val (w, h, _) = decode(frames.head)
        (w, h, Array(frames.size.toFloat))
      }
      else if (isImageIoFormat(payload)) decodeImage(payload)
      else FakeDecoder.decode(payload) // no JDK codec (H.264/…): stub

    /** RIFF container sniff: `RIFF <size> <form>` — form distinguishes
      * WAVE audio from AVI video (both share the chunk grammar). */
    def isRiff(p: Array[Byte], form: String): Boolean =
      p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' &&
        new String(p, 8, 4, java.nio.charset.StandardCharsets.US_ASCII) == form

    /** REAL AVI container walk: recurse through RIFF LIST chunks and
      * return every video-frame chunk (`##dc` — stream-numbered
      * compressed frames, MJPG/MPNG payloads) in stream order. Same
      * byte-level discipline as [[decodeWav]]'s chunk walk, one level
      * deeper: the `movi` frames live inside nested LISTs. */
    def aviFrames(p: Array[Byte]): Seq[Array[Byte]] = {
      require(isRiff(p, "AVI "), "graft: not a RIFF/AVI payload")
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = new String(p, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val sz = bb.getInt(pos + 4)
          if (id == "LIST") walk(pos + 12, math.min(pos + 8 + sz, end))
          else if (id.length == 4 && id(2) == 'd' && id(3) == 'c' &&
              id(0).isDigit && id(1).isDigit)
            out += java.util.Arrays.copyOfRange(p, pos + 8,
              math.min(pos + 8 + sz, p.length))
          pos += 8 + sz + (sz & 1) // chunks are word-aligned
        }
      }
      walk(12, p.length)
      out.toSeq
    }

    /** Magic-byte sniff for the formats the JDK's ImageIO decodes. */
    def isImageIoFormat(p: Array[Byte]): Boolean = p.length >= 4 && {
      val b0 = p(0) & 0xff; val b1 = p(1) & 0xff
      val b2 = p(2) & 0xff; val b3 = p(3) & 0xff
      (b0 == 0x89 && b1 == 'P' && b2 == 'N' && b3 == 'G') || // PNG
      (b0 == 0xff && b1 == 0xd8) ||                          // JPEG
      (b0 == 'G' && b1 == 'I' && b2 == 'F' && b3 == '8') ||  // GIF
      (b0 == 'B' && b1 == 'M') ||                            // BMP
      (b0 == 'I' && b1 == 'I' && b2 == 42 && b3 == 0) ||     // TIFF LE
      (b0 == 'M' && b1 == 'M' && b2 == 0 && b3 == 42)        // TIFF BE
    }

    /** REAL codec decode via the JDK's own `javax.imageio` readers (PNG
      * inflate+unfilter, baseline JPEG, BMP, GIF LZW, TIFF) — pure JVM,
      * headless, no external libraries. Feature layout matches
      * [[decodePpm]]: (width, height, [pixelSum, rSum, gSum, bSum]), sums
      * exact over the decoded 8-bit sRGB channels. For the lossless
      * formats (PNG/BMP, palette-faithful GIF) the sums are bit-equal to
      * the source raster's, which is what lets the oracle verify the
      * full encode→decode round trip arithmetically. */
    def decodeImage(p: Array[Byte]): (Int, Int, Array[Float]) = {
      Headless.ensure()
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      require(img != null, "graft: ImageIO failed to decode a sniffed image payload")
      val w = img.getWidth; val h = img.getHeight
      var rs = 0L; var gs = 0L; var bs = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
          x += 1
        }
        y += 1
      }
      (w, h, Array((rs + gs + bs).toFloat, rs.toFloat, gs.toFloat, bs.toFloat))
    }

    /** P6 header parse: (width, height, raster byte offset). `#` comments
      * allowed; exactly one whitespace separates maxval from the raster. */
    def ppmHeader(p: Array[Byte]): (Int, Int, Int) = {
      var pos = 2
      def nextInt(): Int = {
        var done = false
        while (!done && pos < p.length) {
          if (p(pos) == '#') { while (pos < p.length && p(pos) != '\n') pos += 1 }
          else if (Character.isWhitespace(p(pos))) pos += 1
          else done = true
        }
        var v = 0
        while (pos < p.length && p(pos) >= '0' && p(pos) <= '9') {
          v = v * 10 + (p(pos) - '0'); pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); nextInt() // maxval
      (w, h, pos + 1)
    }

    /** Binary P6 PPM: header parse then a streaming pixel pass. */
    def decodePpm(p: Array[Byte]): (Int, Int, Array[Float]) = {
      val (w, h, off) = ppmHeader(p)
      var sum = 0L; val chan = Array(0L, 0L, 0L)
      val n = w * h * 3
      var i = 0
      while (i < n && off + i < p.length) {
        val v = p(off + i) & 0xff
        sum += v; chan(i % 3) += v; i += 1
      }
      (w, h, Array(sum.toFloat, chan(0).toFloat, chan(1).toFloat, chan(2).toFloat))
    }

    /** PCM RIFF/WAVE: chunk walk to `fmt ` (channels/rate/bits) and `data`
      * (16-bit little-endian samples). Returns (nSamples, channels, sums). */
    def decodeWav(p: Array[Byte]): (Int, Int, Array[Float]) = {
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12 // past RIFF<size>WAVE
      var channels = 1; var rate = 0; var bits = 16
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= p.length && dataOff < 0) {
        val id = new String(p, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val sz = bb.getInt(pos + 4)
        if (id == "fmt ") {
          channels = bb.getShort(pos + 10).toInt
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22).toInt
        } else if (id == "data") { dataOff = pos + 8; dataLen = sz }
        pos += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(dataOff >= 0 && bits == 16, s"unsupported WAV layout (bits=$bits)")
      val nVals = dataLen / 2
      var sumAbs = 0L
      var i = 0
      while (i < nVals && dataOff + 2 * i + 1 < p.length) {
        sumAbs += math.abs(bb.getShort(dataOff + 2 * i).toLong); i += 1
      }
      (nVals / channels, channels,
        Array(sumAbs.toFloat, rate.toFloat, bits.toFloat, channels.toFloat))
    }
  }

  /** Deterministic REAL media payloads from document text — the corpus
    * ships no binary column, so assets are synthesized with pixel/sample
    * values derived from the text bytes. The construction is simple
    * arithmetic over character codes, which is exactly what lets the
    * DuckDB oracle verify the real decoder end-to-end. */
  object AssetGen {
    private def textBytes(text: String): Array[Byte] = {
      val b = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (b.isEmpty) Array(' '.toByte) else b
    }

    /** Shared raster: w = 4 + len%13, h = 4 + len%11, pixel byte i is the
      * cycled text code at (i + shift) % len — shift 0 for stills, the
      * frame index for video frames (each frame differs, verifiably).
      * Every image encoder below carries exactly this raster, so the
      * lossless formats all decode to identical sums. */
    def raster(text: String, shift: Int = 0): (Int, Int, Array[Byte]) = {
      val b = textBytes(text); val len = b.length
      val w = 4 + len % 13; val h = 4 + len % 11
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < px.length) { px(i) = b((i + shift) % len); i += 1 }
      (w, h, px)
    }

    /** P6 bitmap over the shared raster. */
    def ppm(text: String): Array[Byte] = {
      val (w, h, px) = raster(text)
      val header = s"P6\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + px.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(px, 0, out, header.length, px.length)
      out
    }

    /** The shared raster encoded through a REAL JDK codec (`fmt` is an
      * ImageIO format name: png / jpeg / bmp / gif / tiff). PNG and BMP
      * are lossless — decoding them recovers the raster bit-exactly. */
    def encode(text: String, fmt: String, shift: Int = 0): Array[Byte] = {
      Headless.ensure()
      val (w, h, px) = raster(text, shift)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < w * h) {
        img.setRGB(i % w, i / w,
          ((px(3 * i) & 0xff) << 16) | ((px(3 * i + 1) & 0xff) << 8) |
            (px(3 * i + 2) & 0xff))
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, bos),
        s"graft: no ImageIO writer for format '$fmt'")
      bos.toByteArray
    }

    /** A REAL (if minimal) motion-video AVI: RIFF `AVI ` form with a
      * spec-shaped `hdrl` (main + stream headers, BITMAPINFOHEADER) and a
      * `movi` LIST of `00dc` frame chunks. Frame f carries the shift-f
      * raster encoded through a real codec — MJPG (Motion JPEG) or MPNG
      * (Motion PNG, lossless: decoded frame sums are oracle-exact).
      * 2 + len%3 frames at 4 fps. */
    def avi(text: String, codec: String): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val fmt = codec match {
        case "MJPG" => "jpeg"
        case "MPNG" => "png"
        case other => throw new IllegalArgumentException(s"graft: AVI codec $other")
      }
      val len = textBytes(text).length
      val n = 2 + len % 3
      val (w, h, _) = raster(text)
      val frames = (0 until n).map(f => encode(text, fmt, shift = f))
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = body.length & 1
        val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(id.getBytes(ascii)).putInt(body.length).put(body)
        bb.array()
      }
      def list(typ: String, parts: Seq[Array[Byte]]): Array[Byte] = {
        val bodyLen = parts.map(_.length).sum
        val bb = java.nio.ByteBuffer.allocate(12 + bodyLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("LIST".getBytes(ascii)).putInt(4 + bodyLen).put(typ.getBytes(ascii))
        parts.foreach(bb.put)
        bb.array()
      }
      val maxFrame = frames.map(_.length).max
      val avih = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(250000).putInt(maxFrame * 4).putInt(0).putInt(0) // us/frame, B/s
        .putInt(n).putInt(0).putInt(1).putInt(maxFrame)          // frames, streams
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      val strh = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      strh.put("vids".getBytes(ascii)).put(codec.getBytes(ascii))
        .putInt(0).putInt(0).putInt(0)        // flags, prio+lang, initial
        .putInt(1).putInt(4).putInt(0)        // scale, rate (4 fps), start
        .putInt(n).putInt(maxFrame).putInt(-1).putInt(0) // length, buf, quality
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      val strf = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .put(codec.getBytes(ascii)).putInt(w * h * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      val hdrl = list("hdrl", Seq(chunk("avih", avih.array()),
        list("strl", Seq(chunk("strh", strh.array()), chunk("strf", strf.array())))))
      val movi = list("movi", frames.map(chunk("00dc", _)))
      val bodyLen = 4 + hdrl.length + movi.length
      val bb = java.nio.ByteBuffer.allocate(8 + bodyLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(ascii)).putInt(bodyLen).put("AVI ".getBytes(ascii))
        .put(hdrl).put(movi)
      bb.array()
    }

    /** Mono 16-bit 8 kHz PCM, 16 + len%64 samples derived from the text. */
    def wav(text: String): Array[Byte] = {
      val b = textBytes(text); val len = b.length
      val n = 16 + len % 64
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      bb.put("RIFF".getBytes(ascii)).putInt(36 + 2 * n).put("WAVE".getBytes(ascii))
      bb.put("fmt ".getBytes(ascii)).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes(ascii)).putInt(2 * n)
      var i = 0
      while (i < n) {
        bb.putShort((((b(i % len) & 0xff) - 96) * 128).toShort); i += 1
      }
      bb.array()
    }
  }

  /** Media table with REAL binary payloads: image/video docs become P6 PPM
    * bitmaps, audio docs become PCM WAV — built partition-wise (payloads
    * never visit the driver), then decoded back by [[MediaDecoder]]. */
  def mediaAssets(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val kind = (id % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val payload = if (kind == "audio") AssetGen.wav(text) else AssetGen.ppm(text)
          MediaRow(id, kind, payload)
        }
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Media table whose payloads went through REAL image codecs: the
    * shared text-derived raster encoded as PNG / JPEG / BMP / GIF
    * (cycling by doc id), built partition-wise. Decoding recovers the
    * raster bit-exactly for the lossless formats — the encode half of
    * the codec round trip [[extractFeatures]] closes. */
  def codecAssets(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val kind = (id % 4) match {
            case 0 => "png"
            case 1 => "jpeg"
            case 2 => "bmp"
            case _ => "gif"
          }
          MediaRow(id, kind, AssetGen.encode(text, kind))
        }
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Media table of REAL motion-video payloads: each document becomes an
    * AVI whose frames are its shift-f rasters through a real codec —
    * MJPG for even ids, lossless MPNG for odd. Built partition-wise. */
  def videoAssets(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val codec = if (id % 2 == 0) "MJPG" else "MPNG"
          MediaRow(id, codec.toLowerCase, AssetGen.avi(text, codec))
        }
      }
      .toDF("media_id", "kind", "payload")
  }

  final case class VideoFrame(
      media_id: Long, kind: String, n_frames: Int, frame_idx: Int,
      width: Int, height: Int, pixel_sum: Long)

  /** REAL video decode, partition-wise: walk each AVI's RIFF structure
    * ([[MediaDecoder.aviFrames]]), decode every frame through the JDK
    * codecs, and emit per-frame dimensions + exact channel sums. One
    * streaming flatMap — payloads and frames never leave their
    * partition, so the stage scales with executors exactly like the
    * still-image path. */
  def decodeVideoFrames(media: DataFrame): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        val frames = MediaDecoder.aviFrames(m.payload)
        frames.iterator.zipWithIndex.map { case (bytes, i) =>
          val (w, h, feat) = MediaDecoder.decodeImage(bytes)
          VideoFrame(m.media_id, m.kind, frames.size, i, w, h, feat(0).toLong)
        }
      }
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
        val (w, h, feat) = MediaDecoder.decode(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, w, h, feat)
      }
    }
  }

  final case class PixelRow(media_id: Long, row_idx: Int, y: Int, row_sum: Long)

  /** REAL frame/row sampling over decoded bitmaps: k evenly-spaced pixel
    * ROWS per PPM asset (the structural analog of grabbing k frames from a
    * video), each reduced to its exact byte sum. Unlike [[sampleFrames]]
    * (opaque byte ranges), this goes through the actual raster geometry —
    * header offset, row stride w*3 — so a mis-parsed header would corrupt
    * every sum. Non-PPM payloads are skipped. One streaming pass,
    * payloads never leave their partition. */
  def samplePixelRows(media: DataFrame, k: Int): Dataset[PixelRow] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.filter(m => m.payload.length >= 2 &&
          m.payload(0) == 'P' && m.payload(1) == '6')
        .flatMap { m =>
          val (w, h, off) = MediaDecoder.ppmHeader(m.payload)
          (0 until k).iterator.map { i =>
            val y = h * i / k
            val stride = w * 3
            var sum = 0L
            var t = 0
            while (t < stride && off + y * stride + t < m.payload.length) {
              sum += (m.payload(off + y * stride + t) & 0xff); t += 1
            }
            PixelRow(m.media_id, i, y, sum)
          }
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
