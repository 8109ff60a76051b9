package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{AssetGen, MediaDecoder}

/** Byte-level media decoders against hand-built fixtures: the PPM and WAV
  * parsers must read real headers (including awkward-but-legal ones) and
  * produce exact integer features; unknown formats must fall through to
  * the documented stub. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("PPM decode: hand-built 2x1 image, exact dims and channel sums") {
    val px = Array[Byte](10, 20, 30, 40, 50, 60) // two RGB pixels
    val payload = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ px
    val (w, h, feat) = MediaDecoder.decode(payload)
    assert((w, h) == (2, 1))
    assert(feat.toSeq == Seq(210f, 50f, 70f, 90f)) // total, R, G, B
  }

  test("PPM decode: header comments and multi-digit dims parse") {
    val w = 12; val h = 3
    val px = Array.tabulate[Byte](w * h * 3)(i => (i % 7).toByte)
    val payload =
      s"P6\n# fixture comment\n$w $h\n# another\n255\n".getBytes("US-ASCII") ++ px
    val (gw, gh, feat) = MediaDecoder.decode(payload)
    assert((gw, gh) == (w, h))
    assert(feat(0) == px.map(_.toInt).sum.toFloat)
  }

  test("WAV decode: chunk walk reads fmt fields and exact abs-sample sum") {
    val payload = AssetGen.wav("abcdef")
    val (nSamples, channels, feat) = MediaDecoder.decode(payload)
    assert(channels == 1)
    assert(nSamples == 16 + 6 % 64)
    // samples cycle (code - 96) * 128 over 'a'..'f' (codes 97..102)
    val codes = "abcdef".map(c => math.abs((c - 96) * 128))
    val want = (0 until nSamples).map(i => codes(i % 6)).sum
    assert(feat(0) == want.toFloat)
    assert(feat(1) == 8000f && feat(2) == 16f) // rate, bits from the header
  }

  test("ImageIO codecs: lossless round trip recovers the raster exactly") {
    val text = "the quick brown fox jumps over the lazy dog"
    // ground truth: the uncompressed PPM decode of the same raster
    val (pw, ph, pf) = MediaDecoder.decode(AssetGen.ppm(text))
    for (fmt <- Seq("png", "bmp")) {
      val payload = AssetGen.encode(text, fmt)
      assert(MediaDecoder.isImageIoFormat(payload), s"$fmt magic must sniff")
      val (w, h, feat) = MediaDecoder.decode(payload)
      assert((w, h) == (pw, ph), s"$fmt dims")
      assert(feat.toSeq == pf.toSeq,
        s"$fmt is lossless: decoded channel sums must equal the raster's")
    }
  }

  test("ImageIO codecs: lossy/quantized formats decode real dimensions") {
    val text = "jpeg and gif carry the dims but not exact pixels"
    val (pw, ph, _) = MediaDecoder.decode(AssetGen.ppm(text))
    for (fmt <- Seq("jpeg", "gif", "tiff")) {
      val payload = AssetGen.encode(text, fmt)
      assert(MediaDecoder.isImageIoFormat(payload), s"$fmt magic must sniff")
      val (w, h, feat) = MediaDecoder.decode(payload)
      assert((w, h) == (pw, ph), s"$fmt dims")
      assert(feat(0) > 0f, s"$fmt must decode actual pixel content")
    }
  }

  test("codecAssets: distributed encode+decode matches the local round trip") {
    import spark.implicits._
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    val got = Multimodal.extractFeatures(Multimodal.codecAssets(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(got(0L).kind == "png" && got(1L).kind == "jpeg" &&
      got(2L).kind == "bmp" && got(3L).kind == "gif")
    // lossless kinds equal their PPM ground truth end to end
    for ((id, text) <- Seq(0L -> "alpha", 2L -> "gamma")) {
      val (w, h, feat) = MediaDecoder.decode(AssetGen.ppm(text))
      assert((got(id).width, got(id).height) == (w, h))
      assert(got(id).feature.toSeq == feat.toSeq)
    }
  }

  test("AVI round trip: container walk recovers every frame in order") {
    val text = "motion video from a riff container"
    val len = text.length
    val n = 2 + len % 3
    val (pw, ph, _) = MediaDecoder.decode(AssetGen.ppm(text))
    for (codec <- Seq("MPNG", "MJPG")) {
      val payload = AssetGen.avi(text, codec)
      assert(MediaDecoder.isRiff(payload, "AVI "))
      assert(!MediaDecoder.isRiff(payload, "WAVE"), "AVI must not sniff as WAV")
      val frames = MediaDecoder.aviFrames(payload)
      assert(frames.size == n, s"$codec frame count")
      frames.zipWithIndex.foreach { case (bytes, f) =>
        val (w, h, feat) = MediaDecoder.decodeImage(bytes)
        assert((w, h) == (pw, ph), s"$codec frame $f dims")
        if (codec == "MPNG") {
          // lossless: frame f's sum equals the shift-f raster's exact sum
          val want = (0 until pw * ph * 3)
            .map(i => text.charAt((i + f) % len).toInt).sum
          assert(feat(0) == want.toFloat, s"MPNG frame $f pixel sum")
        }
      }
      // the summary decode reports first-frame dims + frame count
      val (w, h, feat) = MediaDecoder.decode(payload)
      assert((w, h) == (pw, ph) && feat(0) == n.toFloat)
    }
  }

  test("unknown formats fall through to the deterministic stub") {
    val payload = "plain text payload".getBytes("UTF-8")
    val (gw, gh, gf) = MediaDecoder.decode(payload)
    val (ww, wh, wf) = Multimodal.FakeDecoder.decode(payload)
    assert(gw == ww && gh == wh && gf.toSeq == wf.toSeq)
  }

  test("samplePixelRows walks the real raster geometry") {
    import spark.implicits._
    // 2x4 image with known pixels: row y's sum must come from exactly
    // bytes [off + y*6, off + (y+1)*6)
    val px = Array.tabulate[Byte](2 * 4 * 3)(i => (i + 1).toByte)
    val payload = "P6\n2 4\n255\n".getBytes("US-ASCII") ++ px
    val media = Seq((7L, "image", payload)).toDF("media_id", "kind", "payload")
    val got = Multimodal.samplePixelRows(media, 4)
      .collect().map(r => (r.row_idx, r.y, r.row_sum)).sorted.toSeq
    // k=4 over h=4 → rows 0,1,2,3; row y sum = Σ(6y+1..6y+6) = 36y+21
    assert(got == (0 until 4).map(i => (i, i, 36L * i + 21L)))
    // audio (WAV) assets are skipped, not mis-decoded
    val wav = Seq((8L, "audio", Multimodal.AssetGen.wav("abc")))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.samplePixelRows(wav, 4).count() == 0)
  }

  test("asset round trip: generated payloads decode to the construction") {
    import spark.implicits._
    val docs = Seq((0L, "some image text"), (1L, "audio words here"),
      (2L, "a video document")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.mediaAssets(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(0L).kind == "image" && feats(1L).kind == "audio" &&
      feats(2L).kind == "video")
    val len = "some image text".length
    assert(feats(0L).width == 4 + len % 13 && feats(0L).height == 4 + len % 11)
    assert(feats(1L).height == 1) // mono
  }
}
