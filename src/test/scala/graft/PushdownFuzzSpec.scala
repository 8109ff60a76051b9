package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Randomized pushdown soundness: random predicate trees (comparisons,
  * IN, LIKE prefix/suffix, NULL tests, AND/OR/NOT to depth 3) over a
  * null-rich multi-type graft table — partitioned, multi-file, with
  * range-dead long strings — must return exactly the rows the identical
  * in-memory DataFrame returns. The graft side exercises the whole
  * planning stack at once: filter translation to parquet predicates,
  * identity-partition pruning + absorption, registry range skipping, and
  * residual evaluation. Any unsound translation (the reference swapped
  * startsWith/endsWith — `HBaseSparkFilterUtils.scala:114-120`), any
  * wrong absorption, or any over-eager file skip surfaces as a row-set
  * diff with the reproducing seed and predicate printed.
  */
class PushdownFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_pdfuzz_wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse", warehouse)
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val full = "graft.pdfuzz.t"

  /** Deterministic null-rich corpus: 6 insert batches (multiple files,
    * so registry skipping is live), values clustered enough that random
    * constants actually select. */
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val rows = (0 until 300).map { i =>
      val s =
        if (rnd.nextInt(10) == 0) null
        else if (rnd.nextInt(12) == 0) ("x" * 70) + rnd.nextInt(10) // range-dead
        else words(rnd.nextInt(words.size)) + rnd.nextInt(20)
      val iv: java.lang.Long =
        if (rnd.nextInt(8) == 0) null
        else java.lang.Long.valueOf((rnd.nextInt(200) - 100).toLong)
      val dv: java.lang.Double =
        if (rnd.nextInt(8) == 0) null
        else java.lang.Double.valueOf(rnd.nextInt(1000) / 10.0 - 50.0)
      val dt =
        if (rnd.nextInt(10) == 0) null
        else java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1)
          .plusDays(rnd.nextInt(120).toLong))
      val bv: java.lang.Boolean =
        if (rnd.nextInt(9) == 0) null else java.lang.Boolean.valueOf(rnd.nextBoolean())
      (s"k$i", i % 4, iv, dv, s, dt, bv)
    }
    rows.toDF("row_key", "p", "i", "d", "s", "dt", "b")
  }

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pdfuzz")
    // bloom indexes on every eligible data column: the equality leaves
    // below then exercise per-file Bloom disproof ([[BloomIndex]]) under
    // the same row-set oracle — any wrong skip is a baseline diff
    spark.sql(s"""CREATE TABLE $full (
                 |  row_key STRING, p INT, i BIGINT, d DOUBLE, s STRING,
                 |  dt DATE, b BOOLEAN)
                 |PARTITIONED BY (p)
                 |TBLPROPERTIES ('index.bloom.columns' = 'row_key,i,s,dt',
                 |               'index.bloom.bits' = '2048')""".stripMargin)
    // 6 commits -> multiple files per partition, varied registry ranges
    corpus.withColumn("g", pmod(xxhash64(col("row_key")), lit(6)))
      .collect() // force corpus determinism before the loop below reuses it
    (0 until 6).foreach { g =>
      corpus.filter(pmod(xxhash64(col("row_key")), lit(6)) === g)
        .writeTo(full).append()
    }
  }

  /** One random predicate tree. Constants are drawn near the data so
    * selections are non-trivial; strings avoid quote games (the Column
    * API carries them literally anyway). */
  private def genPredicate(rnd: scala.util.Random, depth: Int): Column = {
    def leaf(): Column = rnd.nextInt(16) match {
      case 0 => col("i") > lit((rnd.nextInt(200) - 100).toLong)
      case 1 => col("i") <= lit((rnd.nextInt(200) - 100).toLong)
      case 2 => col("d") < lit(rnd.nextInt(1000) / 10.0 - 50.0)
      case 3 => col("d") >= lit(rnd.nextInt(1000) / 10.0 - 50.0)
      case 4 =>
        val w = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
        col("s").startsWith(w(rnd.nextInt(w.size)))
      case 5 => col("s").endsWith(rnd.nextInt(20).toString)
      case 6 =>
        val vals = Seq.fill(1 + rnd.nextInt(3))((rnd.nextInt(200) - 100).toLong)
        col("i").isin(vals: _*)
      case 7 =>
        val c = Seq("row_key", "i", "d", "s", "dt", "b")(rnd.nextInt(6))
        if (rnd.nextBoolean()) col(c).isNull else col(c).isNotNull
      case 8 => col("dt") > lit(java.sql.Date.valueOf(
        java.time.LocalDate.of(2026, 1, 1).plusDays(rnd.nextInt(120).toLong)))
      case 9 => col("b") === lit(rnd.nextBoolean())
      case 10 => col("p") === lit(rnd.nextInt(5)) // incl. an empty partition
      case 11 =>
        val vals = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(5))
        col("p").isin(vals: _*)
      // equality leaves on bloom-indexed columns: file-level Bloom
      // disproof is live for these (present and absent values both drawn)
      case 12 => col("i") === lit((rnd.nextInt(200) - 100).toLong)
      case 13 =>
        val w = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
        col("s") === lit(w(rnd.nextInt(w.size)) + rnd.nextInt(20))
      case 14 => col("dt") === lit(java.sql.Date.valueOf(
        java.time.LocalDate.of(2026, 1, 1).plusDays(rnd.nextInt(120).toLong)))
      case 15 => col("row_key") === lit("k" + rnd.nextInt(330)) // incl. absent
    }
    if (depth <= 0 || rnd.nextInt(3) == 0) leaf()
    else rnd.nextInt(3) match {
      case 0 => genPredicate(rnd, depth - 1) && genPredicate(rnd, depth - 1)
      case 1 => genPredicate(rnd, depth - 1) || genPredicate(rnd, depth - 1)
      case 2 => !genPredicate(rnd, depth - 1)
    }
  }

  test("random predicate trees: graft scan returns exactly the in-memory rows") {
    setup()
    val table = spark.table(full)
    val baseline = corpus
    val rnd = new scala.util.Random(4242L)
    var nonEmpty = 0
    for (n <- 1 to 60) {
      val pred = genPredicate(rnd, 3)
      val got = table.filter(pred).select("row_key")
        .collect().map(_.getString(0)).sorted.toSeq
      val want = baseline.filter(pred).select("row_key")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got == want,
        s"predicate #$n diverged (seed=4242): $pred\n" +
          s"missing=${(want.toSet -- got.toSet).take(5)} " +
          s"extra=${(got.toSet -- want.toSet).take(5)}")
      if (want.nonEmpty) nonEmpty += 1
    }
    // the generator must actually select rows, or the test proves nothing
    assert(nonEmpty >= 20, s"only $nonEmpty/60 predicates selected any rows")
  }

  test("random predicates under projection and LIMIT stay sound") {
    val table = spark.table(full)
    val rnd = new scala.util.Random(777L)
    for (n <- 1 to 15) {
      val pred = genPredicate(rnd, 2)
      // LIMIT pushdown may choose any rows, but they must satisfy the
      // predicate and count no more than the limit
      val lim = 1 + rnd.nextInt(10)
      val got = spark.table(full).filter(pred).limit(lim)
        .select("row_key").collect().map(_.getString(0)).toSeq
      val legal = corpus.filter(pred).select("row_key")
        .collect().map(_.getString(0)).toSet
      assert(got.size <= lim, s"LIMIT overrun #$n (seed=777): $pred")
      assert(got.forall(legal), s"LIMIT returned non-matching rows #$n: $pred")
      val total = corpus.filter(pred).count()
      assert(got.size == math.min(lim.toLong, total).toInt,
        s"LIMIT undershoot #$n (seed=777): $pred")
    }
    spark.sql(s"DROP TABLE $full")
  }
}
