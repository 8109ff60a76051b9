package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Randomized soundness for the aggregate-pushdown tier: random
  * combinations of aggregates (COUNT(*) / COUNT(col) / MIN / MAX /
  * SUM), GROUP BY shapes (none / identity-partition / non-partition),
  * predicates (including absorbable partition predicates), and snapshot
  * pinning over a null-rich multi-file table must return exactly what
  * the identical in-memory DataFrame returns. The registry fold has
  * many eligibility branches (complete vs partial vs withheld pushdown,
  * null-count evidence, widened columns, absorbed WHEREs, delete-file
  * presence); this walks random paths through all of them and fails
  * with the reproducing seed and query shape.
  */
class AggPushdownFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_aggfuzz_wh").toString

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

  private val full = "graft.aggfuzz.t"

  /** Deterministic corpus, built in 5 batches; batch index is kept so the
    * in-memory side can replay any pinned prefix exactly. */
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val rows = (0 until 400).map { i =>
      val iv: java.lang.Long =
        if (rnd.nextInt(7) == 0) null
        else java.lang.Long.valueOf((rnd.nextInt(400) - 200).toLong)
      val sv =
        if (rnd.nextInt(9) == 0) null
        else Vector("ant", "bee", "cat", "dog", "elk")(rnd.nextInt(5)) + rnd.nextInt(30)
      val dt =
        if (rnd.nextInt(11) == 0) null
        else java.sql.Date.valueOf(java.time.LocalDate.of(2026, 2, 1)
          .plusDays(rnd.nextInt(90).toLong))
      (s"k$i", i % 3, i % 5, iv, sv, dt)
    }
    rows.toDF("row_key", "batch", "p", "i", "s", "dt")
  }

  // snapshot version recorded after each insert batch
  private val pinned = scala.collection.mutable.ArrayBuffer[(Long, Int)]()

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.aggfuzz")
    spark.sql(s"""CREATE TABLE $full (
                 |  row_key STRING, batch INT, p INT, i BIGINT, s STRING, dt DATE)
                 |PARTITIONED BY (p)""".stripMargin)
    val d = new org.apache.hadoop.fs.Path(s"$warehouse/aggfuzz/t/data")
    val fs = d.getFileSystem(new org.apache.hadoop.conf.Configuration())
    (0 until 5).foreach { b =>
      corpus.filter(col("batch") === b).writeTo(full).append()
      pinned += ((Snapshots.list(fs, d).last._1, b))
    }
  }

  private def genPredicate(rnd: scala.util.Random): Option[Column] =
    rnd.nextInt(5) match {
      case 0 => None
      case 1 => Some(col("p") === lit(rnd.nextInt(6))) // absorbable (or empty)
      case 2 => Some(col("p").isin(rnd.nextInt(5), rnd.nextInt(5)))
      case 3 => Some(col("i") > lit((rnd.nextInt(400) - 200).toLong)) // residual
      case 4 => Some(col("s").isNotNull)
    }

  private def genAggs(rnd: scala.util.Random): Seq[Column] = {
    val pool = Vector(
      count(lit(1)).as("cnt"),
      count(col("i")).as("cnt_i"),
      count(col("s")).as("cnt_s"),
      min(col("i")).as("min_i"),
      max(col("i")).as("max_i"),
      sum(col("i")).as("sum_i"),
      min(col("s")).as("min_s"),
      max(col("s")).as("max_s"),
      min(col("dt")).as("min_dt"),
      max(col("dt")).as("max_dt"))
    val n = 1 + rnd.nextInt(4)
    rnd.shuffle(pool).take(n)
  }

  private def runShape(base: DataFrame, mem: DataFrame,
                       rnd: scala.util.Random, tag: String): Unit = {
    val pred = genPredicate(rnd)
    val aggs = genAggs(rnd)
    val groupBy = rnd.nextInt(4) match {
      case 0 | 1 => Nil // global (complete-pushdown shape)
      case 2 => Seq("p") // identity partition (grouped fold)
      case 3 => Seq("batch") // non-partition (partial pushdown)
    }
    def shape(df: DataFrame): Seq[Seq[Any]] = {
      val f = pred.map(df.filter).getOrElse(df)
      val g =
        if (groupBy.isEmpty) f.agg(aggs.head, aggs.tail: _*)
        else f.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
      g.collect().map(_.toSeq).toSeq
        .sortBy(_.mkString("|"))
    }
    val got = shape(base)
    val want = shape(mem)
    assert(got == want,
      s"$tag diverged: groupBy=$groupBy pred=$pred aggs=${aggs.mkString(",")}" +
        s"\ngot=$got\nwant=$want")
  }

  test("random aggregate shapes over the live table match the in-memory frame") {
    setup()
    val rnd = new scala.util.Random(9001L)
    val table = spark.table(full)
    for (n <- 1 to 50) runShape(table, corpus, rnd, s"live #$n (seed=9001)")
  }

  test("random aggregate shapes over pinned snapshots match the batch prefix") {
    val rnd = new scala.util.Random(9002L)
    for (n <- 1 to 20) {
      val (v, b) = pinned(rnd.nextInt(pinned.size))
      val table = spark.read.option("snapshot-version", v).table(full)
      val mem = corpus.filter(col("batch") <= b)
      runShape(table, mem, rnd, s"pinned v$v (batches<=$b) #$n (seed=9002)")
    }
  }

  test("random aggregate shapes survive a row-level delete (fold ineligibility)") {
    // a COW delete rewrites files; folds must keep answering correctly
    // from the rewritten registry
    spark.sql(s"DELETE FROM $full WHERE i < -150")
    val mem = corpus.filter(col("i").isNull || col("i") >= -150)
    val rnd = new scala.util.Random(9003L)
    val table = spark.table(full)
    for (n <- 1 to 20) runShape(table, mem, rnd, s"post-delete #$n (seed=9003)")
    spark.sql(s"DROP TABLE $full")
  }
}
