package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Transactions

/** Exactly-once streaming derived-table maintenance: DerivedMaintain
  * derives each source delta once — through replays, fresh checkpoints,
  * and transactions a crashed predecessor left mid-protocol.
  */
class DerivedMaintainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_dm").toString

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.catalog.dmc", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.dmc.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def transform(delta: DataFrame): Seq[(String, DataFrame)] =
    Seq("dmc.t.d" -> delta.select(col("id"), (col("v") * 2).as("v2")))

  // recoverAgeMillis = 0: this suite IS the only coordinator user, and
  // the predecessor-crash tests need young undecided intents rolled back
  // immediately (production keeps the 1 h default)
  private def drain(ckpt: String): Unit =
    graft.streaming.DerivedMaintain.start(
      spark, "dmc.t.s", "dmc.t.meta", ckpt, transform,
      recoverAgeMillis = 0L).awaitTermination()

  private def derivedRows: Seq[(Long, Long)] =
    spark.sql("SELECT id, v2 FROM dmc.t.d ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def expectedRows: Seq[(Long, Long)] =
    spark.sql("SELECT id, v * 2 FROM dmc.t.s ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("setup: source, derived, watermark tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dmc.t")
    spark.sql("CREATE TABLE dmc.t.s (id BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE dmc.t.d (id BIGINT, v2 BIGINT)")
    spark.sql("CREATE TABLE dmc.t.meta (indexed_version BIGINT)")
    spark.sql("INSERT INTO dmc.t.s VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO dmc.t.s VALUES (3, 30)")
  }

  test("each delta is derived once; watermark tracks the source head") {
    val ckpt = Files.createTempDirectory("dm1").toString
    drain(ckpt)
    assert(derivedRows === expectedRows, "derived must equal the transform")
    spark.sql("INSERT INTO dmc.t.s VALUES (4, 40), (5, 50)")
    drain(ckpt)
    assert(derivedRows === expectedRows, "second drain derives only the delta")
    assert(derivedRows.size === 5, "no row may be derived twice")
  }

  test("a fresh checkpoint replays the stream but derives nothing new") {
    drain(Files.createTempDirectory("dm2").toString)
    assert(derivedRows === expectedRows)
    assert(derivedRows.size === 5, "watermark must gate replayed batches")
  }

  test("decided-but-unfinished predecessor: healed forward, derived once") {
    // a prior maintainer derived the outstanding delta, decided its
    // transaction, and died before publishing anything
    spark.sql("INSERT INTO dmc.t.s VALUES (6, 60)")
    val srcDir = s"$warehouse/t/s"
    val delta = spark.read.option("since-version",
        spark.table("dmc.t.meta").agg(max("indexed_version")).head().getLong(0))
      .table("dmc.t.s")
    val dataDir = new org.apache.hadoop.fs.Path(srcDir, "data")
    val fs = dataDir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val now = graft.sources.TableStats.liveVersion(fs, dataDir).get
    import spark.implicits._
    val txn = Transactions.begin(spark, srcDir)
    transform(delta).foreach { case (t, df) => txn.write(t, df) }
    txn.write("dmc.t.meta", Seq(now).toDF("indexed_version"))
    txn.writeIntent()
    txn.decide()
    // the new maintainer must publish the predecessor's work, see the
    // advanced watermark, and NOT derive the range again
    drain(Files.createTempDirectory("dm3").toString)
    assert(derivedRows === expectedRows)
    assert(derivedRows.size === 6, "healed-forward delta must appear exactly once")
  }

  test("undecided predecessor: rolled back, then derived exactly once") {
    spark.sql("INSERT INTO dmc.t.s VALUES (7, 70)")
    val srcDir = s"$warehouse/t/s"
    val delta = spark.read.option("since-version",
        spark.table("dmc.t.meta").agg(max("indexed_version")).head().getLong(0))
      .table("dmc.t.s")
    val dataDir = new org.apache.hadoop.fs.Path(srcDir, "data")
    val fs = dataDir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val now = graft.sources.TableStats.liveVersion(fs, dataDir).get
    import spark.implicits._
    val txn = Transactions.begin(spark, srcDir)
    transform(delta).foreach { case (t, df) => txn.write(t, df) }
    txn.write("dmc.t.meta", Seq(now).toDF("indexed_version"))
    txn.writeIntent() // dies before deciding
    drain(Files.createTempDirectory("dm4").toString)
    assert(derivedRows === expectedRows)
    assert(derivedRows.size === 7,
      "rolled-back stage must not surface beside the live re-derive")
  }
}
