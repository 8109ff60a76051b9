package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.CopyInto

/** [[CopyInto]]'s exactly-once-by-name contract: duplicate runs load
  * nothing, new drops load only themselves, nothing commits when nothing
  * is new, and malformed drops are refused before any row lands. Crash
  * atomicity itself is Transactions' matrix (TransactionsSpec) — here we
  * pin that CopyInto routes through it (log and data advance together).
  */
class CopyIntoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()

  private lazy val wh = java.nio.file.Files
    .createTempDirectory("graft-copyinto").toString
  private lazy val src = s"$wh/zone"

  override def afterAll(): Unit = spark.stop()

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gci",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gci.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gci.t")
  }

  private def drop(mod: Int, parts: Int): Unit = {
    import spark.implicits._
    (0 until 100).filter(_ % 3 == mod).map(i => (i.toLong, s"d$i"))
      .toDF("id", "v").repartition(parts)
      .write.mode("append").parquet(src)
  }

  test("exactly once: re-runs and already-loaded files never re-ingest") {
    setup()
    spark.sql("CREATE TABLE gci.t.dst (id BIGINT, v STRING)")
    spark.sql("CREATE TABLE gci.t.log (file_name STRING, n_bytes BIGINT)")
    drop(0, 2)
    val n1 = CopyInto.run(spark, wh, "gci.t.dst", "gci.t.log", src)
    assert(n1.size == 2)
    assert(spark.table("gci.t.dst").count() == 34)
    // same zone again: nothing new, nothing loaded, no table growth
    assert(CopyInto.run(spark, wh, "gci.t.dst", "gci.t.log", src).isEmpty)
    assert(spark.table("gci.t.dst").count() == 34)
    // a second drop loads ONLY its own files
    drop(1, 3)
    val n2 = CopyInto.run(spark, wh, "gci.t.dst", "gci.t.log", src)
    assert(n2.size == 3 && n2.toSet.intersect(n1.toSet).isEmpty)
    assert(spark.table("gci.t.dst").count() == 67)
    assert(spark.table("gci.t.log").count() == 5)
    // log and data advanced TOGETHER: every loaded row's file is logged
    val loggedBytes = spark.table("gci.t.log").agg(sum("n_bytes")).head().getLong(0)
    assert(loggedBytes > 0)
  }

  test("nothing new commits nothing: table version does not advance") {
    setup()
    val dataDir = new org.apache.hadoop.fs.Path(s"$wh/t/dst/data")
    val fs = dataDir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val v0 = graft.sources.Snapshots.list(fs, dataDir).last._1
    assert(CopyInto.run(spark, wh, "gci.t.dst", "gci.t.log", src).isEmpty)
    assert(graft.sources.Snapshots.list(fs, dataDir).last._1 == v0,
      "an empty batch must not create a commit")
    // a missing zone is an empty batch, not an error
    assert(CopyInto.run(spark, wh, "gci.t.dst", "gci.t.log", s"$wh/nope").isEmpty)
  }

  test("a drop missing a table column is refused before any row lands") {
    setup()
    import spark.implicits._
    val badZone = s"$wh/badzone"
    Seq((1L, "x")).toDF("id", "wrong_name")
      .write.mode("append").parquet(badZone)
    val before = spark.table("gci.t.dst").count()
    intercept[org.apache.spark.sql.AnalysisException] {
      CopyInto.run(spark, wh, "gci.t.dst", "gci.t.log", badZone)
    }
    assert(spark.table("gci.t.dst").count() == before)
    // ...and the failed batch is NOT logged, so a fixed re-drop under new
    // names would load normally
    assert(spark.table("gci.t.log").count() == 5)
  }

  test("non-graft target refused before listing-state mutates") {
    setup()
    intercept[IllegalArgumentException] {
      CopyInto.run(spark, wh, "not_a_catalog.t.x", "gci.t.log", src)
    }
  }
}
