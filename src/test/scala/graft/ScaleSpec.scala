package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Salting

/** Scale-technique correctness: salting must not change results, sketches
  * must land within advertised error bounds, and the streaming graft sink
  * must persist rows durably. */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse",
      java.nio.file.Files.createTempDirectory("graft_wh_scale").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join equals plain join") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"), col("l_orderkey"))
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    val plain = li.join(sup, "suppkey")
      .groupBy(col("s_name")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val salted = Salting.saltedJoin(li, sup, "suppkey", "l_orderkey", 8)
      .groupBy(col("s_name")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("salted aggregation equals plain aggregation") {
    val ev = graft.Tables(spark, dir).events
    val plain = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toSet
    val salted = Salting.saltedAggregate(ev, "user_id", "value", "event_id", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("sketches: approx_count_distinct and percentile_approx within bounds") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")

    val exactMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val sketchMedian = li
      .select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    assert(math.abs(sketchMedian - exactMedian) / exactMedian < 0.02,
      s"sketch=$sketchMedian exact=$exactMedian")
  }

  test("streaming write into a graft table persists rows") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val sdir = Files.createTempDirectory("graft_stream_sink")
    Files.copy(Paths.get(s"$dir/events.parquet"), sdir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val batch = spark.read.parquet(sdir.toString)

    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stream")
    spark.sql("DROP TABLE IF EXISTS graft.stream.events_sink")
    spark.sql(
      """CREATE TABLE graft.stream.events_sink (
        |  event_id BIGINT, ts BIGINT, user_id BIGINT,
        |  event_type STRING, value DOUBLE, props STRING)""".stripMargin)

    val q = spark.readStream.schema(batch.schema).parquet(sdir.toString)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sink_ckpt").toString)
      .toTable("graft.stream.events_sink")
    try q.processAllAvailable() finally q.stop()

    assert(spark.table("graft.stream.events_sink").count() == batch.count())
  }
}
