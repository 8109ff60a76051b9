package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.RangeJoin

/** The binned range join must equal the naive BETWEEN join exactly —
  * duplicate-free without a distinct — across bin widths (including widths
  * much smaller and much larger than the intervals), and must plan as an
  * equi-join (no BroadcastNestedLoop / cartesian). */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import scala.jdk.CollectionConverters._
  private def df(rows: Seq[org.apache.spark.sql.Row], schema: String) =
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  private val R = org.apache.spark.sql.Row

  // Deterministic pseudo-random fixture: intervals of wildly mixed length
  // (including empty hi<lo and null bounds), points across the full span.
  private lazy val intervals = {
    val rows = (0 until 400).map { i =>
      val lo = (i * 37 % 1000).toLong
      val len = (i * i % 97).toLong - 3 // some hi < lo
      if (i % 50 == 49) R(i.toLong, null, lo + len)
      else R(i.toLong, lo, lo + len)
    }
    df(rows, "iv_id BIGINT, lo BIGINT, hi BIGINT")
  }
  private lazy val points =
    df((0 until 300).map(i => R(i.toLong, (i * 13 % 1100).toLong - 20)),
      "p_id BIGINT, p BIGINT")

  private def naivePairs: Set[(Long, Long)] =
    points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"), "inner")
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pointInInterval equals the naive BETWEEN join at several bin widths") {
    val want = naivePairs
    assert(want.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 10000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicates at binWidth=$w")
      assert(got.toSet == want, s"mismatch at binWidth=$w")
    }
  }

  test("pointInInterval with equality keys restricts to key-matched pairs") {
    val ivK = intervals.withColumn("k", col("iv_id") % 3)
    val pK = points.withColumn("k", col("p_id") % 3)
    val want = pK.join(ivK.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = RangeJoin.pointInInterval(pK, "p", ivK, "lo", "hi", 32L, Seq("k"))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty && got.size < naivePairs.size)
  }

  test("intervalOverlap equals the naive overlap join, duplicate-free") {
    val left = intervals.select(col("iv_id").as("l_id"),
      col("lo").as("llo"), col("hi").as("lhi")).filter(col("l_id") < 150)
    val right = intervals.select(col("iv_id").as("r_id"),
      col("lo").as("rlo"), col("hi").as("rhi")).filter(col("r_id") >= 150)
    // The naive formula alone would also "match" inverted (hi < lo)
    // intervals; the operator's closed-interval semantics exclude them.
    val want = left.filter(col("llo") <= col("lhi"))
      .join(right.filter(col("rlo") <= col("rhi")),
        col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    for (w <- Seq(5L, 64L, 100000L)) {
      val got = RangeJoin.intervalOverlap(
          left, "llo", "lhi", right, "rlo", "rhi", w)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicates at binWidth=$w")
      assert(got.toSet == want, s"mismatch at binWidth=$w")
    }
  }

  test("binned plan is an equi-join: no BroadcastNestedLoop, no cartesian") {
    // Disable broadcast so a non-equi join would surface as cartesian.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 64L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
        s"range join fell back to a product plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
