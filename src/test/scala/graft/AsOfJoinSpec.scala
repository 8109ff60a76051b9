package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.AsOf

/** The native as-of join operator must agree with the compositional
  * union+window implementation (q18, itself DuckDB-ASOF-verified), across
  * partition counts and with unmatched left rows. */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("native as-of join equals the compositional q18 result") {
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("s_ts"))

    val native = AsOf.joinBackward(purchases, signups, Seq("user_id"), "ts", "s_ts")
      .select(col("purchase_id"), col("signup_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    val want = SparkEntry.queries("q18_asof_join")(spark, dir)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(native == want && native.nonEmpty)
    // some purchases precede any signup → null path exercised
    assert(native.exists(_._2 == -1L) || want.forall(_._2 != -1L))
  }

  test("physical plan shows the custom operator with co-partitioned sorted inputs") {
    val ev = Tables(spark, dir).events
    val l = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "signup").select(col("user_id"), col("ts").as("s_ts"))
    val df = AsOf.joinBackward(l, r, Seq("user_id"), "ts", "s_ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    assert(plan.contains("Sort"), "expected sorted children")
  }

  test("duplicate on-values and repartitioned inputs stay correct") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag").repartition(5)
    val r = Seq((1L, 10L, "x"), (1L, 3L, "y"), (3L, 1L, "z"))
      .toDF("k", "rt", "rtag").repartition(3)
    val got = AsOf.joinBackward(l, r, Seq("k"), "t", "rt")
      .select(col("tag"), col("rtag"))
      .collect().map(x => (x.getString(0), Option(x.getString(1)).getOrElse("-"))).toSet
    // t=10 matches rt=10 exactly (<=); t=5 matches rt=3; k=2 has no right rows
    assert(got == Set(("a", "x"), ("b", "x"), ("c", "y"), ("d", "-")))
  }

  test("date and sub-second timestamp on-columns join without unit truncation") {
    import spark.implicits._
    // date keys (internal day ints)
    val l = Seq((1L, "2024-03-10", "a"), (1L, "2024-03-01", "b"))
      .toDF("k", "t", "tag").withColumn("t", col("t").cast("date"))
    val r = Seq((1L, "2024-03-05", "x"), (1L, "2024-02-01", "y"))
      .toDF("k", "rt", "rtag").withColumn("rt", col("rt").cast("date"))
    val gotDates = AsOf.joinBackward(l, r, Seq("k"), "t", "rt")
      .select(col("tag"), col("rtag"))
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(gotDates == Set(("a", "x"), ("b", "y")))

    // timestamps differing only below the second: a cast-to-long (seconds)
    // key would collapse 12:00:00.2 and 12:00:00.7 and mismatch
    val lt = Seq((1L, "2024-03-10 12:00:00.300", "p"))
      .toDF("k", "t", "tag").withColumn("t", col("t").cast("timestamp_ntz"))
    val rt = Seq((1L, "2024-03-10 12:00:00.200", "early"),
        (1L, "2024-03-10 12:00:00.700", "late"))
      .toDF("k", "rt", "rtag").withColumn("rt", col("rt").cast("timestamp_ntz"))
    val gotTs = AsOf.joinBackward(lt, rt, Seq("k"), "t", "rt")
      .select(col("rtag")).collect().map(_.getString(0)).toSet
    assert(gotTs == Set("early"))
  }
}
