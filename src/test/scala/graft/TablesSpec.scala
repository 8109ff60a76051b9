package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `Tables.normalizeEventTime` is the single place the engine absorbs
  * corpus event-time encoding changes (the round-5 regression): every
  * supported physical encoding must normalize to the same (`ts`
  * TIMESTAMP_NTZ, `ts_ns` epoch-nanos) pair. */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // one instant, three encodings: 2024-01-05T06:07:08.123456 UTC
  private val micros = 1704434828123456L
  private val nanos = micros * 1000L

  test("legacy long-nanos encoding: ts derived, ts_ns passes through") {
    import spark.implicits._
    val df = Seq((1L, nanos)).toDF("event_id", "ts")
    val out = Tables.normalizeEventTime(df)
    assert(out.schema("ts").dataType.typeName == "timestamp_ntz")
    val r = out.select(col("ts").cast("string"), col("ts_ns")).head()
    assert(r.getString(0) == "2024-01-05 06:07:08.123456")
    assert(r.getLong(1) == nanos)
  }

  test("timestamp_ntz encoding (current corpus): ts passes through, ts_ns derived") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-05 06:07:08.123456")).toDF("event_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = Tables.normalizeEventTime(df)
    assert(out.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(out.select(col("ts_ns")).head().getLong(0) == nanos)
  }

  test("instant-typed timestamp encoding: both derived under the UTC session") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-05 06:07:08.123456")).toDF("event_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Tables.normalizeEventTime(df)
    assert(out.schema("ts").dataType.typeName == "timestamp_ntz")
    val r = out.select(col("ts").cast("string"), col("ts_ns")).head()
    assert(r.getString(0) == "2024-01-05 06:07:08.123456")
    assert(r.getLong(1) == nanos)
  }

  test("an unsupported ts type refuses loudly") {
    import spark.implicits._
    val df = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeEventTime(df))
    assert(e.getMessage.contains("events.ts"))
  }

  test("all three encodings of the same rows normalize identically") {
    import spark.implicits._
    // micros-aligned offsets: parquet timestamp[us] cannot carry sub-micro
    // precision, so only aligned instants are representable in BOTH encodings
    val rows = Seq((1L, nanos), (2L, nanos + 987654000L), (3L, nanos - 55L * 1000L))
    val fromNanos = Tables.normalizeEventTime(rows.toDF("event_id", "ts"))
    val fromNtz = Tables.normalizeEventTime(
      rows.toDF("event_id", "ts_raw")
        .withColumn("ts", timestamp_micros(expr("ts_raw div 1000")).cast("timestamp_ntz"))
        .drop("ts_raw"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("ts").cast("string"), col("ts_ns"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(canon(fromNanos) == canon(fromNtz))
  }
}
