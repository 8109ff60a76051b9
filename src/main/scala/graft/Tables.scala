package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated corpus (TESTDATA.md).
  *
  * One accessor per table; all plain parquet scans so Catalyst predicate
  * pushdown / column pruning apply (SURVEY.md §4 — the reference got this
  * from a custom HBase scan; we get the stronger Parquet version for free).
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** The events table, with its event-time column NORMALIZED: whatever
    * encoding the corpus ships (`timestamp[us]` today; INT64 nanos in
    * earlier drops), callers always see
    *
    *  - `ts`    TIMESTAMP_NTZ — the native timestamp, for date_trunc /
    *            window / session_window / as-of semantics;
    *  - `ts_ns` BIGINT epoch nanoseconds — for exact gap/range arithmetic
    *            (window RANGE frames, sessionize gaps, bucket math).
    *
    * See [[Tables.normalizeEventTime]].
    */
  def events: DataFrame = {
    // harmless when the corpus is timestamp[us]; lets a legacy INT64
    // TIMESTAMP(NANOS) drop load as raw longs instead of erroring
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTime(t("events"))
  }
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Epoch nanoseconds for a TIMESTAMP_NTZ column. NTZ has no instant
    * semantics, so the wall-clock value is interpreted in UTC — every graft
    * entry point (Verify, Bench, the specs) pins
    * `spark.sql.session.timeZone=UTC`, making the cast below exact. */
  def ntzEpochNs(ts: Column): Column =
    (unix_micros(ts.cast(TimestampType)) * lit(1000L)).cast(LongType)

  /** Normalize a frame's `ts` event-time column to the canonical pair
    * (`ts` TIMESTAMP_NTZ, `ts_ns` BIGINT epoch nanos), dispatching on the
    * loaded type — the single place the engine absorbs corpus encoding
    * changes (round 5 broke seven queries when the corpus moved from INT64
    * nanos to parquet `timestamp[us]`; this is the fix-at-the-source).
    * Works on batch and streaming frames alike (pure schema dispatch, no
    * actions). */
  def normalizeEventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // legacy corpus: INT64 epoch nanoseconds
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampNTZType => // current corpus: parquet timestamp[us]
        df.withColumn("ts_ns", ntzEpochNs(col("ts")))
      case TimestampType =>
        df.withColumn("ts_ns", (unix_micros(col("ts")) * lit(1000L)).cast(LongType))
          .withColumn("ts", col("ts").cast(TimestampNTZType))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: expected LongType nanos or a timestamp type, got $other")
    }
}
