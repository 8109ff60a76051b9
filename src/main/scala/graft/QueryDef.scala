package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator/query: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Queries without an oracle get the driver's weaker rows-only check.
  *
  * DDL-heavy gates (catalog table creation + INSERT commits feeding the
  * measured SELECT) declare that fixture work as `setup` so the bench can
  * time it separately: a commit-I/O regression must not masquerade as an
  * operator regression (round-7 verdict: q131's 6.1 s was 5 inserts + one
  * pruned SELECT, unattributable). `setup` MUST be idempotent (DROP IF
  * EXISTS first) — the bench runs it once and the measured query twice;
  * the composed `SparkEntry.queries` entry (setup ; run) stays
  * self-contained for the driver/Verify, which re-run it end to end.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    setup: Option[(SparkSession, String) => Unit] = None)

object QueryDef {

  /** Exact, order-independent sum of a double expression: cast each term to
    * a fixed-scale decimal so partial aggregation order cannot change the
    * result, then return a double for a stable arrow schema vs DuckDB.
    * (A raw double sum differs in final ulps between Spark's partial-agg
    * order and DuckDB's scan order and would fail the driver's hash check.)
    */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Timestamp-NTZ literal for comparisons against the corpus' NTZ columns. */
  def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  /** Engine-portable deterministic 60-bit hash (Spark side):
    * `conv(substring(md5(x), 1, 15), 16, 10)` — 15 hex chars always fit a
    * BIGINT. Every salted-hash construction (dataset splits, sampling
    * priorities, MinHash inputs) goes through this ONE spelling and its
    * DuckDB mirror [[duckMd5Long60]], so the engines can never drift. */
  def md5Long60(sparkExpr: String): String =
    s"cast(conv(substring(md5(cast($sparkExpr as binary)), 1, 15), 16, 10) as bigint)"

  /** DuckDB mirror of [[md5Long60]]: positional hex-digit arithmetic over
    * the first 15 chars of an md5 hex string (DuckDB's md5() returns hex
    * text; there is no conv()). `mdHexExpr` names the md5 column/expr. */
  def duckMd5Long60(mdHexExpr: String): String = (1 to 15)
    .map(j => s"(strpos('0123456789abcdef', substr($mdHexExpr, $j, 1)) - 1) * ${1L << (4 * (15 - j))}")
    .mkString(" + ")
}
