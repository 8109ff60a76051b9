package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator/query: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Queries without an oracle get the driver's weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

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
}
