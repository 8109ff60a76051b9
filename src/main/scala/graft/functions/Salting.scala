package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual counterpart to AQE's
  * skew-join splitting, usable when the skew is known up front (e.g. a
  * power-law user_id in a 100 TB event log):
  *
  *  - [[saltedJoin]]: the big side gets a deterministic salt derived from
  *    a high-cardinality column, the small side is replicated once per
  *    salt value, and the join key becomes (key, salt) — a hot key's rows
  *    spread over `buckets` reducers instead of one.
  *  - [[saltedAggregate]]: two-phase aggregation (partial per (key, salt),
  *    final per key) for skewed groupBy when map-side combine isn't
  *    enough.
  *
  * Results are identical to the unsalted equivalents (verified in
  * SaltingSpec); only the shuffle layout changes.
  */
object Salting {

  /** Deterministic salt in [0, buckets) from a discriminator column —
    * deterministic so task retries re-produce identical placement. */
  def saltCol(discriminator: Column, buckets: Int): Column =
    pmod(hash(discriminator), lit(buckets))

  /** Inner equi-join `big.key = small.key` with the big side salted and
    * the small side replicated `buckets`×. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      discriminator: String,
      buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", saltCol(col(discriminator), buckets))
    val replicated = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${buckets - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase count+sum aggregation over a skewed key. */
  def saltedAggregate(
      df: DataFrame,
      key: String,
      valueCol: String,
      discriminator: String,
      buckets: Int): DataFrame =
    df.withColumn("__salt", saltCol(col(discriminator), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
}
