package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (equi-bucketed) range joins.
  *
  * Spark plans a bare `a.p BETWEEN b.lo AND b.hi` join as
  * BroadcastNestedLoopJoin (or a cartesian product when neither side fits
  * in a broadcast) — O(|A|·|B|) comparisons, the classic 100 TB cliff. The
  * scalable composition grids the range dimension: every interval explodes
  * to the bins it covers, every point maps to exactly one bin, and the join
  * becomes a plain shuffled EQUI-join on `(bin, extra keys…)` followed by
  * the exact residual predicate. Work drops to
  * O(|A| + |B|·len/width + matches); `binWidth` near the typical interval
  * length keeps the interval-side blowup ~2×.
  *
  * The reference engine has no range join at all (its only join machinery
  * is Spark's own, `SparkSqlContext.scala:60-75` builds vanilla
  * DataFrames); this is part of the engine-completeness tier, same family
  * as the native as-of join ([[AsOf]]).
  */
object RangeJoin {

  /** Join `points` to every interval in `intervals` whose
    * `[lo, hi]` (inclusive both ends) contains `point`. The range columns
    * must be integral (cast dates to epoch-day / timestamps to epoch-micros
    * first). Equality keys in `on` ride the same shuffle. Inner-join
    * semantics; each qualifying pair appears exactly once — a point lands
    * in one bin, so no post-join dedup is needed.
    *
    * Intervals where `hi < lo` match nothing (dropped, matching SQL
    * BETWEEN). The interval side must not contain nulls in `lo`/`hi`
    * (filtered out, again matching BETWEEN semantics).
    */
  def pointInInterval(
      points: DataFrame,
      point: String,
      intervals: DataFrame,
      lo: String,
      hi: String,
      binWidth: Long,
      on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin", floor(col(point) / binWidth))
    val iv = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin",
        explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    p.join(iv, Seq("__bin") ++ on)
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__bin")
  }

  /** Join two interval relations on overlap:
    * `l.lo <= r.hi AND r.lo <= l.hi` (closed intervals). Both sides explode
    * to covered bins; a pair that shares several bins is emitted only from
    * the FIRST bin both cover (`max(floor(lo/w))`), so the result is
    * duplicate-free without a distinct shuffle. */
  def intervalOverlap(
      left: DataFrame,
      llo: String,
      lhi: String,
      right: DataFrame,
      rlo: String,
      rhi: String,
      binWidth: Long,
      on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def gridded(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin",
        explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    val l = gridded(left, llo, lhi)
    val r = gridded(right, rlo, rhi)
    l.join(r, Seq("__bin") ++ on)
      .filter(
        col(llo) <= col(rhi) && col(rlo) <= col(lhi) &&
        col("__bin") === greatest(
          floor(col(llo) / binWidth), floor(col(rlo) / binWidth)))
      .drop("__bin")
  }
}
