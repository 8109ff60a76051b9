package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items ("heavy hitters") summary as a typed
  * `Aggregator` — the mergeable-sketch answer to "top tokens over a
  * 100 TB corpus" that never materializes the full token→count table.
  *
  * Each input partition folds its tokens into a ≤`capacity`-entry
  * summary locally (map-side partial aggregation, like [[CentroidAgg]]/
  * [[TopKAgg]]); the shuffle then moves O(partitions × capacity)
  * entries instead of one row per distinct token. Compare the exact
  * formulation (`groupBy(token).count()`): correct, but its shuffle is
  * O(distinct tokens) and a skewed vocabulary puts the hottest token's
  * whole count stream through one reducer.
  *
  * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *  - estimates never OVERcount: `est(x) <= true(x)`;
  *  - undercount is bounded: `true(x) - est(x) <= N / (capacity+1)`
  *    where N = total items folded in — regardless of merge order or
  *    partitioning;
  *  - every x with `true(x) > N/(capacity+1)` is present in the output.
  *
  * EXACTNESS REGIME: while the number of distinct keys ever resident
  * stays ≤ `capacity`, no decrement ever fires and the summary is the
  * exact count map (order-independent: just pointwise sums). q149 runs
  * there (capacity 64 ≥ the corpus' vocabulary), which is what makes it
  * DuckDB-oracle-checkable; the sub-capacity approximation regime is
  * asserted against the bounds above in FreqSketchSpec.
  */
final case class FreqSketchAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"frequent-items sketch needs capacity > 0, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  /** Trim a summed map down to ≤ capacity entries by subtracting the
    * (capacity+1)-th largest count from every entry and dropping the
    * non-positive ones — the mergeable-summaries rule. Deterministic:
    * the subtracted value depends only on the multiset of counts. */
  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      // (capacity+1)-th largest count (counts sorted descending)
      val kth = m.valuesIterator.toArray.sortBy(-_).apply(capacity)
      m.iterator.collect { case (k, v) if v > kth => k -> (v - kth) }.toMap
    }

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    trim(b.updated(tok, b.getOrElse(tok, 0L) + 1L))

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else trim(y.foldLeft(x) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    })

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
