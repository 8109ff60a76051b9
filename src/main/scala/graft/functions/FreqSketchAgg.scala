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

  /** Working-set ceiling: trims are DEFERRED until the buffer holds
    * 2×capacity entries, then cut back to ≤ capacity in one pass. A
    * per-insert trim would sort + rebuild the map on every token once at
    * capacity — O(capacity log capacity) steady-state per token, which is
    * impractical at the capacities a 100 TB corpus wants (~1e5). Deferring
    * makes a trim run only after ≥ capacity NEW keys arrived, so the
    * amortized per-token cost is O(log capacity) while memory stays within
    * 2× the declared budget. The MG bound is unchanged: each batch trim
    * subtracts δ from > capacity entries, accounting ≥ (capacity+1)·δ of
    * input mass, so total undercount stays ≤ N/(capacity+1) — the same
    * argument that covers the merge-then-trim of two capacity-sized
    * summaries (Agarwal et al. 2012). */
  private val ceiling = 2 * capacity

  /** Cut a summed map down to ≤ `target` entries by subtracting the
    * (target+1)-th largest count from every entry and dropping the
    * non-positive ones — the mergeable-summaries rule. Deterministic:
    * the subtracted value depends only on the multiset of counts. */
  private def trimTo(m: Map[String, Long], target: Int): Map[String, Long] =
    if (m.size <= target) m
    else {
      // (target+1)-th largest count (counts sorted descending)
      val kth = m.valuesIterator.toArray.sortBy(-_).apply(target)
      m.iterator.collect { case (k, v) if v > kth => k -> (v - kth) }.toMap
    }

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] = {
    val u = b.updated(tok, b.getOrElse(tok, 0L) + 1L)
    if (u.size > ceiling) trimTo(u, capacity) else u
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      val u = y.foldLeft(x) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (u.size > ceiling) trimTo(u, capacity) else u
    }

  /** The declared contract is a ≤ capacity-entry summary; the deferred
    * working set is cut back here (a no-op in the exactness regime). */
  override def finish(b: Map[String, Long]): Map[String, Long] =
    trimTo(b, capacity)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
