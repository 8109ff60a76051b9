package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: ordered by (score DESC, id ASC) — the exact
  * `ORDER BY cos DESC, vid` tie-break of the window formulation it
  * replaces, so results stay oracle-identical. */
final case class TopKIn(score: Double, id: Long)

/** Buffer: at most k items, kept sorted by (score DESC, id ASC). */
final case class TopKBuf(items: Seq[TopKIn])

/** Per-group top-k selection as a typed `Aggregator` — the skew-free
  * replacement for `row_number().over(Window.partitionBy(qid))` on the
  * brute-force ANN probes (q27/q135): the window shuffles ALL
  * (queries × corpus) pairs into #queries partitions, each receiving a
  * corpus-sized partition through one reducer. As a hash aggregate with
  * map-side partial merge (like [[CentroidAgg]]), each input partition
  * folds its pairs into per-query k-item buffers locally, so the
  * shuffle moves O(partitions × queries × k) rows regardless of corpus
  * size and no reducer ever sees a corpus-sized group. */
final case class TopKAgg(k: Int) extends Aggregator[TopKIn, TopKBuf, Seq[TopKIn]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def lt(a: TopKIn, b: TopKIn): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: TopKIn): TopKBuf = {
    // fast reject: a full buffer whose worst item beats `a` is unchanged
    if (b.items.length >= k && !lt(a, b.items.last)) b
    else {
      val i = b.items.indexWhere(x => lt(a, x))
      val at = if (i < 0) b.items.length else i
      TopKBuf((b.items.take(at) :+ a) ++ b.items.drop(at) take k)
    }
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    if (x.items.isEmpty) y
    else if (y.items.isEmpty) x
    else y.items.foldLeft(x)(reduce)

  override def finish(b: TopKBuf): Seq[TopKIn] = b.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[TopKIn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKIn]]()
}
