package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group embedding centroid as a typed `Aggregator` — the custom
  * user-facing aggregate path (the reference defines zero aggregates,
  * SURVEY.md §2.2; this is the k-means update step a trained IVF coarse
  * quantizer needs). Elements are quantized to integers at 1e9 scale in
  * the buffer so partial-merge order cannot change the result — the mean
  * is bit-deterministic and oracle-comparable.
  */
object CentroidAgg extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {

  override def zero: CentroidBuf = CentroidBuf(Array.empty, 0L)

  override def reduce(b: CentroidBuf, a: Seq[Float]): CentroidBuf = {
    val sums = if (b.sums.isEmpty) new Array[Double](a.length) else b.sums
    var i = 0
    while (i < a.length) { sums(i) += math.round(a(i).toDouble * 1e9).toDouble; i += 1 }
    CentroidBuf(sums, b.n + 1)
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf =
    if (x.n == 0) y
    else if (y.n == 0) x
    else {
      val sums = new Array[Double](x.sums.length)
      var i = 0
      while (i < sums.length) { sums(i) = x.sums(i) + y.sums(i); i += 1 }
      CentroidBuf(sums, x.n + y.n)
    }

  override def finish(b: CentroidBuf): Seq[Double] =
    b.sums.map(s => (s / b.n) / 1e9).toSeq

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

final case class CentroidBuf(sums: Array[Double], n: Long)

/** Double-input sibling of [[CentroidAgg]] — same 1e9 integer quantization,
  * same order-independent exactness. This is the k-means update step as one
  * hash aggregate with map-side partial merge: each partition folds its rows
  * into a single k×d buffer, so the shuffle moves O(partitions × k × d)
  * bytes regardless of corpus size.
  */
object CentroidAggD extends Aggregator[Seq[Double], CentroidBuf, Seq[Double]] {

  /** Exactly SQL round(x) on this domain: binary half-away-from-zero via
    * [[QuantProdSum.roundHalfAway]] — for |x| < 2^52 it coincides with
    * Spark's HALF_UP-on-shortest-decimal `Round` AND DuckDB's binary
    * half-away round (the QuantProdSum class doc carries the proof; scale
    * 1e9 on unit-magnitude embeddings keeps |x| ≤ ~1e10 ≪ 2^52, and the
    * oracles already pin all three agreeing). Replaces a per-element
    * BigDecimal allocation (`BigDecimal.valueOf().setScale()`) that
    * dominated the Lloyd update's aggregate at corpus × d × iterations
    * calls — pure CPU, bit-identical results. */
  private def rnd(x: Double): Double = QuantProdSum.roundHalfAway(x)

  override def zero: CentroidBuf = CentroidBuf(Array.empty, 0L)

  override def reduce(b: CentroidBuf, a: Seq[Double]): CentroidBuf = {
    val sums = if (b.sums.isEmpty) new Array[Double](a.length) else b.sums
    var i = 0
    while (i < a.length) { sums(i) += rnd(a(i) * 1e9); i += 1 }
    CentroidBuf(sums, b.n + 1)
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf =
    CentroidAgg.merge(x, y)

  override def finish(b: CentroidBuf): Seq[Double] =
    b.sums.map(s => (s / b.n) / 1e9).toSeq

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
