package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType}

/** `quant_dot(a, b, scale)` — the engine's quantized inner product as ONE
  * native expression:
  *
  *   Σᵢ round(aᵢ · bᵢ · scale)
  *
  * bit-identical to the spelled-out
  * `aggregate(zip_with(a, b, (x, y) -> round(x * y * scale)), 0D, (acc, p) -> acc + p)`
  * (same left-to-right accumulation in double, same per-element HALF_UP
  * rounding, same null poisoning: null array, length mismatch — zip_with
  * pads with nulls — or any null element yields NULL), and to the DuckDB
  * oracle's `list_sum(list_transform(...))` replay. `quant_dot(e, e, s)`
  * is the quantized squared norm.
  *
  * Why it exists: the higher-order-function spelling evaluates an
  * interpreted lambda per ELEMENT (closure dispatch + boxing + a
  * BigDecimal-based Round), which is the entire cost of the k-means /
  * ANN / SemDeDup bench tail — corpus × k × d interpreted steps. This
  * expression runs the loop as one compiled method over primitive
  * `ArrayData` slots (whole-stage codegen at top level, and still a
  * single compiled call when nested inside a remaining higher-order
  * lambda), with an exact integer-boundary rounding that avoids
  * per-element BigDecimal entirely.
  *
  * Rounding exactness: Spark's `round(double)` is HALF_UP on the value's
  * SHORTEST-DECIMAL form; DuckDB's is half-away-from-zero on the binary
  * value. For |x| < 2^52 these agree with each other and with the binary
  * half-away-from-zero this class computes, because k ± 0.5 is exactly
  * representable there (a shortest decimal ≥ k+0.5 cannot round-trip to
  * a double < k+0.5). The naive `floor(x + 0.5)` is NOT that function —
  * adding 0.5 can double-round across the tie (x = 0.49999999999999994,
  * the old JDK Math.round bug) — so [[QuantProdSum.roundHalfAway]]
  * detects the landed-exactly-on-integer case and corrects it. Scales
  * used here (1e6, 1e9) on unit-magnitude data keep |x| ≤ ~1e10 ≪ 2^52.
  * NaN/±Inf pass through like Spark's Round (and poison the sum to the
  * same NaN/Inf the HOF chain produces).
  */
case class QuantProdSum(left: Expression, right: Expression, scale: Expression)
    extends TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = scale

  private def arrayish(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayish(left.dataType) && arrayish(right.dataType) &&
        scale.dataType == DoubleType && scale.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "quant_dot requires (array<double>, array<double>, foldable double scale); " +
        s"got (${left.dataType}, ${right.dataType}, ${scale.dataType})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quant_dot"

  override def nullSafeEval(l: Any, r: Any, s: Any): Any =
    QuantProdSum.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r, s) => {
      val tmp = ctx.freshName("qps")
      s"""
         |java.lang.Double $tmp = graft.functions.QuantProdSum.compute($l, $r, $s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): QuantProdSum =
    copy(left = newFirst, right = newSecond, scale = newThird)
}

/** `quant_dist2(a, b, scale)` — Σᵢ round((aᵢ−bᵢ)²·scale), the quantized
  * squared Euclidean distance (the PQ codebook-assignment metric);
  * bit-identical to its HOF spelling for the same reasons as
  * [[QuantProdSum]]. */
case class QuantDiffSum(left: Expression, right: Expression, scale: Expression)
    extends TernaryExpression {
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = scale
  private def arrayish(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case NullType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayish(left.dataType) && arrayish(right.dataType) &&
        scale.dataType == DoubleType && scale.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "quant_dist2 requires (array<double>, array<double>, foldable double scale); " +
        s"got (${left.dataType}, ${right.dataType}, ${scale.dataType})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quant_dist2"
  override def nullSafeEval(l: Any, r: Any, s: Any): Any =
    QuantProdSum.computeDiff(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r, s) => {
      val tmp = ctx.freshName("qds")
      s"""
         |java.lang.Double $tmp = graft.functions.QuantProdSum.computeDiff($l, $r, $s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): QuantDiffSum =
    copy(left = newFirst, right = newSecond, scale = newThird)
}

object QuantProdSum {

  /** Session-local registration of `quant_dot`/`quant_dist2` for library
    * code that builds SQL expression strings (KMeans, the vector
    * queries): idempotent, so it works whether or not the session was
    * built with `GraftExtensions` (which also injects both). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val dot = org.apache.spark.sql.catalyst.FunctionIdentifier("quant_dot")
    if (!reg.functionExists(dot))
      reg.registerFunction(dot,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QuantProdSum].getName, "quant_dot"),
        (children: Seq[Expression]) =>
          QuantProdSum(children(0), children(1), children(2)))
    val dist = org.apache.spark.sql.catalyst.FunctionIdentifier("quant_dist2")
    if (!reg.functionExists(dist))
      reg.registerFunction(dist,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QuantDiffSum].getName, "quant_dist2"),
        (children: Seq[Expression]) =>
          QuantDiffSum(children(0), children(1), children(2)))
  }

  /** Round half away from zero on the exact binary value — see the class
    * doc for why this equals Spark's and DuckDB's round for |x| < 2^52.
    * The `d == f` branch corrects `floor(x+0.5)`'s double-rounding: the
    * sum landing EXACTLY on an integer means either a true tie (x is
    * f - 0.5 exactly: keep f, away from zero) or an upcross from below
    * the tie (x < f - 0.5: the true rounding is f - 1). */
  def roundHalfAway(x: Double): Double =
    if (x != x || java.lang.Double.isInfinite(x)) x
    else if (x >= 0d) {
      val d = x + 0.5d
      val f = math.floor(d)
      if (d == f && x < f - 0.5d) f - 1.0d else f
    } else {
      val d = x - 0.5d
      val c = math.ceil(d)
      if (d == c && x > c + 0.5d) c + 1.0d else c
    }

  /** Null ⇔ the HOF spelling yields null: length mismatch (zip_with pads
    * the shorter side with nulls) or any null element. */
  def compute(l: ArrayData, r: ArrayData, scale: Double): java.lang.Double = {
    val n = l.numElements()
    if (r.numElements() != n) return null
    var s = 0d
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      s += roundHalfAway(l.getDouble(i) * r.getDouble(i) * scale)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Σ round((x−y)²·scale) with the same null/length/rounding contract. */
  def computeDiff(l: ArrayData, r: ArrayData, scale: Double): java.lang.Double = {
    val n = l.numElements()
    if (r.numElements() != n) return null
    var s = 0d
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      val d = l.getDouble(i) - r.getDouble(i)
      s += roundHalfAway(d * d * scale)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
