package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types._

/** A native backward as-of join — the custom-operator path (c) of the
  * build guide: logical node → planner strategy → physical operator,
  * registered through `SparkSessionExtensions`. Spark has no as-of join;
  * the compositional union+window form (q18) works but materializes the
  * union and carries window state. This operator is the direct shape:
  * both sides hash-partitioned on the equality keys and sorted by
  * (keys, on), then a single streaming merge pass per partition matches
  * each left row with the latest right row whose `on` ≤ the left's —
  * O(n+m) per partition, no window state, the exact plan a 100 TB
  * backward-join wants.
  *
  * Semantics: left outer — unmatched left rows get nulls for the right
  * side. `on` expressions may be any long-or-int-backed ordered type —
  * LongType, TimestampType, TimestampNTZType (internal micros longs),
  * IntegerType, DateType (internal day ints) — keyed internally on the
  * order-preserving physical value, so timestamp keys keep full
  * microsecond precision (a cast-to-long would truncate to seconds).
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression)
    extends BinaryNode {

  // the right side's equality-key columns are redundant with the left's
  // (pandas merge_asof drops them too)
  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(a => rightBy.exists(_.semanticEquals(a)))
      .map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lBy, rBy, lOn, rOn) =>
      AsOfJoinExec(planLater(l), planLater(r), lBy, rBy, lOn, rOn) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(a => rightBy.exists(_.semanticEquals(a)))
      .map(_.withNullability(true))

  // co-partition on the equality keys …
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  // … and sort each partition by (keys, on) so one merge pass suffices
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftBy.map(SortOrder(_, Ascending)) :+ SortOrder(leftOn, Ascending),
    rightBy.map(SortOrder(_, Ascending)) :+ SortOrder(rightOn, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftBy.map(SortOrder(_, Ascending)) :+ SortOrder(leftOn, Ascending)

  /** Order-preserving long extraction from a single-column projection of
    * the `on` expression: timestamps are physically micros longs, dates are
    * day ints — both read exactly, no unit truncation. */
  private def onReader(dt: DataType): InternalRow => Long = dt match {
    case LongType | TimestampType | TimestampNTZType => (r: InternalRow) => r.getLong(0)
    case IntegerType | DateType => (r: InternalRow) => r.getInt(0).toLong
    case ShortType => (r: InternalRow) => r.getShort(0).toLong
    case ByteType => (r: InternalRow) => r.getByte(0).toLong
    case other => throw new IllegalArgumentException(
      s"as-of `on` must be a long/int-backed ordered type, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lByExprs = leftBy
    val rByExprs = rightBy
    val lOnExpr = leftOn
    val rOnExpr = rightOn
    val byTypes = leftBy.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lByExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rByExprs, rOut)
      val lOnEval = UnsafeProjection.create(Seq(lOnExpr), lOut)
      val rOnEval = UnsafeProjection.create(Seq(rOnExpr), rOut)
      val lOnRead = onReader(lOnExpr.dataType)
      val rOnRead = onReader(rOnExpr.dataType)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(byTypes)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val result = UnsafeProjection.create(output, lOut ++ rOut)

      val rBuf = rIt.buffered
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null

      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lOn = lOnRead(lOnEval(lRow))
        // advance the right side up to (key, on) — keep the latest match
        var continue = rBuf.hasNext
        while (continue) {
          val rRow = rBuf.head
          val rKey = rKeyProj(rRow)
          val c = keyOrdering.compare(rKey, lKey)
          if (c < 0) { rBuf.next(); continue = rBuf.hasNext }
          else if (c == 0 && rOnRead(rOnEval(rRow)) <= lOn) {
            lastMatch = rRow.copy()
            lastMatchKey = rKey.copy()
            rBuf.next(); continue = rBuf.hasNext
          } else continue = false
        }
        val matched =
          lastMatch != null && keyOrdering.compare(lastMatchKey, lKey) == 0 &&
            rOnRead(rOnEval(lastMatch)) <= lOn
        result(joined(lRow, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API: `AsOf.joinBackward(purchases, signups, Seq("user_id"), "ts", "ts")`. */
object AsOf {
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftOn: String,
      rightOn: String): DataFrame = {
    import org.apache.spark.sql.graft.PlanOps
    val lPlan = PlanOps.analyzedPlan(left)
    // both sides may come from the same source (self-as-of-join) and then
    // share exprIds; the analyzer cannot disambiguate expressions inside a
    // custom node, so mint fresh attributes for the right side up front
    val rPlan = {
      val analyzed = PlanOps.analyzedPlan(right)
      org.apache.spark.sql.catalyst.plans.logical.Project(
        analyzed.output.map(a => Alias(a, a.name)()), analyzed)
    }
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val lOn = resolve(lPlan, leftOn)
    val rOn = resolve(rPlan, rightOn)
    val supported: Set[DataType] = Set(LongType, IntegerType, ShortType,
      ByteType, DateType, TimestampType, TimestampNTZType)
    require(supported(lOn.dataType),
      s"as-of `on` must be an integral/date/timestamp column, got ${lOn.dataType}")
    require(lOn.dataType == rOn.dataType,
      s"as-of `on` types must match: left ${lOn.dataType}, right ${rOn.dataType}")
    val node = AsOfJoinPlan(lPlan, rPlan,
      by.map(resolve(lPlan, _)), by.map(resolve(rPlan, _)),
      lOn, rOn)
    PlanOps.ofRows(left.sparkSession, node)
  }
}
