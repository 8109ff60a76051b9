package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

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
  * side. `on` expressions must be LongType (epoch nanos in the corpus).
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
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(byTypes)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val result = UnsafeProjection.create(output, lOut ++ rOut)

      val rBuf = rIt.buffered
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null

      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lOn = lOnEval(lRow).getLong(0)
        // advance the right side up to (key, on) — keep the latest match
        var continue = rBuf.hasNext
        while (continue) {
          val rRow = rBuf.head
          val rKey = rKeyProj(rRow)
          val c = keyOrdering.compare(rKey, lKey)
          if (c < 0) { rBuf.next(); continue = rBuf.hasNext }
          else if (c == 0 && rOnEval(rRow).getLong(0) <= lOn) {
            lastMatch = rRow.copy()
            lastMatchKey = rKey.copy()
            rBuf.next(); continue = rBuf.hasNext
          } else continue = false
        }
        val matched =
          lastMatch != null && keyOrdering.compare(lastMatchKey, lKey) == 0 &&
            rOnEval(lastMatch).getLong(0) <= lOn
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
    require(lOn.dataType == LongType, s"as-of `on` must be LongType, got ${lOn.dataType}")
    val node = AsOfJoinPlan(lPlan, rPlan,
      by.map(resolve(lPlan, _)), by.map(resolve(rPlan, _)),
      lOn, resolve(rPlan, rightOn))
    PlanOps.ofRows(left.sparkSession, node)
  }
}
