package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst surface for the distributed sort-merge AS-OF
  * join (SURVEY.md §2.2 joins; the §7.4 SparkStrategy seam): for every
  * left row, the latest right `ts` with the same key and ts ≤ left.ts.
  *
  * Round 2 implemented this as Dataset.repartition + sortWithinPartitions
  * + rdd.zipPartitions, which leaned on an UNCONTRACTED invariant — that
  * both repartition calls yield identically-assigned hash partitions
  * (ADVICE r02). Promoting the merge into a physical operator turns that
  * assumption into a planner contract:
  *
  *  - [[AsOfMergeExec.requiredChildDistribution]] declares clustering on
  *    the keys, so EnsureRequirements inserts ONE hash exchange per side
  *    and guarantees the two children are co-partitioned — or fails to
  *    plan. No operator code repartitions anything.
  *  - [[AsOfMergeExec.requiredChildOrdering]] declares (key, ts) per
  *    side, so the planner inserts the partition-local sorts.
  *  - doExecute is only the streaming two-iterator merge: O(n+m) per
  *    partition, constant memory (three primitive registers of right
  *    state, no buffering), arbitrarily wide partitions never spill.
  *
  * The operator also composes with AQE and whole-stage codegen breaks
  * cleanly around it (it is a non-codegen leaf between codegen'd spans).
  * Contract: key and ts columns are non-null 64-bit integers (the query
  * layer guarantees it); output = left columns + nullable asof ts.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    asofOut: AttributeReference)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofOut
  override def producedAttributes: AttributeSet = AttributeSet(asofOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping [[AsOfJoinNode]] to [[AsOfMergeExec]];
  * injected via GraftExtensions.injectPlannerStrategy. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, out) =>
      AsOfMergeExec(planLater(l), planLater(r), lk, lt, rk, rt, out) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    asofOut: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofOut
  override def producedAttributes: AttributeSet = AttributeSet(asofOut)

  /** Same-key clustering on both children: EnsureRequirements plans one
    * hash exchange per side and guarantees co-partitioned inputs (the
    * contract zipPartitions-on-Datasets could only assume). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Partition-local (key, ts) sort per side — the planner inserts the
    * sorts; the merge below relies on them. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  /** Rows pass through in the left child's partitioning and order, so
    * downstream ops can reuse both (no re-exchange, no re-sort). */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/ts attributes must resolve to child outputs")
    val outTypes = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // Right rows are reused by the underlying iterator: extract the
      // two primitive fields immediately, never hold a row reference.
      var haveR = false
      var rKey = 0L
      var rTs = 0L
      def loadRight(): Boolean =
        if (ri.hasNext) {
          val r = ri.next(); rKey = r.getLong(rkOrd); rTs = r.getLong(rtOrd); true
        } else false
      haveR = loadRight()
      var curKey = Long.MinValue
      var lastTs = 0L
      var hasLast = false
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outTypes)
      li.map { lrow =>
        val k = lrow.getLong(lkOrd)
        val t = lrow.getLong(ltOrd)
        if (k != curKey) { curKey = k; hasLast = false }
        // drain the right side through earlier keys and same-key rows
        // at-or-before t (ties at equal ts count, like the window form)
        while (haveR && (rKey < curKey || (rKey == curKey && rTs <= t))) {
          if (rKey == curKey) { lastTs = rTs; hasLast = true }
          haveR = loadRight()
        }
        if (hasLast) extra.setLong(0, lastTs) else extra.setNullAt(0)
        proj(joined(lrow, extra))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeExec =
    copy(left = newLeft, right = newRight)
}
