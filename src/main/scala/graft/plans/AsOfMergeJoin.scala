package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator — the full custom-plan
  * tier (logical node → SparkStrategy → SparkPlan, registered through
  * [[GraftExtensions]]), complementing the composed formulation in
  * [[graft.operators.AsOf.asOfJoin]].
  *
  * Why a custom physical operator when the composed one works: the
  * union+window form materializes left ∪ right in one shuffle, then runs
  * window-frame machinery (buffering each key's rows) to propagate the
  * last preceding right value. This exec instead declares
  * ClusteredDistribution on the key and (key, time) child ordering, and
  * streams a per-partition two-pointer MERGE: O(1) state per partition
  * (the last right (key, value) pair), zero buffering, no window
  * machinery, and each side shuffles only itself. At 100 TB that's the
  * difference between "two sorted scans meet" and "a window holds the
  * union in frame buffers".
  *
  * Semantics (identical to AsOf.asOfJoin, pinned by AsOfMergeJoinSpec
  * and the shared DuckDB oracle): for each left row, the right row with
  * the greatest (time, id) such that right.time ≤ left.time and keys
  * equal; `asof_<value>` is null when no right row precedes.
  */
case class AsOfMergeJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Attribute, rightValue: Attribute,
    outAttr: AttributeReference) extends BinaryNode {
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType) &&
    leftTime.dataType == rightTime.dataType,
    "as-of key/time types must match across sides")
  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfMergeJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfMergeJoin {

  /** Dataset-level entry point mirroring [[graft.operators.AsOf.asOfJoin]]'s
    * signature: every left row + `asof_<valueCol>` from the matched
    * right row. Requires the session to carry [[GraftExtensions]] (for
    * the planner strategy).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           timeCol: String, idCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side with FRESH exprIds: when both inputs derive
    // from the same source (the common case — e.g. two filters of one
    // events scan), their outputs share exprIds, and the analyzer's
    // DeduplicateRelations regenerates the right subtree's ids without
    // being able to see that this node's attribute fields must follow.
    // Referencing only the fresh alias outputs keeps the node's
    // references stable whatever id surgery happens below the Project.
    val rawR = right.queryExecution.analyzed
    val aliases = rawR.output.map(a => Alias(a, a.name)())
    val rPlan = Project(aliases, rawR)
    val rOut = aliases.map(_.toAttribute)
    def lattr(name: String): Attribute =
      lPlan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${lPlan.output.map(_.name).mkString(", ")}"))
    def rattr(name: String): Attribute =
      rOut.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${rOut.map(_.name).mkString(", ")}"))
    val value = rattr(valueCol)
    val node = AsOfMergeJoin(lPlan, rPlan,
      keyCols.map(lattr), keyCols.map(rattr),
      lattr(timeCol), rattr(timeCol),
      rattr(idCol), value,
      AttributeReference(s"asof_$valueCol", value.dataType, nullable = true)())
    GraftColumnBridge.ofRows(left.sparkSession, node)
  }
}

/** Planner strategy: one physical choice, the merge exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfMergeJoin =>
      AsOfMergeJoinExec(planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.rightTieBreak, j.rightValue, j.outAttr) :: Nil
    case _ => Nil
  }
}

/** Per-partition sorted merge. Children arrive hash-clustered on the
  * keys and sorted by (keys, time[, tie-break]) — EnsureRequirements
  * inserts the exchanges and sorts from the declarations below, exactly
  * as it does for SortMergeJoin.
  */
case class AsOfMergeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Attribute, rightValue: Attribute,
    outAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // right side additionally orders by the tie-break id so "last absorbed
  // wins" deterministically selects the max (time, id) match
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ rightTieBreak).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val rValue = rightValue; val oAttr = outAttr
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (keys, time) comparisons run on UnsafeRow projections with one
      // natural ascending ordering — lexicographic ≤ on (key, time) IS
      // "key earlier, or same key and time ≤"
      val lktProj = UnsafeProjection.create(lKeys :+ lTime, leftOut)
      val rktProj = UnsafeProjection.create(rKeys :+ rTime, rightOut)
      val lkProj  = UnsafeProjection.create(lKeys, leftOut)
      val rkProj  = UnsafeProjection.create(rKeys, rightOut)
      val vProj   = UnsafeProjection.create(Seq(rValue), rightOut)
      val ktOrd = RowOrdering.createNaturalAscendingOrdering((lKeys :+ lTime).map(_.dataType))
      val kOrd  = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val outProj = UnsafeProjection.create(leftOut :+ oAttr, leftOut :+ oAttr)
      val joined = new JoinedRow
      val nullValue = new GenericInternalRow(1)

      // lookahead right row, pre-projected and copied (projections reuse
      // their buffers; the merge holds these across next() calls)
      var nextKT: UnsafeRow = null
      var nextK: UnsafeRow = null
      var nextV: UnsafeRow = null
      def readRight(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          nextKT = rktProj(r).copy(); nextK = rkProj(r).copy(); nextV = vProj(r).copy()
        } else nextKT = null
      readRight()

      var lastKey: UnsafeRow = null // key of the most recent absorbed right row
      var lastVal: UnsafeRow = null
      lIter.map { lrow =>
        val lkt = lktProj(lrow)
        while (nextKT != null && ktOrd.compare(nextKT, lkt) <= 0) {
          lastKey = nextK; lastVal = nextV
          readRight()
        }
        val matches = lastKey != null && kOrd.compare(lastKey, lkProj(lrow)) == 0
        outProj(joined(lrow, if (matches) lastVal else nullValue))
      }
    }
  }
}
