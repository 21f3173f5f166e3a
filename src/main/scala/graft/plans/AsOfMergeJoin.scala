package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native sort-merge as-of join — the whole-operator Catalyst extension
  * (logical node → strategy → physical exec, injected via
  * GraftExtensions), for the one relational operator the reference's
  * sort+shift pattern gestures at and Spark has no primitive for
  * (SURVEY.md §2.3; the composed union+window form lives in
  * operators.AsOfJoin and stays as the extension-free path).
  *
  * Semantics: for every left row, the LATEST right row of the same key
  * with rightTime ≤ leftTime (backward as-of), optionally within
  * `tolerance` (leftTime − rightTime ≤ tolerance, same units as the
  * time columns). Null keys and null times never match. `isInner` drops
  * unmatched left rows; otherwise they survive null-extended.
  *
  * Scale design: EnsureRequirements plans one hash exchange per side
  * (ClusteredDistribution on the keys — co-partitioned like any
  * shuffled join) plus per-partition sorts on (keys, time); the merge
  * itself is a single forward pass holding ONE buffered right row and
  * ONE candidate match — O(1) state per partition regardless of key
  * group size, where the union+window form buffers a window frame and
  * the naive inequality-join plan is a broadcast nested loop. Sorted
  * (bucketed) inputs make both exchanges AND sorts vanish — the
  * requirements are declared, so Catalyst elides what's already
  * satisfied.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long], isInner: Boolean)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")

  override def output: Seq[Attribute] =
    if (isInner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinNode → AsOfMergeJoinExec. Injected by GraftExtensions
  * (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tol, inner) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, tol, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long], isInner: Boolean,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isInner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // left rows pass through in their sorted order; right side is only
  // carried, so the left partitioning/ordering survives for upstream reuse
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOut = left.output; val rOut = right.output
    val outAttrs = output
    val tol = tolerance; val inner = isInner
    val keyTypes = lKeys.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lKeys, lOut)
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val lTimeEval = BindReferences.bindReference(lTime, lOut)
        val rTimeEval = BindReferences.bindReference(rTime, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        // bind against nullability-WIDENED right attrs: on a left join the
        // null-extension row feeds originally-non-nullable right columns,
        // and an unwidened BoundReference would skip the null check and
        // read garbage zeros instead of null
        val resultProj =
          UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
        val rightNulls = new GenericInternalRow(rOut.length)
        val joined = new JoinedRow

        // single buffered right row (not yet consumed) + latest match
        var rRow: InternalRow = null
        var rKey: UnsafeRow = null
        var matchRow: InternalRow = null
        var matchKey: UnsafeRow = null
        var matchTime: Long = 0L

        def advanceRight(): Boolean = {
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow).copy()
            true
          } else { rRow = null; rKey = null; false }
        }
        advanceRight()

        new Iterator[InternalRow] {
          private var nextOut: InternalRow = null

          private def computeNext(): Unit = {
            nextOut = null
            while (nextOut == null && lIter.hasNext) {
              val lRow = lIter.next()
              val lKey = lKeyProj(lRow)
              if (lKey.anyNull) {
                // null keys never match (join semantics)
                if (!inner) { joined(lRow, rightNulls); nextOut = resultProj(joined) }
              } else {
                // a retained match from a previous key group is stale
                if (matchRow != null && keyOrd.compare(matchKey, lKey) != 0) matchRow = null
                val lT = lTimeEval.eval(lRow)
                if (lT != null) {
                  val lTv = lT.asInstanceOf[Long]
                  // consume right rows that are behind, or candidates (≤ lT)
                  var advancing = rRow != null
                  while (advancing) {
                    val c = keyOrd.compare(rKey, lKey)
                    if (c < 0) advancing = advanceRight()
                    else if (c > 0) advancing = false
                    else {
                      val rT = rTimeEval.eval(rRow)
                      if (rT == null) advancing = advanceRight() // null time never matches
                      else if (rT.asInstanceOf[Long] <= lTv) {
                        matchRow = rRow.copy(); matchKey = rKey; matchTime = rT.asInstanceOf[Long]
                        advancing = advanceRight()
                      } else advancing = false
                    }
                  }
                  val inTol = matchRow != null && tol.forall(t => lTv - matchTime <= t)
                  if (inTol) { joined(lRow, matchRow); nextOut = resultProj(joined) }
                  else if (!inner) { joined(lRow, rightNulls); nextOut = resultProj(joined) }
                } else if (!inner) { // null left time: unmatched
                  joined(lRow, rightNulls); nextOut = resultProj(joined)
                }
              }
            }
          }

          override def hasNext: Boolean = {
            if (nextOut == null) computeNext()
            nextOut != null
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            val out = nextOut; nextOut = null
            numOutputRows += 1
            out
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
