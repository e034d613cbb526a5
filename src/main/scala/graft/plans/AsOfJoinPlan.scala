package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator custom planning showcase (SURVEY.md §7 / builder-prompt
  * tier (c)): the as-of join as a first-class physical operator instead of
  * the union+window rewrite in [[graft.operators.AsOfJoin]].
  *
  * Logical node → [[AsOfJoinStrategy]] → [[AsOfJoinExec]], which demands
  * hash co-partitioning on the key and (key, ts) ordering from its
  * children (Catalyst's EnsureRequirements inserts the exchanges/sorts),
  * then streams BOTH sorted sides once per partition — no row buffering
  * beyond the single carried right row, no window state: strictly less
  * memory and one less full-materialization than the union+window plan,
  * and the merge is O(|L| + |R|) per partition.
  *
  * Semantics (same as the operator version): for every left row, the
  * latest right row with equal key and rightTs ≤ leftTs; payload columns
  * null when nothing precedes.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute]) extends BinaryExecNode {

  // the merge reads both ts via getLong(0), which is only valid for
  // long-backed types — an int-backed ts (IntegerType/DateType) would
  // silently read garbage and join wrong rows. Fail fast instead.
  for (ts <- Seq(leftTs, rightTs))
    require(
      ts.dataType == org.apache.spark.sql.types.LongType ||
        ts.dataType == org.apache.spark.sql.types.TimestampType ||
        ts.dataType == org.apache.spark.sql.types.TimestampNTZType,
      s"AsOfJoinExec timestamp columns must be long-backed " +
        s"(LONG/TIMESTAMP/TIMESTAMP_NTZ), got ${ts.dataType.sql}")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val payloadLocal = payload
    val lkExpr = leftKey
    val rkExpr = rightKey
    val ltsExpr = leftTs
    val rtsExpr = rightTs
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(Seq(lkExpr), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rkExpr), rightOut)
      val lTsProj = UnsafeProjection.create(Seq(ltsExpr), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rtsExpr), rightOut)
      val payloadProj = UnsafeProjection.create(payloadLocal, rightOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(lkExpr.dataType))
      val nullPayload = new GenericInternalRow(payloadLocal.length)
      val joined = new JoinedRow()

      // copy right rows on read (the underlying UnsafeRow is reused)
      val rBuf = rIt.map(r => (rKeyProj(r).copy(), rTsProj(r).getLong(0), payloadProj(r).copy()))
        .buffered

      var carriedKey: InternalRow = null
      var carried: InternalRow = null

      lIt.map { lRow =>
        val lk = lKeyProj(lRow)
        val lt = lTsProj(lRow).getLong(0)
        // discard right rows (and carried state) from earlier key groups
        while (rBuf.hasNext && keyOrd.compare(rBuf.head._1, lk) < 0) {
          rBuf.next()
          carried = null; carriedKey = null
        }
        // absorb all right rows of this key with ts ≤ left ts
        while (rBuf.hasNext && keyOrd.compare(rBuf.head._1, lk) == 0 &&
            rBuf.head._2 <= lt) {
          val r = rBuf.next()
          carriedKey = r._1; carried = r._3
        }
        val payloadRow =
          if (carried != null && carriedKey != null &&
            keyOrd.compare(carriedKey, lk) == 0) carried
          else nullPayload
        joined(lRow, payloadRow)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
