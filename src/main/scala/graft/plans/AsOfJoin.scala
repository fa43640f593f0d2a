package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Custom whole-operator Catalyst extension (preference order (c) of the
  * build brief): backward AS-OF JOIN as a first-class physical operator.
  *
  * The composition form (ops/Snapshots.asOfJoin: tagged union + last_value
  * window) already gets the right distributed shape; this operator exists to
  * demonstrate — and measure — the full custom-plan path: LogicalPlan node →
  * planner Strategy → BinaryExecNode whose `requiredChildDistribution` /
  * `requiredChildOrdering` let EnsureRequirements insert exactly one
  * co-partitioning exchange + sort per side, and whose `doExecute` is a
  * streaming two-pointer merge (no buffering beyond one right row).
  *
  * Semantics: for each left row, the LAST right row with the same key and
  * `right.ts <= left.ts` (inclusive — DuckDB `ASOF JOIN ... ON l.ts >= r.ts`
  * parity); unmatched left rows get nulls. Restriction: key and ts must be
  * LongType (the engine's key/epoch-micro types); right side must be unique
  * per (key, ts) for deterministic output, as with any ASOF join.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute]) extends BinaryNode {
  // fail fast at construction: the merge loop reads key/ts as primitive
  // longs; NULLs are handled (no-match / skip) but only for LongType
  for ((a, role) <- Seq(leftKey -> "left key", leftTs -> "left ts",
                        rightKey -> "right key", rightTs -> "right ts"))
    require(a.dataType == org.apache.spark.sql.types.LongType,
      s"AsOfJoinNode: $role must be LongType, got ${a.dataType} (${a.name})")
  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, vals) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, vals) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  /** Both sides hash-clustered on the key → EnsureRequirements co-partitions
    * them (one exchange per side at most, reusing existing partitioning). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** In-partition (key, ts) order → a single merge pass suffices. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexOf(leftKey)
    val lTsOrd = left.output.indexOf(leftTs)
    val rKeyOrd = right.output.indexOf(rightKey)
    val rTsOrd = right.output.indexOf(rightTs)
    val valOrds = rightVals.map(right.output.indexOf).toArray
    val valTypes = rightVals.map(_.dataType).toArray
    val outSchema = output.map(_.dataType).toArray

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullVals = new GenericInternalRow(rightVals.length)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outSchema)
      val rBuf = rIt.buffered

      // last right row (vals only, copied) matching the current left key
      var matchKey = 0L
      var hasMatch = false
      var matchVals: InternalRow = nullVals

      def rightValsOf(r: InternalRow): InternalRow = {
        val g = new GenericInternalRow(valOrds.length)
        var i = 0
        while (i < valOrds.length) {
          // copyValue: the upstream SortExec reuses UnsafeRow buffers, so
          // UTF8String/ArrayData values must be deep-copied before the
          // buffered match outlives rBuf.next()
          g.update(i, if (r.isNullAt(valOrds(i))) null
            else InternalRow.copyValue(r.get(valOrds(i), valTypes(i))))
          i += 1
        }
        g
      }

      lIt.map { lRow =>
        // SQL null semantics: a NULL key/ts compares unknown → no match.
        // (getLong on a null slot would read 0 and alias the key-0 group.)
        if (lRow.isNullAt(lKeyOrd) || lRow.isNullAt(lTsOrd)) {
          joined(lRow, nullVals)
          outProj(joined)
        } else {
          val lk = lRow.getLong(lKeyOrd)
          val lts = lRow.getLong(lTsOrd)
          if (hasMatch && matchKey != lk) hasMatch = false
          // advance the right side through every row with (key, ts) <= (lk, lts)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            if (r.isNullAt(rKeyOrd) || r.isNullAt(rTsOrd)) {
              rBuf.next() // null-keyed right rows match nothing; sorted first
            } else {
              val rk = r.getLong(rKeyOrd)
              val rts = r.getLong(rTsOrd)
              if (rk < lk || (rk == lk && rts <= lts)) {
                if (rk == lk) { matchKey = rk; matchVals = rightValsOf(r); hasMatch = true }
                rBuf.next()
              } else advancing = false
            }
          }
          joined(lRow, if (hasMatch) matchVals else nullVals)
          outProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
