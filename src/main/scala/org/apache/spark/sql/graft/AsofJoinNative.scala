// Lives inside org.apache.spark.sql (same rationale as CosineSim.scala):
// the custom-plan surface (Dataset.ofRows, BindReferences, BinaryExecNode)
// is private[sql] — this is the standard third-party custom-operator
// pattern.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (backward and forward) — the (c) tier of the custom-operator
  * preference order: a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered via `SparkSessionExtensions`
  * ([[GraftExtensions]]) or `spark.experimental.extraStrategies`.
  *
  * Semantics match [[graft.operators.AsofJoin.asofJoin]]'s OUTER mode
  * (parity-asserted in AsofJoinNativeSpec): for every left row, the
  * latest right row of the same key with `rightTime <= leftTime`; null
  * payload when none exists. Both children are hash-clustered on the
  * keys and sorted by (keys, time) — the EnsureRequirements contract —
  * and each partition then runs ONE streaming merge with O(1) state (the
  * current right row + the last match), never materializing a per-key
  * buffer. Same shuffle envelope as the union+window rewrite, but no
  * window sort buffer on the unioned row stream, no struct packing, and
  * ~half the sorted volume (each side sorts its own columns only).
  *
  * Null contract: a null key or null left time matches nothing (emits
  * null payload); right rows with null time are skipped. Nulls sort
  * FIRST per the natural ascending ordering, so the merge stays aligned
  * with the children's sort.
  *
  * FORWARD mode flips the time rule to "earliest right with
  * `rightTime >= leftTime`" (pandas merge_asof direction='forward').
  *
  * TOLERANCE (pandas merge_asof `tolerance`): when set, a match whose
  * time gap exceeds the bound is demoted to null payload — the merge
  * itself is unchanged (the nearest-in-direction row is still the only
  * candidate; tolerance is a per-row accept test on it, O(1)). The
  * bound is expressed in the time column's RAW internal unit (days for
  * DATE, microseconds for TIMESTAMP/TIMESTAMP_NTZ, the value itself
  * for integral columns), matching how the merge compares times.
  * Duplicate right timestamps: backward takes the LAST duplicate in sort
  * order (it consumes the run), forward the FIRST. The required right
  * ordering includes the orderable payload columns, so within a (key,
  * time) tie the endpoints are DETERMINISTIC: backward yields the
  * payload-largest duplicate, forward the payload-smallest. Only
  * unorderable payload types (maps) fall back to the undefined-tie
  * contract — keep (key, time) unique on the right for those.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        payload: Seq[Attribute],
                        forward: Boolean = false,
                        tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case aj: AsofJoinPlan =>
      AsofJoinExec(planLater(aj.left), planLater(aj.right), aj.leftKeys, aj.rightKeys,
        aj.leftTime, aj.rightTime, aj.payload, aj.forward, aj.tolerance) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        payload: Seq[Attribute],
                        forward: Boolean = false,
                        tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  // left rows pass through in order, exactly once
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    // Right side additionally sorts by the (orderable) payload columns:
    // with duplicate (key, time) right rows the merge takes a tie-run
    // endpoint (forward the first, backward the last), and without a
    // total order that endpoint is whichever duplicate the unstable sort
    // emitted — silently flaky output. The extra keys only cost
    // comparisons inside equal (key, time) runs.
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) ++ (SortOrder(rightTime, Ascending) +:
        payload.filter(a => RowOrdering.isOrderable(a.dataType))
          .map(SortOrder(_, Ascending))))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // capture locals: the closure must not drag the SparkPlan along
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val pay = payload
    val fwd = forward
    val tol = tolerance
    val allOut = output
    // tolerance compares raw internal time values as Long (the API layer
    // guards that the type is integral-backed: date=int days,
    // timestamp=long micros)
    val timeToLong: Any => Long = lTime.dataType match {
      case org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.IntegerType => v => v.asInstanceOf[Int].toLong
      case org.apache.spark.sql.types.ShortType => v => v.asInstanceOf[Short].toLong
      case org.apache.spark.sql.types.ByteType => v => v.asInstanceOf[Byte].toLong
      case _ => v => v.asInstanceOf[Long]
    }
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val payProj = UnsafeProjection.create(pay, rOut)
      val lTimeEval = BindReferences.bindReference(lTime, lOut)
      val rTimeEval = BindReferences.bindReference(rTime, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = TypeUtils.getInterpretedOrdering(lTime.dataType)
        .asInstanceOf[Ordering[Any]]
      val nullPay = new GenericInternalRow(pay.length)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(allOut, allOut)

      new Iterator[InternalRow] {
        // O(1) merge state: current right row (key/time/row) + last match
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rT: Any = _
        private var matchKey: UnsafeRow = _
        private var matchPay: UnsafeRow = _
        private var matchT: Any = _
        advanceRight()

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && ri.hasNext) {
            val row = ri.next()
            val t = rTimeEval.eval(row)
            // null right time never matches; neither does a null key
            // (SQL equality, like DuckDB ASOF) — both are skipped, which
            // is safe because nulls sort FIRST in the children's order
            if (t != null) {
              val k = rKeyProj(row)
              if (!k.anyNull) {
                rRow = row
                rKey = k.copy()
                rT = t
              }
            }
          }
        }

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lk = lKeyProj(l)
          val lt = lTimeEval.eval(l)
          // a null left key matches nothing (and must not advance the
          // pointer: null keys sort before every real key)
          if (lt != null && !lk.anyNull) {
            // consume right rows up to (key, time): the pointer only
            // moves forward because the left side is sorted the same way.
            // BACKWARD keeps the latest right row with rT <= lt as the
            // match; FORWARD stops at the first right row with rT >= lt
            // (rows skipped had rT < lt, and later left times only grow)
            var advancing = true
            while (advancing && rRow != null) {
              val c = keyOrd.compare(rKey, lk)
              if (c < 0) advanceRight()
              else if (!fwd && c == 0 && timeOrd.compare(rT, lt) <= 0) {
                matchKey = rKey
                matchPay = payProj(rRow).copy()
                matchT = rT
                advanceRight()
              } else if (fwd && c == 0 && timeOrd.compare(rT, lt) < 0) {
                advanceRight()
              } else advancing = false
            }
          }
          val hit0 =
            if (fwd)
              lt != null && !lk.anyNull && rRow != null &&
                keyOrd.compare(rKey, lk) == 0
            else
              lt != null && !lk.anyNull && matchKey != null &&
                keyOrd.compare(matchKey, lk) == 0
          // tolerance accept test on the (unique) candidate: the gap is
          // non-negative by construction (backward consumed rT <= lt,
          // forward stopped at rT >= lt)
          val hit = hit0 && (tol match {
            case None => true
            case Some(t) =>
              val gap = if (fwd) timeToLong(rT) - timeToLong(lt)
                        else timeToLong(lt) - timeToLong(matchT)
              gap <= t
          })
          val payRow = if (!hit) nullPay else if (fwd) payProj(rRow) else matchPay
          outProj(joined(l, payRow))
        }
      }
    }
  }
}

/** DataFrame-level API for [[AsofJoinExec]]. */
object AsofJoinNative {

  /** As-of join `left` ⟕ `right` on equality `keys` (outer: unmatched
    * left rows keep null payload). `direction = "backward"` (default):
    * latest right with `rightTime <= leftTime`; `"forward"`: earliest
    * right with `rightTime >= leftTime` (the next-observation join;
    * DuckDB can only express it by negating both time axes). Output:
    * every left column, then `payload` columns from the matched right
    * row. `tolerance` (pandas merge_asof): max allowed |gap| in the
    * time column's raw unit (days for DATE, micros for TIMESTAMP) —
    * a nearest-in-direction match farther away yields null payload. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, payload: Seq[String],
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(keys.nonEmpty, "asof join needs at least one equality key")
    require(tolerance.forall(_ >= 0), s"tolerance must be >= 0, got $tolerance")
    // same guard as AsofJoin.asofJoin: a payload name colliding with a
    // left column would emit two same-named columns (different exprIds)
    // and push an AMBIGUOUS_REFERENCE onto the first downstream select
    val collisions = payload.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"payload columns $collisions collide with left columns")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = left.queryExecution.analyzed
    // fresh exprIds on the right side: a self-join would otherwise carry
    // duplicate attribute ids into the custom plan (the analyzer's
    // DeduplicateRelations does not descend into unknown nodes)
    val rp0 = right.queryExecution.analyzed
    val rp = org.apache.spark.sql.catalyst.plans.logical.Project(
      rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side column $n not found in ${out.map(_.name)}"))
    val rOut = rp.output.map(_.toAttribute)
    val lt = attr(lp.output, leftTime, "left")
    val rt = attr(rOut, rightTime, "right")
    // the merge compares raw internal values — a date (int days) against
    // a timestamp (long micros) would be garbage, so mismatched types
    // fail HERE, not as a task-level ClassCastException
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share one type: $leftTime is ${lt.dataType}, " +
        s"$rightTime is ${rt.dataType} — cast one side first")
    if (tolerance.isDefined) {
      // the gap test subtracts raw internal values as Long — only
      // integral-backed time types qualify (same loud-guard philosophy
      // as the type-equality check above)
      import org.apache.spark.sql.types._
      val ok = Set[DataType](DateType, TimestampType, TimestampNTZType,
        IntegerType, LongType, ShortType, ByteType)
      require(ok.contains(lt.dataType),
        s"tolerance needs an integral-backed time type (date/timestamp/int), " +
          s"got ${lt.dataType}")
    }
    val lk = keys.map(attr(lp.output, _, "left"))
    val rk = keys.map(attr(rOut, _, "right"))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of key ${a.name} type mismatch: ${a.dataType} vs ${b.dataType}") }
    val plan = AsofJoinPlan(lp, rp, lk, rk, lt, rt,
      payload.map(attr(rOut, _, "right")), forward = direction == "forward",
      tolerance = tolerance)
    classicDataset(spark, plan)
  }

  /** Idempotently install [[AsofJoinStrategy]] AND the companion
    * [[PushFilterThroughAsofJoin]] optimizer rule on a live session (the
    * config path is `spark.sql.extensions=...GraftExtensions`). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
    if (!exp.extraOptimizations.contains(PushFilterThroughAsofJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughAsofJoin
  }

  private def classicDataset(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
