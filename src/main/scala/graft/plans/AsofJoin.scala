package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** Native as-of join (J7 of SURVEY.md §2.4): for each left row, the
  * single right row with equal keys and the greatest `rightTime ≤
  * leftTime` — "the user's latest click at or before the purchase"
  * (the Relational.scala q15 semantics, there composed from
  * join+filter+window).
  *
  * Why a custom operator (preference ladder (c) — whole-operator
  * semantics built-ins can't express *efficiently*): the composed form
  * materializes every (purchase × prior-click) pair and then shuffles
  * the blow-up again for the per-purchase `row_number`. This exec
  * co-partitions both sides on the key (one shuffle each — exactly a
  * sort-merge join's movement), sorts within partitions, and resolves
  * each left row in ONE streaming merge pass: no pair materialization,
  * no second shuffle, O(left+right) per partition. At 100 TB the
  * composed form's pair blow-up is the difference between a plan that
  * finishes and one that spills to death on hot users.
  *
  * Inner semantics: left rows with no qualifying right row are
  * dropped. `rightTieBreak` orders equal-(key, time) right rows; the
  * merge keeps the LAST in sort order, so e.g. `Seq(col("id"))` picks
  * the max id — deterministic output for oracle comparison.
  *
  * Null-key caveat: the merge compares keys with a total ordering, so
  * a null left key matches a null right key (IS NOT DISTINCT FROM
  * semantics) — unlike an SQL equi join, which would drop both.
  * Pre-filter nulls on either side if SQL semantics are required.
  * Null TIMES follow SQL: `rightTime <= leftTime` is never true when
  * either side is null, so null-time right rows are never candidates
  * and null-time left rows never match.
  */
object AsofJoin {

  /** Join `left` to the latest `right` row per key with
    * `right(timeCol) ≤ left(timeCol)`. Key/time/tie-break columns are
    * resolved against the respective side; pre-rename overlapping
    * output columns on the right.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    PlanBridge.registerStrategy(spark, AsofJoinStrategy)
    // both sides often derive from the same scan (self-as-of on one
    // event log) and would then share exprIds — the node's output may
    // not contain one id twice, so give the right side fresh ids via
    // a same-name re-alias (a Project the optimizer collapses)
    val rightFresh = right.select(
      right.columns.toIndexedSeq.map(n => right.col(n).as(n)): _*)
    def exprs(df: DataFrame, names: Seq[String]): Seq[Expression] =
      names.map(n => ColumnBridge.expression(df.col(n)))
    val lk = exprs(left, keys); val rk = exprs(rightFresh, keys)
    val lt = exprs(left, Seq(leftTime)).head
    val rt = exprs(rightFresh, Seq(rightTime)).head
    // the merge compares raw projected rows with an ordering built
    // from the LEFT types — a type mismatch would silently
    // mis-compare, so fail at build time (callers cast explicitly,
    // unlike an SQL equi join which inserts coercions)
    lk.zip(rk).zip(keys).foreach { case ((l, r), name) =>
      require(l.dataType == r.dataType,
        s"as-of key '$name' types differ: ${l.dataType.simpleString} vs ${r.dataType.simpleString} — cast one side")
    }
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType.simpleString} vs ${rt.dataType.simpleString} — cast one side")
    val node = AsofJoinNode(
      PlanBridge.analyzed(left), PlanBridge.analyzed(rightFresh),
      lk, rk, lt, rt, exprs(rightFresh, rightTieBreak))
    PlanBridge.ofRows(spark, node)
  }
}

/** Logical node — expressions arrive resolved (built from analyzed
  * children's own columns), so this analyzes as-is.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, tb) =>
      AsofJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of exec. Declares `ClusteredDistribution` on both
  * children (EnsureRequirements co-partitions them — the same contract
  * as a shuffled equi join, so AQE/shuffle-reuse apply) and per-child
  * sort order (key asc, time asc[, tie-break asc] — Spark inserts the
  * sorts). The merge advances the right iterator at most once over the
  * partition while streaming the left: the candidate row is the last
  * right row seen with equal key and time ≤ the current left time.
  */
case class AsofJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +:
        rightTieBreak.map(SortOrder(_, Ascending))))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(lOut ++ rOut, lOut ++ rOut)

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var candidate: InternalRow = _
        private var candidateKey: UnsafeRow = _
        private var pending: InternalRow = _

        private def advance(): Unit = {
          pending = null
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTs = lTimeProj(l)
            val lTsNull = lTs.isNullAt(0)
            // consume right rows up to and including (lKey, lTs); the
            // last equal-key NON-NULL-time one seen is the as-of
            // candidate (SQL: rts <= lts is never true through nulls —
            // null-time rows sort first and are consumed but skipped)
            var scanning = rCur != null
            while (scanning) {
              val rKey = rKeyProj(rCur)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0 || (c == 0 && tsOrd.compare(rTimeProj(rCur), lTs) <= 0)) {
                if (c == 0 && !rTimeProj(rCur).isNullAt(0) && !lTsNull) {
                  candidate = rCur.copy()
                  candidateKey = rKey.copy()
                }
                rCur = if (rIter.hasNext) rIter.next() else null
                scanning = rCur != null
              } else scanning = false
            }
            if (!lTsNull && candidateKey != null &&
                keyOrd.compare(candidateKey, lKey) == 0)
              pending = resultProj(joined(l, candidate))
          }
        }

        // lazy advance: the emitted row lives in resultProj's reused
        // buffer, so the next advance must not run until the consumer
        // has taken (and per iterator contract, copied-if-buffering)
        // the previous row
        private var ready = false
        override def hasNext: Boolean = {
          if (!ready) { advance(); ready = true }
          pending != null
        }
        override def next(): InternalRow = {
          if (!ready) advance()
          ready = false
          pending
        }
      }
    }
  }
}
