package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.GraftPlans

/** As-of join as a first-class operator: custom logical plan + planner
  * strategy + sort-merge physical exec (the prompt's extension path (c) —
  * Spark has no native as-of join; pandas-on-Spark composes merge_asof
  * from union + window exactly like [[graft.operators.AnalyticOps.asofJoin]]).
  *
  * Why a custom exec beats the union+window composition at scale: the
  * composition shuffles the UNION of both sides, then runs a window pass
  * (sort + running last_value) over `|L|+|R|` rows and filters half of
  * them back out. The exec shuffles each side separately (each by its own
  * key), sorts each side once — Spark's normal join machinery, reusing any
  * existing partitioning/ordering — and streams both sorted iterators
  * through a single forward merge walk with O(1) state (the current
  * candidate row). No union blow-up, no window buffering, and Catalyst
  * can reuse an exchange if either side is already partitioned by the key.
  *
  * Matching semantics are identical to [[AnalyticOps.asofJoin]] (backward
  * inclusive: the matched right row is the one with the greatest
  * `(rts, tieBreak)` such that `rts <= lts`), which is what the
  * `asof_click_purchase` oracle checks.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    forward: Boolean = false,
    toleranceMicros: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for the custom node: left-only filter predicates
  * commute with an as-of join (each left row's match depends only on
  * that row), so push them below — after the standard batches have moved
  * the filter down to sit on [[AsOfJoin]], this hands the conjuncts that
  * reference only left attributes to the left child, where physical
  * planning folds them into the parquet scan (PushedFilters). Right-side
  * predicates must NOT move: dropping right rows changes which row is
  * "most recent". */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val leftSet = AttributeSet(j.left.output)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(leftSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoin]] onto [[AsOfJoinExec]]. Registered per-session via
  * [[AsOfMergeJoin.asofJoin]] (experimental.extraStrategies) or globally
  * via `spark.sql.extensions=graft.expressions.GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, fwd, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, fwd, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered by key and sorted
  * by (key, time[, tieBreak]) — both enforced by EnsureRequirements, so
  * existing layouts are reused when present. Each co-located partition
  * pair is merged in one forward pass: right rows are consumed while
  * `(rkey, rtime) <= (lkey, ltime)`, the last consumed same-key row is
  * the match (null-extended when absent). */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    forward: Boolean,
    toleranceMicros: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeTypes = Seq(leftTime.dataType)
    val nRightFields = right.output.size
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val allOutput = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(timeTypes)
      val resultProj = UnsafeProjection.create(allOutput, allOutput)
      val nullRight = new GenericInternalRow(nRightFields)
      val joined = new JoinedRow

      val fwd = forward
      val tol = toleranceMicros

      new Iterator[InternalRow] {
        // Lookahead right row (owned copies — child iterators reuse
        // their row buffers) and the current same-key match candidate.
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var rHeadTime: UnsafeRow = _
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _
        private var candTime: UnsafeRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next().copy()
            rHeadKey = rKeyProj(rHead).copy()
            rHeadTime = rTimeProj(rHead).copy()
          } else { rHead = null; rHeadKey = null; rHeadTime = null }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lT = lTimeProj(lRow)
          // Skip right rows for keys before the current left key …
          while (rHead != null && keyOrd.compare(rHeadKey, lKey) < 0)
            advanceRight()
          val matchedRow: InternalRow =
            if (fwd) {
              // Forward: discard same-key rows strictly before ltime
              // (ascending left means they can't match later rows
              // either); the lookahead row itself is then the first
              // at-or-after — the match.
              while (rHead != null && keyOrd.compare(rHeadKey, lKey) == 0 &&
                  timeOrd.compare(rHeadTime, lT) < 0)
                advanceRight()
              if (rHead != null && keyOrd.compare(rHeadKey, lKey) == 0)
                rHead
              else null
            } else {
              // Backward: consume all same-key rows with rtime <= ltime;
              // the LAST consumed (max (rtime, tieBreak) — the sort
              // order) wins.
              while (rHead != null && keyOrd.compare(rHeadKey, lKey) == 0 &&
                  timeOrd.compare(rHeadTime, lT) <= 0) {
                cand = rHead; candKey = rHeadKey; candTime = rHeadTime
                advanceRight()
              }
              if (cand != null && keyOrd.compare(candKey, lKey) == 0 &&
                  tol.forall(t => lT.getLong(0) - candTime.getLong(0) <= t))
                cand
              else null
            }
          resultProj(joined(lRow,
            if (matchedRow != null) matchedRow else nullRight))
        }
      }
    }
  }
}

/** Column-name-level API over the custom operator. */
object AsOfMergeJoin {

  /** Same contract and output schema as [[AnalyticOps.asofJoin]] /
    * [[AnalyticOps.asofJoinForward]] / [[AnalyticOps.asofJoinTolerance]]
    * (`leftId, key, lts, asof_<rightId>`), executed by [[AsOfJoinExec]].
    * `toleranceSec` bounds how far BEFORE the left time the backward
    * match may lie (not supported forward, mirroring the window forms). */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, lts: String, rts: String,
      leftId: String, rightId: String,
      forward: Boolean = false,
      toleranceSec: Option[Long] = None): DataFrame = {
    require(!(forward && toleranceSec.isDefined),
      "tolerance is only defined for the backward direction")
    val spark = left.sparkSession
    GraftPlans.addStrategy(spark, AsOfJoinStrategy)
    GraftPlans.addOptimization(spark, PushFilterThroughAsOfJoin)
    val lp = GraftPlans.analyzed(
      left.select(col(key), col(lts), col(leftId)))
    val rp = GraftPlans.analyzed(
      right.select(col(key).as("__rk"), col(rts).as("__rt"),
        col(rightId).as("__rid")))
    val node = AsOfJoin(lp, rp,
      leftKeys = Seq(lp.output(0)), rightKeys = Seq(rp.output(0)),
      leftTime = lp.output(1), rightTime = rp.output(1),
      rightTieBreak = Seq(rp.output(2)),
      forward = forward,
      toleranceMicros = toleranceSec.map(_ * 1000000L))
    GraftPlans.ofRows(spark, node)
      .select(col(leftId), col(key), col(lts),
        col("__rid").as(s"asof_$rightId"))
  }
}
