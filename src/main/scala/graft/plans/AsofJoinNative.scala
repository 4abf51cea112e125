package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.GraftPlanBridge

/** Native AS-OF join: the full custom-operator stack — a resolved
  * [[AsofJoinPlan]] logical node, an [[AsofJoinStrategy]] planner
  * strategy, and a physical [[AsofJoinExec]] that merge-scans the two
  * sorted sides in one pass per partition.
  *
  * Semantics match [[graft.ops.AsofJoin.asofLeft]] (inclusive
  * point-in-time left join, DuckDB/kdb `ASOF LEFT JOIN`): for each
  * left row, the single right row with the greatest time ≤ the left
  * time within the same key, or nulls. NULL keys follow SQL equi-join
  * semantics on BOTH sides: a left row with a NULL key gets a null
  * right side, a right row with a NULL key is never held as a match
  * (without the explicit guards the natural ascending ordering would
  * compare NULL == NULL and fabricate matches). PRECONDITION: the
  * right side must be unique per (key, time) — duplicate (key, time)
  * rows make the held winner depend on sort-tie order, which is not
  * deterministic; pre-dedupe with latest-per-key otherwise. The exec
  * ENFORCES this with a streaming adjacent-row check on the sorted
  * right side (O(1) per consumed row): a violation fails the task
  * with a clear error instead of returning order-dependent winners.
  *
  * Why a physical operator when the union-window encoding already
  * works: the window form materializes |L|+|R| rows through one sort
  * WITH the carried payload struct, then filters half of them back
  * out. The exec needs the same shuffle+sort (declared via
  * `requiredChildDistribution`/`requiredChildOrdering`, so Catalyst
  * plans — and can elide — the exchanges like any join), but streams
  * the two sides against each other holding ONE buffered right row:
  * no payload column rides the sort, no post-filter, no window state.
  * At 100 TB that is the difference between sorting the fact plus its
  * carried struct and sorting the bare join columns.
  *
  * Generalizes the reference's T3 "latest as of now" lookup
  * (dataflow/BookingDataTransformation.json:117-118) to arbitrary
  * point-in-time probes.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] → [[AsofJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions)
  * with a late-bind fallback through `spark.experimental`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Merge-scan AS-OF join executor. Both children are hash-clustered on
  * their keys and sorted by (keys, time) — Catalyst inserts (or
  * reuses) the exchanges/sorts exactly as it would for a sort-merge
  * join. Each partition then advances a single buffered right row:
  * O(|L|+|R|) compares, O(1) state, no codegen needed because the hot
  * loop is two pre-compiled unsafe projections and an ordering. */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(leftTime.dataType))
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        // pending: next unconsumed right row; held: latest right row
        // whose (key, time) qualified for the current left key. Rows
        // and their projected keys are copied because unsafe iterators
        // and projections reuse buffers.
        private var pRow: InternalRow = _
        private var pKey: InternalRow = _
        private var pTime: InternalRow = _
        private var hRow: InternalRow = _
        private var hKey: InternalRow = _
        advancePending()

        // The documented right-side precondition — unique (key, time) —
        // is CHECKED, not trusted: the right side arrives sorted by
        // (key, time), so any violation is two ADJACENT consumed rows
        // with equal key and time, and a single prev-row compare per
        // advance catches it. Violations would otherwise return
        // sort-tie-order-dependent winners — silently nondeterministic.
        // (Rows beyond the last one the merge consumes are never
        // examined; the check covers every row that could influence a
        // result.)
        private def advancePending(): Unit =
          if (rIter.hasNext) {
            val prevKey = pKey
            val prevTime = pTime
            pRow = rIter.next().copy()
            pKey = rKeyProj(pRow).copy()
            pTime = rTimeProj(pRow).copy()
            if (prevKey != null && !prevKey.anyNull && !pKey.anyNull &&
                keyOrd.compare(prevKey, pKey) == 0 &&
                timeOrd.compare(prevTime, pTime) == 0)
              throw new IllegalStateException(
                "as-of join right side must be unique per (key, time): " +
                  "found duplicate rows for one (key, time) — pre-dedupe " +
                  "with a latest-per-key pass (the held winner would " +
                  "otherwise depend on nondeterministic sort-tie order)")
          } else { pRow = null; pKey = null; pTime = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          // SQL equi-join semantics: a NULL in the key never matches
          // anything (the natural ascending ordering would compare
          // NULL == NULL and fabricate a match). Null-key left rows
          // sort first (NULLS FIRST), so emitting early leaves the
          // merge state untouched for the non-null run that follows.
          if (lKey.anyNull)
            return resultProj(joined(l, nullRight))
          val lTime = lTimeProj(l)
          if (hRow != null && keyOrd.compare(hKey, lKey) != 0) {
            hRow = null; hKey = null
          }
          var scanning = true
          while (scanning && pRow != null) {
            // null-key right rows match no left row — skip, never hold
            if (pKey.anyNull) advancePending()
            else {
              val c = keyOrd.compare(pKey, lKey)
              if (c < 0) advancePending()
              else if (c == 0 && timeOrd.compare(pTime, lTime) <= 0) {
                hRow = pRow; hKey = pKey
                advancePending()
              } else scanning = false
            }
          }
          resultProj(joined(l, if (hRow != null) hRow else nullRight))
        }
      }
    }
  }
}

object AsofJoinNative {

  /** Late-bind the strategy for sessions not built with
    * GraftExtensions (mirrors GraftFunctions.ensureRegistered). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.sessionState.planner.strategies.contains(AsofJoinStrategy)
        && !spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }

  /** Point-in-time left join via the native operator. Output columns =
    * left.* ++ right.* (caller renames the right side first to avoid
    * collisions). Key/time expressions are column names per side. */
  def asofLeft(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // fresh exprIds on the right so a self-as-of (both sides derived
    // from one table, as in any CDC probe) can never alias the left's
    // attributes — the analyzer's join dedup doesn't see custom nodes
    val aliases = rp0.output.map(a => Alias(a, a.name)())
    val rp = Project(aliases, rp0)
    val rAttrs = aliases.map(_.toAttribute)
    def pick(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${out.map(_.name).mkString(", ")}"))
    GraftPlanBridge.ofRows(spark, AsofJoinPlan(lp, rp,
      Seq(pick(lp.output, leftKey)), Seq(pick(rAttrs, rightKey)),
      pick(lp.output, leftTs), pick(rAttrs, rightTs)))
  }
}
