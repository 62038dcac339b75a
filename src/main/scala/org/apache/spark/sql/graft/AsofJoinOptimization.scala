package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule completing the custom-operator surface: Catalyst's
  * PushDownPredicates cannot see through an unknown node, so without
  * this rule a `df.filter(...)` above an [[AsofJoinPlan]] stops there
  * and the parquet scan below reads everything. The as-of join emits
  * EXACTLY one output row per left row, derived from that left row
  * alone (plus its match), so any deterministic predicate over left
  * columns commutes with the join and can sink to the left child —
  * from where the built-in rules carry it all the way into the scan's
  * PushedFilters.
  *
  * Batch-ordering caveat: installed via `ensureStrategy` the rule lands
  * in `experimental.extraOptimizations`, the FINAL optimizer batch —
  * AFTER PushDownPredicates has run. The sunk filter still reaches
  * PushedFilters when the left child is a scan-adjacent Project/Filter
  * chain, because FileSourceStrategy re-collects filters at PHYSICAL
  * planning; but if the left child contains a join or aggregate, the
  * predicate stops at `aj.left` instead of descending further. The
  * `spark.sql.extensions` path ([[GraftExtensions]] uses
  * `injectOptimizerRule`) runs inside the main batch cycle where
  * PushDownPredicates picks the sunk filter up on the next fixpoint
  * iteration — prefer it for standing sessions.
  *
  * Predicates referencing payload columns (or both sides) stay above
  * the join: a match-dependent filter does NOT commute (it would have
  * to drop left rows before their match is computed). */
object PushFilterThroughAsofJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoinPlan) =>
      // only the DETERMINISTIC PREFIX may move (Catalyst's
      // PushPredicateThroughNonJoin convention): a deterministic conjunct
      // AFTER a non-deterministic one must stay put, because reordering
      // evaluation changes which rows a seeded rand() sequence selects
      val (detPrefix, rest) = splitConjunctivePredicates(cond).span(_.deterministic)
      val (pushable, keptPrefix) =
        detPrefix.partition(_.references.subsetOf(aj.left.outputSet))
      val kept = keptPrefix ++ rest
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
