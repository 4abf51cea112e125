package graft.plans

import graft.functions.JaccardSorted
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: every `graft_jaccard(a, b) >= τ` filter conjunct
  * gets a FREE size-ratio prefilter injected next to it:
  *
  *   least(size(a), size(b)) >= τ · greatest(size(a), size(b))
  *
  * Implied algebra: |∩| ≤ min(|a|,|b|) and |∪| ≥ max(|a|,|b|), so
  * jaccard ≥ τ forces min ≥ τ·max — the prefilter can never drop a
  * row the jaccard filter would keep. The NaN empty-empty case passes
  * BOTH conjuncts (0 ≥ τ·0, and Spark orders NaN above every double,
  * so `NaN >= τ` is true): Spark semantics are preserved exactly,
  * which is the rule's contract. The payoff: two array-
  * HEADER reads kill most candidate pairs before the O(|a|+|b|)
  * merge scan runs — profiled ~9× on blocked pairwise Jaccard
  * (q21), where most pairs in a (lang, length) block are nowhere
  * near τ. With this rule users write the textbook filter and get
  * the short-circuit automatically; the hand-tuned form in
  * [[graft.dedup.Dedup.ngramJaccardPairs]] stays for sessions
  * running without the extension.
  *
  * Fixed-point safe: an injected conjunct is recognized (semantic
  * equality) and never added twice. Triggers only on a top-level
  * conjunct of a Filter whose shape is exactly
  * `GreaterThanOrEqual(JaccardSorted, Literal(τ > 0))`.
  */
case class JaccardPrefilter() extends Rule[LogicalPlan] with PredicateHelper {

  private def prefilterFor(a: Expression, b: Expression,
                           tau: Double): Expression = {
    val sa = Size(a); val sb = Size(b)
    // 1-ulp-scale slack on the bound: fl(|∩|/|∪|) >= τ and
    // size_min >= fl(τ·size_max) can disagree by 1 ulp for adversarial
    // τ, which would silently prune a boundary pair the exact jaccard
    // filter (and the oracle) keeps. Pairs admitted by the slack still
    // die at the exact filter, so results are identical.
    GreaterThanOrEqual(
      Cast(Least(Seq(sa, sb)), DoubleType),
      Multiply(Literal(tau * (1.0 - 1e-9)),
        Cast(Greatest(Seq(sa, sb)), DoubleType)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.collect {
        case GreaterThanOrEqual(JaccardSorted(a, b),
            Literal(tau: Double, DoubleType)) if tau > 0.0 =>
          prefilterFor(a, b, tau)
      }.filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (additions.isEmpty) f
      else Filter(additions.foldLeft(cond)((c, p) => And(p, c)), child)
  }
}
