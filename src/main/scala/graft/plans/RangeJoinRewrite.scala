package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive point-in-interval join
  *
  *   `points JOIN intervals ON pt >= lo AND pt <= hi`
  *
  * (which Spark can only plan as a BroadcastNestedLoopJoin — all
  * points × all intervals) into the bucketized equi-join form of
  * [[graft.ops.RangeJoin]]: bucket the point side, explode the
  * interval side onto its covered buckets, equi-join on the bucket id,
  * keep the original range predicate as the residual filter. The
  * rewrite preserves semantics exactly — each qualifying pair meets
  * exactly once because a point has one bucket — while turning the
  * O(|P|·|I|) nested loop into a hash-shuffle equi-join.
  *
  * Deliberately narrow trigger: inner join whose WHOLE condition is
  * `ptAttr >= loAttr AND ptAttr <= hiAttr` over LongType attributes
  * (epoch seconds), point side left. Anything else is left untouched.
  * Bucket width comes from `spark.graft.rangeJoin.bucketSeconds`
  * (default 3600). Installed by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`; the rewritten condition no longer matches
  * the trigger pattern, so the rule is fixed-point safe.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] {

  private def bucketSeconds: Long =
    conf.getConfString("spark.graft.rangeJoin.bucketSeconds", "3600").toLong

  /** Exact floor division for any sign: (x - pmod(x, w)) div w. */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner,
        Some(And(
          GreaterThanOrEqual(pt: AttributeReference, lo: AttributeReference),
          LessThanOrEqual(pt2: AttributeReference, hi: AttributeReference))),
        hint)
      if pt.semanticEquals(pt2) && pt.dataType == LongType
        && lo.dataType == LongType && hi.dataType == LongType
        && left.outputSet.contains(pt)
        && right.outputSet.contains(lo) && right.outputSet.contains(hi) =>
      val w = bucketSeconds
      val pBucket = Alias(floorDiv(pt, w), "_graft_rjb_p")()
      val newLeft = Project(left.output :+ pBucket, left)
      val iBucketAttr = AttributeReference("_graft_rjb_i", LongType,
        nullable = false)()
      // optimizer rules run post-analysis: the timezone the analyzer
      // would have injected must be set by hand or the plan de-resolves
      val gen = Explode(new Sequence(floorDiv(lo, w), floorDiv(hi, w))
        .withTimeZone(conf.sessionLocalTimeZone))
      val newRight = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(iBucketAttr), child = right)
      val newCond = And(
        EqualTo(pBucket.toAttribute, iBucketAttr),
        And(GreaterThanOrEqual(pt, lo), LessThanOrEqual(pt, hi)))
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
