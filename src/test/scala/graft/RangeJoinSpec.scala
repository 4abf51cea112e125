package graft

import graft.ops.RangeJoin
import org.scalatest.funsuite.AnyFunSuite

/** Range join: inclusive bounds, exactly-once pair matching across
  * bucket boundaries, equi-join plan (no nested loop). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def points = Seq(
    (1L, 100L), (2L, 150L), (3L, 200L), (4L, 999L),
  ).toDF("pid", "ep")

  // interval 10 spans buckets 1-2 at width 100; 20 is empty-range
  private def intervals = Seq(
    (10L, 100L, 200L), (20L, 500L, 400L),
  ).toDF("iid", "s", "e")

  private def joined = RangeJoin.pointInInterval(points, intervals,
    "ep", "s", "e", bucketSeconds = 100L)

  test("inclusive bounds, cross-bucket intervals match each pair exactly once") {
    val pairs = joined.select("pid", "iid").as[(Long, Long)].collect().toSeq
    // both endpoints inclusive; no duplicates even though interval 10
    // is exploded into buckets 1 and 2; inverted interval matches nothing
    assert(pairs.sorted == Seq((1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("plans as an equi-join on the bucket, not BroadcastNestedLoop") {
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join must stay bucketized:\n$plan")
    // the shared test session now installs GraftExtensions (round 14),
    // so the NAIVE spelling is rescued by the RangeJoinRewrite
    // optimizer rule too — the old control (raw BETWEEN nested-loops)
    // holds only in extension-less sessions; here the stronger
    // property is that NO spelling nested-loops
    val naive = points.join(intervals,
      $"ep" >= $"s" && $"ep" <= $"e").queryExecution.executedPlan.toString
    assert(!naive.contains("BroadcastNestedLoop") &&
      naive.contains("_graft_rjb"),
      s"the rewrite rule must bucketize the naive BETWEEN join:\n$naive")
  }
}
