package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct sketch: partial-merge invariance, exact-below-k path,
  * estimator accuracy, partial aggregation plan. */
class KmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("below k distinct values the sketch is EXACT, duplicates ignored") {
    val df = (1 to 40).map(i => s"v${i % 10}").toDF("s")
    val est = df.agg(GraftFunctions.kmvDistinct(spark, $"s", 64)).as[Double].head()
    assert(est == 10.0)
  }

  test("estimate is invariant under partitioning (merge correctness)") {
    val vals = (1 to 5000).map(i => s"value-$i").toDF("s")
    val a = vals.repartition(1)
      .agg(GraftFunctions.kmvDistinct(spark, $"s", 64)).as[Double].head()
    val b = vals.repartition(37)
      .agg(GraftFunctions.kmvDistinct(spark, $"s", 64)).as[Double].head()
    assert(a == b, "sketch merge must be order/partition independent")
    // k=64 -> relative error typically < 1/sqrt(k-2) ~ 13%; allow 3 sigma
    assert(math.abs(a - 5000) / 5000 < 0.4, s"estimate $a too far from 5000")
  }

  test("plans with partial aggregation (map-side combine)") {
    val plan = (1 to 100).map(_.toString).toDF("s").repartition(4)
      .agg(GraftFunctions.kmvDistinct(spark, $"s", 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv_distinct")
      || plan.contains("Partial"), s"want partial agg:\n$plan")
  }
}
