package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The RangeJoinRewrite optimizer rule: a naive BETWEEN join written
  * by a user becomes the bucketized equi-join automatically, with
  * identical results. */
class RangeJoinRewriteSpec extends AnyFunSuite {
  lazy val base = SparkTestSession.spark

  private def withGraftSession[T](body: SparkSession => T): T = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions()(_))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      body(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("naive BETWEEN join is rewritten to a bucketized equi-join, same rows") {
    val _ = base // materialize the shared context first
    withGraftSession { s =>
      import s.implicits._
      val points = (1 to 500).map(i => (i.toLong, (i * 37L) % 5000))
        .toDF("pid", "ep")
      val intervals = (1 to 40).map(i =>
        (i.toLong, (i * 123L) % 4000, (i * 123L) % 4000 + 500)).toDF("iid", "s", "e")
      val naive = points.join(intervals,
        $"ep" >= $"s" && $"ep" <= $"e")
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop"),
        s"rule must remove the nested loop:\n$plan")
      assert(plan.contains("Generate explode"),
        s"rewritten plan should explode interval buckets:\n$plan")
      // ground truth from the un-extended session (nested loop there)
      val expected = {
        import base.implicits._
        val p = (1 to 500).map(i => (i.toLong, (i * 37L) % 5000)).toDF("pid", "ep")
        val iv = (1 to 40).map(i =>
          (i.toLong, (i * 123L) % 4000, (i * 123L) % 4000 + 500)).toDF("iid", "s", "e")
        p.join(iv, p("ep") >= iv("s") && p("ep") <= iv("e"))
          .select("pid", "iid").as[(Long, Long)].collect().toSet
      }
      val got = naive.select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty)
    }
  }
}
