package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) joins — the 100 TB join strategy the engine
  * leans on when neither side broadcasts: both tables written
  * `bucketBy(key)` join WITHOUT any shuffle, because each bucket pair
  * is already co-partitioned on disk. The spec proves the plan
  * property the bench can't: zero Exchange operators in the join. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("join of two bucketed tables runs with ZERO shuffles") {
    val fact = (1 to 1000).map(i => (i.toLong % 50, s"evt$i", i * 1.0))
      .toDF("cust_id", "tag", "amount")
    val dim = (0L to 49L).map(i => (i, s"cust$i")).toDF("cust_id", "name")
    fact.write.mode("overwrite").bucketBy(8, "cust_id")
      .sortBy("cust_id").saveAsTable("bdemo_fact")
    dim.write.mode("overwrite").bucketBy(8, "cust_id")
      .sortBy("cust_id").saveAsTable("bdemo_dim")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so bucketing (not broadcast) is what
      // eliminates the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bdemo_fact")
        .join(spark.table("bdemo_dim"), "cust_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
      // sanity: the same join WITHOUT bucketing does shuffle
      val unbucketed = fact.join(dim, "cust_id")
        .queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"),
        "control: non-bucketed join should shuffle here")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bdemo_fact")
      spark.sql("DROP TABLE IF EXISTS bdemo_dim")
    }
  }

  test("native as-of join over bucketed sorted tables plans ZERO exchanges") {
    // the custom AsofJoinExec declares its needs through
    // requiredChildDistribution/Ordering, so Catalyst elides the
    // shuffle exactly as it would for a sort-merge join when both
    // sides are bucketed on the key — proof the operator participates
    // in the physical-property framework rather than hardcoding a plan
    val probes = (1 to 400).map { i =>
      (i.toLong, i.toLong % 20, f"2024-01-01 ${i % 24}%02d:00:00")
    }.toDF("event_id", "user_id", "ts_s")
    val versions = (0 until 100).map { i =>
      (i.toLong % 20, f"2024-01-01 ${(i * 5) % 24}%02d:30:00", i * 1.0)
    }.distinct.groupBy(t => (t._1, t._2)).values.map(_.maxBy(_._3)).toSeq
      .toDF("r_uid", "asof_ts", "asof_v")
    // one file per bucket so the on-disk sort order is usable
    probes.repartition(1).write.mode("overwrite").bucketBy(4, "user_id")
      .sortBy("user_id", "ts_s").saveAsTable("basof_l")
    versions.repartition(1).write.mode("overwrite").bucketBy(4, "r_uid")
      .sortBy("r_uid", "asof_ts").saveAsTable("basof_r")
    try {
      val out = graft.plans.AsofJoinNative.asofLeft(
        spark.table("basof_l"), spark.table("basof_r"),
        "user_id", "r_uid", "ts_s", "asof_ts")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin"), s"native exec expected:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed as-of must not shuffle:\n$plan")
      assert(out.count() == 400)
      // result parity with the unbucketed window form
      val expect = graft.ops.AsofJoin.asofLeft(probes,
          versions.toDF("user_id", "ts_s", "v"), "user_id", "ts_s",
          Map("v" -> "asof_v", "ts_s" -> "asof_ts"))
        .select("event_id", "asof_v", "asof_ts")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
        .sortBy(_._1)
      val got = out.select("event_id", "asof_v", "asof_ts")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
        .sortBy(_._1)
      assert(got.sameElements(expect))
    } finally {
      spark.sql("DROP TABLE IF EXISTS basof_l")
      spark.sql("DROP TABLE IF EXISTS basof_r")
    }
  }
}
