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
}
