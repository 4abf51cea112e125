package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Storage-layout levers that decide 100 TB scan cost: partition
  * pruning, predicate pushdown, and column pruning — asserted on the
  * actual FileScan, not assumed. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("date-partitioned writes prune to the single touched partition") {
    val dir = Files.createTempDirectory("graft-layout-").toString
    (1 to 1000).map(i => (i.toLong, s"2024-01-${"%02d".format(i % 10 + 1)}", i * 1.0))
      .toDF("event_id", "event_date", "value")
      .repartition(1)
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter($"event_date" === "2024-01-05")
      .select("event_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date")
      || plan.contains("PartitionFilters: [(event_date"),
      s"want a partition filter at the scan:\n$plan")
    // the scan must actually touch ONE partition directory
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.length == 1 && files.head.contains("event_date=2024-01-05"),
      s"expected one pruned partition, got ${files.toSeq}")
  }

  test("data filters push to parquet and projection prunes columns") {
    val dir = Files.createTempDirectory("graft-layout-").toString
    (1 to 1000).map(i => (i.toLong, s"tag$i", i * 1.0, s"pad$i"))
      .toDF("id", "tag", "value", "padding")
      .write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .filter($"id" > 900).select("id", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,900)"),
      s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,value:double>"),
      s"scan must read only projected columns:\n$plan")
  }
}
