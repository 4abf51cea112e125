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

  test("dynamic partition pruning fires when the prune key arrives via a join") {
    // the 100 TB pattern: fact partitioned by a dim-derived key, filter
    // on the DIM side only — static pruning can't see it, DPP injects a
    // runtime subquery filter into the fact scan
    val dir = Files.createTempDirectory("graft-dpp-").toString
    (1 to 2000).map(i => (i.toLong, s"P${i % 8}", i * 1.0))
      .toDF("id", "pkey", "value")
      .repartition(1)
      .write.mode("overwrite").partitionBy("pkey").parquet(dir)
    // the dim must live on disk: a filtered LocalRelation constant-folds
    // (ConvertToLocalRelation) and leaves no Filter node for the DPP
    // rule's selective-predicate check
    val dimDir = Files.createTempDirectory("graft-dpp-dim-").toString
    (0 until 8).map(i => (s"P$i", s"name$i")).toDF("pkey", "name")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "true")
      val q = spark.read.parquet(dir)
        .join(dim.filter($"name" === "name3"), "pkey")
        .select("id", "value", "name")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a DPP subquery in the fact scan:\n$plan")
      // and it actually prunes: the fact scan reads 1 of the 8
      // partition files (scan metrics, post-execution)
      val rows = q.collect()
      assert(rows.nonEmpty && rows.forall(_.getString(2) == "name3"))
      // unwrap AQE + query stages: both hide their subtrees from collect
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case qs: QueryStageExec => allScans(qs.plan)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          (other.children ++ other.subqueries).flatMap(allScans)
      }
      val scans = allScans(q.queryExecution.executedPlan)
        .filter(_.schema.fieldNames.contains("id"))
      assert(scans.nonEmpty)
      assert(scans.head.metrics("numFiles").value == 1,
        s"expected 1 pruned file, got ${scans.head.metrics("numFiles").value}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
