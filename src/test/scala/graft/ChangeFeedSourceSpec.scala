package graft

import graft.streaming.CdcStream
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 change-feed connector: round-trip fidelity,
  * per-file parallelism, column pruning, and filter pushdown — each
  * asserted on the actual BatchScanExec, not assumed. */
class ChangeFeedSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fmt = "graft.sources.ChangeFeedSource"

  private def feed(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfs-").toString
    val changes = (1 to 200).map { i =>
      (i.toLong, (i % 10).toLong, if (i % 7 == 0) "error" else "update",
        i * 1.5, f"2024-01-01 ${i % 24}%02d:00:00")
    }.toDF("event_id", "user_id", "event_type", "value", "ts_s")
    CdcStream.writeChangeLog(changes, dir, nFiles = 4)
    (dir, changes)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[graft.sources.ChangeFeedScan]
    }.get

  test("round-trips the change log exactly, one partition per file") {
    val (dir, changes) = feed()
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.rdd.getNumPartitions == 4) // nFiles
    val got = back.as[(Long, Long, String, Double, String)].collect().toSet
    val want = changes.as[(Long, Long, String, Double, String)]
      .collect().toSet
    assert(got == want)
  }

  test("column pruning reaches the reader") {
    val (dir, _) = feed()
    val q = spark.read.format(fmt).option("path", dir).load()
      .select("event_type")
    assert(scanOf(q).required.fieldNames.toSeq == Seq("event_type"))
    assert(q.distinct().as[String].collect().toSet == Set("update", "error"))
  }

  test("v2 write: append round-trips, overwrite truncates, staging invisible") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfw-").toString
    val a = (1 to 50).map(i => (i.toLong, (i % 5).toLong, "update",
      i * 1.0, f"2024-01-01 ${i % 24}%02d:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts_s")
    a.write.format(fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.count() == 50)
    assert(back.as[(Long, Long, String, Double, String)].collect().toSet
      == a.as[(Long, Long, String, Double, String)].collect().toSet)
    // no .staged debris survives a successful commit
    val staged = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".staged"))
    assert(staged.isEmpty)
    // append accumulates; overwrite truncates to the new content
    a.withColumn("event_id", $"event_id" + 1000L)
      .write.format(fmt).option("path", dir).mode("append").save()
    assert(spark.read.format(fmt).option("path", dir).load().count() == 100)
    val b = a.withColumn("event_id", $"event_id" + 5000L)
    b.write.format(fmt).option("path", dir).mode("overwrite").save()
    val after = spark.read.format(fmt).option("path", dir).load()
    assert(after.count() == 50)
    assert(after.agg(min("event_id")).as[Long].head() == 5001L)
  }

  test("event_id/user_id comparisons push into the reader; rest residual") {
    val (dir, changes) = feed()
    val q = spark.read.format(fmt).option("path", dir).load()
      .filter($"event_id" > 100L && $"user_id" <= 5L
        && $"event_type" === "update")
    val pushed = scanOf(q).filters.map(_.toString).toSeq
    assert(pushed.exists(_.contains("event_id")) &&
      pushed.exists(_.contains("user_id")))
    assert(!pushed.exists(_.contains("event_type"))) // residual, Catalyst's
    val want = changes
      .filter($"event_id" > 100L && $"user_id" <= 5L
        && $"event_type" === "update").count()
    assert(q.count() == want && want > 0)
  }
}
