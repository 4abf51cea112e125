package graft

import graft.sink.{DeletionVectors, FileStats, MorLog, MorLogStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Log-level data skipping: per-file min/max stats ride the MorLog
  * version log (collected from parquet footers at commit, delta/full
  * mirrored with the meta), and readWhere prunes files whose bounds
  * prove the predicate false — stats are advisory, every answer must
  * equal the unpruned read + filter. */
class FileStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** ids 0..n-1 range-clustered into `parts` files with disjoint
    * [min,max] — the layout stats skipping exists for. */
  private def clustered(n: Int, parts: Int): DataFrame =
    spark.range(n).toDF("id")
      .withColumn("grp", (col("id") % 7).cast("int"))
      .withColumn("name", concat(lit("u"), format_string("%06d", col("id"))))
      .withColumn("val", col("id").cast("double") * 1.5)
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions("id")

  private def ids(df: DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("range predicate prunes disjoint-range files; answers equal unpruned filter") {
    val dir = s"${tmp("graft-fst1-")}/t"
    MorLog.create(clustered(10000, 8), dir)
    val cond = col("id") >= 2000L && col("id") < 2500L
    val out = MorLog.readWhere(spark, dir, cond)
    assert(ids(out) == (2000L until 2500L).toSet)
    assert(MorLogStats.lastFilesSkipped > 0,
      "disjoint range files must be skipped")
    assert(MorLogStats.lastFilesScanned < 8)
    // point lookup: at most one file survives
    assert(ids(MorLog.readWhere(spark, dir, col("id") === 7777L)) ==
      Set(7777L))
    assert(MorLogStats.lastFilesScanned == 1)
    // string bounds prune too (names are ordered with ids)
    assert(ids(MorLog.readWhere(spark, dir, col("name") === "u000042")) ==
      Set(42L))
    assert(MorLogStats.lastFilesSkipped > 0)
  }

  test("skipping composes with tombstones: deleteWhere then readWhere") {
    val dir = s"${tmp("graft-fst2-")}/t"
    MorLog.create(clustered(10000, 8), dir)
    assert(MorLog.deleteWhere(spark, dir, col("id") % 10 === 3L) == 1000L)
    val out = MorLog.readWhere(spark, dir,
      col("id") >= 1000L && col("id") < 3000L)
    assert(ids(out) ==
      (1000L until 3000L).filterNot(_ % 10 == 3).toSet)
    assert(MorLogStats.lastFilesSkipped > 0)
    // the delete's own locate scan pruned: a range delete touching one
    // file's range must not scan the others
    val before = MorLogStats.lastFilesScanned
    assert(MorLog.deleteWhere(spark, dir, col("id") === 4444L) == 1L)
    assert(ids(MorLog.readWhere(spark, dir,
      col("id") >= 4440L && col("id") <= 4450L)) ==
      (4440L to 4450L).filterNot(i => i % 10 == 3 || i == 4444L).toSet)
  }

  test("And/Or three-valued pruning and null semantics") {
    val dir = s"${tmp("graft-fst3-")}/t"
    val df = spark.range(1000).toDF("id")
      .withColumn("maybe",
        when(col("id") < 500L, col("id")).otherwise(lit(null).cast("bigint")))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    MorLog.create(df, dir)
    // OR of two disjoint edges prunes the middle files
    val out = MorLog.readWhere(spark, dir,
      col("id") < 100L || col("id") >= 900L)
    assert(ids(out) == ((0L until 100L) ++ (900L until 1000L)).toSet)
    assert(MorLogStats.lastFilesSkipped > 0,
      "middle files satisfy neither OR branch")
    // maybe IS NULL: files where nullCount == 0 skip
    val nn = MorLog.readWhere(spark, dir, col("maybe").isNull)
    assert(ids(nn) == (500L until 1000L).toSet)
    assert(MorLogStats.lastFilesSkipped > 0)
    // maybe > x on the all-null files: skipped (comparison never true)
    val gt = MorLog.readWhere(spark, dir, col("maybe") > 100L)
    assert(ids(gt) == (101L until 500L).toSet)
    assert(MorLogStats.lastFilesSkipped > 0)
  }

  test("stats are advisory: a table with no stats files scans everything, correctly") {
    val dir = s"${tmp("graft-fst4-")}/t"
    MorLog.create(clustered(2000, 4), dir)
    // simulate pre-stats history: drop every stats file
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_log")).foreach { s =>
      if (s.getPath.getName.endsWith(".stats")) fs.delete(s.getPath, false)
    }
    graft.sink.MorLog.dropStatsCache(dir)
    val out = MorLog.readWhere(spark, dir, col("id") === 42L)
    assert(ids(out) == Set(42L))
    assert(MorLogStats.lastFilesSkipped == 0,
      "no stats may never mean skip")
    assert(MorLogStats.lastFilesScanned == 4)
  }

  test("the stats chain survives checkpoints, vacuum, and travel") {
    val dir = s"${tmp("graft-fst5-")}/t"
    MorLog.create(clustered(1000, 2), dir)
    // push past CheckpointEvery(10) with disjoint-range appends
    (1 to 12).foreach { k =>
      MorLog.append(spark, dir,
        spark.range(k * 1000L, k * 1000L + 1000L).toDF("id")
          .withColumn("grp", (col("id") % 7).cast("int"))
          .withColumn("name",
            concat(lit("u"), format_string("%06d", col("id"))))
          .withColumn("val", col("id").cast("double") * 1.5)
          .coalesce(1))
    }
    val all = (0L until 13000L).toSet
    assert(ids(MorLog.read(spark, dir)) == all)
    val out = MorLog.readWhere(spark, dir,
      col("id") >= 5100L && col("id") < 5200L)
    assert(ids(out) == (5100L until 5200L).toSet)
    assert(MorLogStats.lastFilesScanned <= 2,
      "append-era files outside the range must all skip")
    // travel: version 3's snapshot prunes against version-3 stats
    val v3 = MorLog.versions(spark, dir)(3)
    val tv = MorLog.readWhere(spark, dir, col("id") >= 2500L, Some(v3))
    assert(ids(tv) == (2500L until 4000L).toSet)
    // vacuum collapses the chain; pruning and answers survive
    MorLog.vacuum(spark, dir, keepVersions = 2)
    val pv = MorLog.readWhere(spark, dir,
      col("id") >= 5100L && col("id") < 5200L)
    assert(ids(pv) == (5100L until 5200L).toSet)
    assert(MorLogStats.lastFilesSkipped > 0)
  }

  test("type widening keeps old files' stats comparable") {
    val dir = s"${tmp("graft-fst6-")}/t"
    val narrow = spark.range(1000)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2).cast("float").as("v"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    MorLog.create(narrow, dir)
    MorLog.evolveAppend(spark, dir,
      spark.range(10000L, 11000L)
        .select(col("id").as("id"), (col("id") * 2).cast("double").as("v")))
    // long-typed literal against int32-era file stats
    val out = MorLog.readWhere(spark, dir, col("id") < 250L)
    assert(out.select("id").as[Long].collect().toSet == (0L until 250L).toSet)
    assert(MorLogStats.lastFilesSkipped > 0,
      "int-era files past the bound must skip under the widened type")
  }
}
