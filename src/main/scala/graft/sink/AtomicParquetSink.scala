package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** K1's physical sink half: an atomically-swappable parquet table.
  *
  * No Delta jar ships in this environment (SURVEY.md §1.1), so keyed
  * upsert is read-merge-rewrite. The crash-safety problem with naive
  * "delete dir, rewrite dir" is the window where the table is gone;
  * instead the table is a directory of immutable VERSION subdirs plus a
  * `_current` pointer file, and the swap is a single POSIX/HDFS-atomic
  * rename of the pointer:
  *
  *   table/
  *     _current          -> contains "v-<uuid>"
  *     v-<uuid-1>/...    (previous version, GC'd after swap)
  *     v-<uuid-2>/...    (current version parquet)
  *
  * Readers resolve `_current` then read one immutable dir — a reader
  * concurrent with a writer sees either the old or the new version,
  * never a partial table. This mirrors the reference sink's staged-copy
  * + swap behavior (dataflow/BookingDataTransformation.json:156-186,
  * `staged: true`) without a transactional storage dependency.
  *
  * Scale: the pointer file is O(1); versions are plain parquet dirs so
  * writes parallelize across executors; old-version GC is driver-side
  * metadata-only. The merge that FEEDS this sink is the O(table) cost —
  * see [[graft.sink.BucketedFactStore]] for the partial-rewrite layout.
  */
object AtomicParquetSink {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(table: String) = new Path(table, "_current")

  /** Resolve the current version directory, if the table exists. */
  def currentVersionDir(spark: SparkSession, table: String): Option[String] = {
    val ptr = pointer(table)
    val f = fs(spark, ptr)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      val name = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      val dir = new Path(table, name)
      if (f.exists(dir)) Some(dir.toString) else None
    }
  }

  /** Read the current table state (None if never written). */
  def read(spark: SparkSession, table: String): Option[DataFrame] =
    currentVersionDir(spark, table).map(spark.read.parquet(_))

  /** Atomically replace the table contents: write a fresh version dir,
    * rename a pointer tempfile over `_current`, then GC old versions. */
  def overwrite(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val tableDir = new Path(table)
    val f = fs(spark, tableDir)
    f.mkdirs(tableDir)
    val old = currentVersionDir(spark, table)
    val versionName = s"v-${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(new Path(tableDir, versionName).toString)
    // atomic pointer swap: write tmp, rename over _current
    val tmp = new Path(tableDir, s"_current.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(versionName.getBytes("UTF-8")) finally out.close()
    // Hadoop rename refuses an existing destination on most FSs, so the
    // common update path is delete+rename. The non-atomic window is
    // pointer-only: a crash between the two leaves no `_current` (table
    // reads as absent, both version dirs intact) — never a partial table.
    if (!f.rename(tmp, pointer(table))) {
      f.delete(pointer(table), false)
      if (!f.rename(tmp, pointer(table)))
        throw new java.io.IOException(s"pointer swap failed for $table")
    }
    old.foreach(o => f.delete(new Path(o), true)) // best-effort GC
  }
}
