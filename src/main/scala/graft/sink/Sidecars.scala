package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Shared read-path guard for metadata sidecars (`_manifest` stats,
  * `_bloom` filters): a sidecar is served ONLY when it exists, parses,
  * carries the needed columns, and its recorded file set matches the
  * directory's CURRENT listing — a pure name-set comparison, still
  * metadata-only. Anything else (crashed mid-write, foreign rewrite,
  * schema drift) returns None and the caller recomputes by scanning,
  * so a stale sidecar can cost extra reads but never wrong rows. */
private[sink] object Sidecars {

  /** Non-hidden data-file names under `dir` (one listing call). */
  def dataFileNames(spark: SparkSession, dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(_.isFile)
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet")
        && !n.startsWith("_") && !n.startsWith("."))
      .toSet
  }

  /** Complete `agged` — a per-file `groupBy(input_file_name())`
    * aggregate, metadata-sized by construction (one row per file) —
    * with one row per ZERO-ROW data file under `dir`, built by
    * `zeroRow(fullPath)`. A scan-side aggregate is BLIND to 0-row
    * files (no input rows → no group), and writers do emit them
    * (e.g. a compaction rewrite whose hash-partitioning leaves an
    * empty task, which some committer paths still materialize as an
    * empty part file) — without this completion any sidecar derived
    * from such an aggregate is permanently name-set-stale against
    * the listing, so freshness never holds again and every "pruned"
    * read silently degrades to a full scan forever (review-caught:
    * the round-9 mid-drain spec flushed it out). The aggregate is
    * COLLECTED (it is one row per file — metadata) and the result
    * re-parallelized: one scan plus a driver roundtrip, and the
    * returned frame is backed by driver rows, so writing it over the
    * very directory the aggregate read from cannot re-trigger the
    * scan mid-overwrite. (A lazy anti-join completion would instead
    * recompute the aggregate — i.e. rescan the data — in both union
    * branches.) */
  def withZeroRowFiles(spark: SparkSession, dir: String, agged: DataFrame)
                      (zeroRow: String => Row): DataFrame = {
    val rows = agged.collect().toSeq
    val seen = rows.map(r => new Path(r.getString(0)).getName).toSet
    val zeros = (dataFileNames(spark, dir) -- seen).toSeq.sorted
      .map(n => zeroRow(s"$dir/$n"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows ++ zeros, 1), agged.schema)
  }

  /** The sidecar at `dir/<name>` with columns `needed`, read WITHOUT
    * the freshness comparison — the raw form incremental folds need
    * (a fold's whole point is reconciling a sidecar that no longer
    * matches the listing). None when absent, unreadable, or missing
    * columns. */
  def readRaw(spark: SparkSession, dir: String, name: String,
              needed: Seq[String]): Option[DataFrame] = {
    val sdir = new Path(s"$dir/$name")
    val fs = sdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sdir)) return None
    try {
      // list the part files and read them explicitly: the sidecar dir
      // itself is underscore-prefixed (so DATA reads of `dir` skip it),
      // and handing that dir straight to the reader trips the hidden-
      // path filter ("All paths were ignored" warning)
      val parts = fs.listStatus(sdir).iterator
        .filter(_.isFile)
        .map(_.getPath.toString)
        .filter(_.endsWith(".parquet"))
        .toSeq
      if (parts.isEmpty) return None
      val side = spark.read.parquet(parts: _*)
      if (!needed.forall(side.columns.contains)) return None
      Some(side.select(needed.map(org.apache.spark.sql.functions.col): _*))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The sidecar at `dir/<name>`, with columns `needed` (which must
    * include `file`, the recorded data-file path), iff it is fresh
    * against the current listing of `dir`. */
  def readFresh(spark: SparkSession, dir: String, name: String,
                needed: Seq[String]): Option[DataFrame] = {
    try readRaw(spark, dir, name, needed).filter { side =>
      val recorded = side.select("file").collect()
        .map(r => new Path(r.getString(0)).getName).toSet
      recorded == dataFileNames(spark, dir)
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
