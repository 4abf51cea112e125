package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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
