package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** S4 + K3 + K4 — the landing-zone file lifecycle around the dimension
  * load: enumerate, process, archive, delete-with-logging.
  *
  * Reference: GetMetadata `childItems` (pipeline/LoadCustomerDim.json:
  * 5-33), archive copy (:116-185), Delete with `enableLogging: true`
  * (:186-227). These are control-plane FS operations, so they live on
  * the driver; only the per-file LOAD is a Spark job. The deletion log
  * is one small file per deletion (append-free — object stores and
  * HDFS-without-append both support it; a log TABLE would compact
  * these at scale).
  */
object FileLifecycle {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S4 — list data files in the landing dir, name-sorted so the
    * sequential fold order (O2 `isSequential: true`) is deterministic. */
  def listFiles(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).sorted
  }

  /** K3 — copy a processed file into the archive dir (keeps the name). */
  def archive(spark: SparkSession, file: String, archiveDir: String): Unit = {
    val f = fs(spark, file)
    f.mkdirs(new Path(archiveDir))
    val src = new Path(file)
    val dst = new Path(archiveDir, src.getName)
    if (!FileUtil.copy(f, src, f, dst, false, true,
        spark.sparkContext.hadoopConfiguration))
      throw new java.io.IOException(s"archive copy failed: $file -> $dst")
  }

  /** K4 — delete the source file, recording a JSON log entry (one file
    * per deletion) in `logDir`. */
  def deleteLogged(spark: SparkSession, file: String, logDir: String): Unit = {
    val f = fs(spark, file)
    val src = new Path(file)
    if (!f.delete(src, false))
      throw new java.io.IOException(s"delete failed: $file")
    f.mkdirs(new Path(logDir))
    val entry = new Path(logDir,
      s"delete-${System.currentTimeMillis()}-${src.getName}.json")
    val out = f.create(entry, true)
    try out.write(
      s"""{"deleted":"${src.getName}","from":"${src.getParent}"}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Count of completed (processed+deleted) files — one log entry per
    * deletion, so the log IS the durable progress counter. */
  private def completedCount(spark: SparkSession, logDir: String): Int = {
    val f = fs(spark, logDir)
    val p = new Path(logDir)
    if (!f.exists(p)) 0
    else f.listStatus(p).count(_.getPath.getName.startsWith("delete-"))
  }

  /** The full per-file loop (O2): name-ordered fold of `process` over
    * the landing files, each followed by archive + logged delete —
    * exactly the reference's ForEach{upsert, archive, delete} chain.
    *
    * Sequence numbers are RETRY-STABLE: they start from the deletion
    * log's completed count, not from zero — after a partial failure
    * (some files processed+deleted, then a crash) the retry re-lists
    * only the survivors and numbers them as the continuation of the
    * first attempt, so later-file-wins tiebreaks keyed on the sequence
    * stay correct across retries. */
  def processAll(spark: SparkSession, landingDir: String, archiveDir: String,
                 logDir: String)(process: (String, Int) => Unit): Seq[String] = {
    val base = completedCount(spark, logDir)
    val files = listFiles(spark, landingDir)
    files.zipWithIndex.foreach { case (file, i) =>
      process(file, base + i)
      archive(spark, file, archiveDir)
      deleteLogged(spark, file, logDir)
    }
    files
  }
}
