package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the table-maintenance op every streaming
  * ingest needs: micro-batch sinks (per-batch overwrite dirs, appended
  * rejected rows, kept-set fragments) accumulate files far smaller
  * than a sane scan unit, and at 100 TB the file COUNT, not the byte
  * count, becomes the scan/driver bottleneck (listing, task scheduling,
  * parquet footer reads). Compaction rewrites the tree into
  * ≈`targetBytes` files through [[AtomicParquetSink]], so readers swap
  * from fragmented to compacted atomically and a crash mid-compaction
  * leaves the original tree untouched.
  */
object Compaction {

  /** Total bytes of parquet data under `dir` (recursive). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) total += s.getLen
      }
      total
    }
  }

  /** Compact the (possibly deeply fragmented) parquet tree at `srcDir`
    * into the atomic table at `table`, sized to ≈targetBytes output
    * files. Returns the number of output partitions chosen; 0 = no-op
    * (missing dir or no parquet data — normal for e.g. a rejected-rows
    * tree that never saw an error row).
    *
    * Concurrency contract: run against a QUIESCED source (between
    * drains, or on a snapshot) — a live sink rewriting per-batch dirs
    * mid-compaction can invalidate the captured file listing. The
    * write side is safe regardless (the atomic table swaps or not). */
  def compact(spark: SparkSession, srcDir: String, table: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = dataBytes(spark, srcDir)
    if (bytes == 0L) return 0
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.option("recursiveFileLookup", "true").parquet(srcDir)
    AtomicParquetSink.overwrite(df.repartition(parts), table)
    parts
  }

  /** Z-order compaction of an [[AtomicParquetSink]] table — the Delta
    * `OPTIMIZE … ZORDER BY` shape: rewrite the CURRENT snapshot
    * clustered on the Morton curve of `dims` (skew-proof rank-bucket
    * quantization) as a NEW atomic version, then persist the per-file
    * min/max manifest inside that version dir. Value-neutral by
    * construction (same rows, new layout) and time-travel-preserving:
    * the pre-compaction snapshot stays readable via
    * [[AtomicParquetSink.readVersion]] under the sink's normal
    * retention. Point [[ZOrderLayout.prunedBoxScanN]] at the returned
    * version dir for manifest-pruned reads.
    *
    * Scale: the rewrite is one range-partitioned shuffle of the
    * snapshot (the cost any OPTIMIZE pays) plus one approxQuantile
    * pass; the manifest is a write-side stats pass over the freshly
    * written files. Returns the new current version directory. */
  def zorderCompact(spark: SparkSession, table: String,
                    dims: Seq[String], nFiles: Int,
                    buckets: Int = 64): String = {
    val cur = AtomicParquetSink.read(spark, table).getOrElse(
      throw new IllegalStateException(s"$table does not exist"))
    AtomicParquetSink.overwrite(
      ZOrderLayout.clusteredRanked(cur, dims, nFiles, buckets), table)
    val vdir = AtomicParquetSink.currentVersionDir(spark, table).getOrElse(
      throw new IllegalStateException(s"$table vanished after compaction"))
    ZOrderLayout.writeManifest(spark, vdir, dims)
    vdir
  }
}
