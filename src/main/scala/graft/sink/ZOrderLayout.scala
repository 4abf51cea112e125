package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER clustering + file-stats manifest pruning — multi-dimensional
  * data skipping for box-filter scans.
  *
  * The scale problem: a table range-partitioned (or sorted) on ONE
  * column prunes scans on that column only; a filter box over two
  * dimensions (`user_id BETWEEN … AND value BETWEEN …`) still reads
  * every file for the un-sorted dimension. Interleaving the bits of
  * both dimensions (Morton / Z-order curve) makes rows close in the
  * curve close in EVERY dimension, so each file's per-column min/max
  * box is tight on all clustered columns at once and most files can
  * be skipped for any small box. This is the standard lakehouse
  * layout optimization (Delta OPTIMIZE ZORDER BY, Iceberg sort
  * orders) rebuilt from first principles on plain parquet.
  *
  * Everything is Column algebra (shifts/masks/ors) — codegen'd, no
  * UDFs; the bit-spread is the classic 4-step mask doubling.
  *
  * Dimension quantization is linear min→max into 16 bits (one tiny
  * broadcast aggregate). At 100 TB with heavily skewed dimensions,
  * swap the linear scale for approx-quantile rank buckets — same
  * interleave, skew-proof cell occupancy; linear is kept here because
  * it is deterministic and oracle-friendly.
  *
  * The manifest is the file-skipping half: per-file min/max of the
  * clustered columns, collected into a tiny DataFrame (one row per
  * file — metadata-scale, like a Delta log / Iceberg manifest). A
  * pruned read intersects the query box with each file's box and
  * hands ONLY the surviving files to the parquet reader — file-level
  * skipping on top of the row-group-level pruning parquet stats
  * already give. On a real deployment the manifest is maintained
  * incrementally at write time; recomputing it here keeps the demo
  * self-contained.
  */
object ZOrderLayout {

  /** Spread the low 16 bits of `x` so bit i lands at position 2·i
    * (classic mask-doubling; all arithmetic in LongType). */
  private def spread16(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00ff00ffL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0f0f0f0fL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two 16-bit quantized dimensions (fits in 32 bits,
    * so signed-long ordering is the curve ordering). */
  def morton2(qa: Column, qb: Column): Column =
    spread16(qa).bitwiseOR(shiftleft(spread16(qb), 1))

  /** Linear 16-bit quantizer for a numeric column given its [lo, hi]
    * range; constant column when hi == lo. */
  def quantize16(c: Column, lo: Column, hi: Column): Column =
    when(hi <= lo, lit(0L)).otherwise(
      floor((c.cast("double") - lo) / (hi - lo) * lit(65535.0))
        .cast("long"))

  /** Rank-bucket quantizer: bucket index = #{boundaries ≤ value}−1,
    * computed by a codegen'd lambda over a ≤257-element boundary array
    * literal (no UDF, no join). Boundaries come from `approxQuantile`,
    * so each bucket holds ~equal ROW MASS regardless of the value
    * distribution — the skew-proof alternative to [[quantize16]]'s
    * linear scale (under which a heavy-tailed dimension collapses 99%
    * of rows into one curve cell and the layout degenerates to
    * single-dimension clustering on the other column). */
  def quantizeRank(c: Column, bounds: Array[Double]): Column = {
    val idx = size(filter(lit(bounds.drop(1).dropRight(1)),
      b => b <= c.cast("double")))
    least(greatest(idx.cast("long"), lit(0L)), lit((bounds.length - 2).toLong))
  }

  /** Skew-proof Z-order write: quantize both dimensions into
    * `buckets` equal-mass rank buckets (boundaries from one
    * `approxQuantile` pass — a driver-side array of ≤257 doubles, not
    * data), interleave, range-partition, sort, write. Same manifest /
    * pruned-scan read path as [[zorderWrite]]; only cell occupancy
    * changes. At 100 TB run the quantile pass on a row sample —
    * boundary error only costs skipping efficiency, never rows. */
  def zorderWriteRanked(df: DataFrame, dimA: String, dimB: String,
                        dir: String, nFiles: Int,
                        buckets: Int = 256): Unit = {
    require(buckets >= 2 && buckets <= 65536, s"buckets out of range: $buckets")
    val probs = (0 to buckets).map(_.toDouble / buckets).toArray
    // relative error = half a bucket's rank width: tighter buys nothing
    // (cell boundaries can't be sharper than a bucket), looser only
    // blurs cell occupancy — rows never leave the result either way
    val Array(bA, bB) = df.stat.approxQuantile(
      Array(dimA, dimB), probs, 0.5 / buckets)
    val z = df.withColumn("_z", morton2(
      quantizeRank(col(dimA), bA),
      quantizeRank(col(dimB), bB)))
    z.repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Cluster `df` on the Z-order curve of (dimA, dimB) and write it as
    * `nFiles` parquet files: range-partition on the morton code (range,
    * not hash — neighboring curve cells must land in the same file for
    * the min/max boxes to be tight), sort within partitions, write. */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String,
                  dir: String, nFiles: Int): Unit = {
    val r = df.agg(
      min(col(dimA)).cast("double").as("loA"),
      max(col(dimA)).cast("double").as("hiA"),
      min(col(dimB)).cast("double").as("loB"),
      max(col(dimB)).cast("double").as("hiB"))
    val z = df.crossJoin(broadcast(r))
      .withColumn("_z", morton2(
        quantize16(col(dimA), col("loA"), col("hiA")),
        quantize16(col(dimB), col("loB"), col("hiB"))))
      .drop("loA", "hiA", "loB", "hiB")
    z.repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file min/max manifest of two columns: one row per parquet
    * file — the metadata table a pruned scan consults. */
  def manifest(spark: SparkSession, dir: String,
               dimA: String, dimB: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(dimA)).as("minA"), max(col(dimA)).as("maxA"),
        min(col(dimB)).as("minB"), max(col(dimB)).as("maxB"))

  /** Files whose [min,max] box intersects the query box. */
  def survivingFiles(mf: DataFrame, aLo: Long, aHi: Long,
                     bLo: Double, bHi: Double): Seq[String] =
    mf.filter(col("maxA") >= aLo && col("minA") <= aHi &&
        col("maxB") >= bLo && col("minB") <= bHi)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Manifest-pruned box scan: consult the manifest, read ONLY the
    * surviving files, apply the exact filter. Result is identical to
    * filtering the full table — the manifest can only skip files whose
    * box provably misses. The driver-side file list is metadata-sized
    * (one string per surviving file), not data. */
  def prunedBoxScan(spark: SparkSession, dir: String,
                    dimA: String, dimB: String,
                    aLo: Long, aHi: Long,
                    bLo: Double, bHi: Double): DataFrame = {
    val mf = manifest(spark, dir, dimA, dimB)
    val files = survivingFiles(mf, aLo, aHi, bLo, bHi)
    val src =
      if (files.isEmpty)
        spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    src.filter(col(dimA) >= aLo && col(dimA) <= aHi &&
      col(dimB) >= bLo && col(dimB) <= bHi)
  }
}
