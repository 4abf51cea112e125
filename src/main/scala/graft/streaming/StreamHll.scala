package graft.streaming

import graft.functions.HllDistinct
import graft.sink.AtomicParquetSink
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming distinct-count via the MERGEABLE HLL sketch — the
  * streaming face of `graft_hll_distinct` (q187), and the sibling of
  * [[StreamKmv]] with the other state trade-off: per-language state
  * is AT MOST 64 (bucket, max-rank) rows — 64 bytes of registers —
  * FOREVER, no matter how many documents flow through (KMV holds k
  * full hashes). Each micro-batch computes its own registers and
  * max-merges them into the stored state; because registers merge by
  * max, merge-then-estimate ≡ estimate-of-union, so the estimate
  * after any number of batches is BIT-IDENTICAL to the one-pass
  * kernel over the whole corpus — the identity the shared oracle
  * checks, and the register sum is integer-exact so batch order can
  * never move it.
  *
  * Replay safety is structural: max-merging the same batch twice is a
  * no-op, so no batch-id fencing is needed.
  */
object StreamHll {

  private def hv(colName: String): Column =
    expr(s"cast(conv(substring(md5($colName), 1, 15), 16, 10) as bigint)")

  /** (lang, bucket, mx) registers of a static frame — the kernel's
    * update step as column algebra (shiftright, not `/`: Column
    * division is double division and h/64 exceeds 2^53). */
  private def registers(df: DataFrame): DataFrame = {
    val h = hv("text")
    val rem = shiftright(h, 6)
    df.select(col("lang"), (h % 64).as("bucket"),
        when(rem === 0L, lit(HllDistinct.MaxRank))
          .otherwise(lit(HllDistinct.MaxRank) - length(bin(rem))).as("rho"))
      .groupBy("lang", "bucket").agg(max("rho").as("mx"))
  }

  /** Drain the feed max-merging per-lang registers; return (lang,
    * est_distinct) from the final state via the kernel's estimator
    * (integer-exact register sum, linear-counting fallback). */
  def run(spark: SparkSession, feedDir: String, checkpointDir: String,
          stateDir: String, maxFilesPerTrigger: Int = 2): DataFrame = {
    val q = spark.readStream
      .schema(StreamDedup.docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .json(feedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val br = registers(batch)
        val merged = AtomicParquetSink.read(spark, stateDir) match {
          case Some(st) => st.unionByName(br)
            .groupBy("lang", "bucket").agg(max("mx").as("mx"))
          case None => br
        }
        AtomicParquetSink.overwrite(merged, stateDir)
        ()
      }
      .start()
    q.awaitTermination()
    val st = AtomicParquetSink.read(spark, stateDir)
      .getOrElse(spark.emptyDataFrame)
    // the kernel's eval as column algebra: missing (lang, bucket) rows
    // are empty registers — they contribute 2^55 to the sum and count
    // as zeros (a stored register always has mx >= 1)
    val isum = (sum(call_function("shiftleft", lit(1L),
        lit(HllDistinct.MaxRank) - col("mx")))
      + (lit(64) - count(lit(1))) * lit(1L << HllDistinct.MaxRank)).as("isum")
    val zeros = (sum(when(col("mx") === 0, 1).otherwise(0))
      + (lit(64) - count(lit(1)))).as("zeros")
    val scaleNum = HllDistinct.Alpha * 64.0 * 64.0 * HllDistinct.TwoPow55
    st.groupBy("lang").agg(isum, zeros)
      .select(col("lang"),
        round(
          when(lit(scaleNum) / col("isum").cast("double") <= lit(160.0)
              && col("zeros") > 0,
            lit(64.0) * log(lit(64.0) / col("zeros").cast("double")))
          .otherwise(lit(scaleNum) / col("isum").cast("double")), 4)
          .as("est_distinct"))
  }
}
