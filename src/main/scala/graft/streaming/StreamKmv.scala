package graft.streaming

import graft.sink.AtomicParquetSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DoubleType

/** Streaming distinct-count via a MERGEABLE KMV sketch — the streaming
  * face of `graft_kmv_distinct` (q45) and the property that makes
  * sketches matter at scale: per-language state is the k smallest
  * 60-bit hashes seen so far (k·8 bytes per language, FOREVER, no
  * matter how many documents flow through), each micro-batch merges
  * its own k-minima in, and the estimate after any number of batches
  * is BIT-IDENTICAL to running the sketch over the whole corpus at
  * once — merge-then-estimate ≡ estimate-of-union, because min-k of a
  * union is the min-k of the merged min-k sets. That identity is what
  * the DuckDB oracle checks.
  *
  * Replay safety is structural: folding the same batch twice is a
  * no-op (distinct-union then prune cannot change an already-merged
  * state), so no batch-id fencing is needed.
  */
object StreamKmv {

  private def hv(colName: String) =
    expr(s"cast(conv(substring(md5($colName), 1, 15), 16, 10) as bigint)")

  /** Drain the feed folding per-lang k-minima; return (lang,
    * est_distinct) from the final state — q45's estimator expression. */
  def run(spark: SparkSession, feedDir: String, checkpointDir: String,
          stateDir: String, k: Int = 64,
          maxFilesPerTrigger: Int = 2): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("hv")
    val q = spark.readStream
      .schema(StreamDedup.docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .json(feedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bh = batch.select(col("lang"), hv("text").as("hv"))
          .distinct()
        val merged = AtomicParquetSink.read(spark, stateDir) match {
          case Some(st) => st.unionByName(bh).distinct()
          case None => bh
        }
        val pruned = merged.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).select("lang", "hv")
        AtomicParquetSink.overwrite(pruned, stateDir)
        ()
      }
      .start()
    q.awaitTermination()
    val st = AtomicParquetSink.read(spark, stateDir)
      .getOrElse(spark.emptyDataFrame)
    st.withColumn("rn", row_number().over(w))
      .groupBy("lang")
      .agg(count(lit(1)).as("nd"),
        max(when(col("rn") === k, col("hv"))).as("kth"))
      .select(col("lang"),
        round(when(col("nd") < k, col("nd").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976L)
            / col("kth")), 4).as("est_distinct"))
  }
}
