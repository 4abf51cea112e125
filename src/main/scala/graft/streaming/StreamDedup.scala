package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming exact deduplication for a continuously-ingested document
  * feed — the streaming face of [[graft.dedup.Dedup.exactDupGroups]].
  *
  * `dropDuplicates` on the content hash over a streaming DataFrame is
  * STATEFUL: the seen-key set lives in the checkpointed state store, so
  * a duplicate arriving in a later micro-batch (or a later drain of the
  * same feed, via the checkpoint) is dropped exactly like an
  * intra-batch duplicate. State is hash-partitioned by the dedup key
  * across executors — at 100 TB of docs the state is |distinct hashes|
  * × 32 bytes spread over the cluster, and each batch shuffles only its
  * own rows. Without a watermark the state grows unboundedly — right
  * for a bounded backfill drain (AvailableNow); a forever-running feed
  * bounds state with `withWatermark` + event-time keys the same way
  * [[EventTimeOps]] does.
  */
object StreamDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Dump a document set as `nFiles` deterministic JSON file groups
    * (the feed). */
  def writeFeed(docs: DataFrame, dir: String, nFiles: Int): Unit =
    docs.select("doc_id", "text", "lang")
      .withColumn("file_id", pmod(col("doc_id"), lit(nFiles)))
      .repartition(col("file_id"))
      .write.mode("overwrite").partitionBy("file_id").json(dir)

  /** Watermark-BOUNDED streaming dedup — the forever-running form of
    * [[run]]: `dropDuplicatesWithinWatermark` keeps a key in state only
    * until the watermark passes it, so state is O(keys per watermark
    * horizon), not O(all keys ever) — the production answer for an
    * unbounded feed where exact global dedup state would outgrow the
    * cluster. Semantics: duplicates arriving within the horizon are
    * dropped exactly; a duplicate arriving after its original's state
    * expired passes (by design — the horizon IS the dedup guarantee).
    * Downstream exact dedup (e.g. [[graft.dedup.Dedup.exactDupGroups]]
    * over the sink) restores global exactness batch-side. */
  def runBounded(spark: SparkSession, feedDir: String, checkpointDir: String,
                 outDir: String, delay: String = "10 minutes",
                 maxFilesPerTrigger: Int = 2): DataFrame = {
    val eventSchema = StructType(docSchema.fields :+
      StructField("event_ts", TimestampType))
    val q = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .json(feedDir)
      .withColumn("text_md5", md5(col("text")))
      .withWatermark("event_ts", delay)
      .dropDuplicatesWithinWatermark("text_md5")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()
    q.awaitTermination()
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
  }

  /** Drain the feed with cross-batch stateful dedup on md5(text);
    * first-seen doc per distinct content survives. Appends survivors
    * to `outDir`; returns the drained end state. */
  def run(spark: SparkSession, feedDir: String, checkpointDir: String,
          outDir: String, maxFilesPerTrigger: Int = 2): DataFrame = {
    val q = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .json(feedDir)
      .withColumn("text_md5", md5(col("text")))
      .dropDuplicates("text_md5")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      // per-batch OVERWRITE dir: a replayed batch (crash between sink
      // write and checkpoint commit) rewrites its own files instead of
      // appending survivor duplicates
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()
    q.awaitTermination()
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
  }
}
