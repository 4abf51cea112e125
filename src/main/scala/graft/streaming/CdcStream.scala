package graft.streaming

import graft.ops.CdcOps
import graft.sink.AtomicParquetSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** O3 — the incremental CDC path as Structured Streaming.
  *
  * Reference shape (SURVEY.md §3.3): Cosmos change feed with a
  * persisted continuation checkpoint (`enableChangeFeed: true`,
  * dataflow/BookingDataTransformation.json:70-71;
  * `customizedCheckpointKey`, pipeline/LoadBookingFact.json:34-36) →
  * quality split → derive → keyed upsert into the warehouse fact.
  *
  * Spark-native mapping: a schema'd JSON file stream plays the change
  * feed (files arrive, each is consumed exactly once);
  * `checkpointLocation` is the continuation token;
  * `Trigger.AvailableNow` is "drain the feed this run, resume from the
  * checkpoint next run"; the sink is [[AtomicParquetSink]] fed by a
  * version-aware merge inside `foreachBatch`, with quality-rejected
  * rows appended to a rejected-rows dir (the sink's
  * `rejectedDataLinkedService`, dataflow:31-34).
  *
  * End-state determinism: the merge is [[CdcOps.mergeUpsertVersioned]]
  * — max-by-(ts, id) per key across existing ∪ batch — so the final
  * table is independent of how the change log is split into files and
  * micro-batches, and replaying a batch after a checkpoint-less crash
  * is a no-op. That is what makes the streaming result verifiable
  * against a pure batch oracle (q27) and is the exactly-once-equivalent
  * story at any scale.
  */
object CdcStream {

  /** Change-event schema carried on the wire (ts pre-formatted to
    * second precision — lexicographic order == chronological). */
  val changeSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts_s", StringType)))

  val mergeKeys: Seq[String] = Seq("user_id")

  /** Dump a change log DataFrame as `nFiles` JSON file groups (the
    * "feed"): deterministic assignment by key so re-dumps are
    * identical. */
  def writeChangeLog(changes: DataFrame, dir: String, nFiles: Int): Unit =
    changes
      .withColumn("file_id", pmod(col("event_id"), lit(nFiles)))
      .repartition(col("file_id"))
      .write.mode("overwrite").partitionBy("file_id").json(dir)

  /** One micro-batch: quality-split, stage rejects (per-batch
    * overwrite dir — a replayed batch rewrites, never duplicates),
    * version-merge the accepted rows into the atomic sink. */
  def processBatch(batch: DataFrame, batchId: Long, tableDir: String,
                   rejectedDir: String): Unit = {
    val spark = batch.sparkSession
    val (ok, bad) = CdcOps.qualitySplit(batch, col("event_type") === "error")
    bad.withColumn("_batch_id", lit(batchId))
      .write.mode("overwrite").parquet(s"$rejectedDir/batch_$batchId")
    val deduped = CdcOps.latestPerKey(ok, mergeKeys,
      Seq(col("ts_s"), col("event_id")))
    val merged = AtomicParquetSink.read(spark, tableDir) match {
      case Some(existing) =>
        CdcOps.mergeUpsertVersioned(existing, deduped, mergeKeys,
          Seq(col("ts_s"), col("event_id")))
      case None => deduped
    }
    AtomicParquetSink.overwrite(merged, tableDir)
  }

  /** Launch the checkpointed drain-the-feed run. `maxFilesPerTrigger`
    * forces multiple micro-batches so incremental merging is actually
    * exercised (and measured). */
  def run(spark: SparkSession, inputDir: String, checkpointDir: String,
          tableDir: String, rejectedDir: String,
          maxFilesPerTrigger: Int = 2): StreamingQuery =
    spark.readStream
      .schema(changeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true") // flatten file_id=N dirs
      .json(inputDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, tableDir, rejectedDir)
      }
      .start()

  /** Whole lifecycle for one feed drain: dump → stream → final state. */
  def runEndToEnd(spark: SparkSession, changes: DataFrame, workDir: String,
                  nFiles: Int = 4, maxFilesPerTrigger: Int = 2): DataFrame = {
    writeChangeLog(changes, s"$workDir/feed", nFiles)
    val q = run(spark, s"$workDir/feed", s"$workDir/checkpoint",
      s"$workDir/fact", s"$workDir/rejected", maxFilesPerTrigger)
    q.awaitTermination()
    AtomicParquetSink.read(spark, s"$workDir/fact")
      .getOrElse(spark.emptyDataFrame)
  }
}
