package graft.streaming

import graft.sink.{BloomSkipIndex, ZOrderLayout}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.Trigger

/** A STREAMING indexed table: each arriving micro-batch appends
  * Z-order-clustered files and folds BOTH metadata sidecars — the
  * min/max manifest ([[ZOrderLayout.zorderAppendRankedN]]) and the
  * bloom membership index ([[BloomSkipIndex.foldBloomSidecar]]) — so
  * the table is queryable through [[graft.sink.CompositeSkip]] at any
  * point in the stream's life, with per-batch maintenance cost
  * O(batch), never O(table).
  *
  * Replay safety: appends are NOT naturally idempotent (re-appending
  * a replayed batch duplicates rows), so each batch is fenced by a
  * `_commits/<batchId>` marker written AFTER the append+fold — the
  * Delta-style transaction-log shape. A replayed batchId is a no-op.
  * A crash between append and marker leaves the same small window
  * every non-atomic committer has; a deployment closes it by staging
  * the batch's files and renaming last (the
  * [[graft.sink.AtomicParquetSink]] pattern), which is orthogonal to
  * the indexing shown here. Sidecar staleness is independently safe
  * either way: an interrupted fold merely fails the freshness check
  * and reads fall back to the scan recompute — wrong rows are
  * impossible, only skipped savings.
  *
  * Reference anchor: the reference's change feed continuously loads
  * an indexed, hash-distributed warehouse table
  * (pipeline/LoadBookingFact.json:5-38; README.md:455-475) — this is
  * that shape on open parquet: stream in, stay indexed, query
  * through metadata.
  */
object StreamIndexedLayout {

  /** Same (table, checkpoint) fence namespace as [[StreamMoR]]: batch
    * ids restart per checkpoint, so markers carry a run tag. */
  private def markerPath(tableDir: String, runTag: String,
                         batchId: Long): Path =
    new Path(s"$tableDir/_commits/${runTag}batch-$batchId")

  /** Idempotently fold one micro-batch into the indexed table: skip
    * outright when this batchId's marker exists (replay), else
    * append the batch clustered on `dims`' Morton curve (manifest
    * folds inside), reconcile the `keyCol` bloom sidecar (created on
    * the first batch, folded at O(batch) after), and write the
    * marker. Exposed for direct unit-testing of the fence. */
  def appendBatch(spark: SparkSession, tableDir: String,
                  batch: DataFrame, batchId: Long,
                  dims: Seq[String], keyCol: String,
                  nFiles: Int, buckets: Int,
                  runTag: String = ""): Unit = {
    val marker = markerPath(tableDir, runTag, batchId)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return
    ZOrderLayout.zorderAppendRankedN(batch, dims, tableDir, nFiles, buckets)
    BloomSkipIndex.foldBloomSidecar(spark, tableDir, keyCol)
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  /** Drain a parquet file feed into the indexed table: one
    * [[appendBatch]] per micro-batch, checkpointed, AvailableNow (the
    * drain-now-resume-later trigger the reference's checkpointed
    * dataflow uses). After the drain the table answers composite
    * box+id queries through its write-maintained sidecars. */
  def run(spark: SparkSession, feedDir: String, schema: StructType,
          checkpointDir: String, tableDir: String,
          dims: Seq[String], keyCol: String,
          nFiles: Int, buckets: Int = 64,
          maxFilesPerTrigger: Int = 1): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(spark, tableDir, batch, batchId,
          dims, keyCol, nFiles, buckets,
          StreamMoR.runTagOf(checkpointDir))
      }
      .start()
    q.awaitTermination()
  }
}
