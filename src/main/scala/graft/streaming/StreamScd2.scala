package graft.streaming

import graft.ops.Scd2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.Trigger

/** Checkpointed STREAMING SCD2 maintenance — the reference's
  * drain-now-resume-later load (pipeline/LoadBookingFact.json:5-38)
  * composed with the merge-on-read SCD2 fold: each op-tagged
  * micro-batch closes the re-valued/deleted keys' open versions (keyed
  * MoR update — bloom-pruned locate, no closed-history rewrite) and
  * appends the fresh open versions. The dimension-history analog of
  * [[StreamMoR]]: per-batch cost O(batch + matched files) at any
  * history size.
  *
  * Batch contract: the repo-wide CDC shape (unique per key, I/U/D
  * ops — checked inside the fold) PLUS one effective timestamp per
  * micro-batch (checked here, loud): SCD2 validity boundaries are
  * batch-level effective dates (the reference's sequential per-file
  * loop gives exactly that — one file, one load date), and a mixed-ts
  * batch has no single boundary to cut versions at. Feeds with
  * per-row timestamps fold to latest-per-key per effective date
  * upstream, or run through the one-shot [[graft.ops.Scd2.history]]
  * backfill instead.
  *
  * Replay safety needs NO fence: [[Scd2.foldBatchMoR]] routes every
  * step on the CURRENT visible state (a replayed close finds its
  * versions closed, a replayed open is suppressed by the no-change
  * rule), so foreachBatch redelivery converges structurally — the
  * spec replays a batch and diffs the full history. The one crash
  * window (a crash INSIDE the keyed close can lose a closing
  * interval row while the current state still converges) is
  * documented on [[Scd2.foldBatchMoR]].
  */
object StreamScd2 {

  /** Apply one op-tagged micro-batch. `tsCol` must be STRING-typed
    * (the effective-date convention of the whole SCD2 family — its
    * value becomes `valid_from`/`valid_to` verbatim; a timestamp
    * column's `toString` rendering would leak engine formatting into
    * the history). Exposed for direct spec-level replay testing. */
  def applyBatch(spark: SparkSession, histDir: String, batch: DataFrame,
                 keyCol: String, attrCols: Seq[String],
                 tsCol: String, opCol: String): Unit = {
    val tss = batch.select(col(tsCol)).distinct().limit(2).collect()
    if (tss.isEmpty) return // empty batch
    require(tss.length == 1 && tss.head.get(0) != null,
      s"StreamScd2: a micro-batch must carry exactly one non-null " +
        s"$tsCol effective timestamp (fold per effective date upstream)")
    Scd2.foldBatchMoR(spark, histDir, batch.drop(tsCol), keyCol,
      attrCols, tss.head.get(0).toString, opCol)
  }

  /** Drain an op-tagged parquet change feed into the SCD2 history:
    * checkpointed, AvailableNow. Read the result through
    * [[graft.sink.DeletionVectors.read]]. */
  def run(spark: SparkSession, feedDir: String, schema: StructType,
          checkpointDir: String, histDir: String,
          keyCol: String, attrCols: Seq[String],
          tsCol: String = "ts_s", opCol: String = "op",
          maxFilesPerTrigger: Int = 1): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, histDir, batch, keyCol, attrCols, tsCol, opCol)
      }
      .start()
    q.awaitTermination()
  }
}
