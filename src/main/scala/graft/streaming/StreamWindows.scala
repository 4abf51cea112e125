package graft.streaming

import graft.sink.AtomicParquetSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Tumbling-window aggregation drained through UPDATE mode into a
  * key-merged sink — the streaming twin of the q33 daily rollup that
  * actually REACHES the oracle gate.
  *
  * Why not append mode: over a finite backfill the watermark ends at
  * max(ts) − delay, so the last day's window never finalizes and
  * append emits nothing for it. Update mode emits every changed
  * (day, type) row per micro-batch; the sink replaces those keys
  * atomically (left-anti on the batch's keys ∪ batch), which is
  * idempotent under replay — the end state is the complete aggregate,
  * exactly what a TRUNCATE-free reference refresh (Q4) wants.
  *
  * Deliberately NO watermark. The feed files are key-striped
  * ([[CdcStream.writeChangeLog]] assigns files by event_id), so every
  * file spans the whole time range; with a watermark, as soon as the
  * drain takes ≥3 data micro-batches the watermark advanced by batch 1
  * silently DROPS the older-day rows arriving in batch ≥3 — data loss
  * the merged end state cannot recover from. Update mode does not
  * require a watermark; for this finite drain the aggregation state is
  * bounded by the number of distinct (day, event_type) keys (days ×
  * few types), which is tiny at any data scale — the sink holds the
  * history, the stream holds one row per open key. A long-running
  * production feed that IS time-ordered can re-add a watermark to
  * evict closed windows; a backfill drain must not. */
object StreamWindows {

  def run(spark: SparkSession, feedDir: String, checkpointDir: String,
          stateDir: String, maxFilesPerTrigger: Int = 2): DataFrame = {
    val q = spark.readStream
      .schema(CdcStream.changeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .json(feedDir)
      .withColumn("ts", to_timestamp(col("ts_s")))
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.Oracle.moneySum(col("value")).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("total_value"))
      .writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          b.count()
          val merged = AtomicParquetSink.read(spark, stateDir) match {
            case Some(st) =>
              st.join(b.select("day", "event_type"),
                  Seq("day", "event_type"), "left_anti")
                .unionByName(b)
            case None => b
          }
          AtomicParquetSink.overwrite(merged, stateDir)
        } finally { b.unpersist(); () }
      }
      .start()
    q.awaitTermination()
    AtomicParquetSink.read(spark, stateDir)
      .getOrElse(spark.emptyDataFrame)
  }
}
