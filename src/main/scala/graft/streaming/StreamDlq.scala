package graft.streaming

import graft.sink.AtomicParquetSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** LATE-DATA DEAD-LETTER routing — the piece of watermarking
  * Structured Streaming does silently: rows older than the watermark
  * don't just vanish, they land in a quarantine table a human can
  * audit and replay. Each micro-batch routes against the watermark of
  * the PRIOR batches (max event time seen so far, minus the horizon):
  * on-time rows append to the main sink, late rows to the dead-letter
  * sink, then the watermark advances — Spark's own
  * `withWatermark`-drop semantics, made observable.
  *
  * Exactly-once without a transactional sink: each batch writes its
  * main/dlq slices to DETERMINISTIC per-batch subdirs with overwrite
  * (a replayed batch rewrites the same bytes), and the watermark+fence
  * state swaps atomically ([[StreamCov]]'s in-state fence), so a crash
  * between the data write and the state swap retries into the same
  * subdirs. State is two longs FOREVER. */
object StreamDlq {

  /** One micro-batch route under the fence. Exposed for replay
    * testing. */
  def applyBatch(spark: SparkSession, stateDir: String, mainDir: String,
                 dlqDir: String, batch: DataFrame, tsCol: String,
                 horizonMs: Long, batchId: Long): Unit = {
    val prev = AtomicParquetSink.read(spark, stateDir)
    def stVal(kind: String): Option[Long] = prev.flatMap { st =>
      val r = st.filter(col("kind") === kind).agg(max(col("v"))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    val fence = stVal("B").getOrElse(-1L)
    if (batchId <= fence) return // redelivery — already routed
    // a W row exists only once real event time was observed; the
    // MinValue filter also heals state dirs a pre-fix writer left
    // behind (review-caught: an empty/all-null FIRST batch used to
    // persist Long.MinValue, and `w - horizon` then underflowed to a
    // huge positive threshold that dead-lettered every later row)
    val wmPrev = stVal("W").filter(_ != Long.MinValue)
    val tsMicros = unix_micros(col(tsCol))
    val late = wmPrev match {
      case None => lit(false)
      case Some(w) => tsMicros < lit(w - horizonMs * 1000L)
    }
    val tagged = batch.withColumn("_late", late).persist()
    try {
      tagged.filter(!col("_late")).drop("_late")
        .write.mode("overwrite").parquet(s"$mainDir/batch=$batchId")
      tagged.filter(col("_late")).drop("_late")
        .write.mode("overwrite").parquet(s"$dlqDir/batch=$batchId")
      val batchMax = tagged.agg(max(tsMicros)).head()
      val batchWm =
        if (batchMax.isNullAt(0)) None else Some(batchMax.getLong(0))
      // no watermark row until SOME event time exists — an empty or
      // all-null-ts first batch must leave later batches un-fenced
      val newWm = (wmPrev.toSeq ++ batchWm.toSeq)
        .reduceOption((a, b) => math.max(a, b))
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      rows.add(org.apache.spark.sql.Row("B", batchId))
      newWm.foreach(w => rows.add(org.apache.spark.sql.Row("W", w)))
      AtomicParquetSink.overwrite(
        spark.createDataFrame(rows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("kind",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.LongType)))),
        stateDir)
    } finally tagged.unpersist()
  }

  /** Drain a parquet feed routing late rows to the dead-letter dir. */
  def run(spark: SparkSession, feedDir: String, schema: StructType,
          checkpointDir: String, stateDir: String, mainDir: String,
          dlqDir: String, tsCol: String, horizonMs: Long,
          maxFilesPerTrigger: Int = 1): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .parquet(feedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, stateDir, mainDir, dlqDir, batch, tsCol,
          horizonMs, id)
      }
      .start()
    q.awaitTermination()
  }

  /** Read a routed side back (empty frame with `schema` when the side
    * never received a row). */
  def readSide(spark: SparkSession, dir: String,
               schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dir)
  }
}
