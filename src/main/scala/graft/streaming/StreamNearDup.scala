package graft.streaming

import graft.dedup.Dedup
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental MinHash-LSH near-duplicate dedup — the
  * continuously-ingesting form of [[Dedup.minhashNearDups]], and the
  * canonical LLM-ingest operator: every arriving document is checked
  * against EVERYTHING seen so far, at per-batch cost proportional to
  * the batch, not the corpus.
  *
  * Per micro-batch: shingle-hash + band only the NEW docs (the fused
  * native kernels), equi-join their band keys against the accumulated
  * band table (seen ∪ this batch), verify candidates with merge-scan
  * Jaccard against the accumulated shingle table, then append this
  * batch's bands/shingles to the state tables. A doc is DROPPED iff it
  * has a near-dup among docs seen before it — "before" meaning earlier
  * batches, or the same batch with a smaller doc id.
  *
  * Drop semantics are deliberately "any earlier near-dup partner,
  * whether or not that partner itself survived": it keeps the decision
  * independent of keep-status (no sequential dependency inside a
  *  batch), which is what makes the operator embarrassingly parallel
  * per batch AND end-state-identical to a pure batch oracle over the
  * whole corpus.
  *
  * Scale story: state is two append-only key-partitioned tables —
  * (band, band_key, doc_id) and (doc_id, shingles) — the same layout a
  * 1000-executor deployment would bucket by band_key/doc_id; each batch
  * shuffles only its own rows plus matched candidates.
  */
object StreamNearDup {

  /** Dump a document set as `nFiles` id-RANGE file groups (ntile over
    * doc_id), so the feed arrives id-monotonically — the property that
    * makes "seen before" ⟺ "smaller doc_id" and the streaming end
    * state equal to the batch oracle. Real ingest feeds (CDC logs,
    * crawl frontiers) have monotone ids/sequence numbers natively; at
    * scale this is a range-partitioned write, not a window. */
  def writeOrderedFeed(docs: DataFrame, dir: String, nFiles: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    docs.select("doc_id", "text", "lang")
      .withColumn("file_id",
        ntile(nFiles).over(Window.orderBy("doc_id")) - 1)
      .repartition(col("file_id"))
      .write.mode("overwrite").partitionBy("file_id").json(dir)
  }

  /** One micro-batch step against (and mutating) the state dirs.
    *
    * Replay safety: every verdict filter is `old_id < new_id` — valid
    * because the feed is id-monotone, and crucially it also fences a
    * REPLAYED batch (whose own rows may already sit in the state from
    * the pre-crash run: equal ids are excluded, so a doc never
    * collides with itself). State/kept writes are per-batch OVERWRITE
    * dirs, so a replay rewrites the same files instead of appending
    * duplicates. */
  def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
                   n: Int = 3, k: Int = 12, bands: Int = 4,
                   tau: Double = 0.8): Unit = {
    val spark = batch.sparkSession
    val rowsPerBand = k / bands
    val sh = Dedup.withHashedShingles(batch, "doc_id", "text", n)
      // empty shingle sets can't near-dup anything and their all-null
      // signatures would all share band key md5('') — see Dedup guard
      .filter(size(col("shingles")) > 0)
      .persist()
    val banded = sh
      .withColumn("sig", GraftFunctions.minhash(spark, col("shingles"), k))
      .select(col("doc_id"), posexplode(
        Dedup.bandKeys("sig", bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
      .persist()

    val seenBands = readOrEmpty(spark, s"$stateDir/bands",
      "band INT, band_key STRING, doc_id BIGINT")
    val seenShingles = readOrEmpty(spark, s"$stateDir/shingles",
      "doc_id BIGINT, shingles ARRAY<BIGINT>")

    // candidates: new docs vs ALL banded docs seen so far (state may
    // already contain this batch after a crash) plus this batch itself;
    // the strict id inequality picks each unordered pair exactly once
    // and self-pairs never
    val earlier = seenBands.unionByName(
      banded.select("band", "band_key", "doc_id")).distinct()
    val cand = banded.select(col("band"), col("band_key"),
        col("doc_id").as("new_id"))
      .join(earlier.select(col("band"), col("band_key"),
        col("doc_id").as("old_id")),
        Seq("band", "band_key"))
      .filter(col("old_id") < col("new_id"))
      .select("new_id", "old_id").distinct()

    val allShingles = seenShingles.unionByName(sh).distinct()
    val dropped = cand
      .join(sh.select(col("doc_id").as("new_id"),
        col("shingles").as("sh_new")), "new_id")
      .join(allShingles.select(col("doc_id").as("old_id"),
        col("shingles").as("sh_old")), "old_id")
      .filter(GraftFunctions.jaccardSorted(spark,
        col("sh_new"), col("sh_old")) >= tau)
      .select(col("new_id").as("doc_id")).distinct()

    batch.select("doc_id", "lang")
      .join(dropped, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$stateDir/kept/batch_$batchId")
    banded.select("band", "band_key", "doc_id")
      .write.mode("overwrite").parquet(s"$stateDir/bands/batch_$batchId")
    sh.write.mode("overwrite").parquet(s"$stateDir/shingles/batch_$batchId")
    sh.unpersist(); banded.unpersist()
  }

  private[streaming] def readOrEmpty(spark: SparkSession, dir: String,
                                     ddl: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.option("recursiveFileLookup", "true").parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
  }

  /** Drain a document feed with incremental near-dup dedup; returns
    * the kept set. */
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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, stateDir)
      }
      .start()
    q.awaitTermination()
    readOrEmpty(spark, s"$stateDir/kept", "doc_id BIGINT, lang STRING")
  }
}
