package graft.streaming

import graft.sink.AtomicParquetSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming Count-Min heavy hitters — the streaming face of the q82
  * CMS: each micro-batch counts its token occurrences into the d×w
  * cell grid, which SUM-merges into the stored state (O(d·w) longs
  * FOREVER, like every sketch fold here). Counter sums are
  * associative, so after any number of batches the grid — and every
  * estimate off it — is BIT-IDENTICAL to the one-pass batch CMS over
  * the same corpus (merge-then-estimate ≡ estimate-of-union, the
  * KMV/HLL property; contrast the rank-equivalent-only KLL fold).
  * SUM-merge is not replay-idempotent, so the state carries
  * [[StreamCov]]'s in-state batch fence. */
object StreamCms {

  private val P = 1073741789L
  private val Half = 1073741824L

  private def bucketSql(depth: Int, width: Int): String = {
    def bucketOf(h: String, x: String) =
      s"((((2654435761 * ($h + 1)) % $P) * ($x div $Half)" +
        s" + ((2246822519 * ($h + 1)) % $P) * ($x % $Half) + $h) % $P)" +
        s" % $width"
    s"transform(sequence(0, ${depth - 1}), h -> ${bucketOf("h", "x")})"
  }
  private val Hash60 =
    "cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"

  /** (h, bucket, c) occurrence-counts of one frame of documents. */
  private def cellsOf(docs: DataFrame, textCol: String, depth: Int,
                      width: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("tok"))
      .select(expr(Hash60).as("x"))
      .select(posexplode(expr(bucketSql(depth, width))))
      .withColumnRenamed("pos", "h").withColumnRenamed("col", "bucket")
      .groupBy("h", "bucket").agg(count(lit(1)).as("c"))

  /** One micro-batch fold under the batch fence. */
  def applyBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
                 textCol: String, depth: Int, width: Int,
                 batchId: Long): Unit = {
    val prev = AtomicParquetSink.read(spark, stateDir)
    val fence = prev.map(_.filter(col("h") === -1)
      .agg(max(col("c"))).head().getLong(0)).getOrElse(-1L)
    if (batchId <= fence) return // redelivery — already counted
    val cells = cellsOf(batch, textCol, depth, width)
    val merged = prev match {
      case Some(st) => st.filter(col("h") >= 0).unionByName(cells)
        .groupBy("h", "bucket").agg(sum("c").as("c"))
      case None => cells
    }
    AtomicParquetSink.overwrite(
      merged.unionByName(spark.range(1).select(lit(-1).as("h"),
        lit(-1L).as("bucket"), lit(batchId).as("c"))),
      stateDir)
  }

  /** Drain the JSON doc feed ([[StreamDedup.writeFeed]]'s layout). */
  def run(spark: SparkSession, feedDir: String, checkpointDir: String,
          stateDir: String, depth: Int = 4, width: Int = 1024,
          maxFilesPerTrigger: Int = 2): Unit = {
    val q = spark.readStream
      .schema(StreamDedup.docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .json(feedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, stateDir, batch, "text", depth, width, id)
      }
      .start()
    q.awaitTermination()
  }

  /** q82's output shape off the DRAINED grid: the exact top-k tokens
    * (verifier side, from the batch corpus) probed against the folded
    * cells — (tok, exact_cnt, cms_est, overcount). */
  def heavyHitters(spark: SparkSession, stateDir: String,
                   docs: DataFrame, textCol: String, depth: Int = 4,
                   width: Int = 1024, k: Int = 20): DataFrame = {
    val cells = AtomicParquetSink.read(spark, stateDir)
      .getOrElse(throw new IllegalStateException(
        s"no CMS state at $stateDir"))
      .filter(col("h") >= 0)
    val toks = docs.select(explode(split(col(textCol), " ")).as("tok"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(k)
      .withColumn("x", expr(Hash60))
    top.select(col("tok"), col("cnt"),
        posexplode(expr(bucketSql(depth, width))))
      .withColumnRenamed("pos", "h").withColumnRenamed("col", "bucket")
      .join(cells, Seq("h", "bucket"))
      .groupBy("tok", "cnt").agg(min("c").as("cms_est"))
      .select(col("tok"), col("cnt").as("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("overcount"))
  }
}
