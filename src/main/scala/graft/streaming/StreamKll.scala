package graft.streaming

import graft.sink.AtomicParquetSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming quantile maintenance — the streaming face of `graft_kll`
  * (q255): each micro-batch folds its values into one per-group KLL
  * sketch ([[graft.functions.KllSketch]]), which merges into the
  * stored state BYTES-to-BYTES via `graft_kll_merge` — no raw value is
  * ever re-read. State is O(k · log(n/k)) doubles per group FOREVER
  * regardless of stream length; after any number of batches the
  * estimates off the state carry the same rank bound as a one-pass
  * sketch over the whole feed (compaction order shifts WHICH survivor
  * represents a rank band, never the band's width — so unlike
  * [[StreamKmv]]/[[StreamHll]] the fold is rank-equivalent, not
  * bit-identical, and the verifying entry asserts the rank bound
  * against an exact computation rather than bit equality).
  *
  * Sketch-merge is NOT replay-idempotent (a refolded batch
  * double-counts), so the state carries [[StreamCov]]'s batch fence:
  * the last applied id rides inside the same atomically-swapped state
  * frame (kind='B' row) — state and fence can never disagree. */
object StreamKll {

  /** One micro-batch fold under the batch fence. Exposed for direct
    * replay testing. */
  def applyBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
                 grpCol: String, valCol: String, k: Int,
                 batchId: Long): Unit = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val prev = AtomicParquetSink.read(spark, stateDir)
    val fence = prev.map(_.filter(col("kind") === "B")
      .agg(max(col("fence"))).head().getLong(0)).getOrElse(-1L)
    if (batchId <= fence) return // redelivery — already applied
    val bs = batch
      .filter(col(valCol).isNotNull)
      .groupBy(col(grpCol).as("grp"))
      .agg(expr(s"graft_kll($valCol, $k)").as("sk"))
      .select(lit("S").as("kind"), col("grp"), col("sk"),
        lit(-1L).as("fence"))
    val merged = prev match {
      case Some(st) => st.filter(col("kind") === "S")
        .unionByName(bs)
        .groupBy("kind", "grp")
        .agg(expr("graft_kll_merge(sk)").as("sk"))
        .select(col("kind"), col("grp"), col("sk"), lit(-1L).as("fence"))
      case None => bs
    }
    AtomicParquetSink.overwrite(
      merged.unionByName(spark.range(1).select(lit("B").as("kind"),
        lit("").as("grp"), lit(null).cast("binary").as("sk"),
        lit(batchId).as("fence"))),
      stateDir)
  }

  /** Drain a parquet feed folding per-group sketches; return (grp,
    * e50, e90, e99) estimates off the final state bytes. */
  def run(spark: SparkSession, feedDir: String, schema: StructType,
          checkpointDir: String, stateDir: String, grpCol: String,
          valCol: String, k: Int = 256,
          maxFilesPerTrigger: Int = 2): DataFrame = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, stateDir, batch, grpCol, valCol, k, id)
      }
      .start()
    q.awaitTermination()
    estimates(spark, stateDir)
  }

  /** (grp, e50, e90, e99) off the stored state bytes. */
  def estimates(spark: SparkSession, stateDir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val st = AtomicParquetSink.read(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no sketch state at $stateDir"))
    st.filter(col("kind") === "S")
      .select(col("grp"),
        expr("graft_kll_quantile(sk, 0.5d)").as("e50"),
        expr("graft_kll_quantile(sk, 0.9d)").as("e90"),
        expr("graft_kll_quantile(sk, 0.99d)").as("e99"))
  }

  /** Highest applied batch id (−1 = empty state). */
  def fenceOf(spark: SparkSession, stateDir: String): Long =
    AtomicParquetSink.read(spark, stateDir)
      .map(_.filter(col("kind") === "B")
        .agg(max(col("fence"))).head().getLong(0)).getOrElse(-1L)
}
