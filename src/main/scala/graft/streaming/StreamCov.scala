package graft.streaming

import graft.sink.AtomicParquetSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming covariance / moment maintenance — the streaming face of
  * `graft_embed_cov` (q218) and the fit-side of an always-fresh PCA:
  * each micro-batch folds its vectors into ONE raw moment buffer
  * (`graft_embed_mom`: n, Σx, upper-triangle Σx·x — O(d²) doubles),
  * which merges into the stored state by elementwise SUM. State is
  * d²-sized FOREVER regardless of stream length; after any number of
  * batches the derived covariance equals the one-pass q218 kernel
  * over the same corpus (merge-then-derive ≡ derive-of-union — sums
  * are associative; the shared oracle checks the 5-dp-rounded
  * values).
  *
  * Unlike the max-merging [[StreamHll]], SUM-merge is NOT
  * replay-idempotent, so the state carries a BATCH FENCE: the last
  * applied batch id rides INSIDE the same atomically-swapped state
  * frame (kind='B' row), so a foreachBatch redelivery after a crash
  * sees fence ≥ id and skips — state and fence can never disagree.
  */
object StreamCov {

  /** State rows: kind 'N' (count, i=j=-1), 'S' (per-dim sum, j=-1),
    * 'P' (pair product sum), 'B' (batch fence, v = last applied id). */
  private val stateCols = Seq("kind", "i", "j", "v")

  /** One micro-batch fold: moments of `batch` summed into the state
    * under the batch fence. Exposed for direct replay testing. */
  def applyBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
                 vecCol: String, batchId: Long): Unit = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val prev = AtomicParquetSink.read(spark, stateDir)
    val fence = prev.map(_.filter(col("kind") === "B")
      .agg(max(col("v"))).head().getDouble(0)).getOrElse(-1.0)
    if (batchId.toDouble <= fence) return // redelivery — already applied
    // an empty batch contributes no moments (the aggregate evals to
    // NULL on zero rows) but must still advance the fence
    val m = batch.select(expr(s"graft_embed_mom($vecCol)").as("m"))
      .filter(col("m").isNotNull)
    val nRow = m.select(lit("N").as("kind"), lit(-1).as("i"),
      lit(-1).as("j"), col("m.n").cast("double").as("v"))
    val sRows = m.select(posexplode(col("m.sum")).as(Seq("i", "v")))
      .select(lit("S").as("kind"), col("i"), lit(-1).as("j"), col("v"))
    val pRows = m.select(explode(col("m.prod")).as("p"))
      .select(lit("P").as("kind"), col("p.i").as("i"),
        col("p.j").as("j"), col("p.v").as("v"))
    val batchRows = nRow.unionByName(sRows).unionByName(pRows)
    val merged = prev match {
      case Some(st) => st.filter(col("kind") =!= "B")
        .unionByName(batchRows)
        .groupBy("kind", "i", "j").agg(sum("v").as("v"))
      case None => batchRows
    }
    AtomicParquetSink.overwrite(
      merged.unionByName(spark.range(1).select(lit("B").as("kind"),
        lit(-1).as("i"), lit(-1).as("j"),
        lit(batchId.toDouble).as("v"))).select(stateCols.map(col): _*),
      stateDir)
  }

  /** Drain a parquet vector feed, then derive (di, dj, cov5) from the
    * final state — the exact q218 output shape. */
  def run(spark: SparkSession, feedDir: String, schema: StructType,
          checkpointDir: String, stateDir: String, vecCol: String,
          maxFilesPerTrigger: Int = 2): DataFrame = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, stateDir, batch, vecCol, id)
      }
      .start()
    q.awaitTermination()
    derive(spark, stateDir)
  }

  /** Covariance from the moment state: cov(i,j) = Σxy/n − μ_i·μ_j.
    * The per-dim sums are d doubles — they ride as a broadcast join
    * onto the d²/2 pair rows. */
  def derive(spark: SparkSession, stateDir: String): DataFrame = {
    val st = AtomicParquetSink.read(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no moment state at $stateDir"))
    val n = st.filter(col("kind") === "N").agg(sum("v")).head().getDouble(0)
    val mu = st.filter(col("kind") === "S")
      .select(col("i"), (col("v") / lit(n)).as("mu"))
    st.filter(col("kind") === "P")
      .join(broadcast(mu.select(col("i"), col("mu").as("mu_i"))), "i")
      .join(broadcast(mu.select(col("i").as("j"), col("mu").as("mu_j"))),
        "j")
      .select(col("i").as("di"), col("j").as("dj"),
        graft.Oracle.stableRound(
          col("v") / lit(n) - col("mu_i") * col("mu_j"), 5).as("cov5"))
  }
}
