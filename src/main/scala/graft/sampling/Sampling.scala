package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data assembly.
  *
  * Everything keys off a 60-bit md5 bucket of a STABLE id — never
  * `rand()` — so splits are reproducible across runs, engines, and
  * cluster layouts, a row's assignment never changes when the corpus
  * grows, and the operators are pure narrow projections (no shuffle,
  * no state) that scale to any corpus size.
  */
object Sampling {

  /** Uniform bucket in [0, mod) from the md5 of a key column. */
  def hashBucket(key: Column, mod: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") % mod

  /** Train/val/test assignment by hash bucket: [0,trainPct) → train,
    * [trainPct, trainPct+valPct) → val, rest → test. */
  def withSplit(docs: DataFrame, idCol: String,
                trainPct: Int = 90, valPct: Int = 5): DataFrame =
    docs.withColumn("bucket", hashBucket(col(idCol), 100))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))

  /** Weighted source mixture: keep a row iff its hash bucket falls
    * under the source's per-mille weight (default keeps nothing for
    * unlisted sources). The keep decision is per-row and independent —
    * the 100 TB form of "sample 30% of crawl, 100% of wiki". */
  def mixtureSample(docs: DataFrame, idCol: String, sourceCol: String,
                    weightsPerMille: Map[String, Int]): DataFrame = {
    val w = weightsPerMille.foldLeft(lit(0)) { case (acc, (src, wt)) =>
      when(col(sourceCol) === src, lit(wt)).otherwise(acc)
    }
    docs.withColumn("bucket", hashBucket(col(idCol), 1000))
      .filter(col("bucket") < w)
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw doc
    * by how target-like its hashed-unigram distribution is. Features
    * are `nBuckets` hash buckets of the tokens; the per-doc log
    * importance weight is Σ_tokens [ln p̂_target(b) − ln p̂_raw(b)]
    * with add-1-smoothed bucket unigram models. Sampling ∝ exp(weight)
    * then selects the target-like slice of a 100 TB crawl.
    *
    * Scale: the two bucket models are tiny (`nBuckets` rows) map-side-
    * combined aggregates; scoring is a broadcast join of the bucket
    * table onto the token stream plus one per-doc reduce — no shuffle
    * of the corpus beyond the doc-key aggregate.
    *
    * Determinism: token-bucket log-ratios are quantized to 1e-9 before
    * the per-doc sum (floor(x·1e9 + 0.5) as BIGINT — the [[graft.text.TextOps.unigramXent]]
    * recipe), so the sum is order-independent and any md5-bearing
    * engine reproduces it bit-for-bit. Output (id, n_tokens, logw5):
    * the PER-TOKEN average log ratio at 5 dp (per-token so doc length
    * doesn't dwarf the signal). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, nBuckets: Int = 256): DataFrame = {
    val scale = 1e9
    val toks = docs.select(col(idCol), targetPred.as("is_target"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("bucket", hashBucket(col("tok"), nBuckets))
    val byBucket = toks.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val totals = byBucket.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    // smoothed models; each division is one IEEE op on exactly-
    // representable integer-valued doubles — identical in any engine
    val stats = byBucket.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor((log((col("ct").cast("double") + lit(1.0))
            / (col("nt").cast("double") + lit(nBuckets.toDouble)))
          - log((col("cr").cast("double") + lit(1.0))
            / (col("nr").cast("double") + lit(nBuckets.toDouble))))
          * lit(scale) + lit(0.5)).cast("long").as("qlr"))
    toks.join(broadcast(stats), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum("qlr").cast("double") / lit(scale)).as("slr"))
      .select(col(idCol), col("n_tokens"),
        graft.Oracle.stableRound(col("slr") / col("n_tokens"), 5).as("logw5"))
  }

  /** Per-domain quota (the FineWeb-style cap): keep at most `cap` docs
    * per domain, best-first by (`scoreCol` DESC, id ASC). Rank-over-
    * window with Spark's WindowGroupLimit pushdown — each map task
    * keeps only `cap` rows per domain before the shuffle, so a domain
    * with 10M pages ships ~cap·partitions rows, not 10M. The canonical
    * guard against a single crawl domain dominating a training mix. */
  def domainCap(docs: DataFrame, idCol: String, domainCol: String,
                scoreCol: String, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    docs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= cap)
  }
}
