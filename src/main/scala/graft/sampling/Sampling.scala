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

  /** Leakage-safe train/val/test split: near-dup cluster members can
    * NEVER straddle a split boundary, because assignment hashes the
    * cluster CANONICAL id (from MinHash-LSH pairs → connected
    * components), not the member id — singletons hash their own id,
    * and the default percentages equal [[withSplit]]'s, so singletons
    * keep exactly [[withSplit]]'s assignment. This is the split a
    * real eval needs: hashing member ids leaks train docs'
    * near-duplicates into test and inflates every benchmark score.
    *
    * `clusterMap`: the (doc_id, canonical_id) output of an ALREADY-RUN
    * dedup pass ([[graft.dedup.Dedup.dedupGroups]]) — at 100 TB the
    * corpus dedup stores this map once and every split/decontamination
    * consumer reads it, so pass it here and the split is one keyed
    * join plus a projection. When absent (exploratory runs, tests) the
    * LSH+CC chain is recomputed inline — same assignment either way. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       trainPct: Int = 90, valPct: Int = 5,
                       clusterMap: Option[DataFrame] = None): DataFrame = {
    val canon = clusterMap
      .getOrElse(graft.dedup.Dedup.dedupGroups(docs, idCol, textCol))
      .select(col("doc_id"), col("canonical_id"))
    docs.select(col(idCol).as("doc_id"))
      .join(canon, Seq("doc_id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("doc_id")))
      .withColumn("bucket", hashBucket(col("canonical_id"), 100))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .select("doc_id", "canonical_id", "split")
  }

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

  /** Exact-size stratified sample: exactly `n` rows per stratum (fewer
    * only if the stratum is smaller), chosen uniformly-at-"random" by
    * ranking on the md5 of the id — deterministic, growth-stable
    * within the kept set, engine-reproducible. The eval-set/
    * human-review-batch sampler ("200 docs per language"). Scale: one
    * rank-over-window per stratum with WindowGroupLimit pushdown —
    * map tasks keep n rows per stratum before the shuffle. */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    docs.withColumn("smp_rank", row_number().over(w).cast("long"))
      .filter(col("smp_rank") <= n)
  }

  /** Temperature-flattened mixture design (the multilingual sampling
    * rule of mBERT/XLM-R, Conneau et al. 2020): given per-source doc
    * counts, the target sampling share of source s is
    * q_s = p_s^τ / Σ_t p_t^τ with p_s the corpus share and τ < 1
    * flattening head sources toward the tail. Output per source:
    * n_docs, corpus share p6, target share share6 (τ = 0.5). Feed
    * share6·budget into [[mixtureSample]] rates to realize the design.
    *
    * Determinism: p_s = n_s/N is one exact-input IEEE division;
    * p^0.5 = sqrt (correctly-rounded per IEEE); each sqrt is quantized
    * to a 1e-12-scaled BIGINT before the Σ so the normalizer is
    * order-independent; the final share divides the two exactly-
    * representable quantized values. */
  def temperatureMixture(docs: DataFrame, sourceCol: String): DataFrame = {
    val scale = 1e12
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum("n_docs").as("n_total"))
    val q = counts.crossJoin(broadcast(total))
      .withColumn("p",
        col("n_docs").cast("double") / col("n_total").cast("double"))
      .withColumn("wq",
        floor(sqrt(col("p")) * lit(scale) + lit(0.5)).cast("long"))
    val wsum = q.agg(sum("wq").as("wq_sum"))
    q.crossJoin(broadcast(wsum))
      .select(col(sourceCol), col("n_docs"),
        graft.Oracle.stableRound(col("p"), 6).as("p6"),
        graft.Oracle.stableRound(
          col("wq").cast("double") / col("wq_sum").cast("double"), 6)
          .as("share6"))
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis
    * 2006, public): each row draws the deterministic uniform
    * u = (h+1)/2^60 from the md5 of its id and gets the key
    * ln(u)/w — the top-`n` keys are exactly a w-weighted sample
    * without replacement (u^(1/w) maximization in log space; heavier
    * rows draw keys nearer 0). Deterministic, reproducible, one pass:
    * the top-n cut is orderBy+limit (TakeOrderedAndProject —
    * per-partition heaps, no global sort), rank annotated over just
    * the n survivors. Weights must be > 0. */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val key = log((h.cast("double") + lit(1.0)) / lit(KeySpace))
      .divide(col(weightCol).cast("double"))
    docs.withColumn("skey", key)
      .orderBy(col("skey").desc, col(idCol).asc)
      .limit(n)
      .withColumn("smp_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("skey").desc, col(idCol).asc)).cast("long"))
      .drop("skey")
  }

  /** 2^60 as a double — the md5-head hash space. */
  private val KeySpace: Double = 1152921504606846976.0

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
