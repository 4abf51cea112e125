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
}
