package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge list — document/node
  * centrality as a curation signal (representative-doc selection,
  * link-spam demotion) computed with the engine's cross-engine
  * determinism discipline.
  *
  * Per iteration: r'(v) = (1−d)/N + d · Σ_{u→v} r(u)/outdeg(u).
  * Dangling mass is not redistributed (documented choice — keeps the
  * per-iteration shape one join + one aggregate).
  *
  * Scale: each iteration is one equi-join of the edge list against the
  * rank vector plus one partial-aggregated groupBy on dst — the same
  * shuffle budget as one round of label propagation, ×ITERS (fixed,
  * small). The edge+degree projection is persisted once and reused by
  * every iteration.
  *
  * Cross-engine determinism: per-edge contributions are quantized to
  * 1e-12-scaled BIGINTs BEFORE the aggregate (floor(x·1e12 + 0.5) —
  * identical IEEE ops on identical doubles), so the per-dst sums are
  * integer-exact and partial-sum-order-independent; the damping
  * arithmetic then runs on identical doubles. An unrolled-CTE SQL twin
  * reproduces every iteration bit-for-bit. */
object PageRank {

  private val Scale = 1e12

  /** edges(srcCol, dstCol) + vertices(idCol) → (id, pagerank) after
    * `iters` damped iterations from the uniform start.
    *
    * Note: dangling-node mass is lost (not redistributed), so Σ rank
    * < 1 whenever the graph has sinks — callers must not assert mass
    * conservation. */
  def run(edges: DataFrame, vertices: DataFrame, srcCol: String,
          dstCol: String, idCol: String, iters: Int = 5,
          damping: Double = 0.85): DataFrame = {
    val v = vertices.select(col(idCol).as("id"))
    val n = v.count()
    require(n > 0, "PageRank needs a non-empty vertex table")
    val deg = edges.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("deg"))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(deg, "src").persist()
    val teleport = (1.0 - damping) / n
    var r = v.select(col("id"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iters) {
      val sums = e.join(r, e("src") === r("id"))
        .select(col("dst").as("id"),
          floor(col("r") / col("deg") * lit(Scale) + lit(0.5))
            .cast("long").as("cq"))
        .groupBy("id").agg(sum("cq").as("scq"))
      r = v.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("scq"), lit(0L)).cast("double") / lit(Scale)))
            .as("r"))
    }
    val result = r.select(col("id"), col("r").as("pagerank")).persist()
    result.count()
    e.unpersist()
    result
  }
}
