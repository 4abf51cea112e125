package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an edge list — the clustering
  * signal used on similarity graphs (a document whose neighbourhood is
  * triangle-dense sits in a tight near-duplicate cluster; one with
  * star-shaped neighbours is a hub). Implements the canonical
  * order-the-vertices algorithm: every triangle {a<b<c} is produced by
  * exactly one wedge join, so no post-hoc division by 3/6.
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * Plan: symmetrize+canonicalize the edge list (u<v, distinct), then
    * wedge join e1(a,b)⋈e2(b,c) on the shared middle vertex and close
    * each wedge against e3(a,c). Both joins are equi-joins on vertex
    * keys — shuffle-partitioned by key, never a cartesian — and the
    * wedge population is Σ_v deg(v)², which bounded-degree graphs
    * (kNN graphs: deg ≤ 2k) keep linear in |V|. The corner explode +
    * groupBy is a partial-aggregated rollup. At 100 TB-scale graphs
    * the one refinement this plan admits is degree-ordered
    * orientation (rank vertices by degree so high-degree hubs never
    * sit at wedge centers); with deg ≤ 2k it is unnecessary.
    *
    * @param edges directed or undirected edge list
    * @param nodes node universe (nodes with no triangles emit 0)
    */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String,
              nodes: DataFrame, idCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val e1 = und.select(col("u").as("a"), col("v").as("b"))
    val e2 = und.select(col("u").as("b"), col("v").as("c"))
    val e3 = und.select(col("u").as("a"), col("v").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
    val corners = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    nodes.select(col(idCol).as("node")).distinct()
      .join(corners, Seq("node"), "left")
      .select(col("node").as(idCol),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
