package graft.ann

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** PCA / whitening over an embedding column — the classic
  * dimensionality-reduction step of a large-scale embedding pipeline
  * (topic clustering, ANN pre-reduction, whitened-cosine retrieval).
  *
  * Architecture is the only part that matters at 100 TB: the data
  * pass is ONE distributed moment aggregate
  * ([[graft.functions.EmbedCov]] — partial-aggregated, d²/2 doubles
  * per partition over the wire); the eigendecomposition runs on the
  * DRIVER on the d×d covariance (d = embedding dim, 64 here — a
  * microsecond problem, pure cyclic Jacobi, no native libraries);
  * the projection is a broadcast-free literal expression
  * (`zip_with`/`aggregate` over the component rows baked in as
  * literals — whole-stage codegen, no UDF, no shuffle). Fit cost is
  * one scan; transform cost is k·d multiplies per row inside the
  * scan.
  *
  * Deterministic: Jacobi rotations in fixed cyclic order, eigenpairs
  * sorted by (eigenvalue desc, then first-component sign convention:
  * the largest-|component| coordinate is made positive), so repeated
  * fits produce byte-identical models.
  */
object Pca {

  /** Fitted model: population covariance eigensystem of the vector
    * column. `components(c)(i)` = coordinate i of the c-th principal
    * axis; eigenvalues sorted descending. */
  case class Model(n: Long, mean: Array[Double],
                   eigenvalues: Array[Double],
                   components: Array[Array[Double]])

  /** One-pass fit (see class doc for the cost model). */
  def fit(df: DataFrame, vecCol: String): Model = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    val row = df.select(expr(s"graft_embed_cov($vecCol)").as("m"))
      .select(col("m.n"), col("m.mean"), col("m.cov")).head()
    val n = row.getLong(0)
    val mean = row.getSeq[Double](1).toArray
    val d = mean.length
    val a = Array.ofDim[Double](d, d)
    row.getSeq[Row](2).foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val c = r.getDouble(2)
      a(i)(j) = c; a(j)(i) = c
    }
    val (vals, vecs) = jacobiEigen(a)
    Model(n, mean, vals, vecs)
  }

  /** Projection column: center on the model mean, project onto the
    * top-k components; `whiten` divides each coordinate by √λ so the
    * projected covariance is the identity. Pure builtin expressions
    * over literals — codegen'd, no UDF. */
  def projectColumn(model: Model, vecCol: String, k: Int,
                    whiten: Boolean): Column = {
    require(k >= 1 && k <= model.components.length,
      s"k=$k out of range 1..${model.components.length}")
    val meanArr = array(model.mean.map(lit): _*)
    val centered = zip_with(
      transform(col(vecCol), x => x.cast("double")), meanArr,
      (a, b) => a - b)
    val coords = (0 until k).map { c =>
      val comp = array(model.components(c).map(lit): _*)
      val dot = aggregate(zip_with(centered, comp, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
      if (whiten)
        dot / lit(math.sqrt(math.max(model.eigenvalues(c), 1e-12)))
      else dot
    }
    array(coords: _*)
  }

  /** Share of total variance captured by the top-k components. */
  def explainedVariance(model: Model, k: Int): Double = {
    val tot = model.eigenvalues.sum
    if (tot <= 0) 0.0 else model.eigenvalues.take(k).sum / tot
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: sweep
    * all (p,q) pairs in fixed order, rotating each off-diagonal
    * entry to zero, until off-diagonal mass is negligible. O(d³) per
    * sweep, converges in a handful of sweeps — driver-side work on a
    * d×d matrix, deliberately dependency-free (public algorithm,
    * Golub & Van Loan §8.5). Returns (eigenvalues desc, eigenvectors
    * as ROWS aligned with the eigenvalues). */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    def diagMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { s += a(i)(i) * a(i)(i); i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && offMass() > 1e-24 * math.max(diagMass(), 1e-300)) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // rotate rows/cols p and q of a
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            // accumulate the rotation into the eigenvector matrix
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // extract, sort by eigenvalue desc, fix sign deterministically
    val pairs = (0 until d).map { c =>
      val vec = Array.tabulate(d)(i => v(i)(c))
      (a(c)(c), vec)
    }.sortBy(-_._1).toArray
    val vecs = pairs.map { case (_, vec) =>
      var mi = 0
      var i = 1
      while (i < d) {
        if (math.abs(vec(i)) > math.abs(vec(mi))) mi = i
        i += 1
      }
      if (vec(mi) < 0) vec.map(x => -x) else vec
    }
    (pairs.map(_._1), vecs)
  }
}
