package graft

import graft.ann.Pca
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the PCA/whitening family: the Jacobi eigensolver on a
  * known matrix, eigensystem validity on the real covariance, and the
  * whitening invariant (projected covariance = identity) verified by
  * running the SAME distributed moment aggregate over the projected
  * vectors — the oracle the row gate can't express. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jacobiEigen solves a known symmetric system exactly") {
    // [[2,1],[1,2]] has eigenvalues 3 (v=[1,1]/√2) and 1 (v=[1,-1]/√2)
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - r2) < 1e-12 &&
      math.abs(vecs(0)(1) - r2) < 1e-12)
    assert(math.abs(math.abs(vecs(1)(0)) - r2) < 1e-12 &&
      math.abs(vecs(1)(0) + vecs(1)(1)) < 1e-12)
  }

  test("fit: eigensystem reproduces the covariance (A·v = λ·v, trace preserved)") {
    val m = Pca.fit(Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "embedding")
    val d = m.mean.length
    assert(m.eigenvalues.forall(ev => ev > -1e-9), "negative eigenvalue")
    assert((m.eigenvalues, m.eigenvalues.tail).zipped
      .forall((a, b) => a >= b - 1e-12), "eigenvalues not sorted desc")
    // rebuild A from the model and check A·v = λ·v for the top vectors
    val a = Array.ofDim[Double](d, d)
    for (c <- 0 until d; i <- 0 until d; j <- 0 until d)
      a(i)(j) += m.eigenvalues(c) * m.components(c)(i) * m.components(c)(j)
    // A reconstructed from the full eigensystem must satisfy A·v=λ·v
    for (c <- Seq(0, 1, d - 1)) {
      val v = m.components(c)
      val av = Array.tabulate(d)(i =>
        (0 until d).map(j => a(i)(j) * v(j)).sum)
      val resid = math.sqrt((0 until d)
        .map(i => math.pow(av(i) - m.eigenvalues(c) * v(i), 2)).sum)
      assert(resid < 1e-9, s"eigenpair $c residual $resid")
    }
    // orthonormality of the top components
    def dot(x: Array[Double], y: Array[Double]): Double =
      (x, y).zipped.map(_ * _).sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
  }

  test("whitened projection has identity covariance; explained variance is monotone") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = Pca.fit(df, "embedding")
    val k = 8
    val proj = df.select(
      Pca.projectColumn(m, "embedding", k, whiten = true).as("y"))
    // run the SAME moment aggregate over the projected vectors
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cov = proj.select(expr("graft_embed_cov(y)").as("m"))
      .select(explode(col("m.cov")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.cov")).collect()
    assert(cov.length == k * (k + 1) / 2)
    cov.foreach { r =>
      val expected = if (r.getInt(0) == r.getInt(1)) 1.0 else 0.0
      assert(math.abs(r.getDouble(2) - expected) < 1e-6,
        s"whitened cov(${r.getInt(0)},${r.getInt(1)}) = ${r.getDouble(2)}")
    }
    val evs = (1 to 4).map(kk => Pca.explainedVariance(m, kk * 16))
    assert(evs.zip(evs.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(math.abs(Pca.explainedVariance(m, m.mean.length) - 1.0) < 1e-9)
  }
}
