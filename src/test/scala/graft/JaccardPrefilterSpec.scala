package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JaccardPrefilter optimizer rule: a plain `graft_jaccard >= τ`
  * filter picks up the size-ratio short-circuit automatically, with
  * Spark-identical results (including the NaN-keeps-row edge) and no
  * duplicate injection. */
class JaccardPrefilterSpec extends AnyFunSuite {
  lazy val base = SparkTestSession.spark

  private def withGraftSession[T](body: SparkSession => T): T = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions()(_))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      body(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  /** Parquet-backed pairs: a LocalRelation would be constant-folded by
    * ConvertToLocalRelation and hide the injected filter. */
  private def pairs(s: SparkSession): DataFrame = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jpf-").toString
    Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L)),   // j = 1.0
      (2L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)),           // j = 0.5, ratio-pruned at 0.8
      (3L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 9L)),   // j = 0.6
      (4L, Seq.empty[Long], Seq.empty[Long]),           // j = NaN: Spark KEEPS
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
  }

  test("jaccard >= tau filter gets the size-ratio conjunct injected once") {
    val _ = base
    withGraftSession { s =>
      val q = pairs(s).filter(
        graft.functions.GraftFunctions.jaccardSorted(s, col("a"), col("b"))
          >= lit(0.8))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("least(size("),
        s"prefilter must be injected:\n$optimized")
      // fixed point: exactly one injected conjunct, not one per pass
      assert("least\\(size\\(".r.findAllIn(optimized).length == 1,
        s"prefilter must be injected exactly once:\n$optimized")
      // NaN >= tau is TRUE in Spark (NaN orders above every double):
      // row 4 passes 0 >= 0.8*0 and the NaN jaccard — rule preserves it
      val got = q.select("id").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 4L))
    }
  }

  test("prefilter never drops a row the jaccard filter keeps") {
    val _ = base
    withGraftSession { s =>
      val q = pairs(s).filter(
        graft.functions.GraftFunctions.jaccardSorted(s, col("a"), col("b"))
          >= lit(0.5))
      assert(q.select("id").collect().map(_.getLong(0)).toSet
        == Set(1L, 2L, 3L, 4L))
    }
  }

  test("adversarial τ: boundary pairs the naive bound would over-prune survive") {
    // Property: for τ = m/n (exact jaccard of a ⊂ b with |a| = m,
    // |b| = n), the pair sits EXACTLY on the threshold, so the exact
    // filter keeps it. The naive prefilter `m >= fl(τ·n)` over-prunes
    // whenever fl(fl(m/n)·n) rounds up past m — the 1-ulp slack
    // (τ·(1−1e-9)) must rescue every such case. First find real
    // offenders by exhaustive scan, then prove they survive end-to-end.
    val adversarial = (for {
      n <- 1 to 300
      m <- 1 until n
      tau = m.toDouble / n
      if tau * n > m.toDouble // naive bound would prune this τ-exact pair
    } yield (m, n)).toList
    assert(adversarial.nonEmpty,
      "scan must find genuine over-prune cases or the property is vacuous")
    val cases = adversarial.take(8)
    val _ = base
    withGraftSession { s =>
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-jpf-adv-").toString
      cases.zipWithIndex.map { case ((m, n), i) =>
        (i.toLong, (1L to m.toLong).toSeq, (1L to n.toLong).toSeq)
      }.toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
      val df = s.read.parquet(dir)
      cases.zipWithIndex.foreach { case ((m, n), i) =>
        val tau = m.toDouble / n
        val kept = df.filter(col("id") === i).filter(
          graft.functions.GraftFunctions.jaccardSorted(s, col("a"), col("b"))
            >= lit(tau))
          .count()
        assert(kept == 1L,
          s"pair m=$m n=$n τ=$tau must survive the prefilter (1-ulp slack)")
      }
    }
  }

  test("ngramJaccardPairs gates out the both-empty NaN pair the oracle drops") {
    val _ = base
    withGraftSession { s =>
      import s.implicits._
      // two one-token docs: empty bigram shingle sets, same (lang, 0)
      // block — jaccard would be NaN and Spark's NaN-keeps semantics
      // would diverge from the DuckDB twin's NULL-drop without the gate
      val docs = Seq((1L, "solo", "en"), (2L, "single", "en"))
        .toDF("doc_id", "text", "lang")
      val r = graft.dedup.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", "lang", tau = 0.5)
      assert(r.isEmpty)
    }
  }
}
