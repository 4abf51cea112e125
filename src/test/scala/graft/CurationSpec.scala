package graft

import graft.dedup.Dedup
import graft.sampling.Sampling
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the corpus-curation operators (vocab building, quality
  * gates, chunking, decontamination, deterministic sampling) — the
  * properties the row-hash oracle can't see: plan shape, determinism
  * under re-partitioning, and boundary behavior. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat", "en", "web"),
    (2L, "the cat sat on the hat", "en", "web"),
    (3L, "a b a b a b a b a b a b", "en", "wiki"),   // repetitive
    (4L, "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx yyyy", "en", "wiki"), // long words, short
  ).toDF("doc_id", "text", "lang", "source")

  test("vocabTopK counts document frequency (not term frequency), deterministic cut") {
    val top = TextOps.vocabTopK(docs, n = 2, k = 3)
      .as[(String, Long)].collect()
    // 'the cat'/'cat sat'/'sat on' appear once per doc in docs 1-2 = df 2;
    // 'a b'/'b a' have df 1 despite appearing 6/5 times in doc 3
    assert(top.forall(_._2 == 2))
    assert(top.map(_._1).sorted.toSeq == Seq("cat sat", "on the", "sat on"))
  }

  test("vocabTopK plans as TakeOrderedAndProject, not a global sort") {
    val plan = TextOps.vocabTopK(docs, 2, 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"want top-k pushdown:\n$plan")
  }

  test("gopherQuality gates: repetitive and degenerate docs fail, normal pass") {
    val r = TextOps.gopherQuality(docs).select("doc_id", "keep")
      .as[(Long, Boolean)].collect().toMap
    assert(r(1L) && r(2L))
    assert(!r(3L), "high-repetition doc must fail ok_repetition")
    assert(!r(4L), "degenerate doc must fail")
  }

  test("chunkTokens covers every token exactly once, ragged tail") {
    val ch = TextOps.chunkTokens(docs.filter($"doc_id" === 3), size = 5)
    val rows = ch.orderBy("chunk_no")
      .select("chunk_no", "n_tokens", "first_token")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows == Seq((0L, 5L, "a"), (1L, 5L, "b"), (2L, 2L, "a")))
  }

  test("decontaminate flags only docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "the cat sat on a rug", "en", "eval"))
      .toDF("doc_id", "text", "lang", "source")
    val flagged = Dedup.decontaminate(docs, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    // docs 1-2 share 'the cat sat'/'cat sat on'; docs 3-4 share nothing
    assert(flagged.keySet == Set(1L, 2L))
    assert(flagged(1L) == 2L)
    val plan = Dedup.decontaminate(docs, bench, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$plan")
  }

  test("hash split is deterministic, partition-independent, and honors bounds") {
    val a = Sampling.withSplit(docs, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Sampling.withSplit(docs.repartition(7), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "split must not depend on partitioning")
    // growing the corpus never reassigns an existing row
    val grown = docs.unionByName(Seq((99L, "zzz", "en", "web"))
      .toDF("doc_id", "text", "lang", "source"))
    val c = Sampling.withSplit(grown, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a.forall { case (k, v) => c(k) == v })
  }

  test("mixtureSample keeps everything at weight 1000 and nothing at 0") {
    val kept = Sampling.mixtureSample(docs, "doc_id", "source",
      Map("web" -> 1000)).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L)) // all web docs, no wiki (unlisted -> 0)
  }

  test("leakageSafeSplit keeps every near-dup cluster inside one split") {
    // many near-dup pairs (shared shingles) plus singletons
    val corpus = (0 until 60).flatMap { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel $i"
      Seq((i * 10L, base, "en", "web"),
        (i * 10L + 1, base + " india", "en", "web")) // near-dup of base
    }.toDF("doc_id", "text", "lang", "source")
    val split = Sampling.leakageSafeSplit(corpus, "doc_id", "text")
      .as[(Long, Long, String)].collect()
    // invariant: one split per canonical id
    val byCluster = split.groupBy(_._2).map { case (_, g) => g.map(_._3).toSet }
    assert(byCluster.forall(_.size == 1),
      "a near-dup cluster straddled a split boundary")
    // the pairs really did cluster (otherwise the test is vacuous)
    assert(split.groupBy(_._2).exists(_._2.length >= 2))
    // every doc is assigned exactly once
    assert(split.length == 120 && split.map(_._1).distinct.length == 120)
    // singletons follow the plain withSplit rule
    val singles = Seq((777L, "totally unique text with no shingle overlap at all whatsoever", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val lone = Sampling.leakageSafeSplit(corpus.unionByName(singles), "doc_id", "text")
      .filter($"doc_id" === 777L).as[(Long, Long, String)].head()
    val plain = Sampling.withSplit(singles, "doc_id")
      .select("doc_id", "split").as[(Long, String)].head()
    assert(lone._2 == 777L && lone._3 == plain._2)
  }

  test("leakageSafeSplit with a precomputed cluster map assigns identically") {
    val corpus = (0 until 40).flatMap { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel $i"
      Seq((i * 10L, base, "en", "web"),
        (i * 10L + 1, base + " india", "en", "web"))
    }.toDF("doc_id", "text", "lang", "source")
    // the production path: the dedup pass's stored map handed in —
    // no LSH/CC recompute inside the split
    val stored = graft.dedup.Dedup.dedupGroups(corpus, "doc_id", "text")
      .select("doc_id", "canonical_id")
    val viaMap = Sampling.leakageSafeSplit(corpus, "doc_id", "text",
        clusterMap = Some(stored))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val inline = Sampling.leakageSafeSplit(corpus, "doc_id", "text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(viaMap == inline,
      "stored-map split must equal the inline-recompute split")
  }
}
