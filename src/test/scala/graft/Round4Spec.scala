package graft

import graft.dedup.Dedup
import graft.search.Search
import graft.text.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-4 operators: duplicated-span stats, distributed
  * prefix-sum sequence packing, characteristic-term extraction. Covers
  * what the row oracle can't: the multi-partition offset path, span
  * edge cases, rank invariants. */
class Round4Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- dupSpans ------------------------------------------------------

  test("dupSpans: shared 5-gram counted, unique content zero, short doc zero-span") {
    val d = Seq(
      (1L, "a b c d e f g"),        // spans: abcde bcdef cdefg
      (2L, "a b c d e x y"),        // shares abcde with doc 1
      (3L, "p q r s t u v"),        // all unique
      (4L, "w x"),                  // < 5 tokens: zero spans
    ).toDF("doc_id", "text")
    val r = Dedup.dupSpans(d, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((3L, 1L, 0.33333)))
    assert(r(2L) == ((3L, 1L, 0.33333)))
    assert(r(3L) == ((3L, 0L, 0.0)))
    assert(r(4L) == ((0L, 0L, 0.0)))
  }

  // ---- sequence packing ---------------------------------------------

  test("packing prefix sum across forced multi-partition layout equals single-window truth") {
    val docs = (1L to 200L).map(i => (i, 1L + i % 7)).toDF("doc_id", "n_tokens")
    // force MANY range partitions so cross-partition offsets are real
    val got = Packing.withBins(docs, "doc_id", "n_tokens", budget = 50L,
        partitions = 8)
      .select("doc_id", "start", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("start", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("bin", expr("start div 50"))
      .select("doc_id", "start", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.sameElements(want))
  }

  test("packBins: bins partition the corpus and every doc lands in exactly one bin") {
    val docs = (1L to 100L).map(i => (i, 10L)).toDF("doc_id", "n_tokens")
    val bins = Packing.packBins(docs, "doc_id", "n_tokens", budget = 64L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(bins.map(_._2).sum == 100L)   // n_docs totals the corpus
    assert(bins.map(_._3).sum == 1000L)  // token mass conserved
    // 10-token docs on a 64 budget: starts 0,10,... full bins hold 6 or
    // 7 docs; only the final (partial) bin may hold fewer
    assert(bins.dropRight(1).forall(b => b._2 == 6L || b._2 == 7L))
  }

  // ---- bloom probe / decontamination --------------------------------

  test("bloomProbe: no false negatives; probe filters inside the scan") {
    import graft.functions.{BloomProbe, GraftFunctions}
    import org.apache.spark.util.sketch.BloomFilter
    val f = BloomFilter.create(100, 0.01)
    (1L to 50L).foreach(f.putLong)
    val bytes = BloomProbe.serialize(f)
    val hits = (1L to 1000L).toDF("k")
      .filter(GraftFunctions.bloomProbe(spark, $"k", bytes))
      .as[Long].collect().toSet
    assert((1L to 50L).forall(hits)) // every inserted key survives
    assert(hits.size < 200)          // fpp keeps the rest mostly out
  }

  test("decontaminateBloom equals exact decontaminate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 2)
      .as[(Long, Long)].collect().sorted
    val bloom = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text", n = 2)
      .as[(Long, Long)].collect().sorted
    assert(bloom.sameElements(exact))
  }

  // ---- semantic dedup groups ----------------------------------------

  test("semanticDedupGroups: identical vectors cluster under min id, singletons self-label") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.2f, 3.0f, 0.1f, 2.0f, 0.5f, 1.5f, 0.3f)),
      (2L, Array(1.0f, 0.2f, 3.0f, 0.1f, 2.0f, 0.5f, 1.5f, 0.3f)), // = vec 1
      (3L, Array(-1.0f, 5.0f, -2.0f, 4.0f, -3.0f, 6.0f, -1.5f, 2.0f)),
    ).toDF("vec_id", "embedding")
    val r = graft.ann.Ann.semanticDedupGroups(vecs, "vec_id", "embedding",
        nBits = 4, tau = 0.3)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((1L, 2L)) && r(2L) == ((1L, 2L)))
    // vec 3 pairs with nobody: components only cover edge-touched
    // vertices, so it simply doesn't appear (downstream keeps it as-is)
    assert(!r.contains(3L))
  }

  // ---- quality model -------------------------------------------------

  test("qualityModel: keep gate flips exactly at z >= 0") {
    val d = Seq(
      (1L, "en", Seq.fill(200)("the").mkString(" ")), // long, no diversity
      (2L, "en", "tiny text"),
    ).toDF("doc_id", "lang", "text")
    val r = graft.text.TextOps.qualityModel(d)
      .as[(Long, String, Double, Double, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    // doc 1: lenAdq=1, ttr=1/200, stopSc=1 -> z = -3+2+0.0125+1.5 = 0.5125
    assert(r(1L)._5 && math.abs(r(1L)._3 - 0.5125) < 1e-9)
    assert(r(1L)._4 > 0.5 && r(1L)._4 < 1.0)
    // doc 2: lenAdq=2/128, ttr=1, stopSc=0 -> z = -3+0.03125+2.5 = -0.46875
    assert(!r(2L)._5 && math.abs(r(2L)._3 - (-0.46875)) < 1e-9)
  }

  // ---- watermark-bounded streaming dedup ----------------------------

  test("runBounded: in-horizon duplicates dropped across micro-batches; end state = batch dedup") {
    val work = java.nio.file.Files.createTempDirectory("graft-wmdedup-").toString
    val feed = Seq(
      (1L, "alpha beta", "en"), (2L, "alpha beta", "en"),   // dup pair
      (3L, "gamma delta", "en"), (4L, "gamma delta", "en"), // dup pair
      (5L, "unique text", "en"),
    ).toDF("doc_id", "text", "lang")
      // all inside one watermark horizon; 4 file groups => multi-batch
      .withColumn("event_ts",
        timestamp_seconds(unix_timestamp(
          to_timestamp(lit("2026-01-01 00:00:00"))) + $"doc_id"))
      .withColumn("file_id", pmod($"doc_id", lit(4)))
    feed.repartition($"file_id").write.mode("overwrite")
      .partitionBy("file_id").json(s"$work/feed")
    val got = graft.streaming.StreamDedup.runBounded(spark, s"$work/feed",
        s"$work/ckpt", s"$work/out", delay = "10 minutes")
      .select("text_md5").as[String].collect().sorted
    val want = feed.select(md5($"text")).distinct()
      .as[String].collect().sorted
    assert(got.sameElements(want))
  }

  // ---- tfidf top terms ----------------------------------------------

  test("tfidfTopTerms: rank is (tf desc, df asc, term asc) and scores match ln") {
    val d = Seq(
      (1L, "x x x common rare"),
      (2L, "common common y y y"),
      (3L, "common z z"),
    ).toDF("doc_id", "text")
    val r = Search.tfidfTopTerms(d, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._5) -> t).toMap
    // doc 1: x (tf 3) first; then rare/common tie at tf 1 -> df breaks it
    assert(r((1L, 1L))._2 == "x")
    assert(r((1L, 2L))._2 == "rare") // df(rare)=1 < df(common)=3
    val (_, _, tf, df, _, tfidf) = r((1L, 1L))
    assert(math.abs(tfidf - BigDecimal(tf * math.log(3.0 / df))
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  // ---- connected components: contraction vs propagation --------------

  test("CC in-place pre-contraction round (wide scans) preserves components") {
    // > 32 partitions + a zero guard forces: in-place forest round →
    // fan-in rounds → propagation fallback on the contracted stars
    val edges = ((0L until 80L).map(i => (i, i + 1))
      ++ Seq((200L, 201L), (201L, 202L)))
      .toDF("a", "b").repartition(40)
    val got = Dedup.connectedComponents(edges, "a", "b",
        maxIter = 50, maxLocalEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert((0L to 80L).forall(got(_) == 0L))
    assert(Seq(200L, 201L, 202L).forall(got(_) == 200L))
  }

  test("CC contraction path and propagation fallback agree on a long chain") {
    // diameter 120 — lethal for plain min-label propagation, trivial
    // for contraction; maxLocalEdges = 0 forces the fallback loop
    val edges = (0L until 120L).map(i => (i, i + 1)).toDF("a", "b")
    val contracted = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val propagated = Dedup.connectedComponents(edges, "a", "b",
        maxIter = 50, maxLocalEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(contracted.size == 121 && contracted.values.forall(_ == 0L))
    assert(propagated == contracted)
  }

  // ---- knnGraph ------------------------------------------------------

  test("knnGraph: neighbors stay in-bucket, ranks ordered by cosine desc") {
    val vecs = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j =>
        (math.sin(i * 7 + j) * 10).toFloat))
    }.toDF("vec_id", "embedding")
    val g = graft.ann.Ann.knnGraph(vecs, "vec_id", "embedding",
        nBits = 2, k = 3)
      .as[(Long, Long, Long, Double)].collect()
    val buckets = vecs.select(col("vec_id"),
        graft.ann.Ann.signBucket("embedding", 2).as("bk"))
      .as[(Long, Int)].collect().toMap
    assert(g.nonEmpty)
    // every edge joins same-bucket vectors, never self
    assert(g.forall { case (v, _, nb, _) =>
      v != nb && buckets(v) == buckets(nb) })
    // ranks per vector are 1..m and cosine is non-increasing in rank
    g.groupBy(_._1).values.foreach { edges =>
      val sorted = edges.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._4 >= y._4; case _ => true })
      assert(sorted.length <= 3)
    }
  }

  // ---- incremental dedup --------------------------------------------

  test("incrementalNearDups: copies rejected, fresh and short docs admitted") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different corpus content about spark engines here"),
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // copy of 1
      (11L, "entirely novel arrival that matches nothing at all yes"),
      (12L, "wx yz"),                                             // < 3 tokens
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalNearDups(fresh, corpus, "doc_id", "text",
        tau = 0.8)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(10L) == ((1L, 1.0, false)))
    assert(r(11L) == ((0L, 0.0, true)))
    assert(r(12L) == ((0L, 0.0, true)))   // no shingles, still in output
  }

  // ---- zipf fit ------------------------------------------------------

  test("zipfFit recovers slope -1 exactly on a freq = c/rank corpus") {
    // freqs 6, 3, 2 at ranks 1, 2, 3: ln f = ln 6 - ln rank — an exact
    // power law, so least squares must return slope -1, intercept ln 6
    val docs = Seq((1L, "a a a a a a b b b c c")).toDF("doc_id", "text")
    val r = graft.text.TextOps.zipfFit(docs, "text", topR = 500)
      .as[(Long, Double, Double)].head()
    assert(r == ((3L, -1.0, 1.79176)))
  }

  test("zipfFit topR bounds the ranks entering the fit") {
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val r = graft.text.TextOps.zipfFit(docs, "text", topR = 2)
      .as[(Long, Double, Double)].head()
    assert(r._1 == 2L)
  }

  // ---- repetition signals -------------------------------------------

  test("repetitionSignals: unigram share, bigram share, duplicated trigrams") {
    val docs = Seq(
      (1L, "x x x y"),                 // top uni 3/4, top bi 2/3, no tri dup
      (2L, "a b c a b c a b"),         // every trigram duplicated
      (3L, "p q r s t u v w"),         // no repetition anywhere
    ).toDF("doc_id", "text")
    val r = graft.text.TextOps.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Double, Double, Double, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((0.75, 0.66667, 0.0, true)))
    assert(r(2L) == ((0.375, 0.42857, 1.0, true)))
    assert(r(3L) == ((0.125, 0.14286, 0.0, true)))
  }

  test("repetitionSignals: short docs keep zero bigram/trigram shares") {
    val docs = Seq((9L, "solo")).toDF("doc_id", "text")
    val r = graft.text.TextOps.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Double, Double, Double, Boolean)].head()
    assert(r == ((9L, 1.0, 0.0, 0.0, true)))
  }

  // ---- count-min sketch ---------------------------------------------

  test("cmsHeavyHitters: estimates are exact without collisions, never undercount") {
    val docs = Seq((1L, "a a a a b b b c c d")).toDF("doc_id", "text")
    val r = graft.text.TextOps.cmsHeavyHitters(docs, "text", k = 4)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // 4 tokens into 4×1024 cells: no collisions, sketch is exact
    assert(r("a") == ((4L, 4L, 0L)))
    assert(r("b") == ((3L, 3L, 0L)))
    assert(r("c") == ((2L, 2L, 0L)))
    assert(r("d") == ((1L, 1L, 0L)))
  }

  test("cmsHeavyHitters one-sided error under a tiny width (forced collisions)") {
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text + " hot hot hot")).toDF("doc_id", "text")
    val r = graft.text.TextOps.cmsHeavyHitters(docs, "text",
        depth = 2, width = 4, k = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall(_._4 >= 0L))            // overcount is never negative
    val hot = r.find(_._1 == "hot").get
    assert(hot._2 == 3L && hot._3 >= 3L)
  }

  // ---- gap-filled resample ------------------------------------------

  test("resampleDaily-style spine fills gaps with zeros") {
    // use the operator's own building blocks on a hand-made frame
    val e = Seq((1L, 10L, 5.0), (1L, 13L, 2.5), (2L, 11L, 1.0))
      .toDF("user_id", "day", "value")
    val agg = e.groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
    val spine = e.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
    val r = spine.join(agg, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n_events", lit(0L)).as("n"),
        coalesce($"sum_value", lit(0.0)).as("v"))
      .as[(Long, Long, Long, Double)].collect().sortBy(t => (t._1, t._2))
    assert(r.toSeq == Seq(
      (1L, 10L, 1L, 5.0), (1L, 11L, 0L, 0.0), (1L, 12L, 0L, 0.0),
      (1L, 13L, 1L, 2.5), (2L, 11L, 1L, 1.0)))
  }

  // ---- MAD outliers --------------------------------------------------

  test("madOutliers: MAD gate is immune to the outlier it flags") {
    val docs = Seq(
      (1L, "en", 10L), (2L, "en", 10L), (3L, "en", 10L),
      (4L, "en", 10L), (5L, "en", 100L),   // med 10, MAD 0 → 100 flagged
      (6L, "fr", 5L), (7L, "fr", 7L),      // med 6, MAD 1 → none flagged
    ).toDF("doc_id", "lang", "n_chars")
    val r = graft.text.TextOps.madOutliers(docs)
      .as[(Long, String, Long, Double, Double, Boolean)].collect()
      .map(t => t._1 -> ((t._4, t._5, t._6))).toMap
    assert(r(5L) == ((10.0, 0.0, true)))
    assert(r(1L) == ((10.0, 0.0, false)))
    assert(r(6L) == ((6.0, 1.0, false)) && r(7L) == ((6.0, 1.0, false)))
  }

  // ---- funnel --------------------------------------------------------

  test("funnelStages: strict ordering — later stages need earlier ones first") {
    val e = Seq(
      (1L, "view", "t1"), (1L, "click", "t2"), (1L, "purchase", "t3"),
      (2L, "click", "t1"), (2L, "view", "t2"),          // click BEFORE view
      (3L, "purchase", "t1"),                           // purchase only
      (4L, "view", "t1"), (4L, "purchase", "t2"),       // skipped click
    ).toDF("user_id", "event_type", "ts_s")
    val r = graft.queries.CoreQueries.funnelStages(e)
      .as[(Long, Long, String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((3L, "t1", "t2", "t3")))
    assert(r(2L) == ((1L, "t2", "", "")))
    assert(r(3L) == ((0L, "", "", "")))
    assert(r(4L) == ((1L, "t1", "", "")))
  }

  // ---- multiprobe ANN ------------------------------------------------

  test("multiprobeTopK: probes stay within Hamming 1, top-1 dominates same-bucket") {
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(j => (math.cos(i * 3 + j * 5) * 9).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 5)
    val mp = graft.ann.Ann.multiprobeTopK(vecs, queries, "vec_id",
        "embedding", nBits = 4, k = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._3, t._4))).toMap
    val sameBucket = graft.ann.Ann.knnGraph(vecs, "vec_id", "embedding",
        nBits = 4, k = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t._4).toMap
    val buckets = vecs.select($"vec_id",
        graft.ann.Ann.signBucket("embedding", 4).as("b"))
      .as[(Long, Int)].collect().toMap
    mp.foreach { case (q, (nb, cos)) =>
      assert(Integer.bitCount(buckets(q) ^ buckets(nb)) <= 1)
      // wider candidate pool can only raise the best cosine
      sameBucket.get(q).foreach(sb => assert(cos >= sb))
    }
    assert(mp.nonEmpty)
  }

  // ---- shipping priority --------------------------------------------

  test("shippingPriority: segment + date gates and exact revenue math") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q87-").toString
    val ts = java.sql.Timestamp.valueOf(_: String)
    Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq(
      (10L, 1L, ts("1997-06-01 00:00:00"), "1-URGENT"),  // qualifies
      (11L, 1L, ts("1998-06-01 00:00:00"), "2-HIGH"),    // order after cutoff
      (12L, 2L, ts("1997-06-01 00:00:00"), "3-MEDIUM"),  // wrong segment
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq(
      (10L, 100.0, 0.10, ts("1998-02-01 00:00:00")),     // 90.00
      (10L, 50.0, 0.00, ts("1998-03-01 00:00:00")),      // 50.00
      (10L, 999.0, 0.50, ts("1997-12-31 00:00:00")),     // shipped pre-cutoff
      (11L, 10.0, 0.00, ts("1998-07-01 00:00:00")),
      (12L, 10.0, 0.00, ts("1998-07-01 00:00:00")),
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.CoreQueries.shippingPriority(spark, dir)
      .as[(Long, String, String, Double)].collect()
    assert(r.toSeq == Seq((10L, "1997-06-01 00:00:00", "1-URGENT", 140.0)))
  }

  // ---- pagerank ------------------------------------------------------

  test("pageRank: uniform on a cycle, hub-heavy on a star, mass conserved") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("s", "t")
    val verts = Seq(0L, 1L, 2L, 3L).toDF("id")
    val rc = graft.graph.PageRank.run(cycle, verts, "s", "t", "id")
      .as[(Long, Double)].collect().toMap
    // cycle is stationary at the uniform vector
    rc.values.foreach(r => assert(math.abs(r - 0.25) < 1e-9))
    assert(math.abs(rc.values.sum - 1.0) < 1e-9)

    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("s", "t")
    val rs = graft.graph.PageRank.run(star, verts, "s", "t", "id")
      .as[(Long, Double)].collect().toMap
    assert(rs(0L) > rs(1L))
    assert(rs(1L) == rs(2L) && rs(2L) == rs(3L))
  }

  test("pageRank: empty vertex table fails loud, not Infinity teleport") {
    val noEdges = Seq.empty[(Long, Long)].toDF("s", "t")
    val noVerts = Seq.empty[Long].toDF("id")
    val e = intercept[IllegalArgumentException] {
      graft.graph.PageRank.run(noEdges, noVerts, "s", "t", "id")
    }
    assert(e.getMessage.contains("non-empty"))
  }

  // ---- minhash estimator quality ------------------------------------

  test("minhashEstimateQuality: exact copies estimate 1.0 with zero error") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base),                       // identical pair
      (3L, "totally different words in this other document here now"),
    ).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.minhashEstimateQuality(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
    val copy = r.find(t => t._1 == 1L && t._2 == 2L).get
    assert(copy == ((1L, 2L, 1.0, 1.0, 0.0)))
    r.foreach { t =>
      assert(t._3 >= 0.0 && t._3 <= 1.0)
      assert(math.abs(t._5 - math.abs(t._3 - t._4)) < 1e-15)
    }
  }

  // ---- trailing range window ----------------------------------------

  test("trailing RANGE frame admits timestamp peers together") {
    val e = Seq(
      (1L, 10L, 0L, 1.0), (1L, 11L, 3600L, 2.0),
      (1L, 12L, 3600L, 3.0), (1L, 13L, 7201L, 4.0),
    ).toDF("user_id", "event_id", "ts_sec", "value")
    val w = Window.partitionBy("user_id").orderBy("ts_sec")
      .rangeBetween(-3600, Window.currentRow)
    val r = e.select($"event_id", count(lit(1)).over(w).as("n"),
        sum($"value".cast("decimal(18,2)")).over(w).cast("double").as("s"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(10L) == ((1L, 1.0)))
    // both ts=3600 peers see the SAME frame: {0, 3600, 3600}
    assert(r(11L) == ((3L, 6.0)) && r(12L) == ((3L, 6.0)))
    // 7201 is past 3600+3600: only itself
    assert(r(13L) == ((1L, 4.0)))
  }

  // ---- confusion matrix ---------------------------------------------

  test("lang confusion rows: fractions sum to 1 per label, correct = diagonal") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over dogs", "en"),
      (2L, "der schnelle braune fuchs springt hoch", "de"),
      (3L, "le renard brun rapide saute haut", "fr"),
      (4L, "more english words appear in here", "en"),
    ).toDF("doc_id", "text", "lang")
    val w = Window.partitionBy("labeled_lang")
    val cm = graft.text.TextOps.langId(docs, Seq("de", "en", "es", "fr", "zh"))
      .groupBy("labeled_lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("frac", $"n_docs".cast("double")
        / sum("n_docs").over(w).cast("double"))
      .as[(String, String, Long, Double)].collect()
    cm.groupBy(_._1).values.foreach { rows =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    }
    assert(cm.map(_._3).sum == 4L)
  }

  // ---- unigram cross-entropy ----------------------------------------

  test("unigramXent: rare tokens score high, common tokens low, exact values") {
    val docs = Seq((1L, "a a a"), (2L, "r")).toDF("doc_id", "text")
    // corpus: a×3, r×1 → p(a)=3/4, p(r)=1/4
    val r = graft.text.TextOps.unigramXent(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((3L, 0.28768)))   // -ln(3/4)
    assert(r(2L) == ((1L, 1.38629)))   // -ln(1/4)
  }

  // ---- quality canonical --------------------------------------------

  test("qualityCanonical keeps the highest-quality member per cluster") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (1L, base + " one", 10L),
      (2L, base + " two", 99L),   // same cluster, best quality
      (3L, base + " six", 50L),
      (4L, "unrelated island text with no duplicate partner at all", 7L),
    ).toDF("doc_id", "text", "n_chars")
    val r = Dedup.qualityCanonical(d, "doc_id", "text", "n_chars",
        tau = 0.5)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // docs 1-3 cluster together (cluster_id = min = 1), keeper = 2
    assert(Seq(1L, 2L, 3L).forall(i => r(i)._1 == 1L && r(i)._2 == 2L))
    assert(r(2L)._3 && !r(1L)._3 && !r(3L)._3)
    assert(!r.contains(4L))   // isolated docs are not clustered
  }
}
