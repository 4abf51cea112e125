package graft

import graft.ann.Ann
import graft.sampling.Sampling
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-5 operators: decorrelated-subquery relational
  * shapes, DSIR importance weights, Lloyd k-means, two-stage re-ranked
  * retrieval, per-domain caps, CCNet perplexity terciles. Covers the
  * invariants the row oracle can't see: plan shapes, dominance
  * relations, signal direction. */
class Round5Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- k-means -------------------------------------------------------

  test("kmeans: total assignment, cluster ids are seeds, deterministic") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => ((i % 4) * 8 + j).toFloat / 32f))
    }.toDF("vec_id", "embedding")
    val r1 = Ann.kmeans(vecs, "vec_id", "embedding", k = 4, iters = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(r1.length == 40)                      // every vector assigned once
    assert(r1.map(_._2).forall(c => c >= 0 && c < 4))
    val r2 = Ann.kmeans(vecs, "vec_id", "embedding", k = 4, iters = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(r1.sameElements(r2))                  // bit-identical rerun
  }

  test("kmeans separates two obvious blobs") {
    // two orthogonal directions; seeds 0 and 1 are one from each blob
    val blobA = (0L until 10L).filter(_ % 2 == 0)
      .map(i => (i, Array(1f, 0f, 0f, 0f) ++ Array.fill(4)(i.toFloat / 100f)))
    val blobB = (0L until 10L).filter(_ % 2 == 1)
      .map(i => (i, Array(0f, 1f, 0f, 0f) ++ Array.fill(4)(i.toFloat / 100f)))
    val vecs = (blobA ++ blobB).toDF("vec_id", "embedding")
    val r = Ann.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val aClusters = blobA.map(v => r(v._1)).toSet
    val bClusters = blobB.map(v => r(v._1)).toSet
    assert(aClusters.size == 1 && bClusters.size == 1)
    assert(aClusters != bClusters)
  }

  // ---- two-stage re-rank --------------------------------------------

  test("rerank: exact order within shortlist, coarse ranks bounded") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 7 + j * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val r = Ann.rerankTopK(vecs, "vec_id", "embedding",
        nQueries = 5, m = 10, k = 3)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(r.length == 15)
    assert(r.forall(t => t._5 >= 1 && t._5 <= 10)) // from the shortlist
    // within each query the exact cosine is non-increasing in rank
    r.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---- DSIR ----------------------------------------------------------

  test("dsir: target-like docs score higher than off-target docs") {
    val target = (0L until 30L).map(i =>
      (i, "en", s"the quick brown fox ${i % 3} jumps over the lazy dog"))
    val other = (30L until 60L).map(i =>
      (i, "de", s"der schnelle braune fuchs ${i % 3} springt ueber den hund"))
    val docs = (target ++ other).toDF("doc_id", "lang", "text")
    val w = Sampling.dsirWeights(docs, "doc_id", "text",
        col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg("logw5").as("mw"))
      .as[(String, Double)].collect().toMap
    assert(w("en") > w("de"))
    assert(w("en") > 0 && w("de") < 0)
  }

  // ---- domain cap ----------------------------------------------------

  test("domainCap: at most cap rows per domain, best-first, WindowGroupLimit plan") {
    val docs = (1L to 100L).map(i =>
      (i, s"src${i % 3}", (i % 17).toDouble)).toDF("doc_id", "source", "score")
    val capped = Sampling.domainCap(docs, "doc_id", "source", "score", cap = 5)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    val rows = capped.select("source", "doc_id", "score", "rnk")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.groupBy(_._1).values.forall(_.length == 5))
    // kept rows are the per-source score-desc head (id tiebreak)
    val want = (1L to 100L).map(i => (s"src${i % 3}", i, (i % 17).toDouble))
      .groupBy(_._1).values.flatMap(_.sortBy(t => (-t._3, t._2)).take(5))
      .map(t => (t._1, t._2)).toSet
    assert(rows.map(t => (t._1, t._2)).toSet == want)
  }

  // ---- CCNet buckets -------------------------------------------------

  test("ccnetBuckets: terciles balanced within 1 per lang, ordered by xent") {
    val docs = (1L to 90L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      // vary rarity: low ids repeat common tokens, high ids are rare soup
      val text = if (i < 45) "common common common word"
        else s"rare$i token$i soup$i word"
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
    val r = TextOps.ccnetBuckets(docs, "doc_id", "text")
      .as[(Long, String, Double, Long, String)].collect()
    r.groupBy(_._2).values.foreach { rows =>
      val sizes = rows.groupBy(_._4).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1)          // ntile balance
      // head has lower (or equal) xent than tail
      val head = rows.filter(_._5 == "head").map(_._3)
      val tail = rows.filter(_._5 == "tail").map(_._3)
      assert(head.max <= tail.min)
    }
  }

  // ---- hybrid RRF ----------------------------------------------------

  test("hybridRrf: rank-1 docs of both lists survive, rrf non-increasing") {
    val bm = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val ann = Seq((20L, 1L), (11L, 2L), (21L, 3L)).toDF("doc_id", "rank")
    val r = graft.search.Search.hybridRrf(bm, ann, k = 5)
      .orderBy("fused_rank")
      .select("doc_id", "rrf6").as[(Long, Double)].collect()
    // doc 11 appears in BOTH lists → highest fused score
    assert(r.head._1 == 11L)
    assert(r.map(_._2).sliding(2).forall(p => p.head >= p.last))
    assert(r.map(_._1).toSet == Set(10L, 11L, 12L, 20L, 21L))
  }

  // ---- stratified sample --------------------------------------------

  test("stratifiedSample: exactly n per large stratum, whole small stratum") {
    val docs = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 105L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val r = Sampling.stratifiedSample(docs, "doc_id", "lang", n = 10)
      .select("lang", "doc_id").as[(String, Long)].collect()
    val bySt = r.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySt == Map("big" -> 10, "small" -> 5))
    val r2 = Sampling.stratifiedSample(docs, "doc_id", "lang", n = 10)
      .select("lang", "doc_id").as[(String, Long)].collect()
    assert(r.sortBy(_._2).sameElements(r2.sortBy(_._2))) // deterministic
  }

  // ---- temperature mixture ------------------------------------------

  test("temperatureMixture: shares sum to ~1 and flatten toward uniform") {
    val docs = ((1 to 900).map(i => (i.toLong, "head")) ++
      (901 to 1000).map(i => (i.toLong, "tail"))).toDF("doc_id", "source")
    val r = Sampling.temperatureMixture(docs, "source")
      .select("source", "p6", "share6").as[(String, Double, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-4)
    // τ=0.5 moves mass from head to tail but keeps the order
    assert(r("head")._2 < r("head")._1)
    assert(r("tail")._2 > r("tail")._1)
    assert(r("head")._2 > r("tail")._2)
  }

  // ---- hard negatives ------------------------------------------------

  test("hardNegatives: no same-label results, ranks dense from 1") {
    val vecs = (0L until 30L).map { i =>
      (i, s"label${i % 3}", Array.tabulate(8)(j => math.cos(i + j).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val r = graft.ann.Ann.hardNegatives(vecs,
        vecs.filter($"vec_id" < 3), "vec_id", "embedding", "label", k = 4)
      .as[(Long, Long, Long, String, Double)].collect()
    assert(r.length == 12)
    assert(r.forall(t => t._4 != s"label${t._1 % 3}"))
    r.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted.sameElements(1L to 4L))
    }
  }

  // ---- bag set ops ---------------------------------------------------

  test("bagSetOps: intersectAll + exceptAll multiplicities reconstruct the left side") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.bagSetOps(spark, sf)
      .as[(String, Long, String)].collect()
    val byType = r.groupBy(_._1).view
      .mapValues(_.map(t => t._3 -> t._2).toMap).toMap
    val pre = graft.sources.Tables.events(spark, sf)
      .filter(pmod($"event_id", lit(10)) < 8)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    byType.foreach { case (tpe, ops) =>
      assert(ops.getOrElse("intersect_all", 0L)
        + ops.getOrElse("except_all", 0L) == pre(tpe))
    }
  }

  // ---- simhash hot path ---------------------------------------------

  test("simhashAggK equals the HOF simhashK twin bit-for-bit") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content entirely here now"),
      (4L, "x"),
    ).toDF("doc_id", "text")
    val fast = TextOps.simhashAggK(docs, "doc_id", "text", bits = 32)
      .as[(Long, Long)].collect().toMap
    val slow = docs
      .select($"doc_id", expr(
        "transform(array_distinct(split(text, ' ')), t -> md5(t))")
        .as("tok_md5"))
      .select($"doc_id", TextOps.simhashK("tok_md5", 32).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(fast == slow)
  }

  // ---- SCD2 history --------------------------------------------------

  test("scd2: runs compress, bounds chain, leading NULL attr kept") {
    val feed = Seq(
      (1L, 10L, "a", "2024-01-01 00:00:00"),
      (2L, 10L, "a", "2024-01-02 00:00:00"), // same run
      (3L, 10L, "b", "2024-01-03 00:00:00"), // run 2
      (4L, 20L, null.asInstanceOf[String], "2024-01-01 00:00:00"), // NULL opener
      (5L, 20L, "x", "2024-01-02 00:00:00"),
    ).toDF("event_id", "user_id", "event_type", "ts_s")
    val r = graft.ops.Scd2.history(feed, "user_id", "event_type",
        Seq($"ts_s", $"event_id"), "ts_s")
      .as[(Long, Long, String, String, String, Boolean)].collect()
      .sortBy(t => (t._1, t._2))
    assert(r.length == 4)
    val u10 = r.filter(_._1 == 10L)
    assert(u10.map(t => (t._2, t._3, t._4, t._5, t._6)).toSeq == Seq(
      (1L, "a", "2024-01-01 00:00:00", "2024-01-03 00:00:00", false),
      (2L, "b", "2024-01-03 00:00:00", "9999-12-31 00:00:00", true)))
    val u20 = r.filter(_._1 == 20L)
    assert(u20.map(t => (t._2, t._3, t._6)).toSeq == Seq(
      (1L, null, false), (2L, "x", true))) // NULL opener has a version
  }

  // ---- triangles -----------------------------------------------------

  test("triangles: each triangle counted once per corner, hubs zero") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),  // triangle {1,2,3}
      (2L, 1L),                       // duplicate reversed edge: no double count
      (3L, 4L), (4L, 5L),             // path, no triangle
    ).toDF("src", "dst")
    val nodes = (1L to 6L).toDF("id")
    val r = graft.graph.Triangles.perNode(edges, "src", "dst", nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  // ---- native grouped top-k -----------------------------------------

  test("graft_topk equals the rank-window form across a multi-partition layout") {
    val rows = (1L to 500L).map(i => (s"g${i % 7}", i, (i % 13).toDouble))
    val df = rows.toDF("g", "id", "score").repartition(8)
    val native = df.groupBy($"g")
      .agg(graft.functions.GraftFunctions.topK(spark, $"score", $"id", 5)
        .as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", $"col.id".as("id"), $"col.score".as("score"),
        ($"pos" + 1).cast("long").as("rnk"))
      .as[(String, Long, Double, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy($"score".desc, $"id".asc)
    val window = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 5).select("g", "id", "score", "rnk")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(native == window)
  }

  test("graft_topk plan has no Sort operator; window twin does") {
    val df = (1L to 100L).map(i => (s"g${i % 3}", i, i.toDouble))
      .toDF("g", "id", "score")
    val native = df.groupBy($"g")
      .agg(graft.functions.GraftFunctions.topK(spark, $"score", $"id", 3))
    assert(!native.queryExecution.executedPlan.toString.contains("Sort "))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy($"score".desc, $"id".asc)
    val win = df.withColumn("r", row_number().over(w)).filter($"r" <= 3)
    assert(win.queryExecution.executedPlan.toString.contains("Sort "))
  }

  test("graft_topk: fewer rows than k yields the whole group, best-first") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 9.0), ("b", 3L, 1.0))
      .toDF("g", "id", "score")
    val r = df.groupBy($"g")
      .agg(graft.functions.GraftFunctions.topK(spark, $"score", $"id", 10)
        .as("tk"))
      .select($"g", $"tk".cast("array<struct<id:bigint,score:double>>"))
      .as[(String, Seq[(Long, Double)])].collect().toMap
    assert(r("a") == Seq((2L, 9.0), (1L, 2.0)))
    assert(r("b") == Seq((3L, 1.0)))
  }

  // ---- tau sweep -----------------------------------------------------

  test("tauSweep: counts monotonically non-increasing in tau") {
    val docs = (1L to 40L).map { i =>
      val base = "alpha beta gamma delta epsilon zeta eta theta"
      val text = if (i % 4 == 0) base else s"$base tail$i extra$i"
      (i, text)
    }.toDF("doc_id", "text")
    val r = graft.dedup.Dedup.tauSweep(docs, "doc_id", "text")
      .as[(Double, Long)].collect().sortBy(_._1)
    assert(r.nonEmpty)
    assert(r.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  // ---- sparse cosine -------------------------------------------------

  test("sparseCosine: identical docs hit cos 1.0, self excluded, ranks dense") {
    val docs = Seq(
      (1L, "red green blue"), (2L, "red green blue"),
      (3L, "cyan magenta yellow"), (4L, "red green purple"),
    ).toDF("doc_id", "text")
    val vecs = graft.search.SparseSim.hashedVectors(docs, "doc_id", "text", 64)
    val r = graft.search.SparseSim.sparseCosineTopK(vecs, "doc_id",
        docs.filter($"doc_id" === 1).select("doc_id"), k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(r.forall(_._3 != 1L))
    assert(r.head._3 == 2L && r.head._4 == 1.0) // exact duplicate first
    assert(r.map(_._2).sameElements(1L to r.length.toLong))
  }

  // ---- weighted sample -----------------------------------------------

  test("weightedSample: exact n, heavy weights dominate the kept set") {
    val docs = (1L to 400L).map(i =>
      (i, if (i <= 100L) 1000L else 1L)).toDF("doc_id", "w")
    val kept = Sampling.weightedSample(docs, "doc_id", "w", n = 50)
      .select("doc_id").as[Long].collect()
    assert(kept.length == 50)
    // 100 heavy rows (weight 1000) vs 300 light (weight 1): the sample
    // should be essentially all heavy rows
    assert(kept.count(_ <= 100L) >= 45)
    val again = Sampling.weightedSample(docs, "doc_id", "w", n = 50)
      .select("doc_id").as[Long].collect()
    assert(kept.sorted.sameElements(again.sorted)) // deterministic
  }

  // ---- relational shapes --------------------------------------------

  test("exists semi-join emits each order at most once") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.orderPriorityExists(spark, sf)
      .agg(sum("n_orders")).as[Long].head()
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(r > 0 && r <= orders)
  }

  test("order histogram conserves the customer population") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.custOrderDistribution(spark, sf)
      .agg(sum("n_customers")).as[Long].head()
    assert(r == graft.sources.Tables.customer(spark, sf).count())
  }

  test("top supplier revenue equals the max of the per-supplier aggregate") {
    val sf = "/root/testdata/sf0.001"
    val top = graft.queries.CoreQueries.topSupplier(spark, sf)
      .select("total_revenue").as[Double].collect()
    assert(top.nonEmpty && top.toSet.size == 1) // all rows tie at the max
  }

  test("promo share is a percentage per distinct month") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.promoShare(spark, sf)
      .as[(String, Double)].collect()
    assert(r.nonEmpty)
    assert(r.map(_._1).distinct.length == r.length)
    assert(r.forall(t => t._2 >= 0.0 && t._2 <= 100.0))
    assert(r.exists(_._2 > 0.0)) // PROMO parts actually sell
  }

  test("returned value: exactly 20 rows, revenue non-increasing") {
    val sf = "/root/testdata/sf0.001"
    val rev = graft.queries.CoreQueries.returnedValue(spark, sf)
      .select("revenue").as[Double].collect()
    assert(rev.length == 20)
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("large orders: every order exceeds the quantity cutoff, once") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.largeOrders(spark, sf)
      .select("o_orderkey", "sum_qty").as[(Long, Double)].collect()
    assert(r.forall(_._2 > 280.0))
    assert(r.map(_._1).distinct.length == r.length)
  }

  test("min-price supplier: one row per part, price is the true minimum") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.minPriceSupplier(spark, sf)
    val parts = r.select("l_partkey").as[Long].collect()
    assert(parts.distinct.length == parts.length)
    // recompute the per-(part,supplier) unit price independently and
    // check the argmin matches on a sample part
    val li = graft.sources.Tables.lineitem(spark, sf)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg((sum($"l_extendedprice") / sum($"l_quantity")).as("p"))
    val some = parts.head
    val best = li.filter($"l_partkey" === some).orderBy($"p", $"l_suppkey")
      .select("l_suppkey").as[Long].head()
    val got = r.filter($"l_partkey" === some)
      .select("s_suppkey").as[Long].head()
    assert(got == best)
  }

  test("supplier-type counts never include excluded suppliers") {
    val sf = "/root/testdata/sf0.001"
    val okSupp = graft.sources.Tables.supplier(spark, sf)
      .filter($"s_acctbal" >= 0).count()
    val r = graft.queries.CoreQueries.supplierTypeCounts(spark, sf)
      .select("supplier_cnt").as[Long].collect()
    assert(r.nonEmpty && r.forall(c => c >= 1 && c <= okSupp))
  }

  test("matryoshka rerank: k per query, exact-cosine order, shortlist bound") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(16)(j => math.cos(i * 5 + j * 11).toFloat))
    }.toDF("vec_id", "embedding")
    val r = Ann.matryoshkaTopK(vecs, "vec_id", "embedding",
        prefix = 4, nQueries = 4, m = 10, k = 3)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(r.length == 12)
    assert(r.forall(t => t._5 >= 1 && t._5 <= 10))
    r.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).zip(sorted.map(_._4).tail)
        .forall { case (a, b) => a >= b })
    }
  }

  test("ivfRecall: one-cell corpus gives perfect recall, bounds hold") {
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 3 + j).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val r = Ann.ivfRecall(vecs, vecs.filter($"vec_id" < 3), "vec_id",
        "embedding", "label", k = 3)
      .as[(Long, Long, Double)].collect()
    assert(r.length == 3)
    assert(r.forall(t => t._2 == 3 && t._3 == 1.0)) // same cell ⇒ identical
    // split cells: recall can only drop, never exceed 1
    val split = vecs.withColumn("label", (col("vec_id") % 2).cast("int"))
    val r2 = Ann.ivfRecall(split, split.filter($"vec_id" < 3), "vec_id",
        "embedding", "label", k = 3)
      .as[(Long, Long, Double)].collect()
    assert(r2.length == 3)
    assert(r2.forall(t => t._2 >= 0 && t._2 <= 3 && t._3 <= 1.0))
  }

  test("bigramXent: fully predictable successors score exactly zero") {
    val docs = Seq(
      (1L, "a b a b a b"),   // 'a'→always 'b', 'b'→always 'a'
      (2L, "a b a b"),
      (3L, "c d c e")        // 'c' splits between 'd' and 'e' → xent > 0
    ).toDF("doc_id", "text")
    val r = TextOps.bigramXent(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(r.map(_._1).sameElements(Array(1L, 2L, 3L)))
    assert(r(0)._2 == 5 && r(1)._2 == 3)     // n-1 bigrams per doc
    assert(r(0)._3 == 0.0 && r(1)._3 == 0.0)
    assert(r(2)._3 > 0.0)
  }

  test("bigramXent drops docs with fewer than two tokens") {
    val docs = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    val ids = TextOps.bigramXent(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect()
    assert(ids.sameElements(Array(2L)))
  }

  test("gramNovelty: unique doc scores 1, clone pair scores 0") {
    val docs = Seq(
      (1L, "w x y z q r s"),            // all grams unique to doc 1
      (2L, "m n o p m n o p"),          // cloned below → df 2 everywhere
      (3L, "m n o p m n o p")
    ).toDF("doc_id", "text")
    val r = TextOps.gramNovelty(docs, "doc_id", "text")
      .select("doc_id", "novel_share5").as[(Long, Double)].collect().toMap
    assert(r(1L) == 1.0 && r(2L) == 0.0 && r(3L) == 0.0)
  }

  test("sourceGini: uniform lengths ~0, concentrated source is higher") {
    val docs = (
      (0L until 10L).map(i => (i, "flat", 100L)) ++
      (10L until 20L).map(i => (i, "skew", if (i == 19L) 10000L else 10L))
    ).toDF("doc_id", "source", "n_chars")
    val g = TextOps.sourceGini(docs, "doc_id")
      .select("source", "gini5").as[(String, Double)].collect().toMap
    assert(g("flat") == 0.0) // equal lengths: 2Σi·x/(nΣx) = (n+1)/n exactly
    assert(g("skew") > 0.8 && g("skew") < 1.0)
  }

  test("local-supplier revenue only counts same-nation pairs") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.localSupplierRevenue(spark, sf)
      .as[(String, Double)].collect()
    assert(r.nonEmpty && r.forall(_._2 > 0.0))
    assert(r.map(_._1).distinct.length == r.length)
  }

  test("volume shipping emits only the two requested nation directions") {
    // sf0.001 has ~10 suppliers and none in NATION_1/2 — use sf0.01
    val sf = "/root/testdata/sf0.01"
    val pairs = graft.queries.CoreQueries.volumeShipping(spark, sf)
      .select("supp_nation", "cust_nation").distinct()
      .as[(String, String)].collect().toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"),
      ("NATION_2", "NATION_1"))))
    assert(pairs.nonEmpty)
  }

  test("priority counts partition the 1997-shipped join exactly") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.priorityCounts(spark, sf)
      .as[(String, Long, Long)].collect()
    val total = r.map(t => t._2 + t._3).sum
    val expected = graft.sources.Tables.lineitem(spark, sf)
      .filter(year($"l_shipdate") === 1997)
      .join(graft.sources.Tables.orders(spark, sf),
        $"l_orderkey" === $"o_orderkey").count()
    assert(total == expected)
  }

  test("disjunctive revenue equals the sum of its disjoint branches") {
    val sf = "/root/testdata/sf0.001"
    val whole = graft.queries.CoreQueries.disjunctiveRevenue(spark, sf)
      .as[Double].head()
    // brands differ per branch, so the disjuncts are disjoint and the
    // OR must equal the sum of three independent filters
    val li = graft.sources.Tables.lineitem(spark, sf)
    val p = graft.sources.Tables.part(spark, sf)
    def branch(brand: String, sz: (Int, Int), q: (Int, Int)): Double = {
      val d = li.join(p, $"l_partkey" === $"p_partkey")
        .filter($"p_brand" === brand && $"p_size".between(sz._1, sz._2)
          && $"l_quantity".between(q._1, q._2))
        .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount")
          * 10000.0 + 0.5).cast("long")).cast("double") / 10000.0)
        .as[Option[Double]].head()
      d.getOrElse(0.0)
    }
    val parts = branch("Brand#1", (1, 10), (1, 11)) +
      branch("Brand#2", (1, 20), (10, 20)) +
      branch("Brand#3", (1, 30), (20, 30))
    assert(math.abs(whole - parts) < 1e-6)
  }

  test("waiting suppliers: top-10, descending, only multi-supplier orders") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.waitingSuppliers(spark, sf)
      .as[(String, Long)].collect()
    assert(r.length <= 10 && r.nonEmpty)
    assert(r.forall(_._2 > 0))
    assert(r.map(_._2).zip(r.map(_._2).tail).forall { case (a, b) => a >= b })
  }

  test("kmv set ops are exact below the sketch size") {
    // two identical 30-token sources + one disjoint 20-token source:
    // every distinct count sits under k=64, so estimates are exact
    val mk = (src: String, toks: Seq[String]) =>
      (src, toks.mkString(" "))
    val docs = Seq(
      mk("src0", (0 until 30).map(i => s"tok$i")),
      mk("src1", (0 until 30).map(i => s"tok$i")),
      mk("src2", (100 until 120).map(i => s"tok$i"))
    ).toDF("source", "text").withColumn("doc_id", lit(1L))
    val r = TextOps.sourceOverlapKmv(docs, Seq("src0", "src1", "src2"))
      .as[(String, String, Double, Double, Double, Double)]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4, t._5, t._6)).toMap
    assert(r(("src0", "src1")) == ((30.0, 30.0, 30.0, 30.0)))
    assert(r(("src0", "src2")) == ((30.0, 20.0, 50.0, 0.0)))
    assert(r(("src1", "src2")) == ((30.0, 20.0, 50.0, 0.0)))
  }

  test("dup matrix pair mass equals the q20 near-dup pair count") {
    val sf = "/root/testdata/sf0.001"
    val pairs = graft.dedup.Dedup.minhashNearDups(
      graft.sources.Tables.documents(spark, sf), "doc_id", "text").count()
    val matrix = graft.queries.LlmQueries.dupSourceMatrix(spark, sf)
      .agg(sum("n_pairs")).as[Long].head()
    assert(matrix == pairs)
    val badOrder = graft.queries.LlmQueries.dupSourceMatrix(spark, sf)
      .filter($"source_a" > $"source_b").count()
    assert(badOrder == 0)
  }

  test("simple revenue: one row, positive, filters genuinely restrict") {
    val sf = "/root/testdata/sf0.001"
    val rev = graft.queries.CoreQueries.simpleRevenue(spark, sf)
      .as[Double].collect()
    assert(rev.length == 1 && rev.head > 0.0)
    val all = graft.sources.Tables.lineitem(spark, sf)
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount")
        * 10000.0 + 0.5).cast("long")).cast("double") / 10000.0)
      .as[Double].head()
    assert(rev.head < all)
  }

  test("pmi: inseparable pair tops the ranking, counts respect minCount") {
    // 'alpha beta' always co-occur and appear nowhere else; filler
    // tokens are common — PMI must rank the exclusive pair first
    val docs = ((1 to 10).map(i => (i.toLong,
        "alpha beta x y z w x y z w")) ++
      (11 to 20).map(i => (i.toLong, "x y z w x y z w x y")))
      .toDF("doc_id", "text")
    val r = TextOps.pmiCollocations(docs, "text", minCount = 5, k = 5)
      .as[(String, Long, Double)].collect()
    assert(r.nonEmpty && r.forall(_._2 >= 5))
    assert(r.head._1 == "alpha beta")
    assert(r.map(_._3).zip(r.map(_._3).tail).forall { case (a, b) => a >= b })
  }

  test("trimmed mean keeps exactly n - 2*floor(n/10) per nation") {
    val sf = "/root/testdata/sf0.001"
    val counts = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .join(graft.sources.Tables.nation(spark, sf),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name").count().as[(String, Long)].collect().toMap
    val r = graft.queries.CoreQueries.trimmedMean(spark, sf)
      .select("nation", "kept").as[(String, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (nation, kept) =>
      val n = counts(nation)
      assert(kept == n - 2 * (n / 10), s"$nation: kept=$kept n=$n")
    }
  }

  test("price histogram conserves the order count and shares sum to 1") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.priceHistogram(spark, sf)
      .as[(Long, Long, Double)].collect()
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(r.map(_._2).sum == orders)
    assert(math.abs(r.map(_._3).sum - 1.0) < 1e-3)
    assert(r.forall(t => t._1 >= 0 && t._1 <= 10))
  }

  test("profit rollup: distinct (nation, year) grain, profit can go negative") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.profitByNationYear(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(r.nonEmpty)
    assert(r.map(t => (t._1, t._2)).distinct.length == r.length)
  }

  test("important parts all clear the value-share threshold") {
    // NATION_9 has no suppliers at sf0.001 — use sf0.01
    val sf = "/root/testdata/sf0.01"
    val r = graft.queries.CoreQueries.importantParts(spark, sf)
      .as[(Long, Double)].collect()
    assert(r.nonEmpty)
    val total = r.map(_._2).sum // lower bound on the nation total
    r.foreach { case (_, v) => assert(v > 0.0) }
    assert(r.map(_._1).distinct.length == r.length)
  }

  test("dominant suppliers: every survivor really dominates some part") {
    val sf = "/root/testdata/sf0.01"
    val got = graft.queries.CoreQueries.dominantSuppliers(spark, sf)
      .select("s_suppkey").as[Long].collect().toSet
    val li = graft.sources.Tables.lineitem(spark, sf)
    val ps = li.groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity").as("sq"))
    val p = li.groupBy($"l_partkey".as("pk")).agg(sum($"l_quantity").as("tq"))
    val expect = ps.join(p, $"l_partkey" === $"pk")
      .filter($"sq" > $"tq" * 0.15)
      .select("l_suppkey").distinct().as[Long].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("cohorts: no activity before the cohort day, population conserved") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.cohortRetention(spark, sf)
      .as[(String, String, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall(t => t._1 <= t._2)) // activity never precedes cohort
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // day-0 rows (cohort == day) partition the user population
    assert(r.filter(t => t._1 == t._2).map(_._3).sum == users)
  }

  test("transitions: pair mass equals events minus one per user") {
    val sf = "/root/testdata/sf0.001"
    val total = graft.queries.CoreQueries.eventTransitions(spark, sf)
      .agg(sum("n")).as[Long].head()
    val e = graft.sources.Tables.events(spark, sf)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(total == expected)
  }

  test("fill rate bounded and order population conserved") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.fillRate(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    assert(r.forall(t => t._3 <= t._2 && t._4 >= 0.0 && t._4 <= 1.0))
    val orders = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    assert(r.map(_._2).sum == orders)
  }

  test("mom revenue: one row per month after the first") {
    val sf = "/root/testdata/sf0.001"
    val months = graft.sources.Tables.orders(spark, sf)
      .select(date_format($"o_orderdate", "yyyy-MM")).distinct().count()
    val r = graft.queries.CoreQueries.momRevenue(spark, sf).count()
    assert(r == months - 1)
  }

  test("top customer list: first element equals the argmax winner") {
    val sf = "/root/testdata/sf0.001"
    val lists = graft.queries.CoreQueries.topCustomerList(spark, sf)
      .as[(String, String)].collect().toMap
    assert(lists.values.forall(_.split(",").length <= 3))
    val argmax = graft.queries.CoreQueries.argmaxCustomer(spark, sf)
      .select("nation", "top_customer").as[(String, String)]
      .collect().toMap
    argmax.foreach { case (nation, top) =>
      assert(lists(nation).split(",").head == top, nation)
    }
  }

  test("rolling 7-day actives dominate single-day actives") {
    val sf = "/root/testdata/sf0.001"
    val weekly = graft.queries.CoreQueries.rollingActives(spark, sf)
      .as[(String, Long)].collect().toMap
    val daily = graft.sources.Tables.events(spark, sf)
      .select(date_format($"ts".cast("timestamp"), "yyyy-MM-dd").as("day"),
        $"user_id")
      .distinct().groupBy("day").count()
      .as[(String, Long)].collect().toMap
    assert(weekly.nonEmpty)
    daily.foreach { case (day, n) =>
      assert(weekly(day) >= n, s"$day: weekly ${weekly(day)} < daily $n")
    }
  }

  test("correlation stays inside [-1, 1]") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.qtyPriceCorr(spark, sf)
      .select("corr5").as[Double].collect()
    assert(r.nonEmpty)
    assert(r.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("benford digits: 1-9 only, counts conserve the order population") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.benfordDigits(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(r.forall(t => t._1.length == 1 && t._1 >= "1" && t._1 <= "9"))
    assert(r.map(_._2).sum ==
      graft.sources.Tables.orders(spark, sf).count())
  }

  test("containment catches an excerpt that the jaccard cut rejects") {
    // candidates come from the SAME ~0.8-tuned LSH bands as near-dup
    // detection, so the detectable excerpts are the large-fraction
    // ones (band collision odds scale with containment³); the point is
    // the VERIFY stage: jaccard 0.76 < 0.8 rejects the pair, one-sided
    // containment 1.0 keeps it
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val short = (1 to 46).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short),
      (3L, ("zzz " * 50).trim)).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.containmentPairs(docs, "doc_id", "text", 0.7)
      .as[(Long, Long, Double, Double)].collect()
    val pair = r.find(t => t._1 == 1L && t._2 == 2L)
    assert(pair.isDefined, s"expected (1,2) pair in ${r.toSeq}")
    assert(pair.get._4 == 1.0)      // |A∩B|/|B| with B = the excerpt
    assert(pair.get._3 < 0.8)       // the long side's share is partial
    // the symmetric jaccard-0.8 near-dup pass rejects this same pair
    val jac = graft.dedup.Dedup.minhashNearDups(docs, "doc_id", "text")
      .count()
    assert(jac == 0)
  }

  test("fertility: chars per token at least 1, docs conserved") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.LlmQueries.tokenizerFertility(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(r.nonEmpty)
    assert(r.forall(t => t._3 >= 1.0 && t._4 >= 1.0))
    assert(r.map(_._2).sum ==
      graft.sources.Tables.documents(spark, sf).count())
  }

  test("time travel restores v0 while the current version stays corrupted") {
    val sf = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("graft-ttrs-").toString
    val t = s"$work/table"
    val gold = graft.queries.CoreQueries.goldAgg(spark, sf)
    graft.sink.AtomicParquetSink.overwrite(gold, t)
    graft.sink.AtomicParquetSink.overwrite(
      gold.withColumn("total_amount", $"total_amount" * 2), t)
    val v0 = graft.sink.AtomicParquetSink.versions(spark, t).min
    val restored = graft.sink.AtomicParquetSink.readVersion(spark, t, v0)
      .agg(sum("total_amount")).as[Double].head()
    val current = graft.sink.AtomicParquetSink.read(spark, t).get
      .agg(sum("total_amount")).as[Double].head()
    val original = gold.agg(sum("total_amount")).as[Double].head()
    assert(restored == original)
    assert(current == original * 2)
  }

  test("region shares sum to 1 within every region") {
    val sf = "/root/testdata/sf0.001"
    val byRegion = graft.queries.CoreQueries.shareOfRegion(spark, sf)
      .groupBy("region").agg(sum("share5").as("s"))
      .as[(String, Double)].collect()
    assert(byRegion.nonEmpty)
    byRegion.foreach { case (r, total) =>
      assert(math.abs(total - 1.0) < 1e-3, s"$r shares sum to $total")
    }
  }

  test("running total ends at the customer's full spend") {
    val sf = "/root/testdata/sf0.001"
    val last = graft.queries.CoreQueries.runningTotal(spark, sf)
      .groupBy("o_custkey").agg(max("running_total").as("rt"))
    val full = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("t"))
    val bad = last.join(full, "o_custkey").filter($"rt" =!= $"t").count()
    assert(bad == 0)
  }

  test("yoy: per nation, one row per year after its first") {
    val sf = "/root/testdata/sf0.001"
    val perNation = graft.queries.CoreQueries.yoyByNation(spark, sf)
      .groupBy("nation").count().as[(String, Long)].collect().toMap
    val years = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .join(graft.sources.Tables.nation(spark, sf),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", year($"o_orderdate")).distinct()
      .groupBy("n_name").count().as[(String, Long)].collect().toMap
    years.foreach { case (n, y) =>
      assert(perNation.getOrElse(n, 0L) == y - 1, n)
    }
  }

  test("sentence stats: at least one word per sentence") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.text.TextOps.sentenceStats(
        graft.sources.Tables.documents(spark, sf), "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    assert(r.forall(t => t._3 >= t._2 && t._4 >= 1.0))
  }

  test("pareto frontier: members undominated, non-members dominated") {
    val sf = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
        .as("spent"), count(lit(1)).as("n"))
      .as[(Long, Double, Long)].collect()
    val frontier = graft.queries.CoreQueries.paretoCustomers(spark, sf)
      .as[(Long, Double, Long)].collect()
    val fSet = frontier.map(_._1).toSet
    def dominates(a: (Long, Double, Long), b: (Long, Double, Long)) =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    frontier.foreach { f =>
      assert(!all.exists(o => o._1 != f._1 && dominates(o, f)),
        s"frontier member $f is dominated")
    }
    all.filterNot(o => fSet(o._1)).foreach { o =>
      // dominated, or an exact tie whose larger key lost the tiebreak
      assert(all.exists(x => x._1 != o._1 && (dominates(x, o)
        || (x._2 == o._2 && x._3 == o._3 && x._1 < o._1))),
        s"non-member $o is undominated")
    }
  }

  test("2d histogram conserves the lineitem population") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.histogram2d(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(r.map(_._3).sum ==
      graft.sources.Tables.lineitem(spark, sf).count())
    assert(r.forall(t => t._1 >= 0 && t._1 <= 4 && t._2 >= 0 && t._2 <= 5))
  }

  test("vocab growth: cumulative, monotone, ends at the bigram vocabulary") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
    val r = graft.text.TextOps.vocabGrowth(docs, "doc_id", "text")
      .orderBy("decile").as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    assert(r.map(_._3).zip(r.map(_._3).tail).forall { case (a, b) => a < b }
      || r.length == 1)
    val total = docs.select(explode(expr(
        """transform(sequence(1, size(split(text,' ')) - 1),
          |  i -> concat(element_at(split(text,' '), i), ' ',
          |    element_at(split(text,' '), i + 1)))""".stripMargin)))
      .distinct().count()
    assert(r.last._3 == total)
  }

  test("burstiness: vmr non-negative, day population conserved") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.burstiness(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(r.nonEmpty)
    assert(r.forall(_._3 >= 0.0))
    assert(r.forall(t => t._2 >= 1 && t._2 <= 31))
  }

  test("knn label matrix conserves edge mass, pairs are ordered") {
    val sf = "/root/testdata/sf0.001"
    val edges = graft.ann.Ann.knnGraph(
      graft.sources.Tables.embeddings(spark, sf), "vec_id", "embedding",
      nBits = 4, k = 2).count()
    val m = graft.queries.LlmQueries.knnLabelMatrix(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(m.map(_._3).sum == edges)
    assert(m.forall(t => t._1 <= t._2))
  }

  test("error streaks: error mass conserved, current never beats longest") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.errorStreaks(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall(t => t._4 <= t._3))
    val errs = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "error").count()
    assert(r.map(_._2).sum == errs)
  }

  test("asof tolerance: surviving matches are fresh, others nulled") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.asofTolerance(spark, sf)
    val bad = r.filter($"asof_ts".isNotNull &&
      (unix_timestamp($"ts_s") - unix_timestamp($"asof_ts") > 3600L))
      .count()
    assert(bad == 0)
    // the bound genuinely drops some matches vs the unbounded probe
    val unbounded = graft.queries.CoreQueries.asofJoin(spark, sf)
      .filter($"asof_ts".isNotNull).count()
    val bounded = r.filter($"asof_ts".isNotNull).count()
    assert(bounded < unbounded)
  }

  test("weighted jaccard: clones score 1, universal boilerplate scores ~0") {
    // docs 1/2: identical. docs 3/4: overlap ONLY in the boilerplate
    // block every doc carries — plain jaccard is high, idf-weighted
    // collapses because df=N grams have idf ln((N+1)/(N+1)) = 0
    val boiler = (1 to 40).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler unique alpha beta gamma"),
      (2L, s"$boiler unique alpha beta gamma"),
      (3L, s"$boiler three own words here"),
      (4L, s"$boiler four distinct tail tokens")
    ).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.weightedJaccardPairs(docs, "doc_id", "text",
        tau = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r((1L, 2L)) == 1.0)
    assert(r.values.forall(v => v >= 0.0 && v <= 1.0))
    // the boilerplate-only pair survives candidacy but scores low —
    // far below its ~0.8 unweighted set jaccard
    r.get((3L, 4L)).foreach(v => assert(v < 0.2, s"(3,4) scored $v"))
  }

  test("exact source overlap grounds the kmv sketch estimates") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
    val srcs = docs.select("source").distinct().as[String]
      .collect().sorted.take(3).toSeq
    val exact = graft.text.TextOps.sourceOverlapExact(docs, srcs)
      .select("source_a", "source_b", "n_inter", "n_union")
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    val est = graft.text.TextOps.sourceOverlapKmv(docs, srcs)
      .select("source_a", "source_b", "est_union4", "est_inter4")
      .as[(String, String, Double, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(exact.nonEmpty && exact.keySet == est.keySet)
    exact.foreach { case (pair, (inter, union)) =>
      assert(inter <= union)
      val (eu, _) = est(pair)
      // deterministic data => fixed estimates; k=64 lands well inside
      // this bound (sigma ~ 13%)
      assert(math.abs(eu - union) / union.toDouble < 0.4,
        s"$pair: est_union $eu vs exact $union")
    }
  }

  test("market share is a [0,1] ratio per distinct year") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.CoreQueries.marketShare(spark, sf)
      .as[(Long, Double)].collect()
    assert(r.nonEmpty)
    assert(r.map(_._1).distinct.length == r.length)
    assert(r.forall(t => t._2 >= 0.0 && t._2 <= 1.0))
  }
}
