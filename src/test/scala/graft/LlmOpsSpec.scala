package graft

import graft.ann.Ann
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit specs for the LLM-data-pipeline operator families (dedup,
  * similarity, multimodal, text analysis). Each family also has a
  * DuckDB-oracle query entry; these specs cover the semantic properties
  * the oracle can't see (plan shape, invariance, determinism). */
class LlmOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // doc 2 is a 1-word mutation of doc 1 (Jaccard 0.78); the md5 minhash
  // pipeline is fully deterministic, and this pair's band keys verifiably
  // collide (checked against an independent reimplementation) while the
  // unrelated docs' don't.
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank while birds sing in the tall green trees above the quiet meadow path", "en"),
    (2L, "the quick brown fox jumps over the lazy cat near the river bank while birds sing in the tall green trees above the quiet meadow path", "en"),
    (3L, "completely different text about spark partitions and shuffle behavior here today", "en"),
    (4L, "le renard brun rapide saute par dessus le chien paresseux pres de la riviere", "fr"),
  ).toDF("doc_id", "text", "lang")

  // ---- dedup ---------------------------------------------------------

  test("minhashNearDups finds the planted near-dup pair and nothing else") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash candidate generation is a bucket equi-join, not a cross join") {
    val sh = Dedup.withHashedShingles(docs, "doc_id", "text", n = 3)
    val plan = Dedup.lshCandidates(sh, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"plan must not cross-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), s"plan must equi-join:\n$plan")
  }

  test("exactDupGroups collapses identical texts") {
    val dup = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 100))
    val groups = Dedup.exactDupGroups(dup, "doc_id", "text")
    assert(groups.count() == 4)
    assert(groups.agg(sum("n_copies")).as[Long].head() == 8)
    // keeper is min id
    assert(groups.agg(max("keeper_id")).as[Long].head() <= 4L)
  }

  test("ngramJaccardPairs blocks by lang: cross-lang pairs never compared") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", tau = 0.0)
    val langs = pairs.select("lang").as[String].collect().toSet
    assert(!pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
      .exists { case (a, b) => (a == 4L) != (b == 4L) })
    assert(langs.subsetOf(Set("en", "fr")))
  }

  // ---- similarity search ---------------------------------------------

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0),  // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val top = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), "vec_id",
        "embedding", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(top == Seq(2L, 3L)) // cos(1,2)≈0.995; cos(1,3)=0; cos(1,4)=0 → id tiebreak
  }

  test("ivfTopK only searches the query's own cell") {
    val top = Ann.ivfTopK(vecs, vecs.filter($"vec_id" === 3), "vec_id",
      "embedding", "label", k = 3)
    val neighbors = top.select("neighbor_id").as[Long].collect().toSet
    assert(neighbors == Set(4L)) // only label-1 vectors scanned
  }

  test("cellCentroids is the element-wise per-cell mean") {
    val c = Ann.cellCentroids(vecs, "embedding", "label")
      .filter($"cell" === 0 && $"pos" === 0).select("c5").as[Double].head()
    assert(math.abs(c - 0.995) < 1e-9) // mean(1.0, 0.99)
    assert(Ann.cellCentroids(vecs, "embedding", "label").count() == 8) // 2 cells x 4 dims
  }

  test("ivfComputedTopK routes a query to its nearest representative's cell") {
    // reps: cell 0 -> vec 1 ([1,0,0,0]), cell 1 -> vec 3 ([0,1,0,0]).
    // query vec 4 = [0,0,1,0]: cos 0 to both reps -> tie broken to cell 0,
    // so its neighbors can only come from cell 0's members {1, 2}
    val out = Ann.ivfComputedTopK(vecs, vecs.filter($"vec_id" === 4),
      "vec_id", "embedding", "label", k = 3)
    assert(out.select("cell").as[Int].collect().toSet == Set(0))
    assert(out.select("neighbor_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("lshBucketPairs is a bucket equi-join and buckets deterministically") {
    val df = Ann.lshBucketPairs(vecs, "vec_id", "embedding", nBits = 2, tau = -1.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"bucketed pairs must be an equi-join:\n$plan")
    // same-bucket requirement: (1,2) share bucket (e1>e2 same, e3>e4 same)
    val pairs = df.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  // ---- text analysis -------------------------------------------------

  test("tokenStats computes exact integer-derived ratios") {
    val r = TextOps.tokenStats(docs.withColumn("source", lit("s")))
      .filter($"doc_id" === 1).head()
    assert(r.getAs[Long]("n_tokens") == 26L)
    assert(r.getAs[Long]("n_distinct") == 22L) // 'the' x5
    assert(math.abs(r.getAs[Double]("ttr") - 22.0 / 26.0) < 1e-15)
  }

  test("rollingFingerprint is order-sensitive; simhash is near-dup tolerant") {
    val fps = TextOps.fingerprints(docs)
      .select("doc_id", "rolling_fp", "simhash")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // near-dups (1,2): different rolling fp, close simhash
    assert(fps(1L)._1 != fps(2L)._1)
    val hamming = java.lang.Long.bitCount(fps(1L)._2 ^ fps(2L)._2)
    val hammingFar = java.lang.Long.bitCount(fps(1L)._2 ^ fps(3L)._2)
    assert(hamming <= hammingFar,
      s"near-dup hamming $hamming should be <= unrelated $hammingFar")
    // swapped word order changes the rolling fp
    val swapped = Seq((9L, "quick the brown fox")).toDF("doc_id", "text")
    val orig = Seq((9L, "the quick brown fox")).toDF("doc_id", "text")
    val a = TextOps.fingerprints(swapped).select("rolling_fp").as[Long].head()
    val b = TextOps.fingerprints(orig).select("rolling_fp").as[Long].head()
    assert(a != b)
  }

  test("lengthQuantiles interpolates exactly like quantile_cont") {
    val d = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "en", 40L),
      (4L, "en", 80L)).toDF("doc_id", "lang", "n_chars")
    val r = TextOps.lengthQuantiles(d).head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Double]("p50_chars") == 30.0)   // (20+40)/2
    assert(r.getAs[Double]("p95_chars") == 74.0)   // 40 + 0.85*(80-40)
  }

  test("langId picks a deterministic argmax per doc") {
    val out = TextOps.langId(docs, Seq("en", "fr", "de"))
    assert(out.count() == 4) // exactly one prediction per doc
    assert(out.select("predicted_lang").as[String].collect()
      .forall(Set("en", "fr", "de")))
  }

  // ---- multimodal ----------------------------------------------------

  test("sampleFrames covers the payload with overlapping frames, no shuffle") {
    val d = Seq((1L, "a" * 100, "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.sampleFrames(d, width = 64, stride = 48)
    // ceil(100/48)=3 frames: [1,64],[49,100],[97,100]
    assert(frames.count() == 3)
    val lens = frames.orderBy("frame_no").select("frame_len").as[Long].collect().toSeq
    assert(lens == Seq(64L, 52L, 4L))
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }

  // ---- mock booking feed (G1) ---------------------------------------

  test("MockBookings: distributions match the reference generator spec") {
    import graft.sources.MockBookings
    val docs = MockBookings.generate(spark, 2000L)
    val stats = docs.agg(
      min("customer_id"), max("customer_id"),
      min("amount"), max("amount"),
      countDistinct("currency"), countDistinct("booking_id")).head()
    assert(stats.getLong(0) >= 1L && stats.getLong(1) <= 100L)
    assert(stats.getDouble(2) >= 50.0 && stats.getDouble(3) < 1000.0)
    assert(stats.getLong(4) == 4L && stats.getLong(5) == 2000L)
    // nested struct is a real StructType, not a JSON string
    assert(docs.schema("property_location").dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType])
    // deterministic: regeneration is identical
    assert(MockBookings.generate(spark, 50L).collect().toSeq
      == MockBookings.generate(spark, 50L).collect().toSeq)
  }

  test("MockBookings.stream emits byte-identical docs to the batch generator") {
    import graft.sources.MockBookings
    val q = MockBookings.stream(spark, rowsPerBatch = 25)
      .writeStream.format("memory").queryName("mock_stream")
      .outputMode("append").start()
    try {
      // the rate source is unbounded (processAllAvailable would never
      // return) — poll until the first batch lands
      val deadline = System.currentTimeMillis() + 120000
      while (spark.table("mock_stream").count() < 25
        && System.currentTimeMillis() < deadline) Thread.sleep(200)
      val streamed = spark.table("mock_stream")
      // names+types must match; nullability differs only because the
      // rate source's value column is nullable where range's id is not
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(f => (f.name, f.dataType.sql)).toSeq
      assert(shape(streamed.schema)
        == shape(MockBookings.generate(spark, 1L).schema))
      val n = streamed.count()
      assert(n >= 25, s"expected at least one 25-row batch, got $n")
      // determinism: the first batch (ids 0-24) must be byte-identical
      // to the batch generator's rows 0-24; set-inclusion because the
      // live stream keeps appending while we assert
      val got = streamed.collect().toSet
      val expected = MockBookings.generate(spark, 25L).collect().toSet
      assert(expected.subsetOf(got),
        s"missing: ${expected.diff(got).take(3)}")
    } finally q.stop()
  }

  test("MockBookings.dataflow: quality gate + ms stay_duration + struct flatten") {
    import graft.sources.MockBookings
    val out = MockBookings.dataflow(MockBookings.generate(spark, 2000L))
    val durs = out.select("stay_duration").as[Long].collect()
    assert(durs.forall(d => d >= 1 && d <= 14), "post-gate stays are 1..14 nights")
    // bad rows (~1/15) were routed out by the T1 gate
    assert(out.count() < 2000 && out.count() > 1700)
    val row = out.head()
    assert(row.getAs[String]("full_address")
      == row.getAs[String]("city") + ", " + row.getAs[String]("country"))
  }

  test("decodeStub: deterministic features, schema and partitioning preserved") {
    val d = docs.withColumn("source", lit("s")).repartition(3)
    val decoded = Multimodal.decodeStub(Multimodal.withBinaryPayload(d))
    assert(decoded.schema == Multimodal.decodedSchema)
    assert(decoded.rdd.getNumPartitions == 3) // mapPartitions preserves partitioning
    val f1 = decoded.filter($"doc_id" === 1).select("features")
      .as[Seq[Double]].head()
    val f2 = decoded.filter($"doc_id" === 1).select("features")
      .as[Seq[Double]].head()
    assert(f1 == f2 && f1.length == 16)
    assert(math.abs(f1.sum - 1.0) < 1e-9) // L1-normalized histogram
  }
}
