package graft

import graft.search.Search
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Specs for the round-7 additions — invariants the row oracle can't
  * see: the persisted posting index's partition-pruned read path, and
  * the native as-of join's loud rejection of a non-unique right side. */
class Round7Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- persisted-index phrase search --------------------------------

  private def phraseDocs = Seq(
    (1L, "a b a b a b"),
    (2L, "a a b a"),
    (3L, "b a b"),
    (4L, "x y z"),
  ).toDF("doc_id", "text")

  test("phraseSearchIndexed matches phraseSearch exactly (incl. overlaps)") {
    val dir = Files.createTempDirectory("graft-pidx-").toString + "/p"
    Search.buildPostings(phraseDocs, "doc_id", "text", dir, nBuckets = 8)
    for (phrase <- Seq(Seq("a", "b", "a"), Seq("b"), Seq("a", "b"))) {
      val inline = Search.phraseSearch(phraseDocs, "doc_id", "text", phrase)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val indexed = Search.phraseSearchIndexed(spark, dir, phrase, nBuckets = 8)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(indexed == inline, s"phrase $phrase diverged: $indexed vs $inline")
    }
  }

  test("indexed phrase read prunes to the phrase terms' index partitions") {
    val dir = Files.createTempDirectory("graft-pidx-").toString + "/p"
    Search.buildPostings(phraseDocs, "doc_id", "text", dir, nBuckets = 8)
    val q = Search.phraseSearchIndexed(spark, dir, Seq("a", "b"), nBuckets = 8)
    q.collect()  // metrics fill post-execution
    // each term's posting scan must read exactly ONE tok_bucket
    // partition of the 8 — the whole point of the persisted index is
    // reading ≤ m of the nBuckets partitions per phrase query
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case qs: QueryStageExec => allScans(qs.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => (other.children ++ other.subqueries).flatMap(allScans)
    }
    val scans = allScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    scans.foreach { sc =>
      assert(sc.metrics.contains("numPartitions")
          && sc.metrics("numPartitions").value <= 1,
        s"each posting scan must read one pruned bucket partition, got " +
          s"${sc.metrics.get("numPartitions").map(_.value)} in:\n$sc")
    }
    // and the plan carries partition filters on the partition column
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tok_bucket"),
      s"expected tok_bucket partition filters at the scan:\n$plan")
  }

  test("appendPostings: incrementally built index equals a full rebuild") {
    val base = Files.createTempDirectory("graft-pinc-").toString
    val inc = s"$base/inc"
    val full = s"$base/full"
    Search.buildPostings(phraseDocs.filter($"doc_id" <= 2), "doc_id", "text",
      inc, nBuckets = 8)
    Search.appendPostings(phraseDocs.filter($"doc_id" > 2), "doc_id", "text",
      inc, nBuckets = 8)
    Search.buildPostings(phraseDocs, "doc_id", "text", full, nBuckets = 8)
    for (phrase <- Seq(Seq("a", "b", "a"), Seq("b"))) {
      val a = Search.phraseSearchIndexed(spark, inc, phrase, nBuckets = 8)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val b = Search.phraseSearchIndexed(spark, full, phrase, nBuckets = 8)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(a == b, s"incremental index diverged for $phrase: $a vs $b")
    }
  }

  // ---- as-of right-side uniqueness enforcement ----------------------

  test("native as-of join fails loud on duplicate (key, time) right rows") {
    val left = Seq((1L, 10L, "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "ts_s")
    val dupRight = Seq(
      (10L, "2024-01-01 09:00:00", 1.0),
      (10L, "2024-01-01 09:00:00", 2.0),  // duplicate (key, time)
    ).toDF("r_uid", "asof_ts", "asof_v")
    val e = intercept[Throwable] {
      graft.plans.AsofJoinNative.asofLeft(left, dupRight,
        "user_id", "r_uid", "ts_s", "asof_ts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
        m != null && m.contains("unique per (key, time)")),
      s"expected the uniqueness error, got: $e")
  }

  test("native as-of join still accepts same time under different keys") {
    val left = Seq((1L, 10L, "2024-01-01 10:00:00"),
      (2L, 20L, "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "ts_s")
    val right = Seq(
      (10L, "2024-01-01 09:00:00", 1.0),
      (20L, "2024-01-01 09:00:00", 2.0),  // same time, different key: fine
    ).toDF("r_uid", "asof_ts", "asof_v")
    val got = graft.plans.AsofJoinNative.asofLeft(left, right,
        "user_id", "r_uid", "ts_s", "asof_ts")
      .select("event_id", "asof_v").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 2.0))
  }

  // ---- persisted IVF vector index ------------------------------------

  /** 40 vectors in 4 label cells; deterministic non-trivial geometry. */
  private lazy val ivfVecs = (0L until 40L).map { i =>
    (i, (i % 4).toInt, Array(
      math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat,
      ((i % 7) / 7.0).toFloat, 1.0f))
  }.toDF("vec_id", "label", "embedding")

  private def ivfRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"query_id", $"cell".cast("int"), $"rank", $"neighbor_id", $"cos5")
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq

  test("searchIndexed returns bit-identical rows to the inline routed IVF") {
    import graft.ann.{Ann, IvfIndex}
    val dir = Files.createTempDirectory("graft-ivfidx-").toString + "/ivf"
    IvfIndex.buildIndex(ivfVecs, "vec_id", "embedding", "label", dir)
    val queries = ivfVecs.filter($"vec_id" < 5)
    val indexed = ivfRows(
      IvfIndex.searchIndexed(spark, dir, queries, "vec_id", "embedding", k = 3))
    val inline = ivfRows(
      Ann.ivfComputedTopK(ivfVecs, queries, "vec_id", "embedding", "label", k = 3))
    assert(indexed.nonEmpty && indexed == inline,
      s"indexed IVF diverged from inline: $indexed vs $inline")
  }

  test("indexed IVF search reads only the probed cell partitions") {
    import graft.ann.IvfIndex
    val dir = Files.createTempDirectory("graft-ivfp-").toString + "/ivf"
    IvfIndex.buildIndex(ivfVecs, "vec_id", "embedding", "label", dir)
    // one query → exactly one probed cell
    val out = IvfIndex.searchIndexed(spark, dir,
      ivfVecs.filter($"vec_id" === 0L), "vec_id", "embedding", k = 3)
    out.collect()  // metrics fill post-execution
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case qs: QueryStageExec => allScans(qs.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => (other.children ++ other.subqueries).flatMap(allScans)
    }
    // the cell-partitioned vector scan (the one carrying the `cell`
    // partition column) must touch exactly ONE of the 4 partitions
    val vecScans = allScans(out.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.fieldNames.contains("cell"))
    assert(vecScans.nonEmpty, "expected a scan over the cell-partitioned table")
    vecScans.foreach { sc =>
      assert(sc.metrics.contains("numPartitions")
          && sc.metrics("numPartitions").value == 1,
        s"one-query search must read one cell partition, got " +
          s"${sc.metrics.get("numPartitions").map(_.value)} in:\n$sc")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition filters at the scan:\n$plan")
  }

  test("appendVectors: incrementally built IVF index equals a full rebuild") {
    import graft.ann.IvfIndex
    val base = Files.createTempDirectory("graft-ivfinc-").toString
    IvfIndex.buildIndex(ivfVecs.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", "label", s"$base/inc")
    IvfIndex.appendVectors(ivfVecs.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", "label", s"$base/inc")
    IvfIndex.buildIndex(ivfVecs, "vec_id", "embedding", "label", s"$base/full")
    val queries = ivfVecs.filter($"vec_id" < 5)
    val a = ivfRows(IvfIndex.searchIndexed(spark, s"$base/inc", queries,
      "vec_id", "embedding", k = 3))
    val b = ivfRows(IvfIndex.searchIndexed(spark, s"$base/full", queries,
      "vec_id", "embedding", k = 3))
    assert(a.nonEmpty && a == b, s"incremental IVF diverged: $a vs $b")
  }

  test("foreign write into an EXISTING cell is detected at file granularity") {
    import graft.ann.IvfIndex
    val dir = Files.createTempDirectory("graft-ivff-").toString + "/ivf"
    IvfIndex.buildIndex(ivfVecs.filter($"vec_id" >= 8),
      "vec_id", "embedding", "label", dir)
    // bypass appendVectors with vectors whose ids UNDERCUT the stored
    // reps, into cells that already exist: the cell set is unchanged,
    // so only the file-inventory stamp can catch the staleness — a
    // stale rep here would silently change every query's routing
    ivfVecs.filter($"vec_id" < 8)
      .select($"vec_id", $"label".cast("int").as("cell"),
        graft.ann.Ann.asDouble("embedding").as("v"))
      .write.mode("append").partitionBy("cell").parquet(dir)
    val queries = ivfVecs.filter($"vec_id" < 5)
    val got = ivfRows(IvfIndex.searchIndexed(spark, dir, queries,
      "vec_id", "embedding", k = 3))
    val want = ivfRows(graft.ann.Ann.ivfComputedTopK(ivfVecs, queries,
      "vec_id", "embedding", "label", k = 3))
    assert(got == want,
      "same-cell foreign append must fail the freshness stamp and recompute")
  }

  test("foreign write (new cell, stale reps sidecar) falls back to recompute") {
    import graft.ann.IvfIndex
    val dir = Files.createTempDirectory("graft-ivfstale-").toString + "/ivf"
    IvfIndex.buildIndex(ivfVecs.filter($"label" < 3),
      "vec_id", "embedding", "label", dir)
    // bypass appendVectors: write a 4th cell directly (sidecar now
    // lists 3 cells, the directory 4 → name-set mismatch → recompute)
    ivfVecs.filter($"label" === 3)
      .select($"vec_id", $"label".cast("int").as("cell"),
        graft.ann.Ann.asDouble("embedding").as("v"))
      .write.mode("append").partitionBy("cell").parquet(dir)
    val queries = ivfVecs.filter($"vec_id" < 5)
    val got = ivfRows(IvfIndex.searchIndexed(spark, dir, queries,
      "vec_id", "embedding", k = 3))
    val want = ivfRows(graft.ann.Ann.ivfComputedTopK(ivfVecs, queries,
      "vec_id", "embedding", "label", k = 3))
    assert(got == want, "stale-sidecar fallback diverged from inline IVF")
  }
}
