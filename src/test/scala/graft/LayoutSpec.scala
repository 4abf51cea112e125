package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Storage-layout levers that decide 100 TB scan cost: partition
  * pruning, predicate pushdown, and column pruning — asserted on the
  * actual FileScan, not assumed. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("date-partitioned writes prune to the single touched partition") {
    val dir = Files.createTempDirectory("graft-layout-").toString
    (1 to 1000).map(i => (i.toLong, s"2024-01-${"%02d".format(i % 10 + 1)}", i * 1.0))
      .toDF("event_id", "event_date", "value")
      .repartition(1)
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter($"event_date" === "2024-01-05")
      .select("event_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date")
      || plan.contains("PartitionFilters: [(event_date"),
      s"want a partition filter at the scan:\n$plan")
    // the scan must actually touch ONE partition directory
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.length == 1 && files.head.contains("event_date=2024-01-05"),
      s"expected one pruned partition, got ${files.toSeq}")
  }

  test("data filters push to parquet and projection prunes columns") {
    val dir = Files.createTempDirectory("graft-layout-").toString
    (1 to 1000).map(i => (i.toLong, s"tag$i", i * 1.0, s"pad$i"))
      .toDF("id", "tag", "value", "padding")
      .write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .filter($"id" > 900).select("id", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,900)"),
      s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,value:double>"),
      s"scan must read only projected columns:\n$plan")
  }

  test("dynamic partition pruning fires when the prune key arrives via a join") {
    // the 100 TB pattern: fact partitioned by a dim-derived key, filter
    // on the DIM side only — static pruning can't see it, DPP injects a
    // runtime subquery filter into the fact scan
    val dir = Files.createTempDirectory("graft-dpp-").toString
    (1 to 2000).map(i => (i.toLong, s"P${i % 8}", i * 1.0))
      .toDF("id", "pkey", "value")
      .repartition(1)
      .write.mode("overwrite").partitionBy("pkey").parquet(dir)
    // the dim must live on disk: a filtered LocalRelation constant-folds
    // (ConvertToLocalRelation) and leaves no Filter node for the DPP
    // rule's selective-predicate check
    val dimDir = Files.createTempDirectory("graft-dpp-dim-").toString
    (0 until 8).map(i => (s"P$i", s"name$i")).toDF("pkey", "name")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "true")
      val q = spark.read.parquet(dir)
        .join(dim.filter($"name" === "name3"), "pkey")
        .select("id", "value", "name")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a DPP subquery in the fact scan:\n$plan")
      // and it actually prunes: the fact scan reads 1 of the 8
      // partition files (scan metrics, post-execution)
      val rows = q.collect()
      assert(rows.nonEmpty && rows.forall(_.getString(2) == "name3"))
      // unwrap AQE + query stages: both hide their subtrees from collect
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case qs: QueryStageExec => allScans(qs.plan)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          (other.children ++ other.subqueries).flatMap(allScans)
      }
      val scans = allScans(q.queryExecution.executedPlan)
        .filter(_.schema.fieldNames.contains("id"))
      assert(scans.nonEmpty)
      assert(scans.head.metrics("numFiles").value == 1,
        s"expected 1 pruned file, got ${scans.head.metrics("numFiles").value}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("morton2 interleaves bits: dim A at even positions, dim B at odd") {
    import graft.sink.ZOrderLayout
    val rows = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (0b1011L, 0b0110L))
      .toDF("a", "b")
      .select(ZOrderLayout.morton2($"a", $"b").as("z"))
      .as[Long].collect()
    assert(rows(0) == 0x55555555L)  // all-A → even bit positions
    assert(rows(1) == 0xAAAAAAAAL)  // all-B → odd bit positions
    // a=1011, b=0110 → interleave(b3 a3 b2 a2 b1 a1 b0 a0) = 01101101
    assert(rows(2) == 0x6DL, s"got ${rows(2).toBinaryString}")
  }

  test("z-order box scan equals the plain filter and skips files") {
    import graft.sink.ZOrderLayout
    val dir = Files.createTempDirectory("graft-zspec-").toString + "/t"
    // 64×64 grid of (x, y) points — every box is predictable
    val df = (0 until 4096).map { i => (i.toLong, (i % 64).toLong, (i / 64).toDouble) }
      .toDF("id", "x", "y")
    ZOrderLayout.zorderWrite(df, "x", "y", dir, nFiles = 16)
    val mf = ZOrderLayout.manifest(spark, dir, "x", "y")
    assert(mf.count() == 16L)
    // small box in one corner: most files' stats boxes must miss it
    val surviving = ZOrderLayout.survivingFiles(mf, 0L, 7L, 0.0, 7.0)
    assert(surviving.nonEmpty && surviving.size <= 4,
      s"z-order clustering should confine an 8x8 corner box to <=4 of 16 files, got ${surviving.size}")
    // and pruning is semantically invisible
    val pruned = ZOrderLayout.prunedBoxScan(spark, dir, "x", "y", 10L, 30L, 5.0, 45.0)
      .select("id").as[Long].collect().sorted
    val full = df.filter($"x".between(10, 30) && $"y".between(5.0, 45.0))
      .select("id").as[Long].collect().sorted
    assert(pruned.sameElements(full))
    // empty box → zero rows, no crash
    assert(ZOrderLayout.prunedBoxScan(spark, dir, "x", "y", 100L, 200L, 0.0, 1.0).count() == 0L)
  }

  test("pruned box scan reads the write-time manifest sidecar, never the table") {
    import graft.sink.ZOrderLayout
    val dir = Files.createTempDirectory("graft-zmf-").toString + "/t"
    val df = (0 until 4096).map { i => (i.toLong, (i % 64).toLong, (i / 64).toDouble) }
      .toDF("id", "x", "y")
    ZOrderLayout.zorderWrite(df, "x", "y", dir, nFiles = 16)
    // the write left a sidecar …
    assert(Files.exists(java.nio.file.Paths.get(dir, "_manifest")),
      "zorderWrite must persist the manifest sidecar")
    // … and manifestN serves it: the manifest READ touches only
    // _manifest files — zero data files — so deciding what to skip
    // costs metadata, not a table scan
    val mf = ZOrderLayout.manifestN(spark, dir, Seq("x", "y"))
    val mfFiles = mf.inputFiles
    assert(mfFiles.nonEmpty && mfFiles.forall(_.contains("/_manifest/")),
      s"manifest must come from the sidecar, got ${mfFiles.toSeq}")
    // the pruned query's FileScan lists ONLY the surviving data files
    val surviving = ZOrderLayout.survivingFilesN(mf,
      Seq(("x", lit(0L), lit(7L)), ("y", lit(0.0), lit(7.0)))).toSet
    assert(surviving.nonEmpty && surviving.size < 16)
    val pruned = ZOrderLayout.prunedBoxScanN(spark, dir,
      Seq(("x", lit(0L), lit(7L)), ("y", lit(0.0), lit(7.0))))
    val scanned = pruned.inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).getName).toSet
    val survivingNames = surviving.map(f =>
      new org.apache.hadoop.fs.Path(f).getName)
    assert(scanned == survivingNames,
      s"pruned scan must read exactly the surviving files: $scanned vs $survivingNames")
  }

  test("stale sidecar (data rewritten behind it) falls back to recompute, stays exact") {
    import graft.sink.ZOrderLayout
    val dir = Files.createTempDirectory("graft-zstale-").toString + "/t"
    val df = (0 until 1024).map { i => (i.toLong, (i % 32).toLong, (i / 32).toDouble) }
      .toDF("id", "x", "y")
    ZOrderLayout.zorderWrite(df, "x", "y", dir, nFiles = 8)
    // rewrite the DATA without touching the sidecar — a foreign writer
    val grown = (0 until 2048).map { i => (i.toLong, (i % 32).toLong, (i / 32).toDouble) }
      .toDF("id", "x", "y")
    grown.repartition(4).write.mode("overwrite").parquet(dir + "_new")
    // move new data files in, delete old ones (sidecar now stale)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.delete(s.getPath, false))
    fs.listStatus(new org.apache.hadoop.fs.Path(dir + "_new")).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(dir, s.getPath.getName)))
    // the manifest detects the stale listing and recomputes — the
    // pruned scan still equals the plain filter on the NEW data
    val got = ZOrderLayout.prunedBoxScanN(spark, dir,
        Seq(("x", lit(0L), lit(5L)), ("y", lit(0.0), lit(10.0))))
      .select("id").as[Long].collect().sorted
    val want = grown.filter($"x".between(0, 5) && $"y".between(0.0, 10.0))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want), "stale-sidecar fallback diverged")
  }

  test("unreadable sidecar (crashed mid-write) degrades to recompute, not failure") {
    import graft.sink.ZOrderLayout
    val dir = Files.createTempDirectory("graft-zbad-").toString + "/t"
    val df = (0 until 512).map { i => (i.toLong, (i % 16).toLong, (i / 16).toDouble) }
      .toDF("id", "x", "y")
    ZOrderLayout.zorderWrite(df, "x", "y", dir, nFiles = 4)
    // clobber the sidecar with junk a parquet reader rejects
    val mdir = java.nio.file.Paths.get(dir, "_manifest")
    Files.list(mdir).forEach(p => Files.deleteIfExists(p))
    Files.writeString(mdir.resolve("part-00000.parquet"), "not parquet")
    val got = ZOrderLayout.prunedBoxScanN(spark, dir,
        Seq(("x", lit(0L), lit(5L)), ("y", lit(0.0), lit(10.0))))
      .select("id").as[Long].collect().sorted
    val want = df.filter($"x".between(0, 5) && $"y".between(0.0, 10.0))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want), "corrupt-sidecar fallback diverged")
  }

  test("N-dim z-order: double x double x long box scan equals the plain filter") {
    import graft.sink.ZOrderLayout
    val dir = Files.createTempDirectory("graft-z3d-").toString + "/t"
    // 16x16x16 lattice — two double dims and a long dim
    val df = (0 until 4096).map { i =>
      (i.toLong, (i % 16).toDouble, ((i / 16) % 16).toDouble, (i / 256).toLong)
    }.toDF("id", "a", "b", "c")
    ZOrderLayout.zorderWriteRankedN(df, Seq("a", "b", "c"), dir,
      nFiles = 16, buckets = 16)
    val box = Seq(
      ("a", lit(0.0), lit(3.0)),
      ("b", lit(0.0), lit(3.0)),
      ("c", lit(0L), lit(3L)))
    // a corner box in 3-space must skip most of the 16 files
    val surviving = ZOrderLayout.survivingFilesN(
      ZOrderLayout.manifestN(spark, dir, Seq("a", "b", "c")), box)
    assert(surviving.nonEmpty && surviving.size <= 6,
      s"3-dim corner box should prune most of 16 files, got ${surviving.size}")
    val got = ZOrderLayout.prunedBoxScanN(spark, dir, box)
      .select("id").as[Long].collect().sorted
    val want = df.filter($"a".between(0.0, 3.0) && $"b".between(0.0, 3.0)
        && $"c".between(0L, 3L))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("zorderCompact: value-neutral, time-travel preserved, pruned reads skip files") {
    import graft.sink.{AtomicParquetSink, Compaction, ZOrderLayout}
    val table = Files.createTempDirectory("graft-zcmp-").toString + "/t"
    val df = (0 until 4096).map { i => (i.toLong, (i % 64).toLong, (i / 64).toDouble) }
      .toDF("id", "x", "y")
    // fragmented initial commit: 16 unclustered files
    AtomicParquetSink.overwrite(df.repartition(16), table)
    val v0 = AtomicParquetSink.versions(spark, table).head
    val vdir = Compaction.zorderCompact(spark, table, Seq("x", "y"),
      nFiles = 16, buckets = 64)
    // value-neutral: current snapshot has exactly the original rows
    val after = AtomicParquetSink.read(spark, table).get
      .select("id").as[Long].collect().sorted
    assert(after.sameElements(Array.tabulate(4096)(_.toLong)))
    // time travel: the pre-compaction snapshot is still readable
    assert(AtomicParquetSink.versions(spark, table).size >= 2)
    assert(AtomicParquetSink.readVersion(spark, table, v0).count() == 4096L)
    // the compacted version carries a write-time manifest and a corner
    // box skips most files (the fragmented layout could skip none)
    val mf = ZOrderLayout.manifestN(spark, vdir, Seq("x", "y"))
    assert(mf.inputFiles.forall(_.contains("/_manifest/")))
    val surviving = ZOrderLayout.survivingFilesN(mf,
      Seq(("x", lit(0L), lit(7L)), ("y", lit(0.0), lit(7.0))))
    assert(surviving.nonEmpty && surviving.size <= 4,
      s"compacted 8x8 corner box should touch <=4 of 16 files, got ${surviving.size}")
    val got = ZOrderLayout.prunedBoxScanN(spark, vdir,
        Seq(("x", lit(10L), lit(30L)), ("y", lit(5.0), lit(45.0))))
      .select("id").as[Long].collect().sorted
    val want = df.filter($"x".between(10, 30) && $"y".between(5.0, 45.0))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("rank-bucket z-order stays selective under heavy value skew") {
    import graft.sink.ZOrderLayout
    val base = Files.createTempDirectory("graft-zskew-").toString
    // y = v³ for uniform v: half the rows live in the bottom 1/8 of the
    // value RANGE — a linear quantizer crams them into few cells
    val df = (0 until 4096).map { i =>
      val v = (i * 37) % 4096
      (i.toLong, (i % 64).toLong, v.toDouble * v * v)
    }.toDF("id", "x", "y")
    ZOrderLayout.zorderWrite(df, "x", "y", s"$base/lin", nFiles = 16)
    ZOrderLayout.zorderWriteRanked(df, "x", "y", s"$base/rank", nFiles = 16)
    // box over the dense head of y and a narrow x slice
    val (xLo, xHi, yLo, yHi) = (0L, 7L, 0.0, math.pow(512.0, 3))
    val linFiles = ZOrderLayout.survivingFiles(
      ZOrderLayout.manifest(spark, s"$base/lin", "x", "y"), xLo, xHi, yLo, yHi)
    val rankFiles = ZOrderLayout.survivingFiles(
      ZOrderLayout.manifest(spark, s"$base/rank", "x", "y"), xLo, xHi, yLo, yHi)
    assert(rankFiles.size <= linFiles.size,
      s"rank buckets should prune at least as hard under skew: rank=${rankFiles.size} lin=${linFiles.size}")
    assert(rankFiles.size < 16, s"ranked layout pruned nothing (${rankFiles.size}/16)")
    // both layouts return EXACTLY the plain filter
    val expect = df.filter($"x".between(xLo, xHi) && $"y".between(yLo, yHi))
      .select("id").as[Long].collect().sorted
    for (d <- Seq("lin", "rank")) {
      val got = ZOrderLayout.prunedBoxScan(spark, s"$base/$d", "x", "y", xLo, xHi, yLo, yHi)
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(expect), s"layout $d diverged from the plain filter")
    }
  }

  test("bloom sidecar skips files min/max stats cannot: hash-clustered point lookup") {
    import graft.sink.BloomSkipIndex
    val dir = Files.createTempDirectory("graft-bloom-").toString + "/t"
    // 256 keys × 16 rows each, hash-clustered into 16 files: every
    // file spans ~the whole key range (min/max stats prune nothing)
    // but holds only ~16 of the 256 key VALUES
    val df = (0 until 4096).map { i => (i.toLong, (i % 256).toLong) }
      .toDF("id", "k")
    BloomSkipIndex.bloomWrite(df, "k", dir, nFiles = 16)
    assert(Files.exists(java.nio.file.Paths.get(dir, "_bloom_k")),
      "bloomWrite must persist the bloom sidecar")
    // the bloom TABLE read touches only sidecar files — zero data
    val bt = BloomSkipIndex.bloomTable(spark, dir, "k")
    assert(bt.count() == 16L)
    assert(bt.inputFiles.nonEmpty && bt.inputFiles.forall(_.contains("/_bloom_k/")),
      s"bloom table must come from the sidecar, got ${bt.inputFiles.toSeq}")
    // a 2-value probe survives ≤ a handful of 16 files (each value
    // lives in exactly one hash partition; FPR adds at most a file or
    // two at n≈16, m=1024, k=4)
    val surviving = BloomSkipIndex.survivingFiles(
      spark, dir, "k", Seq(lit(7L), lit(200L)))
    assert(surviving.nonEmpty && surviving.size <= 4,
      s"bloom should confine a 2-value probe to <=4 of 16 files, got ${surviving.size}")
    // the pruned scan reads exactly the surviving files …
    val pruned = BloomSkipIndex.prunedPointScan(
      spark, dir, "k", Seq(lit(7L), lit(200L)))
    val scanned = pruned.inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).getName).toSet
    assert(scanned == surviving.map(f =>
      new org.apache.hadoop.fs.Path(f).getName).toSet)
    // … and is row-for-row the plain IN filter
    val got = pruned.select("id").as[Long].collect().sorted
    val want = df.filter($"k" === 7L || $"k" === 200L)
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want), "bloom pruning diverged from the plain filter")
    // absent value → typically zero files, always zero rows
    assert(BloomSkipIndex.prunedPointScan(
      spark, dir, "k", Seq(lit(9999L))).count() == 0L)
    // probe-literal WIDTH must not matter: an Int literal against the
    // Long key hashes identically (string-normalized), so it can never
    // silently skip a file that holds the value
    val gotInt = BloomSkipIndex.prunedPointScan(spark, dir, "k", Seq(lit(7)))
      .select("id").as[Long].collect().sorted
    val wantInt = df.filter($"k" === 7L).select("id").as[Long].collect().sorted
    assert(gotInt.sameElements(wantInt), "Int-typed probe diverged from Long")
  }

  test("zorderAppend: batch append folds the manifest, pruned reads stay exact") {
    import graft.sink.ZOrderLayout
    val dir = Files.createTempDirectory("graft-zapp-").toString + "/t"
    val df = (0 until 4096).map { i => (i.toLong, (i % 64).toLong, (i / 64).toDouble) }
      .toDF("id", "x", "y")
    ZOrderLayout.zorderWriteRankedN(df.filter($"id" % 2 === 0),
      Seq("x", "y"), dir, nFiles = 8, buckets = 32)
    ZOrderLayout.zorderAppendRankedN(df.filter($"id" % 2 =!= 0),
      Seq("x", "y"), dir, nFiles = 8, buckets = 32)
    // the folded sidecar covers the post-append listing, so the
    // manifest read still touches ZERO data files
    val mf = ZOrderLayout.manifestN(spark, dir, Seq("x", "y"))
    assert(mf.count() == 16L, "8 base + 8 appended files in the manifest")
    assert(mf.inputFiles.nonEmpty && mf.inputFiles.forall(_.contains("/_manifest/")),
      s"post-append manifest must come from the sidecar, got ${mf.inputFiles.toSeq}")
    // per-batch clustering still skips: a corner box misses most files
    val surviving = ZOrderLayout.survivingFilesN(mf,
      Seq(("x", lit(0L), lit(7L)), ("y", lit(0.0), lit(7.0))))
    assert(surviving.nonEmpty && surviving.size <= 8,
      s"appended layout should still skip most files, got ${surviving.size} of 16")
    // and pruning is semantically invisible over BOTH batches
    val got = ZOrderLayout.prunedBoxScanN(spark, dir,
        Seq(("x", lit(10L), lit(30L)), ("y", lit(5.0), lit(45.0))))
      .select("id").as[Long].collect().sorted
    val want = df.filter($"x".between(10, 30) && $"y".between(5.0, 45.0))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want), "appended-layout pruning diverged")
    // appending to a fresh dir degrades to a plain clustered write
    val fresh = Files.createTempDirectory("graft-zappf-").toString + "/t"
    ZOrderLayout.zorderAppendRankedN(df, Seq("x", "y"), fresh,
      nFiles = 4, buckets = 32)
    assert(ZOrderLayout.manifestN(spark, fresh, Seq("x", "y")).count() == 4L)
  }

  test("secondary bloom index: a non-clustered column prunes independently") {
    import graft.sink.BloomSkipIndex
    val dir = Files.createTempDirectory("graft-bloom2-").toString + "/t"
    // clustered on k (64 values × 64 rows), with id near-unique: every
    // id lives in exactly ONE of the 16 files even though the layout
    // hashes on k — set membership doesn't need the layout's help
    val df = (0 until 4096).map { i => (i.toLong, (i % 64).toLong) }
      .toDF("id", "k")
    BloomSkipIndex.bloomWrite(df, "k", dir, nFiles = 16)
    BloomSkipIndex.writeBloomSidecar(spark, dir, "id")
    // both sidecars coexist (per-column naming)
    assert(Files.exists(java.nio.file.Paths.get(dir, "_bloom_k")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "_bloom_id")))
    val bt = BloomSkipIndex.bloomTable(spark, dir, "id")
    assert(bt.inputFiles.nonEmpty && bt.inputFiles.forall(_.contains("/_bloom_id/")),
      s"id bloom table must come from its own sidecar, got ${bt.inputFiles.toSeq}")
    // a single-id fetch survives ~1 file of 16 (n≈256/file pushes the
    // per-file FPR to ~4% — allow a couple of false-positive files)
    val surviving = BloomSkipIndex.survivingFiles(
      spark, dir, "id", Seq(lit(1234L)))
    assert(surviving.nonEmpty && surviving.size <= 3,
      s"secondary index should confine an id fetch to <=3 of 16 files, got ${surviving.size}")
    val got = BloomSkipIndex.prunedPointScan(spark, dir, "id", Seq(lit(1234L)))
      .select("id", "k").as[(Long, Long)].collect().sorted
    val want = df.filter($"id" === 1234L)
      .select("id", "k").as[(Long, Long)].collect().sorted
    assert(got.sameElements(want), "secondary-index pruning diverged")
    // the cluster-key index still works beside it
    assert(BloomSkipIndex.prunedPointScan(spark, dir, "k", Seq(lit(7L)))
      .count() == 64L)
  }

  test("composite skip: manifest box ∩ bloom id prunes tighter than either") {
    import graft.sink.{BloomSkipIndex, CompositeSkip, ZOrderLayout}
    val dir = Files.createTempDirectory("graft-comp-").toString + "/t"
    // 64×64 lattice, id unique — z-ordered on (a, b) with a bloom
    // sidecar on id. Box = the a∈[0,15] quarter of the lattice
    // (≥4 of 16 files survive the manifest); one id → 1-2 bloom files.
    val df = (0 until 4096).map { i =>
      (i.toLong, (i / 64).toLong, (i % 64).toLong)
    }.toDF("id", "a", "b")
    ZOrderLayout.zorderWriteRankedN(df, Seq("a", "b"), dir,
      nFiles = 16, buckets = 32)
    BloomSkipIndex.writeBloomSidecar(spark, dir, "id")
    val box = Seq(("a", lit(0L), lit(15L)), ("b", lit(0L), lit(63L)))
    // id 500 → (a=7, b=52): inside the box, so the composite keeps
    // its file and the scan is non-empty
    val probe = Seq(lit(500L))
    val boxF = ZOrderLayout.survivingFilesN(
      ZOrderLayout.manifestN(spark, dir, Seq("a", "b")), box)
    val bloomF = BloomSkipIndex.survivingFiles(spark, dir, "id", probe)
    val comp = CompositeSkip.survivingFiles(spark, dir, box, "id", probe)
    assert(comp.nonEmpty && comp.size <= math.min(boxF.size, bloomF.size),
      s"intersection must be within both prune sets: comp=${comp.size} " +
        s"box=${boxF.size} bloom=${bloomF.size}")
    assert(comp.size < boxF.size,
      s"the bloom side must prune beyond the box alone " +
        s"(comp=${comp.size}, box=${boxF.size})")
    val got = CompositeSkip.prunedScan(spark, dir, box, "id", probe)
      .select("id", "a", "b").as[(Long, Long, Long)].collect().sorted
    val want = df.filter($"id" === 500L && $"a".between(0L, 15L))
      .select("id", "a", "b").as[(Long, Long, Long)].collect().sorted
    assert(got.sameElements(want), "composite pruning diverged")
    // an id OUTSIDE the box: both sides stay sound, zero rows
    assert(CompositeSkip.prunedScan(spark, dir, box,
      "id", Seq(lit(4000L))).count() == 0L)
  }

  test("bloom fold after append equals a full rebuild and stays fresh") {
    import graft.sink.BloomSkipIndex
    val dir = Files.createTempDirectory("graft-bfold-").toString + "/t"
    val df = (0 until 4096).map { i => (i.toLong, (i % 256).toLong) }
      .toDF("id", "k")
    BloomSkipIndex.bloomWrite(df.filter($"id" < 2048), "k", dir, nFiles = 8)
    // a SECOND per-column index on the same table: bloomAppend must
    // reconcile both sidecars, not just the cluster key's
    BloomSkipIndex.writeBloomSidecar(spark, dir, "id")
    BloomSkipIndex.bloomAppend(df.filter($"id" >= 2048), "k", dir,
      nFiles = 8)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      (new java.io.File(r.getString(0).stripPrefix("file:")).getName,
        (1 until r.length).map(r.getLong).toSeq)
    }.toSet
    // folded sidecar ≡ full rebuild, row for row
    val folded = rows(BloomSkipIndex.bloomTable(spark, dir, "k"))
    val rebuilt = rows(BloomSkipIndex.computeBloom(spark, dir, "k"))
    assert(folded == rebuilt, "folded sidecar diverged from full rebuild")
    // ...and it is served FROM the sidecar (fresh again after the fold)
    val bt = BloomSkipIndex.bloomTable(spark, dir, "k")
    assert(bt.inputFiles.nonEmpty &&
      bt.inputFiles.forall(_.contains("/_bloom_k/")),
      s"folded sidecar must serve reads, got ${bt.inputFiles.toSeq}")
    // a second fold with nothing appended is a no-op (still fresh)
    BloomSkipIndex.foldBloomSidecar(spark, dir, "k")
    assert(rows(BloomSkipIndex.bloomTable(spark, dir, "k")) == rebuilt)
    // the secondary index was folded by the same append call
    val bid = BloomSkipIndex.bloomTable(spark, dir, "id")
    assert(bid.inputFiles.nonEmpty &&
      bid.inputFiles.forall(_.contains("/_bloom_id/")),
      s"secondary sidecar must also be fresh, got ${bid.inputFiles.toSeq}")
    assert(rows(bid) == rows(BloomSkipIndex.computeBloom(spark, dir, "id")))
    // an id from the APPENDED half is found through the folded index
    assert(BloomSkipIndex.prunedPointScan(spark, dir, "id",
      Seq(lit(3000L))).count() == 1L)
    // probes through the folded index stay exact across both halves
    val got = BloomSkipIndex.prunedPointScan(spark, dir, "k",
        Seq(lit(7L), lit(200L)))
      .select("id", "k").as[(Long, Long)].collect().sorted
    val want = df.filter($"k" === 7L || $"k" === 200L)
      .select("id", "k").as[(Long, Long)].collect().sorted
    assert(got.sameElements(want), "folded-index probe diverged")
  }

  test("stream-indexed layout: replayed batch is a no-op, sidecars stay live") {
    import graft.sink.{BloomSkipIndex, CompositeSkip, ZOrderLayout}
    import graft.streaming.StreamIndexedLayout
    val dir = Files.createTempDirectory("graft-sidx-").toString + "/t"
    val df = (0 until 4096).map { i =>
      (i.toLong, (i / 64).toLong, (i % 64).toLong)
    }.toDF("id", "a", "b")
    val b0 = df.filter($"id" < 2048)
    val b1 = df.filter($"id" >= 2048)
    def append(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamIndexedLayout.appendBatch(spark, dir, b, id,
        Seq("a", "b"), "id", nFiles = 8, buckets = 32)
    append(b0, 0)
    // REPLAY of batch 0 (checkpoint rollback): the fence makes it a no-op
    append(b0, 0)
    assert(spark.read.parquet(dir).count() == 2048L,
      "replayed batch must not duplicate rows")
    append(b1, 1)
    assert(spark.read.parquet(dir).count() == 4096L)
    // both sidecars are live after per-batch folds: served, not rescanned
    val mf = ZOrderLayout.manifestN(spark, dir, Seq("a", "b"))
    assert(mf.inputFiles.nonEmpty && mf.inputFiles.forall(_.contains("/_manifest/")),
      s"manifest must serve from its sidecar, got ${mf.inputFiles.toSeq}")
    val bt = BloomSkipIndex.bloomTable(spark, dir, "id")
    assert(bt.inputFiles.nonEmpty && bt.inputFiles.forall(_.contains("/_bloom_id/")),
      s"bloom must serve from its sidecar, got ${bt.inputFiles.toSeq}")
    // the composite query over the streamed table equals the plain filter
    val box = Seq(("a", lit(0L), lit(15L)), ("b", lit(0L), lit(63L)))
    val got = CompositeSkip.prunedScan(spark, dir, box, "id",
        Seq(lit(500L), lit(3000L)))
      .select("id", "a", "b").as[(Long, Long, Long)].collect().sorted
    val want = df.filter(($"id" === 500L || $"id" === 3000L) &&
        $"a".between(0L, 15L))
      .select("id", "a", "b").as[(Long, Long, Long)].collect().sorted
    assert(got.sameElements(want), "streamed composite scan diverged")
  }

  test("stale bloom sidecar falls back to recompute and stays exact") {
    import graft.sink.BloomSkipIndex
    val dir = Files.createTempDirectory("graft-bstale-").toString + "/t"
    val df = (0 until 1024).map { i => (i.toLong, (i % 64).toLong) }.toDF("id", "k")
    BloomSkipIndex.bloomWrite(df, "k", dir, nFiles = 8)
    // foreign rewrite: new data, sidecar untouched → name-set mismatch
    val grown = (0 until 2048).map { i => (i.toLong, (i % 64).toLong) }.toDF("id", "k")
    grown.repartition(4, col("k")).write.mode("overwrite").parquet(dir + "_new")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.delete(s.getPath, false))
    fs.listStatus(new org.apache.hadoop.fs.Path(dir + "_new")).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(dir, s.getPath.getName)))
    val got = BloomSkipIndex.prunedPointScan(spark, dir, "k", Seq(lit(3L)))
      .select("id").as[Long].collect().sorted
    val want = grown.filter($"k" === 3L).select("id").as[Long].collect().sorted
    assert(got.sameElements(want), "stale bloom fallback diverged")
  }
}
