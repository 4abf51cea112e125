package graft

import graft.sink.{AtomicFiles, DeletionVectors, SchemaGuard}
import graft.streaming.{MorGoldStats, StreamMoR, StreamMorGold}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-10 specs: atomic metadata replace (no delete-then-rename
  * window), PQ append drift accounting, explicit legacy-marker
  * adoption for pre-tag MoR fences. */
class Round10Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---- atomic metadata replace -------------------------------------

  test("AtomicFiles.replace swaps content atomically over an existing file") {
    val work = tmp("graft-r10af-")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$work/meta.json")
    AtomicFiles.replace(conf, p, "one".getBytes("UTF-8"))
    assert(AtomicFiles.readString(conf, p) == "one")
    AtomicFiles.replace(conf, p, "two".getBytes("UTF-8"))
    assert(AtomicFiles.readString(conf, p) == "two")
    // no temp debris survives the swap
    val fs = p.getFileSystem(conf)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(work))
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp debris: ${leftovers.toSeq}")
  }

  test("writeSchema round-trips through the atomic swap; evolve still reads back") {
    val work = tmp("graft-r10sg-")
    val dir = s"$work/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir)
    DeletionVectors.evolveAppend(spark, dir,
      Seq((3L, "c", 7L)).toDF("id", "v", "extra"))
    val sc1 = SchemaGuard.storedSchema(spark, dir).get
    assert(sc1.fieldNames.toSeq == Seq("id", "v", "extra"))
    // a second evolve OVERWRITES the sidecar through the same swap
    DeletionVectors.evolveAppend(spark, dir,
      Seq((4L, "d", 8L, 0.5)).toDF("id", "v", "extra", "score"))
    val sc2 = SchemaGuard.storedSchema(spark, dir).get
    assert(sc2.fieldNames.toSeq == Seq("id", "v", "extra", "score"))
    assert(DeletionVectors.read(spark, dir).count() == 4)
  }

  // ---- type-widening evolution -------------------------------------

  test("widening evolves as metadata; narrowing and incompatible retypes stay loud") {
    val work = tmp("graft-r10w-")
    val dir = s"$work/t"
    Seq((1L, 10, 1.5f), (2L, 20, 2.5f)).toDF("id", "n", "x")
      .write.parquet(dir)
    // int→long AND float→double in one widened batch, plus values
    // past the narrow ranges
    DeletionVectors.evolveAppend(spark, dir,
      Seq((3L, 3000000000L, 1e300)).toDF("id", "n", "x"))
    val got = DeletionVectors.read(spark, dir).orderBy("id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10L, 1.5), (2L, 20L, 2.5),
      (3L, 3000000000L, 1e300)))
    // schema sidecar carries the widened types
    val sc = SchemaGuard.tableSchema(spark, dir)
    assert(sc("n").dataType == org.apache.spark.sql.types.LongType)
    assert(sc("x").dataType == org.apache.spark.sql.types.DoubleType)
    // a NARROWER later batch casts up, no schema change
    DeletionVectors.evolveAppend(spark, dir,
      Seq((4, 40, 4.5f)).toDF("id", "n", "x"))
    assert(DeletionVectors.read(spark, dir).count() == 4)
    assert(SchemaGuard.tableSchema(spark, dir)("id").dataType ==
      org.apache.spark.sql.types.LongType)
    // incompatible retype still fails loud
    val e = intercept[IllegalArgumentException] {
      DeletionVectors.evolveAppend(spark, dir,
        Seq(("5", 50L, 5.5)).toDF("id", "n", "x"))
    }
    assert(e.getMessage.contains("widening"))
    // deletes cut across both width generations
    DeletionVectors.deleteWhere(spark, dir, col("id") === 1L)
    assert(DeletionVectors.read(spark, dir).count() == 3)
  }

  test("a dropped column cannot resurrect under a widened type either") {
    val work = tmp("graft-r10wd-")
    val dir = s"$work/t"
    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("id", "n", "v")
      .write.parquet(dir)
    DeletionVectors.dropColumn(spark, dir, "n")
    // re-adding the dropped name as LONG (a widening of its stored
    // int) must still be rejected — the guard is on the NAME
    val e = intercept[IllegalArgumentException] {
      DeletionVectors.evolveAppend(spark, dir,
        Seq((3L, 30L, "c")).toDF("id", "n", "v"))
    }
    assert(e.getMessage.contains("DROPPED"))
  }

  // ---- PQ append drift accounting ----------------------------------

  test("PqIndex.append reports unseen cells for out-of-distribution vectors") {
    val work = tmp("graft-r10pq-")
    val dir = s"$work/idx"
    // training corpus: all-positive coordinates → every trained code
    // has all sign bits set; 16 dims, m=2 subspaces of 8 dims
    val train = (0 until 20).map { i =>
      (i.toLong, Array.fill(16)(1.0f + i * 0.01f))
    }.toDF("vec_id", "embedding")
    graft.ann.PqIndex.write(train, "embedding", "vec_id", dir, m = 2)
    // in-distribution append: same cells, zero unseen
    val inDist = Seq((100L, Array.fill(16)(2.0f)))
      .toDF("vec_id", "embedding")
    assert(graft.ann.PqIndex.append(spark, inDist, "embedding",
      "vec_id", dir, m = 2) == 0L)
    // out-of-distribution: alternating signs → a MIXED sign pattern;
    // the training vectors are constant per vector, so only the
    // all-bits-0 and all-bits-1 cells exist in the codebook
    val outDist = Seq((101L, Array.tabulate(16)(i =>
        if (i % 2 == 0) 10.0f else -10.0f)))
      .toDF("vec_id", "embedding")
    assert(graft.ann.PqIndex.append(spark, outDist, "embedding",
      "vec_id", dir, m = 2) == 2L)
    // the drifted vector still ranks (on 0-scored terms), never throws
    val q = Seq((999L, Array.fill(16)(1.5f))).toDF("vec_id", "embedding")
    val top = graft.ann.PqIndex.adcTopK(spark, dir, q, "embedding",
      "vec_id", m = 2, k = 5)
    assert(top.count() == 5)
  }

  // ---- container-header probe --------------------------------------

  test("graft_image_dims parses real container bytes; corrupt blobs yield NULL") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // a REAL 1×1 PNG (the canonical minimal transparent pixel) — an
    // external fixture, independent of both the builder and parser
    val realPng = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42m" +
        "NkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    // a JPEG marker stream whose SOF2 sits BEHIND a DQT segment —
    // the walk must skip non-frame segments by their length fields
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x05, 1, 2, 3,
      0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0x02, 0x00, 0x03,
      0x01, 0x01, 0x11, 0x00, 0xFF, 0xD9).map(_.toByte)
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x05, 0x00, 0x07, 0x00, 0x00, 0x00, 0x3B)
    val garbage = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val truncated = realPng.take(10)
    val rows = Seq(
      (1L, realPng), (2L, jpeg), (3L, gif), (4L, garbage),
      (5L, truncated), (6L, Array.empty[Byte]))
      .toDF("id", "payload")
      .selectExpr("id", "graft_image_dims(payload) AS d")
      .select(col("id"), col("d.format"), col("d.width"), col("d.height"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.get(2)), Option(r.get(3))))
      .toMap
    assert(rows(1L) == (Some("png"), Some(1), Some(1)))
    assert(rows(2L) == (Some("jpeg"), Some(3), Some(2)))
    assert(rows(3L) == (Some("gif"), Some(5), Some(7)))
    assert(rows(4L) == (None, None, None))
    assert(rows(5L) == (None, None, None))
    assert(rows(6L) == (None, None, None))
  }

  // ---- byte-based optimized write ----------------------------------

  private def dataFileSizes(dir: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(_.isFile)
      .filter(s => s.getPath.getName.endsWith(".parquet")
        && !s.getPath.getName.startsWith("_"))
      .map(s => s.getPath.getName -> s.getLen)
  }

  test("appendSized writes near-target files for narrow AND wide rows") {
    val target = 1L << 20 // 1 MB — small enough to exercise at test sf
    // NARROW: pseudo-random longs (stable encoding ratio across the
    // initial write and the append, so the footer-derived estimate
    // transfers)
    val narrowDir = s"${tmp("graft-r10bw-")}/narrow"
    def narrow(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id"), (col("id") * 2654435761L % 1000003L).as("a"),
        (col("id") * 40503L % 65521L).as("b"))
    narrow(0, 200000).repartition(2).write.parquet(narrowDir)
    val before = dataFileSizes(narrowDir).map(_._1).toSet
    val batch = narrow(200000, 800000)
    graft.sink.DeletionVectors.appendSized(batch, 600000, narrowDir,
      targetBytes = target)
    val appended = dataFileSizes(narrowDir).filterNot(f => before(f._1))
    assert(appended.nonEmpty)
    appended.foreach { case (n, len) =>
      assert(len <= 2 * target && len >= target / 4,
        s"narrow file $n is $len bytes vs target $target")
    }
    // WIDE: ~64 KB binary payload per row — the fixed 512k-rows
    // heuristic would pack all rows into ONE multi-GB-shaped file;
    // byte sizing must split near target instead
    val wideDir = s"${tmp("graft-r10bw-")}/wide"
    def wide(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id"),
        // ~64 KB of md5 hex per row — random-looking, so parquet
        // can't compress it away and the observed width is real
        expr("array_join(transform(sequence(1, 2048), " +
          "i -> md5(cast(id * 2048 + i as string))), '')").as("payload"))
    wide(0, 20).repartition(1).write.parquet(wideDir)
    val wBefore = dataFileSizes(wideDir).map(_._1).toSet
    graft.sink.DeletionVectors.appendSized(wide(20, 120), 100, wideDir,
      targetBytes = target)
    val wAppended = dataFileSizes(wideDir).filterNot(f => wBefore(f._1))
    assert(wAppended.size > 1,
      s"wide append landed in ${wAppended.size} file(s) — not byte-sized")
    wAppended.foreach { case (n, len) =>
      assert(len <= 2 * target,
        s"wide file $n is $len bytes vs target $target")
    }
  }

  // ---- exact last_seen via per-country top-K state -----------------

  private def ts(i: Int): String = f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"

  private def goldOf(goldDir: String): Map[String, (Long, Option[String])] =
    graft.sink.AtomicParquetSink.read(spark, goldDir).get
      .select("country", "n_users", "last_seen").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getString(2)))).toMap

  test("exact last_seen retracts through the top-K state with ZERO fact recomputes") {
    val work = tmp("graft-r10tk-")
    val (table, gold) = (s"$work/fact", s"$work/gold")
    // countries A (even users) and B (odd); user i carries ts(i)
    val dim = (1L to 100L).map(u =>
      (u, if (u % 2 == 0) "A" else "B")).toDF("user_id", "country")
    def batch(rows: Seq[(Long, Double, Int, String)]) =
      rows.map { case (u, v, t, op) => (u, v, ts(t), op) }
        .toDF("user_id", "value", "ts_s", "op")
    val before = MorGoldStats.totalFallbacks
    // batch 0: insert users 1..100
    StreamMorGold.processBatch(
      batch((1L to 100L).map(u => (u, 1.0, u.toInt, "I"))),
      0L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    assert(goldOf(gold)("A") == (50L, Some(ts(100))))
    assert(goldOf(gold)("B") == (50L, Some(ts(99))))
    // batch 1: delete A's top three users (100, 98, 96)
    StreamMorGold.processBatch(
      batch(Seq((100L, 1.0, 100, "D"), (98L, 1.0, 98, "D"),
        (96L, 1.0, 96, "D"))),
      1L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    assert(goldOf(gold)("A") == (47L, Some(ts(94))),
      "last_seen must step back to the surviving max")
    assert(goldOf(gold)("B") == (50L, Some(ts(99))))
    // batch 2: update user 94 to a NEWER ts; delete+re-add flows
    StreamMorGold.processBatch(
      batch(Seq((94L, 2.0, 200, "U"))),
      2L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    assert(goldOf(gold)("A") == (47L, Some(ts(200))))
    assert(MorGoldStats.totalFallbacks == before,
      "the state must answer every retraction without reading the fact")
  }

  test("exhausting a truncated top-K falls back to one pruned rebuild, stays exact") {
    val work = tmp("graft-r10fb-")
    val (table, gold) = (s"$work/fact", s"$work/gold")
    // ONE country with 40 users — more than ExactTopK=32, so the
    // bootstrapped list is truncated (incomplete)
    val dim = (1L to 40L).map(u => (u, "A")).toDF("user_id", "country")
    def batch(rows: Seq[(Long, Int, String)]) =
      rows.map { case (u, t, op) => (u, 1.0, ts(t), op) }
        .toDF("user_id", "value", "ts_s", "op")
    StreamMorGold.processBatch(
      batch((1L to 40L).map(u => (u, u.toInt, "I"))),
      0L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    val before = MorGoldStats.totalFallbacks
    // delete the top 33 — one past the stored window: must rebuild
    StreamMorGold.processBatch(
      batch((8L to 40L).map(u => (u, u.toInt, "D"))),
      1L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    assert(MorGoldStats.totalFallbacks == before + 1
      && MorGoldStats.lastFallbackCountries == 1,
      "exhausting the truncated window must trigger exactly one rebuild")
    assert(goldOf(gold)("A") == (7L, Some(ts(7))))
    // and the rebuilt (now complete) state keeps answering exactly
    StreamMorGold.processBatch(
      batch(Seq((7L, 7, "D"), (6L, 6, "D"))),
      2L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    assert(goldOf(gold)("A") == (5L, Some(ts(5))))
    assert(MorGoldStats.totalFallbacks == before + 1)
  }

  // ---- random histories across the per-file migration --------------

  test("property: random CDC histories across the per-file DV migration + exact recency converge") {
    // The Round9 random-history envelope, re-armed at the round-10
    // risk surface: the guard is forced tiny so the DV store MIGRATES
    // to per-file sidecars mid-history (every later locate/read/
    // maintenance op runs in pf mode), and exactLastSeen is ON so the
    // top-K recency state is property-tested too. Gold must equal the
    // from-scratch aggregate of the final visible fact INCLUDING the
    // delete-correct per-country max timestamp.
    import graft.streaming.StreamMorGold
    val userCountry = (1L to 16L).map(k => (k, s"C${k % 4}"))
      .toDF("user_id", "country")
    for (seed <- Seq(7, 23, 41)) {
      spark.conf.set(DeletionVectors.GuardConfKey, "3")
      try {
        val rnd = new scala.util.Random(seed)
        val work = tmp(s"graft-r10pp$seed-")
        val (fact, gold) = (s"$work/fact", s"$work/gold")
        val base = (1L to 10L).map(k =>
          (k, rnd.nextInt(1000) / 100.0, "2024-01-01 00:00:00"))
          .toDF("user_id", "value", "ts_s")
        graft.sink.BloomSkipIndex.bloomWrite(base, "user_id", fact,
          nFiles = 4)
        StreamMorGold.bootstrapGold(spark, fact, gold, userCountry)
        var t = 0
        for (b <- 0 until 8) {
          val keys = rnd.shuffle((1L to 16L).toList)
            .take(1 + rnd.nextInt(12))
          val rows = keys.map { k =>
            t += 1
            (k, rnd.nextInt(10000) / 100.0,
              f"2024-01-02 00:${t / 60}%02d:${t % 60}%02d",
              Seq("I", "U", "D")(rnd.nextInt(3)))
          }
          val df = rows.toDF("user_id", "value", "ts_s", "op")
          def full(): Unit = StreamMorGold.processBatch(
            df, b.toLong, fact, gold, userCountry, "user_id", "op",
            exactLastSeen = true)
          rnd.nextInt(4) match {
            case 0 =>
              StreamMorGold.stageDeltas(df, b.toLong, fact, gold,
                "user_id", "op")
              full()
            case 1 =>
              StreamMorGold.stageDeltas(df, b.toLong, fact, gold,
                "user_id", "op")
              graft.streaming.StreamMoR.applyBatch(spark, fact, df,
                b.toLong, "user_id", "op")
              full()
            case 2 => full(); full()
            case _ => full()
          }
          rnd.nextInt(4) match {
            case 0 => DeletionVectors.compactIfNeeded(spark, fact, 0.05)
            case 1 => DeletionVectors.compactSmallFiles(spark, fact,
              smallBytes = 1L << 20, targetBytes = 4L << 20)
            case 2 => DeletionVectors.maintain(spark, fact,
              maxDeleteRatio = 0.05, smallBytes = 1L << 20,
              targetBytes = 4L << 20)
            case _ => ()
          }
        }
        // non-vacuous: the tiny guard must actually have migrated the
        // store (compaction can retire sidecars later, so accept
        // either a live pf commit or a compacted-away one — but the
        // _dvpf dir must exist, i.e. migration ran)
        assert(new java.io.File(s"$fact/_dvpf").exists,
          s"seed $seed: guard 3 never triggered the per-file migration")
        val folded = graft.sink.AtomicParquetSink.read(spark, gold).get
          .filter(col("n_users") =!= 0L)
          .select("country", "n_users", "total_value", "last_seen")
          .as[(String, Long, java.math.BigDecimal, String)].collect()
          .map(x => (x._1, x._2, x._3.doubleValue, x._4)).toSet
        val scratch = DeletionVectors.read(spark, fact)
          .join(userCountry, "user_id").groupBy(col("country"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).as("tv"),
            max(col("ts_s")).as("mx"))
          .as[(String, Long, java.math.BigDecimal, String)].collect()
          .map(x => (x._1, x._2, x._3.doubleValue, x._4)).toSet
        assert(folded == scratch,
          s"seed $seed: folded $folded != from-scratch $scratch")
      } finally spark.conf.unset(DeletionVectors.GuardConfKey)
    }
  }

  // ---- legacy marker adoption --------------------------------------

  test("adoptLegacyMarkers claims untagged fences so a resumed drain skips, not re-applies") {
    val work = tmp("graft-r10lm-")
    val dir = s"$work/t"
    val ckpt = s"$work/ckpt"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir)
    // a legacy (untagged) drain applied batch 0: simulate its marker
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_commits"))
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/_commits/batch-0"),
      true).close()
    val batch0 = Seq((1L, "A", "U")).toDF("id", "v", "op")
    val tag = StreamMoR.runTagOf(ckpt)
    // WITHOUT adoption, the tagged fence misses and batch 0 re-applies
    // (that is the documented upgrade hazard) — so adopt first:
    assert(StreamMoR.adoptLegacyMarkers(spark, dir, ckpt) == 1)
    StreamMoR.applyBatch(spark, dir, batch0, 0L, "id", "op",
      runTag = tag)
    // the replayed batch was skipped: the table still holds the OLD
    // image of id 1
    val vs = DeletionVectors.read(spark, dir).orderBy("id")
      .select("v").as[String].collect().toSeq
    assert(vs == Seq("a", "b"),
      s"adopted fence failed — batch re-applied: $vs")
    // a NEW batch id under the same tag still applies normally
    StreamMoR.applyBatch(spark, dir,
      Seq((2L, "B", "U")).toDF("id", "v", "op"), 1L, "id", "op",
      runTag = tag)
    val vs2 = DeletionVectors.read(spark, dir).orderBy("id")
      .select("v").as[String].collect().toSeq
    assert(vs2 == Seq("a", "B"))
  }
}
