package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-12 specs: the probe family's new containers (WebM/MKV EBML
  * walk, Xing/VBRI VBR durations) and the walk-guard hardening the
  * round-11 advice flagged (hostile chunk sizes must neither loop nor
  * throw). */
class Round12Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---- byte-building helpers ----------------------------------------

  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def be32(v: Long) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def le32(v: Long) = Array[Byte](
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def ascii(s: String) = s.getBytes("US-ASCII")
  private def hexb(s: String) = s.replaceAll(" ", "")
    .sliding(2, 2).toArray.map(Integer.parseInt(_, 16).toByte)

  /** Hand-built EBML header, independent of BOTH the in-plan builder
    * and the parser. */
  private def webmBytes(doc: String, w: Int, h: Int, ticks: Long,
                        scaleNs: Long): Array[Byte] = {
    val docType = hexb("4282") ++
      Array((0x80 | doc.length).toByte) ++ ascii(doc)
    val hdr = hexb("1A45DFA3") ++
      Array((0x80 | docType.length).toByte) ++ docType
    val info = hexb("1549A966 93") ++
      hexb("2AD7B1 84") ++ be32(scaleNs) ++
      hexb("4489 88") ++
      be64(java.lang.Double.doubleToLongBits(ticks.toDouble))
    val tracks = hexb("1654AE6B 8C AE 8A E0 88") ++
      hexb("B0 82") ++ be16(w) ++ hexb("BA 82") ++ be16(h)
    hdr ++ hexb("18538067") ++
      Array((0x80 | (info.length + tracks.length)).toByte) ++
      info ++ tracks
  }

  private def videoMeta(b: Array[Byte]) =
    Option(graft.multimodal.VideoCodecs.meta(b))
      .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getLong(3)))
  private def audioMeta(b: Array[Byte]) =
    Option(graft.multimodal.AudioCodecs.meta(b))
      .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getLong(3)))

  test("EBML walk: webm and matroska headers parse dims, DocType and scaled float duration") {
    // TimestampScale 3e6 ns/tick, 437 ticks -> 1311 ms
    assert(videoMeta(webmBytes("webm", 320, 240, 437, 3000000L))
      .contains(("webm", 320, 240, 1311L)))
    assert(videoMeta(webmBytes("matroska", 1920, 1080, 10, 1000000L))
      .contains(("mkv", 1920, 1080, 10L)))
    // default TimestampScale (no element) = 1e6: strip Info down to
    // Duration only
    val noScale = {
      val docType = hexb("4282 84") ++ ascii("webm")
      val hdr = hexb("1A45DFA3") ++
        Array((0x80 | docType.length).toByte) ++ docType
      val info = hexb("1549A966 8B 4489 88") ++
        be64(java.lang.Double.doubleToLongBits(7.0))
      hdr ++ hexb("18538067") ++
        Array((0x80 | info.length).toByte) ++ info
    }
    // no Tracks element: dims 0, duration still parses
    assert(videoMeta(noScale).contains(("webm", 0, 0, 7L)))
    // truncations never throw, and a cut inside Segment yields null
    val full = webmBytes("webm", 320, 240, 437, 3000000L)
    (0 to full.length).foreach(n => videoMeta(full.take(n)))
    assert(videoMeta(full.take(20)).isEmpty)
  }

  test("MP3 VBR: Xing (mono and stereo), Info and VBRI frame counts beat the CBR estimate") {
    // ID3v2.3 tag with 16-byte body, then FF FB (MPEG-1 L3),
    // bitrate idx 9 (128kbps), rate idx 1 (48000)
    def head(mono: Boolean) =
      ascii("ID3") ++ hexb("0300 00 00000010") ++
        new Array[Byte](16) ++
        hexb("FFFB") ++ Array[Byte](((9 << 4) | (1 << 2)).toByte,
        if (mono) 0xc0.toByte else 0x00.toByte)
    def xing(mono: Boolean, tag: String, frames: Long) =
      head(mono) ++ new Array[Byte](if (mono) 17 else 32) ++
        ascii(tag) ++ be32(1) ++ be32(frames) ++ new Array[Byte](16)
    def vbri(frames: Long) =
      head(mono = false) ++ new Array[Byte](32) ++
        ascii("VBRI") ++ be16(1) ++ be16(0) ++ be16(0) ++ be32(0) ++
        be32(frames) ++ new Array[Byte](16)
    // 1000 frames x 1152 samples at 48 kHz = 24000 ms
    assert(audioMeta(xing(mono = false, "Xing", 1000))
      .contains(("mp3", 48000, 2, 24000L)))
    assert(audioMeta(xing(mono = true, "Xing", 1000))
      .contains(("mp3", 48000, 1, 24000L)))
    assert(audioMeta(xing(mono = false, "Info", 500))
      .contains(("mp3", 48000, 2, 12000L)))
    assert(audioMeta(vbri(500)).contains(("mp3", 48000, 2, 12000L)))
    // a frames-flag-less Xing falls through to the CBR estimate
    val noFrames = head(mono = false) ++ new Array[Byte](32) ++
      ascii("Xing") ++ be32(0) ++ new Array[Byte](20)
    val cbr = audioMeta(noFrames).get
    assert(cbr._1 == "mp3" && cbr._4 ==
      (noFrames.length - 26).toLong * 8000L / 128000L)
    // truncations of the VBR layouts never throw
    val x = xing(mono = false, "Xing", 1000)
    (0 to x.length).foreach(n => audioMeta(x.take(n)))
  }

  test("hostile chunk sizes: AVI inner/outer walks and the WAV walk terminate with null, never loop or throw") {
    // AVI hdrl child declaring size 0xFFFFFFF8 — the advice's
    // infinite-loop case (j += 8 + (-8) left j unchanged)
    val aviEvil = ascii("RIFF") ++ le32(200) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(100) ++ ascii("hdrl") ++
      ascii("JUNK") ++ le32(0xFFFFFFF8L) ++ new Array[Byte](40)
    assert(videoMeta(aviEvil).isEmpty)
    // ...and 0xFFFFFFF0 (the j-negative / AIOOBE case)
    val aviEvil2 = ascii("RIFF") ++ le32(200) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(100) ++ ascii("hdrl") ++
      ascii("JUNK") ++ le32(0xFFFFFFF0L) ++ new Array[Byte](40)
    assert(videoMeta(aviEvil2).isEmpty)
    // AVI outer walk: a ~2 GB declared chunk near the end must not
    // wrap `i` negative
    val aviOuter = ascii("RIFF") ++ le32(200) ++ ascii("AVI ") ++
      ascii("JUNK") ++ le32(0x7ffffff0L) ++ new Array[Byte](8)
    assert(videoMeta(aviOuter).isEmpty)
    // WAV: a huge declared chunk BEFORE fmt/data stops the walk
    // (null — fields never found), and one AFTER them still parses
    val wavEvilFirst = ascii("RIFF") ++ le32(1000) ++ ascii("WAVE") ++
      ascii("JUNK") ++ le32(0x7ffffff0L) ++ new Array[Byte](8) ++
      ascii("fmt ") ++ le32(16) ++ new Array[Byte](16)
    assert(audioMeta(wavEvilFirst).isEmpty)
    val wavTail = ascii("RIFF") ++ le32(1000) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++
      hexb("0100 0200") ++ le32(8000) ++ le32(32000) ++
      hexb("0400 1000") ++
      ascii("data") ++ le32(0x7ffffff0L) // header-only payload
    assert(audioMeta(wavTail).contains(
      ("wav", 8000, 2, 0x7ffffff0L * 1000L / 32000L)))
    // arbitrary-byte fuzz over the NEW branches too (EBML magic +
    // random tails)
    val rnd = new scala.util.Random(12)
    (0 until 300).foreach { _ =>
      val tail = Array.fill[Byte](rnd.nextInt(96))(rnd.nextInt.toByte)
      videoMeta(hexb("1A45DFA3") ++ tail)
      audioMeta(ascii("ID3") ++ tail)
      videoMeta(ascii("RIFF") ++ tail)
      audioMeta(ascii("RIFF") ++ tail)
    }
  }

  test("StreamDlq: an empty (or all-null-ts) first batch leaves later batches un-fenced") {
    val work = tmp("graft-r12dlq-")
    val (state, mainD, dlqD) = (s"$work/st", s"$work/main", s"$work/dlq")
    def batch(rows: (Long, String)*) = rows.toSeq
      .toDF("event_id", "ts_s")
      .select(col("event_id"),
        col("ts_s").cast("timestamp").as("ts"))
    val schema = batch().schema
    // batch 0 is EMPTY: no watermark can exist yet (the advice bug
    // persisted Long.MinValue here, and `w - horizon` then
    // underflowed so every later row was silently dead-lettered)
    graft.streaming.StreamDlq.applyBatch(spark, state, mainD, dlqD,
      batch(), "ts", horizonMs = 3600000L, batchId = 0L)
    // batch 1: all-null event time — still no watermark
    graft.streaming.StreamDlq.applyBatch(spark, state, mainD, dlqD,
      batch(1L -> null), "ts", horizonMs = 3600000L, batchId = 1L)
    // batch 2: first real event times — must ALL land in main
    graft.streaming.StreamDlq.applyBatch(spark, state, mainD, dlqD,
      batch(2L -> "2024-01-01 09:00:00", 3L -> "2024-01-01 10:00:00"),
      "ts", horizonMs = 3600000L, batchId = 2L)
    def ids(dir: String) = graft.streaming.StreamDlq
      .readSide(spark, dir, schema)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids(mainD) == Seq(1L, 2L, 3L),
      s"rows were dead-lettered under a phantom watermark: main=${ids(mainD)}")
    assert(ids(dlqD).isEmpty)
    // and the watermark NOW exists: batch 3's stale row routes to dlq
    graft.streaming.StreamDlq.applyBatch(spark, state, mainD, dlqD,
      batch(4L -> "2024-01-01 08:30:00", 5L -> "2024-01-01 10:30:00"),
      "ts", horizonMs = 3600000L, batchId = 3L)
    assert(ids(dlqD) == Seq(4L), "the real watermark must still fence")
    assert(ids(mainD) == Seq(1L, 2L, 3L, 5L))
  }

  test("mergeInto: a NULL op row fails loud instead of silently deleting its key") {
    import graft.sink.MorLog
    val work = tmp("graft-r12mrg-")
    val dir = s"$work/t"
    MorLog.create(spark.range(0, 10)
      .select(col("id"), (col("id") * 2).as("v")), dir)
    val bad = Seq((1L, 111L, null.asInstanceOf[String]),
      (2L, 222L, "U")).toDF("id", "v", "_op")
    val e = intercept[IllegalArgumentException] {
      MorLog.mergeInto(spark, dir, bad, "id", "_op")
    }
    assert(e.getMessage.contains("NULL"))
    // nothing committed, nothing tombstoned
    assert(MorLog.versions(spark, dir) == Seq(0))
    assert(MorLog.read(spark, dir).count() == 10)
  }

  test("deleteWhere on a shallow clone: file-drop accounting subtracts the dropped files' pre-existing tombstones") {
    import graft.sink.MorLog
    val work = tmp("graft-r12cln-")
    val (src, dst) = (s"$work/src", s"$work/dst")
    // two single-file versions with disjoint id ranges, so stats can
    // prove a whole-file drop
    MorLog.create(spark.range(0, 50)
      .select(col("id"), (col("id") % 7).as("g")).coalesce(1), src)
    MorLog.append(spark, src, spark.range(50, 100)
      .select(col("id"), (col("id") % 7).as("g")).coalesce(1))
    // one pre-existing tombstone INSIDE the file the delete will drop
    assert(MorLog.deleteWhere(spark, src, col("id") === 75L) == 1L)
    MorLog.shallowClone(spark, src, dst)
    // metadata-only drop of the upper file (clone references it by
    // ABSOLUTE path; the tombstone set keys by basename — the advice
    // bug returned 50 here, recounting id=75)
    val n = MorLog.deleteWhere(spark, dst, col("id") >= 50L)
    assert(graft.sink.MorLogStats.lastFilesDropped == 1,
      "the upper file must drop wholesale (metadata-only tier)")
    assert(n == 49L, s"newly-deleted must exclude the pre-existing " +
      s"tombstone, got $n")
    assert(MorLog.read(spark, dst).count() == 50L)
    // the source is untouched
    assert(MorLog.read(spark, src).count() == 99L)
  }

  test("commit meta is put-if-absent: the second writer of a version sees failure, never an overwrite") {
    val d = tmp("graft-r12cx-")
    val p = new org.apache.hadoop.fs.Path(s"$d/x.meta")
    val c = spark.sparkContext.hadoopConfiguration
    assert(graft.sink.AtomicFiles.createExclusive(c, p, "a".getBytes))
    assert(!graft.sink.AtomicFiles.createExclusive(c, p, "b".getBytes),
      "the losing create must report the conflict")
    assert(graft.sink.AtomicFiles.readString(c, p) == "a",
      "the loser must not have clobbered the winner's bytes")
  }

  test("OCC: a drain upsert and a clusterSmall racing on the same version BOTH land (the loser retries)") {
    import graft.sink.{MorLog, MorLogStats}
    val work = tmp("graft-r12occ-")
    val dir = s"$work/t"
    MorLog.create(spark.range(0, 400)
      .select(col("id"), (col("id") % 7).as("g")).repartition(4), dir)
    // park the FIRST writer to reach its commit point (after it read
    // base state v0 and staged) until the rival has committed — the
    // deterministic form of the race. On the pre-OCC overwrite-rename
    // commit this scenario silently LOST one of the two commits.
    val parked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val release = new java.util.concurrent.CountDownLatch(1)
    val first = new java.util.concurrent.atomic.AtomicBoolean(false)
    MorLog.commitPauseHook = (d, _) =>
      if (d == dir && first.compareAndSet(false, true)) {
        parked.set(true)
        release.await(60, java.util.concurrent.TimeUnit.SECONDS)
      }
    try {
      @volatile var err: Throwable = null
      val a = new Thread(() => {
        try MorLog.upsert(spark, dir,
          spark.range(0, 10).select(col("id"), lit(999L).as("g")), "id")
        catch { case t: Throwable => err = t }
      })
      a.start()
      val t0 = System.nanoTime()
      while (!parked.get && System.nanoTime() - t0 < 60e9.toLong)
        Thread.sleep(10)
      assert(parked.get, "writer A never reached the commit point")
      // writer B: the maintenance job commits version 1 under A
      assert(MorLog.clusterSmall(spark, dir, Seq("id", "g")) == 4)
      release.countDown()
      a.join(120000)
      assert(err == null, s"the upsert writer failed: $err")
      // BOTH landed: the cluster at v1, the retried upsert at v2
      assert(MorLog.versions(spark, dir) == Seq(0, 1, 2))
      assert(MorLog.state(spark, dir, 1).action == "cluster")
      assert(MorLog.state(spark, dir, 2).action == "upsert")
      assert(MorLogStats.lastCommitRetries >= 1,
        "the loser must have gone through a conflict retry")
      val got = MorLog.read(spark, dir).select("id", "g")
        .as[(Long, Long)].collect().toMap
      assert(got.size == 400)
      assert((0L until 10L).forall(got(_) == 999L),
        "the upsert's rows must be visible")
      assert(got(100L) == 100L % 7, "clustered rows drifted")
    } finally {
      MorLog.commitPauseHook = (_, _) => ()
      release.countDown()
    }
  }

  test("OCC: a tombstone-writing delete losing to an append recomputes cleanly, no torn side state") {
    import graft.sink.MorLog
    val work = tmp("graft-r12occ2-")
    val dir = s"$work/t"
    MorLog.create(spark.range(0, 100)
      .select(col("id"), (col("id") % 7).as("g")), dir)
    val parked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val release = new java.util.concurrent.CountDownLatch(1)
    val first = new java.util.concurrent.atomic.AtomicBoolean(false)
    MorLog.commitPauseHook = (d, _) =>
      if (d == dir && first.compareAndSet(false, true)) {
        parked.set(true)
        release.await(60, java.util.concurrent.TimeUnit.SECONDS)
      }
    try {
      @volatile var deleted = -1L
      @volatile var err: Throwable = null
      val a = new Thread(() => {
        try deleted = MorLog.deleteWhere(spark, dir, col("id") < 5)
        catch { case t: Throwable => err = t }
      })
      a.start()
      val t0 = System.nanoTime()
      while (!parked.get && System.nanoTime() - t0 < 60e9.toLong)
        Thread.sleep(10)
      assert(parked.get)
      MorLog.append(spark, dir, spark.range(100, 110)
        .select(col("id"), (col("id") % 7).as("g")))
      release.countDown()
      a.join(120000)
      assert(err == null, s"the delete writer failed: $err")
      assert(deleted == 5L)
      assert(MorLog.versions(spark, dir) == Seq(0, 1, 2))
      assert(MorLog.state(spark, dir, 1).action == "append")
      assert(MorLog.state(spark, dir, 2).action == "delete")
      // the delete recomputed against the appended state: appended
      // rows survive, victims are gone
      val ids = MorLog.read(spark, dir).select("id").as[Long]
        .collect().toSet
      assert(ids == (5L until 110L).toSet)
    } finally {
      MorLog.commitPauseHook = (_, _) => ()
      release.countDown()
    }
  }

  test("shallowClone across the per-file DV tier: the clone owns its sidecars, vacuums never cross, clone-of-clone works") {
    import graft.sink.{DvPerFile, MorLog}
    val work = tmp("graft-r12pfc-")
    val (src, dst, dst2) = (s"$work/src", s"$work/dst", s"$work/dst2")
    MorLog.create(spark.range(0, 300)
      .select(col("id"), (col("id") % 7).as("g"))
      .repartitionByRange(3, col("id")).sortWithinPartitions("id"), src)
    // push the source past the broadcast guard: tombstones live in
    // per-file sidecars at clone time (pre-round-12 this clone was
    // REFUSED and forced a full compaction rewrite)
    spark.conf.set(graft.sink.DeletionVectors.GuardConfKey, "2")
    try assert(MorLog.deleteWhere(spark, src, col("id") % 10 === 6) == 30)
    finally spark.conf.unset(graft.sink.DeletionVectors.GuardConfKey)
    val srcCeil = MorLog.state(spark, src,
      MorLog.currentVersion(spark, src)).pfCeil
    assert(srcCeil >= 0, "source must be in the per-file tier")
    MorLog.shallowClone(spark, src, dst)
    // the clone resolves deletes from ITS OWN sidecar store
    assert(DvPerFile.committedGen(spark, dst).contains(srcCeil))
    def ids(dir: String) = MorLog.read(spark, dir)
      .select("id").as[Long].collect().toSet
    val expect = (0L until 300L).filterNot(_ % 10 == 6).toSet
    assert(ids(dst) == expect && ids(src) == expect)
    // diverge the clone (a pf-tier merge ABOVE the copied ceiling)...
    assert(MorLog.deleteWhere(spark, dst, col("id") === 3L) == 1)
    assert(ids(dst) == expect - 3L && ids(src) == expect)
    // ...and vacuum BOTH sides: neither touches the other's store
    MorLog.vacuum(spark, dst, keepVersions = 1)
    MorLog.vacuum(spark, src, keepVersions = 10) // drops nothing live
    assert(ids(src) == expect, "src sidecars survived the clone's vacuum")
    assert(ids(dst) == expect - 3L, "clone survived the src vacuum")
    // clone-of-clone: the grand-clone reads through the middle
    // clone's ceiling (absolute references into BOTH ancestors)
    MorLog.shallowClone(spark, dst, dst2)
    assert(ids(dst2) == expect - 3L)
    // and diverges independently
    MorLog.upsert(spark, dst2, Seq((1L, 999L)).toDF("id", "g"), "id")
    assert(MorLog.read(spark, dst2).filter(col("id") === 1L)
      .select("g").as[Long].head() == 999L)
    assert(ids(dst) == expect - 3L, "grand-clone leaked into its parent")
  }

  test("PqIndex.rerank: the exact stage reads O(shortlist) files through id-bound pruning, and matches the in-plan form") {
    import graft.ann.{Pq, PqIndex, PqIndexStats}
    val work = tmp("graft-r12pqr-")
    // 4096 vectors, 64 id-range files: a 5-query × 12 shortlist can
    // touch at most 60 files — the exact stage must NOT read all 64
    val corpus = spark.range(0, 4096).select(
      col("id").as("vec_id"),
      array((0 until 8).map(j =>
        ((col("id") * (j + 3) + j) % 97).cast("float")): _*)
        .as("embedding"))
    val queries = corpus.filter(col("vec_id") < 5)
    PqIndex.write(corpus, "embedding", "vec_id", s"$work/idx", m = 8,
      nVecFiles = 64)
    val got = PqIndex.rerank(spark, s"$work/idx", queries,
      "embedding", "vec_id", m = 8, k = 3, c = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(PqIndexStats.lastRerankFilesScanned > 0 &&
      PqIndexStats.lastRerankFilesScanned <= 60,
      s"exact stage scanned ${PqIndexStats.lastRerankFilesScanned} " +
        "files — must be bounded by the shortlist, not the corpus")
    assert(PqIndexStats.lastRerankFilesSkipped >=
      64 - 60, s"only ${PqIndexStats.lastRerankFilesSkipped} files " +
      "skipped — the id-clustered bounds pruned nothing")
    assert(PqIndexStats.lastRerankFilesScanned +
      PqIndexStats.lastRerankFilesSkipped == 64)
    // identical ranking to the in-plan two-stage form
    val means = Pq.fitMeans(corpus, "embedding")
    val want = Pq.adcRerankTopK(corpus, queries, "embedding",
      "vec_id", means, m = 8, k = 3, c = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want, "persisted rerank diverged from the in-plan form")
  }

  test("mergeIntoWhen: first true clause wins, no clause keeps the row, gates route inserts and by-source deletes, ambiguity fails loud") {
    import graft.sink.MorLog
    val work = tmp("graft-r12mw-")
    val dir = s"$work/t"
    MorLog.create(spark.range(0, 10)
      .select(col("id"), (col("id") * 10).as("v")), dir)
    // source: keys 0..4 (matched) + 20, 21 (new). s.v beats t.v only
    // for even keys.
    val src = Seq((0L, 5L), (1L, 100L), (2L, 15L), (3L, 100L),
      (4L, 35L), (20L, 1L), (21L, 1L)).toDF("id", "v")
    val (upd, del, ins) = MorLog.mergeIntoWhen(spark, dir, src, "id",
      matched = Seq(
        "s.v > t.v" -> "update",  // keys 0, 1, 3 (5>0, 100>10/30)
        "t.id % 2 = 0" -> "delete"), // of the rest: 2, 4
      notMatchedInsert = Some("s.id % 2 = 0"),  // 20 yes, 21 no
      notMatchedBySourceDelete = Some("t.id = 9"))
    assert((upd, del, ins) == (3L, 3L, 1L),
      s"clause routing drifted: ($upd, $del, $ins)")
    assert(MorLog.versions(spark, dir) == Seq(0, 1),
      "the whole merge must be ONE committed version")
    val got = MorLog.read(spark, dir).as[(Long, Long)].collect().toMap
    // updates took the source image; matched keys with no firing
    // clause would SURVIVE UNTOUCHED (the op-column form can't do
    // this — here 5 and 7 are unmatched survivors, and 0/1/3 prove
    // the first clause shadows the second)
    assert(got(0L) == 5L && got(1L) == 100L && got(3L) == 100L)
    assert(!got.contains(2L) && !got.contains(4L))
    assert(got(5L) == 50L && got(7L) == 70L, "untouched rows drifted")
    assert(got(20L) == 1L && !got.contains(21L), "insert gate drifted")
    assert(!got.contains(9L), "by-source delete missed")
    assert(got.size == 10 - 2 - 1 + 1)
    // ambiguous merge: duplicate source keys fail loud, no commit
    val e = intercept[IllegalArgumentException] {
      MorLog.mergeIntoWhen(spark, dir,
        Seq((1L, 1L), (1L, 2L)).toDF("id", "v"), "id",
        matched = Seq("true" -> "update"))
    }
    assert(e.getMessage.contains("unique"))
    assert(MorLog.versions(spark, dir) == Seq(0, 1))
    // CDF still nets the conditional merge exactly
    val cdf = MorLog.incrementalChanges(spark, dir, 0, 1, Seq("id"))
      .select(col("id"), col("change")).as[(Long, String)]
      .collect().toMap
    assert(cdf == Map(2L -> "delete", 4L -> "delete", 9L -> "delete",
      0L -> "update", 1L -> "update", 3L -> "update", 20L -> "insert"))
  }

  test("renameColumn: metadata-only, time travel keeps old names, mixed-era files read, rename reclaims a dropped name") {
    import graft.sink.MorLog
    val work = tmp("graft-r12ren-")
    val dir = s"$work/t"
    MorLog.create(spark.range(0, 100)
      .select(col("id"), (col("id") * 10).as("v"),
        (col("id") % 7).as("g"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"), dir)
    MorLog.deleteWhere(spark, dir, col("id") === 13L)
    val preFiles = MorLog.state(spark, dir, 1).files
    // metadata-only rename: same file list, zero data IO
    MorLog.renameColumn(spark, dir, "v", "price")
    assert(MorLog.state(spark, dir, 2).files == preFiles,
      "a rename must not touch the file list")
    assert(MorLog.read(spark, dir).columns.toSeq ==
      Seq("id", "price", "g"))
    assert(MorLog.read(spark, dir).filter(col("id") === 7L)
      .select("price").as[Long].head() == 70L)
    assert(!MorLog.read(spark, dir).columns.contains("v"))
    // time travel shows each version's OWN name
    assert(MorLog.readVersion(spark, dir, 1).columns.toSeq ==
      Seq("id", "v", "g"))
    // writes AFTER the rename land under the stable physical name and
    // mix with pre-rename files transparently
    MorLog.upsert(spark, dir,
      Seq((7L, 777L, 0L), (200L, 2000L, 4L)).toDF("id", "price", "g"),
      "id")
    val got = MorLog.read(spark, dir).select("id", "price")
      .as[(Long, Long)].collect().toMap
    assert(got(7L) == 777L && got(200L) == 2000L && got(8L) == 80L)
    assert(!got.contains(13L))
    // log-level skipping still works through the mapping: a renamed-
    // column predicate prunes by the files' physical stats
    MorLog.readWhere(spark, dir, col("price") === 770L).count()
    assert(graft.sink.MorLogStats.lastFilesSkipped > 0,
      "stats skipping must survive the rename")
    // reclaiming a dropped name: drop g, add g2, rename g2 -> g —
    // stale g values never resurface (the dropped phys name is
    // referenced by no current field)
    MorLog.dropColumn(spark, dir, "g")
    MorLog.evolveAppend(spark, dir,
      Seq((300L, 3L, 99L)).toDF("id", "price", "g2"))
    // the direct name-based re-add stays refused
    assert(scala.util.Try(MorLog.evolveAppend(spark, dir,
      Seq((301L, 3L, 1L)).toDF("id", "price", "g"))).isFailure)
    MorLog.renameColumn(spark, dir, "g2", "g")
    val g = MorLog.read(spark, dir).select("id", "g")
      .as[(Long, Option[Long])].collect().toMap
    assert(g(300L).contains(99L), "the re-added column's own rows read")
    assert(g(7L).isEmpty && g(0L).isEmpty,
      s"dropped values resurrected: ${g(7L)}/${g(0L)}")
    // CDF refuses to net across the rename, loud
    val e = intercept[IllegalArgumentException](
      MorLog.incrementalChanges(spark, dir, 1, 3, Seq("id")).count())
    assert(e.getMessage.contains("RENAME"))
    // compaction folds the mapping away cleanly (rewrites under
    // current phys names) and every value survives
    MorLog.compact(spark, dir)
    assert(MorLog.read(spark, dir).select("id", "price")
      .as[(Long, Long)].collect().toMap.apply(7L) == 777L)
  }

  test("MorLogSource (DSv2): versionAsOf, pushed-filter file pruning, column mapping and tombstones all reach SQL users") {
    import graft.sink.MorLog
    import graft.sources.MorLogSourceStats
    val work = tmp("graft-r12dsv2-")
    val dir = s"$work/t"
    MorLog.create(spark.range(0, 400)
      .select(col("id"), (col("id") * 10).as("v"),
        (col("id") % 7).as("g"))
      .repartitionByRange(8, col("id")).sortWithinPartitions("id"), dir)
    MorLog.deleteWhere(spark, dir, col("id") % 10 === 3)
    MorLog.renameColumn(spark, dir, "v", "price")
    MorLog.upsert(spark, dir,
      Seq((8L, 888L, 1L)).toDF("id", "price", "g"), "id")
    def load(v: Option[Int]) = {
      val r = spark.read.format("graft.sources.MorLogSource")
        .option("path", dir)
      v.fold(r)(x => r.option("versionAsOf", x.toString)).load()
    }
    // current snapshot: renamed column, tombstones gone, upsert in
    val cur = load(None).filter(col("id") < 100)
    val got = cur.select("id", "price").as[(Long, Long)]
      .collect().toMap
    assert(got.size == 90 && got(8L) == 888L && got(7L) == 70L &&
      !got.contains(13L))
    // the comparison was CLAIMED (plan shows it pushed) and pruned
    // files before task launch
    val plan = cur.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [LessThan(id,100)"),
      s"filter not pushed:\n$plan")
    assert(MorLogSourceStats.lastFilesSkipped > 0,
      "the pushed range filter must prune files through the log stats")
    // time travel: the pre-rename version answers under ITS schema
    val v1 = load(Some(1))
    assert(v1.columns.toSeq == Seq("id", "v", "g"))
    assert(v1.filter(col("id") === 8L).select("v").as[Long]
      .head() == 80L, "versionAsOf must pre-date the upsert")
    // per-file tier: the reader probes sidecars through DvScanCache
    val dir2 = s"$work/pf"
    MorLog.create(spark.range(0, 100)
      .select(col("id"), (col("id") % 7).as("g")).coalesce(2), dir2)
    spark.conf.set(graft.sink.DeletionVectors.GuardConfKey, "2")
    try MorLog.deleteWhere(spark, dir2, col("id") % 10 === 3)
    finally spark.conf.unset(graft.sink.DeletionVectors.GuardConfKey)
    assert(MorLog.state(spark, dir2,
      MorLog.currentVersion(spark, dir2)).pfCeil >= 0)
    val ids2 = spark.read.format("graft.sources.MorLogSource")
      .option("path", dir2).load()
      .select("id").as[Long].collect().toSet
    assert(ids2 == (0L until 100L).filterNot(_ % 10 == 3).toSet)
    // decimals read through the connector since round 13; a still-
    // unsupported type (array) keeps failing at plan time, loudly
    val dir3 = s"$work/dec"
    MorLog.create(spark.range(0, 5)
      .select(col("id"),
        col("id").cast("decimal(10,2)").as("d"),
        array(col("id")).as("arr")), dir3)
    assert(spark.read.format("graft.sources.MorLogSource")
      .option("path", dir3).load().select("d")
      .as[java.math.BigDecimal].collect().map(_.longValueExact()).sorted
      .toSeq == (0L until 5L))
    val e = intercept[Exception](
      spark.read.format("graft.sources.MorLogSource")
        .option("path", dir3).load().select("arr").collect())
    assert(e.getMessage.contains("native path"))
  }

  test("OCC property: concurrent upsert writers and a maintenance job all land — contiguous versions, no lost update") {
    import graft.sink.MorLog
    val work = tmp("graft-r12occ3-")
    val dir = s"$work/t"
    MorLog.create(spark.range(0, 100)
      .select(col("id"), lit(0L).as("v")).repartition(4), dir)
    val nThreads = 3; val opsEach = 2
    // worst-case consecutive conflicts for one op = commits by every
    // other writer (3×2 + 2 − own 2 = 6) < the 8-attempt budget, so
    // termination is guaranteed, not probabilistic
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until nThreads).map { t =>
      new Thread(() => try {
        (0 until opsEach).foreach { i =>
          MorLog.upsert(spark, dir,
            spark.range(1000L * (t + 1), 1000L * (t + 1) + 20)
              .select(col("id"),
                lit(t * 1000000L + i).as("v")), "id")
        }
      } catch { case e: Throwable => errs.add(e) })
    }
    val maint = new Thread(() => try {
      (0 until 2).foreach { _ =>
        MorLog.compactSmall(spark, dir)
        Thread.sleep(50)
      }
    } catch { case e: Throwable => errs.add(e) })
    (writers :+ maint).foreach(_.start())
    (writers :+ maint).foreach(_.join(300000))
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    // no version was ever lost: the committed log is contiguous
    val vs = MorLog.versions(spark, dir)
    assert(vs == (0 to vs.max).toSeq,
      s"version gap — a commit was clobbered: $vs")
    assert(vs.max >= 1 + nThreads * opsEach,
      "every upsert must have committed its own version")
    // every thread's LAST write is visible (its ops are sequential;
    // threads touch disjoint keys)
    val got = MorLog.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(got.size == 100 + nThreads * 20)
    (0 until nThreads).foreach { t =>
      (1000L * (t + 1) until 1000L * (t + 1) + 20).foreach { k =>
        assert(got(k) == t * 1000000L + (opsEach - 1),
          s"thread $t key $k lost its last write: ${got(k)}")
      }
    }
    assert(got(50L) == 0L, "a base row drifted")
  }

  test("composition: the DSv2 connector reads a shallow CLONE (absolute refs + copied tombstones), and history() narrates the log") {
    import graft.sink.MorLog
    val work = tmp("graft-r12comp-")
    val (src, dst) = (s"$work/src", s"$work/dst")
    MorLog.create(spark.range(0, 200)
      .select(col("id"), (col("id") % 7).as("g"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"), src)
    MorLog.deleteWhere(spark, src, col("id") % 10 === 3)
    MorLog.shallowClone(spark, src, dst)
    // diverge the clone, then read IT through the SQL surface: the
    // partitions reference the source's files by absolute path and
    // the tombstones key by basename
    MorLog.upsert(spark, dst, Seq((7L, 700L)).toDF("id", "g"), "id")
    val got = spark.read.format("graft.sources.MorLogSource")
      .option("path", dst).load()
      .filter(col("id") < 50)
      .select("id", "g").as[(Long, Long)].collect().toMap
    assert(got.size == 45 && got(7L) == 700L && !got.contains(13L) &&
      got(8L) == 1L)
    assert(graft.sources.MorLogSourceStats.lastFilesSkipped > 0,
      "pruning must work on absolute-path (clone) files too")
    // history narrates the lifecycle off pure metadata
    val h = MorLog.history(spark, src).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getString(6))).toMap
    assert(h(0) == ("create", "none"))
    assert(h(1)._1 == "delete" && h(1)._2.startsWith("broadcast"))
    val hd = MorLog.history(spark, dst).collect()
    assert(hd.head.getString(1).startsWith("clone:"))
    assert(hd.last.getString(1) == "upsert")
    assert(hd.last.getInt(3) >= 1, "the upsert's files_added must show")
  }

  test("q250/q254 round trip: the in-plan builders and the parsers agree on every new format branch") {
    val d = "/root/testdata/sf0.001"
    val a = queries.LlmQueries.audioMeta(spark, d)
    // non-vacuity: both VBR layouts present and parsed
    val vbr = a.filter(col("doc_id") % 4 === 3 &&
      col("doc_id") % 29 =!= 0)
    val n3 = vbr.filter(col("doc_id") % 8 === 3).count()
    val n7 = vbr.filter(col("doc_id") % 8 === 7).count()
    assert(n3 > 0 && n7 > 0, s"need both Xing ($n3) and VBRI ($n7) rows")
    assert(vbr.filter(col("format").isNull).count() == 0,
      "a VBR payload failed to parse")
    val bad = vbr.filter(col("duration_ms") =!=
      expr("""(doc_id % 2000 + 100) * 1152 * 1000 div
        (CASE (doc_id % 5) % 3 WHEN 0 THEN 44100
         WHEN 1 THEN 48000 ELSE 32000 END)""")).count()
    assert(bad == 0, s"$bad VBR duration mismatches")
    val v = queries.LlmQueries.videoMeta(spark, d)
    val ebml = v.filter(col("doc_id") % 3 === 2 &&
      col("doc_id") % 23 =!= 0).persist()
    assert(ebml.filter(col("format") === "webm").count() > 0)
    assert(ebml.filter(col("format") === "mkv").count() > 0)
    val vbad = ebml.filter(col("duration_ms") =!=
      (col("doc_id") % 900 + 1) * (col("doc_id") % 4 + 1) ||
      col("width") =!= col("doc_id") % 1280 + 16).count()
    assert(vbad == 0, s"$vbad EBML round-trip mismatches")
    ebml.unpersist()
  }
}
