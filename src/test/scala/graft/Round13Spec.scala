package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.sink.{MorLog, MorLogStats}

/** Round-13 specs: the stats-pruned victim locate for the keyed
  * mutating ops (the round-12 verdict's `weak` — upsert/mergeInto/
  * mergeIntoWhen scanned every live file per batch), the vacuum
  * tip-guard-from-entry-snapshot fix (a commit landing mid-vacuum
  * must survive the debris sweep), and the LRU state cache (a span
  * walk over a >cap-version log stays at one meta read per
  * version). */
class Round13Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** A log table of `nFiles` single-file appends with DISJOINT key
    * ranges: file i holds keys [i*100, i*100+rowsPerFile). */
  private def rangedTable(dir: String, nFiles: Int,
                          rowsPerFile: Int = 10): Unit = {
    def slab(i: Int) = spark.range(i * 100L, i * 100L + rowsPerFile)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartition(1)
    MorLog.create(slab(0), dir)
    (1 until nFiles).foreach(i => MorLog.append(spark, dir, slab(i)))
  }

  test("upsert victim locate opens only files whose stats admit a batch key") {
    val dir = tmp("r13_locate_upsert")
    rangedTable(dir, nFiles = 12)
    // batch keys live in file 3 (300..309) only
    val batch = Seq((301L, -1L), (302L, -2L)).toDF("k", "v")
    MorLog.upsert(spark, dir, batch, "k")
    assert(MorLogStats.lastLocateScanned == 1,
      s"locate scanned ${MorLogStats.lastLocateScanned} files, want 1")
    assert(MorLogStats.lastLocateSkipped == 11)
    val got = MorLog.read(spark, dir).filter(col("k").isin(301, 302))
      .select("v").as[Long].collect().sorted
    assert(got.toSeq == Seq(-2L, -1L))
    assert(MorLog.read(spark, dir).count() == 120)

    // a batch whose keys exist nowhere: zero files scanned, pure insert
    MorLog.upsert(spark, dir, Seq((9999L, 7L)).toDF("k", "v"), "k")
    assert(MorLogStats.lastLocateScanned == 0)
    assert(MorLog.read(spark, dir).count() == 121)
  }

  test("mergeInto victim locate is stats-pruned and the drain stays correct") {
    val dir = tmp("r13_locate_merge")
    rangedTable(dir, nFiles = 12)
    // delete one key from file 2, upsert one in file 5: only those
    // two files can hold victims
    val batch = Seq((205L, 0L, "D"), (501L, -5L, "U"))
      .toDF("k", "v", "op")
    val (deleted, written) = MorLog.mergeInto(spark, dir, batch, "k", "op")
    assert((deleted, written) == (2L, 1L))
    assert(MorLogStats.lastLocateScanned == 2,
      s"locate scanned ${MorLogStats.lastLocateScanned} files, want 2")
    val snap = MorLog.read(spark, dir)
    assert(snap.filter(col("k") === 205).count() == 0)
    assert(snap.filter(col("k") === 501).select("v")
      .as[Long].head() == -5L)
    assert(snap.count() == 119)
  }

  test("mergeIntoWhen prunes on keyed clauses; the by-source clause reads one persisted snapshot") {
    val dir = tmp("r13_locate_when")
    rangedTable(dir, nFiles = 8)
    // keyed-only merge: source keys live in file 1
    val src = Seq((101L, 1000L), (103L, 5L)).toDF("k", "v")
    val (u1, d1, i1) = MorLog.mergeIntoWhen(spark, dir, src, "k",
      matched = Seq(("s.v > t.v", "update")),
      notMatchedInsert = None)
    assert((u1, d1, i1) == (1L, 0L, 0L)) // 101: 1000>202 updates; 103: 5<206 no-op
    assert(MorLogStats.lastLocateScanned == 1,
      s"locate scanned ${MorLogStats.lastLocateScanned} files, want 1")
    assert(MorLog.read(spark, dir).filter(col("k") === 101)
      .select("v").as[Long].head() == 1000L)

    // by-source delete: inherently a full-snapshot pass (no key prune)
    val src2 = Seq((101L, 1L)).toDF("k", "v")
    val (_, d2, _) = MorLog.mergeIntoWhen(spark, dir, src2, "k",
      matched = Seq.empty, notMatchedInsert = None,
      notMatchedBySourceDelete = Some("t.k >= 700"))
    assert(d2 == 10L)
    // 8 original slabs + the first merge's staged update file
    assert(MorLogStats.lastLocateScanned == 9)
    assert(MorLog.read(spark, dir).count() == 70)
  }

  test("a commit landing mid-vacuum survives the debris sweep (entry-snapshot tip guard)") {
    val dir = tmp("r13_vacuum_race")
    rangedTable(dir, nFiles = 3)
    // build up history so vacuum has versions to drop
    MorLog.deleteWhere(spark, dir, col("k") === 1L)
    val landed = new java.util.concurrent.atomic.AtomicBoolean(false)
    MorLog.vacuumPauseHook = d =>
      if (landed.compareAndSet(false, true)) {
        // tip+1 lands AFTER vacuum resolved its entry snapshot: its
        // files are absent from `referenced` but must be spared by
        // the entry-time tip guard
        val slab = spark.range(9000L, 9010L)
          .select(col("id").as("k"), (col("id") * 2).as("v"))
          .repartition(1)
        MorLog.append(spark, d, slab)
      }
    try MorLog.vacuum(spark, dir, keepVersions = 2)
    finally MorLog.vacuumPauseHook = _ => ()
    assert(landed.get)
    // the mid-vacuum append's data files survived and read back whole
    val snap = MorLog.read(spark, dir)
    assert(snap.filter(col("k") >= 9000L).count() == 10)
    assert(snap.count() == 39)
  }

  test("cross-process tombstone safety: concurrent tombstone writers land with the in-process monitor DISABLED (broadcast tier)") {
    val dir = tmp("r13_occ_nolock") + "/t"
    MorLog.create(spark.range(0, 100)
      .select(col("id"), lit(0L).as("v")).repartition(4), dir)
    val nThreads = 3; val opsEach = 2
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    MorLog.disableDirLocks = true
    try {
      // every op UPDATES existing keys, so every commit writes a
      // broadcast tombstone set — the exact side state the old
      // version-keyed dir could tear cross-process
      val writers = (0 until nThreads).map { t =>
        new Thread(() => try {
          (0 until opsEach).foreach { i =>
            MorLog.upsert(spark, dir,
              spark.range(t * 20L, t * 20L + 10)
                .select(col("id"), lit(t * 100L + i + 1).as("v")), "id")
          }
        } catch { case e: Throwable => errs.add(e) })
      }
      writers.foreach(_.start()); writers.foreach(_.join(300000))
    } finally MorLog.disableDirLocks = false
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    val vs = MorLog.versions(spark, dir)
    assert(vs == (0 to vs.max).toSeq, s"version gap: $vs")
    val got = MorLog.read(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 100, s"row count drifted: ${got.size}")
    (0 until nThreads).foreach { t =>
      (t * 20L until t * 20L + 10).foreach(k =>
        assert(got(k) == t * 100L + opsEach,
          s"thread $t key $k lost its last write: ${got(k)}"))
    }
    assert(got(90L) == 0L, "an untouched base row drifted")
    // the committed sets live in attempt-unique dirs
    val logDir = new java.io.File(s"$dir/_log")
    assert(logDir.listFiles().exists(f =>
      f.getName.matches("tombs_v\\d+_[0-9a-f]{8}")),
      "broadcast tombstone dirs must carry the attempt uid")
  }

  test("cross-process tombstone safety: per-file-tier writers claim disjoint generations, monitor disabled") {
    val dir = tmp("r13_occ_pf") + "/t"
    MorLog.create(spark.range(0, 100)
      .select(col("id"), lit(0L).as("v")).repartition(4), dir)
    // push the table into the per-file tier first
    spark.conf.set(graft.sink.DeletionVectors.GuardConfKey, "2")
    try {
      MorLog.deleteWhere(spark, dir, col("id") % 10 === 9)
      assert(MorLog.state(spark, dir,
        MorLog.currentVersion(spark, dir)).pfCeil >= 0)
      val errs =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      MorLog.disableDirLocks = true
      try {
        val writers = (0 until 3).map { t =>
          new Thread(() => try {
            MorLog.upsert(spark, dir,
              spark.range(t * 20L, t * 20L + 10)
                .select(col("id"), lit(t + 1L).as("v")), "id")
          } catch { case e: Throwable => errs.add(e) })
        }
        writers.foreach(_.start()); writers.foreach(_.join(300000))
      } finally MorLog.disableDirLocks = false
      assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
      val vs = MorLog.versions(spark, dir)
      assert(vs == (0 to vs.max).toSeq, s"version gap: $vs")
      // 100 − 10 deleted (…%10==9) + 3 re-inserted by the upserts
      // (upsert = insert-or-update; keys 9/29/49 sit in upsert ranges)
      val got = MorLog.read(spark, dir).as[(Long, Long)].collect().toMap
      assert(got.size == 93, s"row count drifted: ${got.size}")
      (0 until 3).foreach { t =>
        (t * 20L until t * 20L + 10).foreach(k =>
          assert(got(k) == t + 1L, s"key $k lost its write: ${got(k)}"))
      }
      assert(!got.contains(59L) && !got.contains(99L),
        "a deleted key outside the upsert ranges resurfaced")
      // gen numbers were claimed put-if-absent
      val pf = new java.io.File(s"$dir/_dvpf")
      assert(pf.listFiles().exists(_.getName.startsWith("_claim.g")),
        "per-file generations must be claim-allocated")
    } finally
      spark.conf.unset(graft.sink.DeletionVectors.GuardConfKey)
  }

  test("connector decodes legacy INT96 timestamps, wide (binary-backed) decimals and pruned nested structs") {
    val dir = tmp("r13_typed") + "/t"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      val df = spark.range(0, 40).select(col("id"),
        (col("id") * 86400L).cast("timestamp").as("ts"),
        (col("id") * 1000000 + lit("0.25").cast("decimal(20,2)"))
          .cast("decimal(20,2)").as("wide"),
        struct((col("id") % 3).cast("string").as("tag"),
          col("id").as("raw")).as("meta"))
      MorLog.create(df.repartition(2), dir)
    } finally
      spark.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MICROS")
    val conn = spark.read.format("graft.sources.MorLogSource")
      .option("path", dir).load()
    // nested pruning: only meta.tag requested
    val tags = conn.select(col("meta.tag")).groupBy("tag").count()
      .as[(String, Long)].collect().toMap
    assert(tags == Map("0" -> 14L, "1" -> 13L, "2" -> 13L))
    // INT96 decode agrees with the native reader row-for-row
    val got = conn.select(col("id"), col("ts"), col("wide"))
      .as[(Long, java.sql.Timestamp, java.math.BigDecimal)]
      .collect().sortBy(_._1)
    val want = MorLog.read(spark, dir)
      .select(col("id"), col("ts"), col("wide"))
      .as[(Long, java.sql.Timestamp, java.math.BigDecimal)]
      .collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // decimal filters are claimed and evaluated exactly
    val big = conn.filter(col("wide") >
      new java.math.BigDecimal("20000000")).count()
    assert(big == got.count(_._3
      .compareTo(new java.math.BigDecimal("20000000")) > 0))
  }

  test("connector change feed: per-file-tier sidecar diffs executor-side; invalid spans fail loud") {
    val dir = tmp("r13_cdf") + "/t"
    MorLog.create(spark.range(0, 100)
      .select(col("id"), lit(0L).as("v")).repartition(4), dir)
    spark.conf.set(graft.sink.DeletionVectors.GuardConfKey, "2")
    try {
      MorLog.deleteWhere(spark, dir, col("id") % 10 === 9) // v1: migrates
      MorLog.deleteWhere(spark, dir, col("id") % 10 === 4) // v2: pf delta
      MorLog.upsert(spark, dir,
        Seq((7L, 700L), (200L, 1L)).toDF("id", "v"), "id") // v3: del+ins
    } finally
      spark.conf.unset(graft.sink.DeletionVectors.GuardConfKey)
    // the migration crossing refuses loud
    val e1 = intercept[Exception](
      spark.read.format("graft.sources.MorLogSource")
        .option("path", dir).option("changesFrom", "0").load())
    assert(e1.getMessage.contains("migration"))
    // the pf→pf span reads: v2's delta (include-mode sidecar pair
    // diff) and v3's upsert pair
    val ch = spark.read.format("graft.sources.MorLogSource")
      .option("path", dir).option("changesFrom", "1").load()
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, Int)].collect().toSet
    val want =
      (0L until 100L).filter(_ % 10 == 4).map((_, "delete", 2)).toSet ++
        Set((7L, "delete", 3), (7L, "insert", 3), (200L, "insert", 3))
    assert(ch == want)
    // bounded span + option validation
    val ch12 = spark.read.format("graft.sources.MorLogSource")
      .option("path", dir).option("changesFrom", "1")
      .option("changesTo", "2").load()
    assert(ch12.count() == 10)
    assert(intercept[Exception](
      spark.read.format("graft.sources.MorLogSource")
        .option("path", dir).option("changesFrom", "2")
        .option("changesTo", "2").load()).getMessage
      .contains("changesFrom must precede"))
    assert(intercept[Exception](
      spark.read.format("graft.sources.MorLogSource")
        .option("path", dir).option("changesFrom", "1")
        .option("versionAsOf", "2").load()).getMessage
      .contains("mutually exclusive"))
  }

  test("partition columns: every write aligns files to one partition value; pruning exact; drop refused; rename keeps the spec") {
    val dir = tmp("r13_part") + "/t"
    val df = spark.range(0, 90).select(col("id"),
      (col("id") % 3).cast("string").as("bucket"),
      (col("id") * 2).as("v"))
    MorLog.create(df.repartition(4), dir, partitionBy = Seq("bucket"))
    assert(MorLog.partitionColumns(spark, dir) == Seq("bucket"))
    // an upsert's staged files align too: its batch spans 2 buckets
    MorLog.upsert(spark, dir,
      Seq((0L, "0", -1L), (1L, "1", -2L)).toDF("id", "bucket", "v"), "id")
    // one-bucket read scans only that bucket's files
    val one = MorLog.readWhere(spark, dir, col("bucket") === "2")
    assert(one.count() == 30)
    assert(graft.sink.MorLogStats.lastFilesSkipped > 0,
      "partition pruning must skip the other buckets' files")
    val scanned = graft.sink.MorLogStats.lastFilesScanned
    // every scanned file is single-valued on the partition column:
    // the upsert batch staged one file per bucket (2 files), so
    // bucket=2 scans only create-time bucket-2 files
    assert(one.filter(col("bucket") =!= "2").count() == 0)
    assert(scanned < 5, s"bucket slice scanned $scanned files")
    // dropping the partition column refuses loud; renaming keeps it
    assert(intercept[Exception](
      MorLog.dropColumn(spark, dir, "bucket"))
      .getMessage.contains("partition column"))
    MorLog.renameColumn(spark, dir, "bucket", "shard")
    assert(MorLog.partitionColumns(spark, dir) == Seq("shard"))
    val two = MorLog.readWhere(spark, dir, col("shard") === "1")
    assert(two.count() == 30)
    assert(graft.sink.MorLogStats.lastFilesSkipped > 0,
      "pruning must survive the partition column's rename")
  }

  test("SQL catalog + write path: CREATE/INSERT/OVERWRITE/time travel/DROP; path-based save modes") {
    val root = tmp("r13_cat")
    spark.conf.set("spark.sql.catalog.g13", "graft.sources.MorLogCatalog")
    spark.conf.set("spark.sql.catalog.g13.root", root)
    spark.sql("CREATE TABLE g13.ns.t (id BIGINT, bucket STRING, " +
      "v BIGINT) PARTITIONED BY (bucket)")
    spark.sql("INSERT INTO g13.ns.t SELECT id, " +
      "CAST(id % 3 AS STRING), id * 2 FROM range(90)")
    assert(spark.sql("SELECT count(*) FROM g13.ns.t")
      .as[Long].head() == 90)
    spark.sql("INSERT INTO g13.ns.t VALUES (1000, '1', 1)")
    assert(spark.sql("SELECT count(*) FROM g13.ns.t")
      .as[Long].head() == 91)
    // partition pruning reaches SQL-by-name reads
    assert(spark.sql("SELECT count(*) FROM g13.ns.t WHERE bucket = '2'")
      .as[Long].head() == 30)
    assert(graft.sources.MorLogSourceStats.lastFilesSkipped > 0,
      "the catalog read must prune through the log stats")
    // time travel by name
    assert(spark.sql("SELECT count(*) FROM g13.ns.t VERSION AS OF 1")
      .as[Long].head() == 90)
    // INSERT OVERWRITE = one overwrite commit; history stays readable
    spark.sql("INSERT OVERWRITE g13.ns.t VALUES (7, 'x', 8)")
    assert(spark.sql("SELECT count(*) FROM g13.ns.t")
      .as[Long].head() == 1)
    assert(spark.sql("SELECT count(*) FROM g13.ns.t VERSION AS OF 2")
      .as[Long].head() == 91)
    // catalog listing + drop
    assert(spark.sql("SHOW TABLES IN g13.ns").count() == 1)
    spark.sql("DROP TABLE g13.ns.t")
    assert(spark.sql("SHOW TABLES IN g13.ns").count() == 0)
    // ADD COLUMN maps onto the tier's metadata-only evolve since
    // round 14, RENAME COLUMN onto the column mapping since round 15
    // (Round15Spec pins the lifecycle); type changes refuse loud
    spark.sql("CREATE TABLE g13.ns.u (id BIGINT)")
    spark.sql("ALTER TABLE g13.ns.u ADD COLUMN x BIGINT")
    assert(spark.sql("SELECT * FROM g13.ns.u").columns.toSeq ==
      Seq("id", "x"))
    spark.sql("ALTER TABLE g13.ns.u RENAME COLUMN x TO y")
    assert(spark.sql("SELECT * FROM g13.ns.u").columns.toSeq ==
      Seq("id", "y"))
    assert(intercept[Exception](
      spark.sql("ALTER TABLE g13.ns.u ALTER COLUMN y TYPE INT"))
      .getMessage.contains("not supported"))
    // path-based writes: create-on-first-write (append mode — the V2
    // path-write contract allows only Append/Overwrite), then append
    val dir = tmp("r13_write") + "/t"
    val df = spark.range(0, 10).select(col("id"), (col("id") * 3).as("w"))
    df.write.format("graft.sources.MorLogSource")
      .option("path", dir).mode("append").save()
    df.write.format("graft.sources.MorLogSource")
      .option("path", dir).mode("append").save()
    assert(MorLog.read(spark, dir).count() == 20)
    df.limit(3).write.format("graft.sources.MorLogSource")
      .option("path", dir).mode("overwrite").save()
    assert(MorLog.read(spark, dir).count() == 3)
    assert(MorLog.readVersion(spark, dir, 1).count() == 20,
      "the overwrite must not destroy history")
    // a time-travel relation refuses writes
    assert(scala.util.Try(df.write.format("graft.sources.MorLogSource")
      .option("path", dir).option("versionAsOf", "0")
      .mode("append").save()).isFailure)
  }

  test("SQL DELETE through the catalog; streaming CDC source resumes from its checkpoint") {
    val root = tmp("r13_del")
    spark.conf.set("spark.sql.catalog.g14", "graft.sources.MorLogCatalog")
    spark.conf.set("spark.sql.catalog.g14.root", root)
    spark.sql("CREATE TABLE g14.ns.t (id BIGINT, v BIGINT)")
    spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("r13src")
    spark.sql("INSERT INTO g14.ns.t SELECT * FROM r13src")
    spark.sql("DELETE FROM g14.ns.t WHERE id % 10 = 3 OR id >= 90")
    assert(spark.sql("SELECT count(*) FROM g14.ns.t")
      .as[Long].head() == 81)
    spark.sql("TRUNCATE TABLE g14.ns.t")
    assert(spark.sql("SELECT count(*) FROM g14.ns.t")
      .as[Long].head() == 0)
    // history survives both (versioned deletes, not rewrites)
    assert(spark.sql("SELECT count(*) FROM g14.ns.t VERSION AS OF 1")
      .as[Long].head() == 100)

    // streaming CDC source: drain history, commit more, resume
    val dir = s"$root/ns/s"
    MorLog.create(spark.range(0, 50)
      .select(col("id"), lit(0L).as("v")).repartition(2), dir)
    MorLog.deleteWhere(spark, dir, col("id") % 10 === 9)
    val ckpt = tmp("r13_ckpt")
    val out1 = tmp("r13_out1")
    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.MorLogSource")
        .option("path", dir).option("streamChanges", "true")
        .option("startingVersion", "0").load()
        .writeStream.format("parquet")
        .option("path", out1).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()
    val ev1 = spark.read.parquet(out1)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Int)].collect().toSet
    assert(ev1 == (0L until 50L).map((_, "insert", 0)).toSet ++
      (0L until 50L).filter(_ % 10 == 9).map((_, "delete", 1)).toSet,
      "startingVersion=0 must replay the whole history incl. create")
    // new commits after the first drain: ONLY they arrive on resume
    MorLog.upsert(spark, dir, Seq((7L, 700L)).toDF("id", "v"), "id")
    drain()
    val ev2 = spark.read.parquet(out1)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Int)].collect().toSet
    assert(ev2 == ev1 ++ Set((7L, "delete", 2), (7L, "insert", 2)),
      "the resumed stream must deliver exactly the new span")
  }

  // ---- round-13 probe formats: hand-built bytes, independent of
  // both the in-plan builders and the parsers ----------------------

  private def be16b(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def be32b(v: Long) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32b(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def le64b(v: Long) = le32b(v & 0xffffffffL) ++ le32b(v >>> 32)
  private def ascii(s: String) = s.getBytes("US-ASCII")
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    be32b(body.length + 8L) ++ ascii(t) ++ body

  private def audioMeta(b: Array[Byte]) =
    Option(graft.multimodal.AudioCodecs.meta(b))
      .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getLong(3)))
  private def imageDims(b: Array[Byte]) =
    Option(graft.multimodal.MultimodalCodecs.dims(b))
      .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

  test("opus/m4a/adts audio probes parse hand-built headers; truncations are total") {
    // Opus: BOS page w/ OpusHead (2ch, preskip 312, in-rate 16000),
    // EOS page granule 312 + 96000 -> 2000 ms at the 48 kHz clock
    val opusHead = ascii("OpusHead") ++ Array[Byte](1, 2) ++
      le16b(312) ++ le32b(16000) ++ le16b(0) ++ Array[Byte](0)
    val page1 = ascii("OggS") ++ Array[Byte](0, 2) ++ le64b(0) ++
      le32b(7) ++ le32b(0) ++ le32b(0) ++
      Array[Byte](1, opusHead.length.toByte) ++ opusHead
    val page2 = ascii("OggS") ++ Array[Byte](0, 4) ++ le64b(96312) ++
      le32b(7) ++ le32b(1) ++ le32b(0) ++ Array[Byte](1, 1, 0)
    val opus = page1 ++ page2
    assert(audioMeta(opus).contains(("opus", 16000, 2, 2000L)))
    // M4A: mdhd timescale 44100 / duration 88200 -> 2000 ms; mp4a 2ch
    val mdhd = box("mdhd", Array.fill[Byte](12)(0) ++ be32b(44100) ++
      be32b(88200) ++ Array.fill[Byte](4)(0))
    val mp4a = box("mp4a", Array.fill[Byte](16)(0) ++ be16b(2) ++
      be16b(16) ++ Array.fill[Byte](4)(0) ++ be32b(44100L << 16))
    val stsd = box("stsd", Array.fill[Byte](4)(0) ++ be32b(1) ++ mp4a)
    val m4a = box("ftyp", ascii("M4A ") ++ Array.fill[Byte](4)(0)) ++
      box("moov", box("trak", box("mdia",
        mdhd ++ box("minf", box("stbl", stsd)))))
    assert(audioMeta(m4a).contains(("aac", 44100, 2, 2000L)))
    // ADTS: 50 frames of 23 bytes, 48 kHz (sfi 3), 2 ch
    val hdr = Array[Byte](0xff.toByte, 0xf1.toByte,
      (0x40 | (3 << 2)).toByte, (2 << 6 | 0).toByte,
      ((23 >> 3) & 0xff).toByte, (((23 & 7) << 5) | 0x1f).toByte,
      0xfc.toByte)
    val frame = hdr ++ Array.fill[Byte](16)(0)
    val adts = Array.fill(50)(frame).flatten
    assert(audioMeta(adts).contains(
      ("aac", 48000, 2, 50L * 1024 * 1000 / 48000)))
    // Ogg/Vorbis: identification header (2 ch, 44100), EOS granule
    // 88200 samples at the STREAM's rate -> 2000 ms
    val vorbId = Array[Byte](1) ++ ascii("vorbis") ++
      le32b(0) ++ Array[Byte](2) ++ le32b(44100) ++
      le32b(0) ++ le32b(0) ++ le32b(0) ++ Array[Byte](0, 1)
    val vPage1 = ascii("OggS") ++ Array[Byte](0, 2) ++ le64b(0) ++
      le32b(9) ++ le32b(0) ++ le32b(0) ++
      Array[Byte](1, vorbId.length.toByte) ++ vorbId
    val vPage2 = ascii("OggS") ++ Array[Byte](0, 4) ++ le64b(88200) ++
      le32b(9) ++ le32b(1) ++ le32b(0) ++ Array[Byte](1, 1, 0)
    val vorbis = vPage1 ++ vPage2
    assert(audioMeta(vorbis).contains(("vorbis", 44100, 2, 2000L)))
    // totality: every truncation parses or NULLs, never throws
    Seq(opus, m4a, adts, vorbis).foreach(full =>
      (0 to full.length).foreach(n => audioMeta(full.take(n))))
    // hostile sizes: a box length past the buffer stops the walk
    val hostile = m4a.clone()
    hostile(0) = 0x7f; audioMeta(hostile)
  }

  test("avif/heic ispe walk parses hand-built trees; largest ispe wins; truncations total") {
    def bmff(brand: String, dims: Seq[(Int, Int)]): Array[Byte] = {
      val ispes = dims.map { case (w, h) =>
        box("ispe", Array.fill[Byte](4)(0) ++ be32b(w) ++ be32b(h))
      }.reduce(_ ++ _)
      box("ftyp", ascii(brand) ++ Array.fill[Byte](4)(0)) ++
        box("meta", Array.fill[Byte](4)(0) ++
          box("iprp", box("ipco", ispes)))
    }
    assert(imageDims(bmff("avif", Seq((640, 480))))
      .contains(("avif", 640, 480)))
    assert(imageDims(bmff("heic", Seq((160, 120), (4032, 3024))))
      .contains(("heic", 4032, 3024)), "primary (largest) ispe wins")
    assert(imageDims(bmff("mp42", Seq((640, 480)))).isEmpty,
      "a video brand is not an image")
    val full = bmff("avif", Seq((99, 77)))
    (0 to full.length).foreach(n => imageDims(full.take(n)))
    val hostile = full.clone(); hostile(16) = 0x7f
    imageDims(hostile)
  }

  test("state cache is LRU: a span walk over a >cap-version log pays one meta read per version") {
    val dir = tmp("r13_lru")
    val n = 30
    rangedTable(dir, nFiles = n)
    val oldCap = MorLog.stateCacheCap
    try {
      MorLog.stateCacheCap = 8 // force the cap well below the span
      MorLog.dropStateCache()
      MorLogStats.metaReads = 0L
      (0 until n).foreach(v => MorLog.state(spark, dir, v))
      // ascending walk: each state(v) stops at the just-cached v-1 —
      // one raw meta read per version (the round-12 wholesale clear
      // thrashed back to O(CheckpointEvery) reads mid-walk)
      assert(MorLogStats.metaReads <= n + 2,
        s"${MorLogStats.metaReads} meta reads for a $n-version walk")
    } finally {
      MorLog.stateCacheCap = oldCap
    }
  }
}
