package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.sink.{DvPerFile, MorLog, MorLogStats}
import graft.sources.MorLogStreamSinkStats

/** Round-15 specs: the retraction/committedGen gap race (advice-
  * caught), NOT NULL ADD COLUMNS refusal, SQL RENAME/DROP COLUMN
  * through the catalog, the bounded streaming-sink writer pool, the
  * length-prefixed partition-tuple key, netBy epoch netting,
  * predicate-scoped compact/cluster, the capped CDF exclude-path
  * collect, and the checkpoint-anchored history summary. */
class Round15Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def cat(root: String): String = {
    val c = "r15_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$c", "graft.sources.MorLogCatalog")
    spark.conf.set(s"spark.sql.catalog.$c.root", root)
    c
  }

  private def chain(t: Throwable): String = {
    var m = List.empty[String]
    var c: Throwable = t
    while (c != null) { m ::= String.valueOf(c.getMessage); c = c.getCause }
    m.mkString(" <- ")
  }

  // ---- retractMarker vs committedGen (advice-caught gap race) ------

  test("retractMarker never re-points below a rival's higher committed marker") {
    val hconf = spark.sparkContext.hadoopConfiguration
    def marker(d: String, g: Int): java.nio.file.Path =
      java.nio.file.Paths.get(DvPerFile.pfDir(d), s"_commit.g$g")
    def setup(markers: Seq[Int], ptr: Int): String = {
      val dir = s"${tmp("r15_retract")}/t"
      Files.createDirectories(java.nio.file.Paths.get(DvPerFile.pfDir(dir)))
      markers.foreach(g => Files.write(marker(dir, g), "0".getBytes))
      Files.write(java.nio.file.Paths.get(DvPerFile.pfDir(dir), "_current"),
        ptr.toString.getBytes)
      dir
    }
    // the advice scenario: loser g6 retracts AFTER the winner
    // committed g7 (pointer already reads 7) — the old re-point-at-
    // prevGen would park the pointer at 5, and the forward probe
    // stops at the gap the deletion opened → committedGen 5 < 7,
    // letting maintenance resolve tombstones below the committed
    // ceiling (resurrected deletes)
    val a = setup(Seq(5, 6, 7), ptr = 7)
    DvPerFile.retractMarker(hconf, a, 6)
    assert(DvPerFile.committedGen(spark, a).contains(7),
      "a retraction below the committed ceiling must not move the answer")
    // pointer still reads the retracted gen (the winner's pointer
    // write raced or failed): drop it — the one counted listing finds
    // the true max marker and heals
    val b = setup(Seq(5, 6, 7), ptr = 6)
    DvPerFile.retractMarker(hconf, b, 6)
    assert(DvPerFile.committedGen(spark, b).contains(7),
      "the listing fallback must find the rival's higher marker")
    assert(DvPerFile.committedGen(spark, b).contains(7),
      "the fallback must have healed the pointer")
    // no rival: retraction falls back to the previous marker
    val c = setup(Seq(5, 6), ptr = 6)
    DvPerFile.retractMarker(hconf, c, 6)
    assert(DvPerFile.committedGen(spark, c).contains(5))
    // DOUBLE pointer-write failure (review-caught): the pointer is
    // parked BELOW the gap the retraction opens while the rival's
    // marker sits above it — an at-or-below pointer must drop so the
    // listing finds the true ceiling
    val dd = setup(Seq(5, 6, 7), ptr = 5)
    DvPerFile.retractMarker(hconf, dd, 6)
    assert(DvPerFile.committedGen(spark, dd).contains(7),
      "a pointer below the retraction gap must not cap the answer")
  }

  // ---- schema evolution through SQL ALTER --------------------------

  test("ALTER TABLE: NOT NULL ADD refuses loud; RENAME/DROP COLUMN are metadata-only through SQL") {
    val root = tmp("r15_alter")
    val dir = s"$root/t"
    MorLog.create(spark.range(0, 40)
      .select(col("id").as("k"), (col("id") * 10).as("v"),
        (col("id") % 4).as("g")).repartition(2), dir)
    val c = cat(root)
    // nullable add works (one version, metadata-only)
    val files0 = MorLog.state(spark, dir,
      MorLog.currentVersion(spark, dir)).files
    spark.sql(s"ALTER TABLE $c.t ADD COLUMNS (note STRING)")
    assert(spark.table(s"$c.t").columns.toSeq ==
      Seq("k", "v", "g", "note"))
    // NOT NULL add: existing rows must NULL-fill → unsatisfiable;
    // silently coercing to nullable would drop a declared constraint
    val e = intercept[Throwable](
      spark.sql(s"ALTER TABLE $c.t ADD COLUMNS (bad INT NOT NULL)"))
    assert(chain(e).contains("NOT NULL"), chain(e))
    // RENAME COLUMN: zero data IO, old files read under the new name
    spark.sql(s"ALTER TABLE $c.t RENAME COLUMN v TO price")
    assert(MorLog.state(spark, dir,
      MorLog.currentVersion(spark, dir)).files == files0,
      "SQL RENAME COLUMN must not touch the file list")
    assert(spark.sql(s"SELECT sum(price) FROM $c.t").head().getLong(0) ==
      (0L until 40L).map(_ * 10).sum)
    // DROP COLUMN: metadata-only; the dropped name cannot be re-added
    // (the resurrection boundary holds through SQL)
    spark.sql(s"ALTER TABLE $c.t DROP COLUMN note")
    assert(spark.table(s"$c.t").columns.toSeq == Seq("k", "price", "g"))
    val e2 = intercept[Throwable](
      spark.sql(s"ALTER TABLE $c.t ADD COLUMNS (note STRING)"))
    assert(chain(e2).contains("DROPPED"), chain(e2))
    // type change still refuses loud
    val e3 = intercept[Throwable](
      spark.sql(s"ALTER TABLE $c.t ALTER COLUMN price TYPE DOUBLE"))
    assert(chain(e3).toLowerCase.contains("not supported"), chain(e3))
  }

  // ---- bounded streaming-sink writer pool ---------------------------

  test("streaming sink bounds open writers per task; eviction keeps one-tuple-per-file prune exact") {
    val work = tmp("r15_sinkpool")
    val (src, dst) = (s"$work/src", s"$work/dst")
    // 120 partition tuples interleaved within each task: worst case
    // for writer fan-out
    val df = spark.range(0, 240)
      .select(col("id").as("k"), (col("id") % 120).as("g"))
    MorLog.create(df.repartition(2), src)
    MorLog.createEmpty(spark, dst, df.schema, partitionBy = Seq("g"))
    MorLogStreamSinkStats.resetForTest()
    val q = spark.readStream.format("graft.sources.MorLogSource")
      .option("path", src).option("streamChanges", "true")
      .option("startingVersion", "0").load()
      .drop("_change_type", "_commit_version")
      .writeStream.format("graft.sources.MorLogSource")
      .option("path", dst)
      .option("maxOpenWriters", "8")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(MorLog.read(spark, dst).count() == 240)
    assert(MorLogStreamSinkStats.maxOpenObserved.get() <= 8,
      s"writer pool exceeded the cap: " +
        s"${MorLogStreamSinkStats.maxOpenObserved.get()}")
    assert(MorLogStreamSinkStats.writerEvictions.get() > 0,
      "120 tuples through an 8-writer pool must evict")
    // every file still holds ONE g value: a one-group read prunes to
    // that group's file(s) — eviction may split a tuple across files,
    // never mix tuples within one
    val one = MorLog.readWhere(spark, dst, col("g") === 7L)
    assert(one.count() == 2)
    assert(MorLogStats.lastFilesScanned >= 1 &&
      MorLogStats.lastFilesSkipped >= 10 * MorLogStats.lastFilesScanned,
      s"eviction broke tuple-file alignment (scanned " +
        s"${MorLogStats.lastFilesScanned}, skipped " +
        s"${MorLogStats.lastFilesSkipped})")
  }

  test("partition values containing the separator or the literal 'null' stay distinct tuples") {
    val work = tmp("r15_pipes")
    val (src, dst) = (s"$work/src", s"$work/dst")
    // raw '|'-joined keys would collide ("a|b") with ("a","b"-ish
    // neighbors) and SQL NULL with the string "null"
    val rows = Seq(
      (1L, "a|b"), (2L, "a|b"), (3L, "a"), (4L, "b|"),
      (5L, "null"), (6L, null.asInstanceOf[String]), (7L, "7:x"))
    val df = rows.toDF("k", "g")
    MorLog.create(df.repartition(1), src)
    MorLog.createEmpty(spark, dst, df.schema, partitionBy = Seq("g"))
    val q = spark.readStream.format("graft.sources.MorLogSource")
      .option("path", src).option("streamChanges", "true")
      .option("startingVersion", "0").load()
      .drop("_change_type", "_commit_version")
      .writeStream.format("graft.sources.MorLogSource")
      .option("path", dst)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(MorLog.read(spark, dst).count() == 7)
    // 6 distinct tuples (incl. NULL) → 6 files; a one-tuple read
    // scans exactly its own file
    val one = MorLog.readWhere(spark, dst, col("g") === "a|b")
    assert(one.count() == 2 &&
      one.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(MorLogStats.lastFilesScanned == 1,
      s"tuple collision: scanned ${MorLogStats.lastFilesScanned}")
    assert(MorLog.readWhere(spark, dst, col("g").isNull)
      .select("k").as[Long].collect().toSeq == Seq(6L),
      "SQL NULL must not collide with the string 'null'")
    assert(MorLog.readWhere(spark, dst, col("g") === "null")
      .select("k").as[Long].collect().toSeq == Seq(5L))
  }

  // ---- netBy epoch netting ------------------------------------------

  test("netBy last-wins-nets a multi-version epoch; ties and missing netBy refuse loud") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val work = tmp("r15_net")
    val dst = s"$work/dst"
    val schema = spark.range(0, 0)
      .select(col("id").as("k"), col("id").as("seq"),
        (col("id") * 1.0).as("value")).schema
    MorLog.create(Seq((2L, 0L, 2.0), (3L, 0L, 3.0))
      .toDF("k", "seq", "value"), dst)
    val in = MemoryStream[(Long, Long, Double, String)](spark)
    // ONE epoch carrying several versions' worth of changes:
    //   k=1: insert seq1, delete seq2, re-insert seq3  -> survives v=30
    //   k=2: update seq1, delete seq4                  -> dies
    //   k=3: delete seq1                                -> dies
    //   k=4: plain insert                               -> survives
    in.addData((1L, 1L, 10.0, "U"), (1L, 2L, 0.0, "D"),
      (1L, 3L, 30.0, "U"), (2L, 1L, 5.0, "U"), (2L, 4L, 0.0, "D"),
      (3L, 1L, 0.0, "D"), (4L, 1L, 4.0, "U"))
    val v0 = MorLog.currentVersion(spark, dst)
    val q = in.toDF().toDF("k", "seq", "value", "op")
      .writeStream.format("graft.sources.MorLogSource")
      .option("path", dst).option("mergeKey", "k")
      .option("opCol", "op").option("deleteValue", "D")
      .option("netBy", "seq")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(MorLog.currentVersion(spark, dst) == v0 + 1,
      "the netted epoch must land as ONE committed version")
    val got = MorLog.read(spark, dst).as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 30.0), (4L, 1L, 4.0)),
      s"netting drifted: $got")
    // equal (k, seq) duplicates in the data rows: ambiguous winner →
    // the epoch fails loud instead of picking one
    val in2 = MemoryStream[(Long, Long, Double, String)](spark)
    in2.addData((9L, 1L, 1.0, "U"), (9L, 1L, 2.0, "U"))
    val q2 = in2.toDF().toDF("k", "seq", "value", "op")
      .writeStream.format("graft.sources.MorLogSource")
      .option("path", dst).option("mergeKey", "k")
      .option("opCol", "op").option("deleteValue", "D")
      .option("netBy", "seq")
      .option("checkpointLocation", s"$work/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[Throwable] { q2.awaitTermination(120000) }
    assert(chain(e).contains("tie"), chain(e))
    // and WITHOUT netBy the duplicate-key epoch keeps refusing loud
    val in3 = MemoryStream[(Long, Long, Double, String)](spark)
    in3.addData((8L, 1L, 1.0, "U"), (8L, 2L, 2.0, "U"))
    val q3 = in3.toDF().toDF("k", "seq", "value", "op")
      .writeStream.format("graft.sources.MorLogSource")
      .option("path", dst).option("mergeKey", "k")
      .option("opCol", "op").option("deleteValue", "D")
      .option("checkpointLocation", s"$work/ckpt3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e3 = intercept[Throwable] { q3.awaitTermination(120000) }
    assert(chain(e3).contains("not unique"), chain(e3))
  }

  test("netBy on a PARTITIONED mirror keeps one-tuple-per-file alignment through the netting rewrite") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val work = tmp("r15_netpart")
    val dst = s"$work/dst"
    val schema = spark.range(0, 0)
      .select(col("id").as("k"), col("id").as("g"),
        col("id").as("seq")).schema
    MorLog.createEmpty(spark, dst, schema, partitionBy = Seq("g"))
    val in = MemoryStream[(Long, Long, Long, String)](spark)
    // duplicates per key FORCE the netting rewrite; winners span 3
    // partition tuples
    in.addData((1L, 0L, 1L, "U"), (1L, 0L, 2L, "U"),
      (2L, 1L, 1L, "U"), (2L, 1L, 3L, "U"),
      (3L, 2L, 1L, "U"))
    val q = in.toDF().toDF("k", "g", "seq", "op")
      .writeStream.format("graft.sources.MorLogSource")
      .option("path", dst).option("mergeKey", "k")
      .option("opCol", "op").option("deleteValue", "D")
      .option("netBy", "seq")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = MorLog.read(spark, dst).as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 2L), (2L, 1L, 3L), (3L, 2L, 1L)),
      s"netting drifted: $got")
    // the netted rewrite must keep one-tuple-per-file: a one-group
    // read scans exactly its own file
    assert(MorLog.readWhere(spark, dst, col("g") === 1L).count() == 1)
    assert(MorLogStats.lastFilesScanned == 1 &&
      MorLogStats.lastFilesSkipped == 2,
      s"netting rewrite broke partition alignment (scanned " +
        s"${MorLogStats.lastFilesScanned}, skipped " +
        s"${MorLogStats.lastFilesSkipped})")
  }

  // ---- composite-key locate pruning ----------------------------------

  test("composite-key MERGE prunes on EVERY key column's stats, not just the leading one") {
    val root = tmp("r15_ck")
    val dir = s"$root/t"
    // 8 files: ALL overlap on `a` (0..9), disjoint on `b` — a
    // leading-column-only prune would scan everything
    def slab(i: Int) = spark.range(0, 10)
      .select((col("id") % 10).as("a"), (col("id") + i * 100L).as("b"),
        col("id").as("v")).repartition(1)
    MorLog.create(slab(0), dir)
    (1 until 8).foreach(i => MorLog.append(spark, dir, slab(i)))
    val c = cat(root)
    Seq((3L, 303L, 9L)).toDF("a", "b", "delta")
      .createOrReplaceTempView("r15_cksrc")
    spark.sql(s"""
      MERGE INTO $c.t AS t USING r15_cksrc AS s
      ON t.a = s.a AND t.b = s.b
      WHEN MATCHED THEN UPDATE SET v = t.v + s.delta""")
    assert(MorLogStats.lastLocateScanned == 1 &&
      MorLogStats.lastLocateSkipped == 7,
      s"the second key column's stats must prune (scanned " +
        s"${MorLogStats.lastLocateScanned})")
    val got = MorLog.read(spark, dir)
      .filter(col("b") === 303L).select("v").as[Long].head()
    assert(got == 12L, s"tuple-matched update drifted: $got")
  }

  test("streaming sink with a COMPOSITE mergeKey: tuple upserts/deletes, netBy nets per tuple") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val work = tmp("r15_cksink")
    val dst = s"$work/dst"
    // key = (a, b): rows sharing `a` are DIFFERENT keys
    MorLog.create(Seq(
      (1L, "x", 10L, 0L), (1L, "y", 11L, 0L), (2L, "x", 20L, 0L))
      .toDF("a", "b", "v", "seq"), dst)
    val in = MemoryStream[(Long, String, Long, Long, String)](spark)
    // (1,x): update seq1 then delete seq2 -> dies; (1,y): update ->
    // 111; (2,x) untouched; (3,z): insert twice, last (seq5) wins
    in.addData(
      (1L, "x", 99L, 1L, "U"), (1L, "x", 0L, 2L, "D"),
      (1L, "y", 111L, 1L, "U"),
      (3L, "z", 30L, 4L, "U"), (3L, "z", 33L, 5L, "U"))
    val v0 = MorLog.currentVersion(spark, dst)
    val q = in.toDF().toDF("a", "b", "v", "seq", "op")
      .writeStream.format("graft.sources.MorLogSource")
      .option("path", dst).option("mergeKey", "a,b")
      .option("opCol", "op").option("deleteValue", "D")
      .option("netBy", "seq")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(MorLog.currentVersion(spark, dst) == v0 + 1)
    val got = MorLog.read(spark, dst).as[(Long, String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, "y", 111L, 1L), (2L, "x", 20L, 0L),
      (3L, "z", 33L, 5L)), s"composite-key apply drifted: $got")
  }

  test("upsertKeys/mergeIntoKeys: tuple-keyed Scala ops match single-key semantics and refuse NULL ops") {
    val work = tmp("r15_ckops")
    val dir = s"$work/t"
    MorLog.create(Seq((1L, "x", 10L), (1L, "y", 11L), (2L, "x", 20L))
      .toDF("a", "b", "v").repartition(1), dir)
    // tuple upsert: replace (1,x), insert (3,z) — (1,y) untouched
    MorLog.upsertKeys(spark, dir,
      Seq((1L, "x", 100L), (3L, "z", 30L)).toDF("a", "b", "v"),
      Seq("a", "b"))
    val got1 = MorLog.read(spark, dir).as[(Long, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got1 == Seq((1L, "x", 100L), (1L, "y", 11L), (2L, "x", 20L),
      (3L, "z", 30L)), s"upsertKeys drifted: $got1")
    // op-tagged tuple merge: delete (1,y), upsert (2,x), insert (4,w)
    val (ups, dels) = MorLog.mergeIntoKeys(spark, dir,
      Seq((1L, "y", 0L, "D"), (2L, "x", 200L, "U"), (4L, "w", 40L, "U"))
        .toDF("a", "b", "v", "op"),
      Seq("a", "b"), "op")
    assert(ups == 2 && dels == 1, s"counts drifted: $ups/$dels")
    val got2 = MorLog.read(spark, dir).as[(Long, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got2 == Seq((1L, "x", 100L), (2L, "x", 200L), (3L, "z", 30L),
      (4L, "w", 40L)), s"mergeIntoKeys drifted: $got2")
    // NULL op refuses loud, nothing committed
    val v = MorLog.currentVersion(spark, dir)
    val e = intercept[Throwable](MorLog.mergeIntoKeys(spark, dir,
      Seq((9L, "q", 1L, null.asInstanceOf[String]))
        .toDF("a", "b", "v", "op"), Seq("a", "b"), "op"))
    assert(chain(e).contains("NULL op"), chain(e))
    assert(MorLog.currentVersion(spark, dir) == v)
  }

  // ---- predicate-scoped maintenance ---------------------------------

  test("compactWhere rewrites only the stats-selected partition; other files stay byte-identical") {
    val root = tmp("r15_cw")
    val dir = s"$root/t"
    // 5 identity partitions × 2 appends = 10 files, 2 per g
    val mk = (g: Int, off: Int) => spark.range(0, 10)
      .select((col("id") + off).as("k"), lit(g.toLong).as("g"),
        (col("id") * 2).as("v")).repartition(1)
    MorLog.createEmpty(spark, dir, mk(0, 0).schema, Seq("g"))
    (0 until 5).foreach { g =>
      MorLog.append(spark, dir, mk(g, 0))
      MorLog.append(spark, dir, mk(g, 10))
    }
    val st0 = MorLog.state(spark, dir, MorLog.currentVersion(spark, dir))
    assert(st0.files.size == 10)
    val n = MorLog.compactWhere(spark, dir, col("g") === 3L)
    assert(n == 2, s"must rewrite exactly g=3's two files, got $n")
    assert(MorLogStats.lastLocateScanned == 2 &&
      MorLogStats.lastLocateSkipped == 8,
      "compactWhere must stats-prune its rewrite set")
    val st1 = MorLog.state(spark, dir, MorLog.currentVersion(spark, dir))
    assert(st0.files.filter(st1.files.contains).size == 8,
      "the other partitions' files must carry over untouched")
    assert(st1.files.size == 9, s"g=3 must fold 2→1 (${st1.files.size})")
    assert(MorLog.read(spark, dir).count() == 100,
      "compactWhere must be value-invisible")
    // the compacted partition still prunes exactly
    assert(MorLog.readWhere(spark, dir, col("g") === 3L).count() == 20)
    assert(MorLogStats.lastFilesScanned == 1 &&
      MorLogStats.lastFilesSkipped == 8)
    // CALL surface: compact the whole of g=1 through SQL, with the
    // positional default ('' = whole table) left alone elsewhere
    val c = cat(root)
    val packed = spark.sql(
      s"CALL $c.system.compact('t', 'g = 1')").head().getInt(0)
    assert(packed == 2, s"CALL compact(where) must scope, got $packed")
    assert(MorLog.read(spark, dir).count() == 100)
    // an empty predicate match is a no-op version-wise
    assert(MorLog.compactWhere(spark, dir, col("g") === 99L) == 0)
    // cluster takes the same scope: re-curve ONE partition in
    // O(partition)
    val clustered = spark.sql(
      s"CALL $c.system.cluster('t', 'k,v', 'g = 2')").head().getInt(0)
    assert(clustered == 2, s"scoped cluster must rewrite g=2's two " +
      s"files, got $clustered")
    assert(MorLog.read(spark, dir).count() == 100)
  }

  test("streaming sink derives hidden days(ts) tuples executor-side, matching the batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val work = tmp("r15_sinkdays")
    val dst = s"$work/dst"
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val schema = spark.range(0, 0)
      .select(col("id").as("k"),
        lit(t("2024-01-01 00:00:00")).as("ts")).schema
    MorLog.createEmpty(spark, dst, schema, partitionBy = Seq("days(ts)"))
    val in = MemoryStream[(Long, java.sql.Timestamp)](spark)
    in.addData(
      (1L, t("2024-03-01 00:00:01")), (2L, t("2024-03-01 23:59:59")),
      (3L, t("2024-03-02 12:00:00")), (4L, t("2024-03-03 00:00:00")))
    val q = in.toDF().toDF("k", "ts")
      .writeStream.format("graft.sources.MorLogSource")
      .option("path", dst)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(MorLog.read(spark, dst).count() == 4)
    // one-day read: exactly the 2024-03-01 file (2 rows), the other
    // two day files skipped — only possible if the sink's
    // executor-side day derivation matches the batch path's
    // session-zone boundaries
    val one = MorLog.readWhere(spark, dst,
      col("ts") >= lit(t("2024-03-01 00:00:00")) &&
        col("ts") < lit(t("2024-03-02 00:00:00")))
    assert(one.count() == 2)
    assert(MorLogStats.lastFilesScanned == 1 &&
      MorLogStats.lastFilesSkipped == 2,
      s"sink day alignment drifted (scanned " +
        s"${MorLogStats.lastFilesScanned}, skipped " +
        s"${MorLogStats.lastFilesSkipped})")
  }

  // ---- namespaces -----------------------------------------------------

  test("CREATE/SHOW/DROP NAMESPACE: a namespace IS a directory; drop refuses non-empty without CASCADE") {
    val root = tmp("r15_ns")
    val c = cat(root)
    spark.sql(s"CREATE NAMESPACE $c.staging")
    assert(spark.sql(s"SHOW NAMESPACES IN $c").collect()
      .map(_.getString(0)).contains("staging"))
    spark.sql(s"CREATE TABLE $c.staging.t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $c.staging.t VALUES (1, 10), (2, 20)")
    assert(spark.sql(s"SELECT sum(v) FROM $c.staging.t")
      .head().getLong(0) == 30)
    // a table dir is NOT a namespace
    assert(!spark.sql(s"SHOW NAMESPACES IN $c").collect()
      .map(_.getString(0)).contains("t"))
    // non-empty drop refuses without CASCADE
    val e = intercept[Throwable](
      spark.sql(s"DROP NAMESPACE $c.staging"))
    assert(chain(e).toLowerCase.contains("empty") ||
      e.getClass.getSimpleName.contains("NonEmpty"), chain(e))
    spark.sql(s"DROP NAMESPACE $c.staging CASCADE")
    assert(!spark.sql(s"SHOW NAMESPACES IN $c").collect()
      .map(_.getString(0)).contains("staging"))
    // ALTER NAMESPACE has nowhere to store metadata → refuses loud
    spark.sql(s"CREATE NAMESPACE $c.m")
    val e2 = intercept[Throwable](spark.sql(
      s"ALTER NAMESPACE $c.m SET PROPERTIES ('k'='v')"))
    assert(chain(e2).contains("no namespace metadata"), chain(e2))
  }

  // ---- connector scan statistics --------------------------------------

  test("the scan reports stats off cached footer counts: small tables auto-broadcast, pushed filters shrink the estimate") {
    val root = tmp("r15_stats")
    val dir = s"$root/t"
    // 4 files with disjoint k ranges, ~100 rows total
    def slab(i: Int) = spark.range(i * 100L, i * 100L + 25L)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartition(1)
    MorLog.create(slab(0), dir)
    (1 until 4).foreach(i => MorLog.append(spark, dir, slab(i)))
    val c = cat(root)
    val small = spark.table(s"$c.t")
    // numRows estimate = exact footer counts; sizeInBytes = rows×width
    val st = small.queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(100)),
      s"scan stats must carry the footer row count, got ${st.rowCount}")
    // a pushed filter prunes files BEFORE the estimate: one slab only
    val oneSlab = small.filter(col("k") >= 100 && col("k") < 200)
    assert(oneSlab.queryExecution.optimizedPlan.stats.rowCount
      .contains(BigInt(25)),
      "the estimate must reflect the stats-pruned file set")
    // the payoff: joined to a big side, the SMALL log table is chosen
    // as the broadcast side with NO hint (without reported stats a V2
    // relation weighs defaultSizeInBytes ≈ ∞ and this plans a
    // sort-merge join)
    val big = spark.range(0, 3000000L).select(col("id").as("k"),
      (col("id") % 7).as("w"))
    val joined = big.join(small, "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 100-row log table must auto-broadcast, got:\n$plan")
  }

  // ---- capped CDF exclude-path collect -------------------------------

  test("the exclude-path CDF collect rides the driver cap like its siblings") {
    val dir = s"${tmp("r15_excl")}/t"
    MorLog.create(spark.range(0, 100)
      .select(col("id").as("k"), col("id").as("v")).repartition(2), dir)
    MorLog.deleteWhere(spark, dir, col("k") % 3 === 0) // 34 tombstones
    // an overwrite REMOVES the tombstoned files: the change span must
    // emit their previously-visible rows (exclude specs), whose
    // tombstone map is the one formerly-unguarded driver collect
    MorLog.overwrite(spark, dir, spark.range(200, 210)
      .select(col("id").as("k"), col("id").as("v")))
    def changes() = spark.read.format("graft.sources.MorLogSource")
      .option("path", dir).option("changesFrom", "1").load().count()
    val ok = changes() // under the default cap
    assert(ok > 0)
    spark.conf.set(MorLog.CdfCapKey, "10")
    try {
      val e = intercept[Throwable](changes())
      assert(chain(e).contains("outgrown the broadcast tier"), chain(e))
    } finally spark.conf.unset(MorLog.CdfCapKey)
    assert(changes() == ok, "the guard must not change results")
  }

  // ---- checkpoint-anchored history summary ---------------------------

  test("history/versionAt read O(1) metas beyond the summary and match the state walk exactly") {
    val dir = s"${tmp("r15_hist")}/t"
    MorLog.create(spark.range(0, 4)
      .select(col("id").as("k"), col("id").as("v")).repartition(1), dir)
    (1 to 34).foreach(i => MorLog.append(spark, dir,
      Seq((100L + i, i.toLong)).toDF("k", "v")))
    val vTip = MorLog.currentVersion(spark, dir)
    assert(vTip == 34)
    // summary-served history: a cold driver reads only the tail's
    // metas (the last chunk landed at v30; 31..34 walk) plus the
    // first version's recompute — never O(versions)
    MorLog.dropStateCache()
    val before = MorLogStats.metaReads
    val h = MorLog.history(spark, dir).collect()
    val cost = MorLogStats.metaReads - before
    assert(h.length == 35)
    assert(cost <= 18, s"history read $cost metas on a 35-version log " +
      "— the summary must serve the covered span")
    // versionAt off the summary: resolving an old version's stamp
    // must not walk every state
    MorLog.dropStateCache()
    val before2 = MorLogStats.metaReads
    val tsMid = h(20).getTimestamp(7).getTime
    assert(MorLog.versionAt(spark, dir, tsMid) == 20)
    assert(MorLogStats.metaReads - before2 <= 18,
      s"versionAt read ${MorLogStats.metaReads - before2} metas")
    // ground truth: delete every chunk → the pure state walk must
    // produce EXACTLY the same rows
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_log")).foreach {
      s => if (s.getPath.getName.endsWith(".hist"))
        fs.delete(s.getPath, false)
    }
    MorLog.invalidateDir(dir)
    val wRows = MorLog.history(spark, dir).collect()
    assert(wRows.toSeq.map(_.toString) == h.toSeq.map(_.toString),
      "summary-served history drifted from the state walk")
    // vacuum keeps in-floor chunks, sweeps below-floor ones, and the
    // first retained version's row diffs against nothing-retained
    MorLog.vacuum(spark, dir, keepVersions = 10)
    val h2 = MorLog.history(spark, dir).collect()
    assert(h2.length == 10 && h2.head.getInt(3) == h2.head.getInt(2),
      "the first retained version must show all files as added")
  }
}
