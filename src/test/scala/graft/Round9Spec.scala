package graft

import graft.sink.{BloomSkipIndex, DeletionVectors, DvStats}
import graft.streaming.{StreamMoR, StreamMorGold}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Specs for the round-9 scale fixes — invariants the row oracle
  * can't see: the DISTRIBUTED bloom probe (large keyed batches prune
  * the locate without driver-side literals), the mid-drain pruned
  * locate and pre-image fetch of the streaming MoR paths (file-count
  * assertions, q193-style), presence-vs-nullability delta routing on
  * NULL-valued fact rows, no-stage-on-contract-violation, and the
  * vacuum grace generation. */
class Round9Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def dataFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
  }

  // ---- distributed bloom probe -------------------------------------

  test("survivingFilesForKeyDf prunes like the literal probe, at any key-set size") {
    val work = tmp("graft-r9dp-")
    val dir = s"$work/t"
    // 64 files hash-clustered on id, ~62 keys/file: FPR per (absent
    // key, file) ≈ (1−e^(−4·62/1024))⁴ ≈ 0.2% — ghosts prune hard
    val df = (0L until 4000L).map(i => (i, s"v$i")).toDF("id", "v")
    BloomSkipIndex.bloomWrite(df, "id", dir, nFiles = 64)
    // 1k-key probe set — far past the 256 driver-literal cap
    val keys = (0L until 1000L).map(i => i * 4).toDF("id")
    val files = BloomSkipIndex.survivingFilesForKeyDf(spark, dir, "id", keys)
    assert(files.nonEmpty && files.size <= 64)
    // exactness: the distributed probe must agree with the literal
    // probe on a small common subset (no containing file skipped)
    val lit5 = Seq(lit(0L), lit(4L), lit(8L), lit(12L), lit(16L))
    val litFiles = BloomSkipIndex.survivingFiles(spark, dir, "id", lit5)
    val dfFiles = BloomSkipIndex.survivingFilesForKeyDf(
      spark, dir, "id", Seq(0L, 4L, 8L, 12L, 16L).toDF("id"))
    assert(litFiles.toSet == dfFiles.toSet,
      "distributed and literal probes disagree on the same key set")
    // a probe for an ABSENT key must prune to (near) nothing
    val ghost = BloomSkipIndex.survivingFilesForKeyDf(
      spark, dir, "id", Seq(10_000_000L).toDF("id"))
    assert(ghost.size <= 4, s"ghost key survived ${ghost.size} files")
  }

  test("deleteByKeyDf prunes the locate for a 5k-key batch and deletes exactly") {
    val work = tmp("graft-r9dk-")
    val dir = s"$work/t"
    val df = (0L until 20000L).map(i => (i, i % 7)).toDF("id", "g")
    BloomSkipIndex.bloomWrite(df, "id", dir, nFiles = 64)
    val nFilesTotal = dataFiles(dir).size
    val keys = (0L until 5000L).map(i => i * 3).toDF("id") // 5k keys
    DvStats.lastLocateFiles = None
    val n = DeletionVectors.deleteByKeyDf(spark, dir, "id", keys)
    assert(n == 5000L, s"expected 5000 deletes, got $n")
    // the locate must have taken the PRUNED path (hash-clustered on
    // id, 5k of 20k keys → most files contain a victim, but the path
    // taken must be the probe, recorded as Some)
    assert(DvStats.lastLocateFiles.exists(_ <= nFilesTotal),
      s"5k-key locate did not take the distributed probe path: ${DvStats.lastLocateFiles}")
    val left = DeletionVectors.read(spark, dir).count()
    assert(left == 20000L - 5000L)
    // and a SMALL absent-key batch takes the pruned path too (at
    // ~312 keys/file the per-file FPR is ~25%, so it still reads a
    // minority of the files — the point is the path, the tight-FPR
    // case is covered above at 62 keys/file)
    DvStats.lastLocateFiles = None
    val n2 = DeletionVectors.deleteByKeyDf(spark, dir, "id",
      Seq(99_999_999L).toDF("id"))
    assert(n2 == 0L)
    assert(DvStats.lastLocateFiles.exists(_ < nFilesTotal / 2),
      s"absent-key locate read ${DvStats.lastLocateFiles} files")
  }

  test("visibleByKeyDf fetches exactly the keys' visible rows through a pruned read") {
    val work = tmp("graft-r9vf-")
    val dir = s"$work/t"
    val df = (0L until 8000L).map(i => (i, i * 1.5)).toDF("id", "v")
    BloomSkipIndex.bloomWrite(df, "id", dir, nFiles = 32)
    // tombstone two of the keys we'll fetch — they must NOT come back
    DeletionVectors.deleteByKeys(spark, dir, "id", Seq(lit(10L), lit(20L)))
    DvStats.lastFetchFiles = None
    val got = DeletionVectors.visibleByKeyDf(spark, dir, "id",
        Seq(10L, 20L, 30L, 40L).toDF("id"))
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(got == Set((30L, 45.0), (40L, 60.0)),
      s"fetch returned $got — deleted rows resurrected or keys missed")
    assert(DvStats.lastFetchFiles.exists(_ < 32),
      s"fetch did not prune: ${DvStats.lastFetchFiles}")
  }

  // ---- mid-drain pruning (the round-8 verdict's `weak`) ------------

  test("mid-drain MoR locate reads only may-contain files, batch after batch") {
    val work = tmp("graft-r9md-")
    val dir = s"$work/t"
    // bootstrap table: 16 hash-clustered files, bloom-indexed
    val base = (0L until 4000L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "v")
    BloomSkipIndex.bloomWrite(base, "id", dir, nFiles = 16)
    // five batches, each touching a handful of keys
    for (b <- 0 until 5) {
      val lo = b * 10L
      val batch = Seq(
        (lo + 1, "u", -1.0, "U"), (lo + 2, "d", 0.0, "D"),
        (100000L + b, "i", 9.0, "I")).toDF("id", "name", "v", "op")
      DvStats.lastLocateFiles = None
      StreamMoR.applyBatch(spark, dir, batch, b.toLong, "id", "op")
      // EVERY batch's locate must take the pruned path — including
      // the ones after the stream's own appends (the round-8 gap:
      // appends staled the sidecar and nothing folded it)
      assert(DvStats.lastLocateFiles.nonEmpty,
        s"batch $b locate fell back to a full table scan")
      assert(BloomSkipIndex.hasFreshSidecar(spark, dir, "id"),
        s"sidecar stale after batch $b")
    }
    // value correctness after the drain
    val got = DeletionVectors.read(spark, dir)
    assert(got.count() == 4000L - 5 /*deleted*/ + 5 /*inserted*/)
    assert(got.filter(col("id") === 41L).select("v")
      .as[Double].head() == -1.0)
  }

  test("mid-drain pre-image fetch is pruned and gold stays exact (incl. compaction)") {
    val work = tmp("graft-r9mg-")
    val fact = s"$work/fact"
    val gold = s"$work/gold"
    val userCountry = (1L to 400L).map(k => (k, s"C${k % 3}"))
      .toDF("user_id", "country")
    // bootstrap fact: bloom-clustered on user_id
    val base = (1L to 300L).map(k =>
      (k, k * 1.0, "2024-01-01 00:00:00")).toDF("user_id", "value", "ts_s")
    BloomSkipIndex.bloomWrite(base, "user_id", fact, nFiles = 16)
    StreamMorGold.bootstrapGold(spark, fact, gold, userCountry)
    for (b <- 0 until 4) {
      val lo = b * 20L
      val batch = Seq(
        (lo + 1, 500.0, s"2024-01-02 00:0$b:00", "U"),
        (lo + 2, 0.0, s"2024-01-02 00:0$b:01", "D"),
        (301L + b, 7.0, s"2024-01-02 00:0$b:02", "I"))
        .toDF("user_id", "value", "ts_s", "op")
      DvStats.lastFetchFiles = None
      DvStats.lastLocateFiles = None
      StreamMorGold.processBatch(batch, b.toLong, fact, gold,
        userCountry, "user_id", "op")
      assert(DvStats.lastFetchFiles.nonEmpty,
        s"batch $b pre-image fetch fell back to a full fact scan")
      assert(DvStats.lastLocateFiles.nonEmpty,
        s"batch $b locate fell back to a full fact scan")
      // inline compaction between batches: the next batch's pre-stage
      // fold must reconcile the rewritten files and STILL prune
      if (b == 1) DeletionVectors.compactIfNeeded(spark, fact, 0.01)
    }
    // exactness: folded gold == from-scratch aggregate of final fact
    val folded = graft.sink.AtomicParquetSink.read(spark, gold).get
      .filter(col("n_users") =!= 0L)
      .select("country", "n_users", "total_value")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(t => (t._1, t._2, t._3.doubleValue)).toSet
    val scratch = DeletionVectors.read(spark, fact)
      .join(userCountry, "user_id").groupBy(col("country"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("tv"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(t => (t._1, t._2, t._3.doubleValue)).toSet
    assert(folded == scratch, s"folded $folded != scratch $scratch")
  }

  // ---- presence vs nullability -------------------------------------

  test("a NULL-valued fact row is PRESENT: its delete retracts, its update doesn't double-count") {
    val work = tmp("graft-r9nv-")
    val fact = s"$work/fact"
    val gold = s"$work/gold"
    val userCountry = Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("user_id", "country")
    Seq((1L, Option.empty[java.lang.Double], "2024-01-01 00:00:00"),
        (2L, Option(10.0: java.lang.Double), "2024-01-01 00:00:01"),
        (3L, Option.empty[java.lang.Double], "2024-01-01 00:00:02"))
      .toDF("user_id", "value", "ts_s")
      .select(col("user_id"), col("value").cast("double").as("value"),
        col("ts_s"))
      .write.parquet(fact)
    StreamMorGold.bootstrapGold(spark, fact, gold, userCountry)
    // delete the NULL-valued user 1; update the NULL-valued user 3
    StreamMorGold.processBatch(
      Seq((1L, 0.0, "2024-01-02 00:00:00", "D"),
          (3L, 5.0, "2024-01-02 00:00:01", "U"))
        .toDF("user_id", "value", "ts_s", "op"),
      0L, fact, gold, userCountry, "user_id", "op")
    val g = graft.sink.AtomicParquetSink.read(spark, gold).get
      .select("country", "n_users", "total_value")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(t => t._1 -> ((t._2, t._3.doubleValue))).toMap
    // A: user 1 retracted (was present despite NULL value) → 1 user;
    // B: user 3 updated in place → still 1 user, value 0→5
    assert(g("A") == ((1L, 10.0)), s"country A drifted: ${g("A")}")
    assert(g("B") == ((1L, 5.0)), s"country B drifted: ${g("B")}")
  }

  // ---- contract violation leaves no durable stage ------------------

  test("a contract-violating batch stages nothing — a repaired replay can't reuse stale deltas") {
    val work = tmp("graft-r9cv-")
    val fact = s"$work/fact"
    val gold = s"$work/gold"
    Seq((1L, 10.0, "2024-01-01 00:00:00"))
      .toDF("user_id", "value", "ts_s").write.parquet(fact)
    val bad = Seq((1L, 1.0, "2024-01-02 00:00:00", "U"),
        (1L, 2.0, "2024-01-02 00:00:01", "U")) // duplicate key
      .toDF("user_id", "value", "ts_s", "op")
    intercept[IllegalArgumentException] {
      StreamMorGold.stageDeltas(bad, 7L, fact, gold, "user_id", "op")
    }
    val staged = new java.io.File(s"$gold-staging/batch_7")
    assert(!staged.exists,
      "violating batch left a durable stage behind")
    // the repaired batch under the SAME id stages its own (correct) deltas
    val fixed = Seq((1L, 2.0, "2024-01-02 00:00:01", "U"))
      .toDF("user_id", "value", "ts_s", "op")
    val deltas = StreamMorGold
      .stageDeltas(fixed, 7L, fact, gold, "user_id", "op")
      .select("user_id", "d_users", "d_value")
      .as[(Long, Long, java.math.BigDecimal)].collect()
      .map(t => (t._1, t._2, t._3.doubleValue)).toSet
    assert(deltas == Set((1L, 0L, -8.0)))
  }

  // ---- exact last_seen retraction ----------------------------------

  test("exactLastSeen steps last_seen BACK when a country's max-holder is deleted") {
    val work = tmp("graft-r9ex-")
    val userCountry = Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("user_id", "country")
    // user 2 holds country A's max ts — then gets deleted
    Seq((1L, 10.0, "2024-01-01 00:00:00"),
        (2L, 20.0, "2024-06-01 00:00:00"),
        (3L, 30.0, "2024-01-01 00:00:05"))
      .toDF("user_id", "value", "ts_s").write.parquet(s"$work/fact")
    val del = Seq((2L, 0.0, "2024-07-01 00:00:00", "D"))
      .toDF("user_id", "value", "ts_s", "op")
    // default fold: running max keeps the deleted row's ts
    StreamMorGold.bootstrapGold(spark, s"$work/fact", s"$work/gold0", userCountry)
    StreamMorGold.processBatch(del, 0L, s"$work/fact", s"$work/gold0",
      userCountry, "user_id", "op")
    val lax = graft.sink.AtomicParquetSink.read(spark, s"$work/gold0").get
      .filter(col("country") === "A").select("last_seen")
      .as[String].head()
    assert(lax == "2024-06-01 00:00:00", s"default fold changed: $lax")
    // exact mode on a fresh copy of the same fact: last_seen retracts
    spark.read.parquet(s"$work/fact").write.parquet(s"$work/fact2")
    StreamMorGold.bootstrapGold(spark, s"$work/fact2", s"$work/gold1", userCountry)
    StreamMorGold.processBatch(del, 0L, s"$work/fact2", s"$work/gold1",
      userCountry, "user_id", "op", exactLastSeen = true)
    val exact = graft.sink.AtomicParquetSink.read(spark, s"$work/gold1").get
      .filter(col("country") === "A")
      .select("n_users", "last_seen").as[(Long, String)].head()
    assert(exact == ((1L, "2024-01-01 00:00:00")),
      s"exact mode did not retract: $exact")
  }

  test("q206's data really exercises the retraction (not vacuously green)") {
    // the oracle entry only pins the retraction if some country's
    // max-ts winner has user_id % 3 == 0 at the test scale — assert
    // that holds on sf0.001 (and by extension the larger sfs, which
    // superset the keys), so the q-entry can't go green by accident
    val d = "/root/testdata/sf0.001"
    val changes = graft.sources.Tables.events(spark, d).select(
      col("event_id"), col("user_id"), col("value"), col("event_type"),
      graft.Oracle.fmtTs(col("ts")).as("ts_s"))
    val (ok, _) = graft.ops.CdcOps.qualitySplit(changes,
      col("event_type") === "error")
    val winners = graft.ops.CdcOps.latestPerKey(ok, Seq("user_id"),
      Seq(col("ts_s"), col("event_id")))
    val userCountry = graft.sources.Tables.customer(spark, d)
      .join(graft.sources.Tables.nation(spark, d),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name").as("country"))
    val perCountryMax = winners.join(userCountry, "user_id")
      .withColumn("rn", org.apache.spark.sql.expressions.Window
        .partitionBy("country") match { case w =>
          row_number().over(w.orderBy(col("ts_s").desc, col("event_id").desc)) })
      .filter(col("rn") === 1)
    val retracted = perCountryMax.filter(col("user_id") % 3 === 0).count()
    assert(retracted > 0,
      "no country's max-holder is deleted by q206's %3==0 feed — the " +
        "oracle entry would be vacuously green; change the feed predicate")
  }

  // ---- randomized histories at the larger envelope -----------------

  test("property: random CDC histories with compaction interleave and crash replays converge exactly") {
    // The round-8 random-history property (5 batches, ≤8 keys, no
    // maintenance, no replays) caught real bugs; this is the larger
    // envelope the round-8 verdict asked for: 8 batches, ≤12 keys,
    // a bloom-INDEXED fact (so the pruned locate/fetch paths carry
    // the history), random compactIfNeeded/compactSmallFiles between
    // batches, and crash-shaped replays (stop after stage; stop after
    // apply; full double-apply) injected per batch. Gold must equal
    // the from-scratch aggregate of the final visible fact EXACTLY.
    val userCountry = (1L to 16L).map(k => (k, s"C${k % 4}"))
      .toDF("user_id", "country")
    for (seed <- Seq(5, 17, 29)) {
      val rnd = new scala.util.Random(seed)
      val work = tmp(s"graft-r9pp$seed-")
      val fact = s"$work/fact"
      val gold = s"$work/gold"
      val base = (1L to 10L).map(k =>
        (k, rnd.nextInt(1000) / 100.0, "2024-01-01 00:00:00"))
        .toDF("user_id", "value", "ts_s")
      BloomSkipIndex.bloomWrite(base, "user_id", fact, nFiles = 4)
      StreamMorGold.bootstrapGold(spark, fact, gold, userCountry)
      var ts = 0
      for (b <- 0 until 8) {
        val keys = rnd.shuffle((1L to 16L).toList).take(1 + rnd.nextInt(12))
        val rows = keys.map { k =>
          ts += 1
          (k, rnd.nextInt(10000) / 100.0,
            f"2024-01-02 00:${ts / 60}%02d:${ts % 60}%02d",
            Seq("I", "U", "D")(rnd.nextInt(3)))
        }
        val df = rows.toDF("user_id", "value", "ts_s", "op")
        def full(): Unit = StreamMorGold.processBatch(
          df, b.toLong, fact, gold, userCountry, "user_id", "op")
        rnd.nextInt(4) match {
          case 0 => // crash after stage → replay
            StreamMorGold.stageDeltas(df, b.toLong, fact, gold,
              "user_id", "op")
            full()
          case 1 => // crash after apply (fold pending) → replay
            StreamMorGold.stageDeltas(df, b.toLong, fact, gold,
              "user_id", "op")
            StreamMoR.applyBatch(spark, fact, df, b.toLong,
              "user_id", "op")
            full()
          case 2 => full(); full() // clean run + spurious redelivery
          case _ => full()
        }
        rnd.nextInt(3) match {
          case 0 => DeletionVectors.compactIfNeeded(spark, fact, 0.05)
          case 1 => DeletionVectors.compactSmallFiles(spark, fact,
            smallBytes = 1L << 20, targetBytes = 4L << 20)
          case _ => ()
        }
      }
      val folded = graft.sink.AtomicParquetSink.read(spark, gold).get
        .filter(col("n_users") =!= 0L)
        .select("country", "n_users", "total_value")
        .as[(String, Long, java.math.BigDecimal)].collect()
        .map(t => (t._1, t._2, t._3.doubleValue)).toSet
      val scratch = DeletionVectors.read(spark, fact)
        .join(userCountry, "user_id").groupBy(col("country"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("tv"))
        .as[(String, Long, java.math.BigDecimal)].collect()
        .map(t => (t._1, t._2, t._3.doubleValue)).toSet
      assert(folded == scratch,
        s"seed $seed: folded $folded != from-scratch $scratch")
    }
  }

  test("property: random evolve/drop/delete/upsert/compact histories match an in-memory model") {
    import scala.collection.mutable
    import org.apache.spark.sql.types._
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val work = tmp(s"graft-r9sev$seed-")
      val dir = s"$work/t"
      // model: id -> (visible col -> Option[Long] value); id is col 0
      var cols = Vector("id", "c0")
      val model = mutable.LinkedHashMap[Long, mutable.Map[String, Option[Long]]]()
      var nextId = 0L
      var nextCol = 1
      def newRow(id: Long, vals: Map[String, Option[Long]]) : Unit =
        model(id) = mutable.Map(cols.filter(_ != "id")
          .map(c => c -> vals.getOrElse(c, None)): _*)
      def df(rows: Seq[Long], valueCols: Seq[String]): org.apache.spark.sql.DataFrame = {
        val schema = StructType(StructField("id", LongType, nullable = false) +:
          valueCols.map(c => StructField(c, LongType, nullable = true)))
        val data = rows.map { id =>
          org.apache.spark.sql.Row.fromSeq(id +: valueCols.map(c =>
            model(id)(c).map(Long.box).orNull))
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(data, 2), schema)
      }
      // seed table: 30 rows (id, c0)
      (0 until 30).foreach { _ =>
        val id = nextId; nextId += 1
        newRow(id, Map("c0" -> Some(rnd.nextInt(100).toLong)))
      }
      BloomSkipIndex.bloomWrite(df(model.keys.toSeq, Seq("c0")),
        "id", dir, nFiles = 4)
      for (step <- 0 until 12) {
        rnd.nextInt(5) match {
          case 0 => // evolved append: fresh ids, possibly a NEW column
            val addCol = rnd.nextBoolean()
            if (addCol) { cols = cols :+ s"c$nextCol"; nextCol += 1
              model.values.foreach(_(cols.last) = None) }
            val fresh = (0 until (1 + rnd.nextInt(6))).map { _ =>
              val id = nextId; nextId += 1
              newRow(id, cols.filter(_ != "id")
                .map(c => c -> Some(rnd.nextInt(100).toLong)).toMap)
              id
            }
            DeletionVectors.evolveAppend(spark, dir,
              df(fresh, cols.filter(_ != "id")))
          case 1 if cols.length > 2 => // metadata drop of a value column
            val victim = cols.drop(1)(rnd.nextInt(cols.length - 1))
            cols = cols.filterNot(_ == victim)
            model.values.foreach(_.remove(victim))
            DeletionVectors.dropColumn(spark, dir, victim)
          case 2 => // modulo delete across all generations
            val k = 2 + rnd.nextInt(4)
            model.keys.toSeq.filter(_ % k == 0).foreach(model.remove)
            DeletionVectors.deleteWhere(spark, dir, col("id") % k === 0L)
          case 3 if model.nonEmpty => // keyed upsert at the full schema
            val ids = rnd.shuffle(model.keys.toSeq)
              .take(1 + rnd.nextInt(4))
            ids.foreach(id => newRow(id, cols.filter(_ != "id")
              .map(c => c -> Some(rnd.nextInt(100).toLong)).toMap))
            DeletionVectors.upsertMoR(spark, dir,
              df(ids, cols.filter(_ != "id")), "id")
          case 4 => rnd.nextInt(2) match {
            case 0 => DeletionVectors.applyDeletes(spark, dir)
            case _ => DeletionVectors.compactSmallFiles(spark, dir,
              smallBytes = 1L << 20, targetBytes = 4L << 20)
          }
          case _ => ()
        }
        // full-state check every few steps (and always at the end)
        if (step % 4 == 3 || step == 11) {
          val got = DeletionVectors.read(spark, dir)
          assert(got.columns.toSeq == cols,
            s"seed $seed step $step: schema ${got.columns.toSeq} != $cols")
          val gotMap = got.collect().map { r =>
            r.getLong(0) -> cols.drop(1).zipWithIndex.map { case (c, i) =>
              c -> (if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1)))
            }.toMap
          }.toMap
          val want = model.map { case (id, m) =>
            id -> cols.drop(1).map(c => c -> m.getOrElse(c, None)).toMap
          }.toMap
          assert(gotMap == want, s"seed $seed step $step diverged")
        }
      }
    }
  }

  test("property: exactLastSeen equals the from-scratch max under random deletes") {
    val userCountry = (1L to 12L).map(k => (k, s"C${k % 3}"))
      .toDF("user_id", "country")
    for (seed <- Seq(7, 41)) {
      val rnd = new scala.util.Random(seed)
      val work = tmp(s"graft-r9el$seed-")
      val fact = s"$work/fact"
      val gold = s"$work/gold"
      var ts = 0
      for (b <- 0 until 6) {
        val keys = rnd.shuffle((1L to 12L).toList).take(1 + rnd.nextInt(8))
        val rows = keys.map { k =>
          ts += 1
          (k, rnd.nextInt(10000) / 100.0,
            f"2024-01-01 00:${ts / 60}%02d:${ts % 60}%02d",
            Seq("I", "U", "D", "D")(rnd.nextInt(4))) // delete-heavy
        }
        StreamMorGold.processBatch(
          rows.toDF("user_id", "value", "ts_s", "op"), b.toLong,
          fact, gold, userCountry, "user_id", "op",
          exactLastSeen = true)
      }
      val folded = graft.sink.AtomicParquetSink.read(spark, gold).get
        .filter(col("n_users") =!= 0L)
        .select("country", "n_users", "last_seen")
        .as[(String, Long, String)].collect().toSet
      val scratch = DeletionVectors.read(spark, fact)
        .join(userCountry, "user_id").groupBy(col("country"))
        .agg(count(lit(1)).as("n"), max(col("ts_s")).as("m"))
        .as[(String, Long, String)].collect().toSet
      assert(folded == scratch,
        s"seed $seed: exact last_seen drifted: $folded != $scratch")
    }
  }

  // ---- bucketed snapshot diffs: zero Exchange ----------------------

  test("BucketedSnapshots.diff plans ZERO Exchange and classifies exactly") {
    val work = tmp("graft-r9bs-")
    val name = s"r9bs_${System.nanoTime()}"
    val v1 = (0L until 1000L).map(i => (i, i * 2.0)).toDF("id", "v")
      .filter(col("id") % 5 =!= 4)
    val v2 = (0L until 1000L).map(i => (i, i * 2.0)).toDF("id", "v")
      .filter(col("id") % 5 =!= 0)
      .withColumn("v", when(col("id") % 2 === 0, col("v") + 100.0)
        .otherwise(col("v")))
    graft.sink.BucketedSnapshots.write(v1, name, 1L, work, Seq("id"), 8)
    graft.sink.BucketedSnapshots.write(v2, name, 2L, work, Seq("id"), 8)
    val d = graft.sink.BucketedSnapshots.diff(spark, name, 1L, 2L, Seq("id"))
    // plan: the full-outer join must ride the bucketed scans — no
    // ShuffleExchange anywhere (this is the whole point of persisting
    // snapshot history bucketed at 100 TB)
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed pair diff still shuffles:\n$plan")
    // values: same classification the version-dir diff produces
    val got = d.select(col("id"), col("change"),
        col("_old.v").as("ov"), col("_new.v").as("nv"))
      .as[(Long, String, Option[Double], Option[Double])]
      .collect().toSet
    val expected = (0L until 1000L).flatMap { i =>
      val in1 = i % 5 != 4
      val in2 = i % 5 != 0
      val old = i * 2.0
      val nw = if (i % 2 == 0) old + 100.0 else old
      if (in1 && in2 && i % 2 == 0)
        Some((i, "update", Some(old), Some(nw)))
      else if (in1 && !in2) Some((i, "delete", Some(old), None))
      else if (!in1 && in2) Some((i, "insert", None, Some(nw)))
      else None // unchanged or absent from both
    }.toSet
    assert(got == expected)
    graft.sink.BucketedSnapshots.drop(spark, name, 1L)
    graft.sink.BucketedSnapshots.drop(spark, name, 2L)
  }

  // ---- incremental SCD2 fold ---------------------------------------

  test("Scd2.foldBatch: no-change keeps the version, delete closes, re-insert reopens, late batch fails loud") {
    import graft.ops.Scd2
    val h0 = Scd2.init(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"),
      Seq("id"), Seq("attr"), "2024-01-01 00:00:00")
    // batch 2: no-change on 1 (must NOT cut a version), change on 2,
    // insert 3
    val h1 = Scd2.foldBatch(h0,
      Seq((1L, "a", "U"), (2L, "b2", "U"), (3L, "c", "I"))
        .toDF("id", "attr", "op"),
      Seq("id"), Seq("attr"), "2024-02-01 00:00:00", "op")
    val rows1 = h1.select("id", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSet
    assert(rows1 == Set(
      (1L, "a", "2024-01-01 00:00:00", None, true),
      (2L, "b", "2024-01-01 00:00:00", Some("2024-02-01 00:00:00"), false),
      (2L, "b2", "2024-02-01 00:00:00", None, true),
      (3L, "c", "2024-02-01 00:00:00", None, true)), s"got $rows1")
    // batch 3: delete 1 (close, no reopen), delete-then… nothing for 9
    val h2 = Scd2.foldBatch(h1,
      Seq((1L, "x", "D"), (9L, "x", "D")).toDF("id", "attr", "op"),
      Seq("id"), Seq("attr"), "2024-03-01 00:00:00", "op")
    val cur2 = h2.filter(col("is_current")).select("id")
      .as[Long].collect().toSet
    assert(cur2 == Set(2L, 3L), s"current after delete: $cur2")
    assert(h2.filter(col("id") === 1L).select("valid_to")
      .as[Option[String]].collect().toSeq ==
      Seq(Some("2024-03-01 00:00:00")))
    // batch 4: re-insert 1 → a fresh open version
    val h3 = Scd2.foldBatch(h2,
      Seq((1L, "a3", "I")).toDF("id", "attr", "op"),
      Seq("id"), Seq("attr"), "2024-04-01 00:00:00", "op")
    assert(h3.filter(col("id") === 1L).count() == 2)
    assert(h3.filter(col("id") === 1L && col("is_current"))
      .select("attr").as[String].head() == "a3")
    // a batch older than an open version must fail loud
    assert(intercept[IllegalArgumentException] {
      Scd2.foldBatch(h3,
        Seq((1L, "z", "U")).toDF("id", "attr", "op"),
        Seq("id"), Seq("attr"), "2023-01-01 00:00:00", "op")
    }.getMessage.contains("late-arriving"))
  }

  test("Scd2.foldBatchMoR: replay-idempotent, pruned close-locate, equals the CoW fold") {
    import graft.ops.Scd2
    val work = tmp("graft-r9sm-")
    val dir = s"$work/hist"
    val init = (1L to 400L).map(k => (k, s"v${k % 7}")).toDF("id", "attr")
    BloomSkipIndex.bloomWrite(
      Scd2.init(init, Seq("id"), Seq("attr"), "2024-01-01 00:00:00"),
      "id", dir, nFiles = 8)
    val b = (1L to 60L).map { k =>
      if (k % 3 == 0) (k, "x", "D")        // delete
      else if (k % 3 == 1) (k, "NEW", "U") // re-value
      else (k, s"v${k % 7}", "U")          // no-change
    }.toDF("id", "attr", "op")
    DvStats.lastFetchFiles = None
    DvStats.lastLocateFiles = None
    Scd2.foldBatchMoR(spark, dir, b, "id", Seq("attr"),
      "2024-02-01 00:00:00", "op")
    // the pre-image fetch pruned (bloom-clustered history, 60 keys)
    assert(DvStats.lastFetchFiles.exists(_ <= 8),
      s"MoR fold pre-image fetch unpruned: ${DvStats.lastFetchFiles}")
    val once = DeletionVectors.read(spark, dir)
      .select("id", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSet
    // REPLAY the whole batch: every step routes on current state, so
    // the second application is a structural no-op
    Scd2.foldBatchMoR(spark, dir, b, "id", Seq("attr"),
      "2024-02-01 00:00:00", "op")
    val twice = DeletionVectors.read(spark, dir)
      .select("id", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSet
    assert(twice == once, "replayed MoR fold changed the history")
    // equality with the copy-on-write fold over the same scenario
    var cow = Scd2.init(init, Seq("id"), Seq("attr"), "2024-01-01 00:00:00")
    cow = Scd2.foldBatch(cow, b, Seq("id"), Seq("attr"),
      "2024-02-01 00:00:00", "op")
    val cowSet = cow
      .select("id", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSet
    assert(once == cowSet, "MoR and CoW folds disagree")
    // spot-check semantics: deleted key closed without reopening,
    // no-change key kept its original version row
    assert(once.count(_._1 == 3L) == 1 && !once.find(_._1 == 3L).get._5)
    assert(once.find(_._1 == 2L).get._3 == "2024-01-01 00:00:00")
  }

  test("StreamScd2: one-ts-per-batch contract enforced; batch replay is a no-op") {
    import graft.streaming.StreamScd2
    val work = tmp("graft-r9ss-")
    val dir = s"$work/hist"
    BloomSkipIndex.bloomWrite(
      graft.ops.Scd2.init(
        Seq((1L, "a"), (2L, "b")).toDF("id", "attr"),
        Seq("id"), Seq("attr"), "2024-01-01 00:00:00"),
      "id", dir, nFiles = 2)
    // mixed effective timestamps must fail loud
    val mixed = Seq((1L, "a2", "U", "2024-02-01 00:00:00"),
        (2L, "b2", "U", "2024-02-02 00:00:00"))
      .toDF("id", "attr", "op", "ts_s")
    assert(intercept[IllegalArgumentException] {
      StreamScd2.applyBatch(spark, dir, mixed, "id", Seq("attr"),
        "ts_s", "op")
    }.getMessage.contains("exactly one"))
    // a clean batch applies; redelivery (foreachBatch replay) no-ops
    val ok = Seq((1L, "a2", "U", "2024-02-01 00:00:00"))
      .toDF("id", "attr", "op", "ts_s")
    StreamScd2.applyBatch(spark, dir, ok, "id", Seq("attr"), "ts_s", "op")
    val once = DeletionVectors.read(spark, dir)
      .select("id", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSet
    StreamScd2.applyBatch(spark, dir, ok, "id", Seq("attr"), "ts_s", "op")
    val twice = DeletionVectors.read(spark, dir)
      .select("id", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSet
    assert(twice == once, "replayed StreamScd2 batch changed the history")
    assert(once == Set(
      (1L, "a", "2024-01-01 00:00:00", Some("2024-02-01 00:00:00"), false),
      (1L, "a2", "2024-02-01 00:00:00", None, true),
      (2L, "b", "2024-01-01 00:00:00", None, true)))
  }

  // ---- one-call maintenance ----------------------------------------

  test("maintain: value-neutral, refreshes bloom AND manifest, bounds tombstones") {
    val work = tmp("graft-r9mt-")
    val dir = s"$work/t"
    // a zordered+bloom-indexed table that then takes MoR mutations
    graft.sink.ZOrderLayout.zorderWriteRankedN(
      (0L until 4000L).map(i => (i, i % 97, i * 1.5)).toDF("id", "g", "v"),
      Seq("id", "v"), dir, nFiles = 16)
    BloomSkipIndex.writeBloomSidecar(spark, dir, "id")
    // trickle mutations: deletes + tiny appends → dead rows + small files
    DeletionVectors.deleteByKeyDf(spark, dir, "id",
      (0L until 400L).map(_ * 2).toDF("id"))
    (9000L until 9100L).map(i => (i, i % 97, i * 1.5)).toDF("id", "g", "v")
      .repartition(5).write.mode("append").parquet(dir)
    // decimal-routed sum: a double sum's order varies with the file
    // layout the maintenance is about to change
    val before = DeletionVectors.read(spark, dir)
      .agg(count(lit(1)), sum(col("v").cast("decimal(18,2)")).cast("double"))
      .as[(Long, Double)].head()
    val (compacted, packed) =
      DeletionVectors.maintain(spark, dir, maxDeleteRatio = 0.05,
        smallBytes = 1L << 20, targetBytes = 8L << 20)
    assert(compacted + packed > 0, "maintenance found nothing to do")
    // value-neutral
    val after = DeletionVectors.read(spark, dir)
      .agg(count(lit(1)), sum(col("v").cast("decimal(18,2)")).cast("double"))
      .as[(Long, Double)].head()
    assert(after == before, s"maintain changed values: $before -> $after")
    // both sidecars fresh against the post-compaction listing
    assert(BloomSkipIndex.hasFreshSidecar(spark, dir, "id"),
      "bloom sidecar stale after maintain")
    val mfFiles = {
      val parts = new java.io.File(s"$dir/_manifest").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      spark.read.parquet(parts.toSeq: _*).select("file").collect()
        .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName)
        .toSet
    }
    assert(mfFiles == dataFiles(dir).toSet,
      "manifest sidecar stale after maintain")
    // live tombstones bounded by the ratio (compactIfNeeded invariant)
    assert(DeletionVectors.read(spark, dir).count() == before._1)
  }

  // ---- vacuum keeps the grace generation ---------------------------

  test("vacuumTombstones retains the previous generation as the reader grace copy") {
    val work = tmp("graft-r9vg-")
    val dir = s"$work/t"
    (0L until 100L).map(i => (i, i)).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    DeletionVectors.deleteWhere(spark, dir, col("id") < 5L)   // gen 1
    DeletionVectors.deleteWhere(spark, dir, col("id") === 50L) // gen 2
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def gens(): Set[String] = fs.listStatus(
        new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("_dv_g")).toSet
    assert(gens() == Set("_dv_g1", "_dv_g2"))
    // a reader that resolved gen 2 just before the vacuum commits
    // must still find it afterwards (same grace rule as commitGen)
    DeletionVectors.vacuumTombstones(spark, dir)
    assert(gens() == Set("_dv_g2", "_dv_g3"),
      s"vacuum broke the grace rule: ${gens()}")
    // and the vacuumed state still reads correctly
    assert(DeletionVectors.read(spark, dir).count() == 94L)
  }

  // ---- checkpointed event-time drains (q216/q217) ------------------

  test("q216: stream-stream interval join drain equals the batch join") {
    val d = "/root/testdata/sf0.001"
    val streamed = graft.queries.CoreQueries.streamIntervalJoin(spark, d)
    val ev = graft.sources.Tables.events(spark, d)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").cast("timestamp").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        col("ts").cast("timestamp").as("p_ts"))
    val batch = c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 4 hours"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks"),
        countDistinct(col("purchase_id")).as("n_purchases"))
    assert(streamed.count() > 0, "q216 must be non-vacuous at sf0.001")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("evolveAppend: union schema survives deletes, compaction, and keyed MoR ops; retype fails loud") {
    val work = tmp("graft-r9evo-")
    val dir = s"$work/t"
    val base = (0L until 400L).map(i => (i, s"v$i")).toDF("id", "v")
    BloomSkipIndex.bloomWrite(base, "id", dir, nFiles = 8)
    // evolve: add a `tier` column via a small append — no rewrite
    val add = (1000L until 1050L).map(i => (i, s"v$i", s"t${i % 3}"))
      .toDF("id", "v", "tier")
    DeletionVectors.evolveAppend(spark, dir, add)
    val r1 = DeletionVectors.read(spark, dir)
    assert(r1.columns.toSeq == Seq("id", "v", "tier"))
    assert(r1.filter(col("id") < 400L && col("tier").isNotNull).count() == 0,
      "old rows must surface the evolved column as NULL")
    assert(r1.filter(col("tier").isNotNull).count() == 50)
    // delete across both generations of files, then compact the
    // tombstoned files away — the union schema must survive the rewrite
    DeletionVectors.deleteWhere(spark, dir, col("id") % 5 === 0L)
    DeletionVectors.applyDeletes(spark, dir)
    val r2 = DeletionVectors.read(spark, dir)
    assert(r2.columns.toSeq == Seq("id", "v", "tier"))
    assert(r2.count() == 320 + 40)
    assert(r2.filter(col("tier").isNotNull).count() == 40,
      "compaction dropped the evolved column's values")
    assert(r2.filter(col("id") < 400L && col("tier").isNotNull).count() == 0,
      "compaction must keep old rows' evolved column NULL")
    // keyed MoR ops post-evolution run on the union schema
    val up = Seq((7L, "V7", "gold")).toDF("id", "v", "tier")
    DeletionVectors.upsertMoR(spark, dir, up, "id")
    val got = DeletionVectors.read(spark, dir)
      .filter(col("id") === 7L).collect()
    assert(got.length == 1 && got.head.getString(2) == "gold")
    // type change must fail loud, not append
    val bad = Seq((1L, 2.5, "x")).toDF("id", "v", "tier")
    intercept[IllegalArgumentException] {
      DeletionVectors.evolveAppend(spark, dir, bad)
    }
    // metadata-only DROP: v disappears from reads without a rewrite,
    // and compaction sheds it physically from rewritten files
    DeletionVectors.dropColumn(spark, dir, "v")
    val r3 = DeletionVectors.read(spark, dir)
    assert(r3.columns.toSeq == Seq("id", "tier"))
    assert(r3.count() == 360) // same rows, one fewer column
    DeletionVectors.deleteWhere(spark, dir, col("id") === 1L)
    DeletionVectors.applyDeletes(spark, dir)
    assert(DeletionVectors.read(spark, dir).columns.toSeq ==
      Seq("id", "tier"))
    // re-adding a dropped name must fail loud (old values would
    // resurrect), even at the original type
    val res = Seq((2000L, "v2000", "t0")).toDF("id", "v", "tier")
    intercept[IllegalArgumentException] {
      DeletionVectors.evolveAppend(spark, dir, res)
    }
    // but a genuinely new column still evolves fine post-drop
    val more = Seq((3000L, "t1", 9L)).toDF("id", "tier", "score")
    DeletionVectors.evolveAppend(spark, dir, more)
    val r4 = DeletionVectors.read(spark, dir)
    assert(r4.columns.toSeq == Seq("id", "tier", "score"))
    assert(r4.filter(col("score").isNotNull).count() == 1)
  }

  test("fence namespace: a second drain (new checkpoint) into the same table applies its batch 0") {
    val work = tmp("graft-r9fence-")
    val dir = s"$work/t"
    Seq((1L, "a", "I"), (2L, "b", "I")).toDF("id", "v", "op")
      .coalesce(1).write.parquet(s"$work/feedA")
    StreamMoR.run(spark, s"$work/feedA",
      spark.read.parquet(s"$work/feedA").schema,
      s"$work/ckptA", dir, "id")
    // drain B restarts batch ids at 0 — pre-fix, table-scoped markers
    // made this a silent no-op and the update below vanished
    Seq((2L, "B2", "U"), (3L, "c", "I")).toDF("id", "v", "op")
      .coalesce(1).write.parquet(s"$work/feedB")
    StreamMoR.run(spark, s"$work/feedB",
      spark.read.parquet(s"$work/feedB").schema,
      s"$work/ckptB", dir, "id")
    val got = DeletionVectors.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c"),
      s"second drain's batch 0 was lost: $got")
  }

  test("StreamMorGold refuses a foreign checkpoint against an existing gold") {
    val work = tmp("graft-r9gid-")
    val feed = s"$work/feed"
    Seq((1L, 10.0, "2024-01-01 00:00:00", "I"))
      .toDF("user_id", "value", "ts_s", "op")
      .coalesce(1).write.parquet(feed)
    val schema = spark.read.parquet(feed).schema
    val uc = Seq((1L, "de")).toDF("user_id", "country")
    StreamMorGold.run(spark, feed, schema, s"$work/ckptA",
      s"$work/fact", s"$work/gold", uc)
    // same checkpoint resumes fine (no new data -> no-op)
    StreamMorGold.run(spark, feed, schema, s"$work/ckptA",
      s"$work/fact", s"$work/gold", uc)
    // a DIFFERENT checkpoint must be rejected loudly
    val e = intercept[IllegalArgumentException] {
      StreamMorGold.run(spark, feed, schema, s"$work/ckptB",
        s"$work/fact", s"$work/gold", uc)
    }
    assert(e.getMessage.contains("different"))
  }

  test("readPreviousGen: un-applies the newest delete; fails loud after a compaction") {
    val work = tmp("graft-r9undel-")
    val dir = s"$work/t"
    (0L until 100L).map(i => (i, i)).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    DeletionVectors.deleteWhere(spark, dir, col("id") < 10L)  // gen 1
    DeletionVectors.deleteWhere(spark, dir, col("id") >= 90L) // gen 2
    assert(DeletionVectors.read(spark, dir).count() == 80)
    val grace = DeletionVectors.readPreviousGen(spark, dir)
    assert(grace.count() == 90, "grace read must un-apply only gen 2")
    assert(grace.filter(col("id") >= 90L).count() == 10)
    assert(grace.filter(col("id") < 10L).count() == 0)
    // compaction rewrites the addressed files -> guard must fire
    DeletionVectors.applyDeletes(spark, dir)
    intercept[IllegalArgumentException] {
      DeletionVectors.readPreviousGen(spark, dir).count()
    }
  }

  test("StreamCov: batch fence makes SUM-merge replay-safe; drained cov = one-pass") {
    val work = tmp("graft-r9sc-")
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val half1 = e.filter(col("vec_id") % 2 === 0)
    val half2 = e.filter(col("vec_id") % 2 === 1)
    graft.streaming.StreamCov.applyBatch(spark, s"$work/st", half1,
      "embedding", 0L)
    graft.streaming.StreamCov.applyBatch(spark, s"$work/st", half2,
      "embedding", 1L)
    val after = graft.streaming.StreamCov.derive(spark, s"$work/st").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // redeliver batch 1 (crash-replay shape) — fence must skip it
    graft.streaming.StreamCov.applyBatch(spark, s"$work/st", half2,
      "embedding", 1L)
    val replayed = graft.streaming.StreamCov.derive(spark, s"$work/st")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(after == replayed, "replayed batch changed the moment state")
    // merged state derives the one-pass kernel's covariance
    val onePass = graft.queries.LlmQueries.embedCovariance(spark,
      "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(after == onePass, "merge-then-derive != derive-of-union")
  }

  test("q217: stateful sessionization drain equals the batch sessionization") {
    val d = "/root/testdata/sf0.001"
    val streamed = graft.queries.CoreQueries.streamSessions(spark, d)
    val batch = graft.streaming.EventTimeOps.sessionizeBatch(
        graft.sources.Tables.events(spark, d), gapSeconds = 14400L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed sessions must equal the LAG/running-sum reconstruction")
  }
}
