package graft

import graft.ops.CdcOps
import graft.sink.AtomicParquetSink
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** O3 + K1-sink specs: stream/batch end-state parity, checkpoint
  * resume, rejected-row capture, atomic version swap. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-test-").toString

  // a change log with: multiple versions per key (u1), an error row
  // (rejected), and keys spread across file groups so multiple
  // micro-batches carry real work
  private def changes = Seq(
    (1L, 10L, "update", 1.0, "2024-01-01 10:00:00"),
    (2L, 10L, "update", 2.0, "2024-01-01 11:00:00"), // newer u10
    (3L, 11L, "insert", 3.0, "2024-01-01 09:00:00"),
    (4L, 12L, "error", -1.0, "2024-01-01 09:30:00"), // rejected
    (5L, 13L, "insert", 5.0, "2024-01-01 08:00:00"),
    (6L, 10L, "update", 0.5, "2024-01-01 09:59:00"), // OLDER u10 late row
    (7L, 14L, "insert", 7.0, "2024-01-01 12:00:00"),
  ).toDF("event_id", "user_id", "event_type", "value", "ts_s")

  test("stream end state == batch latest-per-key (micro-batch independence)") {
    val work = tmp()
    val end = CdcStream.runEndToEnd(spark, changes, work, nFiles = 4,
      maxFilesPerTrigger = 1)
    val (ok, _) = CdcOps.qualitySplit(changes, col("event_type") === "error")
    val expected = CdcOps.latestPerKey(ok, Seq("user_id"),
      Seq(col("ts_s"), col("event_id")))
    assert(
      end.select("user_id", "event_id", "value").as[(Long, Long, Double)]
        .collect().toSet ==
      expected.select("user_id", "event_id", "value").as[(Long, Long, Double)]
        .collect().toSet)
    // the late-but-older u10 row must NOT have regressed the key
    assert(end.filter($"user_id" === 10).select("event_id").as[Long].head() == 2L)
  }

  test("checkpoint resume: a second drain with no new files is a no-op") {
    val work = tmp()
    CdcStream.runEndToEnd(spark, changes, work)
    val v1 = AtomicParquetSink.currentVersionDir(spark, s"$work/fact")
    // second run against the same checkpoint: no new files → no batches
    val q2 = CdcStream.run(spark, s"$work/feed", s"$work/checkpoint",
      s"$work/fact", s"$work/rejected")
    q2.awaitTermination()
    val v2 = AtomicParquetSink.currentVersionDir(spark, s"$work/fact")
    assert(v1 == v2, "no-op drain must not rewrite the table")
  }

  test("fresh-checkpoint replay of the whole feed converges to the same state") {
    val work = tmp()
    val first = CdcStream.runEndToEnd(spark, changes, work)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    // replay: same feed, NEW checkpoint, SAME sink table (crash-recovery
    // worst case: everything reprocessed against existing state)
    val q = CdcStream.run(spark, s"$work/feed", s"$work/checkpoint2",
      s"$work/fact", s"$work/rejected")
    q.awaitTermination()
    val replayed = AtomicParquetSink.read(spark, s"$work/fact").get
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(replayed == first, "full replay must be idempotent")
  }

  test("quality-rejected rows land in per-batch rejected dirs with batch ids") {
    val work = tmp()
    CdcStream.runEndToEnd(spark, changes, work)
    val rejected = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$work/rejected")
    assert(rejected.count() == 1)
    assert(rejected.select("event_type").as[String].head() == "error")
    assert(rejected.columns.contains("_batch_id"))
  }

  test("AtomicParquetSink: pointer swap + GC keeps exactly one grace version") {
    val table = tmp() + "/t"
    assert(AtomicParquetSink.read(spark, table).isEmpty)
    AtomicParquetSink.overwrite(Seq((1, "a")).toDF("k", "v"), table)
    AtomicParquetSink.overwrite(Seq((2, "b")).toDF("k", "v"), table)
    AtomicParquetSink.overwrite(Seq((3, "c")).toDF("k", "v"), table)
    val state = AtomicParquetSink.read(spark, table).get
      .as[(Int, String)].collect().toSeq
    assert(state == Seq((3, "c")))
    // current + one grace version survive GC; older ones are deleted
    val dirs = new java.io.File(table).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("v-"))
    assert(dirs.length == 2, s"expected 2 version dirs, got ${dirs.toSeq}")
  }

  test("AtomicParquetSink: time travel reads retained snapshots by name and timestamp") {
    val table = tmp() + "/t"
    AtomicParquetSink.overwrite(Seq((1, "a")).toDF("k", "v"), table,
      retainVersions = 3)
    AtomicParquetSink.overwrite(Seq((2, "b")).toDF("k", "v"), table,
      retainVersions = 3)
    AtomicParquetSink.overwrite(Seq((3, "c")).toDF("k", "v"), table,
      retainVersions = 3)
    val vs = AtomicParquetSink.versions(spark, table)
    assert(vs.length == 3, s"retention window of 3 must keep 3: $vs")
    // each snapshot is intact and immutable
    val states = vs.map(v => AtomicParquetSink
      .readVersion(spark, table, v).as[(Int, String)].collect().toSeq)
    assert(states == Seq(Seq((1, "a")), Seq((2, "b")), Seq((3, "c"))))
    // as-of semantics: newest snapshot committed at or before the time
    val midTs = vs(1).substring(2, 22).toLong
    assert(AtomicParquetSink.readAsOf(spark, table, midTs).get
      .as[(Int, String)].collect().toSeq == Seq((2, "b")))
    assert(AtomicParquetSink.readAsOf(spark, table,
      vs.head.substring(2, 22).toLong - 1).isEmpty)
    // a 4th write GCs the oldest, keeping the newest 3
    AtomicParquetSink.overwrite(Seq((4, "d")).toDF("k", "v"), table,
      retainVersions = 3)
    val after = AtomicParquetSink.versions(spark, table)
    assert(after.length == 3 && !after.contains(vs.head))
    assert(AtomicParquetSink.read(spark, table).get
      .as[(Int, String)].collect().toSeq == Seq((4, "d")))
  }

  test("optimistic commit detects a lost update and serializes via retry") {
    val table = tmp() + "/t"
    AtomicParquetSink.overwrite(Seq((1, 0)).toDF("k", "v"), table)
    var sneaky = true
    AtomicParquetSink.mergeWithRetry(spark, table, { st =>
      val mine = st.get.withColumn("v", col("v") + 1)
      if (sneaky) {
        sneaky = false
        // another writer lands AFTER our read, BEFORE our commit
        AtomicParquetSink.overwrite(Seq((1, 100)).toDF("k", "v"), table)
      }
      mine
    })
    // without conflict detection the sneaky write would be lost (v=1);
    // serialized, our increment re-runs on top of it
    assert(AtomicParquetSink.read(spark, table).get
      .as[(Int, Int)].collect().toSeq == Seq((1, 101)))
    // no orphaned version dirs beyond the retention window
    val dirs = new java.io.File(table).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("v-"))
    assert(dirs.length <= 3)
  }

  test("row-level DELETE and UPDATE commit through the sink") {
    val table = tmp() + "/t"
    AtomicParquetSink.overwrite(
      Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v"), table)
    AtomicParquetSink.deleteWhere(spark, table, col("k") === 2)
    AtomicParquetSink.updateWhere(spark, table, col("k") === 3,
      Map("v" -> (col("v") * 2)))
    val state = AtomicParquetSink.read(spark, table).get
      .as[(Int, Double)].collect().toSet
    assert(state == Set((1, 10.0), (3, 60.0)))
  }

  test("DML edge semantics: NULL predicate keeps rows; UPDATE assigns simultaneously") {
    val table = tmp() + "/t"
    AtomicParquetSink.overwrite(
      Seq((1, Some(1.0), 10.0), (2, None, 20.0)).toDF("k", "a", "b"), table)
    // SQL DELETE: a NULL predicate (a > 0 on a null a) must KEEP row 2
    AtomicParquetSink.deleteWhere(spark, table, col("a") > 100.0)
    assert(AtomicParquetSink.read(spark, table).get.count() == 2)
    // SQL UPDATE SET a=b, b=a swaps — RHS reads the ORIGINAL row
    AtomicParquetSink.updateWhere(spark, table, col("k") === 1,
      Map("a" -> col("b"), "b" -> col("a")))
    val swapped = AtomicParquetSink.read(spark, table).get
      .filter(col("k") === 1)
      .as[(Int, Option[Double], Double)].head()
    assert(swapped == ((1, Some(10.0), 1.0)))
  }

  test("roll-forward repair adopts a marked commit that crashed before its swap") {
    val table = tmp() + "/t"
    AtomicParquetSink.overwrite(Seq((1, "a")).toDF("k", "v"), table)
    AtomicParquetSink.overwrite(Seq((2, "b")).toDF("k", "v"), table)
    // simulate a crash between _COMMITTED and the pointer swap: point
    // the pointer back at the older version, leaving the newer marked
    val vs = AtomicParquetSink.versions(spark, table)
    val hfs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(
      new org.apache.hadoop.fs.Path(s"$table/_current"), true)
    try out.write(vs.head.getBytes("UTF-8")) finally out.close()
    // a subsequent write repairs the fork: its base is the marked
    // newest (not the stale pointer target), so (2,b) is not lost
    AtomicParquetSink.mergeWithRetry(spark, table,
      st => st.get.unionByName(Seq((3, "c")).toDF("k", "v")))
    val state = AtomicParquetSink.read(spark, table).get
      .as[(Int, String)].collect().toSet
    assert(state == Set((2, "b"), (3, "c")))
  }

  test("updateWhere rejects unknown assignment columns instead of no-opping") {
    val table = tmp() + "/t"
    AtomicParquetSink.overwrite(Seq((1, 1.0)).toDF("k", "bal"), table)
    val e = intercept[IllegalArgumentException] {
      AtomicParquetSink.updateWhere(spark, table, col("k") === 1,
        Map("ball" -> lit(0.0)))
    }
    assert(e.getMessage.contains("ball"))
  }

  test("AtomicParquetSink: a lost pointer recovers to the newest complete version") {
    val table = tmp() + "/t"
    AtomicParquetSink.overwrite(Seq((1, "a")).toDF("k", "v"), table)
    AtomicParquetSink.overwrite(Seq((2, "b")).toDF("k", "v"), table)
    // simulate a crash inside the delete+rename pointer swap
    assert(new java.io.File(s"$table/_current").delete())
    val state = AtomicParquetSink.read(spark, table)
    assert(state.isDefined, "committed data must never read as absent")
    assert(state.get.as[(Int, String)].collect().toSeq == Seq((2, "b")))
  }

  test("versioned merge: N-batch fold == 1-batch fold for any split") {
    val all = changes.filter($"event_type" =!= "error")
    val order = Seq(col("ts_s"), col("event_id"))
    val oneShot = CdcOps.latestPerKey(all, Seq("user_id"), order)
    // pathological split: one event per batch, reverse time order
    val folded = all.orderBy($"ts_s".desc).collect().toSeq
      .map(r => spark.createDataFrame(java.util.Arrays.asList(r), all.schema))
      .foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        case (None, b) => Some(b)
        case (Some(acc), b) =>
          Some(CdcOps.mergeUpsertVersioned(acc, b, Seq("user_id"), order))
      }.get
    assert(folded.select("user_id", "event_id").as[(Long, Long)].collect().toSet
      == oneShot.select("user_id", "event_id").as[(Long, Long)].collect().toSet)
  }

  test("incremental gold == batch recompute under 1-file batches with late rows") {
    import graft.streaming.{CdcStream, IncrementalGold}
    val work = tmp()
    CdcStream.writeChangeLog(changes, s"$work/feed", nFiles = 4)
    val userCountry = Seq((10L, "FR"), (11L, "FR"), (12L, "DE"),
      (13L, "DE"), (14L, "JP")).toDF("user_id", "country")
    val gold = IncrementalGold.run(spark, s"$work/feed", s"$work/checkpoint",
      s"$work/state", userCountry, maxFilesPerTrigger = 1)
    val got = gold.select("country", "n_users", "total_value", "last_seen")
      .as[(String, Long, Double, String)].collect().toSet
    // ground truth: latest per user of non-error rows, aggregated
    // u10 -> evt2 (2.0), u11 -> 3.0, u13 -> 5.0, u14 -> 7.0; u12 rejected
    assert(got == Set(
      ("FR", 2L, 5.0, "2024-01-01 11:00:00"),
      ("DE", 1L, 5.0, "2024-01-01 08:00:00"),
      ("JP", 1L, 7.0, "2024-01-01 12:00:00")))
  }

  test("incremental gold replay fence: re-delivered batch is a no-op") {
    import graft.streaming.IncrementalGold
    val work = tmp()
    val userCountry = Seq((10L, "FR"), (11L, "FR")).toDF("user_id", "country")
    val b = Seq((1L, 10L, "insert", 4.0, "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts_s")
    IncrementalGold.processBatch(b, 0L, s"$work/fact", s"$work/gold", userCountry)
    // crash-replay of the SAME batch id must not double-count
    IncrementalGold.processBatch(b, 0L, s"$work/fact", s"$work/gold", userCountry)
    val g = graft.sink.AtomicParquetSink.read(spark, s"$work/gold").get
    assert(g.select("n_users").as[Long].head() == 1L)
    assert(g.select(col("total_value").cast("double")).as[Double].head() == 4.0)
    // a NEW batch id still folds
    val b2 = Seq((2L, 11L, "insert", 6.0, "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts_s")
    IncrementalGold.processBatch(b2, 1L, s"$work/fact", s"$work/gold", userCountry)
    val g2 = graft.sink.AtomicParquetSink.read(spark, s"$work/gold").get
    assert(g2.agg(sum("n_users")).as[Long].head() == 2L)
  }

  test("incremental gold: crash between fact merge and gold fold converges on replay") {
    import graft.streaming.IncrementalGold
    val work = tmp()
    val userCountry = Seq((10L, "FR"), (11L, "FR")).toDF("user_id", "country")
    val b = Seq(
      (1L, 10L, "insert", 4.0, "2024-01-01 10:00:00"),
      (2L, 11L, "insert", 6.0, "2024-01-01 11:00:00"),
    ).toDF("event_id", "user_id", "event_type", "value", "ts_s")
    // simulate the crash: stage + fact merge happen, gold fold does NOT
    IncrementalGold.stageDeltas(b, 0L, s"$work/fact", s"$work/gold")
    IncrementalGold.mergeFact(b, s"$work/fact")
    // replay of the whole batch after restart
    IncrementalGold.processBatch(b, 0L, s"$work/fact", s"$work/gold", userCountry)
    val g = graft.sink.AtomicParquetSink.read(spark, s"$work/gold").get
    assert(g.agg(sum("n_users")).as[Long].head() == 2L,
      "staged pre-merge deltas must survive the crash")
    assert(g.agg(sum(col("total_value").cast("double"))).as[Double].head() == 10.0)
  }

  test("streaming near-dup dedup: later near-dups dropped across batches") {
    import graft.streaming.StreamNearDup
    val work = tmp()
    // 32 tokens -> 30 trigram shingles; a 1-word mutation gives
    // J = 27/33 = 0.818 >= tau 0.8
    val base = "the quick brown fox jumps over the lazy dog near the river bank while birds sing in the tall green trees above the quiet meadow path and the small stream flows gently"
    val docs = Seq(
      (1L, base, "en"),
      (2L, "completely different text about spark partitions and shuffle behavior here today and tomorrow", "en"),
      (5L, base.replace("dog", "cat"), "en"),       // near-dup of 1, later batch
      (6L, base, "en"),                              // exact dup of 1, later batch
      (7L, "unique third subject matter entirely disjoint from anything else in this tiny corpus fixture", "en"),
    ).toDF("doc_id", "text", "lang")
    StreamNearDup.writeOrderedFeed(docs, s"$work/feed", nFiles = 3)
    val kept = StreamNearDup.run(spark, s"$work/feed", s"$work/checkpoint",
        s"$work/state", maxFilesPerTrigger = 1)
      .select("doc_id").as[Long].collect().toSet
    // 5 and 6 collide with 1 (arrived earlier); 1, 2, 7 survive
    assert(kept == Set(1L, 2L, 7L))
  }

  test("LIVE speed layer: rate feed -> dataflow -> versioned merge, end to end") {
    import graft.sources.MockBookings
    import graft.sink.AtomicParquetSink
    val work = tmp()
    // the reference's topology, live: generator -> T1/T2/T5 dataflow ->
    // keyed versioned upsert into the fact sink, one merge per batch
    val q = MockBookings.stream(spark, rowsPerBatch = 40)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // T5 drops the raw booking_date (faithful to the reference
        // projection) — reattach it as the merge's version column, the
        // same role the fact table's timestamp plays in the reference
        val cooked = MockBookings.dataflow(batch)
          .join(batch.select($"booking_id", $"booking_date"), "booking_id")
        val merged = AtomicParquetSink.read(spark, s"$work/fact") match {
          case Some(ex) => CdcOps.mergeUpsertVersioned(ex, cooked,
            Seq("booking_id"), Seq(col("booking_date")))
          case None => cooked
        }
        AtomicParquetSink.overwrite(merged, s"$work/fact")
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 120000
      // the live writer keeps swapping versions; a resolved version dir
      // can be GC'd mid-count (the grace window covers one swap, not
      // two) — treat a torn read as "try again", it is not a failure
      def factRows(): Long =
        try AtomicParquetSink.read(spark, s"$work/fact")
          .map(_.count()).getOrElse(0L)
        catch { case _: org.apache.spark.SparkException
                   | _: java.io.FileNotFoundException => 0L }
      while (factRows() < 60 && System.currentTimeMillis() < deadline)
        Thread.sleep(300)
      q.stop()
      val fact = AtomicParquetSink.read(spark, s"$work/fact").get
      val n = fact.count()
      assert(n >= 60, s"live pipeline should have merged 2+ batches, got $n")
      // merge invariant: booking_id is unique in the sink
      assert(fact.select("booking_id").distinct().count() == n)
      // the T1 gate ran: no negative stays survive
      assert(fact.filter($"stay_duration" < 0).count() == 0)
    } finally if (q.isActive) q.stop()
  }

  test("compaction collapses fragmented batch dirs into one atomic table") {
    import graft.sink.{AtomicParquetSink, Compaction}
    val work = tmp()
    // simulate a fragmented streaming sink: 8 tiny per-batch dirs
    (0 until 8).foreach { b =>
      Seq((b.toLong, s"row$b")).toDF("id", "v")
        .repartition(2)
        .write.parquet(s"$work/frag/batch_$b")
    }
    val parts = Compaction.compact(spark, s"$work/frag", s"$work/table")
    assert(parts == 1) // tiny data -> one file
    val compacted = AtomicParquetSink.read(spark, s"$work/table").get
    assert(compacted.count() == 8)
    assert(compacted.select("id").as[Long].collect().toSet == (0L to 7L).toSet)
    val files = new java.io.File(
      AtomicParquetSink.currentVersionDir(spark, s"$work/table").get)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 compacted file, got $files")
  }

  test("streaming dedup state carries ACROSS micro-batches") {
    import graft.streaming.StreamDedup
    val work = tmp()
    // same text under different ids, ids spread so the copies land in
    // different feed files => different micro-batches (1 file/trigger)
    val docs = Seq(
      (0L, "alpha content", "en"), (1L, "beta content", "en"),
      (2L, "alpha content", "en"), (3L, "gamma content", "en"),
      (5L, "beta content", "en"), (7L, "alpha content", "en"),
    ).toDF("doc_id", "text", "lang")
    StreamDedup.writeFeed(docs, s"$work/feed", nFiles = 4)
    val out = StreamDedup.run(spark, s"$work/feed", s"$work/checkpoint",
      s"$work/out", maxFilesPerTrigger = 1)
    // 3 distinct contents survive from 6 rows across 4 micro-batches
    assert(out.count() == 3)
    assert(out.select("text_md5").distinct().count() == 3)
    // re-drain on the same checkpoint: no new files, nothing appended
    val out2 = StreamDedup.run(spark, s"$work/feed", s"$work/checkpoint",
      s"$work/out", maxFilesPerTrigger = 1)
    assert(out2.count() == 3)
  }

  test("stream windows: update-mode drain equals the batch rollup") {
    import graft.streaming.{CdcStream, StreamWindows, EventTimeOps}
    val work = tmp()
    CdcStream.writeChangeLog(changes, s"$work/feed", nFiles = 4)
    val got = StreamWindows.run(spark, s"$work/feed", s"$work/checkpoint",
        s"$work/state", maxFilesPerTrigger = 1)
      .as[(String, String, Long, Double)].collect().toSet
    val want = EventTimeOps.dailyTypeRollup(
        changes.withColumn("ts", to_timestamp($"ts_s"))
          .select("ts", "event_type", "value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == want)
    // re-drain on the same checkpoint: nothing changes (replay-safe)
    val again = StreamWindows.run(spark, s"$work/feed", s"$work/checkpoint",
        s"$work/state", maxFilesPerTrigger = 1)
      .as[(String, String, Long, Double)].collect().toSet
    assert(again == want)
  }

  test("stream windows: month-spanning feed, 1 file/trigger — no late-row loss") {
    // Regression for the watermark data-loss bug: writeChangeLog
    // stripes files by event_id, so EVERY file spans the full month.
    // With a 2h watermark, batch 1 advanced the watermark to
    // max(ts)−2h and batches ≥3 silently dropped all older-day rows
    // (16/40 day-type groups lost on this fixture). The drain must
    // instead produce the complete aggregate.
    import graft.streaming.{CdcStream, StreamWindows, EventTimeOps}
    val work = tmp()
    val monthChanges = (0 until 200).map { i =>
      val day = i % 20 + 1 // 20 distinct days
      (i.toLong, (i % 7).toLong, if ((i / 20) % 2 == 0) "insert" else "update",
        i.toDouble, f"2024-03-$day%02d ${i % 24}%02d:00:00")
    }.toDF("event_id", "user_id", "event_type", "value", "ts_s")
    CdcStream.writeChangeLog(monthChanges, s"$work/feed", nFiles = 5)
    val got = StreamWindows.run(spark, s"$work/feed", s"$work/checkpoint",
        s"$work/state", maxFilesPerTrigger = 1) // ≥5 data micro-batches
      .as[(String, String, Long, Double)].collect().toSet
    val want = EventTimeOps.dailyTypeRollup(
        monthChanges.withColumn("ts", to_timestamp($"ts_s"))
          .select("ts", "event_type", "value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(want.size == 40, "fixture must cover 20 days × 2 types")
    assert(got == want)
  }

  test("stream kmv: per-batch merge is batch-size invariant (mergeability)") {
    import graft.streaming.{StreamDedup, StreamKmv}
    val docs = (0 until 300).map { i =>
      (i.toLong, s"content ${i % 97} with tail $i", if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val w1 = tmp(); val w2 = tmp()
    StreamDedup.writeFeed(docs, s"$w1/feed", nFiles = 5)
    StreamDedup.writeFeed(docs, s"$w2/feed", nFiles = 5)
    val dribble = StreamKmv.run(spark, s"$w1/feed", s"$w1/checkpoint",
        s"$w1/state", maxFilesPerTrigger = 1)
      .as[(String, Double)].collect().toSet
    val oneShot = StreamKmv.run(spark, s"$w2/feed", s"$w2/checkpoint",
        s"$w2/state", maxFilesPerTrigger = 5)
      .as[(String, Double)].collect().toSet
    assert(dribble == oneShot) // merge-then-estimate == estimate-of-union
    assert(dribble.nonEmpty && dribble.forall(_._2 > 0.0))
  }
}
