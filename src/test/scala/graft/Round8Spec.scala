package graft

import graft.sink.{AtomicParquetSink, DeletionVectors, ZOrderLayout}
import graft.streaming.StreamMorGold
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Specs for the round-8 additions — invariants the row oracle can't
  * see: change-feed commit-id stability across GC, replayable
  * pre/post-image payloads, schema-evolution tolerance, the bounded
  * read amplification of ratio-triggered MoR compaction, the
  * DV∧manifest box-scan composition (with actual file skipping), and
  * the presence-routing of the streaming MoR gold deltas. */
class Round8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---- tableChanges: stable ids + payloads --------------------------

  test("tableChanges commit ids survive GC and carry replayable payloads") {
    val table = tmp("graft-cdf-") + "/t"
    val v1 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "bal")
    val v2 = Seq((1L, "a", 1.0), (2L, "b", 9.0), (3L, "c", 3.0))
      .toDF("k", "name", "bal")
    val v3 = Seq((2L, "b", 9.0), (3L, "c", 3.0)).toDF("k", "name", "bal")
    AtomicParquetSink.overwrite(v1, table, retainVersions = 4)
    AtomicParquetSink.overwrite(v2, table, retainVersions = 4)
    AtomicParquetSink.overwrite(v3, table, retainVersions = 4)

    val feed1 = AtomicParquetSink.tableChanges(spark, table, Seq("k"))
      .select("k", "change", "commit_seq", "commit_version")
      .as[(Long, String, Long, String)].collect().toSet
    // commit ids are the version names / their embedded millis
    val vs = AtomicParquetSink.versions(spark, table)
    assert(feed1.map(_._4).subsetOf(vs.toSet.drop(0) - vs.head))
    val v2tov3Seq = feed1.find(_._1 == 1L).map(_._3).get // k=1 deleted v2→v3

    // payloads: update carries both images, insert only _new, delete only _old
    val upd = AtomicParquetSink.tableChanges(spark, table, Seq("k"))
      .filter(col("change") === "update")
      .select(col("_old.bal"), col("_new.bal")).as[(Double, Double)]
      .collect().toSeq
    assert(upd == Seq((2.0, 9.0)))
    val byChange = AtomicParquetSink.tableChanges(spark, table, Seq("k"))
      .select(col("change"), col("_old").isNull, col("_new").isNull)
      .as[(String, Boolean, Boolean)].collect().toSet
    assert(byChange == Set(("update", false, false),
      ("insert", true, false), ("delete", false, true)))

    // GC: commit v4 with retention 3 → v1 drops; surviving pairs keep
    // their ORIGINAL commit_seq (a positional index would renumber)
    val v4 = Seq((2L, "b", 9.0), (3L, "c", 3.0), (4L, "d", 4.0))
      .toDF("k", "name", "bal")
    AtomicParquetSink.overwrite(v4, table, retainVersions = 3)
    val feed2 = AtomicParquetSink.tableChanges(spark, table, Seq("k"))
      .select("k", "change", "commit_seq")
      .as[(Long, String, Long)].collect().toSet
    assert(feed2.find(_._1 == 1L).map(_._3).contains(v2tov3Seq),
      s"commit id for the v2→v3 delete changed after GC: $feed2")
    // commit ids strictly increase with history order
    val seqs = AtomicParquetSink.tableChanges(spark, table, Seq("k"))
      .select("commit_seq").distinct().as[Long].collect().sorted
    assert(seqs.length == 2 && seqs(0) < seqs(1))
  }

  test("tableChangesSince resumes from a checkpointed commit across GC") {
    val table = tmp("graft-cdfi-") + "/t"
    def ver(rows: Seq[(Long, Double)], retain: Int) =
      AtomicParquetSink.overwrite(rows.toDF("k", "v"), table, retain)
    ver(Seq((1L, 1.0)), 4)
    ver(Seq((1L, 1.0), (2L, 2.0)), 4)
    ver(Seq((1L, 9.0), (2L, 2.0)), 4)
    // consumer processes everything retained, checkpoints max seq
    val all = AtomicParquetSink.tableChangesSince(spark, table, Seq("k"), -1L)
      .select("k", "change", "commit_seq").as[(Long, String, Long)]
      .collect()
    assert(all.map(t => (t._1, t._2)).toSet ==
      Set((2L, "insert"), (1L, "update")))
    val ckpt = all.map(_._3).max
    // caught up: empty result, schema intact
    val empty = AtomicParquetSink.tableChangesSince(spark, table, Seq("k"), ckpt)
    assert(empty.count() == 0 && empty.columns.contains("commit_seq"))
    // new commit with tighter retention GCs v1; the resumed read sees
    // EXACTLY the one new commit — no skip, no replay
    ver(Seq((1L, 9.0), (2L, 2.0), (3L, 3.0)), 3)
    val next = AtomicParquetSink.tableChangesSince(spark, table, Seq("k"), ckpt)
      .select("k", "change", "commit_seq").as[(Long, String, Long)]
      .collect()
    assert(next.map(t => (t._1, t._2)).toSeq == Seq((3L, "insert")))
    assert(next.head._3 > ckpt)
  }

  test("property: replaying tableChanges payloads reconstructs the final snapshot") {
    // The point of carrying _old/_new in the feed: a consumer holding
    // only the FIRST snapshot plus the change stream must be able to
    // reach the LAST snapshot without reading any intermediate one.
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val table = tmp(s"graft-cdfr$seed-") + "/t"
      def randState(): Seq[(Long, Double, String)] =
        (1L to 10L).filter(_ => rnd.nextBoolean())
          .map(k => (k, rnd.nextInt(1000) / 10.0, s"s${rnd.nextInt(3)}"))
      var states = Seq.empty[Seq[(Long, Double, String)]]
      while (states.size < 4) {
        val st = randState()
        if (st.nonEmpty) states :+= st
      }
      states.foreach(st => AtomicParquetSink.overwrite(
        st.toDF("k", "v", "s"), table, retainVersions = 6))
      val feed = AtomicParquetSink.tableChanges(spark, table, Seq("k"))
        .select(col("k"), col("change"), col("commit_seq"),
          col("_new.v").as("nv"), col("_new.s").as("ns"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some((r.getDouble(3), r.getString(4)))))
      // replay: fold commits in commit_seq order over the first state
      var replayed = states.head.map(t => t._1 -> (t._2, t._3)).toMap
      feed.groupBy(_._3).toSeq.sortBy(_._1).foreach { case (_, commits) =>
        commits.foreach {
          case (k, "delete", _, _) => replayed -= k
          case (k, _, _, Some(img)) => replayed += (k -> img)
          case other => fail(s"malformed feed row $other")
        }
      }
      val want = states.last.map(t => t._1 -> (t._2, t._3)).toMap
      assert(replayed == want,
        s"seed $seed: replay diverged\n$replayed\n$want")
    }
  }

  test("property: repeated upsertMoR batches converge to latest-wins") {
    for (seed <- Seq(7, 29)) {
      val rnd = new scala.util.Random(seed)
      val dir = tmp(s"graft-morp$seed-") + "/t"
      var expect = Map.empty[Long, Double]
      for (b <- 0 until 6) {
        val keys = rnd.shuffle((1L to 20L).toList).take(1 + rnd.nextInt(12))
        val rows = keys.map(k => (k, rnd.nextInt(10000) / 100.0))
        if (b == 0)
          rows.toDF("k", "v").repartition(2).write.parquet(dir)
        else
          DeletionVectors.upsertMoR(spark, dir, rows.toDF("k", "v"), "k")
        expect ++= rows.toMap
        // interleave ratio-triggered compaction like a real stream
        if (b % 2 == 1) DeletionVectors.compactIfNeeded(spark, dir, 0.4)
      }
      val got = DeletionVectors.read(spark, dir)
        .as[(Long, Double)].collect()
      assert(got.length == got.map(_._1).distinct.length,
        s"seed $seed: duplicate keys in MoR table")
      assert(got.toMap == expect, s"seed $seed: diverged from latest-wins")
    }
  }

  test("tableChangesSince fails loud when stranded, stays quiet when caught up") {
    val table = tmp("graft-cdfg-") + "/t"
    AtomicParquetSink.overwrite(Seq((1L, "a")).toDF("k", "n"), table, 5)
    AtomicParquetSink.overwrite(Seq((1L, "b")).toDF("k", "n"), table, 5)
    val ckpt = AtomicParquetSink
      .tableChangesSince(spark, table, Seq("k"), -1L)
      .agg(max(col("commit_seq"))).head().getLong(0)
    // schema change lands as the newest commit: a consumer behind it
    // must get a loud error (silent-empty would strand it forever)...
    AtomicParquetSink.overwrite(
      Seq((1L, "b", 0.0)).toDF("k", "n", "extra"), table, 5)
    val e = intercept[IllegalArgumentException] {
      AtomicParquetSink.tableChangesSince(spark, table, Seq("k"), ckpt)
    }
    assert(e.getMessage.contains("schema changed"))
    // ...while a consumer already past it polls an empty feed cleanly,
    // even though only ONE comparable version exists
    val newest = AtomicParquetSink.versions(spark, table)
      .last.substring(2, 22).toLong
    val caughtUp = AtomicParquetSink
      .tableChangesSince(spark, table, Seq("k"), newest)
    assert(caughtUp.count() == 0 && caughtUp.columns.contains("commit_seq"))
    // retention sliding past a checkpoint is loud too
    val e2 = intercept[IllegalArgumentException] {
      AtomicParquetSink.tableChangesSince(spark, table, Seq("k"), 0L)
    }
    assert(e2.getMessage.contains("retention slid past"))
  }

  test("a NULL op or NULL key fails the batch loudly, never silently deletes") {
    import graft.streaming.StreamMoR
    val dir = tmp("graft-mornull-") + "/t"
    Seq((1L, 1.0)).toDF("k", "v").write.parquet(dir)
    // null op: pre-fix this slipped the guard (null predicate skipped
    // by count(when)) and the presence locate DELETED key 1 silently
    val nullOp = Seq((1L, 9.0, Option.empty[String]))
      .toDF("k", "v", "op")
    val e = intercept[IllegalArgumentException] {
      StreamMoR.applyBatch(spark, dir, nullOp, 50L, "k", "op")
    }
    assert(e.getMessage.contains("unknown"))
    assert(spark.read.parquet(dir).count() == 1, "null-op batch mutated the table")
    val nullKey = Seq((Option.empty[Long], 9.0, "I"))
      .toDF("k", "v", "op")
    val e2 = intercept[IllegalArgumentException] {
      StreamMoR.applyBatch(spark, dir, nullKey, 51L, "k", "op")
    }
    assert(e2.getMessage.contains("NULL k"))
  }

  test("bootstrapGold refuses a foreign stream-built fact without force") {
    import graft.streaming.StreamMoR
    val work = tmp("graft-smgf-")
    val fact = s"$work/fact"
    val userCountry = Seq((1L, "A"), (2L, "A")).toDF("user_id", "country")
    // a DIFFERENT drain built the fact (markers exist, nothing staged
    // under THIS goldDir): implicit bootstrap must fail loud, not
    // quietly produce a delta-only gold missing every existing row
    StreamMorGold.processBatch(
      Seq((1L, 10.0, "2024-01-01 00:00:00", "I"))
        .toDF("user_id", "value", "ts_s", "op"),
      0L, fact, s"$work/gold_other", userCountry, "user_id", "op")
    val e = intercept[IllegalStateException] {
      StreamMorGold.bootstrapGold(spark, fact, s"$work/gold_new", userCountry)
    }
    assert(e.getMessage.contains("force = true"))
    // the documented quiesced attach works
    StreamMorGold.bootstrapGold(spark, fact, s"$work/gold_new", userCountry,
      force = true)
    val g = AtomicParquetSink.read(spark, s"$work/gold_new").get
      .select("country", "n_users").as[(String, Long)].collect().toSet
    assert(g == Set(("A", 1L)))
  }

  test("bootstrapGold does not double-count a crash between apply and fold") {
    import graft.streaming.StreamMoR
    val work = tmp("graft-smgb-")
    val fact = s"$work/fact"
    val gold = s"$work/gold"
    val userCountry = Seq((1L, "A"), (2L, "A")).toDF("user_id", "country")
    val batch = Seq(
      (1L, 10.0, "2024-01-01 00:00:00", "I"),
      (2L, 20.0, "2024-01-01 00:00:00", "I"))
      .toDF("user_id", "value", "ts_s", "op")
    // crash window: stage + apply land, the fold does NOT
    StreamMorGold.stageDeltas(batch, 0L, fact, gold, "user_id", "op")
    StreamMoR.applyBatch(spark, fact, batch, 0L, "user_id", "op")
    // recovery replays run(): bootstrap must NOT build gold from the
    // half-applied fact (the _commits marker proves stream batches
    // touched it), then the replayed batch folds exactly once
    StreamMorGold.bootstrapGold(spark, fact, gold, userCountry)
    assert(AtomicParquetSink.read(spark, gold).isEmpty,
      "bootstrap built gold from an applied-but-unfolded fact")
    StreamMorGold.processBatch(batch, 0L, fact, gold, userCountry,
      "user_id", "op")
    val g = AtomicParquetSink.read(spark, gold).get
      .select("country", "n_users", "total_value")
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(t => (t._1, t._2, t._3.doubleValue)).toSet
    assert(g == Set(("A", 2L, 30.0)), s"double-counted: $g")
  }

  test("tableChanges spans only the schema-consistent suffix") {
    val table = tmp("graft-cdfs-") + "/t"
    AtomicParquetSink.overwrite(
      Seq((1L, "a")).toDF("k", "name"), table, retainVersions = 5)
    // schema change: add a column — the pre-change pair is skipped
    AtomicParquetSink.overwrite(
      Seq((1L, "a", 0.0)).toDF("k", "name", "bal"), table,
      retainVersions = 5)
    AtomicParquetSink.overwrite(
      Seq((1L, "a", 5.0), (2L, "b", 1.0)).toDF("k", "name", "bal"), table,
      retainVersions = 5)
    val feed = AtomicParquetSink.tableChanges(spark, table, Seq("k"))
      .select("k", "change").as[(Long, String)].collect().toSet
    assert(feed == Set((1L, "update"), (2L, "insert")),
      s"expected only the post-evolution pair, got $feed")
  }

  // ---- ratio-triggered MoR compaction -------------------------------

  test("compactIfNeeded bounds live tombstones under a long MoR stream") {
    val dir = tmp("graft-morc-") + "/t"
    val ratio = 0.3
    val base = (1L to 400L).map(k => (k, k * 10.0)).toDF("k", "v")
    base.repartition(4).write.parquet(dir)
    // 8 micro-batches, each re-pricing a disjoint 40-key slice; compact
    // with the ratio trigger after every batch
    for (b <- 0 until 8) {
      val keys = (1L + b * 40L) to (40L + b * 40L)
      val batch = keys.map(k => (k, k * 10.0 + 1.0)).toDF("k", "v")
      DeletionVectors.upsertMoR(spark, dir, batch, "k")
      DeletionVectors.compactIfNeeded(spark, dir, ratio)
      // invariant: every live tombstone's file is below the threshold
      DeletionVectors.currentTombstones(spark, dir).foreach { t =>
        val perFile = t.groupBy("file").count().collect()
          .map(r => r.getString(0) -> r.getLong(1))
        perFile.foreach { case (f, n) =>
          val rows = spark.read.parquet(f).count()
          assert(rows == 0 || n.toDouble / rows < ratio,
            s"batch $b left file $f at delete ratio ${n.toDouble / rows}")
        }
      }
    }
    // value-neutrality: the DV read equals the expected final state
    val got = DeletionVectors.read(spark, dir)
      .as[(Long, Double)].collect().toMap
    val want = (1L to 400L).map(k =>
      k -> (if (k <= 320L) k * 10.0 + 1.0 else k * 10.0)).toMap
    assert(got == want)
  }

  test("compactIfNeeded is a no-op below the threshold") {
    val dir = tmp("graft-morn-") + "/t"
    (1L to 100L).map(k => (k, k.toString)).toDF("k", "s")
      .coalesce(1).write.parquet(dir)
    // 2 of 100 rows tombstoned — under a 10% trigger nothing rewrites
    DeletionVectors.deleteByKeys(spark, dir, "k", Seq(lit(3L), lit(9L)))
    assert(DeletionVectors.compactIfNeeded(spark, dir, 0.1) == 0)
    assert(DeletionVectors.currentTombstones(spark, dir).get.count() == 2)
    // but a 1% trigger rewrites the file and clears the slate
    assert(DeletionVectors.compactIfNeeded(spark, dir, 0.01) == 1)
    assert(DeletionVectors.currentTombstones(spark, dir)
      .map(_.count()).getOrElse(0L) == 0L)
    assert(DeletionVectors.read(spark, dir).count() == 98)
  }

  // ---- DV ∧ Z-order manifest box scan -------------------------------

  test("prunedBoxScan hides deleted rows AND actually skips files") {
    val dir = tmp("graft-dvz-") + "/t"
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i % 64).toLong, (i % 97).toDouble, s"p$i")
    }.toDF("id", "a", "b", "payload")
    ZOrderLayout.zorderWriteRankedN(df, Seq("a", "b"), dir, nFiles = 16)
    DeletionVectors.deleteWhere(spark, dir,
      col("a") === 5L && col("b") < 50.0)
    val box = Seq(
      ("a", lit(0L), lit(7L)),
      ("b", lit(0.0), lit(96.0)))
    val got = DeletionVectors.prunedBoxScan(spark, dir, box)
      .select("id").as[Long].collect().toSet
    val want = df.filter(col("a").between(0, 7) && col("b").between(0, 96)
        && !(col("a") === 5L && col("b") < 50.0))
      .select("id").as[Long].collect().toSet
    assert(got == want, "box scan through DVs diverged from the oracle")
    // raw box scan (no DV) WOULD resurrect the victims — proves the
    // composition is load-bearing, not vacuous
    val raw = ZOrderLayout.prunedBoxScanN(spark, dir, box)
      .select("id").as[Long].collect().toSet
    assert(raw != want && (raw -- want).nonEmpty)
    // and the narrow box genuinely skipped files
    val mf = ZOrderLayout.manifestN(spark, dir, Seq("a", "b"))
    val surviving = ZOrderLayout.survivingFilesN(mf, box)
    assert(surviving.size < 16,
      s"narrow box read all ${surviving.size} files — no skipping")
  }

  test("prunedCompositeScan hides deleted rows behind the double prune") {
    import graft.sink.{BloomSkipIndex, CompositeSkip}
    val dir = tmp("graft-cdvz-") + "/t"
    val df = (0 until 2048).map { i =>
      (i.toLong, (i % 32).toLong, (i % 53).toDouble)
    }.toDF("id", "a", "b")
    ZOrderLayout.zorderWriteRankedN(df, Seq("a", "b"), dir, nFiles = 8)
    BloomSkipIndex.writeBloomSidecar(spark, dir, "id")
    DeletionVectors.deleteByKeys(spark, dir, "id", Seq(lit(100L)))
    val box = Seq(("a", lit(0L), lit(31L)), ("b", lit(0.0), lit(52.0)))
    val probes = Seq(lit(100L), lit(200L), lit(300L))
    val got = DeletionVectors
      .prunedCompositeScan(spark, dir, box, "id", probes)
      .select("id").as[Long].collect().toSet
    assert(got == Set(200L, 300L), s"expected 100 hidden, got $got")
    // the raw composite scan resurrects the victim
    val raw = CompositeSkip.prunedScan(spark, dir, box, "id", probes)
      .select("id").as[Long].collect().toSet
    assert(raw == Set(100L, 200L, 300L))
  }

  test("deleteWhereInBox equals the full-scan delete, tombstone for tombstone") {
    val df = (0 until 1024).map { i =>
      (i.toLong, (i % 16).toLong, (i % 31).toDouble)
    }.toDF("id", "a", "b")
    val cond = col("a") === 9L && col("b") >= 10.0
    val box = Seq(("a", lit(9L), lit(9L)),
      ("b", lit(10.0), lit(Double.MaxValue)))
    val full = tmp("graft-dwf-") + "/t"
    val pruned = tmp("graft-dwp-") + "/t"
    ZOrderLayout.zorderWriteRankedN(df, Seq("a", "b"), full, nFiles = 8)
    ZOrderLayout.zorderWriteRankedN(df, Seq("a", "b"), pruned, nFiles = 8)
    val nFull = DeletionVectors.deleteWhere(spark, full, cond)
    val nPruned = DeletionVectors.deleteWhereInBox(spark, pruned, box, cond)
    assert(nFull == nPruned && nFull > 0)
    assert(DeletionVectors.read(spark, full).select("id").as[Long].collect().toSet
      == DeletionVectors.read(spark, pruned).select("id").as[Long].collect().toSet)
  }

  test("tombstone generations are GC'd, not accumulated, under a long stream") {
    val dir = tmp("graft-dvgc-") + "/t"
    (1L to 200L).map(k => (k, k.toString)).toDF("k", "s")
      .repartition(2).write.parquet(dir)
    for (b <- 0 until 6)
      DeletionVectors.deleteByKeys(spark, dir, "k",
        Seq(lit(1L + b * 3L), lit(2L + b * 3L)))
    // 6 generations committed; only the newest + one grace survive
    val gens = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_dv_g"))
    assert(gens.length == 2,
      s"expected newest+grace generations, found ${gens.map(_.getName).toSeq.sorted}")
    // and the accumulated set is intact: all 12 victims stay hidden
    assert(DeletionVectors.read(spark, dir).count() == 188)
  }

  test("streaming MoR drain with inline compaction is value-identical") {
    import graft.streaming.StreamMoR
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("op", StringType)))
    def drain(compactRatio: Double): Set[(Long, Double)] = {
      val work = tmp("graft-smc-")
      (1L to 300L).map(k => (k, k * 1.0)).toDF("k", "v")
        .repartition(3).write.parquet(s"$work/table")
      // 4 feed files, key-disjoint ops: update 1..150, delete 151..200
      Seq(
        (1L to 75L).map(k => (k, k + 0.5, "U")),
        (76L to 150L).map(k => (k, k + 0.5, "U")),
        (151L to 200L).map(k => (k, 0.0, "D")),
        (201L to 220L).map(k => (k + 1000L, k * 2.0, "I"))
      ).zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("k", "v", "op").coalesce(1)
          .write.mode("append").parquet(s"$work/feed")
      }
      StreamMoR.run(spark, s"$work/feed", schema, s"$work/ckpt",
        s"$work/table", "k", "op", compactRatio = compactRatio)
      if (compactRatio > 0) {
        // the compaction actually fired: live tombstones stay bounded
        DeletionVectors.currentTombstones(spark, s"$work/table").foreach { t =>
          t.groupBy("file").count().collect().foreach { r =>
            val rows = spark.read.parquet(r.getString(0)).count()
            assert(rows == 0 ||
              r.getLong(1).toDouble / rows < compactRatio,
              s"file ${r.getString(0)} over the compaction threshold")
          }
        }
      }
      DeletionVectors.read(spark, s"$work/table")
        .as[(Long, Double)].collect().toSet
    }
    val plain = drain(0.0)
    val compacted = drain(0.3)
    assert(plain == compacted, "inline compaction changed the table value")
    assert(plain.size == 300 - 50 + 20)
  }

  test("compactSmallFiles bin-packs a trickle-append table through its DVs") {
    val dir = tmp("graft-pack-") + "/t"
    // 10 trickle batches -> 10 small files
    for (b <- 0 until 10)
      (b * 100L until b * 100L + 100L).map(k => (k, k * 1.0))
        .toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    DeletionVectors.deleteByKeys(spark, dir, "k",
      Seq(lit(5L), lit(105L), lit(905L)))
    def dataFiles() = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")
        && !f.getName.startsWith("_"))
    assert(dataFiles().length == 10)
    val before = DeletionVectors.read(spark, dir)
      .as[(Long, Double)].collect().toSet
    val packed = DeletionVectors.compactSmallFiles(spark, dir,
      smallBytes = 8L << 20, targetBytes = 64L << 20)
    assert(packed == 10)
    assert(dataFiles().length < 10, "no packing happened")
    val after = DeletionVectors.read(spark, dir)
      .as[(Long, Double)].collect().toSet
    assert(after == before && !after.exists(r => Set(5L, 105L, 905L)(r._1)))
    // tombstones of packed-away files are retired with them
    assert(DeletionVectors.currentTombstones(spark, dir)
      .map(_.count()).getOrElse(0L) == 0L)
    // and a large file beside small ones is left untouched
    val dir2 = tmp("graft-pack2-") + "/t"
    (0L until 50000L).map(k => (k, "x" * 50)).toDF("k", "s")
      .coalesce(1).write.parquet(dir2)
    (50000L to 50010L).map(k => (k, "y")).toDF("k", "s")
      .coalesce(1).write.mode("append").parquet(dir2)
    val bigBefore = new java.io.File(dir2).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet
    // only ONE small file (the append) is under the threshold -> no-op
    assert(DeletionVectors.compactSmallFiles(spark, dir2,
      smallBytes = 64L << 10, targetBytes = 1L << 20) == 0)
    assert(new java.io.File(dir2).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet
      == bigBefore)
  }

  test("MoR appends reject schema drift loudly") {
    import graft.streaming.StreamMoR
    val dir = tmp("graft-morsd-") + "/t"
    Seq((1L, 1.0)).toDF("k", "v").write.parquet(dir)
    val extra = Seq((2L, 2.0, "x")).toDF("k", "v", "w")
    val missing = Seq(2L).toDF("k")
    for (bad <- Seq(extra, missing)) {
      val e = intercept[IllegalArgumentException] {
        DeletionVectors.upsertMoR(spark, dir, bad, "k")
      }
      assert(e.getMessage.contains("schema drifts"))
    }
    val e2 = intercept[IllegalArgumentException] {
      StreamMoR.applyBatch(spark, dir,
        Seq((2L, 2.0, "x", "I")).toDF("k", "v", "w", "op"), 99L, "k", "op")
    }
    assert(e2.getMessage.contains("schema drifts"))
    // nothing was appended and no marker was written by the failures
    assert(spark.read.parquet(dir).count() == 1)
    assert(!new java.io.File(s"$dir/_commits/batch-99").exists())
  }

  // ---- streaming MoR gold: delta routing ----------------------------

  test("streaming MoR gold batch replay is a structural no-op") {
    val work = tmp("graft-smgr-")
    val fact = s"$work/fact"
    val gold = s"$work/gold"
    Seq((1L, 10.0, "2024-01-01 00:00:00"), (2L, 20.0, "2024-01-01 00:00:00"))
      .toDF("user_id", "value", "ts_s").write.parquet(fact)
    val userCountry = Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("user_id", "country")
    StreamMorGold.bootstrapGold(spark, fact, gold, userCountry)
    val batch = Seq(
      (2L, 25.0, "2024-01-02 00:00:00", "U"),
      (3L, 7.0, "2024-01-02 00:00:00", "I"))
      .toDF("user_id", "value", "ts_s", "op")
    StreamMorGold.processBatch(batch, 0L, fact, gold, userCountry,
      "user_id", "op")
    def snap() = (
      DeletionVectors.read(spark, fact)
        .as[(Long, Double, String)].collect().toSet,
      AtomicParquetSink.read(spark, gold).get
        .select("country", "n_users", "total_value")
        .as[(String, Long, java.math.BigDecimal)].collect()
        .map(t => (t._1, t._2, t._3.doubleValue)).toSet)
    val (fact1, gold1) = snap()
    assert(fact1 == Set((1L, 10.0, "2024-01-01 00:00:00"),
      (2L, 25.0, "2024-01-02 00:00:00"), (3L, 7.0, "2024-01-02 00:00:00")))
    assert(gold1 == Set(("A", 2L, 35.0), ("B", 1L, 7.0)))
    // a redelivered batch (same id) must change NOTHING — the stage is
    // reused, the apply is marker-fenced, the fold is batch-id-fenced
    StreamMorGold.processBatch(batch, 0L, fact, gold, userCountry,
      "user_id", "op")
    assert(snap() == ((fact1, gold1)))
  }

  test("property: MoR gold counts/sums exact over random CDC histories") {
    // Random op histories (I/U/D with sloppy tags, arbitrary batch
    // splits, repeated keys across batches, full-country deletes) —
    // the folded gold's n_users/total_value must equal a from-scratch
    // aggregate of the final visible fact EXACTLY (count/sum deltas
    // retract exactly). last_seen is only an upper bound under
    // deletes (documented non-retraction of the running max).
    val userCountry = (1L to 12L).map(k => (k, s"C${k % 3}"))
      .toDF("user_id", "country")
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val work = tmp(s"graft-smgp$seed-")
      val fact = s"$work/fact"
      val gold = s"$work/gold"
      var ts = 0
      for (b <- 0 until 5) {
        val keys = rnd.shuffle((1L to 12L).toList).take(1 + rnd.nextInt(8))
        val rows = keys.zipWithIndex.map { case (k, i) =>
          ts += 1
          val op = if (b == 0 && i == 0) "I"
            else Seq("I", "U", "D")(rnd.nextInt(3))
          (k, rnd.nextInt(10000) / 100.0,
            f"2024-01-01 00:${ts / 60}%02d:${ts % 60}%02d", op)
        }
        StreamMorGold.processBatch(
          rows.toDF("user_id", "value", "ts_s", "op"), b.toLong,
          fact, gold, userCountry, "user_id", "op")
      }
      val folded = AtomicParquetSink.read(spark, gold).get
        .filter(col("n_users") =!= 0L)
        .select("country", "n_users", "total_value")
        .as[(String, Long, java.math.BigDecimal)].collect()
        .map(t => (t._1, t._2, t._3.doubleValue)).toSet
      val scratch = DeletionVectors.read(spark, fact)
        .join(userCountry, "user_id")
        .groupBy(col("country"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("value").cast("decimal(18,2)")).as("total_value"))
        .as[(String, Long, java.math.BigDecimal)].collect()
        .map(t => (t._1, t._2, t._3.doubleValue)).toSet
      assert(folded == scratch,
        s"seed $seed: folded $folded != from-scratch $scratch")
      // last_seen never below the surviving rows' max per country
      val foldLast = AtomicParquetSink.read(spark, gold).get
        .select("country", "last_seen").as[(String, String)]
        .collect().toMap
      DeletionVectors.read(spark, fact).join(userCountry, "user_id")
        .groupBy(col("country")).agg(max(col("ts_s")).as("m"))
        .as[(String, String)].collect().foreach { case (c, m) =>
          assert(foldLast(c) >= m, s"seed $seed: last_seen($c) regressed")
        }
    }
  }

  test("property: IncrementalGold equals from-scratch versioned aggregate") {
    // Random multi-version histories: repeated users across batches,
    // OUT-OF-ORDER versions (a batch can deliver an older ts than the
    // stored row — must fold as a no-op), error rows the quality gate
    // drops. The incremental gold must equal the from-scratch
    // latest-version-wins aggregate EXACTLY, last_seen included (no
    // deletes on this path, so the running max never needs to
    // retract).
    val userCountry = (1L to 10L).map(k => (k, s"C${k % 3}"))
      .toDF("user_id", "country")
    for (seed <- Seq(3, 13)) {
      val rnd = new scala.util.Random(seed)
      val work = tmp(s"graft-ivmp$seed-")
      var eid = 0L
      var all = Seq.empty[(Long, Long, String, Double, String)]
      for (b <- 0 until 4) {
        val rows = (0 until (3 + rnd.nextInt(8))).map { _ =>
          eid += 1
          val typ = if (rnd.nextInt(5) == 0) "error" else "click"
          // ts drawn RANDOMLY (not monotone) to exercise staleness
          (eid, 1L + rnd.nextInt(10),
            typ, rnd.nextInt(10000) / 100.0,
            f"2024-01-01 00:00:${rnd.nextInt(60)}%02d")
        }
        all ++= rows
        graft.streaming.IncrementalGold.processBatch(
          rows.toDF("event_id", "user_id", "event_type", "value", "ts_s"),
          b.toLong, s"$work/fact", s"$work/gold", userCountry)
      }
      val folded = AtomicParquetSink.read(spark, s"$work/gold").get
        .select("country", "n_users", "total_value", "last_seen")
        .as[(String, Long, java.math.BigDecimal, String)].collect()
        .map(t => (t._1, t._2, t._3.doubleValue, t._4)).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts_s").desc, col("event_id").desc)
      val scratch = all
        .toDF("event_id", "user_id", "event_type", "value", "ts_s")
        .filter(!(col("event_type") === "error"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .join(userCountry, "user_id")
        .groupBy(col("country"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("value").cast("decimal(18,2)")).as("total_value"),
          max(col("ts_s")).as("last_seen"))
        .as[(String, Long, java.math.BigDecimal, String)].collect()
        .map(t => (t._1, t._2, t._3.doubleValue, t._4)).toSet
      assert(folded == scratch,
        s"seed $seed: folded $folded != from-scratch $scratch")
    }
  }

  test("stageDeltas routes by presence, not by the op tag") {
    val work = tmp("graft-smgd-")
    val fact = s"$work/fact"
    Seq((1L, 10.0, "2024-01-01 00:00:00"))
      .toDF("user_id", "value", "ts_s").write.parquet(fact)
    // I on an existing key must route as an update (delta = new − old),
    // U on a missing key as an insert, D on a missing key as a no-op
    val batch = Seq(
      (1L, 25.0, "2024-01-02 00:00:00", "I"),
      (2L, 7.0, "2024-01-02 00:00:00", "U"),
      (3L, 99.0, "2024-01-02 00:00:00", "D"))
      .toDF("user_id", "value", "ts_s", "op")
    val deltas = StreamMorGold
      .stageDeltas(batch, 0L, fact, s"$work/gold", "user_id", "op")
      .select("user_id", "d_users", "d_value")
      .as[(Long, Long, java.math.BigDecimal)].collect()
      .map(t => (t._1, t._2, t._3.doubleValue)).toSet
    assert(deltas == Set((1L, 0L, 15.0), (2L, 1L, 7.0), (3L, 0L, 0.0)))
    // the delete's ts is nulled so it can never advance last_seen
    val dTs = StreamMorGold
      .stageDeltas(batch, 0L, fact, s"$work/gold", "user_id", "op")
      .filter(col("user_id") === 3L).select("ts_s")
      .collect().head.isNullAt(0)
    assert(dTs)
  }
}
