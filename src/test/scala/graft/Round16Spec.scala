package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.sink.{MorLog, MorLogStats}
import graft.plans.MorLogDmlStats

/** Round-16 specs: non-correlated subqueries in log-tier SQL DML
  * (IN / NOT IN / EXISTS / scalar — fold to literals; correlated
  * refuses loud; empty IN folds to FALSE so NOT IN keeps its
  * standard semantics), the repeated-source-column MERGE ON shape
  * (advice-caught), durable TBLPROPERTIES, the netBy tiebreak list,
  * vacuum dry-run, the detail size histogram, the version-stamped
  * ANN index refresh, and the persisted LSH band index. */
class Round16Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def cat(root: String): String = {
    val c = "r16_" + java.util.UUID.randomUUID().toString.take(8)
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

  /** A fresh keyed table (id, grp, v) with ids 0..99, 4 range files. */
  private def keyedTable(root: String): (String, String) = {
    val c = cat(root)
    val df = spark.range(100).toDF("id")
      .withColumn("grp", (col("id") % 5).cast("int"))
      .withColumn("v", col("id").cast("double"))
    MorLog.create(df.repartitionByRange(4, col("id"))
      .sortWithinPartitions("id"), s"$root/t")
    (c, s"$root/t")
  }

  // ---- SQL DML subqueries (round-15 verdict #1) ---------------------

  test("DELETE WHERE id IN (subquery) folds, prunes, and commits once") {
    val root = tmp("r16_delsub")
    val (c, dir) = keyedTable(root)
    spark.range(10).toDF("qid").createOrReplaceTempView(s"quar_$c")
    val v0 = MorLog.currentVersion(spark, dir)
    spark.sql(s"DELETE FROM $c.t WHERE id IN (SELECT qid FROM quar_$c)")
    assert(MorLog.currentVersion(spark, dir) == v0 + 1)
    assert(MorLogDmlStats.lastDeleted == 10)
    // ids 0..9 live in the first range file only — the folded literal
    // set must prune the other three
    assert(MorLogStats.lastLocateScanned >= 1 &&
      MorLogStats.lastLocateScanned < 4,
      s"scanned ${MorLogStats.lastLocateScanned} of 4")
    assert(MorLog.read(spark, dir).count() == 90)
  }

  test("NOT IN over an EMPTY subquery result deletes every row") {
    // x IN (empty) is FALSE — not NULL — per the SQL standard, so
    // NOT IN (empty) is TRUE for every row; a naive empty In-list
    // fold would yield NULL and silently delete nothing
    val root = tmp("r16_delniempty")
    val (c, dir) = keyedTable(root)
    spark.range(10).filter(col("id") < 0).toDF("qid")
      .createOrReplaceTempView(s"quar_$c")
    spark.sql(
      s"DELETE FROM $c.t WHERE id NOT IN (SELECT qid FROM quar_$c)")
    assert(MorLog.read(spark, dir).count() == 0)
  }

  test("UPDATE with scalar and EXISTS subqueries folds to literals") {
    val root = tmp("r16_updsub")
    val (c, dir) = keyedTable(root)
    // scalar: add the quarantine view's max id to v on matching rows;
    // EXISTS (non-empty) gates the whole statement
    spark.range(5, 8).toDF("qid").createOrReplaceTempView(s"quar_$c")
    spark.sql(s"""UPDATE $c.t
      SET v = v + (SELECT CAST(max(qid) AS DOUBLE) FROM quar_$c)
      WHERE id IN (SELECT qid FROM quar_$c)
        AND EXISTS (SELECT 1 FROM quar_$c)""")
    assert(MorLogDmlStats.lastUpdated == 3)
    val got = MorLog.read(spark, dir).filter(col("id").between(5, 7))
      .select(sum(col("v"))).head().getDouble(0)
    assert(got == (5 + 7) + (6 + 7) + (7 + 7),
      s"scalar fold drifted: $got")
    // scalar subquery over an empty set folds to NULL → no victims
    spark.range(0).toDF("qid").createOrReplaceTempView(s"quare_$c")
    spark.sql(s"UPDATE $c.t SET v = 0 WHERE " +
      s"id = (SELECT max(qid) FROM quare_$c)")
    assert(MorLogDmlStats.lastUpdated == 0)
  }

  test("EXPLAIN of subquery DML never executes the subquery; plain DELETE keeps the V2 route") {
    val root = tmp("r16_explain")
    val (c, dir) = keyedTable(root)
    // a quarantine view whose EVALUATION is observable
    val acc = spark.sparkContext.longAccumulator("r16_probe")
    spark.range(5).toDF("qid").as[Long](org.apache.spark.sql.Encoders
        .scalaLong)
      .map { x => acc.add(1); x }(org.apache.spark.sql.Encoders.scalaLong)
      .toDF("qid").createOrReplaceTempView(s"quar_$c")
    val v0 = MorLog.currentVersion(spark, dir)
    spark.sql(s"EXPLAIN DELETE FROM $c.t WHERE id IN " +
      s"(SELECT qid FROM quar_$c)").collect()
    assert(acc.value == 0,
      s"EXPLAIN must not execute the folded subquery (ran " +
        s"${acc.value} rows)") // the Shielded-holder laziness claim
    assert(MorLog.currentVersion(spark, dir) == v0,
      "EXPLAIN must not commit")
    // executing it DOES evaluate, exactly once per statement
    spark.sql(s"DELETE FROM $c.t WHERE id IN (SELECT qid FROM quar_$c)")
    assert(acc.value == 5 && MorLog.read(spark, dir).count() == 95)
    // a PLAIN predicate keeps Spark's strict V2 SupportsDeleteV2
    // route — our DML exec (which stamps lastDeleted) must not fire
    graft.plans.MorLogDmlStats.lastDeleted = -7L
    spark.sql(s"DELETE FROM $c.t WHERE id >= 90")
    assert(graft.plans.MorLogDmlStats.lastDeleted == -7L,
      "plain-predicate DELETE must stay on the V2 route")
    assert(MorLog.read(spark, dir).count() == 85)
  }

  test("correlated subqueries in DML refuse loud") {
    val root = tmp("r16_corr")
    val (c, dir) = keyedTable(root)
    spark.range(10).toDF("qid").createOrReplaceTempView(s"quar_$c")
    val del = intercept[Exception] {
      spark.sql(s"DELETE FROM $c.t t WHERE EXISTS " +
        s"(SELECT 1 FROM quar_$c q WHERE q.qid = t.id)")
    }
    val upd = intercept[Exception] {
      spark.sql(s"UPDATE $c.t t SET v = 0 WHERE EXISTS " +
        s"(SELECT 1 FROM quar_$c q WHERE q.qid = t.id)")
    }
    // refusal may come from the fold (correlated) or from Spark's own
    // analysis — either way the statement must NOT partially apply
    assert(del != null && upd != null)
    assert(MorLog.read(spark, dir).count() == 100,
      "a refused statement must leave the table untouched")
  }

  test("subquery row cap refuses a non-broadcastable fold") {
    val root = tmp("r16_cap")
    val (c, dir) = keyedTable(root)
    spark.range(50).toDF("qid").createOrReplaceTempView(s"quar_$c")
    spark.conf.set(graft.plans.MorLogDmlTranslate.SubqueryRowCapKey, "10")
    try {
      val e = intercept[Exception] {
        spark.sql(
          s"DELETE FROM $c.t WHERE id IN (SELECT qid FROM quar_$c)")
      }
      assert(chain(e).contains("broadcast-scale"), chain(e))
      assert(MorLog.read(spark, dir).count() == 100)
    } finally spark.conf
      .unset(graft.plans.MorLogDmlTranslate.SubqueryRowCapKey)
  }

  test("MERGE ON accepts a repeated source column (advice-caught)") {
    val root = tmp("r16_dupsrc")
    val c = cat(root)
    // target keyed on (a, b); source carries ONE column k matched to
    // both — upstream Spark/Delta accept the shape
    MorLog.create(Seq((1L, 1L, 10.0), (2L, 2L, 20.0), (1L, 2L, 99.0))
      .toDF("a", "b", "v"), s"$root/t")
    Seq((1L, 1.0), (2L, 2.0), (5L, 5.0)).toDF("k", "sv")
      .createOrReplaceTempView(s"src_$c")
    spark.sql(s"""MERGE INTO $c.t AS t USING src_$c AS s
      ON t.a = s.k AND t.b = s.k
      WHEN MATCHED THEN UPDATE SET v = t.v + s.sv
      WHEN NOT MATCHED THEN INSERT (a, b, v) VALUES (s.k, s.k, s.sv)""")
    // (1,1) and (2,2) match; (1,2) does not (diagonal only); 5 inserts
    assert(MorLogDmlStats.lastUpdated == 2 &&
      MorLogDmlStats.lastInserted == 1,
      s"upd ${MorLogDmlStats.lastUpdated} ins " +
        s"${MorLogDmlStats.lastInserted}")
    val got = MorLog.read(spark, s"$root/t").orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1L, 11.0), (1L, 2L, 99.0),
      (2L, 2L, 22.0), (5L, 5L, 5.0)), got.toSeq.toString)
  }

  // ---- durable TBLPROPERTIES (round-15 verdict #3) -------------------

  test("TBLPROPERTIES: set/unset round-trips, survives vacuum/restore/clone") {
    val root = tmp("r16_props")
    val (c, dir) = keyedTable(root)
    spark.sql(s"ALTER TABLE $c.t SET TBLPROPERTIES " +
      "('graft.vacuum.debrisGraceMs' = '7', 'x.y' = 'z')")
    assert(MorLog.tableProps(spark, dir) ==
      Map("graft.vacuum.debrisGraceMs" -> "7", "x.y" -> "z"))
    // UNSET drops one key, keeps the rest
    spark.sql(s"ALTER TABLE $c.t UNSET TBLPROPERTIES ('x.y')")
    assert(MorLog.tableProps(spark, dir) ==
      Map("graft.vacuum.debrisGraceMs" -> "7"))
    // later commits CARRY the map; restore preserves it
    MorLog.deleteWhere(spark, dir, col("id") === 0)
    MorLog.restore(spark, dir, 1)
    assert(MorLog.tableProps(spark, dir)
      .get("graft.vacuum.debrisGraceMs").contains("7"))
    // vacuum prunes history without losing the map (the tip meta is
    // the O(1) source of truth) — and a FRESH driver (caches dropped,
    // re-parse from disk) reads the same map: the durability claim is
    // about bytes on disk, not a warm cache
    MorLog.vacuum(spark, dir, keepVersions = 1)
    MorLog.dropStateCache()
    assert(MorLog.tableProps(spark, dir)
      .get("graft.vacuum.debrisGraceMs").contains("7"))
    // a clone inherits the source's properties
    MorLog.shallowClone(spark, dir, s"$root/t2")
    assert(MorLog.tableProps(spark, s"$root/t2")
      .get("graft.vacuum.debrisGraceMs").contains("7"))
    // precedence: the table property beats the session conf
    spark.conf.set("graft.vacuum.debrisGraceMs", "99999")
    try assert(MorLog.tableProp(spark, dir,
      "graft.vacuum.debrisGraceMs").contains("7"))
    finally spark.conf.unset("graft.vacuum.debrisGraceMs")
    // ... and the session conf serves tables without the property
    spark.conf.set("graft.vacuum.debrisGraceMs", "99999")
    try {
      MorLog.create(spark.range(3).toDF("id"), s"$root/t3")
      assert(MorLog.tableProp(spark, s"$root/t3",
        "graft.vacuum.debrisGraceMs").contains("99999"))
    } finally spark.conf.unset("graft.vacuum.debrisGraceMs")
    // CREATE TABLE ... TBLPROPERTIES lands durably (reserved keys
    // like owner are Spark's, not the user's — filtered)
    spark.sql(s"CREATE TABLE $c.t4 (a BIGINT) " +
      "TBLPROPERTIES ('graft.sink.maxOpenWriters' = '5')")
    assert(MorLog.tableProps(spark, s"$root/t4") ==
      Map("graft.sink.maxOpenWriters" -> "5"))
    // URL-encoding keeps hostile values meta-safe
    MorLog.setTblProperties(spark, dir,
      Map("weird key" -> "a@b\nc&d=e|f"))
    assert(MorLog.tableProps(spark, dir)("weird key") == "a@b\nc&d=e|f")
  }

  // ---- netBy tiebreak list (round-15 verdict #6) ---------------------

  test("netBy tiebreak list drains tied coarse ordinals; full-tuple tie refuses") {
    import org.apache.spark.sql.streaming.Trigger
    def drain(rows: Seq[(Long, Double, Long, Long)], root: String,
              netBy: String): MorLog.State = {
      val dir = s"$root/t"
      MorLog.createEmpty(spark, dir, rows.take(0).toDF(
        "id", "v", "ord", "seq").schema)
      val feed = s"$root/feed"
      rows.toDF("id", "v", "ord", "seq").repartition(1)
        .write.parquet(feed)
      val q = spark.readStream
        .schema(rows.toDF("id", "v", "ord", "seq").schema).parquet(feed)
        .writeStream.format("graft.sources.MorLogSource")
        .option("path", dir).option("mergeKey", "id")
        .option("netBy", netBy)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      MorLog.state(spark, dir, MorLog.currentVersion(spark, dir))
    }
    // two versions of key 7 tie on the coarse ord; the fine seq breaks
    // the tie — highest (ord, seq) wins
    val rootA = tmp("r16_netlist")
    drain(Seq((7L, 1.0, 5L, 1L), (7L, 2.0, 5L, 2L), (8L, 3.0, 5L, 1L)),
      rootA, "ord,seq")
    val got = MorLog.read(spark, s"$rootA/t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((7L, 2.0), (8L, 3.0)), got.toString)
    // a FULL-tuple tie still refuses, and the remedy names the option
    val rootB = tmp("r16_nettie")
    val e = intercept[Exception] {
      drain(Seq((7L, 1.0, 5L, 1L), (7L, 2.0, 5L, 1L)), rootB, "ord,seq")
    }
    assert(chain(e).contains("comma-separated tiebreak"), chain(e))
  }

  // ---- vacuum dry-run + detail histogram (round-15 verdict #7) ------

  test("vacuum dry-run lists without deleting; real vacuum matches") {
    val root = tmp("r16_vdry")
    val (c, dir) = keyedTable(root)
    MorLog.deleteWhere(spark, dir, col("id") < 10)
    // compact REPLACES the original 4 files, so vacuum(keep 1) has
    // real data files to drop — the review-caught double-report only
    // reproduced when the drop loop actually named files
    MorLog.compact(spark, dir)
    val before = MorLog.read(spark, dir).count()
    val would = MorLog.vacuumDryRun(spark, dir, keepVersions = 1)
    assert(would.nonEmpty)
    val wdata = would.collect { case ("data", p) => p }
    assert(wdata.size >= 4, s"expected the 4 replaced files: $would")
    // no duplicate reporting across the drop loop and the debris
    // sweep (review-caught: files surfaced twice in two spellings)
    val names = would.map { case (_, p) =>
      new org.apache.hadoop.fs.Path(p).getName }
    assert(names.distinct.size == names.size,
      s"dry-run duplicated entries: $would")
    // STRICTLY read-only: same versions, same rows, still time-travels
    assert(MorLog.versions(spark, dir) == Seq(0, 1, 2))
    assert(MorLog.read(spark, dir).count() == before)
    val wouldData = would.collect { case ("data", p) => p }.toSet
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    val existing = wouldData.filter(p =>
      fs.exists(new org.apache.hadoop.fs.Path(p)))
    val deleted = MorLog.vacuum(spark, dir, keepVersions = 1)
    // the real pass deletes exactly the data files the dry-run named
    assert(deleted == existing.size,
      s"dry-run named ${existing.size} data files, vacuum deleted " +
        s"$deleted")
    existing.foreach(p => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(p)), s"$p survived"))
    // the dry-run on the CALL surface
    val rows = spark.sql(
      s"CALL $c.system.vacuum('t', 1, dry_run => true)").collect()
    assert(rows.forall(_.length == 2)) // (kind, path) shape
  }

  test("CALL system.maintain packs debris and vacuums in one call") {
    val root = tmp("r16_maint")
    val (c, dir) = keyedTable(root)
    // trickle appends leave small-file debris; an old version to drop
    MorLog.append(spark, dir, spark.range(100, 110).toDF("id")
      .withColumn("grp", (col("id") % 5).cast("int"))
      .withColumn("v", col("id").cast("double")))
    MorLog.compact(spark, dir)
    val r = spark.sql(s"CALL $c.system.maintain('t', 1)").head()
    assert(r.getInt(1) > 0, s"vacuum leg must drop files: $r")
    assert(MorLog.read(spark, dir).count() == 110)
  }

  test("detail carries the size histogram off cached lengths") {
    val root = tmp("r16_detail")
    val (c, dir) = keyedTable(root)
    val r = spark.sql(s"CALL $c.system.detail('t')").head()
    val (tot, p50, p90, mx) = (r.getLong(6), r.getLong(7),
      r.getLong(8), r.getLong(9))
    assert(tot > 0 && p50 > 0 && p50 <= p90 && p90 <= mx && mx <= tot,
      s"histogram drifted: total=$tot p50=$p50 p90=$p90 max=$mx")
    val sum = MorLog.fileSizeSummary(spark, dir)
    assert(sum.contains((tot, p50, p90, mx)))
  }

  // ---- version-stamped ANN refresh (round-15 verdict #4) -------------

  test("PqIndex refresh is a no-op when fresh and refuses when stampless") {
    val root = tmp("r16_pq")
    val e = spark.range(64).toDF("vec_id").withColumn("embedding",
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(lit(0), lit(63)),
        i => (col("vec_id") * 31 + i).cast("float") % 7))
    MorLog.create(e, s"$root/t")
    graft.ann.PqIndex.writeFromTable(spark, s"$root/t", "embedding",
      "vec_id", s"$root/idx", m = 8)
    assert(graft.ann.PqIndex.refresh(spark, s"$root/idx") == 0L)
    // a static-corpus (stampless) index: serving never guards,
    // refresh refuses loud
    graft.ann.PqIndex.write(e, "embedding", "vec_id", s"$root/idx2",
      m = 8)
    val r = intercept[Exception] {
      graft.ann.PqIndex.refresh(spark, s"$root/idx2")
    }
    assert(chain(r).contains("no source stamp"), chain(r))
    // deleting every low id then refreshing drops them from serving
    MorLog.deleteWhere(spark, s"$root/t", col("vec_id") < 8)
    intercept[Exception] {
      graft.ann.PqIndex.adcTopK(spark, s"$root/idx",
        e.filter(col("vec_id") === 60), "embedding", "vec_id", 8, 3)
    }
    graft.ann.PqIndex.refresh(spark, s"$root/idx")
    val top = graft.ann.PqIndex.adcTopK(spark, s"$root/idx",
      e.filter(col("vec_id") === 60), "embedding", "vec_id", 8, 3)
      .collect()
    assert(top.nonEmpty &&
      top.forall(_.getAs[Long]("neighbor_id") >= 8),
      "refresh must drop deleted ids from serving")
  }

  // ---- persisted LSH band index (round-15 verdict #5) ----------------

  test("band index: small probe prunes the bucket partitions") {
    val root = tmp("r16_band")
    val docs = spark.range(300).toDF("doc_id").withColumn("text",
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit("w"), ((col("doc_id") * 13 + i) % 40))): _*))
    // corpus first (bulk), then a 2-doc probe increment: its ≤8 band
    // keys touch ≤8 of the 64 bucket partitions, so the candidate
    // scan must skip files
    graft.dedup.BandIndex.ingest(spark, root,
      docs.filter(col("doc_id") >= 10), "doc_id", "text")
    graft.dedup.BandIndex.ingest(spark, root,
      docs.filter(col("doc_id") < 2), "doc_id", "text")
    import graft.dedup.BandIndexStats
    assert(BandIndexStats.lastBandFilesScanned >= 0 &&
      BandIndexStats.lastBandFilesSkipped > 0,
      s"scanned ${BandIndexStats.lastBandFilesScanned}, skipped " +
        s"${BandIndexStats.lastBandFilesSkipped} — the probe must " +
        "prune bucket partitions")
  }

  test("band index maintenance packs files without changing answers") {
    val root = tmp("r16_bandm")
    val docs = spark.range(240).toDF("doc_id").withColumn("text",
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit("w"), ((col("doc_id") * 13 + i) % 40))): _*))
    def part(i: Int) = docs.filter(col("doc_id") % 4 === i)
    val p0 = graft.dedup.BandIndex.ingest(spark, root, part(0),
      "doc_id", "text").collect().toSet
    val p1 = graft.dedup.BandIndex.ingest(spark, root, part(1),
      "doc_id", "text").collect().toSet
    val p2 = graft.dedup.BandIndex.ingest(spark, root, part(2),
      "doc_id", "text").collect().toSet
    def nFiles(d: String) = MorLog.state(spark, d,
      MorLog.currentVersion(spark, d)).files.size
    val before = nFiles(s"$root/bands")
    val (packed, clustered) = graft.dedup.BandIndex.maintain(spark, root)
    assert(packed > 0 && clustered > 0,
      s"3 increments must leave packable debris ($packed, $clustered)")
    assert(nFiles(s"$root/bands") < before,
      "maintenance must shrink the bands file count")
    // a post-maintenance ingest still answers exactly (and the batch
    // result over the whole corpus stays the increments' union)
    val p3 = graft.dedup.BandIndex.ingest(spark, root, part(3),
      "doc_id", "text").collect().toSet
    val batch = graft.dedup.Dedup.minhashNearDups(docs, "doc_id", "text")
      .collect().toSet
    assert((p0 ++ p1 ++ p2 ++ p3) == batch,
      "rolling pairs across maintenance drifted from the batch result")
  }

  test("MERGE clause conditions fold non-correlated subqueries") {
    val root = tmp("r16_mergesub")
    val c = cat(root)
    MorLog.create(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"),
      s"$root/t")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "sv")
      .createOrReplaceTempView(s"src_$c")
    spark.range(2, 3).toDF("qid").createOrReplaceTempView(s"gate_$c")
    spark.sql(s"""MERGE INTO $c.t AS t USING src_$c AS s
      ON t.id = s.id
      WHEN MATCHED AND s.id IN (SELECT qid FROM gate_$c)
        THEN UPDATE SET v = t.v + s.sv""")
    assert(MorLogDmlStats.lastUpdated == 1)
    val got = MorLog.read(spark, s"$root/t").orderBy("id")
      .collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(10.0, 22.0), got.toString)
  }
}
