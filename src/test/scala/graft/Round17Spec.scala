package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.sink.MorLog
import graft.plans.MorLogDmlStats

/** Round-17 specs: the tuple (multi-column) IN-subquery fold for
  * log-tier DML (struct-literal In + per-column prune lists, exact
  * row-value 3VL incl. NULL left fields, NULL list members refuse),
  * BandIndex's capped driver collects with distributed fallbacks and
  * the conf-driven shingle file shape, the version-stamped IvfIndex
  * (stale refusal, allowStale, cell-scoped refresh), PqIndex's
  * crash-idempotent tier rewrite, atomic CREATE-with-TBLPROPERTIES,
  * the qualified-path vacuum dry-run dedup, and the index-maintenance
  * SQL procedures. */
class Round17Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def cat(root: String): String = {
    val c = "r17_" + java.util.UUID.randomUUID().toString.take(8)
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

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach { case (k, o) =>
      o match { case Some(v) => spark.conf.set(k, v)
                case None => spark.conf.unset(k) } }
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

  // ---- tuple IN (subquery) DML (verdict #5) -------------------------

  test("DELETE WHERE (k1,k2) IN (subquery) folds, prunes, commits once") {
    val root = tmp("r17_tup")
    val (c, dir) = keyedTable(root)
    spark.range(10).toDF("qid")
      .withColumn("qgrp", (col("qid") % 5).cast("int"))
      .createOrReplaceTempView(s"tq_$c")
    val v0 = MorLog.currentVersion(spark, dir)
    spark.sql(s"DELETE FROM $c.t WHERE (id, grp) IN " +
      s"(SELECT qid, qgrp FROM tq_$c)")
    assert(MorLog.currentVersion(spark, dir) == v0 + 1)
    assert(MorLogDmlStats.lastDeleted == 10)
    // ids 0..9 live in the first range file only — the per-column
    // lists conjoined onto the struct fold must keep the prune
    assert(graft.sink.MorLogStats.lastLocateScanned == 1,
      s"scanned ${graft.sink.MorLogStats.lastLocateScanned}")
    assert(MorLog.read(spark, dir).count() == 90)
  }

  test("tuple IN matches only full tuples, not per-column matches") {
    val root = tmp("r17_tupx")
    val (c, dir) = keyedTable(root)
    // (7, 0) — id 7 exists but carries grp 2, id 10 carries grp 0:
    // neither row may be deleted on a half-match
    Seq((7L, 0), (10L, 3)).toDF("qid", "qgrp")
      .createOrReplaceTempView(s"tqx_$c")
    spark.sql(s"DELETE FROM $c.t WHERE (id, grp) IN " +
      s"(SELECT qid, qgrp FROM tqx_$c)")
    assert(MorLogDmlStats.lastDeleted == 0)
    assert(MorLog.read(spark, dir).count() == 100)
  }

  test("tuple NOT IN keeps exact row-value 3VL over NULL left fields") {
    val root = tmp("r17_tupnull")
    val c = cat(root)
    val dir = s"$root/t"
    // grp NULL rows: id 50 (its non-null field MATCHES a list tuple's
    // first column -> membership is NULL -> NOT IN is NULL -> KEPT)
    // and id 60 (no list tuple has first col 60 -> membership FALSE
    // -> NOT IN TRUE -> DELETED). Binary struct semantics would have
    // deleted both.
    val df = spark.range(100).toDF("id")
      .withColumn("grp",
        when(col("id").isin(50L, 60L), lit(null))
          .otherwise(col("id") % 5).cast("int"))
      .withColumn("v", col("id").cast("double"))
    MorLog.create(df.repartitionByRange(4, col("id"))
      .sortWithinPartitions("id"), dir)
    Seq((50L, 1), (51L, 1)).toDF("qid", "qgrp")
      .createOrReplaceTempView(s"tqn_$c")
    spark.sql(s"DELETE FROM $c.t WHERE (id, grp) NOT IN " +
      s"(SELECT qid, qgrp FROM tqn_$c)")
    val kept = MorLog.read(spark, dir).select("id")
      .collect().map(_.getLong(0)).toSet
    // ground truth from Spark's own (unfolded) row-value NOT IN on a
    // plain DataFrame of the same content: DELETE removes exactly the
    // rows that query returns (where the predicate is TRUE)
    df.createOrReplaceTempView(s"plain_$c")
    val victims = spark.sql(
      s"SELECT id FROM plain_$c WHERE (id, grp) NOT IN " +
        s"(SELECT qid, qgrp FROM tqn_$c)")
      .collect().map(_.getLong(0)).toSet
    val expectedKept = (0L until 100L).toSet -- victims
    assert(kept == expectedKept, s"kept $kept vs $expectedKept")
    // (50, NULL) could still match (50, 1) -> membership NULL -> NOT
    // IN NULL -> kept; (60, NULL) matches no first column -> NOT IN
    // TRUE -> deleted (Spark's own 3VL, probed empirically)
    assert(kept.contains(50L) && !kept.contains(60L))
  }

  test("a NULL member inside the tuple list refuses loud") {
    val root = tmp("r17_tuplistnull")
    val (c, _) = keyedTable(root)
    Seq((Some(5L), None: Option[Int]), (Some(6L), Some(1)))
      .toDF("qid", "qgrp").createOrReplaceTempView(s"tln_$c")
    val t = intercept[Throwable](spark.sql(
      s"DELETE FROM $c.t WHERE (id, grp) IN " +
        s"(SELECT qid, qgrp FROM tln_$c)"))
    assert(chain(t).contains("NULL field"), chain(t))
  }

  test("nullable tuple keys past tupleNullFallbackCap refuse loud") {
    val root = tmp("r17_tupcap")
    val (c, _) = keyedTable(root)
    spark.range(30).toDF("qid")
      .withColumn("qgrp", (col("qid") % 5).cast("int"))
      .createOrReplaceTempView(s"tcap_$c")
    withConf("graft.dml.tupleNullFallbackCap" -> "10") {
      val t = intercept[Throwable](spark.sql(
        s"DELETE FROM $c.t WHERE (id, grp) IN " +
          s"(SELECT qid, qgrp FROM tcap_$c)"))
      assert(chain(t).contains("tupleNullFallbackCap"), chain(t))
    }
  }

  // ---- BandIndex capped collects + shingle shape (verdict #3/#7) ----

  /** 24 docs in two batches; doc 3k and 3k+1 share a long prefix so
    * cross-batch near-dup pairs exist. */
  private def bandDocs = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma"
    (0 until 24).map { i =>
      val noise = if (i % 3 == 1) " tail" + (i / 3) else ""
      (i.toLong, base + " word" + (i / 3) + noise)
    }.toDF("doc_id", "text")
  }

  test("BandIndex past-cap ingest takes the distributed path, pairs exact") {
    val docs = bandDocs
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    def pairsOf(root: String): Set[(Long, Long)] = {
      val p0 = graft.dedup.BandIndex.ingest(spark, root, a, "doc_id",
        "text", n = 3, k = 12, bands = 4, tau = 0.8)
      val p1 = graft.dedup.BandIndex.ingest(spark, root, b, "doc_id",
        "text", n = 3, k = 12, bands = 4, tau = 0.8)
      p0.unionByName(p1).select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val underCap = pairsOf(tmp("r17_bandu"))
    var distributed: Set[(Long, Long)] = null
    withConf("graft.dedup.ingestKeyCap" -> "1",
             "graft.dedup.candidateIdCap" -> "1") {
      distributed = pairsOf(tmp("r17_bandd"))
      // the distributed shingle fetch marks "no literal prune ran"
      assert(graft.dedup.BandIndexStats.lastShingleFilesScanned == -1)
    }
    val oneShot = graft.dedup.Dedup.minhashNearDups(docs, "doc_id",
      "text", n = 3, k = 12, bands = 4, tau = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(underCap == oneShot, s"under-cap $underCap vs $oneShot")
    assert(distributed == oneShot, s"distributed $distributed vs $oneShot")
    assert(oneShot.nonEmpty)
  }

  test("shingle file shape follows the per-ingest conf") {
    val root = tmp("r17_bandsh")
    def shFiles(): Int = MorLog.history(spark, s"$root/sh")
      .orderBy(col("version").desc).head().getInt(2)
    withConf("graft.dedup.shingleFilesPerIngest" -> "7") {
      graft.dedup.BandIndex.ingest(spark, root, bandDocs, "doc_id",
        "text", n = 3, k = 12, bands = 4, tau = 0.8)
      assert(shFiles() == 7, s"sh tier holds ${shFiles()} files")
    }
    // derived mode: rows-per-file=5 over 24 docs -> 5 id-range files
    withConf("graft.dedup.shingleRowsPerFile" -> "5") {
      val root2 = tmp("r17_bandsh2")
      graft.dedup.BandIndex.ingest(spark, root2, bandDocs, "doc_id",
        "text", n = 3, k = 12, bands = 4, tau = 0.8)
      val n = MorLog.history(spark, s"$root2/sh")
        .orderBy(col("version").desc).head().getInt(2)
      assert(n == 5, s"derived shape landed $n files")
    }
  }

  // ---- IvfIndex version stamp + refresh (verdict #4) ----------------

  private def embTable(root: String): String = {
    val dir = s"$root/emb"
    val e = spark.range(60).toDF("vec_id")
      .withColumn("label", (col("vec_id") % 5).cast("int"))
      .withColumn("embedding", array((0 until 8).map(j =>
        ((col("vec_id") * (j + 3)) % 17).cast("float") + lit(j.toFloat)
      ): _*))
    MorLog.create(e.repartitionByRange(4, col("vec_id"))
      .sortWithinPartitions("vec_id"), dir)
    dir
  }

  test("IvfIndex: stale refuses, allowStale serves, refresh == rebuild") {
    val root = tmp("r17_ivf")
    val (tbl, idx) = (embTable(root), s"$root/ivf")
    graft.ann.IvfIndex.writeFromTable(spark, tbl, "vec_id", "embedding",
      "label", idx)
    val q = MorLog.read(spark, tbl).filter(col("vec_id") < 4)
    // fresh serves
    assert(graft.ann.IvfIndex.searchIndexed(spark, idx, q, "vec_id",
      "embedding", k = 2).count() > 0)
    // move the table: delete 2 ids, move 2 ids one cell over
    MorLog.deleteWhere(spark, tbl, col("vec_id").isin(10L, 11L))
    val upd = MorLog.read(spark, tbl)
      .filter(col("vec_id").isin(20L, 21L))
      .withColumn("label", ((col("label") + 1) % 5).cast("int"))
    MorLog.upsert(spark, tbl, upd, "vec_id")
    val stale = intercept[IllegalStateException](
      graft.ann.IvfIndex.searchIndexed(spark, idx, q, "vec_id",
        "embedding", k = 2))
    assert(stale.getMessage.contains("allowStale"))
    // allowStale serves the old snapshot knowingly
    assert(graft.ann.IvfIndex.searchIndexed(spark, idx, q, "vec_id",
      "embedding", k = 2, allowStale = true).count() > 0)
    // refresh: counters O(affected cells), answers == a fresh rebuild
    val n = graft.ann.IvfIndex.refresh(spark, idx)
    assert(n == 4, s"refresh applied $n ids")
    val cells = graft.ann.IvfIndexStats.lastRefreshCellsRewritten
    assert(cells > 0 && cells < 5, s"rewrote $cells of 5 cells")
    val got = graft.ann.IvfIndex.searchIndexed(spark, idx,
      MorLog.read(spark, tbl).filter(col("vec_id") < 4),
      "vec_id", "embedding", k = 2)
    val idx2 = s"$root/ivf2"
    graft.ann.IvfIndex.writeFromTable(spark, tbl, "vec_id", "embedding",
      "label", idx2)
    val want = graft.ann.IvfIndex.searchIndexed(spark, idx2,
      MorLog.read(spark, tbl).filter(col("vec_id") < 4),
      "vec_id", "embedding", k = 2)
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
    // idempotent tail: a no-op refresh applies nothing
    assert(graft.ann.IvfIndex.refresh(spark, idx) == 0L)
  }

  test("IvfIndex refresh survives an empty rewrite set (cell wiped)") {
    val root = tmp("r17_ivfwipe")
    val (tbl, idx) = (embTable(root), s"$root/ivf")
    graft.ann.IvfIndex.writeFromTable(spark, tbl, "vec_id", "embedding",
      "label", idx)
    // delete EVERY resident of cell 4 and nothing else: survivors and
    // fresh are both empty, so the staged rewrite lands ZERO files —
    // the refresh must treat that as the correct empty answer
    // (review-caught: schema inference threw on the empty stage dir)
    MorLog.deleteWhere(spark, tbl, col("label") === 4)
    val n = graft.ann.IvfIndex.refresh(spark, idx)
    assert(n == 12, s"refresh applied $n ids")
    assert(graft.ann.IvfIndexStats.lastRefreshCellsRewritten == 1)
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/cell=4")),
      "the wiped cell's dir must not linger as a ghost")
    val got = graft.ann.IvfIndex.searchIndexed(spark, idx,
      MorLog.read(spark, tbl).filter(col("vec_id") < 4),
      "vec_id", "embedding", k = 2)
    assert(got.count() > 0 &&
      got.filter(col("cell") === 4).count() == 0)
  }

  test("PqIndex refresh refuses DIVERGED crash debris loud") {
    val root = tmp("r17_pqdiv")
    val dir = s"$root/emb"
    val e = spark.range(40).toDF("vec_id")
      .withColumn("embedding", array((0 until 16).map(j =>
        ((col("vec_id") * (j + 5)) % 13).cast("float")): _*))
    MorLog.create(e.repartitionByRange(4, col("vec_id"))
      .sortWithinPartitions("vec_id"), dir)
    val idx = s"$root/idx"
    graft.ann.PqIndex.writeFromTable(spark, dir, "embedding", "vec_id",
      idx, m = 8, nVecFiles = 4)
    // debris whose codes DIVERGE from the live copy — a crashed
    // rewrite interleaved with a table revert; no arbitration is
    // possible from the index alone, so the refresh must refuse
    val hconf = spark.sparkContext.hadoopConfiguration
    val cdir = new org.apache.hadoop.fs.Path(s"$idx/codes")
    val fs = cdir.getFileSystem(hconf)
    val first = fs.listStatus(cdir).filter(_.isFile).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_")).minBy(_.getName)
    val stage = tmp("r17_pqdivstage")
    spark.read.parquet(first.toString)
      .withColumn("codes", transform(col("codes"), x => x + 1))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val bad = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .filter(_.isFile).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    org.apache.hadoop.fs.FileUtil.copy(fs, bad, fs,
      new org.apache.hadoop.fs.Path(cdir, "part-rfbad-0.parquet"),
      false, hconf)
    MorLog.deleteWhere(spark, dir, col("vec_id") === 35L)
    val t = intercept[Throwable](graft.ann.PqIndex.refresh(spark, idx))
    assert(chain(t).contains("DIVERGED"), chain(t))
  }

  test("a STAMPED index refuses direct appends (maintain via table)") {
    val root = tmp("r17_appguard")
    val tbl = embTableWide(root)
    graft.ann.PqIndex.writeFromTable(spark, tbl, "embedding", "vec_id",
      s"$root/pq", m = 8, nVecFiles = 4)
    val batch = spark.range(100, 105).toDF("vec_id")
      .withColumn("label", lit(0))
      .withColumn("embedding", array((0 until 16).map(j =>
        lit(j.toFloat)): _*))
    val tp = intercept[IllegalStateException](graft.ann.PqIndex.append(
      spark, batch, "embedding", "vec_id", s"$root/pq", m = 8))
    assert(tp.getMessage.contains("refresh"))
    graft.ann.IvfIndex.writeFromTable(spark, tbl, "vec_id", "embedding",
      "label", s"$root/ivf")
    val ti = intercept[IllegalStateException](
      graft.ann.IvfIndex.appendVectors(batch, "vec_id", "embedding",
        "label", s"$root/ivf"))
    assert(ti.getMessage.contains("refresh"))
    // the stampless forms keep appending (q186/q227's contract)
    val e = spark.range(20).toDF("vec_id")
      .withColumn("label", (col("vec_id") % 3).cast("int"))
      .withColumn("embedding", array(lit(1.0f),
        col("vec_id").cast("float")))
    graft.ann.IvfIndex.buildIndex(e, "vec_id", "embedding", "label",
      s"$root/ivfs")
    graft.ann.IvfIndex.appendVectors(
      spark.range(20, 25).toDF("vec_id")
        .withColumn("label", (col("vec_id") % 3).cast("int"))
        .withColumn("embedding", array(lit(1.0f),
          col("vec_id").cast("float"))),
      "vec_id", "embedding", "label", s"$root/ivfs")
  }

  test("IvfIndex: a stampless (static) index cannot refresh") {
    val root = tmp("r17_ivfstatic")
    val e = spark.range(20).toDF("vec_id")
      .withColumn("label", (col("vec_id") % 3).cast("int"))
      .withColumn("embedding", array(lit(1.0f),
        col("vec_id").cast("float")))
    graft.ann.IvfIndex.buildIndex(e, "vec_id", "embedding", "label",
      s"$root/ivf")
    // serves unconditionally (no stamp, nothing to be stale against)
    assert(graft.ann.IvfIndex.searchIndexed(spark, s"$root/ivf",
      e.filter(col("vec_id") < 2), "vec_id", "embedding", k = 2)
      .count() > 0)
    val t = intercept[IllegalStateException](
      graft.ann.IvfIndex.refresh(spark, s"$root/ivf"))
    assert(t.getMessage.contains("no source stamp"))
  }

  // ---- PqIndex crash-idempotent rewrite (advice) --------------------

  test("PqIndex refresh heals a crashed prior rewrite's duplicates") {
    val root = tmp("r17_pqheal")
    val dir = s"$root/emb"
    val e = spark.range(40).toDF("vec_id")
      .withColumn("embedding", array((0 until 16).map(j =>
        ((col("vec_id") * (j + 5)) % 13).cast("float")): _*))
    MorLog.create(e.repartitionByRange(4, col("vec_id"))
      .sortWithinPartitions("vec_id"), dir)
    val idx = s"$root/idx"
    graft.ann.PqIndex.writeFromTable(spark, dir, "embedding", "vec_id",
      idx, m = 8, nVecFiles = 4)
    // simulate the crash window: an old code file survives next to
    // its replacement — model it by duplicating one code file under a
    // fresh (stats-sidecar-unknown) name
    val hconf = spark.sparkContext.hadoopConfiguration
    val cdir = new org.apache.hadoop.fs.Path(s"$idx/codes")
    val fs = cdir.getFileSystem(hconf)
    val first = fs.listStatus(cdir).filter(_.isFile).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .minBy(_.getName)
    val dupName = new org.apache.hadoop.fs.Path(cdir,
      "part-rfcrash-0.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, first, fs, dupName, false,
      hconf)
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.groupBy("vec_id").count().filter(col("count") > 1)
      .count() > 0, "the simulated crash must duplicate ids")
    // move the table with a changed id whose bounds do NOT admit the
    // duplicated (first) file — the hard case: a bounds-only scan
    // would rewrite the statless twin but leave the stats-carrying
    // original, making the duplication permanent (review-caught).
    // The statless file's presence must promote the rewrite to the
    // full tier, so both copies rejoin one scan and the dedup heals.
    MorLog.deleteWhere(spark, dir, col("vec_id") === 35L)
    graft.ann.PqIndex.refresh(spark, idx)
    val healed = spark.read.parquet(s"$idx/codes")
    assert(healed.groupBy("vec_id").count().filter(col("count") > 1)
      .count() == 0, "refresh must collapse crash duplicates")
    assert(healed.filter(col("vec_id") === 35L).count() == 0)
    assert(healed.filter(col("vec_id") === 7L).count() == 1)
  }

  // ---- atomic CREATE TABLE ... TBLPROPERTIES (advice) ---------------

  test("CREATE TABLE with TBLPROPERTIES commits ONCE, props at v0") {
    val root = tmp("r17_createprops")
    val c = cat(root)
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.owner.team' = 'cdc', 'k2' = 'x')")
    val dir = s"$root/t"
    // atomic: the CREATE is version 0 and nothing else
    assert(MorLog.versions(spark, dir) == Seq(0))
    assert(MorLog.tableProps(spark, dir) ==
      Map("graft.owner.team" -> "cdc", "k2" -> "x"))
    // v0's own meta carries the map (time travel includes config)
    assert(MorLog.state(spark, dir, 0).props.contains(
      Map("graft.owner.team" -> "cdc", "k2" -> "x")))
    val shown = spark.sql(s"SHOW TBLPROPERTIES $c.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("k2").contains("x"))
  }

  // ---- vacuum dry-run path dedup (advice) ---------------------------

  test("vacuum dry-run reports exactly what the real pass deletes") {
    val root = tmp("r17_vacdry")
    val dir = s"$root/t"
    val df = spark.range(50).toDF("id")
      .withColumn("b", (col("id") % 3).cast("int"))
    MorLog.createEmpty(spark, dir, df.schema, Seq("b"))
    MorLog.append(spark, dir, df)
    MorLog.overwrite(spark, dir, df.withColumn("id", col("id") + 1000))
    MorLog.overwrite(spark, dir, df.withColumn("id", col("id") + 2000))
    val dry = MorLog.vacuumDryRun(spark, dir, keepVersions = 1)
    assert(dry.map(_._2).distinct.size == dry.size,
      "the dry list must not repeat a path")
    // the real pass COUNTS data files; the dry list's data entries
    // must name exactly that set
    val dryData = dry.collect { case ("data", p) => p }
    val deleted = MorLog.vacuum(spark, dir, keepVersions = 1)
    assert(dryData.size == deleted,
      s"dry-run named ${dryData.size} data files, the real pass " +
        s"deleted $deleted")
  }

  // ---- index maintenance procedures (verdict #6) --------------------

  test("CALL system.band_maintain / pq_refresh / ivf_refresh route") {
    val root = tmp("r17_proc")
    val c = cat(root)
    // band index under the catalog root, addressed relative
    graft.dedup.BandIndex.ingest(spark, s"$root/bidx", bandDocs,
      "doc_id", "text", n = 3, k = 12, bands = 4, tau = 0.8)
    val bm = spark.sql(s"CALL $c.system.band_maintain('bidx')").collect()
    assert(bm.length == 1 && bm.head.getInt(0) >= 0 &&
      bm.head.getInt(1) >= 0)
    // PQ index over a MorLog table, then a table move + SQL refresh
    val tbl = embTableWide(root)
    graft.ann.PqIndex.writeFromTable(spark, tbl, "embedding", "vec_id",
      s"$root/pidx", m = 8, nVecFiles = 4)
    MorLog.deleteWhere(spark, tbl, col("vec_id") === 3L)
    val pr = spark.sql(s"CALL $c.system.pq_refresh('pidx')").collect()
    assert(pr.length == 1 && pr.head.getLong(0) == 1L &&
      pr.head.getInt(1) > 0)
    // IVF index, same lifecycle through SQL
    graft.ann.IvfIndex.writeFromTable(spark, tbl, "vec_id", "embedding",
      "label", s"$root/iidx")
    MorLog.deleteWhere(spark, tbl, col("vec_id") === 5L)
    val ir = spark.sql(s"CALL $c.system.ivf_refresh('iidx')").collect()
    assert(ir.length == 1 && ir.head.getLong(0) == 1L &&
      ir.head.getInt(1) >= 1)
  }

  private def embTableWide(root: String): String = {
    val dir = s"$root/embw"
    val e = spark.range(40).toDF("vec_id")
      .withColumn("label", (col("vec_id") % 5).cast("int"))
      .withColumn("embedding", array((0 until 16).map(j =>
        ((col("vec_id") * (j + 5)) % 13).cast("float")): _*))
    MorLog.create(e.repartitionByRange(4, col("vec_id"))
      .sortWithinPartitions("vec_id"), dir)
    dir
  }

  // ---- tableProps tip-only resolution (advice) ----------------------

  test("tableProps resolves off the tip and survives later commits") {
    val root = tmp("r17_props")
    val dir = s"$root/t"
    val df = spark.range(10).toDF("id")
    MorLog.create(df, dir)
    MorLog.setTblProperties(spark, dir, Map("graft.knob" -> "42"))
    // ops that set nothing CARRY the map — tip-only stays correct
    MorLog.append(spark, dir, df)
    MorLog.deleteWhere(spark, dir, col("id") === 0L)
    assert(MorLog.tableProps(spark, dir) == Map("graft.knob" -> "42"))
    assert(MorLog.tableProp(spark, dir, "graft.knob").contains("42"))
    // a never-set table answers empty off its tip alone
    val dir2 = s"$root/t2"
    MorLog.create(df, dir2)
    MorLog.append(spark, dir2, df)
    assert(MorLog.tableProps(spark, dir2).isEmpty)
  }

  // ---- tuple-fold depth (optimization r17 bugfix) -------------------

  test("a THOUSANDS-row nullable tuple IN list folds without overflow") {
    // the sf0.1 bench caught a StackOverflowError: the nullable-key
    // fallback OR-chain was built reduceLeft (depth == list size) and
    // Catalyst's recursive walks blew past ~2.5k tuples; the combine
    // is balanced now (log depth). 4k rows reproduce the old crash.
    val root = tmp("r17_deeptuple")
    val c = cat(root)
    val df = spark.range(8000).toDF("id")
      .withColumn("grp", (col("id") % 100).cast("int"))
      .withColumn("v", col("id").cast("double"))
    MorLog.create(df.repartitionByRange(4, col("id"))
      .sortWithinPartitions("id"), s"$root/t")
    // every even (id, grp) pair — 4000 tuples, nullable key columns
    spark.range(8000).filter(col("id") % 2 === 0)
      .select(col("id"), (col("id") % 100).cast("int").as("grp"))
      .createOrReplaceTempView(s"quarantine_$c")
    spark.sql(s"DELETE FROM $c.t WHERE (id, grp) IN " +
      s"(SELECT id, grp FROM quarantine_$c)")
    assert(MorLog.read(spark, s"$root/t").count() == 4000L)
    assert(MorLog.read(spark, s"$root/t")
      .filter(col("id") % 2 === 0).count() == 0L)
  }
}
