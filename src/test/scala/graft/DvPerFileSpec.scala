package graft

import graft.sink.{BloomSkipIndex, DeletionVectors, DvPerFile, DvStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The per-file deletion-vector store (round-10 top item): past the
  * broadcast guard the tombstone set migrates to per-file sidecars,
  * reads apply deletes IN-SCAN (no broadcast, no join), delete
  * batches rewrite only affected files' sidecars, and every
  * maintenance op keeps working on the new representation. */
class DvPerFileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def withGuard[A](rows: Long)(body: => A): A = {
    spark.conf.set(DeletionVectors.GuardConfKey, rows.toString)
    try body finally spark.conf.unset(DeletionVectors.GuardConfKey)
  }

  private def base(n: Long) =
    spark.range(n).select(col("id"), (col("id") % 97).as("g"))

  private def expected(n: Long, deleted: Long => Boolean) =
    (0L until n).filterNot(deleted).toSet

  private def readIds(dir: String): Set[Long] =
    DeletionVectors.read(spark, dir).select("id").as[Long]
      .collect().toSet

  private def pfSidecars(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_dvpf")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".dv") && !n.startsWith("."))
  }

  test("a delete past the guard migrates; reads apply in-scan with no join") {
    val dir = s"${tmp("graft-pf1-")}/t"
    base(20000).repartition(16).write.parquet(dir)
    withGuard(500) {
      val n = DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0)
      assert(n == 2858) // ids 0,7,...,19999
      assert(DvPerFile.committedGen(spark, dir).nonEmpty,
        "crossing the guard must migrate to the per-file store")
      val out = DeletionVectors.read(spark, dir)
      assert(out.select("id").as[Long].collect().toSet ==
        expected(20000, _ % 7 == 0))
      assert(DvStats.lastReadMode.contains("inscan"))
      // the read plan is a pure filtered scan: no join of any kind
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("join"),
        s"in-scan DV read must not join:\n$plan")
      assert(plan.contains("graft_dv_deleted"))
    }
  }

  test("post-migration batches rewrite only affected files' sidecars") {
    val dir = s"${tmp("graft-pf2-")}/t"
    // bloom-clustered so a keyed delete touches few files
    BloomSkipIndex.bloomWrite(base(20000), "id", dir, nFiles = 16)
    withGuard(500) {
      DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0)
      val ceil0 = DvPerFile.committedGen(spark, dir).get
      val before = pfSidecars(dir).toSet
      // a SMALL keyed batch: 3 keys live in ≤3 files (hash-clustered)
      val added = DeletionVectors.deleteByKeys(spark, dir, "id",
        Seq(lit(1L), lit(2L), lit(3L)))
      assert(added == 3)
      val ceil1 = DvPerFile.committedGen(spark, dir).get
      assert(ceil1 == ceil0 + 1)
      val fresh = pfSidecars(dir).filter(_.endsWith(s".g$ceil1.dv"))
      assert(fresh.nonEmpty && fresh.size <= 3,
        s"small batch rewrote ${fresh.size} sidecars: $fresh")
      assert(readIds(dir) ==
        expected(20000, i => i % 7 == 0 || (i >= 1 && i <= 3)))
      // idempotent replay: same victims add nothing, no new commit
      assert(DeletionVectors.deleteByKeys(spark, dir, "id",
        Seq(lit(1L), lit(2L), lit(3L))) == 0)
      assert(DvPerFile.committedGen(spark, dir).get == ceil1)
      assert((before -- pfSidecars(dir).toSet).forall(_.isEmpty),
        "existing sidecars must not vanish outside GC")
    }
  }

  test("updates and upserts keep working across the migration") {
    val dir = s"${tmp("graft-pf3-")}/t"
    val df = spark.range(5000)
      .select(col("id"), (col("id") * 10).as("v"))
    df.repartition(8).write.parquet(dir)
    withGuard(300) {
      // push past the guard with a bulk delete
      DeletionVectors.deleteWhere(spark, dir, col("id") % 5 === 0)
      assert(DvPerFile.committedGen(spark, dir).nonEmpty)
      // MoR UPDATE on the migrated table
      val updated = DeletionVectors.updateWhere(spark, dir,
        col("id") === 1L, Map("v" -> lit(-1L)))
      assert(updated == 1)
      // MoR UPSERT: one replacement + one brand-new key
      DeletionVectors.upsertMoR(spark, dir,
        Seq((2L, -2L), (5001L, -3L)).toDF("id", "v"), "id")
      val got = DeletionVectors.read(spark, dir)
        .select("id", "v").as[(Long, Long)].collect().toMap
      assert(got(1L) == -1L && got(2L) == -2L && got(5001L) == -3L)
      assert(!got.contains(5L) && !got.contains(100L))
      assert(got.size == 4000 + 2 - 1) // 5000 - 1000 deleted - 1 + upserts
    }
  }

  test("maintenance ops on the per-file store: ratio compact, pack, vacuum, applyDeletes") {
    val dir = s"${tmp("graft-pf4-")}/t"
    base(20000).repartition(16).write.parquet(dir)
    withGuard(400) {
      DeletionVectors.deleteWhere(spark, dir, col("id") % 3 === 0)
      val want = expected(20000, _ % 3 == 0)
      assert(DvPerFile.committedGen(spark, dir).nonEmpty)
      // every file is ~33% tombstoned → all due at ratio 0.1
      val rewritten = DeletionVectors.compactIfNeeded(spark, dir, 0.1)
      assert(rewritten == 16)
      assert(readIds(dir) == want, "compaction changed the answer")
      val ceil = DvPerFile.committedGen(spark, dir).get
      assert(DvPerFile.countsByFile(spark, dir, ceil).isEmpty,
        "full compaction must retire every sidecar")
      // new deletes after compaction still work (fresh row addresses)
      DeletionVectors.deleteWhere(spark, dir, col("id") % 1000 === 1)
      val want2 = expected(20000, i => i % 3 == 0 || i % 1000 == 1)
      assert(readIds(dir) == want2)
      // pack small files through the in-scan tombstones
      DeletionVectors.compactSmallFiles(spark, dir,
        smallBytes = 64L << 20, targetBytes = 128L << 20)
      assert(readIds(dir) == want2, "packing changed the answer")
      // vacuum is a no-op here but must not corrupt
      DeletionVectors.vacuumTombstones(spark, dir)
      assert(readIds(dir) == want2)
      // clean-slate apply
      DeletionVectors.deleteWhere(spark, dir, col("id") % 1000 === 2)
      val want3 = expected(20000,
        i => i % 3 == 0 || i % 1000 == 1 || i % 1000 == 2)
      DeletionVectors.applyDeletes(spark, dir)
      assert(readIds(dir) == want3)
    }
  }

  test("readPreviousGen on the per-file store undoes exactly the newest batch") {
    val dir = s"${tmp("graft-pf5-")}/t"
    base(20000).repartition(8).write.parquet(dir)
    withGuard(500) {
      DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0)
      DeletionVectors.deleteWhere(spark, dir, col("id") % 11 === 0)
      val prev = DeletionVectors.readPreviousGen(spark, dir)
        .select("id").as[Long].collect().toSet
      assert(prev == expected(20000, _ % 7 == 0),
        "previous generation must show only the first delete applied")
      // current view has both
      assert(readIds(dir) ==
        expected(20000, i => i % 7 == 0 || i % 11 == 0))
    }
  }

  test("sidecar discovery is the commit marker, never a directory listing") {
    val dir = s"${tmp("graft-pf7-")}/t"
    base(20000).repartition(8).write.parquet(dir)
    withGuard(500) {
      DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0)
      val ceil = DvPerFile.committedGen(spark, dir).get
      // plant a STRAY sidecar the marker does not reference, at a gen
      // the old listing-based resolve would have preferred — with
      // garbage content, so any path that lists-and-reads it throws
      val p = new org.apache.hadoop.fs.Path(s"$dir/_dvpf")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(p,
        s"zz-not-in-marker.parquet.g$ceil.dv"), true)
      out.write("garbage-not-a-sidecar".getBytes("UTF-8")); out.close()
      val before = graft.sink.DvScanCache.listingFallbackCount
      // marker-backed read: resolves + scans fine, ignores the stray
      assert(readIds(dir) == expected(20000, _ % 7 == 0))
      assert(DvPerFile.countsByFile(spark, dir, ceil).values.sum == 2858)
      assert(graft.sink.DvScanCache.listingFallbackCount == before,
        "read/resolve path took a directory-listing fallback")
      // and mergeCommit's task-side resolution is marker-backed too
      DeletionVectors.deleteByKeys(spark, dir, "id", Seq(lit(1L)))
      assert(readIds(dir) ==
        expected(20000, i => i % 7 == 0 || i == 1))
      assert(graft.sink.DvScanCache.listingFallbackCount == before)
    }
  }

  test("a torn delete attempt's leftover sidecars never leak into a later commit") {
    val dir = s"${tmp("graft-pf8-")}/t"
    base(20000).repartition(8).write.parquet(dir)
    withGuard(500) {
      DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0)
      val base0 = DvPerFile.committedGen(spark, dir).get
      // simulate a crashed batch: a sidecar landed at base+1 for some
      // file, but the marker never advanced
      val hconf = spark.sparkContext.hadoopConfiguration
      val anyFull = DvPerFile.countsByFile(spark, dir, base0).keys.head
      val name = new org.apache.hadoop.fs.Path(
        new java.net.URI(anyFull)).getName
      DvPerFile.writeSidecar(hconf, dir, name, base0 + 1, anyFull,
        (0L until 1000L).toArray) // tombstones the crashed batch wanted
      // a DIFFERENT batch now commits gen base+1
      DeletionVectors.deleteByKeys(spark, dir, "id", Seq(lit(1L)))
      assert(DvPerFile.committedGen(spark, dir).get == base0 + 1)
      // the torn attempt's tombstones must NOT surface
      assert(readIds(dir) ==
        expected(20000, i => i % 7 == 0 || i == 1),
        "torn-attempt sidecar leaked into the committed view")
      val fs = new org.apache.hadoop.fs.Path(s"$dir/_dvpf")
        .getFileSystem(hconf)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/_dvpf/$name.g${base0 + 1}.dv")) ||
        DvPerFile.countsByFile(spark, dir, base0 + 1)
          .get(anyFull).forall(_ < 1000),
        "mergeCommit must sweep torn sidecars above the base marker")
    }
  }

  test("gen discovery is the _current pointer, never a listing — and heals after crash/rollback") {
    val dir = s"${tmp("graft-pf9-")}/t"
    base(20000).repartition(8).write.parquet(dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$dir/_dvpf")
    withGuard(500) {
      DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0)
      val fs = p.getFileSystem(hconf)
      assert(fs.exists(new org.apache.hadoop.fs.Path(p, "_current")),
        "migration commit must write the gen pointer")
      // hot path: committedGen (driver, every read/write op) must not
      // list the flat sidecar dir — pointer + marker probe only
      val before = DvPerFile.genListingFallbackCount
      val g1 = DvPerFile.committedGen(spark, dir).get
      DeletionVectors.deleteByKeys(spark, dir, "id", Seq(lit(1L)))
      assert(DvPerFile.committedGen(spark, dir).get == g1 + 1)
      assert(readIds(dir) == expected(20000, i => i % 7 == 0 || i == 1))
      assert(DvPerFile.genListingFallbackCount == before,
        "hot-path gen discovery took a directory-listing fallback")
      // crash-between-marker-and-pointer: pointer one behind — the
      // forward probe heals without a listing
      val out = fs.create(new org.apache.hadoop.fs.Path(p, "_current"), true)
      out.write(g1.toString.getBytes("UTF-8")); out.close()
      assert(DvPerFile.committedGen(spark, dir).get == g1 + 1)
      assert(DvPerFile.genListingFallbackCount == before,
        "stale-behind pointer must heal by forward probe, not listing")
      // legacy dir (no pointer at all): ONE counted listing fallback,
      // after which the healed pointer serves reads again
      fs.delete(new org.apache.hadoop.fs.Path(p, "_current"), false)
      assert(DvPerFile.committedGen(spark, dir).get == g1 + 1)
      assert(DvPerFile.genListingFallbackCount == before + 1)
      assert(DvPerFile.committedGen(spark, dir).get == g1 + 1)
      assert(DvPerFile.genListingFallbackCount == before + 1,
        "fallback listing must heal the pointer for subsequent reads")
      // rollback below the pointer re-points at the retained ceiling
      DvPerFile.rollbackAbove(spark, dir, g1)
      assert(DvPerFile.committedGen(spark, dir).get == g1)
      assert(DvPerFile.genListingFallbackCount == before + 1,
        "rollback must fix the pointer, not leave it stale-above")
      assert(readIds(dir) == expected(20000, _ % 7 == 0))
    }
  }

  test("pre-guard tables stay in the broadcast regime") {
    val dir = s"${tmp("graft-pf6-")}/t"
    base(2000).repartition(4).write.parquet(dir)
    withGuard(500000) {
      DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0)
      assert(DvPerFile.committedGen(spark, dir).isEmpty)
      assert(readIds(dir) == expected(2000, _ % 7 == 0))
      assert(DvStats.lastReadMode.contains("broadcast"))
    }
  }
}
