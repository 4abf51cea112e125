package graft

import graft.sink.{BloomSkipIndex, DeletionVectors => DV}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Deletion-vector (merge-on-read) invariants the row oracle can't
  * see: tombstone-only deletes touch no data file, the generation
  * commit protocol survives torn writes, applyDeletes rewrites only
  * affected files, and the MoR upsert equals a full-rewrite merge. */
class DvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Non-hidden data-file names under `dir` (mirrors the sidecar
    * freshness listing, which is package-private). */
  private def dataFileNames(dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator.filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet")
        && !n.startsWith("_") && !n.startsWith(".")).toSet
  }

  private def fixture(nFiles: Int = 8): (String, Set[String]) = {
    val dir = Files.createTempDirectory("graft-dv-").toString + "/t"
    val df = spark.range(0, 400)
      .select(col("id"), (col("id") % 20).as("k"),
        (col("id") * 2).cast("double").as("v"))
    BloomSkipIndex.bloomWrite(df, "k", dir, nFiles = nFiles)
    (dir, dataFileNames(dir))
  }

  test("deleteWhere tombstones without touching data files; read hides victims") {
    val (dir, before) = fixture()
    val n = DV.deleteWhere(spark, dir, col("id") % 7 === 0)
    assert(n == 58, s"expected 58 victims, got $n") // ceil(400/7)
    assert(dataFileNames(dir) == before,
      "a tombstone-only delete must not add/remove data files")
    val got = DV.read(spark, dir).agg(count(lit(1)), sum("id"))
      .as[(Long, Long)].head()
    val want = spark.range(0, 400).filter(col("id") % 7 =!= 0)
      .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
    assert(got == want)
  }

  test("deletes accumulate across generations; NULL predicate keeps rows") {
    val (dir, _) = fixture()
    DV.deleteWhere(spark, dir, col("id") < 10)
    DV.deleteWhere(spark, dir, col("id") >= 390)
    // NULL-for-every-row predicate: SQL DELETE keeps them all
    val n3 = DV.deleteWhere(spark, dir, when(col("id") < 0, true))
    assert(n3 == 0, "NULL predicate must delete nothing")
    assert(DV.read(spark, dir).count() == 380)
  }

  test("a torn (markerless) generation is invisible to readers") {
    val (dir, _) = fixture()
    DV.deleteWhere(spark, dir, col("id") < 100)
    assert(DV.read(spark, dir).count() == 300)
    // simulate a crash mid-commit: a full tombstone set staged in the
    // next generation dir, but no _SUCCESS marker
    val torn = s"$dir/_dv_g99"
    spark.range(0, 400)
      .select(concat(lit("file:///nope/"), col("id")).as("file"),
        col("id").as("row_idx"))
      .coalesce(1).write.parquet(torn)
    val fs = new org.apache.hadoop.fs.Path(torn)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$torn/_SUCCESS"), false)
    assert(DV.read(spark, dir).count() == 300,
      "markerless generation must be skipped (previous generation serves)")
  }

  test("deleteByKeys prunes the locate scan through the bloom sidecar") {
    val (dir, _) = fixture(nFiles = 16)
    val may = BloomSkipIndex.survivingFiles(spark, dir, "k",
      Seq(lit(3L), lit(11L)))
    assert(may.size <= 6, s"bloom should prune the locate: ${may.size} of 16")
    val n = DV.deleteByKeys(spark, dir, "k", Seq(lit(3L), lit(11L)))
    assert(n == 40) // 400 ids / 20 key values * 2 keys
    val got = DV.read(spark, dir).filter(col("k").isin(3L, 11L)).count()
    assert(got == 0)
    assert(DV.read(spark, dir).count() == 360)
  }

  test("applyDeletes rewrites only affected files and empties the slate") {
    val (dir, before) = fixture(nFiles = 16)
    DV.deleteByKeys(spark, dir, "k", Seq(lit(5L)))
    val expect = DV.read(spark, dir)
      .agg(count(lit(1)), sum("id"), sum("v")).as[(Long, Long, Double)].head()
    val affected = DV.currentTombstones(spark, dir).get
      .select("file").distinct().count()
    val rewritten = DV.applyDeletes(spark, dir)
    assert(rewritten == affected)
    val after = dataFileNames(dir)
    // unaffected files must survive by name; affected are replaced
    assert((before -- after).size == rewritten,
      s"exactly the $rewritten affected files should disappear")
    assert(after.count(_.startsWith("applied-")) > 0)
    // plain (DV-free) read now equals the pre-apply DV read
    val got = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("id"), sum("v")).as[(Long, Long, Double)].head()
    assert(got == expect)
    // tombstone slate is empty; a second apply is a no-op
    assert(DV.currentTombstones(spark, dir).get.count() == 0)
    assert(DV.applyDeletes(spark, dir) == 0)
  }

  test("vacuumTombstones drops dangling entries, keeps live ones") {
    val (dir, _) = fixture()
    DV.deleteWhere(spark, dir, col("id") < 50)
    // dangle half the tombstones by applying, then add fresh ones
    DV.applyDeletes(spark, dir)
    DV.deleteWhere(spark, dir, col("id") >= 350)
    val preCount = DV.read(spark, dir).count()
    DV.vacuumTombstones(spark, dir)
    assert(DV.currentTombstones(spark, dir).get.count() == 50,
      "live tombstones for ids >= 350 must survive the vacuum")
    assert(DV.read(spark, dir).count() == preCount,
      "vacuum must not change the visible rows")
  }

  test("upsertMoR equals a full-rewrite merge (small and large key paths)") {
    for (nUpd <- Seq(5L, 300L)) { // bloom-literal path vs broadcast-join path
      val (dir, before) = fixture()
      val batch = spark.range(0, nUpd)
        .select((col("id") * 20).as("id"), // every 20th id → key collision rows
          (col("id") % 20).as("k"),
          lit(-1.0).as("v"))
        .filter(col("id") < 400)
      DV.upsertMoR(spark, dir, batch, "id")
      val got = DV.read(spark, dir).orderBy("id")
        .as[(Long, Long, Double)].collect().toSeq
      val base = spark.range(0, 400)
        .select(col("id"), (col("id") % 20).as("k"),
          (col("id") * 2).cast("double").as("v"))
      val want = base.join(batch.select(col("id")), Seq("id"), "left_anti")
        .unionByName(batch).orderBy("id")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got == want, s"MoR upsert diverged at nUpd=$nUpd")
      // appends only: every original data file is still present
      val after = dataFileNames(dir)
      assert(before.subsetOf(after), "upsertMoR must append, not rewrite")
    }
  }

  test("prunedPointScan hides tombstoned rows AND still skips files") {
    val (dir, _) = fixture(nFiles = 16)
    DV.deleteByKeys(spark, dir, "k", Seq(lit(3L)))
    val got = DV.prunedPointScan(spark, dir, "k",
      Seq(lit(3L), lit(11L))).orderBy("id")
      .as[(Long, Long, Double)].collect().toSeq
    val want = spark.range(0, 400)
      .select(col("id"), (col("id") % 20).as("k"),
        (col("id") * 2).cast("double").as("v"))
      .filter(col("k") === 11L).orderBy("id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, "deleted key 3 must not resurrect through the prune")
    // and the prune still prunes: the bloom sidecar bounds the files
    assert(BloomSkipIndex.survivingFiles(spark, dir, "k",
      Seq(lit(3L), lit(11L))).size <= 6)
  }

  test("updateWhere: simultaneous assignment, NULL cond, no resurrection") {
    val (dir, _) = fixture()
    // delete k=5 first: the update must NOT revive those rows
    DV.deleteByKeys(spark, dir, "k", Seq(lit(5L)))
    val n = DV.updateWhere(spark, dir, col("k") === 5L || col("k") === 7L,
      Map("v" -> (col("v") + col("id")), "k" -> (col("k") * 10L)))
    assert(n == 20, s"only the 20 visible k=7 rows may update, got $n")
    val rows = DV.read(spark, dir)
    assert(rows.filter(col("k") === 5L || col("k") === 7L).count() == 0)
    // RHS reads the ORIGINAL row: v' = 2*id + id = 3*id for old k=7
    val upd = rows.filter(col("k") === 70L).orderBy("id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(upd.size == 20 && upd.forall(r => r._3 == 3.0 * r._1))
    // NULL predicate matches nothing
    assert(DV.updateWhere(spark, dir,
      when(col("id") < 0, true), Map("v" -> lit(0.0))) == 0)
    assert(DV.read(spark, dir).count() == 380)
  }

  test("upsertMoR rejects a batch that is not unique on the key") {
    val (dir, _) = fixture()
    val dup = Seq((1L, 1L, 0.0), (1L, 1L, 9.9)).toDF("id", "k", "v")
    val e = intercept[IllegalArgumentException] {
      DV.upsertMoR(spark, dir, dup, "id")
    }
    assert(e.getMessage.contains("not unique"))
  }
}
