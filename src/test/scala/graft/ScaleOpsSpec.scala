package graft

import graft.ops.CdcOps
import graft.sink.BucketedFactStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Scale-path operators: skew-safe dedupe equivalence and the bucketed
  * partial-rewrite merge. */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("latestPerKeySkewSafe == latestPerKey (hot key included)") {
    // key 1 is "hot": 200 versions; others have a few
    val rows = (1 to 200).map(i => (1L, i.toLong, s"v$i")) ++
      (2 to 20).flatMap(k => (1 to 3).map(i => (k.toLong, i.toLong, s"k$k-$i")))
    val df = rows.toDF("k", "seq", "v")
    val order = Seq(col("seq"))
    val plain = CdcOps.latestPerKey(df, Seq("k"), order)
      .as[(Long, Long, String)].collect().toSet
    val salted = CdcOps.latestPerKeySkewSafe(df, Seq("k"), order, saltBuckets = 8)
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("BucketedFactStore.merge rewrites only touched buckets") {
    val table = Files.createTempDirectory("graft-bucket-").toString + "/fact"
    val store = new BucketedFactStore(table, Seq("k"), nBuckets = 8)
    val base = (1L to 64L).map(k => (k, 1L, s"base-$k")).toDF("k", "seq", "v")
    store.overwriteAll(base)

    // snapshot every bucket dir's file listing + mtimes
    def snapshot(): Map[String, Seq[(String, Long)]] =
      new java.io.File(table).listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.isFile).toSeq
          .map(f => (f.getName, f.lastModified())).sortBy(_._1)
      }.toMap
    val before = snapshot()
    assert(before.size >= 2, "need multiple buckets for the test to mean anything")

    // a batch touching exactly one key
    val batch = Seq((7L, 2L, "updated-7")).toDF("k", "seq", "v")
    val touchedBucket = batch.select(pmod(hash(col("k")), lit(8))).as[Int].head()
    store.merge(batch, Seq(col("seq")))
    val after = snapshot()

    // untouched buckets: identical files and mtimes
    before.foreach { case (dir, files) =>
      if (dir != s"_bucket=$touchedBucket")
        assert(after(dir) == files, s"untouched $dir was rewritten")
    }
    // touched bucket: new contents, correct merge result
    val state = store.read(spark).as[(Long, Long, String)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(state(7L) == "updated-7")
    assert(state(8L) == "base-8" && state.size == 64)
  }

  test("BucketedFactStore.merge is version-aware (older batch cannot regress)") {
    val table = Files.createTempDirectory("graft-bucket-").toString + "/fact"
    val store = new BucketedFactStore(table, Seq("k"), nBuckets = 4)
    store.overwriteAll(Seq((1L, 5L, "newer")).toDF("k", "seq", "v"))
    store.merge(Seq((1L, 3L, "older")).toDF("k", "seq", "v"), Seq(col("seq")))
    assert(store.read(spark).as[(Long, Long, String)].collect().toSeq
      == Seq((1L, 5L, "newer")))
  }
}
