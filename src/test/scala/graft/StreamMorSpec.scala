package graft

import graft.sink.{DeletionVectors => DV}
import graft.streaming.StreamMoR
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming merge-on-read CDC invariants the row oracle can't see:
  * the replay fence, cross-batch key ordering (update-then-delete /
  * delete-then-reinsert converge), and the loud batch-contract
  * rejections. */
class StreamMorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newTable(): String = {
    val dir = Files.createTempDirectory("graft-smor-").toString + "/t"
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "v").repartition(2).write.parquet(dir)
    dir
  }

  private def state(dir: String): Seq[(Long, String, Double)] =
    DV.read(spark, dir).orderBy("id").as[(Long, String, Double)]
      .collect().toSeq

  test("op routing: insert, update, delete land in one batch") {
    val dir = newTable()
    val b = Seq((2L, "b2", 20.0, "U"), (3L, "c", 3.0, "D"),
      (4L, "d", 4.0, "I")).toDF("id", "name", "v", "op")
    StreamMoR.applyBatch(spark, dir, b, 0L, "id", "op")
    assert(state(dir) ==
      Seq((1L, "a", 1.0), (2L, "b2", 20.0), (4L, "d", 4.0)))
  }

  test("replayed batchId is a structural no-op") {
    val dir = newTable()
    val b = Seq((4L, "d", 4.0, "I")).toDF("id", "name", "v", "op")
    StreamMoR.applyBatch(spark, dir, b, 0L, "id", "op")
    val once = state(dir)
    StreamMoR.applyBatch(spark, dir, b, 0L, "id", "op") // replay
    assert(state(dir) == once, "replay must not duplicate the insert")
  }

  test("cross-batch: update then delete, delete then re-insert converge") {
    val dir = newTable()
    StreamMoR.applyBatch(spark, dir,
      Seq((2L, "b2", 20.0, "U")).toDF("id", "name", "v", "op"),
      0L, "id", "op")
    StreamMoR.applyBatch(spark, dir,
      Seq((2L, "x", 0.0, "D"), (3L, "x", 0.0, "D"))
        .toDF("id", "name", "v", "op"),
      1L, "id", "op")
    StreamMoR.applyBatch(spark, dir,
      Seq((3L, "c3", 30.0, "I")).toDF("id", "name", "v", "op"),
      2L, "id", "op")
    // 2 updated then deleted (both images tombstoned); 3 deleted then
    // re-inserted with the fresh image
    assert(state(dir) == Seq((1L, "a", 1.0), (3L, "c3", 30.0)))
  }

  test("repeated updates tombstone every earlier image of the key") {
    val dir = newTable()
    for (i <- 1 to 4)
      StreamMoR.applyBatch(spark, dir,
        Seq((1L, s"a$i", i.toDouble, "U")).toDF("id", "name", "v", "op"),
        i.toLong, "id", "op")
    assert(state(dir) ==
      Seq((1L, "a4", 4.0), (2L, "b", 2.0), (3L, "c", 3.0)))
  }

  test("unknown op and non-unique batch are rejected loudly") {
    val dir = newTable()
    val badOp = Seq((9L, "z", 9.0, "X")).toDF("id", "name", "v", "op")
    assert(intercept[IllegalArgumentException] {
      StreamMoR.applyBatch(spark, dir, badOp, 5L, "id", "op")
    }.getMessage.contains("unknown"))
    val dup = Seq((9L, "z", 9.0, "I"), (9L, "z2", 9.9, "U"))
      .toDF("id", "name", "v", "op")
    assert(intercept[IllegalArgumentException] {
      StreamMoR.applyBatch(spark, dir, dup, 6L, "id", "op")
    }.getMessage.contains("not unique"))
    // a failed batch writes no marker: the id can be retried
    val ok = Seq((9L, "z", 9.0, "I")).toDF("id", "name", "v", "op")
    StreamMoR.applyBatch(spark, dir, ok, 5L, "id", "op")
    assert(state(dir).exists(_._1 == 9L))
  }

  test("compaction between drains: applyDeletes keeps the state") {
    val dir = newTable()
    StreamMoR.applyBatch(spark, dir,
      Seq((2L, "b2", 20.0, "U"), (3L, "x", 0.0, "D"))
        .toDF("id", "name", "v", "op"),
      0L, "id", "op")
    val before = state(dir)
    assert(DV.applyDeletes(spark, dir) > 0)
    assert(state(dir) == before)
    // and the stream keeps applying on top of the compacted table
    StreamMoR.applyBatch(spark, dir,
      Seq((4L, "d", 4.0, "I")).toDF("id", "name", "v", "op"),
      1L, "id", "op")
    assert(state(dir) == before :+ ((4L, "d", 4.0)))
  }
}
