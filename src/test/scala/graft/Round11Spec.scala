package graft

import graft.streaming.{MorGoldStats, StreamMorGold}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-11 specs: the exact-recency gold state bounded to the batch
  * (driver collects O(batch countries), not O(gold grain)). */
class Round11Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ts(i: Int): String =
    f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"

  test("exact-mode state collects O(batch countries) at a 10k-group gold, and stays exact") {
    val work = tmp("graft-r11gg-")
    val (table, gold) = (s"$work/fact", s"$work/gold")
    // 10k countries, one user each — the grain the round-10 verdict
    // flagged: the old patch collected all 10k state rows per batch
    val n = 10000
    val dim = spark.range(1, n + 1)
      .select(col("id").as("user_id"),
        concat(lit("c"), col("id")).as("country"))
    def batch(rows: Seq[(Long, Int, String)]) =
      rows.map { case (u, t, op) => (u, 1.0, ts(t), op) }
        .toDF("user_id", "value", "ts_s", "op")
    StreamMorGold.processBatch(
      batch((1L to n.toLong).map(u => (u, (u % 1000).toInt, "I"))),
      0L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    assert(MorGoldStats.lastStateRowsCollected == 0,
      "bootstrap must build the state distributed, no driver collect")
    assert(graft.sink.AtomicParquetSink.read(spark, gold).get.count() == n)
    // batch 1 touches THREE countries: one update, one delete, one
    // retraction of a country's only row
    StreamMorGold.processBatch(
      batch(Seq((7L, 500, "U"), (8L, 8, "D"), (9L, 900, "U"))),
      1L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    assert(MorGoldStats.lastStateRowsCollected <= 6,
      s"collected ${MorGoldStats.lastStateRowsCollected} state rows " +
        "for a 3-country batch — the driver fold is not batch-bounded")
    val g1 = graft.sink.AtomicParquetSink.read(spark, gold).get
      .select("country", "n_users", "last_seen")
      .as[(String, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(g1("c7") == (1L, Some(ts(500))))
    assert(g1("c8")._1 == 0L)
    assert(g1("c9") == (1L, Some(ts(900))))
    // an untouched country's state survived the DataFrame carry-over
    assert(g1("c5000") == (1L, Some(ts(5000 % 1000))))
    // …and keeps retracting exactly in a LATER batch (the carried
    // state is real, not a default)
    StreamMorGold.processBatch(
      batch(Seq((5000L, 5000 % 1000, "D"))),
      2L, table, gold, dim, "user_id", "op", exactLastSeen = true)
    val g2 = graft.sink.AtomicParquetSink.read(spark, gold).get
      .select("country", "n_users", "last_seen")
      .as[(String, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(g2("c5000")._1 == 0L)
    assert(g2("c7") == (1L, Some(ts(500))), "untouched state drifted")
    assert(MorGoldStats.lastStateRowsCollected <= 2)
  }
}
