package graft

import graft.streaming.EventTimeOps
import graft.streaming.EventTimeOps.{Ev, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Event-time extensions: batch/stream sessionization parity and
  * watermarked windowed aggregation. */
class EventTimeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("native session_window: boundary-touching events MERGE, end = last + gap") {
    import graft.streaming.EventTimeOps
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (1L, t("2024-01-01 10:30:00")), // merges (gap 30m < 1h)
      (1L, t("2024-01-01 11:30:00")), // exactly 1h after -> still merges
      (1L, t("2024-01-01 12:30:01")), // 1h + 1s -> NEW session
      (2L, t("2024-01-01 09:00:00")),
    ).toDF("user_id", "ts")
    val out = EventTimeOps.sessionWindowBatch(ev, "1 hour")
      .orderBy("user_id", "session_start")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 12:30:00", 3L),
      (1L, "2024-01-01 12:30:01", "2024-01-01 13:30:01", 1L),
      (2L, "2024-01-01 09:00:00", "2024-01-01 10:00:00", 1L)))
  }

  test("sessionizeBatch splits on gaps with deterministic tie-breaks") {
    val ev = Seq(
      (1L, 1L, t("2024-01-01 10:00:00")),
      (1L, 2L, t("2024-01-01 10:10:00")), // same session (gap 10m)
      (1L, 3L, t("2024-01-01 15:00:00")), // new session (gap ~5h > 1h)
      (2L, 4L, t("2024-01-01 09:00:00")),
    ).toDF("user_id", "event_id", "ts")
    val out = EventTimeOps.sessionizeBatch(ev, gapSeconds = 3600)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("sessionizeStream (flatMapGroupsWithState) matches batch sessions across micro-batches") {
    val ms = MemoryStream[Ev](spark)
    val q = EventTimeOps.sessionizeStream(ms.toDS(), gapSeconds = 3600)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // batch 1: two events in one session for u1; one for u2
      ms.addData(Ev(1L, t("2024-01-01 10:00:00")), Ev(1L, t("2024-01-01 10:30:00")),
        Ev(2L, t("2024-01-01 08:00:00")))
      q.processAllAvailable()
      // batch 2: u1 jumps 6h (closes session 1); u2 continues same session
      ms.addData(Ev(1L, t("2024-01-01 16:30:00")), Ev(2L, t("2024-01-01 08:20:00")))
      q.processAllAvailable()
      // flush sentinel far in the future closes everything still open
      ms.addData(Ev(1L, t("2024-06-01 00:00:00")), Ev(2L, t("2024-06-01 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
      def ep(s: String) = t(s).getTime / 1000
      assert(got == Set(
        (1L, ep("2024-01-01 10:00:00"), ep("2024-01-01 10:30:00"), 2),
        (1L, ep("2024-01-01 16:30:00"), ep("2024-01-01 16:30:00"), 1),
        (2L, ep("2024-01-01 08:00:00"), ep("2024-01-01 08:20:00"), 2)))
    } finally q.stop()
  }

  import EventTimeSpec.{Clk, Imp}

  test("stream-stream interval join matches the batch join and respects the bound") {
    val imps = MemoryStream[Imp](spark)
    val clicks = MemoryStream[Clk](spark)
    val joined = EventTimeOps.intervalJoinStreams(
      imps.toDS().toDF(), "imp_ts", clicks.toDS().toDF(), "click_ts",
      "imp_user", "click_user", maxDelay = "1 HOUR", watermark = "0 seconds")
    val q = joined.select("imp_id", "click_id")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      imps.addData(Imp(10L, 1L, t("2024-01-01 10:00:00")),
        Imp(11L, 2L, t("2024-01-01 10:00:00")))
      clicks.addData(
        Clk(100L, 1L, t("2024-01-01 10:30:00")), // in window -> match
        Clk(101L, 1L, t("2024-01-01 11:30:00")), // past 1h -> NO match
        Clk(102L, 2L, t("2024-01-01 09:59:00")), // before imp -> NO match
        Clk(103L, 2L, t("2024-01-01 11:00:00"))) // exactly +1h -> match
      q.processAllAvailable()
      // later micro-batch still joins what's in-bound for state kept
      imps.addData(Imp(12L, 3L, t("2024-01-01 12:00:00")))
      clicks.addData(Clk(104L, 3L, t("2024-01-01 12:10:00")))
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 100L), (11L, 103L), (12L, 104L)))
      // batch parity: same condition over the materialized inputs
      val bImps = Seq((10L, 1L, t("2024-01-01 10:00:00")),
        (11L, 2L, t("2024-01-01 10:00:00")),
        (12L, 3L, t("2024-01-01 12:00:00"))).toDF("imp_id", "imp_user", "imp_ts")
      val bClicks = Seq((100L, 1L, t("2024-01-01 10:30:00")),
        (101L, 1L, t("2024-01-01 11:30:00")),
        (102L, 2L, t("2024-01-01 09:59:00")),
        (103L, 2L, t("2024-01-01 11:00:00")),
        (104L, 3L, t("2024-01-01 12:10:00"))).toDF("click_id", "click_user", "click_ts")
      val batch = bImps.join(bClicks, expr(
        """imp_user = click_user AND click_ts >= imp_ts AND
          |click_ts <= imp_ts + INTERVAL 1 HOUR""".stripMargin))
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("session_window works under readStream with watermark (the built-in's point)") {
    val ms = MemoryStream[Ev](spark)
    val q = ms.toDS()
      .withWatermark("ts", "0 seconds")
      .groupBy($"user_id",
        org.apache.spark.sql.functions.session_window($"ts", "1 hour"))
      .count()
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    try {
      ms.addData(Ev(1L, t("2024-01-01 10:00:00")), Ev(1L, t("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // watermark advance past the session end flushes it
      ms.addData(Ev(1L, t("2024-01-02 00:00:00")))
      q.processAllAvailable()
      ms.addData(Ev(1L, t("2024-06-01 00:00:00")))
      q.processAllAvailable()
      val flushed = spark.table("sw_out")
        .select($"user_id", $"session_window.start".cast("string"), $"count")
        .as[(Long, String, Long)].collect().toSet
      assert(flushed.contains((1L, "2024-01-01 10:00:00", 2L)),
        s"merged 2-event session must flush once watermark passes: $flushed")
    } finally q.stop()
  }

  test("streaming windowed rollup with watermark == batch rollup (complete drain)") {
    val ms = MemoryStream[(Timestamp, String, Double)](spark)
    val stream = ms.toDS().toDF("ts", "event_type", "value")
    val q = EventTimeOps.dailyTypeRollupStream(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      val rows = Seq(
        (t("2024-01-01 01:00:00"), "click", 1.0),
        (t("2024-01-01 23:00:00"), "click", 2.0),
        (t("2024-01-02 05:00:00"), "view", 3.0),
        (t("2024-01-02 06:00:00"), "click", 4.0))
      ms.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select("day", "event_type", "n_events")
        .as[(String, String, Long)].collect().toSet
      val expected = EventTimeOps.dailyTypeRollup(rows.toDF("ts", "event_type", "value"))
        .select("day", "event_type", "n_events")
        .as[(String, String, Long)].collect().toSet
      assert(got == expected)
      assert(got == Set(("2024-01-01", "click", 2L), ("2024-01-02", "view", 1L),
        ("2024-01-02", "click", 1L)))
    } finally q.stop()
  }
}

object EventTimeSpec {
  case class Imp(imp_id: Long, imp_user: Long, imp_ts: java.sql.Timestamp)
  case class Clk(click_id: Long, click_user: Long, click_ts: java.sql.Timestamp)
}
