package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time operators: tumbling-window aggregation (with watermark on
  * the streaming path) and gap-based sessionization — batch forms with
  * exact SQL oracles, streaming forms sharing the same semantics.
  *
  * The reference has no event-time windows (late/duplicate data is
  * absorbed by last-writer-wins, SURVEY.md §2 "deliberate absences");
  * these are engine extensions the training-data/analytics surface
  * needs, built on the Spark-native primitives the brief names:
  * `window()` + `withWatermark` and `flatMapGroupsWithState`.
  */
object EventTimeOps {

  /** Gap-based sessionization, batch form: a session boundary opens
    * wherever the gap to the previous event (per user, ordered by
    * (second, event_id) — deterministic under same-second ties)
    * exceeds `gapSeconds`. Two window passes over one hash partition
    * by user: lag → boundary flags, running sum → session index.
    *
    * Scale: both windows share the same partitioning (user_id), so
    * Catalyst plans ONE shuffle; the groupBy(user, session) on top is
    * partial-aggregated. Skewed users sessionize within their own
    * partition — same salting story as latestPerKeySkewSafe if needed. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("s"), col("event_id"))
    val runningW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("s"))
      .withColumn("boundary",
        when(lag(col("s"), 1).over(w).isNull
          || col("s") - lag(col("s"), 1).over(w) > gapSeconds, 1).otherwise(0))
      .withColumn("session_idx", sum(col("boundary")).over(runningW))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        from_unixtime(min(col("s")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        from_unixtime(max(col("s")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Spark's NATIVE `session_window` aggregation — the built-in
    * counterpart of [[sessionizeBatch]]'s lag/running-sum form, with
    * IDENTICAL merge semantics (an event at exactly gap distance
    * merges — touching windows coalesce, spec-verified), so the two
    * forms are interchangeable. The window end is last_event + gap by
    * definition. Works unchanged under `readStream` + watermark —
    * that is the point of the built-in. */
  def sessionWindowBatch(events: DataFrame, gap: String): DataFrame =
    events
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"))
      .groupBy(col("user_id"), session_window(col("tss"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))

  /** Tumbling event-time windows, batch form: per (1-day window,
    * event_type) counts + exact value sums. Uses the real `window()`
    * operator (epoch-aligned UTC buckets — identical to
    * date_trunc('day') in the oracle). */
  def dailyTypeRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.Oracle.moneySum(col("value")).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming twin of [[dailyTypeRollup]] with a watermark bounding
    * aggregation state (late rows beyond 2 h are dropped once the
    * watermark passes). */
  def dailyTypeRollupStream(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"))

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  /** Stream-stream INTERVAL join (attribution shape): each left event
    * matches right events with the same key whose timestamp falls in
    * [left.ts, left.ts + maxDelay]. Both sides carry watermarks, so
    * Spark bounds the join state: a buffered left row is dropped once
    * the right watermark passes left.ts + maxDelay, and vice versa —
    * state is O(events inside the lateness+delay horizon), never
    * O(stream). Column names must be distinct across the two sides.
    *
    * Batch parity: running the same join condition over the materialized
    * inputs gives the identical row set (spec-verified) — the streaming
    * form just adds bounded state + incremental emission. */
  def intervalJoinStreams(left: DataFrame, leftTs: String,
                          right: DataFrame, rightTs: String,
                          joinKeyLeft: String, joinKeyRight: String,
                          maxDelay: String, watermark: String,
                          joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"""$joinKeyLeft = $joinKeyRight AND
         |$rightTs >= $leftTs AND
         |$rightTs <= $leftTs + INTERVAL $maxDelay""".stripMargin), joinType)
  }

  case class SessState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
                     n_events: Int)

  /** Streaming sessionization via `flatMapGroupsWithState`: per-user
    * state holds the open session; a batch's events are folded in event
    * order, emitting each session the moment a gap closes it. The open
    * session survives in state across micro-batches — custom streaming
    * state the built-in window() can't express.
    *
    * Batches are assumed event-time-ordered per user ACROSS batches
    * (true for a change feed); a production deployment adds
    * EventTimeTimeout + watermark to also flush sessions on time
    * passing rather than on the next event. */
  def sessionizeStream(ds: Dataset[Ev], gapSeconds: Long): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val times = evs.map(_.ts.getTime / 1000L).toSeq.sorted
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          times.foreach { t =>
            cur match {
              case Some(s) if t - s.last > gapSeconds =>
                closed += Session(uid, s.start, s.last, s.n)
                cur = Some(SessState(t, t, 1))
              case Some(s) =>
                cur = Some(SessState(s.start, t, s.n + 1))
              case None =>
                cur = Some(SessState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
