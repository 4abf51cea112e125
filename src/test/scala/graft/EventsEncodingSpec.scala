package graft

import graft.sources.Tables
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for test-data encoding drift on `events.ts`.
  *
  * The driver has regenerated the test data across rounds with two
  * different parquet encodings for the event timestamp:
  *   - legacy: TIMESTAMP(NANOS), which Spark 4 only reads via the
  *     `spark.sql.legacy.parquet.nanosAsLong` conf (as int64 nanos);
  *   - current: plain `timestamp[us]` with no UTC adjustment, which
  *     Spark loads as TIMESTAMP_NTZ.
  * Round 7 lost 49 queries and 8 tests because the loader assumed one
  * encoding while the data carried the other. This spec pins the
  * contract: `Tables.events` must load BOTH encodings to the identical
  * session-zone TimestampType values, regardless of whether the legacy
  * conf is pre-set on the session.
  *
  * Fixtures live in src/test/resources/events_enc/{nanos,micros}/ and
  * hold the same three logical rows (microsecond precision, so the
  * ns→µs truncation is exact in both directions).
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture(enc: String): String = {
    val url = getClass.getClassLoader.getResource(s"events_enc/$enc/events.parquet")
    assert(url != null, s"missing fixture events_enc/$enc")
    new java.io.File(url.toURI).getParent
  }

  private def load(enc: String): Seq[(Long, java.sql.Timestamp)] = {
    val df = Tables.events(spark, fixture(enc))
    assert(df.schema("ts").dataType == TimestampType,
      s"$enc: ts must normalize to session-zone TimestampType, got ${df.schema("ts").dataType}")
    df.select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq.sortBy(_._1)
  }

  test("events loads timestamp[us] (current driver encoding) without legacy conf") {
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val rows = load("micros")
    assert(rows.size == 3)
    // UTC session zone: wall-clock in the file == instant in the column.
    assert(rows.head._2.toInstant.toString == "2024-01-01T00:00:07.179575Z")
  }

  test("events loads TIMESTAMP(NANOS) via retry path from a clean session") {
    // Start with the conf UNSET so the first read genuinely fails and the
    // loader's detect-and-retry branch is what makes it pass.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val rows = load("nanos")
    assert(rows.size == 3)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("both encodings load to identical values") {
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val micros = load("micros")
    val nanos  = load("nanos")
    assert(micros == nanos, s"encoding drift: $micros vs $nanos")
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("the retry path does NOT leak the legacy conf into the caller's session") {
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val rows = load("nanos") // forces the detect-and-retry branch
    assert(rows.size == 3)
    // the caller's session must be untouched: a session-wide set here
    // would silently load every OTHER nanos dataset as long from then
    // on (review-caught) — the loader reads through a cloned session
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") != "true",
      "Tables.events leaked spark.sql.legacy.parquet.nanosAsLong into the session")
    // and the returned frame stays fully usable after ANOTHER read
    // reset the world (the conf lives with the frame's own session)
    assert(rows.head._2.toInstant.toString == "2024-01-01T00:00:07.179575Z")
  }

  test("events loads nanos when the legacy conf is already set (no retry needed)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try assert(load("nanos") == load("micros"))
    finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }
}
