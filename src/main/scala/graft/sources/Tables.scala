package graft.sources

import org.apache.spark.sql.{functions => F, DataFrame, SparkSession}

/** Typed loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Role mapping to the reference (`/root/reference`, see SURVEY.md §7):
  * `events` plays the Cosmos booking change feed (key + event-time +
  * JSON-string payload, cf. dataflow/BookingDataTransformation.json:55-72);
  * `customer`/`nation`/`region` play the customer dimension with its
  * country attribute (synapse_table_creation.sql:6-24); `orders`/`lineitem`
  * play `bookings_fact` (synapse_table_creation.sql:30-47).
  *
  * Scale note: each loader is a plain parquet scan so Catalyst can push
  * filters/column pruning into the source — on a real cluster these would
  * be partitioned directories and pruning still applies unchanged.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has drifted across test-data generations: older data is
    * TIMESTAMP(NANOS) parquet (which Spark 4 rejects outright,
    * [PARQUET_TYPE_ILLEGAL], unless read via the legacy nanos-as-long
    * conf as an int64), newer data is plain `timestamp[us]` with no UTC
    * adjustment (which Spark loads as TIMESTAMP_NTZ). Adapt to whatever
    * encoding the files actually carry and normalize to a single
    * session-zone TimestampType so every downstream operator sees the
    * same microsecond-precision timestamp either way. Sessions here run
    * with `spark.sql.session.timeZone=UTC` (GraftSession), so the
    * NTZ→LTZ cast is value-preserving and agrees with a naive reader
    * (e.g. the DuckDB oracle) byte for byte.
    * The retry path reads through an ISOLATED sibling session
    * (`newSession()` — shared SparkContext, fresh session state from
    * the builder-time conf, which carries the UTC zone and the
    * extensions) with the legacy conf set THERE: the scan consults
    * its own session's conf at execution planning, not just at load,
    * so the conf must out-live this call — but setting it on the
    * CALLER's session would silently load every OTHER
    * TIMESTAMP(NANOS) dataset in the session as long from then on,
    * diverging from the stock-session behavior documented here
    * (review-caught). Frames from the sibling compose with the
    * caller's in one plan (same SparkContext). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try table(s, d, "events")
      catch {
        case e: Throwable if isIllegalNanosType(e) =>
          val legacy = s.newSession()
          legacy.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(legacy, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long: truncate ns → µs like Spark itself does
        raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", F.col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }
  }

  /** True when the failure is Spark 4 refusing a TIMESTAMP(NANOS) parquet
    * column — the one case where the nanos-as-long legacy conf applies. */
  private def isIllegalNanosType(e: Throwable): Boolean = {
    var t = e
    while (t != null) {
      val m = t.getMessage
      if (m != null && (m.contains("PARQUET_TYPE_ILLEGAL") ||
          (m.contains("Illegal Parquet type") && m.contains("NANOS")))) return true
      t = t.getCause
    }
    false
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
