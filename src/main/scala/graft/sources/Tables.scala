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
    * The legacy conf is set only on the retry path — i.e. only when the
    * nanos encoding is actually present — so reading modern data leaves
    * session state untouched. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try table(s, d, "events")
      catch {
        case e: Throwable if isIllegalNanosType(e) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(s, d, "events")
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
