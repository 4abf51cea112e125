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
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). Read it via the legacy
    * nanos-as-long conf and normalize back to a microsecond-precision
    * TimestampType so every downstream operator sees a plain timestamp
    * (matching Spark's own ns→µs truncation everywhere else).
    * The conf is also set at session build in Verify/Bench/tests; the
    * set here is an idempotent safety net for driver-owned sessions
    * that didn't — it only widens what the parquet reader ACCEPTS. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
