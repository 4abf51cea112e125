package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G1 — deterministic mock booking-document generator, the engine-side
  * analog of the reference's Cosmos feeder
  * (mock_data_in_cosmosdb.py:27-56): uuid-ish keys, customer_id ∈
  * 1..100, amount ∈ [50, 1000) at 2 dp, currency ∈ {USD,EUR,GBP,CAD},
  * dates within the year, checkout = checkin + 1..14 nights, and the
  * NESTED `property_location {city, country}` object
  * (dataset/BookingDataCosmosDB.json:40-50) as a real StructType — the
  * one reference shape the star-schema fixtures don't carry.
  *
  * Every field derives from md5(tag || i) so the stream is
  * reproducible on any engine with md5 + 64-bit ints (the DuckDB
  * oracle regenerates it bit-identically from range(n)); a seeded
  * `rand()` would be partitioning-dependent in Spark. ~7% of rows get
  * check_out < check_in to feed the T1 quality gate, mirroring
  * "validate transformations with known inputs" (README.md:731-734).
  *
  * Scale: `spark.range(n)` is an embarrassingly parallel narrow
  * source; all fields are per-row projections.
  */
object MockBookings {

  private def h(tag: String): String =
    s"cast(conv(substring(md5(concat('$tag', id)), 1, 8), 16, 10) as bigint)"

  val cities: Seq[(String, String)] = Seq(
    ("new york", "usa"), ("paris", "france"), ("berlin", "germany"),
    ("madrid", "spain"), ("tokyo", "japan"))

  def generate(spark: SparkSession, n: Long): DataFrame =
    docsFromIds(spark.range(n))

  /** Streaming form of the feed — the reference generator emits one
    * document every few seconds into the change feed
    * (mock_data_in_cosmosdb.py:52); here the rate-micro-batch source
    * plays that clock and the SAME md5-derived projections build the
    * documents, so the streamed doc for id i is byte-identical to
    * [[generate]]'s row i (spec-verified) — a live feed any streaming
    * operator in this engine can consume directly. */
  def stream(spark: SparkSession, rowsPerBatch: Int): DataFrame =
    docsFromIds(spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch).load()
      .select(col("value").as("id")))

  private def docsFromIds(ids: org.apache.spark.sql.Dataset[_]): DataFrame = {
    val cityArr = cities.map(_._1).map(c => s"'$c'").mkString("array(", ", ", ")")
    val countryArr = cities.map(_._2).map(c => s"'$c'").mkString("array(", ", ", ")")
    ids.selectExpr(
      "md5(concat('bk', id)) as booking_id",
      s"pmod(${h("cu")}, 100) + 1 as customer_id",
      // 100.0D: a bare 100.0 parses as DECIMAL(4,1) in Spark SQL and the
      // whole amount would silently become Decimal, not double
      s"round(50 + pmod(${h("am")}, 95000) / 100.0D, 2) as amount",
      s"element_at(array('USD','EUR','GBP','CAD'), cast(pmod(${h("cy")}, 4) + 1 as int)) as currency",
      // raw documents carry DATES AS STRINGS (dataflow:60-62); typing
      // happens downstream via to_timestamp — reproduced faithfully
      s"date_format(date_add(date'2024-01-01', cast(pmod(${h("ci")}, 330) as int)), 'yyyy-MM-dd') as check_in_date",
      // ~7% bad rows: checkout BEFORE checkin (negative nights)
      s"""date_format(date_add(date_add(date'2024-01-01', cast(pmod(${h("ci")}, 330) as int)),
            cast(IF(pmod(${h("bad")}, 15) = 0, -2, pmod(${h("nt")}, 14) + 1) as int)),
          'yyyy-MM-dd') as check_out_date""",
      s"""concat(date_format(date_add(date'2024-01-01', cast(pmod(${h("bd")}, 364) as int)), 'yyyy-MM-dd'),
            ' ', lpad(cast(pmod(${h("hh")}, 24) as string), 2, '0'),
            ':', lpad(cast(pmod(${h("mm")}, 60) as string), 2, '0'),
            ':', lpad(cast(pmod(${h("ss")}, 60) as string), 2, '0')) as booking_date""",
      s"""named_struct(
            'city', element_at($cityArr, cast(pmod(${h("lc")}, ${cities.size}) + 1 as int)),
            'country', element_at($countryArr, cast(pmod(${h("lc")}, ${cities.size}) + 1 as int))
          ) as property_location""")
  }

  /** The reference dataflow T1→T2→T5 applied to the GENERATED nested
    * documents — quality gate on the string dates (lexicographic `<` is
    * chronological for yyyy-MM-dd, dataflow:96), millisecond
    * stay_duration arithmetic (dataflow:98), year/month parts, struct
    * flatten + full_address concat (dataflow:101,112-114), final
    * projection with the reference's INTENDED semantics (T5 note,
    * SURVEY.md §2). */
  def dataflow(docs: DataFrame): DataFrame =
    docs
      .filter(!coalesce(col("check_out_date") < col("check_in_date"), lit(false)))
      .select(
        col("booking_id"), col("customer_id"), col("amount"), col("currency"),
        expr("""cast((unix_millis(to_timestamp(check_out_date, 'yyyy-MM-dd'))
                    - unix_millis(to_timestamp(check_in_date, 'yyyy-MM-dd')))
                   div 86400000 as bigint)""").as("stay_duration"),
        year(to_timestamp(col("booking_date"), "yyyy-MM-dd HH:mm:ss"))
          .cast("bigint").as("booking_year"),
        month(to_timestamp(col("booking_date"), "yyyy-MM-dd HH:mm:ss"))
          .cast("bigint").as("booking_month"),
        col("property_location.city").as("city"),
        col("property_location.country").as("country"),
        concat(col("property_location.city"), lit(", "),
          col("property_location.country")).as("full_address"))
}
