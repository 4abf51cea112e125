package graft.gold

import graft.Oracle
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-layer aggregation — the reference's
  * `airbnb.BookingCustomerAggregation` (Q1+Q2+Q4,
  * synapse_table_creation.sql:56-88): fact ⋈ dim on the customer key,
  * GROUP BY country with COUNT_BIG(*), SUM(ISNULL(amount,0)),
  * MAX(booking_date). The TRUNCATE+INSERT refresh proc becomes an
  * idempotent full recompute + overwrite.
  */
object Gold {

  /** fact ⋈ customer-dim ⋈ country-dim → per-country rollup.
    *
    * Scale: the fact⋈customer join shuffles on the customer key (or
    * AQE-broadcasts the dim if small); the country dim (nation, 25 rows)
    * is explicitly broadcast so the second join adds no shuffle. The
    * groupBy does partial (map-side) aggregation before the final
    * 25-group exchange — the canonical low-cardinality rollup plan.
    */
  def bookingAggregation(fact: DataFrame, custDim: DataFrame, countryDim: DataFrame,
                         factCustKey: String, dimCustKey: String,
                         dimNationKey: String, nationKey: String,
                         countryCol: String, amountCol: String, dateCol: String): DataFrame = {
    fact
      .join(custDim, fact(factCustKey) === custDim(dimCustKey), "inner")
      .join(broadcast(countryDim), custDim(dimNationKey) === countryDim(nationKey), "inner")
      .groupBy(col(countryCol).as("country"))
      .agg(
        count(lit(1)).as("total_bookings"),
        Oracle.moneySum(coalesce(col(amountCol), lit(0.0))).as("total_amount"),
        Oracle.fmtTs(max(col(dateCol))).as("last_booking_date"))
  }

  /** Q4 — refresh proc semantics: recompute + atomic overwrite
    * (synapse_table_creation.sql:71-88). */
  def refreshAggregation(agg: DataFrame, outPath: String): Unit =
    agg.write.mode("overwrite").parquet(outPath)
}
