package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history builder — the versioned
  * extension of the reference's SCD1 upsert surface
  * (pipeline/LoadCustomerDim.json's copy-with-upsert keeps only the
  * latest row per key; SCD2 keeps every attribute run with its
  * validity interval). Standard warehouse-dimension shape: one row per
  * (key, run of equal tracked-attribute values) with [valid_from,
  * valid_to) bounds and an is_current flag on the open run.
  */
object Scd2 {

  /** Compress an ordered change feed into SCD2 version rows.
    *
    * Two window passes over the SAME (key, order) spec — change
    * detection (`lag` ≠ current ⇒ a run opens) on the full feed, then
    * version numbering + `lead` validity bounds on the surviving run
    * openers. Spark plans both as Window nodes over one hash
    * partitioning on `key`: the filter between them preserves the
    * partitioning (AQE reuses the exchange), so the whole build is a
    * single shuffle regardless of feed size. No global sort, no
    * driver-side state: at 100 TB this scales exactly like the q06
    * latest-per-key dedupe, and a hot key can reuse the same salting
    * strategy (CdcOps.latestPerKeySkewSafe) for the detection pass.
    *
    * @param feed    change feed, one row per observed state
    * @param key     dimension business key column name
    * @param attr    tracked attribute column name (run boundary =
    *                null-safe inequality with the previous row)
    * @param order   total per-key order (MUST include a unique
    *                tiebreaker — same rule as every window in this
    *                library)
    * @param tsOut   name of the pre-formatted event-time column used
    *                for the validity bounds
    */
  def history(feed: DataFrame, key: String, attr: String,
              order: Seq[Column], tsOut: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val openMark = lit("9999-12-31 00:00:00")
    feed
      .withColumn("prev_attr", lag(col(attr), 1).over(w))
      .withColumn("rn", row_number().over(w))
      // rn = 1 keeps the first observed state unconditionally: for the
      // leading row lag() is NULL, and when the attr itself is NULL the
      // null-safe inequality would otherwise drop the run opener — a key
      // whose initial state has a NULL attr would get no version row
      // until the attr changed.
      .filter(col("rn") === 1 || !(col("prev_attr") <=> col(attr)))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("next_from", lead(col(tsOut), 1).over(w))
      .select(col(key), col("version"), col(attr),
        col(tsOut).as("valid_from"),
        coalesce(col("next_from"), openMark).as("valid_to"),
        col("next_from").isNull.as("is_current"))
  }
}
