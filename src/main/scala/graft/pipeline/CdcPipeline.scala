package graft.pipeline

import graft.Oracle.fmtTs
import graft.ops.CdcOps
import graft.sink.AtomicParquetSink
import graft.sources.{CsvIngest, Tables}
import graft.streaming.CdcStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O1 + O4 — the master pipeline: dim-load → fact-load → gold refresh,
  * sequenced with on-success dependency and a retry policy.
  *
  * Reference: AirBnBCDCPipeline runs LoadCustomerDim then, only on
  * `Succeeded`, LoadBookingFact (pipeline/AirBnBCDCPipeline.json:4-43);
  * every activity carries a timeout/retry policy block
  * (pipeline/LoadBookingFact.json:9-15; README recommends retry 3).
  * Spark-native: plain driver sequencing — an exception IS the failure
  * propagation — wrapped in [[retry]].
  */
object CdcPipeline {

  /** O4 — bounded retry with fixed backoff (reference: retry count +
    * retryIntervalInSeconds on every activity). */
  def retry[T](attempts: Int, backoffMs: Long = 0L)(body: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return body
      catch {
        case t: Throwable =>
          last = t; i += 1
          if (i < attempts && backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw last
  }

  /** LoadCustomerDim: landing CSVs → per-file SCD1 fold into the dim
    * table (typed via the cast-on-write translator), with archive +
    * logged delete per file. Returns the loaded dim. */
  def loadCustomerDim(spark: SparkSession, landingDir: String,
                      workDir: String): DataFrame = {
    val dimTable = s"$workDir/customer_dim"
    FileLifecycle.processAll(spark, landingDir, s"$workDir/archive",
      s"$workDir/delete_log") { (file, seq) =>
      val typed = CsvIngest.castTo(
          CsvIngest.readRaw(spark, file, CsvIngest.customerDimSchema),
          CsvIngest.customerDimSchema)
        .withColumn("file_seq", lit(seq.toLong))
      val merged = AtomicParquetSink.read(spark, dimTable) match {
        case Some(dim) => CdcOps.mergeUpsert(dim, typed, Seq("c_custkey"))
        case None => typed
      }
      AtomicParquetSink.overwrite(merged, dimTable)
    }
    AtomicParquetSink.read(spark, dimTable)
      .getOrElse(spark.emptyDataFrame)
  }

  /** LoadBookingFact: drain the change feed through the checkpointed
    * stream into the fact table (CdcStream end-to-end). */
  def loadBookingFact(spark: SparkSession, changes: DataFrame,
                      workDir: String): DataFrame =
    CdcStream.runEndToEnd(spark, changes, workDir)

  /** Gold refresh (Q3/Q4 WRITE path): recompute the per-country
    * aggregation from the fact+dim sink states and atomically overwrite
    * the gold table — TRUNCATE+INSERT as recompute+swap. */
  def refreshGold(spark: SparkSession, fact: DataFrame, dim: DataFrame,
                  nation: DataFrame, goldTable: String): DataFrame = {
    val agg = fact
      .join(dim, fact("user_id") === dim("c_custkey"), "inner")
      .join(broadcast(nation), dim("c_nationkey") === nation("n_nationkey"),
        "inner")
      .groupBy(col("n_name").as("country"))
      .agg(count(lit(1)).as("n_users"),
        graft.Oracle.moneySum(col("value")).as("total_value"),
        max(col("ts_s")).as("last_seen"))
    AtomicParquetSink.overwrite(agg, goldTable)
    AtomicParquetSink.read(spark, goldTable).get
  }

  /** The whole reference lifecycle in one call, against the fixture
    * tables: customer → landing CSVs → dim load; events → change feed →
    * fact stream; then gold refresh. Every stage writes through the
    * atomic sink and the result is the READ-BACK of the written gold
    * table (so the write path itself is oracle-verified). */
  def runAll(spark: SparkSession, sfDir: String, workDir: String): DataFrame = {
    // stage the landing zone: one CSV file group from the customer table
    val customer = Tables.customer(spark, sfDir)
    CsvIngest.writeRaw(customer.repartition(1), CsvIngest.customerDimSchema,
      s"$workDir/landing")
    val dim = retry(attempts = 3) {
      loadCustomerDim(spark, s"$workDir/landing", workDir)
    }
    val changes = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      fmtTs(col("ts")).as("ts_s"))
    val fact = retry(attempts = 3) {
      loadBookingFact(spark, changes, workDir)
    }
    retry(attempts = 3) {
      refreshGold(spark, fact, dim, Tables.nation(spark, sfDir),
        s"$workDir/gold")
    }
  }
}
