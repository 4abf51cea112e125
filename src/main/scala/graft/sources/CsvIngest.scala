package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3 + K2's translator — the batch layer's CSV ingestion surface.
  *
  * The reference reads ALL-STRING delimited text (header, quote `"`,
  * escape `\` — dataset/CustomerDataRaw.json:10-20, every column
  * declared String :21-90) and coerces to the typed warehouse schema
  * only at the sink via ADF's TabularTranslator (`typeConversion:
  * true`, pipeline/LoadCustomerDim.json:94-101;
  * dataset/CustomerDataSynapse.json:52-72 — ints, dates,
  * decimal(10,2)). This module reproduces that parse-on-read /
  * cast-on-write split: [[readRaw]] yields the all-string frame,
  * [[castTo]] is the translator.
  *
  * Scale: CSV parsing is per-file parallel (one task per split);
  * the cast is a narrow codegen'd projection. Schema is declared, not
  * inferred — no sampling pass over 100 TB of text.
  */
object CsvIngest {

  /** The customer-dim translator: raw string column → warehouse type
    * (decimal(10,2) for money, per the reference's total_spent). */
  val customerDimSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DecimalType(10, 2)),
    StructField("c_mktsegment", StringType)))

  /** All-string view of a schema (what the raw CSV declares). */
  def rawSchema(typed: StructType): StructType =
    StructType(typed.fields.map(f => f.copy(dataType = StringType)))

  /** Dump a typed frame as raw CSV files (header, quote `"`, escape
    * `\`), stringifying every column — the landing-zone fixture
    * generator. Money goes through decimal first so the text form is
    * canonical 2-dp. */
  def writeRaw(df: DataFrame, typed: StructType, dir: String): Unit =
    df.select(typed.fields.map { f =>
        col(f.name).cast(f.dataType).cast(StringType).as(f.name)
      }.toSeq: _*)
      .write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\\")
      .csv(dir)

  /** Read one raw CSV file/dir with the declared all-string schema —
    * header consumed, dataset schema authoritative (the reference sets
    * `firstRowAsHeader: true` but trusts the dataset schema). */
  def readRaw(spark: SparkSession, path: String, typed: StructType): DataFrame =
    spark.read
      .option("header", "true").option("quote", "\"").option("escape", "\\")
      .schema(rawSchema(typed))
      .csv(path)

  /** The TabularTranslator: cast every raw string column to its
    * warehouse type. `try_cast`, not `cast`: under Spark 4's default
    * ANSI mode a malformed cell would fail the job, whereas the
    * reference tolerates coercion loss (`allowDataTruncation: true`) —
    * unparseable values become null. */
  def castTo(raw: DataFrame, typed: StructType): DataFrame =
    raw.select(typed.fields.map(f =>
      expr(s"try_cast(${f.name} AS ${f.dataType.sql})").as(f.name)).toSeq: _*)
}
