package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink format coverage beyond parquet: ORC, JSON, and CSV
  * round-trips preserve the nation table's rows exactly (CSV via the
  * engine's typed-read path since CSV carries no types). Avro is not
  * exercised — the spark-avro datasource module does not ship in this
  * environment's jars. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rows(df: DataFrame): Set[(Long, String, Long)] = {
    import spark.implicits._
    df.select(col("n_nationkey").cast("long"), col("n_name"),
      col("n_regionkey").cast("long")).as[(Long, String, Long)].collect().toSet
  }

  test("ORC, JSON, and CSV round-trips preserve rows exactly") {
    val dir = Files.createTempDirectory("graft-formats-").toString
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
      .select("n_nationkey", "n_name", "n_regionkey")
    val expected = rows(nation)

    nation.write.orc(s"$dir/orc")
    assert(rows(spark.read.orc(s"$dir/orc")) == expected)

    nation.write.json(s"$dir/json")
    assert(rows(spark.read.schema(nation.schema).json(s"$dir/json")) == expected)

    nation.write.option("header", true).csv(s"$dir/csv")
    assert(rows(spark.read.option("header", true).schema(nation.schema)
      .csv(s"$dir/csv")) == expected)
  }

  test("ORC scans get predicate pushdown like parquet") {
    val dir = Files.createTempDirectory("graft-formats-").toString
    Tables.orders(spark, "/root/testdata/sf0.001").write.orc(s"$dir/orders")
    val plan = spark.read.orc(s"$dir/orders")
      .filter(col("o_orderkey") > 100).select("o_orderkey", "o_totalprice")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,100)"),
      s"ORC scan must push the filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"))
  }
}
