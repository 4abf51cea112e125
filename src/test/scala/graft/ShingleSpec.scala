package graft

import graft.dedup.Dedup
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fused native ShingleHashes kernel vs the HOF md5/conv chain:
  * exact set equality on real docs, boundary semantics, codegen. */
class ShingleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native shingle hashes equal the HOF reference on every fixture doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(2, 3)) {
      val native = Dedup.withHashedShingles(docs, "doc_id", "text", n)
      val ref = Dedup.withHashedShinglesReference(docs, "doc_id", "text", n)
      val joined = native.withColumnRenamed("shingles", "a")
        .join(ref.withColumnRenamed("shingles", "b"), "doc_id")
      assert(joined.filter(expr("a <> b")).count() == 0, s"n=$n mismatch")
    }
  }

  test("short docs yield an empty array; null text yields null") {
    val out = spark.sql(
      """SELECT graft_shingles(split('one two', ' '), 3) AS short,
        |       graft_shingles(split('a b c d', ' '), 3) AS ok,
        |       graft_shingles(cast(null as array<string>), 3) AS null_in
        |""".stripMargin).collect()(0)
    assert(out.getSeq[Long](0).isEmpty)
    assert(out.getSeq[Long](1).length == 2) // 'a b c', 'b c d'
    assert(out.isNullAt(2))
  }

  test("output is sorted and distinct") {
    val r = spark.sql(
      "SELECT graft_shingles(split('x y x y x y', ' '), 2) AS s")
      .as[Seq[Long]].head()
    assert(r == r.sorted && r == r.distinct)
    assert(r.length == 2) // 'x y' and 'y x'
  }

  test("the kernel stays inside whole-stage codegen") {
    val df = spark.range(10).selectExpr("split('a b c d e', ' ') AS w")
    val plan = df.select(GraftFunctions.shingles(spark, $"w", 2))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_shingles") && l.trim.startsWith("*")),
      s"expected the shingle projection inside a codegen stage:\n$plan")
  }
}
