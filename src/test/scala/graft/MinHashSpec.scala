package graft

import graft.dedup.Dedup
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fused native MinHashSignature kernel vs the HOF reference chain:
  * exact signature equality on real shingle data, empty/null element
  * semantics, codegen participation. */
class MinHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native signature equals the HOF reference on every fixture doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.withHashedShingles(docs, "doc_id", "text", n = 3)
    val both = sh.select(
      GraftFunctions.minhash(spark, $"shingles", 12).as("native"),
      Dedup.minhashSignatureReference("shingles", 12).as("ref"))
    assert(both.filter(expr("native <> ref")).count() == 0)
    assert(both.count() == 500)
  }

  test("empty input yields k nulls; null elements are skipped like array_min") {
    val out = spark.sql(
      """SELECT graft_minhash(cast(array() as array<bigint>), 4) AS empty_sig,
        |       graft_minhash(array(cast(null as bigint), 7L), 4) AS skip_null,
        |       graft_minhash(array(7L), 4) AS just7,
        |       graft_minhash(cast(null as array<bigint>), 4) AS null_in
        |""".stripMargin).collect()(0)
    assert(out.getSeq[Any](0) == Seq(null, null, null, null))
    assert(out.getSeq[Long](1) == out.getSeq[Long](2)) // null skipped
    assert(out.isNullAt(3))
  }

  test("the fused kernel stays inside whole-stage codegen") {
    val df = spark.range(10).select(array($"id", $"id" * 7).as("sh"))
    val plan = df.select(GraftFunctions.minhash(spark, $"sh", 8))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_minhash") && l.trim.startsWith("*")),
      s"expected the minhash projection inside a codegen stage:\n$plan")
  }
}
