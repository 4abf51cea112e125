package graft

import graft.dedup.Dedup
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native JaccardSorted merge-scan kernel vs the built-in
  * `size(array_intersect)/size(array_union)` reference: value equality
  * on real shingle data, edge semantics, codegen participation. */
class JaccardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("merge-scan jaccard equals the set-op reference on real shingle pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.withHashedShingles(docs, "doc_id", "text", n = 2)
    val a = sh.select($"doc_id".as("ia"), $"shingles".as("sa"))
    val b = sh.select($"doc_id".as("ib"), $"shingles".as("sb"))
    val pairs = a.filter($"ia" < 40).crossJoin(b.filter($"ib" < 40))
      .select(
        GraftFunctions.jaccardSorted(spark, $"sa", $"sb").as("native"),
        (size(array_intersect($"sa", $"sb")).cast("double")
          / size(array_union($"sa", $"sb"))).as("ref"))
    // ref is NaN for two empty arrays; native too — compare via string form
    val mismatches = pairs.filter(
      expr("cast(native as string) <> cast(ref as string)")).count()
    assert(mismatches == 0)
    assert(pairs.filter($"native" === 1.0).count() >= 40) // self pairs
  }

  test("edge semantics: empty vs empty is NaN (filtered by any tau), disjoint is 0") {
    val out = spark.sql(
      """SELECT graft_jaccard(cast(array() as array<bigint>),
        |                     cast(array() as array<bigint>)) AS both_empty,
        |       graft_jaccard(array(1L, 2L), cast(array() as array<bigint>)) AS one_empty,
        |       graft_jaccard(array(1L, 2L), array(3L, 4L)) AS disjoint,
        |       graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS overlap,
        |       graft_jaccard(cast(null as array<bigint>), array(1L)) AS null_in
        |""".stripMargin).collect()(0)
    assert(out.getDouble(0).isNaN) // matches 0/0 in both Spark ref and DuckDB NULL-filter
    assert(out.getDouble(1) == 0.0)
    assert(out.getDouble(2) == 0.0)
    assert(out.getDouble(3) == 0.5)
    assert(out.isNullAt(4))
  }

  test("the kernel stays inside whole-stage codegen") {
    // build from range() so the projection can't constant-fold into a
    // LocalTableScan (which would bypass codegen entirely)
    val df = spark.range(10).select(
      array($"id", $"id" + 1).as("a"), array($"id" + 1, $"id" + 2).as("b"))
    val plan = df.select(GraftFunctions.jaccardSorted(spark, $"a", $"b"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_jaccard") && l.trim.startsWith("*")),
      s"expected the jaccard projection inside a codegen stage:\n$plan")
  }
}
