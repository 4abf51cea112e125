package graft

import graft.ann.Ann
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native CosineSimilarity kernel vs the HOF reference: bitwise
  * equality, null semantics, codegen participation. */
class CosineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native cosine is BITWISE-identical to the HOF reference on the fixture") {
    val e = fixture.select(col("vec_id"), Ann.asDouble("embedding").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    // every pair in a bounded slice, raw (unrounded) doubles compared bit-for-bit
    val pairs = a.filter($"ia" < 30).crossJoin(b.filter($"ib" < 30))
      .select(
        GraftFunctions.cosine(spark, col("va"), col("vb")).as("native"),
        (Ann.dot(col("va"), col("vb"))
          / (Ann.norm(col("va")) * Ann.norm(col("vb")))).as("ref"))
    val mismatches = pairs.filter(
      expr("cast(native as string) <> cast(ref as string)")).count()
    assert(mismatches == 0)
  }

  test("null semantics match zip_with padding: length mismatch and null elements -> null") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),  // length mismatch
      (Seq(1.0, 2.0), Seq(1.0, 2.0))        // clean
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.cosine(spark, col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT graft_cosine(array(1.0d, cast(null as double)), array(1.0d, 2.0d)) c")
    assert(withNullElem.collect()(0).isNullAt(0))
  }

  test("the kernel stays inside whole-stage codegen") {
    val e = fixture.select(Ann.asDouble("embedding").as("v"))
    val plan = e.select(GraftFunctions.cosine(spark, col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_cosine") && l.trim.startsWith("*")),
      s"expected the cosine projection inside a codegen stage:\n$plan")
  }

  test("extension class injects the function at session build") {
    import org.apache.spark.sql.SparkSession
    val base = spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // getOrCreate now CREATES a fresh session (same context) with the
      // injected extensions — withExtensions is the public builder hook
      // (the spark.sql.extensions STATIC conf only applies when the
      // SparkContext itself is new)
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions()(_))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2 ne base)
      val r = s2.sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) c")
        .collect()(0).getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
