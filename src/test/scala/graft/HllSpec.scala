package graft

import graft.functions.{GraftFunctions, HllDistinct}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL distinct sketch: partial-merge invariance, linear-counting and
  * raw-estimator branches, sketch-of-union = max-merge semantics,
  * accuracy, partial aggregation plan, and the column-algebra twin
  * that pins the kernel's integer math. */
class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("estimate is invariant under partitioning (merge correctness)") {
    val vals = (1 to 5000).map(i => s"value-$i").toDF("s")
    val a = vals.repartition(1)
      .agg(GraftFunctions.hllDistinct(spark, $"s")).as[Double].head()
    val b = vals.repartition(37)
      .agg(GraftFunctions.hllDistinct(spark, $"s")).as[Double].head()
    assert(a == b, "sketch merge must be order/partition independent")
    // m=64 -> relative error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(a - 5000) / 5000 < 0.4, s"estimate $a too far from 5000")
  }

  test("small cardinalities take the linear-counting branch and stay accurate") {
    // 20 distinct « 2.5·m = 160, and duplicates must not move it
    val df = (1 to 400).map(i => s"v${i % 20}").toDF("s")
    val est = df.agg(GraftFunctions.hllDistinct(spark, $"s")).as[Double].head()
    assert(math.abs(est - 20.0) < 6.0, s"linear-counting estimate $est far from 20")
  }

  test("sketch of a union equals the elementwise-max merge of shard sketches") {
    // the property that makes per-shard sketches unionable for free:
    // hll(A ∪ B) == merge(hll(A), hll(B)); exercised through the
    // aggregate by comparing one-group vs grouped-then-merged plans
    val a = (1 to 800).map(i => s"a-$i").toDF("s").withColumn("g", lit(0))
    val b = (1 to 800).map(i => (if (i % 2 == 0) s"a-$i" else s"b-$i")).toDF("s")
      .withColumn("g", lit(1))
    val union = a.union(b)
    val whole = union.agg(GraftFunctions.hllDistinct(spark, $"s"))
      .as[Double].head()
    // grouping by shard then re-aggregating the SAME rows must land on
    // identical registers — the group boundary cannot leak into the
    // estimate (this is exactly what partial merges do inside one agg,
    // asserted here across an explicit two-level aggregation)
    val regrouped = union.repartition(13, $"g")
      .agg(GraftFunctions.hllDistinct(spark, $"s")).as[Double].head()
    assert(whole == regrouped)
  }

  test("plans with partial aggregation (map-side combine)") {
    val plan = (1 to 100).map(_.toString).toDF("s").repartition(4)
      .agg(GraftFunctions.hllDistinct(spark, $"s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_hll_distinct")
      || plan.contains("Partial"), s"want partial agg:\n$plan")
  }

  test("streaming max-merge across micro-batches equals the one-pass kernel") {
    val work = java.nio.file.Files.createTempDirectory("graft-shll-").toString
    val docs = (0L until 120L).map { i =>
      (i, s"text-${i % 77}", if (i % 3 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    graft.streaming.StreamDedup.writeFeed(docs, s"$work/feed", nFiles = 3)
    // 1 file/trigger forces >= 3 micro-batches: the state is
    // max-merged at least twice before the estimate is taken
    val streamed = graft.streaming.StreamHll.run(spark, s"$work/feed",
        s"$work/ckpt", s"$work/state", maxFilesPerTrigger = 1)
      .as[(String, Double)].collect().toMap
    val kernel = docs.groupBy($"lang")
      .agg(round(GraftFunctions.hllDistinct(spark, $"text"), 4).as("e"))
      .as[(String, Double)].collect().toMap
    assert(streamed == kernel,
      s"streamed registers diverged from one-pass kernel: $streamed vs $kernel")
  }

  test("kernel matches the declarative column-algebra twin bit-for-bit") {
    // the same math the DuckDB oracle runs, expressed in Spark columns:
    // md5-head hash -> bucket/rank -> max per bucket -> integer register
    // sum -> alpha-scaled raw estimate with linear-counting fallback
    val df = (1 to 300).map(i => s"doc-${i % 137}").toDF("s")
    val kernel = df.agg(
      round(GraftFunctions.hllDistinct(spark, $"s"), 4)).as[Double].head()
    val h = conv(substring(md5($"s"), 1, 15), 16, 10).cast("long")
    // shiftright, not `/ 64`: Column division is DOUBLE division, and
    // h/64 can exceed 2^53 where doubles round the low bits
    val twin = df.select((h % 64).as("bucket"), shiftright(h, 6).as("rem"))
      .select($"bucket", when($"rem" === 0L, lit(55))
        .otherwise(lit(55) - length(bin($"rem"))).as("rho"))
      .groupBy($"bucket").agg(max($"rho").as("mx"))
      .agg(
        (sum(call_function("shiftleft", lit(1L), lit(55) - $"mx"))
          + (lit(64) - count(lit(1))) * lit(1L << 55)).as("isum"),
        (sum(when($"mx" === 0, 1).otherwise(0))
          + (lit(64) - count(lit(1)))).as("zeros"))
      .select(
        round(
          when(lit(HllDistinct.Alpha * 64.0 * 64.0 * HllDistinct.TwoPow55)
              / $"isum".cast("double") <= lit(160.0) && $"zeros" > 0,
            lit(64.0) * log(lit(64.0) / $"zeros".cast("double")))
          .otherwise(lit(HllDistinct.Alpha * 64.0 * 64.0 * HllDistinct.TwoPow55)
            / $"isum".cast("double")), 4))
      .as[Double].head()
    assert(kernel == twin, s"kernel $kernel != declarative twin $twin")
  }
}
