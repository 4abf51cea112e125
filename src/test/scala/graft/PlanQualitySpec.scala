package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape enforcement across the relational surface: these are the
  * regressions the row oracle can NOT catch (a cartesian product or a
  * codegen break returns the same rows, just catastrophically slower
  * at scale). Only side-effect-free queries are sampled — entries that
  * stage temp dirs / run streams (q27-q31, q65, q68-q69, ...) execute
  * eagerly on construction and are covered by their own specs. */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val lazyRelational = Seq(
    "q01_gold_agg", "q02_quality_split_ok", "q04_derive",
    "q05_stay_duration", "q06_latest_lookup", "q07_alter_row",
    "q12_pricing_summary", "q13_topk_customers", "q14_region_rollup",
    "q33_event_windows", "q46_sql_api", "q47_asof_join",
    "q49_star_join", "q50_rollup", "q51_pivot", "q55_user_activity",
    "q61_grouped_topk", "q63_window_suite", "q64_cube",
    "q67_latest_skew_safe",
    "q118_promo_share", "q119_returned_value", "q120_large_orders",
    "q121_min_price_supplier", "q122_supplier_types",
    "q123_market_share", "q129_asof_native", "q130_local_supplier",
    "q131_volume_shipping", "q132_priority_counts", "q133_disjunctive",
    "q134_waiting_suppliers", "q135_simple_revenue", "q137_kmv_setops",
    "q145_cohorts", "q146_transitions", "q147_fill_rate",
    "q150_top_customer_list", "q151_rolling_actives",
    "q152_qty_price_corr", "q153_benford", "q155_fertility",
    "q160_grouping_sets", "q161_from_json", "q162_share_of_region",
    "q163_running_total", "q164_yoy_by_nation", "q165_sentence_stats")

  test("no sampled query plans a cartesian product") {
    // Distinguish "the query failed analysis" (e.g. a loader broken by
    // test-data drift) from "the query planned a cartesian product" —
    // the failure message must name the real cause, not masquerade as
    // a plan-shape violation (round-7 lesson).
    val broken = scala.collection.mutable.ListBuffer.empty[String]
    lazyRelational.foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          val msg = String.valueOf(e.getMessage)
          broken += s"$name: ${e.getClass.getSimpleName}: ${msg.linesIterator.take(3).mkString(" | ")}"
          ""
        }
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
    assert(broken.isEmpty,
      s"${broken.size} sampled queries failed before planning (NOT a plan-shape issue):\n" +
        broken.mkString("\n"))
  }

  test("scan->join->agg pipelines stay inside whole-stage codegen") {
    // AQE materializes stages (and their codegen wrapping) only during
    // execution — run the query at the tiny sf, then read the FINAL plan
    Seq("q01_gold_agg", "q12_pricing_summary", "q49_star_join")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        df.collect() // count() would spawn its OWN QueryExecution
        val plan = df.queryExecution.executedPlan.toString
        // "*(n) Operator" = the operator runs inside WholeStageCodegen
        // stage n — the simple toString never spells the node name out
        assert(plan.contains("*("),
          s"$name fell out of codegen:\n${plan.take(800)}")
      }
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("q13_topk_customers")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
