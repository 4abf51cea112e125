package graft

import graft.ops.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

/** AS-OF join: inclusive point-in-time semantics, unmatched-left
  * nulls, and the one-shuffle union-window plan shape. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "2024-01-01 10:00:00"),
    (2L, 10L, "2024-01-01 11:00:00"),
    (3L, 10L, "2024-01-01 08:00:00"),  // before any version
    (4L, 20L, "2024-01-01 10:00:00"),  // key with no versions
  ).toDF("event_id", "user_id", "ts_s")

  private def right = Seq(
    (10L, "2024-01-01 10:00:00", 100.0),  // equal ts -> inclusive match
    (10L, "2024-01-01 10:30:00", 200.0),
  ).toDF("user_id", "ts_s", "v")

  private def joined = AsofJoin.asofLeft(left, right, "user_id", "ts_s",
    Map("v" -> "asof_v", "ts_s" -> "asof_ts"))

  test("picks the latest version at-or-before each left ts, inclusive") {
    val byId = joined.select("event_id", "asof_v", "asof_ts")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(byId(1L) == (Some(100.0), Some("2024-01-01 10:00:00"))) // inclusive
    assert(byId(2L) == (Some(200.0), Some("2024-01-01 10:30:00")))
    assert(byId(3L) == (None, None)) // left row earlier than all versions
    assert(byId(4L) == (None, None)) // key never versioned
  }

  test("left rows and columns are preserved exactly (left-join semantics)") {
    assert(joined.count() == 4)
    assert(joined.columns.toSeq
      == Seq("event_id", "user_id", "ts_s", "asof_ts", "asof_v"))
  }

  test("plans as ONE shuffle (union-window), no nested-loop range join") {
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"asof must not all-pairs:\n$plan")
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 2,
      s"expected a single key shuffle (plus AQE reads):\n$plan")
  }
}
