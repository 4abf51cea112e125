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

  // ---- native physical operator -------------------------------------

  private def nativeJoined = graft.plans.AsofJoinNative.asofLeft(
    left,
    right.select(col("user_id").as("r_uid"), col("ts_s").as("asof_ts"),
      col("v").as("asof_v")),
    "user_id", "r_uid", "ts_s", "asof_ts")

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("native exec matches the window form on the canonical cases") {
    val byId = nativeJoined.select("event_id", "asof_v", "asof_ts")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(byId(1L) == (Some(100.0), Some("2024-01-01 10:00:00")))
    assert(byId(2L) == (Some(200.0), Some("2024-01-01 10:30:00")))
    assert(byId(3L) == (None, None))
    assert(byId(4L) == (None, None))
  }

  test("native exec parity with union-window form on a random feed") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 400).map { i =>
      (i.toLong, (rnd.nextInt(12)).toLong,
        f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
    }.toDF("event_id", "user_id", "ts_s")
    val r = (0 until 120).map { i =>
      ((i % 15).toLong, f"2024-01-01 ${(i * 7) % 24}%02d:${(i * 13) % 60}%02d:00",
        i.toDouble)
    }.distinct
      // unique per (key, ts): keep max v per (key, ts)
      .groupBy(t => (t._1, t._2)).values.map(_.maxBy(_._3)).toSeq
      .toDF("user_id", "ts_s", "v")
    val window = AsofJoin.asofLeft(l, r, "user_id", "ts_s",
        Map("v" -> "asof_v", "ts_s" -> "asof_ts"))
      .select("event_id", "asof_v", "asof_ts")
      .collect().map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2))))
      .sortBy(_._1)
    val native = graft.plans.AsofJoinNative.asofLeft(
        l, r.select(col("user_id").as("r_uid"), col("ts_s").as("asof_ts"),
          col("v").as("asof_v")),
        "user_id", "r_uid", "ts_s", "asof_ts")
      .select("event_id", "asof_v", "asof_ts")
      .collect().map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2))))
      .sortBy(_._1)
    assert(native.sameElements(window))
  }

  test("native plan contains AsofJoinExec and no window/filter stage") {
    val plan = nativeJoined.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected the native exec:\n$plan")
    assert(!plan.contains("Window"), s"no window stage expected:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"))
  }

  test("native exec handles a self-as-of (same source both sides)") {
    val e = (0 until 50).map { i =>
      (i.toLong, (i % 5).toLong, f"2024-01-01 ${i % 24}%02d:00:00", i * 1.0)
    }.toDF("event_id", "user_id", "ts_s", "v")
    val lSide = e.filter(col("event_id") % 2 === 0)
      .select("event_id", "user_id", "ts_s", "v")
    val rSide = e.filter(col("event_id") % 2 === 1)
      .groupBy(col("user_id").as("r_uid"), col("ts_s").as("asof_ts"))
      .agg(org.apache.spark.sql.functions.max("v").as("asof_v"))
    val out = graft.plans.AsofJoinNative.asofLeft(lSide, rSide,
      "user_id", "r_uid", "ts_s", "asof_ts")
    assert(out.count() == lSide.count())
    // spot-check: every matched asof_ts <= ts_s within the key
    val bad = out.filter(col("asof_ts").isNotNull &&
      (col("asof_ts") > col("ts_s") || col("r_uid") =!= col("user_id")))
    assert(bad.count() == 0)
  }

  test("native exec: NULL keys never match (SQL equi-join semantics)") {
    // A NULL left key must get a null right side, and a NULL right
    // key must never be held as a match — the natural ascending
    // ordering compares NULL == NULL, so without explicit guards the
    // exec would fabricate a NULL↔NULL match here.
    val l = Seq(
      (1L, Option(10L), "2024-01-01 10:00:00"),
      (2L, None: Option[Long], "2024-01-01 10:00:00"), // null left key
    ).toDF("event_id", "user_id", "ts_s")
    val r = Seq(
      (Option(10L), "2024-01-01 09:00:00", 1.0),
      (None: Option[Long], "2024-01-01 08:00:00", 99.0), // null right key
    ).toDF("r_uid", "asof_ts", "asof_v")
    val byId = graft.plans.AsofJoinNative.asofLeft(l, r,
        "user_id", "r_uid", "ts_s", "asof_ts")
      .select("event_id", "asof_v")
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(byId(1L) == Some(1.0), "non-null key still matches")
    assert(byId(2L) == None, "null left key must not match the null right key")
  }
}
