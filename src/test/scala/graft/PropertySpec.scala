package graft

import graft.dedup.Dedup
import graft.functions.ShingleHashesUtil
import graft.ops.CdcOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based specs: the invariants example tests can't sweep.
  * Driven by ScalaCheck generators (deterministic enough to gate CI:
  * failures print the shrunk counterexample) over the pure kernels and
  * the fold/merge algebra the CDC and dedup paths rely on. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(p: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  // ---- pure kernel properties (fast: many cases) --------------------

  test("head60Md5 equals the BigInt of the first 15 md5 hex chars") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val bytes = s.getBytes("UTF-8")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      ShingleHashesUtil.head60Md5(bytes) == BigInt(hex.take(15), 16).toLong
    }, cases = 200)
  }

  test("merge-scan Jaccard equals set-based Jaccard on sorted distinct arrays") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 1000L)).map(_.distinct.sorted)
    check(Prop.forAll(gen, gen) { (a, b) =>
      (a.isEmpty && b.isEmpty) || {
        val (sa, sb) = (a.toSet, b.toSet)
        val expected = sa.intersect(sb).size.toDouble / sa.union(sb).size
        val got = Seq((a.toArray, b.toArray)).toDF("a", "b")
          .select(graft.functions.GraftFunctions
            .jaccardSorted(spark, col("a"), col("b")).as("j"))
          .as[Double].head()
        math.abs(got - expected) < 1e-12
      }
    }, cases = 20)
  }

  test("native minhash signature element h equals min over the hash family") {
    val P = Dedup.P
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 60) - 1))
      .map(_.distinct.sorted)
    check(Prop.forAll(gen) { xs =>
      val k = 8
      val got = Seq(Tuple1(xs.toArray)).toDF("h")
        .select(graft.functions.GraftFunctions
          .minhash(spark, col("h"), k).as("sig"))
        .as[Seq[Long]].head()
      val expected = (0 until k).map { h =>
        xs.map { x =>
          val hi = x / 1073741824L; val lo = x % 1073741824L
          (((2654435761L * (h + 1)) % P) * hi
            + ((2246822519L * (h + 1)) % P) * lo + h) % P
        }.min
      }
      got == expected
    }, cases = 20)
  }

  // ---- fold/merge algebra (DataFrame-heavy: few, bigger cases) ------

  test("mergeUpsertVersioned: any batch split folds to the 1-batch result") {
    val rowsGen = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(0, 5)
      v <- Gen.chooseNum(0, 100)
      ts <- Gen.chooseNum(0, 50)
    } yield (k.toLong, v.toLong, ts.toLong))
    val splitGen = Gen.chooseNum(1, 4)
    check(Prop.forAll(rowsGen, splitGen) { (rows, nSplits) =>
      // (ts, v) may tie across rows of one key — a synthetic unique
      // seq makes latest-wins a total order, as the real feeds do via
      // event_id
      val seqd = rows.zipWithIndex.map { case ((k, v, ts), i) =>
        (k, v, ts, i.toLong)
      }
      val order = Seq(col("ts"), col("seq"))
      val oneShot = CdcOps.latestPerKey(
          seqd.toDF("k", "v", "ts", "seq"), Seq("k"), order)
        .select("k", "v").as[(Long, Long)].collect().toSet
      // seed with the empty table, as the real sink does on first
      // batch — every batch (incl. the first) passes the merge
      val empty = Seq.empty[(Long, Long, Long, Long)]
        .toDF("k", "v", "ts", "seq")
      val folded = seqd.grouped(math.max(1, seqd.length / nSplits)).toSeq
        .map(_.toDF("k", "v", "ts", "seq"))
        .foldLeft(empty)((acc, b) =>
          CdcOps.mergeUpsertVersioned(acc, b, Seq("k"), order))
        .select("k", "v").as[(Long, Long)].collect().toSet
      folded == oneShot
    }, cases = 6)
  }

  test("connectedComponents agrees with brute-force union-find on random graphs") {
    val edgeGen = Gen.listOfN(8,
      Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L))
        .retryUntil(p => p._1 != p._2))
    check(Prop.forAll(edgeGen) { edges =>
      edges.isEmpty || {
        val got = Dedup.connectedComponents(
          edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap
        got == expected
      }
    }, cases = 5)
  }

  test("native as-of exec equals an in-memory reference on generated feeds") {
    // random keys/times with heavy collision pressure: ties on (key,
    // time), keys missing from one side, multiple versions per instant
    val rowGen = for {
      n <- Gen.chooseNum(0, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0L, 5L)
        t <- Gen.chooseNum(0L, 20L)
      } yield (k, t))
    } yield rows
    check(Prop.forAll(rowGen, rowGen) { (lraw, rraw) =>
      val l = lraw.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, f"2024-01-01 00:00:$t%02d") }
      // right unique per (key, time): keep max id
      val r = rraw.zipWithIndex.map { case ((k, t), i) =>
        (k, f"2024-01-01 00:00:$t%02d", i.toDouble) }
        .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq
      (l.isEmpty || r.isEmpty) || {
        val lDf = l.toDF("event_id", "user_id", "ts_s")
        val rDf = r.toDF("r_uid", "asof_ts", "asof_v")
        val got = graft.plans.AsofJoinNative.asofLeft(lDf, rDf,
            "user_id", "r_uid", "ts_s", "asof_ts")
          .select("event_id", "asof_v")
          .as[(Long, Option[Double])].collect().toMap
        // reference: per left row, max right time <= left time, same key
        val byKey = r.groupBy(_._1)
        val expected = l.map { case (id, k, t) =>
          id -> byKey.getOrElse(k, Seq.empty)
            .filter(_._2 <= t).sortBy(x => (x._2, x._3)).lastOption.map(_._3)
        }.toMap
        got == expected
      }
    }, cases = 15)
  }
}
