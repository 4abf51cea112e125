package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Harness contract (driver parses ONE JSON line): the line goes to
  * stdout AND to bench_result.json in the cwd (round 1's stdout line
  * drowned in sbt log noise and parsed as null — the file is the
  * reliable channel).
  *
  * Fixes from the round-1 verdict: failures are NOT swallowed — a
  * failed query reports value -1, lands in "failed", and the process
  * exits nonzero; queries run in fixed sorted order after a warm-up
  * that exercises scan+join+agg codegen paths, so first-query JIT cost
  * doesn't get booked to an arbitrary Map-ordered victim.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // optional args = query-name subset, for local iteration on one
    // query without paying the full suite (driver passes none)
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      // fail loud: a typo'd name would otherwise run zero queries and
      // still overwrite bench_result.json with an empty "success"
      System.err.println(
        s"[bench] unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val selected: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap

    // warm-up: JIT/codegen the common scan→join→agg and window paths on
    // the SMALLEST sf so warm-up cost stays seconds, not a second bench
    val warmDir = "/root/testdata/sf0.001"
    Seq("q01_gold_agg", "q06_latest_lookup", "q12_pricing_summary")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, warmDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm-up $q failed: ${e.getMessage}")
        }
      }

    var failed = List.empty[String]
    // STABILIZED min per query: noise on a shared box (GC pauses, disk
    // contention, codegen-cache churn) is strictly additive, so the min
    // of repeated runs estimates the query's true cost — but a plain
    // min-of-2 still left 4× single-query swings between full-suite
    // snapshots (r05) and min-of-2-plus-one-retry left 12 of the top 25
    // disagreeing >15% (r06 measurement). The convergent criterion is
    // on the SAMPLES, not the count: keep sampling (≤5) until the two
    // smallest agree within 10% — then the min provably sits within
    // ~10% of the reachable floor, and two independent suite runs land
    // on the same floor instead of each reporting a different lucky
    // draw.
    val sampled = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def one(): Double =
        try {
          // hygiene OUTSIDE the timed window: drop any cache entries a
          // previous query leaked, sweep the previous run's scratch
          // dirs (the ≤5-sample loop would otherwise accumulate every
          // write-heavy query's debris for the whole JVM lifetime),
          // and let the JVM compact, so query N doesn't pay query
          // N-1's garbage (the in-suite-vs-isolated gap measured 10x
          // on late-suite queries without this)
          spark.sharedState.cacheManager.clearCache()
          TempDirs.sweep()
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          -1.0
        }
      var samples = List.empty[Double]
      var err = false
      var done = false
      while (!done) {
        val r = one()
        if (r < 0) { err = true; done = true }
        else {
          samples ::= r
          val s = samples.sorted
          done = (samples.size >= 2 && s(1) <= s.head * 1.10) ||
            samples.size >= 5
        }
      }
      name -> (if (err) List.empty[Double] else samples.reverse)
    }
    // headline value per query = min of its samples (noise on a shared
    // box is additive); ALL samples land in the file artifact so a
    // cross-round comparison can see the variance band per query
    // instead of re-litigating host noise from SURVEY prose every
    // round (round-8 verdict item 3)
    val results = sampled.map { case (name, ss) =>
      name -> (if (ss.isEmpty) -1.0 else ss.min)
    }
    // The driver keeps EXACTLY the last 2000 chars of stdout (measured
    // from the BENCH_r0{1,2,3} artifacts: tail len 2000, parsed null
    // every round because the line's HEAD fell off — 89 full-name
    // query keys at 3 decimals is 2.3 KB before sbt's [success]
    // epilogue eats another ~80). The STDOUT line therefore uses the
    // short qNN keys (~1.1 KB — safe past 150 queries); the full-name
    // line still goes to bench_result.json for humans and the repo.
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val partial = if (args.nonEmpty) """"partial":true,""" else ""
    def failedJson(keyOf: String => String): String =
      failed.sorted.map("\"" + keyOf(_) + "\"").mkString("[", ",", "]")
    // environment stamp (file channel only — the stdout budget is
    // tight): what a future round needs to verify a cross-round
    // comparison is like-for-like
    val envJson = {
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.toArray.map(_.toString)
        .filter(a => a.startsWith("-Xmx") || a.startsWith("-Xms")
          || a.contains("CodeCache") || a.startsWith("-XX:MaxMetaspace"))
        .map("\"" + _ + "\"").mkString("[", ",", "]")
      s""""env":{"spark":"${spark.version}",""" +
        s""""java":"${System.getProperty("java.version")}",""" +
        s""""max_heap_mb":${Runtime.getRuntime.maxMemory >> 20},""" +
        s""""cores":${Runtime.getRuntime.availableProcessors},""" +
        s""""master":"${spark.sparkContext.master}",""" +
        s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
        s""""jvm_args":$jvmArgs}"""
    }
    // suite-level variance band: what the total WOULD span if every
    // query drew its worst (resp. best) observed sample — plus the
    // per-query sample lists themselves
    val bandJson = {
      val mins = sampled.collect { case (_, ss) if ss.nonEmpty => ss.min }.sum
      val maxs = sampled.collect { case (_, ss) if ss.nonEmpty => ss.max }.sum
      val pct = if (mins > 0) (maxs - mins) / mins * 100 else 0.0
      val samplesJson = sampled.map { case (k, ss) =>
        s""""$k":${ss.map(fmt).mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
      s""""band":{"total_min":${fmt(mins)},"total_max":${fmt(maxs)},""" +
        s""""band_pct":${fmt(pct)}},"samples":$samplesJson"""
    }
    // band+samples ride the FILE channel only — the stdout line has a
    // hard 1900-char budget (driver tail buffer)
    def line(keyOf: String => String, withBand: Boolean = false): String = {
      val qs = results.map { case (k, v) => s"\"${keyOf(k)}\":${fmt(v)}" }
        .mkString("{", ",", "}")
      val band = if (withBand) s"$bandJson," else ""
      // "value" IS the floor-sum: every per-query number is the min of
      // its converged samples, and the total sums those floors — the
      // primary cross-round metric (round-9 verdict item 8). The
      // explicit "floor_total" alias makes that reading unambiguous
      // in the artifact; "band" spans what the total WOULD be under
      // worst/best observed draws (host-noise context, not the metric).
      s"""{"metric":"total","value":${fmt(total)},"floor_total":${fmt(total)},"unit":"sec",$partial"queries":$qs,""" +
        s""""failed":${failedJson(keyOf)},$envJson,$band"sf":"$sfDir"}"""
    }
    // stdout guard: the driver's tail buffer is 2000 chars and
    // head-truncation breaks its parse (r01–r03). Past the budget,
    // keep the TOP-20 SLOWEST per-query entries plus a "shed" count —
    // never an empty map (r05 lost ALL per-query data at 174 keys);
    // bench_result.json keeps everything regardless. Both channels
    // share ONE schema: "failed" is always an array of keys and the
    // partial marker appears on subset runs in either branch.
    val stdoutLine = line(_.takeWhile(_ != '_'))
    println(
      if (stdoutLine.length <= 1900) stdoutLine
      else {
        val top = results.filter(_._2 >= 0).sortBy(-_._2).take(20)
        val qs = top.map { case (k, v) =>
          s""""${k.takeWhile(_ != '_')}":${fmt(v)}""" }
          .mkString("{", ",", "}")
        s"""{"metric":"total","value":${fmt(total)},"floor_total":${fmt(total)},"unit":"sec",$partial""" +
          s""""queries":$qs,"shed":${results.size - top.size},""" +
          s""""failed":${failedJson(_.takeWhile(_ != '_'))},"sf":"$sfDir"}"""
      })
    // a subset run writes elsewhere: its "total" covers only the
    // selected queries and must never replace the full-suite snapshot
    val outFile = if (args.isEmpty) "bench_result.json"
                  else "bench_result_partial.json"
    Files.writeString(Paths.get(outFile),
      line(identity, withBand = true) + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
