package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable

/** Measurement harness (optimization guide §1): run one or more
  * declared queries and break the wall-clock down into
  *
  *  - Spark JOB time (per job: submission→end wall, task-time sum,
  *    job description) — where executor work and scheduling live;
  *  - the DRIVER GAP (wall minus job wall) — planning, file listing,
  *    log/meta IO, commit protocol, pure driver code;
  *  - STREAMING micro-batch progress (`durationMs` per batch:
  *    addBatch / getBatch / latestOffset / queryPlanning / walCommit /
  *    commitOffsets) summed across every batch of every stream the
  *    query ran.
  *
  * Diagnostic only — never run by the driver, adds no query, changes
  * no result; it exists so optimization targets are measured, not
  * guessed (guide §1.1–1.2).
  *
  * Usage: `sbt "runMain graft.Prof q229_stream_outer_join ..."`
  * (env `SPARK_GRAFT_SF_DIR` picks the data dir, as Bench).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // `--set k=v` args apply session-conf overrides before the runs —
    // the A/B lever for candidate config changes (guide §1)
    val (sets, qargs) = args.partition(_.contains("="))
    sets.filterNot(_ == "--set").foreach { kv =>
      val Array(k, v) = kv.stripPrefix("--set").split("=", 2)
      spark.conf.set(k, v)
      println(s"[prof] conf $k=$v")
    }
    val names =
      if (qargs.nonEmpty) qargs.toSeq
      else { System.err.println("[prof] need query names"); sys.exit(2); Nil }

    // ---- listeners ----------------------------------------------------
    case class JobRec(desc: String, start: Long, var end: Long = 0L,
                      var taskMs: Long = 0L, var stages: Int = 0)
    case class StageRec(name: String, tasks: Int, runMs: Long,
                        cpuMs: Long, gcMs: Long)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageTask = mutable.HashMap.empty[Int, Long] // stageId -> task ms
    val stageRecs = mutable.ArrayBuffer.empty[StageRec]
    val jobListener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = JobRec(d, e.time)
        e.stageIds.foreach(sid => stageTask.getOrElseUpdate(sid, 0L))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val info = e.stageInfo
          stageTask(info.stageId) =
            info.taskMetrics.executorRunTime
          stageRecs += StageRec(info.name, info.numTasks,
            info.taskMetrics.executorRunTime,
            info.taskMetrics.executorCpuTime / 1000000L,
            info.taskMetrics.jvmGCTime)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    }
    val batchDur = mutable.LinkedHashMap.empty[String, Long] // phase -> ms
    var nBatches = 0
    val streamListener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        batchDur.synchronized {
          nBatches += 1
          e.progress.durationMs.forEach { (k, v) =>
            batchDur(k) = batchDur.getOrElse(k, 0L) + v.longValue()
          }
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.sparkContext.addSparkListener(jobListener)
    spark.streams.addListener(streamListener)

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        { System.err.println(s"[prof] unknown query $name"); sys.exit(2);
          null })
      // hygiene identical to Bench so numbers are comparable
      spark.sharedState.cacheManager.clearCache()
      TempDirs.sweep()
      System.gc()
      jobs.synchronized { jobs.clear(); stageTask.clear(); stageRecs.clear() }
      batchDur.synchronized { batchDur.clear(); nBatches = 0 }
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      // give listener events a moment to drain
      Thread.sleep(300)
      val js = jobs.synchronized { jobs.values.toVector }
      val jobWall = js.map(j => math.max(0L, j.end - j.start)).sum
      val taskSum = stageTask.values.sum
      println(s"\n==== $name  wall=${wallMs}ms ====")
      println(f"  jobs=${js.size}%d  jobWallSum=${jobWall}ms  " +
        f"taskTimeSum=${taskSum}ms  driverGap=${wallMs - jobWall}ms")
      val byDesc = js.groupBy(j => if (j.desc.isEmpty) "(none)" else
        j.desc.take(70))
        .map { case (d, v) =>
          (d, v.size, v.map(j => math.max(0L, j.end - j.start)).sum) }
        .toVector.sortBy(-_._3)
      byDesc.take(18).foreach { case (d, n, ms) =>
        println(f"    $ms%7dms  n=$n%-4d $d")
      }
      // stage attribution: group by stage NAME (the action callsite),
      // so hot code lines surface directly
      val byStage = jobs.synchronized {
        stageRecs.groupBy(_.name).map { case (n, v) =>
          (n, v.size, v.map(_.tasks).sum, v.map(_.runMs).sum,
            v.map(_.cpuMs).sum, v.map(_.gcMs).sum)
        }.toVector.sortBy(-_._4)
      }
      println("  top stages by task run time (name, nStages, nTasks, runMs, cpuMs, gcMs):")
      byStage.take(20).foreach { case (n, ns, nt, run, cpu, gc) =>
        println(f"    run=$run%7d cpu=$cpu%7d gc=$gc%6d stages=$ns%-4d tasks=$nt%-5d ${n.take(90)}")
      }
      val bd = batchDur.synchronized { batchDur.toVector }
      if (bd.nonEmpty) {
        println(s"  streaming: $nBatches batches; durationMs sums:")
        bd.sortBy(-_._2).foreach { case (k, v) =>
          println(f"    $v%7dms  $k")
        }
      }
    }
    spark.stop()
  }
}
