package graft

import org.apache.spark.sql.SparkSession

/** The engine's session factory — one place for the config every
  * entry point (Verify/Bench/Explain, and a library user) needs:
  *
  *  - `spark.sql.extensions = graft.GraftExtensions`: native kernels
  *    SQL-registered and the range-join rewrite rule active, i.e. the
  *    full engine surface, not just the late-bind fallback;
  *  - shuffle partitions = worker threads (a 32-thread local box wants
  *    32, not the 200 default sized for real clusters);
  *  - AQE skew-join explicitly on (default in Spark 4, pinned here
  *    because the CDC dedupe story depends on it);
  *  - UTC session timezone (oracle parity; also makes the NTZ→LTZ
  *    normalization in `Tables.events` value-preserving).
  *
  * Note on `events.ts` encoding drift: the legacy nanos-as-long conf is
  * NOT set here — `Tables.events` detects the legacy TIMESTAMP(NANOS)
  * encoding and enables the conf only when that encoding is actually
  * present (see Tables.scala), so modern `timestamp[us]` data reads with
  * stock session state.
  */
object GraftSession {

  /** Worker thread count: SPARK_GRAFT_CPUS if set, else every core. */
  def cpus: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
    .getOrElse(Runtime.getRuntime.availableProcessors)

  def builder(cores: Int = cpus): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // standard INT64 micros, never INT96: INT96 is deprecated,
      // carries NO usable footer stats (so file skipping and the
      // MorLog stats tier would go blind on timestamp columns), and
      // the DSv2 reader decodes the standard form directly
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // Streaming-checkpoint IO fast path (optimization r17, measured
      // with thread dumps — see GraftLocalCheckpointFileManager's
      // scaladoc): the stock FileContext manager forks a `chmod`
      // process per checkpoint file/dir when the Hadoop native lib is
      // absent, and Spark 4.1's checkpoint-file checksum layer doubles
      // every state/WAL file write and blocks each close on an async
      // checksum future (32 join tasks measured parked in
      // ChecksumCheckpointFileManager.awaitResult). The graft manager
      // does NIO writes with atomic temp+rename on `file:` roots and
      // DELEGATES to the stock manager for remote schemes; the
      // checksum layer is off by default for the same reason the
      // manager exists (local durability comes from the atomic
      // rename; remote deployments that want per-file checksums
      // re-enable with one conf — both are plain session confs, so
      // any user setting wins over these defaults).
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "GraftLocalCheckpointFileManager")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // Let AQE re-plan the output partitioning of CACHED plans
      // (SPARK-38232, default false): the lifecycle ops persist small
      // key/tombstone sets mid-commit, and with the default every
      // cached `distinct()` pins shuffle-partition-count partitions —
      // measured as 32-task stages (and 32-task broadcast builds) over
      // few-KB cached frames on every tombstone count and victim
      // locate. With AQE allowed, those cache at their coalesced size.
      // Scale-correct by construction: AQE sizes partitions from data,
      // so a 100 TB key set keeps its parallelism.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(cores: Int = cpus): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
