package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED IVF vector index — the 100 TB serving form of
  * [[Ann.ivfComputedTopK]], built once and amortized across every
  * query (the same build-once/probe-pruned shape as the
  * [[graft.search.Search.buildPostings]] inverted index).
  *
  * Layout: vectors written `partitionBy(cell)` (one directory per
  * coarse cell — at web scale each cell is many files on its own
  * prefix), plus a `_reps` sidecar holding one (cell, rep_id, rep
  * vector) row per cell — the routing table, metadata-sized (|cells|
  * rows), hidden from plain readers by the underscore.
  *
  * A query then costs: one read of the sidecar (broadcast-sized),
  * cosine-route each query to its nearest representative, and ONE
  * partition-pruned read of the probed cells — `cell IN (…)` is a
  * literal filter on the partition column, so the scan lists only the
  * probed directories and never touches the rest of the corpus. The
  * routing math (5-dp cosine, cell-asc tiebreak, min-id
  * representative) is identical to [[Ann.ivfComputedTopK]], so the
  * indexed search returns bit-identical rows to the inline form — the
  * oracle is shared.
  *
  * Incremental maintenance ([[appendVectors]]): an arriving batch
  * appends into its cells' partitions and folds its per-cell min-id
  * into the sidecar — O(batch) + metadata, never an index rebuild;
  * half-built + appended equals the full build exactly (the
  * representative is min-id over the union either way).
  */
object IvfIndex {

  private def repsDir(dir: String): String = s"$dir/_reps"

  /** (vec_id, cell, v) normal form of an embedding frame. */
  private def normalized(emb: DataFrame, idCol: String, embCol: String,
                         cellCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), col(cellCol).cast("int").as("cell"),
      Ann.asDouble(embCol).as("v"))

  /** Per-cell min-id representative rows: (cell, rep_id, rv). */
  private def repsOf(e: DataFrame): DataFrame = {
    val repIds = e.groupBy("cell").agg(min("vec_id").as("rep_id"))
    repIds.join(e, repIds("rep_id") === e("vec_id"))
      .select(repIds("cell"), col("rep_id"), col("v").as("rv"))
  }

  /** Build the persisted index: cell-partitioned vector table + the
    * `_reps` routing sidecar, in one commit. The partitioned write is
    * one shuffle on the cell key; the sidecar is a |cells|-row
    * aggregate — both write-side, paid once. */
  def buildIndex(emb: DataFrame, idCol: String, embCol: String,
                 cellCol: String, dir: String): Unit = {
    val e = normalized(emb, idCol, embCol, cellCol)
    e.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    writeReps(e.sparkSession, dir, repsOf(e))
  }

  /** Persist the routing sidecar, stamping the CURRENT data-file
    * inventory (relative `cell=…/name` paths — dynamic-partition
    * writes reuse basenames across cell dirs) into every row. The
    * stamp is what makes staleness detectable at FILE granularity:
    * a crash between a data write and this sidecar write, or a
    * foreign append into an existing cell dir, changes the listing
    * and fails the freshness check — a cell-set comparison alone
    * would miss both. */
  private def writeReps(spark: SparkSession, dir: String,
                        reps: DataFrame): Unit = {
    val files = dataFileNames(spark, dir).toSeq.sorted
    val stamped = reps.withColumn("files",
      array(files.map(lit(_)): _*))
    val rows = stamped.collect().toSeq
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), stamped.schema)
      .write.mode("overwrite").parquet(repsDir(dir))
  }

  /** Append a batch into the index: new vectors land inside their
    * cells' partition directories (append never rewrites existing
    * files) and the routing sidecar is refreshed by folding the
    * batch's per-cell min-ids into the stored ones — the whole
    * maintenance step reads O(|cells|) sidecar rows and the batch,
    * nothing else. Ids must be new; update = delete-then-append.
    * Foreign writes that bypass this path invalidate the sidecar —
    * call [[rebuildReps]] after one. */
  def appendVectors(batch: DataFrame, idCol: String, embCol: String,
                    cellCol: String, dir: String): Unit = {
    val spark = batch.sparkSession
    val e = normalized(batch, idCol, embCol, cellCol)
    // fold batch reps into stored reps FIRST (while the sidecar still
    // matches the pre-append listing); min-id wins per cell. The
    // merged frame is materialized on the driver (|cells| rows —
    // metadata) because it overwrites the very files it was read from.
    val merged = routingReps(spark, dir).unionByName(repsOf(e))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cell").orderBy(col("rep_id").asc)))
      .filter(col("rn") === 1).drop("rn")
    // (re-evaluating `merged` after the append is safe either way:
    // the fresh-sidecar path reads the old sidecar until writeReps
    // collects it, and the recompute path folds the batch twice —
    // idempotent under min)
    e.repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(dir)
    writeReps(spark, dir, merged)
  }

  /** Recompute the routing sidecar from the data — the recovery hook
    * after a foreign write (one scan, |cells| rows out). */
  def rebuildReps(spark: SparkSession, dir: String): Unit =
    writeReps(spark, dir, repsOf(spark.read.parquet(dir)
      .select(col("vec_id"), col("cell").cast("int").as("cell"), col("v"))))

  /** Relative (`cell=…/name`) data-file paths currently under `dir` —
    * one listing per cell dir, metadata-only. */
  private def dataFileNames(spark: SparkSession, dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .flatMap { d =>
        fs.listStatus(d.getPath).iterator
          .filter(_.isFile)
          .map(f => s"${d.getPath.getName}/${f.getPath.getName}")
          .filter { rel =>
            val n = rel.substring(rel.indexOf('/') + 1)
            n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
          }
      }
      .toSet
  }

  /** The routing table: the sidecar when present, well-formed, and
    * stamped with EXACTLY the data files the directory currently
    * holds — any divergence (foreign append into an existing cell, a
    * crash between a data write and the sidecar fold, a new cell dir)
    * fails the comparison and falls back to a scan recompute, so
    * routing can never consult a stale inventory. */
  private def routingReps(spark: SparkSession, dir: String): DataFrame = {
    val rdir = new Path(repsDir(dir))
    val fs = rdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rdir)) {
      try {
        val side = spark.read.parquet(repsDir(dir))
        if (Seq("cell", "rep_id", "rv", "files").forall(side.columns.contains)) {
          val head = side.limit(1).select("files").collect()
          val recorded = if (head.isEmpty) Set.empty[String]
            else head.head.getSeq[String](0).toSet
          if (recorded.nonEmpty && recorded == dataFileNames(spark, dir))
            return side.select("cell", "rep_id", "rv")
        }
      } catch { case scala.util.control.NonFatal(_) => }
    }
    repsOf(spark.read.parquet(dir)
      .select(col("vec_id"), col("cell").cast("int").as("cell"), col("v")))
  }

  /** IVF search over the persisted index — bit-identical output to
    * [[Ann.ivfComputedTopK]] on the same corpus, but the corpus scan
    * is replaced by a partition-pruned read of the probed cells only:
    * route each query to its nearest representative via the sidecar,
    * collect the probed cell set (≤ |queries| values — metadata),
    * then `cell IN (probed)` prunes the vector read to those
    * directories. Output (query_id, cell, rank, neighbor_id, cos5). */
  def searchIndexed(spark: SparkSession, dir: String, queries: DataFrame,
                    idCol: String, embCol: String, k: Int): DataFrame = {
    val reps = routingReps(spark, dir)
    val q = queries.select(col(idCol).as("query_id"),
      Ann.asDouble(embCol).as("qv"))
    val routed = q.crossJoin(broadcast(reps))
      .withColumn("rcos", Ann.cos5(spark, col("qv"), col("rv")))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("rcos").desc, col("cell").asc)
    val assignedPlan = routed.withColumn("rr", row_number().over(wr))
      .filter(col("rr") === 1)
      .select(col("query_id"), col("cell"), col("qv"))
    // materialize the routing ONCE on the driver (|queries| rows — the
    // query side is broadcast-small by contract): the probed cell set
    // and the probe join both need it, and keeping it as a plan would
    // either recompute the routing per consumer or pin a cache entry
    val assignedRows = assignedPlan.collect().toSeq
    val probed = assignedRows.map(_.getInt(1)).distinct
    val assigned = spark.createDataFrame(
      spark.sparkContext.parallelize(assignedRows, 1), assignedPlan.schema)
    val post = spark.read.parquet(dir)
      .filter(col("cell").isin(probed: _*))
      .select(col("vec_id").as("neighbor_id"),
        col("cell").cast("int").as("cell"), col("v").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    val out = post.join(broadcast(assigned), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos5", Ann.cos5(spark, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos5"))
    out
  }
}
