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

  // ---- MorLog-tier source stamp + staleness guard + refresh ---------
  // (the round-16 verdict's #4: PqIndex got the full version-stamp
  // treatment in q292, but THIS index still served a moved table's
  // stale routing silently. Same contract, IVF-shaped: the refresh
  // unit is the CELL PARTITION — the change feed's pre/post images
  // name exactly which cells a changed id touches, so only those
  // cells' directories rewrite, O(affected cells), never the corpus.)

  private def srcPath(dir: String) = new Path(dir, "_ivf_src")

  /** (tableDir, version, idCol, embCol, cellCol) the index was built
    * from / last refreshed to; None = static-corpus index (no guard). */
  private[graft] def readSrc(spark: SparkSession, dir: String)
      : Option[(String, Int, String, String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (!srcPath(dir).getFileSystem(conf).exists(srcPath(dir))) None
    else graft.sink.AtomicFiles.readString(conf, srcPath(dir))
      .trim.split("\\|") match {
      case Array(t, v, id, emb, cell) => Some((t, v.toInt, id, emb, cell))
      case _ => None
    }
  }

  private def writeSrc(spark: SparkSession, dir: String, table: String,
                       v: Int, idCol: String, embCol: String,
                       cellCol: String): Unit =
    graft.sink.AtomicFiles.replace(spark.sparkContext.hadoopConfiguration,
      srcPath(dir), s"$table|$v|$idCol|$embCol|$cellCol"
        .getBytes("UTF-8"))

  /** Build the index FROM a MorLog table's current snapshot and stamp
    * the (table, version) it reflects — [[refresh]] then advances the
    * stamp off the table's change feed, and [[searchIndexed]] refuses
    * a moved table unless told `allowStale`. */
  def writeFromTable(spark: SparkSession, tableDir: String,
                     idCol: String, embCol: String, cellCol: String,
                     dir: String): Unit = {
    val v = graft.sink.MorLog.currentVersion(spark, tableDir)
    buildIndex(graft.sink.MorLog.read(spark, tableDir), idCol, embCol,
      cellCol, dir)
    writeSrc(spark, dir, tableDir, v, idCol, embCol, cellCol)
  }

  /** Refuse (or permit) serving an index whose source table moved —
    * a stampless (static-corpus) index serves unconditionally. */
  private def guardStale(spark: SparkSession, dir: String,
                         allowStale: Boolean): Unit =
    readSrc(spark, dir).foreach { case (table, v, _, _, _) =>
      val tip = graft.sink.MorLog.currentVersion(spark, table)
      if (tip != v && !allowStale) throw new IllegalStateException(
        s"IVF index $dir reflects $table@v$v but the table is at " +
          s"v$tip — IvfIndex.refresh(...) the index (O(affected " +
          "cells)), or pass allowStale = true to serve the stale " +
          "snapshot knowingly")
    }

  /** Incremental refresh off the source table's CHANGE FEED: one
    * [[graft.sink.MorLog.changes]] span resolves the changed ids and —
    * through its pre/post images — the CELLS those ids occupied or
    * now occupy; only those cells' partition directories rewrite
    * (survivors carry over, deduped by id so a crashed prior attempt
    * heals on re-run), every other cell is untouched, and the routing
    * sidecar refolds only the affected cells' representatives.
    * Counter-pinned via [[IvfIndexStats]]. Returns the number of
    * changed ids applied (0 = already fresh). */
  def refresh(spark: SparkSession, dir: String): Long = {
    val (table, v0, idCol, embCol, cellCol) =
      readSrc(spark, dir).getOrElse(throw new IllegalStateException(
        s"IVF index $dir carries no source stamp — built from a " +
          "static DataFrame; rebuild via writeFromTable to refresh " +
          "off a log"))
    val tip = graft.sink.MorLog.currentVersion(spark, table)
    if (tip == v0) {
      IvfIndexStats.lastRefreshIds = 0
      IvfIndexStats.lastRefreshCellsRewritten = 0
      return 0L
    }
    val cap = spark.conf.getOption("graft.ann.refreshIdCap")
      .map(_.toInt).getOrElse(1000000)
    val ch = graft.sink.MorLog.changes(spark, table, v0, tip, Seq(idCol))
      .persist()
    try {
      val idRows = ch.select(col(idCol)).distinct()
        .limit(cap + 1).collect()
      require(idRows.length <= cap,
        s"refresh: ${idRows.length}+ changed ids exceed " +
          "graft.ann.refreshIdCap — rebuild the index instead " +
          "(a delta that large IS a rebuild)")
      val ids = idRows.map(_.get(0)).toSeq
      if (ids.isEmpty) {
        writeSrc(spark, dir, table, tip, idCol, embCol, cellCol)
        IvfIndexStats.lastRefreshIds = 0
        IvfIndexStats.lastRefreshCellsRewritten = 0
        return 0L
      }
      // the cells a changed id LEFT (pre-image) or ENTERED
      // (post-image) — bounded by the capped id list, so the collect
      // is metadata-scale
      val affected = ch.select(explode(array(
          col(s"_old.$cellCol"), col(s"_new.$cellCol"))).as("cell"))
        .filter(col("cell").isNotNull)
        .select(col("cell").cast("int")).distinct()
        .collect().map(_.getInt(0)).toSeq
      // survivors of the affected cells only (partition-pruned read),
      // minus the changed ids
      val survivorsRaw = spark.read.parquet(dir)
        .filter(col("cell").isin(affected: _*))
        .select(col("vec_id"), col("cell").cast("int").as("cell"),
          col("v"))
        .filter(!col("vec_id").isInCollection(ids))
      // crash debris check (review-caught): a crash between a prior
      // attempt's rename-in and its delete duplicates unchanged ids.
      // VALUE-EQUAL copies collapse exactly under the dedup below;
      // DIVERGED copies (the crash interleaved with a table revert,
      // so this span no longer names the id) cannot be arbitrated
      // from the index alone — refuse loud with the rebuild remedy
      // rather than keep an arbitrary copy.
      val diverged = survivorsRaw.groupBy("vec_id")
        .agg(count(lit(1)).as("n"),
          countDistinct(struct(col("cell"), col("v"))).as("nv"))
        .filter(col("n") > 1 && col("nv") > 1).limit(1).count()
      require(diverged == 0,
        s"IvfIndex.refresh: the affected cells carry duplicate ids " +
          "with DIVERGED values — crash debris a later table change " +
          "has hidden from the change feed; rebuild the index " +
          "(writeFromTable)")
      val survivors = survivorsRaw.dropDuplicates("vec_id")
      // tip images of the changed ids — pruned read off the source
      val fresh = normalized(graft.sink.MorLog.readWhere(spark, table,
        col(idCol).isInCollection(ids)), idCol, embCol, cellCol)
      // the UNAFFECTED cells' representatives, resolved through the
      // stamp-CHECKED routing path and materialized BEFORE the
      // rewrite perturbs the listing (review-caught: the stored
      // sidecar could be stale after a crashed appendVectors or a
      // foreign write — blessing it here would convert detectable
      // staleness into silently wrong routing; routingReps falls
      // back to a data recompute exactly when the inventory drifted)
      val keptRepsPlan = routingReps(spark, dir)
        .filter(!col("cell").isin(affected: _*))
      val keptRepRows = keptRepsPlan.collect().toSeq
      // STAGE the rewritten cells under an underscore dir first (the
      // PqIndex rewriteTier protocol; Spark caching is NOT a safe
      // intermediary here — an append into `dir` triggers
      // recacheByPath, which re-executes any cached plan over the
      // by-then-deleted old files), then re-read the staged files —
      // a source with no dependence on the files about to die
      val hconf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(dir).getFileSystem(hconf)
      val tmp = s"$dir/_refresh_" +
        java.util.UUID.randomUUID().toString.take(8)
      try {
        survivors.unionByName(fresh).repartition(col("cell"))
          .write.partitionBy("cell").parquet(tmp)
        // schema given explicitly: a rewrite set that deletes a whole
        // cell's residents with nothing arriving stages ZERO parquet
        // files, and schema inference would throw where an empty
        // frame is the correct answer (review-caught)
        val staged = spark.read.schema(survivorsRaw.schema).parquet(tmp)
          .select(col("vec_id"), col("cell").cast("int").as("cell"),
            col("v"))
        // the affected cells' new representatives, materialized OFF
        // the staged files BEFORE they rename away (|affected| rows)
        val newRepsPlan = repsOf(staged)
        val newRepRows = newRepsPlan.collect().toSeq
        val newReps = spark.createDataFrame(
          spark.sparkContext.parallelize(newRepRows, 1),
          newRepsPlan.schema)
        val oldFiles = affected.flatMap { c =>
          val cd = new Path(s"$dir/cell=$c")
          if (!fs.exists(cd)) Seq.empty
          else fs.listStatus(cd).toSeq.filter(_.isFile)
            .map(_.getPath)
            .filter(p => p.getName.endsWith(".parquet") &&
              !p.getName.startsWith("_") && !p.getName.startsWith("."))
        }
        // rename the staged files into their cell dirs, then drop the
        // replaced files — a crash in between duplicates survivors; an
        // IMMEDIATE re-run heals it (same span, same affected cells,
        // value-equal copies collapse). Interleaving table mutations
        // before the re-run can push the debris outside the next
        // span's view — the diverged-copy refusal above catches it.
        fs.listStatus(new Path(tmp)).iterator
          .filter(s => s.isDirectory &&
            s.getPath.getName.startsWith("cell="))
          .foreach { cd =>
            val dst = new Path(dir, cd.getPath.getName)
            fs.mkdirs(dst)
            fs.listStatus(cd.getPath).iterator.filter(_.isFile)
              .filter(_.getPath.getName.endsWith(".parquet"))
              .zipWithIndex.foreach { case (f, i) =>
                val n = s"part-rf${System.nanoTime()}-$i.parquet"
                if (!fs.rename(f.getPath, new Path(dst, n)))
                  throw new java.io.IOException(
                    s"rename ${f.getPath} -> $dst/$n failed")
              }
          }
        oldFiles.foreach(p => fs.delete(p, false))
        // a cell whose every row was deleted keeps an EMPTY dir —
        // remove it so routing/recompute never lists a ghost cell
        affected.foreach { c =>
          val cd = new Path(s"$dir/cell=$c")
          if (fs.exists(cd) && fs.listStatus(cd).isEmpty)
            fs.delete(cd, true)
        }
        // kept (collected pre-rewrite) ∪ new representatives;
        // writeReps collects before it writes and stamps the FINAL
        // data-file inventory (tmp is underscore-hidden, never in it)
        val keptReps = spark.createDataFrame(
          spark.sparkContext.parallelize(keptRepRows, 1),
          keptRepsPlan.schema)
        writeReps(spark, dir, keptReps.unionByName(newReps))
        writeSrc(spark, dir, table, tip, idCol, embCol, cellCol)
        IvfIndexStats.lastRefreshIds = ids.length.toLong
        IvfIndexStats.lastRefreshCellsRewritten = affected.size
        ids.length.toLong
      } finally fs.delete(new Path(tmp), true)
    } finally ch.unpersist()
  }

  /** The stored sidecar's rep rows IGNORING the file-inventory stamp
    * (refresh re-stamps it right after) — None when absent/malformed. */
  private def routingRepsStored(spark: SparkSession,
                                dir: String): Option[DataFrame] = {
    val rdir = new Path(repsDir(dir))
    val fs = rdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rdir)) None
    else try {
      val side = spark.read.parquet(repsDir(dir))
      if (Seq("cell", "rep_id", "rv").forall(side.columns.contains))
        Some(side.select("cell", "rep_id", "rv"))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

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
    // a STAMPED index maintains through its source table (refresh
    // covers inserts via the change feed); a direct append would add
    // vectors the stamp's table never held with no staleness signal
    readSrc(spark, dir).foreach { case (table, v, _, _, _) =>
      throw new IllegalStateException(
        s"IVF index $dir is stamped to $table@v$v — append the " +
          "vectors to the TABLE and IvfIndex.refresh(...) instead; a " +
          "direct index append diverges silently from the stamp")
    }
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
                    idCol: String, embCol: String, k: Int,
                    allowStale: Boolean = false): DataFrame = {
    guardStale(spark, dir, allowStale)
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

/** The refresh path's O(affected cells) claim, pinned by specs /
  * q295: changed ids applied and cell partitions rewritten on the
  * last [[IvfIndex.refresh]]. */
object IvfIndexStats {
  @volatile var lastRefreshIds: Long = -1L
  @volatile var lastRefreshCellsRewritten: Int = -1
}
