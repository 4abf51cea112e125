package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** LOG-BACKED MoR table — unified time travel across appends,
  * deletes, schema evolution AND compaction, under ONE commit log
  * (the Delta/Iceberg table-log shape; closes the documented scope
  * gaps of the directory-listing MoR tier, where
  * [[DeletionVectors.readPreviousGen]] versions only tombstones and
  * any compaction invalidates the grace snapshot). Relative to the
  * reference's table lifecycle — overwrite-style dimension reloads
  * and a TRUNCATE+INSERT gold refresh with no retained history
  * (synapse_table_creation.sql:56-88; pipeline/LoadCustomerDim
  * .json) — this is the versioned upgrade: every load is a readable
  * snapshot and "what changed" is a log question, not a re-scan.
  *
  * The key inversion vs the `_dv_g` tier: readers NEVER list the
  * directory — every version's metadata file names its exact data
  * files, so a compaction just commits a version with NEW files
  * while the old files stay on disk (invisible to new readers,
  * exactly what an old version needs). Physical deletion is a
  * separate, explicit [[vacuum]] — Delta's retention model.
  *
  * Layout under the table dir:
  *
  *   part-v<k>-<i>.parquet     — data files, written by version k
  *   _log/v<k>.meta            — version k's state: action, the
  *                               tombstone pointer, the schema, and
  *                               the FULL data-file list (atomic
  *                               overwrite-rename = the commit point)
  *   _log/tombs_v<k>/          — full tombstone set (fileName,
  *                               row_idx) committed at version k
  *
  * Each `.meta` is a FULL snapshot (metadata-sized — the file list;
  * Delta reaches the same property via checkpoints), so reading any
  * version is O(1) metadata. Commit protocol: data files and the
  * tombstone set land first, the `.meta` swap commits — a crash
  * before the swap leaves an uncommitted version whose leftovers the
  * next attempt overwrites. Single-writer, like every sink here.
  *
  * Scale notes: per-version tombstones read as a broadcast anti-join
  * (this tier targets the versioned-dimension/table use case; a
  * fact table with 100 TB delete volume uses the [[DvPerFile]]
  * in-scan representation, and the two compose by ceiling the log
  * table's tombstones with [[DeletionVectors.GuardConfKey]]-style
  * maintenance — compact folds them into data). The file LIST rides
  * the meta file; at millions of files the list itself pages —
  * that is the point where a real manifest tree (Iceberg) takes
  * over; documented, not hidden. */
object MorLog {

  private val LogDir = "_log"
  private val FileCol = "file"
  private val RowCol = "row_idx"
  private val RName = "__ml_name"
  private val RRow = "__ml_row"

  /** One version's committed state. `tombsV` points at the version
    * whose `tombs_v<k>` dir holds the CURRENT full tombstone set
    * (−1 = none); appends carry the pointer forward, compaction
    * resets it. */
  final case class State(version: Int, action: String, tombsV: Int,
                         schema: StructType, files: Seq[String])

  private def conf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration
  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(conf(spark))
  private def metaPath(dir: String, v: Int) =
    new Path(s"$dir/$LogDir/v$v.meta")
  private def tombsDir(dir: String, v: Int) = s"$dir/$LogDir/tombs_v$v"

  /** Committed versions, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val p = new Path(s"$dir/$LogDir")
    val fs = fsOf(spark, dir)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".meta"))
      .flatMap(n => scala.util.Try(
        n.stripPrefix("v").stripSuffix(".meta").toInt).toOption)
      .toSeq.sorted
  }

  def currentVersion(spark: SparkSession, dir: String): Int =
    versions(spark, dir).lastOption.getOrElse(
      throw new IllegalStateException(s"$dir carries no committed log"))

  private def writeState(spark: SparkSession, dir: String,
                         st: State): Unit = {
    val body = (Seq(st.action, st.tombsV.toString, st.schema.json) ++
      st.files).mkString("\n")
    AtomicFiles.replace(conf(spark), metaPath(dir, st.version),
      body.getBytes("UTF-8"))
  }

  def state(spark: SparkSession, dir: String, v: Int): State = {
    require(fsOf(spark, dir).exists(metaPath(dir, v)),
      s"version $v is not in $dir's log — never committed, or vacuumed " +
        "past the retention window")
    val body = AtomicFiles.readString(conf(spark), metaPath(dir, v))
    val lines = body.split("\n").toSeq
    State(v, lines.head, lines(1).toInt,
      org.apache.spark.sql.types.DataType.fromJson(lines(2))
        .asInstanceOf[StructType],
      lines.drop(3))
  }

  private def currentState(spark: SparkSession, dir: String): State =
    state(spark, dir, currentVersion(spark, dir))

  /** Land `df` as version `v`'s data files under deterministic names
    * (`part-v<k>-<i>.parquet`). A torn previous attempt's leftovers
    * for the same (uncommitted) version are removed first, so retry
    * is idempotent. */
  private def stageIn(spark: SparkSession, dir: String, df: DataFrame,
                      v: Int): Seq[String] = {
    val fs = fsOf(spark, dir)
    val stage = s"$dir/$LogDir/_stage_v$v"
    df.write.mode("overwrite").parquet(stage)
    if (fs.exists(new Path(dir)))
      fs.listStatus(new Path(dir)).iterator
        .filter(s => s.isFile && s.getPath.getName.startsWith(s"part-v$v-"))
        .foreach(s => fs.delete(s.getPath, false))
    val parts = fs.listStatus(new Path(stage)).iterator
      .filter(_.isFile).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
      .sortBy(_.getName)
    val names = parts.zipWithIndex.map { case (p, i) =>
      val n = s"part-v$v-$i.parquet"
      if (!fs.rename(p, new Path(s"$dir/$n")))
        throw new java.io.IOException(s"rename $p failed")
      n
    }
    fs.delete(new Path(stage), true)
    names
  }

  /** Version 0: create the table from `df`. */
  def create(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    require(versions(spark, dir).isEmpty, s"$dir already carries a log")
    val files = stageIn(spark, dir, df, 0)
    writeState(spark, dir,
      State(0, "create", -1, df.schema, files))
  }

  /** Append a batch (same columns, width-compatible) as one version. */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val st = currentState(spark, dir)
    val cols = st.schema.fieldNames.toSeq
    require(batch.columns.toSet == cols.toSet,
      s"append: batch columns ${batch.columns.toSeq.sorted} drift from " +
        s"the table's ${cols.sorted}; use evolveAppend for new columns")
    val v = st.version + 1
    val names = stageIn(spark, dir,
      batch.select(st.schema.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*), v)
    writeState(spark, dir,
      State(v, "append", st.tombsV, st.schema, st.files ++ names))
  }

  /** Schema evolution as one version: ADD COLUMN and safe TYPE
    * WIDENING ([[SchemaGuard.widens]]) commit in the meta, the batch
    * appends projected to the union, and old files decode under the
    * versioned (wider) read schema — previous versions keep their
    * own (narrower) schema; batches narrower than the table cast up
    * in the projection; narrowing/incompatible retypes stay loud. */
  def evolveAppend(spark: SparkSession, dir: String,
                   batch: DataFrame): Unit = {
    val st = currentState(spark, dir)
    val curMap = st.schema.map(f => f.name -> f.dataType).toMap
    val retyped = batch.schema.filter(f =>
      curMap.get(f.name).exists(_ != f.dataType))
    val widened = retyped.filter(f =>
      SchemaGuard.widens(curMap(f.name), f.dataType))
    val bad = retyped.filterNot(f =>
      SchemaGuard.widens(curMap(f.name), f.dataType) ||
        SchemaGuard.widens(f.dataType, curMap(f.name)))
    require(bad.isEmpty,
      s"evolveAppend: retyped ${bad.map(_.name)} — this tier evolves " +
        "by adding columns and safe widenings; other retypes go " +
        "through a rewrite")
    val widenMap = widened.map(f => f.name -> f.dataType).toMap
    val newFields = batch.schema.filter(f => !curMap.contains(f.name))
    val union = StructType(
      (st.schema.fields.map(f =>
        widenMap.get(f.name).map(t => f.copy(dataType = t))
          .getOrElse(f)) ++ newFields).map(_.copy(nullable = true)))
    val bCols = batch.columns.toSet
    val v = st.version + 1
    val names = stageIn(spark, dir,
      batch.select(union.map(f =>
        if (bCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)): _*), v)
    writeState(spark, dir,
      State(v, "evolve", st.tombsV, union, st.files ++ names))
  }

  private def withId(df: DataFrame): DataFrame =
    df.select(col("*"),
      element_at(split(col("_metadata.file_path"), "/"), -1).as(RName),
      col("_metadata.row_index").as(RRow))

  private def readData(spark: SparkSession, dir: String,
                       st: State): DataFrame = {
    val fs = fsOf(spark, dir)
    val missing = st.files.filterNot(n => fs.exists(new Path(s"$dir/$n")))
    require(missing.isEmpty,
      s"version ${st.version} references ${missing.length} vacuumed " +
        s"file(s) (${missing.take(3).mkString(", ")}…) — travel past " +
        "the retention window")
    spark.read.schema(st.schema)
      .parquet(st.files.map(n => s"$dir/$n"): _*)
  }

  private def tombsOf(spark: SparkSession, dir: String,
                      st: State): Option[DataFrame] =
    if (st.tombsV < 0) None
    else Sidecars.readRaw(spark, s"$dir/$LogDir", s"tombs_v${st.tombsV}",
      Seq(FileCol, RowCol)) match {
      case None => throw new IllegalStateException(
        s"version ${st.version}: tombstone set v${st.tombsV} unreadable")
      case some => some
    }

  /** DELETE WHERE as one version: tombstones accumulate (full set per
    * version — metadata-sized at this tier), data untouched. Returns
    * newly deleted rows. */
  def deleteWhere(spark: SparkSession, dir: String, cond: Column): Long = {
    val st = currentState(spark, dir)
    val cur = withId(readData(spark, dir, st))
    val visible = tombsOf(spark, dir, st) match {
      case None => cur
      case Some(t) => cur.join(broadcast(t),
        col(RName) === col(FileCol) && col(RRow) === col(RowCol),
        "left_anti")
    }
    val victims = visible.filter(coalesce(cond, lit(false)))
      .select(col(RName).as(FileCol), col(RRow).as(RowCol))
    val prev = tombsOf(spark, dir, st)
    val prevN = prev.map(_.count()).getOrElse(0L)
    val all = prev.map(_.unionByName(victims)).getOrElse(victims)
      .distinct().persist()
    try {
      val n = all.count()
      if (n == prevN) return 0L
      val v = st.version + 1
      all.coalesce(1).write.mode("overwrite").parquet(tombsDir(dir, v))
      writeState(spark, dir,
        State(v, "delete", v, st.schema, st.files))
      n - prevN
    } finally all.unpersist()
  }

  /** Compaction as one version: the current VISIBLE rows rewrite into
    * fresh files, tombstones fold away — and the OLD files stay on
    * disk, so every earlier version remains readable (the capability
    * the directory-listing tier's compaction destroys). Returns the
    * number of files the new version replaced. */
  def compact(spark: SparkSession, dir: String): Int = {
    val st = currentState(spark, dir)
    val v = st.version + 1
    val names = stageIn(spark, dir, readVersion(spark, dir, st.version), v)
    writeState(spark, dir, State(v, "compact", -1, st.schema, names))
    st.files.size
  }

  /** Bin-pack SMALL data files into ~`targetBytes` outputs as ONE
    * version — the incremental OPTIMIZE a trickle-drained log table
    * needs: [[compact]] rewrites the whole snapshot (right-sized
    * after a bulk delete), but a long [[runStream]] drain leaves one
    * small file set per micro-batch, and folding that debris must
    * cost O(small files), not O(table). Only files under
    * `smallBytes` are read (through their tombstones — a raw repack
    * would resurrect deleted rows); large files and their tombstone
    * entries stay untouched in the new version's state, and the old
    * files remain on disk so every earlier version keeps reading.
    * Returns the number of files packed away. */
  def compactSmall(spark: SparkSession, dir: String,
                   smallBytes: Long = 8L << 20,
                   targetBytes: Long = 128L << 20): Int = {
    require(smallBytes > 0 && targetBytes >= smallBytes,
      s"need 0 < smallBytes <= targetBytes, got $smallBytes/$targetBytes")
    val st = currentState(spark, dir)
    val fs = fsOf(spark, dir)
    val sized = st.files.map(n =>
      n -> fs.getFileStatus(new Path(s"$dir/$n")).getLen)
    val small = sized.filter(_._2 < smallBytes).map(_._1)
    if (small.size < 2) return 0
    val keepNames = st.files.filterNot(small.toSet)
    val src = spark.read.schema(st.schema)
      .parquet(small.map(n => s"$dir/$n"): _*)
    val visible = tombsOf(spark, dir, st) match {
      case None => src
      case Some(t) => withId(src).join(broadcast(t),
          col(RName) === col(FileCol) && col(RRow) === col(RowCol),
          "left_anti")
        .drop(RName, RRow)
    }
    val nOut = math.max(1,
      math.ceil(small.map(n => sized.toMap.apply(n)).sum.toDouble
        / targetBytes).toInt)
    val v = st.version + 1
    val packed = stageIn(spark, dir, visible.repartition(nOut), v)
    // tombstone entries of the packed files fold away with the
    // rewrite; kept files' entries carry into the new version's set
    val newTombsV = tombsOf(spark, dir, st) match {
      case None => -1
      case Some(t) =>
        val kept = t.filter(col(FileCol).isInCollection(keepNames))
          .persist()
        try {
          if (kept.isEmpty) -1
          else {
            kept.coalesce(1).write.mode("overwrite")
              .parquet(tombsDir(dir, v))
            v
          }
        } finally kept.unpersist()
    }
    writeState(spark, dir,
      State(v, "compact", newTombsV, st.schema, keepNames ++ packed))
    small.size
  }

  /** Drop versions older than the newest `keepVersions` and every
    * data file / tombstone set only they reference. Explicit
    * retention, Delta's VACUUM: travel to a vacuumed version fails
    * loud in [[readVersion]]'s liveness check. Returns the number of
    * data files deleted. */
  def vacuum(spark: SparkSession, dir: String,
             keepVersions: Int = 2): Int = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    if (drop.isEmpty) return 0
    val keptStates = keep.map(state(spark, dir, _))
    val referenced = keptStates.flatMap(_.files).toSet
    val keptTombs = keptStates.map(_.tombsV).filter(_ >= 0).toSet
    val fs = fsOf(spark, dir)
    var deleted = 0
    drop.map(state(spark, dir, _)).foreach { st =>
      st.files.filterNot(referenced.contains).foreach { n =>
        if (fs.delete(new Path(s"$dir/$n"), false)) deleted += 1
      }
      if (st.tombsV >= 0 && !keptTombs.contains(st.tombsV))
        fs.delete(new Path(tombsDir(dir, st.tombsV)), true)
      fs.delete(metaPath(dir, st.version), false)
    }
    deleted
  }

  /** One maintenance pass, in the safe order — the table-service call
    * a long-drained log table runs between batches: bin-pack the
    * trickle debris ([[compactSmall]], one value-invisible version),
    * then retire out-of-retention versions and the files only they
    * reference ([[vacuum]]). Returns (filesPacked, filesVacuumed).
    * Ordering matters for efficiency only: vacuuming first would
    * retain the debris the pack is about to supersede for one more
    * cycle. */
  def maintain(spark: SparkSession, dir: String,
               smallBytes: Long = 8L << 20,
               targetBytes: Long = 128L << 20,
               keepVersions: Int = 2): (Int, Int) = {
    val packed = compactSmall(spark, dir, smallBytes, targetBytes)
    val dropped = vacuum(spark, dir, keepVersions)
    (packed, dropped)
  }

  /** The table as of version `v` — files, tombstones, and schema all
    * as committed then. */
  def readVersion(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val st = state(spark, dir, v)
    val data = readData(spark, dir, st)
    tombsOf(spark, dir, st) match {
      case None => data
      case Some(t) =>
        withId(data).join(broadcast(t),
          col(RName) === col(FileCol) && col(RRow) === col(RowCol),
          "left_anti")
          .drop(RName, RRow)
    }
  }

  /** The current snapshot. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, currentVersion(spark, dir))

  /** Keyed MoR UPSERT as ONE committed version: tombstone the current
    * visible rows whose `keyCol` appears in `batch`, append the batch
    * — both under a single meta swap, so a reader sees the whole
    * merge or none of it, and the pre-merge snapshot stays one
    * `readVersion` away. `batch` must be unique on the key (checked).
    * `actionTag` lets a streaming drain fence replays (see
    * [[applyStreamBatch]]). */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
             keyCol: String, actionTag: String = "upsert"): Unit = {
    val st = currentState(spark, dir)
    require(batch.columns.toSet == st.schema.fieldNames.toSet,
      s"upsert: batch columns ${batch.columns.toSeq.sorted} drift from " +
        s"the table's ${st.schema.fieldNames.toSeq.sorted}")
    val keys = batch.select(col(keyCol)).distinct().persist()
    try {
      val nKeys = keys.count()
      require(nKeys == batch.count(),
        s"upsert: batch is not unique on $keyCol")
      val v = st.version + 1
      if (nKeys == 0) {
        // zero-row batch: commit a data-less version so a stream
        // fence still lands (no empty data files written)
        writeState(spark, dir,
          State(v, actionTag, st.tombsV, st.schema, st.files))
        return
      }
      val cur = withId(readData(spark, dir, st))
      val visible = tombsOf(spark, dir, st) match {
        case None => cur
        case Some(t) => cur.join(broadcast(t),
          col(RName) === col(FileCol) && col(RRow) === col(RowCol),
          "left_anti")
      }
      val victims = visible
        .join(broadcast(keys), Seq(keyCol), "left_semi")
        .select(col(RName).as(FileCol), col(RRow).as(RowCol))
      val prev = tombsOf(spark, dir, st)
      val all = prev.map(_.unionByName(victims)).getOrElse(victims)
        .distinct().persist()
      try {
        val tombsV = if (all.isEmpty) st.tombsV else {
          all.coalesce(1).write.mode("overwrite")
            .parquet(tombsDir(dir, v))
          v
        }
        val names = stageIn(spark, dir,
          batch.select(st.schema.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*), v)
        writeState(spark, dir,
          State(v, actionTag, tombsV, st.schema, st.files ++ names))
      } finally all.unpersist()
    } finally keys.unpersist()
  }

  /** CDC_CHANGES between two committed versions, at key granularity:
    * (keys…, change ∈ insert/update/delete, _old, _new) — the
    * [[AtomicParquetSink.tableChanges]] classification over the log's
    * snapshots, so "what changed between v3 and v7" is one call
    * regardless of how many upserts/deletes/compactions lie between.
    * Value-identical frames (e.g. across a pure compaction) diff to
    * zero rows. */
  def changes(spark: SparkSession, dir: String, fromV: Int, toV: Int,
              keyCols: Seq[String]): DataFrame = {
    val a = readVersion(spark, dir, fromV)
    val toSchema = state(spark, dir, toV).schema
    // a span crossing an evolveAppend: project the old snapshot to
    // the newer schema (added columns null-filled), like any CDC
    // consumer expects — dropping columns backwards stays loud
    val extra = a.columns.toSet -- toSchema.fieldNames.toSet
    require(extra.isEmpty,
      s"changes: v$fromV carries columns $extra that v$toV lacks")
    val aCols = a.columns.toSet
    val aProj = a.select(toSchema.map(f =>
      (if (aCols.contains(f.name)) col(f.name)
       else lit(null)).cast(f.dataType).as(f.name)): _*)
    AtomicParquetSink.diffFrames(aProj, readVersion(spark, dir, toV),
      keyCols, s"v$fromV", s"v$toV")
  }

  /** RESTORE TO VERSION as a NEW commit (Delta's RESTORE): re-commit
    * version `v`'s exact state — files, tombstone pointer, schema —
    * as the next version. History only moves forward: the bad
    * intermediate versions stay readable under normal retention, and
    * the restore itself is one metadata swap (no data moves). Fails
    * loud when `v`'s files were already vacuumed. */
  def restore(spark: SparkSession, dir: String, v: Int): Unit = {
    val st = state(spark, dir, v)
    val fs = fsOf(spark, dir)
    val missing = st.files.filterNot(n => fs.exists(new Path(s"$dir/$n")))
    require(missing.isEmpty,
      s"restore: version $v references ${missing.length} vacuumed file(s)")
    val cur = currentState(spark, dir)
    writeState(spark, dir,
      State(cur.version + 1, s"restore:v$v", st.tombsV, st.schema,
        st.files))
  }

  /** INCREMENTAL change feed (Delta's CDF shape): the net
    * insert/update/delete set over (fromV, toV], derived from the
    * LOG'S OWN PER-VERSION DELTAS — the files each version added and
    * the tombstone-set growth — never from snapshot scans. Cost is
    * O(changed data + affected files), at ANY table size, vs
    * [[changes]]' two full snapshot reads; the two agree exactly
    * (spec-pinned), so [[changes]] is the small-table/ad-hoc form
    * and this is the 100 TB subscription form.
    *
    * Contract: the span's versions must follow the keyed
    * single-visible-row discipline ([[create]]/[[upsert]]/
    * [[deleteWhere]]/[[evolveAppend]] of distinct keys) — plain
    * appends that duplicate a key make per-key netting ill-defined
    * (same contract as Delta CDF over MERGE-maintained tables).
    * Compactions inside the span are value-invisible and contribute
    * nothing; a RESTORE inside the span rewinds state non-monotonically
    * and is rejected loud (subscribe across it via two spans or the
    * snapshot diff). Old images are projected to `toV`'s schema
    * (added columns null-filled), like any CDC consumer expects. */
  def incrementalChanges(spark: SparkSession, dir: String, fromV: Int,
                         toV: Int, keyCols: Seq[String]): DataFrame = {
    require(fromV < toV, s"need fromV < toV, got $fromV/$toV")
    val span = versions(spark, dir).filter(v => v > fromV && v <= toV)
    require(span.nonEmpty && span.max == toV,
      s"span ($fromV, $toV] not fully in the log")
    val toSchema = state(spark, dir, toV).schema
    val nonKey = toSchema.fieldNames.filterNot(keyCols.contains).toSeq
    def payload(df: DataFrame): Column =
      struct(nonKey.map(c =>
        (if (df.columns.contains(c)) col(c)
         else lit(null)).cast(toSchema(c).dataType).as(c)): _*)
    var prev = state(spark, dir, fromV)
    val events = span.flatMap { v =>
      val st = state(spark, dir, v)
      require(!st.action.startsWith("restore:"),
        s"incrementalChanges: version $v is a RESTORE — state rewinds " +
          "non-monotonically inside the span; use changes() across it")
      val out: Seq[DataFrame] =
        if (st.action == "compact") Seq.empty // value-invisible
        else {
          val added = st.files.filterNot(prev.files.toSet)
          val ins =
            if (added.isEmpty) None
            else {
              val src = spark.read.schema(st.schema)
                .parquet(added.map(n => s"$dir/$n"): _*)
              Some(src.select(keyCols.map(col) :+ lit(v).as("_v") :+
                lit("I").as("_kind") :+ payload(src).as("_payload"): _*))
            }
          val del =
            if (st.tombsV == prev.tombsV) None
            else {
              val newT = tombsOf(spark, dir, st).get
              val delta = tombsOf(spark, dir, prev) match {
                case None => newT
                case Some(o) => newT.exceptAll(o)
              }
              // the delta names only the files that LOST rows this
              // version — the old images load from just those files
              val names = delta.select(col(FileCol)).distinct()
                .collect().map(_.getString(0)).toSeq.sorted
              if (names.isEmpty) None
              else {
                val src = spark.read.schema(prev.schema)
                  .parquet(names.map(n => s"$dir/$n"): _*)
                Some(withId(src)
                  .join(broadcast(delta),
                    col(RName) === col(FileCol) && col(RRow) === col(RowCol),
                    "left_semi")
                  .select(keyCols.map(col) :+ lit(v).as("_v") :+
                    lit("D").as("_kind") :+ payload(src).as("_payload"): _*))
              }
            }
          (del.toSeq ++ ins.toSeq)
        }
      prev = st
      out
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        keyCols.map(k => org.apache.spark.sql.types.StructField(k,
          toSchema(k).dataType)) ++ Seq(
          org.apache.spark.sql.types.StructField("_v",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("_kind",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("_payload",
            org.apache.spark.sql.types.StructType(nonKey.map(c =>
              org.apache.spark.sql.types.StructField(c,
                toSchema(c).dataType)))))))
    val ev = events.foldLeft(empty)(_ unionByName _)
    // per-key netting: a delete orders before an insert within one
    // version (an upsert is delete-then-insert); net old = the first
    // event's payload iff it is a delete (the key was visible at
    // fromV), net new = the last event's payload iff it is an insert
    val rank = when(col("_kind") === "D", 0).otherwise(1)
    val ord = struct(col("_v"), rank.as("_r"))
    val net = ev.groupBy(keyCols.map(col): _*)
      .agg(min_by(struct(col("_kind"), col("_payload")), ord).as("_first"),
        max_by(struct(col("_kind"), col("_payload")), ord).as("_last"))
      .select(keyCols.map(col) :+
        when(col("_first._kind") === "D", col("_first._payload"))
          .as("_old") :+
        when(col("_last._kind") === "I", col("_last._payload"))
          .as("_new"): _*)
    net
      .withColumn("change",
        when(col("_old").isNull && col("_new").isNotNull, "insert")
          .when(col("_old").isNotNull && col("_new").isNull, "delete")
          .when(col("_old").isNotNull && col("_new").isNotNull
            && !(col("_old") <=> col("_new")), "update"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("change"), col("_old"),
        col("_new")): _*)
  }

  /** Idempotently apply one streaming micro-batch as an upsert
    * version. The replay fence is the version log itself: the batch's
    * (checkpoint, batchId) identity rides the committed action tag,
    * so a redelivered batch finds its own commit and no-ops — no
    * side marker files, the fence IS the transaction record (Delta's
    * txn appId/version, in the meta line). */
  def applyStreamBatch(spark: SparkSession, dir: String,
                       batch: DataFrame, batchId: Long, keyCol: String,
                       checkpointDir: String): Unit = {
    val tag =
      s"upsert:${graft.streaming.StreamMoR.runTagOf(checkpointDir)}b$batchId"
    val applied = versions(spark, dir)
      .exists(v => state(spark, dir, v).action == tag)
    if (!applied) upsert(spark, dir, batch, keyCol, tag)
  }

  /** Drain a keyed parquet change feed into the log-backed table:
    * checkpointed, AvailableNow, one committed version per
    * micro-batch — so the WHOLE drain history is time-travelable
    * (any mid-drain state is a `readVersion` away) and replays fence
    * on the log itself. */
  def runStream(spark: SparkSession, feedDir: String,
                schema: StructType, checkpointDir: String, dir: String,
                keyCol: String, maxFilesPerTrigger: Int = 1): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(feedDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyStreamBatch(spark, dir, batch, batchId, keyCol,
          checkpointDir)
      }
      .start()
    q.awaitTermination()
  }
}
