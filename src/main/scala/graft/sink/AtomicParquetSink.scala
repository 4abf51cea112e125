package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** K1's physical sink half: an atomically-swappable parquet table.
  *
  * No Delta jar ships in this environment (SURVEY.md §1.1), so keyed
  * upsert is read-merge-rewrite. The crash-safety problem with naive
  * "delete dir, rewrite dir" is the window where the table is gone;
  * instead the table is a directory of immutable VERSION subdirs plus a
  * `_current` pointer file, and the swap is a single POSIX/HDFS-atomic
  * rename of the pointer:
  *
  *   table/
  *     _current          -> contains "v-<uuid>"
  *     v-<uuid-1>/...    (previous version, GC'd after swap)
  *     v-<uuid-2>/...    (current version parquet)
  *
  * Readers resolve `_current` then read one immutable dir — a reader
  * concurrent with a writer sees either the old or the new version,
  * never a partial table. This mirrors the reference sink's staged-copy
  * + swap behavior (dataflow/BookingDataTransformation.json:156-186,
  * `staged: true`) without a transactional storage dependency.
  *
  * Scale: the pointer file is O(1); versions are plain parquet dirs so
  * writes parallelize across executors; old-version GC is driver-side
  * metadata-only. The merge that FEEDS this sink is the O(table) cost —
  * see [[graft.sink.BucketedFactStore]] for the partial-rewrite layout.
  */
object AtomicParquetSink {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(table: String) = new Path(table, "_current")

  /** Committed version dirs by name — version names embed a
    * zero-padded write timestamp so lexicographic max = newest.
    * "Committed" = data complete (_SUCCESS) AND marked `_COMMITTED`
    * (written after winning the conflict check, before the pointer
    * swap). The marker distinguishes real history from an orphan dir
    * left by a crash between the data write and the conflict check —
    * without it, pointer-loss recovery could serve never-committed
    * data. Dirs written before the marker existed (legacy) count as
    * committed only when NO marked dir exists — known limitation: the
    * first marked commit supersedes pre-marker history for
    * versions()/readAsOf even while those dirs remain on disk. */
  private def completeVersions(f: FileSystem, tableDir: Path): Seq[String] = {
    if (!f.exists(tableDir)) return Seq.empty
    val complete = f.listStatus(tableDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-")
        && f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName).sorted
    val marked = complete
      .filter(v => f.exists(new Path(new Path(tableDir, v), "_COMMITTED")))
    if (marked.nonEmpty) marked else complete
  }

  private def latestCompleteVersion(f: FileSystem, tableDir: Path): Option[String] =
    completeVersions(f, tableDir).lastOption

  /** The `_current` pointer's target version name, if the pointer
    * exists and points at a live dir. */
  private def pointerVersion(f: FileSystem, table: String): Option[String] = {
    val ptr = pointer(table)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      val name = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      if (f.exists(new Path(table, name))) Some(name) else None
    }
  }

  /** Resolve the current version directory, if the table exists. A
    * missing/dangling `_current` (crash inside the delete+rename
    * window) falls back to the newest committed version dir — the
    * table NEVER silently reads as absent while committed data exists
    * (that would make merge callers rebuild from one batch). */
  def currentVersionDir(spark: SparkSession, table: String): Option[String] = {
    val tableDir = new Path(table)
    val f = fs(spark, tableDir)
    pointerVersion(f, table)
      .orElse(latestCompleteVersion(f, tableDir))
      .map(new Path(table, _).toString)
  }

  /** Read the current table state (None if never written). */
  def read(spark: SparkSession, table: String): Option[DataFrame] =
    currentVersionDir(spark, table).map(spark.read.parquet(_))

  /** All complete (committed) version names, oldest → newest. Version
    * names embed the write timestamp, so this IS the table history. */
  def versions(spark: SparkSession, table: String): Seq[String] = {
    val tableDir = new Path(table)
    completeVersions(fs(spark, tableDir), tableDir)
  }

  /** Time travel: read one named immutable snapshot (from
    * [[versions]]). Immutability is what makes this safe to hand to a
    * long-running job while writers keep committing. */
  def readVersion(spark: SparkSession, table: String,
                  version: String): DataFrame =
    spark.read.parquet(new Path(table, version).toString)

  /** Time travel by timestamp: the newest snapshot committed at or
    * before `asOfMillis` (None if the table didn't exist yet). The
    * write millis are parsed straight out of the version name. */
  def readAsOf(spark: SparkSession, table: String,
               asOfMillis: Long): Option[DataFrame] =
    versions(spark, table)
      .filter(v => v.substring(2, 22).toLong <= asOfMillis)
      .lastOption
      .map(readVersion(spark, table, _))

  /** Change-data view between two retained snapshots: which keys were
    * inserted / updated / deleted going `fromVersion` → `toVersion`.
    * Payload equality is a null-safe struct compare of the non-key
    * columns — exact, no hashing. Unchanged keys are dropped.
    *
    * Scale: one full-outer shuffle join on the key — O(both
    * snapshots). At 100 TB, store the table in the bucketed layout
    * ([[BucketedFactStore]]) so the join is co-located, and prune
    * buckets whose file lists are identical across the two versions
    * (immutable version dirs make that a pure metadata check). */
  def diff(spark: SparkSession, table: String, fromVersion: String,
           toVersion: String, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    diffFull(spark, table, fromVersion, toVersion, keyCols)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** [[diff]] with the row payloads kept: `(key…, change, _old, _new)`
    * where `_old`/`_new` are the non-key columns struct-packed —
    * `_old` is null for inserts, `_new` for deletes (Delta CDF's
    * preimage/postimage shape). This is what lets a change-feed
    * consumer REPLAY data without joining back to snapshots that GC
    * may have already deleted. */
  def diffFull(spark: SparkSession, table: String, fromVersion: String,
               toVersion: String, keyCols: Seq[String]): DataFrame =
    diffFrames(readVersion(spark, table, fromVersion),
      readVersion(spark, table, toVersion), keyCols,
      fromVersion, toVersion)

  /** The snapshot-diff CORE over two already-loaded frames — shared
    * with [[BucketedSnapshots.diff]], whose co-located (bucketed)
    * snapshot scans make this very join plan zero Exchange at scale.
    * The plan shape is whatever the inputs' partitioning admits: plain
    * version dirs shuffle both sides; bucketed catalog snapshots
    * shuffle neither. */
  private[sink] def diffFrames(o: DataFrame, n: DataFrame,
                               keyCols: Seq[String],
                               fromLabel: String,
                               toLabel: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // schema drift across the two snapshots would make the payload
    // compare silently blind to added columns (and throw on removed
    // ones mid-plan) — fail loud up front instead
    require(o.columns.toSet == n.columns.toSet,
      s"diff requires identical column sets; $fromLabel has " +
        s"${o.columns.toSeq.sorted} vs $toLabel ${n.columns.toSeq.sorted}")
    val nonKey = o.columns.filterNot(keyCols.contains).toSeq
    val os = o.select(keyCols.map(col) :+
      struct(nonKey.map(col): _*).as("_old"): _*)
    val ns = n.select(keyCols.map(col) :+
      struct(nonKey.map(col): _*).as("_new"): _*)
    os.join(ns, keyCols, "full_outer")
      .withColumn("change",
        when(col("_old").isNull, "insert")
          .when(col("_new").isNull, "delete")
          .when(!(col("_old") <=> col("_new")), "update"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("change"),
        when(col("change") =!= "insert", col("_old")).as("_old"),
        when(col("change") =!= "delete", col("_new")).as("_new")): _*)
  }

  /** RESTORE … TO VERSION: re-commit the contents of a retained
    * historical snapshot as a NEW version — the Delta RESTORE shape.
    * History only moves forward: nothing is rewound or deleted, the
    * bad intermediate versions stay readable under normal retention,
    * and the restore itself is an OCC commit (a writer racing past us
    * conflicts and retries like any other merge). The data copy reads
    * the immutable source dir, so a concurrent GC of the source after
    * the write completes cannot hurt the new version.
    *
    * The retention check runs INSIDE the transform (re-evaluated on
    * every OCC retry), not just up front: a concurrent writer using a
    * tighter retention can GC the source dir between our attempts, and
    * that must surface as a clear "no longer retained" error — not a
    * raw path-not-found from the re-read. */
  def restore(spark: SparkSession, table: String, version: String,
              retainVersions: Int = 4): Unit = {
    def checked(): DataFrame = {
      require(versions(spark, table).contains(version),
        s"$table has no retained version '$version' " +
          s"(have ${versions(spark, table)}) — it may have been GC'd " +
          "by a concurrent writer's retention policy")
      readVersion(spark, table, version)
    }
    checked() // fail fast on a plainly-unknown version before any I/O
    mergeWithRetry(spark, table, _ => checked(), retainVersions)
  }

  /** Change data feed across the retained history — Delta's
    * `table_changes()` on the version-dir sink: the ordered change log
    * `(key…, change, _old, _new, commit_seq, commit_version)` built by
    * [[diffFull]]-ing each ADJACENT pair of retained snapshots. A key
    * that flips twice shows up once per commit, so downstream
    * incremental consumers can replay the exact sequence instead of
    * one collapsed end-to-end diff, and the `_old`/`_new` payload
    * structs (Delta CDF's preimage/postimage) mean replay needs no
    * join back to snapshots GC may have deleted.
    *
    * Commit identity is STABLE across GC: `commit_version` is the
    * newer snapshot's version-dir name and `commit_seq` its embedded
    * write-millis (strictly monotonic by construction — see the name
    * bump in [[commitIf]]). A consumer that checkpoints "last seen
    * commit_seq" keeps working after retention slides, which a
    * positional index into the retained list would break (every GC
    * would renumber later commits) — the same reason Delta keys
    * table_changes on `_commit_version`.
    *
    * Schema evolution: [[diffFull]] requires identical column sets, so
    * the feed covers the longest schema-consistent SUFFIX of retained
    * history — pairs before the most recent schema change are skipped
    * (their keys/payloads aren't comparable), not thrown on.
    *
    * Scale: retention bounds the pair count; each pair is one
    * full-outer join on the key (co-locate via [[BucketedFactStore]]
    * at 100 TB, and skip pairs whose file lists are identical — a pure
    * metadata check on immutable version dirs). */
  /** The longest schema-consistent SUFFIX of retained history (walk
    * newest → oldest while the column set matches the newest
    * snapshot's — metadata-only reads), shared by [[tableChanges]] and
    * [[tableChangesSince]] so the two can never disagree on which
    * pairs are comparable. Requires >= 2 retained versions. */
  private def comparableSuffix(spark: SparkSession,
                               table: String): Seq[String] = {
    val vs = versions(spark, table)
    require(vs.size >= 2,
      s"$table has ${vs.size} retained version(s); need >= 2 for a change feed")
    val colsOf = vs.map(v =>
      v -> readVersion(spark, table, v).columns.toSet).toMap
    val newestCols = colsOf(vs.last)
    vs.reverse.takeWhile(colsOf(_) == newestCols).reverse
  }

  /** One stamped diff per ADJACENT pair of `suffix`. */
  private def pairDiffs(spark: SparkSession, table: String,
                        keyCols: Seq[String],
                        suffix: Seq[String]): Seq[DataFrame] = {
    import org.apache.spark.sql.functions.lit
    suffix.sliding(2).filter(_.size == 2).map { pair =>
      diffFull(spark, table, pair.head, pair.last, keyCols)
        .withColumn("commit_seq", lit(pair.last.substring(2, 22).toLong))
        .withColumn("commit_version", lit(pair.last))
    }.toSeq
  }

  /** Empty frame with the change-feed schema (keys from the newest
    * snapshot) — the caught-up poll result. */
  private def emptyFeed(spark: SparkSession, table: String,
                        keyCols: Seq[String]): DataFrame = {
    val newest = versions(spark, table).last
    pairDiffs(spark, table, keyCols, Seq(newest, newest)).head.limit(0)
  }

  def tableChanges(spark: SparkSession, table: String,
                   keyCols: Seq[String]): DataFrame = {
    val suffix = comparableSuffix(spark, table)
    require(suffix.size >= 2,
      s"$table: schema changed at the latest commit; no comparable " +
        "adjacent pair remains in retained history")
    pairDiffs(spark, table, keyCols, suffix).reduce(_.unionByName(_))
  }

  /** The incremental-consumer read over [[tableChanges]]: only commits
    * STRICTLY AFTER `sinceSeq` (the consumer's checkpointed last-seen
    * `commit_seq`; pass -1 for everything retained). This is the loop
    * the stable commit ids exist for — checkpoint `max(commit_seq)` of
    * what you processed, pass it back next poll, and retention GC
    * between polls cannot skip or replay commits (a positional index
    * would renumber under you). Diffs of at-or-before-`sinceSeq` pairs
    * are pruned BEFORE their joins run, so a caught-up consumer pays
    * only the metadata listing. */
  def tableChangesSince(spark: SparkSession, table: String,
                        keyCols: Seq[String], sinceSeq: Long): DataFrame = {
    val vs = versions(spark, table)
    val suffix = comparableSuffix(spark, table)
    val seqOf = (v: String) => v.substring(2, 22).toLong
    // lag guard: GC removes the OLDEST versions first, so a checkpoint
    // below the oldest retained version's seq means commits between
    // them are gone — a silently-partial feed would make the consumer
    // believe it caught up while missing data. -1 is the explicit
    // "replay everything retained from the oldest snapshot" bootstrap.
    require(sinceSeq == -1L || sinceSeq >= seqOf(vs.head),
      s"$table: retention slid past checkpoint $sinceSeq (oldest " +
        s"retained ${seqOf(vs.head)}); re-bootstrap the consumer from " +
        "a current snapshot")
    // schema guard: every commit the consumer still needs must be
    // expressible as a comparable-pair diff; one stranded beyond a
    // schema change must fail loud, not return silently-empty.
    val wanted = vs.drop(1).map(seqOf).filter(_ > sinceSeq)
    val expressible = suffix.drop(1).map(seqOf).toSet
    val inexpressible = wanted.filterNot(expressible)
    require(inexpressible.isEmpty,
      s"$table: schema changed at commit ${inexpressible.headOption.getOrElse(-1L)} " +
        s"after checkpoint $sinceSeq; the change feed cannot express it — " +
        "re-bootstrap the consumer from a current snapshot")
    val fresh = suffix.sliding(2).filter(_.size == 2)
      .filter(pair => pair.last.substring(2, 22).toLong > sinceSeq)
      .flatMap(pair => pairDiffs(spark, table, keyCols, pair))
      .toSeq
    if (fresh.isEmpty) emptyFeed(spark, table, keyCols)
    else fresh.reduce(_.unionByName(_))
  }

  /** Atomically replace the table contents: write a fresh version dir,
    * rename a pointer tempfile over `_current`, then GC old versions.
    * `retainVersions` is the time-travel retention window: how many
    * newest committed snapshots survive GC (min 2 — the current
    * version plus one grace version for readers that resolved the
    * pointer just before the swap). */
  def overwrite(df: DataFrame, table: String,
                retainVersions: Int = 2): Unit = {
    val committed = commitIf(df, table, expectedCurrent = None,
      retainVersions = retainVersions, checkExpected = false)
    assert(committed, "unconditional commit cannot conflict")
  }

  /** Optimistic-concurrency commit: replace the table contents only if
    * the current version at swap time is still `expectedCurrent` (the
    * version this writer READ before computing `df`). Returns false —
    * and cleans up the orphaned version dir — on conflict, i.e. when
    * another writer committed in between; the caller re-reads and
    * retries (see [[mergeWithRetry]]). This closes the lost-update
    * window of read-merge-write at commit granularity; the residual
    * check-to-swap race is documented as single-swapper (same
    * assumption GC already makes). */
  def commitIf(df: DataFrame, table: String,
               expectedCurrent: Option[String],
               retainVersions: Int = 2,
               checkExpected: Boolean = true): Boolean = {
    val spark = df.sparkSession
    val tableDir = new Path(table)
    val f = fs(spark, tableDir)
    f.mkdirs(tableDir)
    // roll-forward repair: a marked dir NEWER than the pointer target
    // is a commit that crashed between its marker and its pointer swap
    // (it won its conflict check — its contents reflect the then-latest
    // state). Repoint to it so history (versions) and reads (pointer)
    // agree again; leaving it would fork the snapshot lineage.
    for {
      ptr <- pointerVersion(f, table)
      newestMarked <- completeVersions(f, tableDir).lastOption
      if newestMarked > ptr &&
        f.exists(new Path(new Path(tableDir, newestMarked), "_COMMITTED"))
    } swapPointer(f, table, tableDir, newestMarked)
    val old = currentVersionDir(spark, table)
    // timestamped version name: lexicographic max = newest, which is
    // what pointer-loss recovery in currentVersionDir keys on. Two
    // commits inside one millisecond would otherwise tie on the prefix
    // and sort by random uuid — bump past the newest existing prefix so
    // names are strictly monotonic.
    val newestExistingMs = completeVersions(f, tableDir).lastOption
      .map(_.substring(2, 22).toLong).getOrElse(0L)
    val ms = math.max(System.currentTimeMillis(), newestExistingMs + 1)
    val versionName = f"v-$ms%020d-${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(new Path(tableDir, versionName).toString)
    if (checkExpected) {
      // resolve what a READER would see as current, excluding our own
      // just-written (unmarked, so recovery already ignores it) dir:
      // pointer first, else newest committed OTHER dir — a lost
      // pointer must not masquerade as a conflict forever
      val nowCurrent = pointerVersion(f, table)
        .orElse(completeVersions(f, tableDir)
          .filterNot(_ == versionName).lastOption)
      if (nowCurrent != expectedCurrent) {
        f.delete(new Path(tableDir, versionName), true)
        return false
      }
    }
    // commit marker: from here on the dir counts as history even if the
    // pointer swap below is interrupted (the check has been won; the
    // merge result in the dir reflects the latest committed state).
    // Guard against a concurrent GC having removed our dir in the
    // meantime — a bare create would silently RECREATE it empty and we
    // would commit a data-less version. Losing the dir means someone
    // committed past us: report a conflict instead.
    if (!f.exists(new Path(new Path(tableDir, versionName), "_SUCCESS")))
      return false
    f.create(new Path(new Path(tableDir, versionName), "_COMMITTED"), true)
      .close()
    swapPointer(f, table, tableDir, versionName)
    // GC: keep the newest `retainVersions` committed snapshots (>= the
    // current version + one grace for a reader that resolved `_current`
    // just before the swap) plus the just-superseded dir, and delete
    // ONLY dirs sorting strictly below the oldest retained committed
    // version. An in-flight concurrent writer's not-yet-marked dir
    // always sorts ABOVE the newest committed version (monotonic name
    // bump), so GC can never take it out from under its conflict
    // check; crashed writers' orphans age below the floor and get
    // cleaned as new commits land.
    val retained = versions(spark, table)
      .takeRight(math.max(retainVersions, 2)).toSet
    val keep = retained ++
      Set(Some(versionName), old.map(new Path(_).getName)).flatten
    val floor = retained.min
    f.listStatus(tableDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-")
        && s.getPath.getName < floor && !keep.contains(s.getPath.getName))
      .foreach(s => f.delete(s.getPath, true))
    true
  }

  /** Atomic pointer swap: write a tmp file, rename over `_current`.
    * Hadoop rename refuses an existing destination on most FSs, so the
    * common update path is delete+rename. A crash inside that window
    * leaves no `_current`, but version dirs stay intact and readers
    * recover via the newest committed dir — never data loss, never a
    * partial table. */
  private def swapPointer(f: FileSystem, table: String, tableDir: Path,
                          versionName: String): Unit = {
    val tmp = new Path(tableDir, s"_current.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(versionName.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, pointer(table))) {
      f.delete(pointer(table), false)
      if (!f.rename(tmp, pointer(table)))
        throw new java.io.IOException(s"pointer swap failed for $table")
    }
  }

  /** Read-transform-commit with optimistic retry: `transform` maps the
    * current state (None if the table is empty) to the new contents;
    * on commit conflict the state is RE-READ and the transform re-run,
    * so concurrent writers serialize without locks — the multi-writer
    * safe form of every read-merge-write op on this sink. */
  def mergeWithRetry(spark: SparkSession, table: String,
                     transform: Option[DataFrame] => DataFrame,
                     retainVersions: Int = 2, maxAttempts: Int = 5): Unit = {
    var attempt = 0
    var lastFailure: Throwable = null
    while (attempt < maxAttempts) {
      val current = currentVersionDir(spark, table)
        .map(new Path(_).getName)
      val state = current.map(v => readVersion(spark, table, v))
      // transform runs OUTSIDE the retry guard: a deterministic caller
      // error (missing table, bad column expression) must propagate
      // as-is, not burn retries and resurface as a phantom conflict
      val next = transform(state)
      // a concurrent writer's GC can delete our base version while the
      // lazy read job is still in flight — that surfaces as a job
      // failure inside commitIf's write, which is a CONFLICT (the base
      // is gone because someone committed past it), not a caller
      // error: re-read, retry
      val won =
        try commitIf(next, table, current, retainVersions)
        catch {
          case scala.util.control.NonFatal(e) => lastFailure = e; false
        }
      if (won) return
      attempt += 1
    }
    val ex = new java.util.ConcurrentModificationException(
      s"$table: commit conflicted $maxAttempts times")
    if (lastFailure != null) ex.initCause(lastFailure)
    throw ex
  }

  /** Row-level DELETE: drop rows where `cond` is TRUE, committed with
    * conflict detection. SQL DELETE semantics — a NULL predicate keeps
    * the row (naive `filter(!cond)` would drop it: NULL negated is
    * NULL, which filters false). */
  def deleteWhere(spark: SparkSession, table: String, cond: Column,
                  retainVersions: Int = 2): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    mergeWithRetry(spark, table,
      st => st.map(_.filter(not(coalesce(cond, lit(false))))).getOrElse(
        throw new IllegalStateException(s"$table does not exist")),
      retainVersions)
  }

  /** Row-level UPDATE: set `assignments` on rows where `cond` is TRUE,
    * committed with conflict detection. SQL UPDATE's SIMULTANEOUS
    * assignment semantics: every right-hand side reads the ORIGINAL
    * row (`SET a=b, b=a` swaps), independent of Map iteration order. */
  def updateWhere(spark: SparkSession, table: String, cond: Column,
                  assignments: Map[String, Column],
                  retainVersions: Int = 2): Unit = {
    import org.apache.spark.sql.functions.{col, when}
    mergeWithRetry(spark, table,
      st => {
        val cur = st.getOrElse(
          throw new IllegalStateException(s"$table does not exist"))
        // a typo'd assignment key would otherwise silently no-op
        val unknown = assignments.keySet -- cur.columns.toSet
        require(unknown.isEmpty,
          s"updateWhere: no such column(s) $unknown in ${cur.columns.toSeq}")
        cur.select(cur.columns.toSeq.map { c =>
          assignments.get(c)
            .map(v => when(cond, v).otherwise(col(c)).as(c))
            .getOrElse(col(c))
        }: _*)
      },
      retainVersions)
  }
}
