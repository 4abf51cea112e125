package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history builder — the versioned
  * extension of the reference's SCD1 upsert surface
  * (pipeline/LoadCustomerDim.json's copy-with-upsert keeps only the
  * latest row per key; SCD2 keeps every attribute run with its
  * validity interval). Standard warehouse-dimension shape: one row per
  * (key, run of equal tracked-attribute values) with [valid_from,
  * valid_to) bounds and an is_current flag on the open run.
  *
  * Two complementary builders:
  *  - [[history]]: compress a FULL ordered change feed in one pass
  *    (the backfill / from-scratch form);
  *  - [[init]]/[[foldBatch]]: maintain the history INCREMENTALLY from
  *    op-tagged CDC batches (the steady-state form — per batch it
  *    joins only the CURRENT slice, never touches closed rows, and
  *    supports deletes and the no-change-no-version rule).
  */
object Scd2 {

  /** Compress an ordered change feed into SCD2 version rows.
    *
    * Two window passes over the SAME (key, order) spec — change
    * detection (`lag` ≠ current ⇒ a run opens) on the full feed, then
    * version numbering + `lead` validity bounds on the surviving run
    * openers. Spark plans both as Window nodes over one hash
    * partitioning on `key`: the filter between them preserves the
    * partitioning (AQE reuses the exchange), so the whole build is a
    * single shuffle regardless of feed size. No global sort, no
    * driver-side state: at 100 TB this scales exactly like the q06
    * latest-per-key dedupe, and a hot key can reuse the same salting
    * strategy (CdcOps.latestPerKeySkewSafe) for the detection pass.
    *
    * @param feed    change feed, one row per observed state
    * @param key     dimension business key column name
    * @param attr    tracked attribute column name (run boundary =
    *                null-safe inequality with the previous row)
    * @param order   total per-key order (MUST include a unique
    *                tiebreaker — same rule as every window in this
    *                library)
    * @param tsOut   name of the pre-formatted event-time column used
    *                for the validity bounds
    */
  def history(feed: DataFrame, key: String, attr: String,
              order: Seq[Column], tsOut: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val openMark = lit("9999-12-31 00:00:00")
    feed
      .withColumn("prev_attr", lag(col(attr), 1).over(w))
      .withColumn("rn", row_number().over(w))
      // rn = 1 keeps the first observed state unconditionally: for the
      // leading row lag() is NULL, and when the attr itself is NULL the
      // null-safe inequality would otherwise drop the run opener — a key
      // whose initial state has a NULL attr would get no version row
      // until the attr changed.
      .filter(col("rn") === 1 || !(col("prev_attr") <=> col(attr)))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("next_from", lead(col(tsOut), 1).over(w))
      .select(col(key), col("version"), col(attr),
        col(tsOut).as("valid_from"),
        coalesce(col("next_from"), openMark).as("valid_to"),
        col("next_from").isNull.as("is_current"))
  }

  // ---- incremental CDC fold -----------------------------------------

  /** Bootstrap an incremental history from an initial batch (every
    * row opens a current version at `ts`). Schema:
    * `key…, attr…, valid_from, valid_to (null = open), is_current`. */
  def init(batch: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
           ts: String): DataFrame =
    batch.select((keyCols ++ attrCols).map(col): _*)
      .withColumn("valid_from", lit(ts))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))

  /** Fold one op-tagged CDC batch at effective time `ts` into an
    * incremental history (the [[init]] schema).
    *
    * Fold semantics per batch row (latest-per-key, one row per key —
    * the repo-wide CDC batch contract; tags advisory, key presence
    * decides, as everywhere else in this engine):
    *   - key unseen, op I/U      → open a new current version
    *   - key current, attrs SAME → no-op (a no-change row must NOT
    *                               cut a version — the classic SCD2
    *                               bug)
    *   - key current, attrs diff → close the current version at `ts`,
    *                               open a new one at it
    *   - op D, key current       → close without opening (the key has
    *                               no current version until re-insert)
    *   - op D, key absent        → no-op
    * Batch timestamps must not precede the affected keys' open
    * `valid_from` (checked loud): late-arriving history would need
    * interval splitting, which no warehouse SCD2 fold does silently.
    *
    * Plan shape: ONE full-outer join of the CURRENT slice against the
    * batch on the key — closed (non-current) history rows ride along
    * untouched via union, never joined, never shuffled. At 100 TB the
    * current slice is dimension-sized (the reference's customer dim);
    * store the history through [[graft.sink.AtomicParquetSink]] for
    * atomic swaps, or key [[graft.sink.DeletionVectors.upsertMoR]] on
    * (key, valid_from) to avoid rewriting closed history at all.
    * LAZY and stateless: the caller persists the fold result between
    * batches (to disk — exactly as the reference's per-file
    * sequential loop does), which also keeps repeated folds from
    * nesting plans. */
  def foldBatch(history: DataFrame, batch: DataFrame,
                keyCols: Seq[String], attrCols: Seq[String],
                ts: String, opCol: String): DataFrame = {
    val b = batch.select(
      keyCols.map(col) ++
        attrCols.map(a => col(a).as(s"_b_$a")) :+
        col(opCol).as("_b_op"): _*)

    // contract: unique per key, known ops, no monotonicity violation
    // against the OPEN versions — ONE aggregation job (struct-wrapped
    // count_distinct so a null key still counts as a group, exactly
    // like the distinct().count() it replaces)
    val stats = batch.agg(
      count(lit(1)),
      count_distinct(struct(keyCols.map(col): _*)),
      count(when(coalesce(
        !col(opCol).isin("I", "U", "D"), lit(true)), 1))).head()
    require(stats.getLong(0) == stats.getLong(1),
      s"scd2 foldBatch: batch is not unique on ${keyCols.mkString(",")}")
    require(stats.getLong(2) == 0,
      s"scd2 foldBatch: batch carries unknown $opCol ops")

    val cur = history.filter(col("is_current"))
    val closedHist = history.filter(!col("is_current"))

    val j = cur.join(b, keyCols, "full_outer")

    val late = j.filter(col("_b_op").isNotNull &&
      col("valid_from").isNotNull && col("valid_from") > lit(ts)).count()
    require(late == 0,
      s"scd2 foldBatch: $late key(s) have an open version newer than " +
        s"$ts — late-arriving history needs interval splitting, not a fold")

    val inBatch = col("_b_op").isNotNull
    val hasCur = col("valid_from").isNotNull
    val sameAttrs: Column = attrCols
      .map(a => col(a) <=> col(s"_b_$a")).reduce(_ && _)

    val outCols = (keyCols ++ attrCols).map(col) ++
      Seq(col("valid_from"), col("valid_to"), col("is_current"))

    // untouched current rows: key absent from batch, or a no-change
    // I/U row (must not cut a version)
    val kept = j.filter(hasCur && (!inBatch ||
        (col("_b_op") =!= "D" && sameAttrs)))
      .select(outCols: _*)
    // closed versions: current rows whose key is deleted or re-valued
    val closed = j.filter(hasCur && inBatch &&
        (col("_b_op") === "D" || !sameAttrs))
      .select((keyCols ++ attrCols).map(col) ++ Seq(
        col("valid_from"), lit(ts).as("valid_to"),
        lit(false).as("is_current")): _*)
    // opened versions: fresh values for new or re-valued keys
    val opened = j.filter(inBatch && col("_b_op") =!= "D" &&
        (!hasCur || !sameAttrs))
      .select(keyCols.map(col) ++
        attrCols.map(a => col(s"_b_$a").as(a)) ++ Seq(
          lit(ts).as("valid_from"),
          lit(null).cast("string").as("valid_to"),
          lit(true).as("is_current")): _*)

    closedHist.select(outCols: _*)
      .unionByName(kept).unionByName(closed).unionByName(opened)
  }

  /** MERGE-ON-READ SCD2 fold — [[foldBatch]]'s semantics on a
    * [[graft.sink.DeletionVectors]]-managed history directory,
    * without ever rewriting closed history: closing a version is a
    * keyed MoR UPDATE of the affected keys' OPEN rows
    * ([[graft.sink.DeletionVectors.updateByKeyDf]] — bloom-pruned
    * locate, tombstone + closed image append), opening is a plain
    * append. Per batch the cost is O(batch + matched files) at ANY
    * history size — the copy-on-write [[foldBatch]] rewrites the
    * whole history per batch, which at a 100 TB fact-sized history
    * (fine-grained SCD2 on event-level attributes) is the same
    * wall-of-I/O the MoR fact path exists to avoid. Read the history
    * through [[graft.sink.DeletionVectors.read]].
    *
    * REDELIVERY-idempotent without a fence: every step routes on the
    * CURRENT visible state (a replayed close finds its versions
    * already closed → no-op; a replayed open finds an identical
    * current version → the no-change rule suppresses it), so a
    * complete batch applied twice is a structural no-op
    * (spec-diffed). One honest crash window remains, inherited from
    * [[graft.sink.DeletionVectors.updateByKeyDf]]: a crash INSIDE
    * the keyed close — after its tombstone generation commits but
    * before the closed images append — leaves the affected keys with
    * no visible version; the replay then routes them as NEW keys and
    * opens fresh versions, so the closed interval row is lost (the
    * key's CURRENT state still converges; its history row doesn't).
    * The copy-on-write [[foldBatch]] over [[graft.sink
    * .AtomicParquetSink]] is the zero-window alternative; a
    * deployment that needs both MoR economics and zero windows puts
    * the whole directory behind the atomic sink's version swap.
    * Keep the history's `_bloom_<keyCol>` sidecar fresh (the fold
    * refreshes an existing one at O(batch)) and both the
    * close-locate and the pre-image join prune to may-contain
    * files. */
  def foldBatchMoR(spark: org.apache.spark.sql.SparkSession, dir: String,
                   batch: DataFrame, keyCol: String,
                   attrCols: Seq[String], ts: String,
                   opCol: String): Unit = {
    import graft.sink.{BloomSkipIndex, DeletionVectors}
    val b = batch.select(
      col(keyCol) +:
        attrCols.map(a => col(a).as(s"_b_$a")) :+
        col(opCol).as("_b_op"): _*)
    // one aggregation job (struct wrap: null keys still form a group)
    val stats = batch.agg(
      count(lit(1)),
      count_distinct(struct(col(keyCol))),
      count(when(coalesce(
        !col(opCol).isin("I", "U", "D"), lit(true)), 1))).head()
    require(stats.getLong(0) == stats.getLong(1),
      s"scd2 foldBatchMoR: batch is not unique on $keyCol")
    require(stats.getLong(2) == 0,
      s"scd2 foldBatchMoR: batch carries unknown $opCol ops")

    // the batch keys' CURRENT versions — bloom-pruned when indexed
    val cur = DeletionVectors.visibleByKeyDf(spark, dir, keyCol, b)
      .filter(col("is_current"))
      .select(col(keyCol) +:
        attrCols.map(a => col(a).as(s"_c_$a")) :+
        col("valid_from").as("_c_from"): _*)
    val j = b.join(cur, Seq(keyCol), "left_outer").persist()
    try {
      val late = j.filter(col("_c_from").isNotNull &&
        col("_c_from") > lit(ts)).count()
      require(late == 0,
        s"scd2 foldBatchMoR: $late key(s) have an open version newer " +
          s"than $ts — late-arriving history needs interval splitting")
      val hasCur = col("_c_from").isNotNull
      val sameAttrs: Column = attrCols
        .map(a => col(s"_c_$a") <=> col(s"_b_$a")).reduce(_ && _)
      // keys whose open version must close: deleted or re-valued
      val toClose = j.filter(hasCur &&
        (col("_b_op") === "D" || !sameAttrs)).select(col(keyCol))
      // fresh open versions: new keys or re-valued keys (not deletes).
      // PINNED (persist+count) BEFORE the close mutates the directory
      // — its plan reads the pre-state through `j`, and a
      // post-mutation recompute would route against the wrong world
      val opened = j.filter(col("_b_op") =!= "D" &&
          (!hasCur || !sameAttrs))
        .select(col(keyCol) +:
          attrCols.map(a => col(s"_b_$a").as(a)) :+
          lit(ts).as("valid_from") :+
          lit(null).cast("string").as("valid_to") :+
          lit(true).as("is_current"): _*)
        .persist()
      try {
        val nOpened = opened.count()
        DeletionVectors.updateByKeyDf(spark, dir, keyCol, toClose,
          col("is_current"),
          Map("valid_to" -> lit(ts), "is_current" -> lit(false)))
        // optimized write: file count sized from the known row count
        DeletionVectors.appendSized(opened, nOpened, dir)
      } finally opened.unpersist()
      // keep an existing key index fresh across our own writes
      BloomSkipIndex.foldAllBloomSidecars(spark, dir)
    } finally j.unpersist()
  }
}
