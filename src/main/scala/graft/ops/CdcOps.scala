package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference dataflow's transform operators, re-expressed Spark-first.
  * Reference: /root/reference/dataflow/BookingDataTransformation.json
  * (scriptLines 54-187); operator inventory SURVEY.md §2 T1-T5, K1-K2.
  *
  * All of these are declarative DataFrame compositions — Catalyst handles
  * predicate pushdown / pruning / join strategy; none need custom plans.
  */
object CdcOps {

  /** T1 — conditional split (data-quality gate), dataflow:96-97.
    * Returns (accepted, rejected); the two branches are disjoint and
    * exhaustive. Rows where the predicate is true are REJECTED (the
    * reference routes `check_out_date < check_in_date` to BadRecords).
    * Null predicate results follow the reference's ADF semantics: a null
    * comparison is not-true, so the row lands in the accepted branch.
    */
  def qualitySplit(df: DataFrame, badIf: Column): (DataFrame, DataFrame) = {
    val bad = df.filter(coalesce(badIf, lit(false)))
    val ok  = df.filter(!coalesce(badIf, lit(false)))
    (ok, bad)
  }

  /** T3 — latest-version-wins dedupe, dataflow:116-118
    * (`multiple:false, pickup:'first', desc(timestamp)`).
    * Window top-1 per key ordered by the event-time column descending,
    * with caller-supplied deterministic tiebreakers (the reference's
    * `desc(timestamp)` alone is nondeterministic on equal timestamps —
    * SURVEY.md §7 risk list).
    *
    * Scale: one hash-partition shuffle on `keys`; the window is computed
    * per-partition with no global sort. At 100 TB this is the canonical
    * "dedupe CDC log" shape — partition count rides
    * spark.sql.shuffle.partitions / AQE.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
  }

  /** Skew-safe variant of [[latestPerKey]] for hot keys (the "celebrity
    * key" problem: one key with 10⁸ change rows serializes a single
    * window partition at 100 TB). Two phases:
    *   1. salt each row by a hash of its ORDER columns into
    *      `saltBuckets` sub-partitions, take the top-1 per (key, salt)
    *      — the hot key's rows spread over `saltBuckets` parallel
    *      window partitions;
    *   2. take the top-1 per key over the ≤saltBuckets survivors.
    * Identical result to [[latestPerKey]] whenever `orderDesc` is a
    * total order per key (tiebreakers included), because max-by is
    * associative over any partition of the rows. Costs one extra
    * (tiny) shuffle; use when key skew is known or AQE flags it.
    */
  def latestPerKeySkewSafe(df: DataFrame, keys: Seq[String],
                           orderDesc: Seq[Column],
                           saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_graft_salt",
      pmod(hash(orderDesc: _*), lit(saltBuckets)))
    val phase1 = latestPerKey(salted, keys :+ "_graft_salt", orderDesc)
    latestPerKey(phase1, keys, orderDesc).drop("_graft_salt")
  }

  /** T4 — alter-row insert/update routing, dataflow:120-121.
    * Tags each incoming row by whether its key already exists in the
    * current sink state (null lookup key => insert, else update).
    * `existingKeys` should be the *deduplicated* key projection of the
    * sink table (S2 lookup source, dataflow:73-95).
    */
  def alterRow(incoming: DataFrame, existingKeys: DataFrame, key: String): DataFrame = {
    val ex = existingKeys.select(col(key)).distinct()
      .withColumn("_graft_matched", lit(1))
    incoming.join(ex, Seq(key), "left_outer")
      .withColumn("op", when(col("_graft_matched").isNull, lit("insert"))
        .otherwise(lit("update")))
      .drop("_graft_matched")
  }

  /** K1/K2 — keyed upsert (MERGE) as a relational expression:
    * new state = incoming ∪ (existing ⟕anti incoming on keys).
    * Incoming rows win on key collision (last-writer-wins when `incoming`
    * is already deduped via [[latestPerKey]]). Idempotent: applying the
    * same batch twice yields the same table — this is the exactly-once
    * guarantee the reference claims via checkpoint replay (README.md:135)
    * rebuilt without Delta (no delta jar in this env, SURVEY.md §1.1).
    *
    * Scale: the anti-join shuffles both sides on `keys` once; with AQE it
    * broadcasts the incoming batch when small (the usual CDC case: batch
    * ≪ table), making the merge a broadcast-anti-join + union, no
    * full-table shuffle.
    */
  def mergeUpsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = existing.columns
    existing.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(incoming.selectExpr(cols: _*))
  }

  /** K1 streaming variant — VERSION-AWARE keyed merge: the surviving row
    * per key is the max by `orderDesc` across existing ∪ incoming, not
    * simply the incoming one. Properties the plain [[mergeUpsert]]
    * lacks, all load-bearing for the streaming path (O3):
    *  - micro-batch-boundary independence: N-batch fold ≡ 1-batch fold
    *    for ANY split of the change log (no "later batch with older row
    *    wins" anomaly) — so the end state has a pure batch oracle;
    *  - out-of-order tolerance: late data can never regress a key;
    *  - replay idempotence: re-merging an already-applied batch is a
    *    no-op (the exactly-once-equivalent guarantee under checkpoint
    *    replay, README.md:135).
    *
    * Scale: one hash shuffle on `keys` over existing ∪ incoming. With
    * AQE the small incoming side broadcasts into... no — a window needs
    * co-partitioning, so this is a full-table shuffle per batch; pair it
    * with [[graft.sink.BucketedFactStore]]-style bucketing so only
    * touched buckets pay it.
    */
  def mergeUpsertVersioned(existing: DataFrame, incoming: DataFrame,
                           keys: Seq[String], orderDesc: Seq[Column]): DataFrame = {
    val cols = existing.columns
    latestPerKey(existing.unionByName(incoming.selectExpr(cols: _*)),
      keys, orderDesc)
  }

  /** [[mergeUpsertVersioned]] under SCHEMA DRIFT — the reference sets
    * `allowSchemaDrift: true, validateSchema: false` on every dataflow
    * source and sink (dataflow/BookingDataTransformation.json:68-69,
    * 91-92, 156-157), so a feed that grows a column must not break the
    * merge. Columns are aligned by NAME with `allowMissingColumns`:
    * a column present on one side only reads as null on the other, the
    * merged table's schema is the union, and per-key versioning is
    * unchanged. Dropping a column never loses data already stored —
    * old rows keep their values; only new rows carry nulls. */
  def mergeUpsertVersionedEvolving(existing: DataFrame, incoming: DataFrame,
                                   keys: Seq[String],
                                   orderDesc: Seq[Column]): DataFrame =
    latestPerKey(existing.unionByName(incoming, allowMissingColumns = true),
      keys, orderDesc)

  /** O2/K2 — SCD Type 1 sequential multi-file fold
    * (pipeline/LoadCustomerDim.json:34-51, `isSequential: true`): apply
    * file batches in order; a later file's row overwrites an earlier one
    * for the same key. Expressed as a single latest-wins window over
    * (fileSeq, intra-file order) rather than a driver-side loop — same
    * result, one shuffle instead of N merges.
    */
  def scd1Fold(filesInOrder: Seq[DataFrame], key: String, intraFileOrder: Seq[Column]): DataFrame = {
    val tagged = filesInOrder.zipWithIndex.map { case (f, i) =>
      f.withColumn("_graft_file_seq", lit(i))
    }.reduce(_ unionByName _)
    latestPerKey(tagged, Seq(key), col("_graft_file_seq") +: intraFileOrder)
      .drop("_graft_file_seq")
  }
}
