package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM pretraining: concatenate the corpus in a
  * deterministic document order and cut it into fixed token-budget
  * context windows ("concat-and-split" packing — every bin except the
  * last is full; a doc whose start offset lands in bin b is counted in
  * bin b).
  *
  * The core primitive is a DISTRIBUTED EXCLUSIVE PREFIX SUM over the
  * doc order — the textbook two-pass shape (reference operator model:
  * the gold-layer aggregates in /root/reference/synapse_table_creation
  * .sql:56-88 are the same "global order then aggregate" need, solved
  * there by a single warehouse; at 100 TB a single ORDER BY window
  * would serialize the corpus through one task):
  *
  *  1. range-partition by the order key; per-partition token totals are
  *     one tiny row per partition (driver-side metadata on par with
  *     AQE's stage stats, NOT a data collect);
  *  2. per-partition exclusive running sum (window WITHIN partition)
  *     plus the broadcast offset of all earlier partitions.
  *
  * Every row moves exactly once (the range shuffle); the only global
  * coordination is the P-row totals exchange.
  */
object Packing {

  /** (id, n_tokens, start, bin) for each doc: `start` = exclusive
    * prefix sum of token counts in ascending `idCol` order, `bin` =
    * `start div budget`. */
  def withBins(docs: DataFrame, idCol: String, tokenCountCol: String,
               budget: Long, partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = docs
      .select(col(idCol).cast(LongType).as("id"),
        col(tokenCountCol).cast(LongType).as("n_tokens"))
      .repartitionByRange(p, col("id"))
      .withColumn("_pid", spark_partition_id())
      .persist()
    // pass 1: per-partition totals — one row per partition; collecting
    // P rows to the driver is scheduler-scale metadata, not data
    val totals = ranged.groupBy("_pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, pid) => acc + totals(pid)))
      .toMap
    val offsetCol = pids.foldLeft(lit(0L)) { (acc, pid) =>
      when(col("_pid") === pid, lit(offsets(pid))).otherwise(acc)
    }
    // pass 2: exclusive running sum within each range partition + the
    // broadcast offset of everything before it
    val w = Window.partitionBy("_pid").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // materialize against the SAME pinned partitioning the offsets were
    // measured on (an unpinned re-shuffle could re-range rows and pair
    // them with the wrong offset), then release the intermediate
    val out = ranged
      .withColumn("start",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offsetCol)
      .withColumn("bin", expr("start div " + budget))
      .select(col("id").as(idCol), col("n_tokens"), col("start"), col("bin"))
      .persist()
    out.count()
    ranged.unpersist()
    out
  }

  /** Per-bin packing summary: docs starting in the bin, their token
    * mass, and the first doc id — the manifest a pretraining shard
    * writer consumes. */
  def packBins(docs: DataFrame, idCol: String, tokenCountCol: String,
               budget: Long): DataFrame =
    withBins(docs, idCol, tokenCountCol, budget)
      .groupBy(col("bin").as("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col(idCol)).as("first_doc"))
}
