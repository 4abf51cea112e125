package graft.text

import org.apache.spark.sql.DataFrame

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
  *  2. per-partition exclusive running scan (an imperative
  *     mapPartitions accumulator over the order the range shuffle
  *     already established — a window on the partition id would
  *     re-shuffle the corpus onto the partitioning it is already in)
  *     plus the offset of all earlier partitions.
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
      .sortWithinPartitions("id")
      .withColumn("_pid", spark_partition_id())
      .persist()
    // pass 1: per-partition totals — one row per partition; collecting
    // P rows to the driver is scheduler-scale metadata, not data
    val totals = ranged.groupBy("_pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, pid) => acc + totals(pid)))
      .toMap
    // pass 2: per-partition running scan. The rows already SIT in their
    // range partition in sorted order — a window on _pid would re-hash-
    // shuffle the whole corpus onto the partitioning it is already in,
    // so this is the textbook legitimate mapPartitions: imperative
    // prefix accumulation over an order the shuffle already established.
    val b = budget
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val enc: Encoder[(Long, Long, Long, Long)] =
      Encoders.product[(Long, Long, Long, Long)]
    val out = ranged.select(col("id"), col("n_tokens"), col("_pid"))
      .as[(Long, Long, Int)](Encoders.product[(Long, Long, Int)])
      .mapPartitions { it =>
        var acc = Long.MinValue
        it.map { case (id, n, pid) =>
          if (acc == Long.MinValue) acc = offsets(pid)
          val start = acc
          acc += n
          (id, n, start, start / b) // non-negative: / == floor div
        }
      }
      // materialize against the SAME pinned partitioning the offsets
      // were measured on (an unpinned re-shuffle could re-range rows
      // and pair them with the wrong offset), then release
      .toDF(idCol, "n_tokens", "start", "bin")
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

  /** Per-bin ATTENTION-BOUNDARY manifest: each bin's doc start
    * offsets (CSV, doc order) — what a pretraining shard writer needs
    * to emit the block-diagonal attention mask that stops cross-doc
    * attention inside a packed context. Same distributed prefix sum
    * as [[packBins]]; the boundary list is per-bin metadata (a few
    * dozen ints), never row data. */
  def packBoundaries(docs: DataFrame, idCol: String,
                     tokenCountCol: String, budget: Long): DataFrame =
    withBins(docs, idCol, tokenCountCol, budget)
      .withColumn("off", col("start") - col("bin") * budget)
      .groupBy(col("bin").as("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col("off")))),
          x => x("off").cast("string")), ",").as("boundaries"))
}
