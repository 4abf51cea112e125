package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (AS-OF) left join — for each left row, the single
  * right row with the greatest timestamp ≤ the left row's timestamp
  * within the same key (inclusive, like DuckDB/kdb ASOF JOIN). The
  * reference's lookup (SURVEY.md T3) is the degenerate "as of now"
  * case; the general operator is what a feature-store or
  * slowly-changing-dim probe needs.
  *
  * Spark has no ASOF join; the naive encodings explode or skew:
  * a range-condition join plans as BroadcastNestedLoop (all-pairs per
  * key), and "join then keep max ts" shuffles |L|×|matching R| rows.
  * This implementation is the scale-safe UNION-WINDOW form: tag both
  * sides, union, one hash-shuffle on the key, sort each key's rows by
  * (ts, side) with right rows first on ties, and carry the latest
  * right payload forward with `last(_, ignoreNulls)` over the running
  * window. Cost is one shuffle + one sort of |L|+|R| — the same plan
  * shape as a window dedupe, independent of match multiplicity.
  *
  * `right` must be unique per (key, ts) — pre-dedupe with
  * [[CdcOps.latestPerKey]] otherwise (ties would be arbitrary).
  */
object AsofJoin {

  /** @param rightPayload right-side columns to carry (renamed as
    *                     given); every other right column is dropped */
  def asofLeft(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Map[String, String]): DataFrame = {
    val payloadStruct = struct(rightPayload.toSeq.sortBy(_._1).map {
      case (from, to) => col(from).as(to)
    }: _*)
    val leftCols = left.columns
    val l = left.withColumn("_asof_side", lit(1))
      .withColumn("_asof_payload", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val r = right.select(col(key), col(ts),
        payloadStruct.as("_asof_payload"))
      .withColumn("_asof_side", lit(0))
    // right rows sort before left rows on equal ts => inclusive match
    val unioned = l.select(
        (col(key) +: col(ts) +: col("_asof_side") +: col("_asof_payload")
          +: leftCols.filterNot(c => c == key || c == ts).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true)
        .over(w))
      .filter(col("_asof_side") === 1)
    rightPayload.values.toSeq.sorted.foldLeft(
      matched.select((leftCols.map(col) :+ col("_asof_match")): _*)
    ) { (df, p) => df.withColumn(p, col(s"_asof_match.$p")) }
      .drop("_asof_match")
  }
}
