package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join — match points to the intervals
  * containing them WITHOUT the nested-loop plan Spark gives a raw
  * `BETWEEN` join condition.
  *
  * Encoding: pick a bucket width, explode each interval onto every
  * bucket it overlaps (⌈len/width⌉ rows — bounded when intervals are
  * bounded), map each point to its single bucket, equi-join on the
  * bucket id, then apply the exact BETWEEN as a post-join filter. Each
  * (point, interval) pair meets exactly once because the point lives
  * in one bucket. At 100 TB this is a hash-shuffle on the bucket id
  * with per-bucket work bounded by temporal locality — the plan shape
  * Flink/KDB interval joins use — instead of a BroadcastNestedLoopJoin
  * that compares every point with every interval.
  *
  * Bounds are INCLUSIVE on both ends. Timestamps are epoch seconds
  * (longs) so bucketing is integer arithmetic.
  */
object RangeJoin {

  /** @param points    (…, pointTs: epoch-seconds long)
    * @param intervals (…, startTs/endTs: epoch-seconds long); empty or
    *                  negative-length intervals match nothing
    * @param bucketSeconds bucket width; pick ≈ median interval length
    *                  (wider ⇒ fewer interval copies, more residual
    *                  filtering; narrower ⇒ the reverse) */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startTs: String, endTs: String,
                      bucketSeconds: Long): DataFrame = {
    val p = points.withColumn("_rj_bucket",
      floor(col(pointTs) / bucketSeconds).cast("long"))
    val i = intervals
      .filter(col(startTs) <= col(endTs))
      .withColumn("_rj_bucket", explode(sequence(
        floor(col(startTs) / bucketSeconds).cast("long"),
        floor(col(endTs) / bucketSeconds).cast("long"))))
    p.join(i, Seq("_rj_bucket"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("_rj_bucket")
  }
}
