package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, TimestampType}

/** Helpers that keep Spark results hash-identical to the DuckDB oracle.
  *
  * Two cross-engine hazards (see SURVEY.md §7 "risk list"):
  *  1. `events.ts` is nanosecond parquet. Spark truncates to microseconds
  *     on read; DuckDB keeps TIMESTAMP_NS — raw values would never hash
  *     equal. All emitted event timestamps are therefore formatted to
  *     second precision on BOTH sides.
  *  2. SUM over DOUBLE is order-dependent in the last ulp and Spark/DuckDB
  *     aggregate in different orders. Money sums are routed through
  *     DECIMAL(18,2) (exact, associative) and cast back to DOUBLE so both
  *     engines produce bit-identical results.
  */
object Oracle {
  /** Format a timestamp to whole-second precision (matches DuckDB
    * `strftime(x, '%Y-%m-%d %H:%M:%S')`). */
  def fmtTs(c: Column): Column =
    date_format(c.cast(TimestampType), "yyyy-MM-dd HH:mm:ss")

  /** Exact, order-independent sum of a 2-dp monetary double.
    * DuckDB twin: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Hazard 3: `round(x, dp)` itself diverges across engines when x
    * lands on a decimal half-point — Spark rounds the SHORTEST DECIMAL
    * REPR of the double (BigDecimal.valueOf → HALF_UP: "-1.009375" →
    * -1.00938) while DuckDB rounds the BINARY value (-1.0093749999… →
    * -1.00937). Sums/averages almost never hit halves, but small-
    * rational arithmetic (k/4, k/128, rank/n) hits them constantly —
    * found by the sf0.1 self-check on q63/q75. This form uses only
    * IEEE ops (multiply, add, floor, divide) that both engines execute
    * bit-identically on identical inputs, so the result is the SAME
    * double everywhere, half-points included.
    * DuckDB twin: `floor(x * 1e<dp> + 0.5) / 1e<dp>`. */
  def stableRound(c: Column, dp: Int): Column = {
    val scale = math.pow(10.0, dp)
    floor(c * lit(scale) + lit(0.5)).cast(DoubleType) / lit(scale)
  }
}
