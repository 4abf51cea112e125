package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a native Catalyst aggregate
  * (Flajolet et al. 2007, public), built CROSS-ENGINE DETERMINISTIC:
  * the hash is the shared 60-bit md5 head ([[ShingleHashesUtil]]),
  * the bucket is `h % 64`, the rank is the leading-zero count of the
  * remaining 54 bits (an integer-exact `55 − bitlength`), and the
  * estimator's register sum is carried as an EXACT integer
  * Σ 2^(55−M[j]) (≤ 64·2^55 < 2^62 — no float accumulation, so
  * partial-merge order can never move the estimate). A DuckDB twin
  * reproduces the estimate with `md5`/`bin`/bit-shift SQL.
  *
  * vs [[KmvDistinct]]: KMV state is O(k) longs; HLL state is 64 BYTES
  * regardless of accuracy target — the sketch a 100 TB per-key
  * cardinality rollup ships through its shuffle (billions of groups ×
  * 64 B ≪ billions × k·8 B), and registers merge by elementwise max,
  * so sketches of disjoint corpus shards union for free. Standard
  * bias handling: linear counting below 2.5·m when empty registers
  * remain (the only correction a 60-bit hash space needs — hash
  * collisions are immaterial at any realistic cardinality).
  *
  * As a [[TypedImperativeAggregate]] it participates in partial
  * aggregation: each executor folds its partitions into 64 registers,
  * partials merge associatively, and only 64 bytes per group cross
  * the wire.
  */
case class HllDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllDistinct._

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got $t")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_distinct"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = ShingleHashesUtil.head60Md5(v.asInstanceOf[UTF8String].getBytes)
      val bucket = (h % M).toInt
      val rem = h / M                      // 54 significant bits
      // rank = #leading zeros of the 54-bit remainder + 1
      //      = 55 − bitlength(rem); rem == 0 → the max rank 55
      val rho =
        if (rem == 0L) MaxRank
        else MaxRank - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    // exact-integer register sum: Σ 2^(55 − M[j]); empty register → 2^55
    var isum = 0L
    var zeros = 0
    var i = 0
    while (i < M) {
      isum += 1L << (MaxRank - buffer(i))
      if (buffer(i) == 0) zeros += 1
      i += 1
    }
    // every float op below is spelled IDENTICALLY in the DuckDB twin
    // (same literals, same association) — bit-equal across engines
    val raw = Alpha * 64.0 * 64.0 * TwoPow55 / isum.toDouble
    if (raw <= 2.5 * 64.0 && zeros > 0) 64.0 * math.log(64.0 / zeros)
    else raw
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  // defensive copy: merge() mutates its buffer in place, and the input
  // bytes may be backed by a row buffer the caller still owns
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllDistinct {
  /** Register count (p = 6 bucket bits). */
  val M = 64
  /** Max rank: the 60-bit hash leaves 54 remainder bits → ranks 1..55,
    * with 55 meaning "remainder was all zeros". */
  val MaxRank = 55
  /** 2^55 as a double (exactly representable). */
  val TwoPow55: Double = 36028797018963968.0
  /** Standard HLL bias constant α_64 = 0.7213/(1 + 1.079/m). */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / 64.0)
}
