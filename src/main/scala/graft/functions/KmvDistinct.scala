package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the deterministic alternative to HLL for cross-engine
  * verification: the sketch state is the k smallest DISTINCT 60-bit
  * md5 hashes of the values, the estimate is exact count when fewer
  * than k distinct hashes were seen and `(k-1)·2^60 / h_k` otherwise
  * (Bar-Yossef et al. 2002, public). Same hash as the shingle kernel
  * (first 15 md5 nibbles), so a DuckDB twin reproduces the estimate
  * bit-for-bit with a window over sorted hashes.
  *
  * As a [[TypedImperativeAggregate]] it participates in partial
  * aggregation: each executor folds its partition into a k-bounded
  * sorted set, partials merge associatively, and only O(k) longs per
  * group cross the wire — the 100 TB distinct-count plan (an exact
  * `COUNT(DISTINCT)` shuffles every distinct value).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if k >= 2 => TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 2, got $k")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got $t")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_distinct"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def insert(set: java.util.TreeSet[Long], h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (h < set.last) { if (set.add(h)) { set.pollLast(); () } }

  override def update(buffer: java.util.TreeSet[Long],
                      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      insert(buffer, ShingleHashesUtil.head60Md5(
        v.asInstanceOf[UTF8String].getBytes))
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[Long],
                     other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[Long]): Any =
    if (buffer.size < k) buffer.size.toDouble
    else ((k - 1).toDouble * KmvDistinct.HashSpace) / buffer.last.toDouble

  override def serialize(buffer: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** 2^60 as a double — the hash space size in the estimator. */
  val HashSpace: Double = 1152921504606846976.0
}
