package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Grouped top-k as a native mergeable aggregate — the scale-path
  * alternative to the rank-window form of per-group top-k.
  *
  * The window form (q61) shuffles every row of a group to one
  * partition and SORTS it (WindowGroupLimit caps the row count but a
  * per-group sort remains). This aggregate keeps a k-bounded ordered
  * set per group — (score DESC, id ASC), exactly the library-standard
  * deterministic ranking — and participates in partial aggregation:
  * each map task folds its slice into k pairs per group, partials
  * merge associatively, and only O(k) pairs per (task, group) cross
  * the wire. No sort operator anywhere in the plan; a hot group costs
  * O(n log k) map-side instead of a single-partition sort.
  *
  * Null scores/ids are ignored (SQL aggregate convention). Returns
  * the best-first array of (id, score) structs; rank = array position
  * + 1 at the call site (posexplode).
  */
case class GroupedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1, got $k")
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double score, bigint id), got ($s, $i)")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(score, id)

  private def ord = GroupedTopK.BestFirst

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def insert(set: java.util.TreeSet[(Double, Long)],
                     p: (Double, Long)): Unit =
    if (set.size < k) { set.add(p); () }
    else if (ord.compare(p, set.last) < 0) {
      if (set.add(p)) { set.pollLast(); () }
    }

  override def update(buffer: java.util.TreeSet[(Double, Long)],
                      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      insert(buffer, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[(Double, Long)],
                     other: java.util.TreeSet[(Double, Long)])
      : java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[(Double, Long)]): Any = {
    val rows = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id0) = it.next()
      rows(i) = InternalRow(id0, s)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = createAggregationBuffer()
    var i = 0
    while (i < n) { set.add((bb.getDouble, bb.getLong)); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GroupedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren.head, id = newChildren(1))
}

object GroupedTopK {
  /** Best-first total order (score DESC, id ASC). A named serializable
    * object: the expression ships to executors inside the physical
    * plan, and an anonymous comparator would fail task serialization. */
  object BestFirst extends java.util.Comparator[(Double, Long)]
      with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}
