package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch state — the gap in the engine's sketch
  * family (KMV distinct, HLL, CMS heavy hitters: all mergeable, none
  * ranks): a KLL/MRL-style compactor ladder (Karnin-Lang-Liberty
  * 2016; Manku et al. 1998 — both public). Level `i` holds items of
  * weight 2^i; when a level fills past `k`, it sorts and promotes
  * every other element (alternating offset — deterministic, so the
  * same buffer contents always compact identically) to level `i+1`.
  * Rank error is O(log(n/k)/k) of n for any update/merge order, so a
  * million-row group's p99 rides in a few KB of state.
  *
  * Unlike Spark's own `approx_percentile`, the STATE here is the
  * value ([[KllSketch]] evals to the serialized bytes): sketches
  * persist, union across tables, and fold across streaming
  * micro-batches like the KMV/HLL sketches do; estimates come off the
  * stored bytes via [[KllQuantile]] at any later time. */
object Kll {

  /** Compactor ladder. Levels grow as needed; weight of level i = 2^i. */
  final class Buf(val k: Int) {
    var n: Long = 0L
    var flip: Boolean = false
    val levels = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Double])

    def insert(v: Double): Unit = {
      levels(0) += v
      n += 1
      compress()
    }

    def compress(): Unit = {
      var i = 0
      while (i < levels.size) {
        if (levels(i).size >= k) {
          val sorted = levels(i).sortInPlace()
          // compact an EVEN count: promoting m/2 items at doubled
          // weight covers exactly m, so total weight stays exactly n
          // (an odd size sets its minimum aside in the level)
          val keepOdd = sorted.size % 2 == 1
          val start = if (keepOdd) 1 else 0
          val off = if (flip) 1 else 0
          flip = !flip
          if (i + 1 == levels.size)
            levels += scala.collection.mutable.ArrayBuffer.empty[Double]
          val up = levels(i + 1)
          var j = start + off
          while (j < sorted.size) { up += sorted(j); j += 2 }
          // the non-promoted half is the compaction's rank slack
          val kept = scala.collection.mutable.ArrayBuffer.empty[Double]
          if (keepOdd) kept += sorted(0)
          levels(i) = kept
        }
        i += 1
      }
    }

    def mergeIn(other: Buf): Unit = {
      n += other.n
      while (levels.size < other.levels.size)
        levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < other.levels.size) {
        levels(i) ++= other.levels(i)
        i += 1
      }
      compress()
    }

    /** Smallest value whose estimated cumulative weight reaches
      * `p * n` (lower quantile). */
    def quantile(p: Double): Double = {
      if (n == 0) return Double.NaN
      val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.size) {
        val w = 1L << i
        levels(i).foreach(v => items += ((v, w)))
        i += 1
      }
      val sorted = items.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      val target = math.max(1L, math.ceil(p * total).toLong)
      var cum = 0L
      var j = 0
      while (j < sorted.size) {
        cum += sorted(j)._2
        if (cum >= target) return sorted(j)._1
        j += 1
      }
      sorted.last._1
    }

    def serialize(): Array[Byte] = {
      val sizes = levels.map(_.size)
      val bb = ByteBuffer.allocate(4 + 8 + 1 + 4 +
        sizes.size * 4 + sizes.sum * 8)
      bb.putInt(k); bb.putLong(n)
      bb.put(if (flip) 1.toByte else 0.toByte)
      bb.putInt(levels.size)
      levels.foreach { l => bb.putInt(l.size) }
      levels.foreach(_.foreach(bb.putDouble))
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Buf(bb.getInt)
    b.n = bb.getLong
    b.flip = bb.get() == 1
    val nLevels = bb.getInt
    val sizes = Array.fill(nLevels)(bb.getInt)
    while (b.levels.size < nLevels)
      b.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < nLevels) {
      var j = 0
      while (j < sizes(i)) { b.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    b
  }
}

/** `graft_kll(value, k)` → binary sketch state. Partial-aggregating:
  * executors fold partitions locally, O(k · log(n/k)) doubles per
  * group cross the wire — the 100 TB quantile plan (an exact
  * percentile shuffles or sorts every value). */
case class KllSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Buf] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType if k >= 8 => TypeCheckResult.TypeCheckSuccess
      case DoubleType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 8, got $k")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double column, got $t")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Kll.Buf = new Kll.Buf(k)

  override def update(buffer: Kll.Buf, input: InternalRow): Kll.Buf = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: Kll.Buf, other: Kll.Buf): Kll.Buf = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: Kll.Buf): Any = buffer.serialize()

  override def serialize(buffer: Kll.Buf): Array[Byte] =
    buffer.serialize()
  override def deserialize(bytes: Array[Byte]): Kll.Buf =
    Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_kll_merge(sketch)` → binary: union of already-serialized
  * sketch states — the aggregate that makes the state a first-class
  * value: per-table/per-batch sketches persist, and a later query (or
  * a streaming fold) merges the BYTES without touching a raw value.
  * The merged state keeps the first non-empty input's k. */
case class KllMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Buf] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary sketch column, got $t")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Kll.Buf = new Kll.Buf(8)

  override def update(buffer: Kll.Buf, input: InternalRow): Kll.Buf = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val o = Kll.deserialize(v.asInstanceOf[Array[Byte]])
      if (buffer.n == 0) o else { buffer.mergeIn(o); buffer }
    }
  }

  override def merge(buffer: Kll.Buf, other: Kll.Buf): Kll.Buf =
    if (buffer.n == 0) other else { buffer.mergeIn(other); buffer }

  override def eval(buffer: Kll.Buf): Any = buffer.serialize()
  override def serialize(buffer: Kll.Buf): Array[Byte] =
    buffer.serialize()
  override def deserialize(bytes: Array[Byte]): Kll.Buf =
    Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_kll_quantile(sketch, p)` → estimated p-quantile off stored
  * sketch bytes. Eval-only ([[CodegenFallback]]): it runs once per
  * GROUP row (post-aggregate), never in a per-row hot path. */
case class KllQuantile(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql])
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, double), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"

  override def nullSafeEval(sk: Any, p: Any): Any =
    Kll.deserialize(sk.asInstanceOf[Array[Byte]])
      .quantile(p.asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
