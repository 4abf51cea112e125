package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass distributed MOMENT aggregate over an embedding column:
  * count, per-dimension sums, and the upper-triangle sum of pairwise
  * products — everything a covariance matrix / PCA fit needs, in a
  * SINGLE pass with partial aggregation (each executor folds its rows
  * into one O(d²) buffer; partials merge by elementwise add, so only
  * ~d²/2 doubles per partition cross the wire — for d = 64 that is
  * 17 KB regardless of row count; compare the naive
  * explode²-then-groupBy formulation, which shuffles d² rows PER
  * INPUT ROW and is unusable at 100 TB).
  *
  * Result struct: `{n: long, mean: array<double>,
  * cov: array<struct<i:int, j:int, cov:double>>}` with `cov` the
  * POPULATION covariance upper triangle (i ≤ j, row-major):
  * `E[x_i·x_j] − E[x_i]·E[x_j]`. Exactly the quantity the DuckDB twin
  * computes as `AVG(xi*xj) − AVG(xi)*AVG(xj)` over a double unnest.
  *
  * Dimension is inferred from the first non-null row and enforced —
  * ragged embedding columns fail loud rather than mis-accumulate.
  */
/** @param raw when true, emit the RAW moments (`{n, sum, prod}`,
  *   no divisions) instead of mean/covariance — the mergeable form a
  *   streaming drain accumulates across micro-batches by elementwise
  *   SUM ([[graft.streaming.StreamCov]]); registered as
  *   `graft_embed_mom`. */
case class EmbedCov(
    child: Expression,
    raw: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got $t")
    }

  private val childIsFloat: Boolean =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def dataType: DataType =
    if (raw) StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("sum", ArrayType(DoubleType, containsNull = false)),
      StructField("prod", ArrayType(StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("v", DoubleType, nullable = false))),
        containsNull = false))))
    else StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("mean", ArrayType(DoubleType, containsNull = false)),
      StructField("cov", ArrayType(StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("cov", DoubleType, nullable = false))),
        containsNull = false))))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_embed_cov"
  override def children: Seq[Expression] = Seq(child)

  // buffer: [d, n, sums(0..d), prods upper-triangle row-major]
  override def createAggregationBuffer(): Array[Double] = Array.empty

  private def alloc(d: Int): Array[Double] =
    new Array[Double](2 + d + d * (d + 1) / 2)

  override def update(buffer: Array[Double],
                      input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val buf =
      if (buffer.isEmpty) { val b = alloc(d); b(0) = d.toDouble; b }
      else buffer
    require(buf(0).toInt == d,
      s"$prettyName: ragged embedding column (${buf(0).toInt} vs $d)")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      x(i) = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(1) += 1.0
    i = 0
    var t = 2 + d
    while (i < d) {
      buf(2 + i) += x(i)
      var j = i
      while (j < d) {
        buf(t) += x(i) * x(j)
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Double],
                     other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other.clone()
    require(buffer(0) == other(0),
      s"$prettyName: merging buffers of different dimension")
    var i = 1
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = {
    if (buffer.isEmpty) return null
    val d = buffer(0).toInt
    val n = buffer(1)
    val first = new Array[Any](d)
    var i = 0
    while (i < d) {
      first(i) = if (raw) buffer(2 + i) else buffer(2 + i) / n
      i += 1
    }
    val tri = new Array[Any](d * (d + 1) / 2)
    var t = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v =
          if (raw) buffer(2 + d + t)
          else buffer(2 + d + t) / n -
            (buffer(2 + i) / n) * (buffer(2 + j) / n)
        tri(t) = new GenericInternalRow(Array[Any](i, j, v))
        t += 1
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong,
      new GenericArrayData(first), new GenericArrayData(tri)))
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EmbedCov =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EmbedCov =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
