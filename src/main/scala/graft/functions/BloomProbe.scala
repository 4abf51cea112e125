package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a pre-built
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] (Spark's
  * public sketch module) against a LONG key — the scale primitive
  * behind runtime semi-join pruning: ship a ~1 MB bit set to every
  * task instead of shuffling the full probe side of a huge equi-join.
  * False positives are possible (bounded by the build-time fpp), false
  * negatives are not — callers follow the probe with the exact join on
  * the survivors, so results are EXACT and the filter is pure pruning.
  *
  * The filter bytes arrive as a foldable BinaryType literal (driver
  * builds the filter once from the small side, e.g.
  * `df.stat.bloomFilter`); each executor deserializes it once per
  * expression instance (lazy, transient), and codegen probes via a
  * referenced object — the probe itself stays inside
  * whole-stage-codegen (two Murmur3 hashes + two bit reads per row).
  */
case class BloomProbe(child: Expression, filterBytes: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = filterBytes

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, filterBytes.dataType) match {
      case (LongType, BinaryType) if filterBytes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, foldable binary), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_probe"

  @transient private lazy val filter: BloomFilter = {
    val bytes = filterBytes.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(v: Any, bytes: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    // the right child is the (foldable) filter literal — its generated
    // value is unused; the probe goes through the referenced
    // deserialized filter object
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, filterBytes = newRight)
}

object BloomProbe {
  /** Serialize a built filter for embedding as a Binary literal. */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  private[graft] def builder(exprs: Seq[Expression]): Expression =
    exprs(1) match {
      case l @ Literal(_, BinaryType) => BloomProbe(exprs.head, l)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_probe requires a binary literal filter, got $other")
    }
}
