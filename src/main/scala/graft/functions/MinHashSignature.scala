package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the k-wide MinHash signature of a
  * 60-bit shingle-hash array, in ONE fused pass — for each element the
  * k hash values update k running minima, so the whole signature costs
  * k·|shingles| integer ops with zero per-lambda overhead. The
  * equivalent HOF form (`transform(sequence(0,k-1), h ->
  * array_min(transform(sh, x -> …)))`) walks the array k times through
  * interpreted lambda machinery and allocates k intermediate arrays
  * per row.
  *
  * Hash family (identical to the HOF twin kept in
  * [[graft.dedup.Dedup.minhashSignatureReference]] and to the DuckDB
  * oracle SQL): `h_i(x) = (a_i·hi(x) + b_i·lo(x) + i) mod P` over the
  * two 30-bit halves of x, P = 1073741789, a_i/b_i seeded from the
  * Knuth and xxhash 32-bit primes — every product < 2^60, overflow-free
  * in checked int64 arithmetic.
  *
  * Element semantics match `array_min` ∘ `transform`: null input →
  * null; null ELEMENTS are skipped; an empty (or all-null) input yields
  * a signature of k nulls (so downstream band keys still form via
  * null-skipping concat_ws).
  */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression {

  import MinHashSignature._

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1, got $k")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash"

  private lazy val aConsts: Array[Long] =
    Array.tabulate(k)(h => (2654435761L * (h + 1)) % P)
  private lazy val bConsts: Array[Long] =
    Array.tabulate(k)(h => (2246822519L * (h + 1)) % P)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        val hi = x / Half; val lo = x % Half
        var h = 0
        while (h < k) {
          val v = (aConsts(h) * hi + bConsts(h) * lo + h) % P
          if (v < acc(h)) acc(h) = v
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var h = 0
    while (h < k) {
      out(h) = if (acc(h) == Long.MaxValue) null else acc(h)
      h += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aConsts, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bConsts, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val acc = ctx.freshName("acc")
      val x = ctx.freshName("x"); val hi = ctx.freshName("hi")
      val lo = ctx.freshName("lo"); val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $acc = new long[$k];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $x = $a.getLong($i);
         |    long $hi = $x / ${Half}L; long $lo = $x % ${Half}L;
         |    for (int $h = 0; $h < $k; $h++) {
         |      long $v = ($aRef[$h] * $hi + $bRef[$h] * $lo + $h) % ${P}L;
         |      if ($v < $acc[$h]) $acc[$h] = $v;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$k];
         |for (int $h = 0; $h < $k; $h++) {
         |  $out[$h] = $acc[$h] == Long.MAX_VALUE
         |    ? null : (Object) java.lang.Long.valueOf($acc[$h]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Largest prime below 2^30 — modulus of the hash family. */
  val P = 1073741789L
  /** 2^30 — splits a 60-bit shingle hash into two safe halves. */
  val Half = 1073741824L
}
