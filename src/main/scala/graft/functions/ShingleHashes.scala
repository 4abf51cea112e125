package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: SORTED DISTINCT 60-bit hashes of a
  * token array's word n-grams, fused into one pass — gram string
  * build, md5, 15-nibble parse, sort, dedupe, with one thread-local
  * MessageDigest reused across rows. Semantics are IDENTICAL to the
  * HOF chain it replaces (`array_sort(array_distinct(transform(
  * array_distinct(transform(sequence…, concat_ws)), md5→conv)))`,
  * kept as [[graft.dedup.Dedup.withShingles]] + the hash transform for
  * the spec twin): md5 of the UTF-8 gram joined with single spaces,
  * value = first 15 hex nibbles as a long, `< n`-token docs yield an
  * empty array. The HOF chain is interpreted per shingle (~12 µs each:
  * lambda binding, UTF8String concat, hex-string conv) — this kernel
  * is the difference between the shingle stage dominating a dedup run
  * and it disappearing into the scan.
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n >= 1, got $n")
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleHashesUtil.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashesUtil.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code (the
  * generated call goes through the Scala static forwarder). */
object ShingleHashesUtil {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** 60-bit value = the md5 digest's first 15 hex nibbles (bytes 0-6
    * plus the high nibble of byte 7) — bit-identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)`. */
  private def head60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** 60-bit md5 head of raw bytes — shared with [[KmvDistinct]]. */
  def head60Md5(bytes: Array[Byte]): Long = {
    val d = md5.get(); d.reset(); head60(d.digest(bytes))
  }

  def compute(words: ArrayData, n: Int): ArrayData = {
    val nw = words.numElements()
    if (nw < n) return new GenericArrayData(Array.emptyLongArray)
    val count = nw - n + 1
    val out = new Array[Long](count)
    val digest = md5.get()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      var appended = false
      while (j < n) {
        // concat_ws semantics: null tokens are skipped, separator only
        // between present tokens
        if (!words.isNullAt(i + j)) {
          if (appended) sb.append(' ')
          sb.append(words.getUTF8String(i + j).toString)
          appended = true
        }
        j += 1
      }
      digest.reset()
      out(i) = head60(digest.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted run
    var m = 0
    i = 0
    while (i < count) {
      if (i == 0 || out(i) != out(i - 1)) { out(m) = out(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}
