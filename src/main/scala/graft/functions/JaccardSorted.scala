package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: Jaccard similarity |a∩b| / |a∪b| of two
  * SORTED, DISTINCT long arrays, via a single merge scan — the hot
  * kernel of blocked pairwise near-dup verification (millions of pair
  * comparisons per block join). The built-in
  * `size(array_intersect)/size(array_union)` form allocates two hash
  * sets per pair; the merge scan is allocation-free and codegen'd, so
  * it stays inside the whole-stage-codegen join stage.
  *
  * Contract: both inputs must be strictly ascending (the caller sorts
  * once per DOC, not per pair — `array_sort(array_distinct(...))`).
  * Sortedness only affects cost, not the value, so the DuckDB oracle
  * twin can keep plain `list_intersect`/`list_distinct(list_concat)`.
  * Returns null for null inputs; NaN for two empty arrays (0/0 — the
  * same value the built-in `size(array_intersect)/size(array_union)`
  * form yields). CAUTION: Spark's comparison semantics order NaN
  * ABOVE every double, so `jaccard >= tau` KEEPS a both-empty pair —
  * the opposite of DuckDB, whose NULL division drops it. Callers that
  * hash-match an oracle must gate out both-empty pairs before the
  * threshold filter (cf. Dedup.ngramJaccardPairs).
  */
case class JaccardSorted(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $n && $j < $m) {
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $inter++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = (double) $inter / ($n + $m - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
