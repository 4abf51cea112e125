package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two double
  * arrays — the hot kernel of every ANN operator (SURVEY.md §7 carved
  * this exact case out as the one place custom Catalyst work is
  * justified: the `aggregate`/`zip_with` higher-order-function form is
  * interpreted per element with lambda-variable overhead and falls out
  * of whole-stage codegen, which matters when a bucket join evaluates
  * the kernel millions of times).
  *
  * Semantics are IDENTICAL to the HOF reference form
  * ([[graft.ann.Ann.cos5Reference]], spec-verified bitwise): one
  * left-to-right pass accumulating dot/norm² in doubles, null if the
  * arrays differ in length (zip_with's null-pad poisons the fold) or
  * any element is null, IEEE Inf/NaN on zero norms.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql]),
  // so validate the input types directly
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  int $i = 0;
         |  for (; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for [[CosineSimilarity]]: the canonical path is
  * `spark.sql.extensions=graft.GraftExtensions` at session build;
  * [[GraftFunctions.ensureRegistered]] is the late-bind fallback for
  * sessions the library doesn't own (the harness driver's). */
object GraftFunctions {
  val cosineName = "graft_cosine"
  val jaccardName = "graft_jaccard"
  val minhashName = "graft_minhash"
  val shinglesName = "graft_shingles"
  val kmvName = "graft_kmv_distinct"
  val hllName = "graft_hll_distinct"
  val bloomName = "graft_bloom_probe"
  val topkName = "graft_topk"
  val covName = "graft_embed_cov"
  val momName = "graft_embed_mom"
  val dvDeletedName = "graft_dv_deleted"
  val imageDimsName = "graft_image_dims"
  val audioMetaName = "graft_audio_meta"
  val videoMetaName = "graft_video_meta"
  val kllName = "graft_kll"
  val kllQuantileName = "graft_kll_quantile"
  val kllMergeName = "graft_kll_merge"

  private def cosBuilder(exprs: Seq[Expression]): Expression =
    CosineSimilarity(exprs.head, exprs(1))
  private def jacBuilder(exprs: Seq[Expression]): Expression =
    JaccardSorted(exprs.head, exprs(1))
  private[graft] def minhashBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    exprs(1) match {
      case Literal(kv: Int, IntegerType) => MinHashSignature(exprs.head, kv)
      case other => throw new IllegalArgumentException(
        s"$minhashName requires a literal int k, got $other")
    }
  }
  private[graft] def shinglesBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    exprs(1) match {
      case Literal(nv: Int, IntegerType) => ShingleHashes(exprs.head, nv)
      case other => throw new IllegalArgumentException(
        s"$shinglesName requires a literal int n, got $other")
    }
  }
  private[graft] def kmvBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    exprs(1) match {
      case Literal(kv: Int, IntegerType) => KmvDistinct(exprs.head, kv)
      case other => throw new IllegalArgumentException(
        s"$kmvName requires a literal int k, got $other")
    }
  }

  private[graft] def hllBuilder(exprs: Seq[Expression]): Expression =
    HllDistinct(exprs.head)

  private[graft] def kllBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    exprs(1) match {
      case Literal(kv: Int, IntegerType) => KllSketch(exprs.head, kv)
      case other => throw new IllegalArgumentException(
        s"$kllName requires a literal int k, got $other")
    }
  }

  private[graft] def kllQuantileBuilder(exprs: Seq[Expression]): Expression =
    KllQuantile(exprs.head, exprs(1))

  private[graft] def covBuilder(exprs: Seq[Expression]): Expression =
    EmbedCov(exprs.head)

  private[graft] def momBuilder(exprs: Seq[Expression]): Expression =
    EmbedCov(exprs.head, raw = true)

  private[graft] def topkBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    exprs(2) match {
      case Literal(kv: Int, IntegerType) =>
        GroupedTopK(exprs.head, exprs(1), kv)
      case other => throw new IllegalArgumentException(
        s"$topkName requires a literal int k, got $other")
    }
  }

  private[graft] def dvDeletedBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{IntegerType, StringType}
    (exprs(0), exprs(1)) match {
      case (Literal(d: org.apache.spark.unsafe.types.UTF8String, StringType),
            Literal(g: Int, IntegerType)) =>
        graft.sink.DvDeleted(d.toString, g, exprs(2), exprs(3))
      case other => throw new IllegalArgumentException(
        s"$dvDeletedName requires literal (dir, gen), got $other")
    }
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(cosineName)))
      registry.createOrReplaceTempFunction(cosineName, cosBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(jaccardName)))
      registry.createOrReplaceTempFunction(jaccardName, jacBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(minhashName)))
      registry.createOrReplaceTempFunction(minhashName, minhashBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(shinglesName)))
      registry.createOrReplaceTempFunction(shinglesName, shinglesBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(kmvName)))
      registry.createOrReplaceTempFunction(kmvName, kmvBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(hllName)))
      registry.createOrReplaceTempFunction(hllName, hllBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(bloomName)))
      registry.createOrReplaceTempFunction(bloomName, BloomProbe.builder,
        "built-in")
    if (!registry.functionExists(FunctionIdentifier(topkName)))
      registry.createOrReplaceTempFunction(topkName, topkBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(covName)))
      registry.createOrReplaceTempFunction(covName, covBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(momName)))
      registry.createOrReplaceTempFunction(momName, momBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(dvDeletedName)))
      registry.createOrReplaceTempFunction(dvDeletedName, dvDeletedBuilder,
        "built-in")
    if (!registry.functionExists(FunctionIdentifier(imageDimsName)))
      registry.createOrReplaceTempFunction(imageDimsName,
        graft.multimodal.ImageDims.builder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(audioMetaName)))
      registry.createOrReplaceTempFunction(audioMetaName,
        graft.multimodal.AudioMeta.builder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(videoMetaName)))
      registry.createOrReplaceTempFunction(videoMetaName,
        graft.multimodal.VideoMeta.builder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(kllName)))
      registry.createOrReplaceTempFunction(kllName, kllBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(kllQuantileName)))
      registry.createOrReplaceTempFunction(kllQuantileName,
        kllQuantileBuilder, "built-in")
    if (!registry.functionExists(FunctionIdentifier(kllMergeName)))
      registry.createOrReplaceTempFunction(kllMergeName,
        (exprs: Seq[Expression]) => KllMerge(exprs.head), "built-in")
  }

  /** Column form: cosine(a, b) as a codegen'd native expression. */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(cosineName, a, b)
  }

  /** Column form: Jaccard of two sorted distinct long arrays. */
  def jaccardSorted(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(jaccardName, a, b)
  }

  /** Column form: fused k-wide MinHash signature of a shingle-hash
    * array. */
  def minhash(spark: SparkSession, shingleHashes: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function(minhashName, shingleHashes,
      org.apache.spark.sql.functions.lit(k))
  }

  /** Column form: fused sorted-distinct 60-bit n-gram shingle hashes
    * of a token array. */
  def shingles(spark: SparkSession, words: Column, n: Int): Column = {
    ensureRegistered(spark)
    call_function(shinglesName, words,
      org.apache.spark.sql.functions.lit(n))
  }

  /** Column form: KMV distinct-count sketch estimate (aggregate). */
  def kmvDistinct(spark: SparkSession, value: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function(kmvName, value,
      org.apache.spark.sql.functions.lit(k))
  }

  /** Column form: HyperLogLog distinct-count sketch estimate
    * (aggregate; 64-byte mergeable register state). */
  def hllDistinct(spark: SparkSession, value: Column): Column = {
    ensureRegistered(spark)
    call_function(hllName, value)
  }

  /** Column form: grouped top-k aggregate — best-first (score DESC,
    * id ASC) array of (id, score) structs, k-bounded mergeable state
    * (see [[GroupedTopK]]). */
  def topK(spark: SparkSession, score: Column, id: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function(topkName, score, id,
      org.apache.spark.sql.functions.lit(k))
  }

  /** Column form: Bloom-filter membership probe of a long key against
    * a serialized filter (see [[BloomProbe]]). */
  def bloomProbe(spark: SparkSession, key: Column,
                 filterBytes: Array[Byte]): Column = {
    ensureRegistered(spark)
    call_function(bloomName, key,
      org.apache.spark.sql.functions.lit(filterBytes))
  }
}
