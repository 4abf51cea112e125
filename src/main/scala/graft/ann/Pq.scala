package graft.ann

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization with asymmetric-distance (ADC) scanning — the
  * memory side of the IVF-PQ architecture every 100 TB vector corpus
  * runs (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011; public): split d dims into m subspaces, store
  * ONE byte of codebook index per subspace (64-dim float = 256 B →
  * m = 8 B per vector, a 32× compression), and answer queries by
  * summing m PRE-COMPUTED query·centroid dot products looked up by
  * code — the corpus scan never touches the original floats.
  *
  * Codebook training here is the deterministic mean-threshold variant
  * (cell index = the sign pattern of the sub-vector against the
  * per-dimension corpus means; centroid = cell mean) rather than
  * k-means — same codebook structure and identical ADC mechanics,
  * but reproducible bit-for-bit by the DuckDB oracle, which is what
  * puts the whole operator under the row gate. Swapping in k-means
  * centroids changes [[fitMeans]]/cell assignment only; the scan
  * shape (the part that matters at scale) is unchanged.
  *
  * Scale shape: means come from the one-pass moment aggregate
  * ([[graft.functions.EmbedCov]]); encoding is a per-row in-scan
  * expression (no shuffle — codes can be persisted next to the
  * vectors and the floats dropped); the per-query LUT is
  * queries × m × 256 rows, broadcast; the ADC scan is one
  * broadcast-hash join on (subspace, code) plus a partial-aggregated
  * sum over m rows per (query, neighbor). Codebook training at
  * 100 TB runs on a sample — the standard practice this mirrors.
  */
object Pq {

  /** Per-dimension corpus means — the codebook thresholds. One
    * distributed pass. */
  def fitMeans(df: DataFrame, vecCol: String): Array[Double] = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(expr(s"graft_embed_cov($vecCol)").as("m"))
      .select(col("m.mean")).head().getSeq[Double](0).toArray
  }

  /** In-scan PQ encoder: array of m codes, code s = the sub-vector's
    * ≥-mean sign pattern as a byte (bit b set ⇔ dim s·sub+b ≥ its
    * corpus mean). Pure codegen'd expression over literals. */
  def codesColumn(vecCol: String, means: Array[Double], m: Int): Column = {
    val d = means.length
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val sub = d / m
    array((0 until m).map { s =>
      (0 until sub).map { b =>
        when(col(vecCol).getItem(s * sub + b).cast("double") >=
          lit(means(s * sub + b)), lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _).cast("int")
    }: _*)
  }

  /** Codebook: per (subspace, code, sub-dim) the mean coordinate of
    * the cell's members. Small (≤ m·2^sub·sub rows). */
  def codebook(df: DataFrame, vecCol: String, means: Array[Double],
               m: Int): DataFrame = {
    val sub = means.length / m
    df.withColumn("_codes", codesColumn(vecCol, means, m))
      .select(transform(col(vecCol), x => x.cast("double")).as("_v"),
        posexplode(col("_codes")).as(Seq("s", "code")))
      .select(col("s"), col("code"),
        posexplode(slice(col("_v"), col("s") * lit(sub) + lit(1),
          lit(sub))).as(Seq("b", "xv")))
      .groupBy("s", "code", "b").agg(avg("xv").as("cv"))
  }

  /** Per-subspace LLOYD K-MEANS codebook — the production codebook
    * the class doc's mean-threshold variant stands in for, composed
    * from the q99 k-means mechanics PER SUBSPACE and kept fully
    * deterministic so the DuckDB oracle reproduces the training
    * bit-for-bit: MAXMIN (farthest-point) seeding — the
    * deterministic kmeans++ analog (Gonzalez 1985; kmeans++'s
    * D²-sampling replaced by the argmax so no RNG crosses the
    * oracle): seed 0 = the lowest id's sub-vector, each next seed =
    * the point whose 5-dp-rounded distance to its nearest chosen
    * seed is largest (id tie-break), PER SUBSPACE; then fixed
    * `iters` Lloyd rounds, assignment by L2 distance rounded to
    * 5 dp with a code tie-break, centroids as 5-dp-quantized
    * element means (exact integer sums / double division — the q99
    * quantizedMeans rule). Round 10 seeded with the `kc` lowest ids
    * and the honest A/B (q237) showed Lloyd LOSING to
    * mean-threshold — degenerate seeds, not Lloyd, were the
    * problem. Scale shape: seeding is kc−1 broadcast-assign passes
    * (chosen seeds are tiny) and each Lloyd round one broadcast-
    * assign pass over the exploded corpus (centroids are m·kc·sub
    * rows — broadcast at any corpus size) plus one
    * partial-aggregated centroid recompute; 100 TB trains on a
    * sample (class doc), and the ADC scan downstream is unchanged —
    * training choice and scan shape stay decoupled, which is the
    * point of the swap seam. Returns (codebook (s, code, b, cv),
    * codes (id, s, code)). */
  def fitKmeans(corpus: DataFrame, vecCol: String, idCol: String,
                m: Int, kc: Int, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1 && kc >= 2, s"need iters>=1, kc>=2; got $iters/$kc")
    val dims = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dims % m == 0, s"dim $dims not divisible by m=$m")
    val sub = dims / m
    val x = corpus.select(col(idCol).as("id"),
        posexplode(transform(col(vecCol), v => v.cast("double")))
          .as(Seq("i", "x")))
      .withColumn("s", (col("i") / lit(sub)).cast("int"))
      .withColumn("b", (col("i") % lit(sub)).cast("int"))
      .drop("i")
    // maxmin seeding, per subspace: (s, id, code). Each step's pick
    // (m rows) materializes to the driver and re-enters as a literal
    // frame — keeps the kc−1-step lineage flat, so planning stays
    // O(kc) instead of a nested-union blowup.
    val spark = corpus.sparkSession
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val seedSchema = StructType(Seq(
      StructField("s", IntegerType, nullable = false),
      StructField("id", x.schema("id").dataType, nullable = false),
      StructField("code", IntegerType, nullable = false)))
    def seedDf(rows: Seq[org.apache.spark.sql.Row]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), seedSchema)
    val id0 = corpus.select(col(idCol).as("id")).orderBy("id")
      .limit(1).head().get(0)
    var seedRows: Seq[org.apache.spark.sql.Row] =
      (0 until m).map(s => org.apache.spark.sql.Row(s, id0, 0))
    (1 until kc).foreach { j =>
      val cent = x.join(broadcast(seedDf(seedRows)), Seq("id", "s"))
        .select(col("s"), col("code"), col("b"), col("x").as("cv"))
      val mind = x.join(broadcast(cent), Seq("s", "b"))
        .groupBy("id", "s", "code")
        .agg(sum((col("x") - col("cv")) * (col("x") - col("cv")))
          .as("dist"))
        .groupBy("id", "s")
        .agg(min(floor(col("dist") * 1e5 + 0.5) / lit(1e5)).as("mind"))
      val w = Window.partitionBy("s")
        .orderBy(col("mind").desc, col("id"))
      seedRows = seedRows ++ mind
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("s"), col("id"))
        .collect()
        .map(r => org.apache.spark.sql.Row(r.getInt(0), r.get(1), j))
    }
    val seeds = seedDf(seedRows)
    def assign(c: DataFrame): DataFrame = {
      val dw = Window.partitionBy("id", "s")
        .orderBy(floor(col("dist") * 1e5 + 0.5), col("code"))
      x.join(broadcast(c), Seq("s", "b"))
        .groupBy("id", "s", "code")
        .agg(sum((col("x") - col("cv")) * (col("x") - col("cv")))
          .as("dist"))
        .withColumn("rk", row_number().over(dw))
        .filter(col("rk") === 1).select("id", "s", "code")
    }
    def centroids(a: DataFrame): DataFrame =
      x.join(a, Seq("id", "s"))
        .groupBy("s", "code", "b")
        .agg((sum(floor(col("x") * 1e5 + 0.5).cast("long")).cast("double")
          / lit(1e5) / count(lit(1))).as("cv"))
    var cent: DataFrame = x.join(broadcast(seeds), Seq("id", "s"))
      .select(col("s"), col("code"), col("b"), col("x").as("cv"))
    var assigned = assign(cent)
    (1 until iters).foreach { _ =>
      cent = centroids(assigned)
      assigned = assign(cent)
    }
    // the returned codebook is the TRUE mean of each final cell (one
    // more centroid recompute over the final assignment) — scoring
    // codes against the stale pre-assignment centroids cost recall
    // for free (round-11 A/B measurement)
    (centroids(assigned), assigned)
  }

  /** Lloyd refinement INITIALIZED FROM THE MEAN-THRESHOLD CELLS —
    * the other seeding in the swap seam: start from the cheap
    * quantizer's codebook ([[codebook]] — the 2^sub sign-pattern
    * cells the class doc trains, with their true cell means) and run
    * `iters` Lloyd rounds over it; each round can only reduce
    * within-cell distortion, so the refined codebook competes with
    * mean-threshold at its OWN capacity instead of a hand-picked kc
    * (the round-10 A/B compared kc=8 Lloyd against ~2^8 occupied
    * sign cells — a capacity mismatch no seeding could win).
    * Mechanics (assignment rounding/tie-breaks, quantized centroid
    * means) identical to [[fitKmeans]]; codes stay in the sign-int
    * code space. Returns (codebook (s, code, b, cv), codes
    * (id, s, code)). */
  def fitKmeansCells(corpus: DataFrame, vecCol: String, idCol: String,
                     m: Int, means: Array[Double],
                     iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, s"need iters>=1, got $iters")
    val dims = means.length
    require(dims % m == 0, s"dim $dims not divisible by m=$m")
    val sub = dims / m
    val x = corpus.select(col(idCol).as("id"),
        posexplode(transform(col(vecCol), v => v.cast("double")))
          .as(Seq("i", "x")))
      .withColumn("s", (col("i") / lit(sub)).cast("int"))
      .withColumn("b", (col("i") % lit(sub)).cast("int"))
      .drop("i")
    def assign(c: DataFrame): DataFrame = {
      val dw = Window.partitionBy("id", "s")
        .orderBy(floor(col("dist") * 1e5 + 0.5), col("code"))
      x.join(broadcast(c), Seq("s", "b"))
        .groupBy("id", "s", "code")
        .agg(sum((col("x") - col("cv")) * (col("x") - col("cv")))
          .as("dist"))
        .withColumn("rk", row_number().over(dw))
        .filter(col("rk") === 1).select("id", "s", "code")
    }
    def centroids(a: DataFrame): DataFrame =
      x.join(a, Seq("id", "s"))
        .groupBy("s", "code", "b")
        .agg((sum(floor(col("x") * 1e5 + 0.5).cast("long")).cast("double")
          / lit(1e5) / count(lit(1))).as("cv"))
    var cent = codebook(corpus, vecCol, means, m)
    var assigned = assign(cent)
    (1 until iters).foreach { _ =>
      cent = centroids(assigned)
      assigned = assign(cent)
    }
    (centroids(assigned), assigned)
  }

  /** ADC top-k: per query build the m×2^sub lookup table of
    * query·centroid dot products (broadcast), scan the CODES (never
    * the floats), sum m looked-up values per neighbor, rank on the
    * 5-dp-rounded score with a neighbor-id tiebreak (the repo's
    * cross-engine ranking rule).
    *
    * `cellCol` = IVF composition: queries only score neighbors in
    * their own coarse cell — the in-plan form of IVF-PQ. At scale the
    * cells are partition directories and the routed read prunes to
    * them physically ([[IvfIndex]] is the persisted form, q185/q186);
    * here the cell equality rides the broadcast LUT join, so the scan
    * still touches codes only. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, means: Array[Double], m: Int,
              k: Int, cellCol: Option[String] = None): DataFrame = {
    val sub = means.length / m
    val cb = codebook(corpus, vecCol, means, m)
    val qd = queries
      .select(col(idCol).as("query_id") +:
        cellCol.map(c => col(c).as("_qcell")).toSeq :+
        posexplode(transform(col(vecCol), x => x.cast("double")))
          .as(Seq("i", "qv")): _*)
      .withColumn("s", floor(col("i") / lit(sub)).cast("int"))
      .withColumn("b", (col("i") % lit(sub)).cast("int"))
    val lut = qd.join(cb, Seq("s", "b"))
      .groupBy(col("query_id") +:
        cellCol.map(_ => col("_qcell")).toSeq :+ col("s") :+
        col("code"): _*)
      .agg(sum(col("qv") * col("cv")).as("dot8"))
    val ncodes = corpus
      .withColumn("_codes", codesColumn(vecCol, means, m))
      .select(col(idCol).as("neighbor_id") +:
        cellCol.map(c => col(c).as("_ncell")).toSeq :+
        posexplode(col("_codes")).as(Seq("s", "code")): _*)
    val joined = ncodes.join(broadcast(lut), Seq("s", "code"))
    val routed = cellCol match {
      case Some(_) => joined.filter(col("_ncell") === col("_qcell"))
      case None => joined
    }
    val scores = routed
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("dot8")).as("adc"))
    val adc5 = graft.Oracle.stableRound(col("adc"), 5)
    scores.withColumn("adc5", adc5)
      .withColumn("rank", row_number().over(Window
        .partitionBy("query_id")
        .orderBy(col("adc5").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("adc5"))
  }

  /** TWO-STAGE ANN — the production serving pattern: [[adcTopK]]
    * shortlists `c` candidates per query off the 8-byte codes (the
    * wide scan never touches a float), then ONLY the shortlist —
    * O(queries × c) rows — joins back to the full-precision vectors
    * for an exact dot-product re-rank to `k`. The shortlist rides as
    * the BROADCAST side against the corpus, so the re-rank is one
    * broadcast semi-probe of the vector table, not a shuffle: ADC's
    * quantization error decides only WHICH c survive, never their
    * final order. */
  def adcRerankTopK(corpus: DataFrame, queries: DataFrame,
                    vecCol: String, idCol: String, means: Array[Double],
                    m: Int, k: Int, c: Int): DataFrame = {
    require(c >= k, s"shortlist $c must be >= k=$k")
    val short = adcTopK(corpus, queries, vecCol, idCol, means, m, k = c)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv"))
    val pairs = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_nv"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
    val dot = expr("""aggregate(zip_with(_qv, _nv,
      (a, b) -> cast(a as double) * cast(b as double)),
      0d, (acc, x) -> acc + x)""")
    pairs.withColumn("dot5", graft.Oracle.stableRound(dot, 5))
      .withColumn("rank", row_number().over(Window
        .partitionBy("query_id")
        .orderBy(col("dot5").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("dot5"))
  }
}
