package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), for LLM-data similarity dedup and retrieval.
  *
  * Three tiers, in ascending scale-fitness:
  *  - [[bruteForceTopK]]: exact cosine top-k for a SMALL query set —
  *    the query side is broadcast, so the "cross join" is really one
  *    streaming pass over the corpus per partition (scan-bound, no
  *    shuffle of the corpus). Correct baseline at any corpus size as
  *    long as |queries| is small.
  *  - [[ivfTopK]]: IVF-style cell-restricted search — each query only
  *    scans its own coarse cell (here the fixture's `label` plays the
  *    coarse-quantizer assignment; a real deployment k-means its own
  *    centroids). Equi-join on the cell id ⇒ per-cell work only.
  *  - [[lshBucketPairs]]: bucketed near-duplicate pairs — sign-LSH
  *    buckets from coordinate comparisons (rank-based hyperplane
  *    stand-ins chosen for exact cross-engine determinism: a float
  *    compare never has rounding error), pairs compared within bucket
  *    only. NEVER all-pairs.
  *
  * Determinism: all dot products fold left-to-right in DOUBLE via
  * `aggregate`/`zip_with` (codegen'd, no UDF); ranking keys round the
  * cosine to 5 dp and tiebreak on the neighbor id, so Spark and the
  * DuckDB oracle (double-cast `list_sum` fold) rank identically.
  */
object Ann {

  /** Embedding as double array (float arithmetic differs across
    * engines; double is the cross-engine common ground). */
  def asDouble(embCol: String): Column =
    expr(s"transform($embCol, x -> cast(x as double))")

  /** Left-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a double-array column. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Reference (higher-order-function) cosine, rounded to 5 dp. Kept
    * as the spec twin of the native kernel: interpreted per element,
    * but trivially auditable against the oracle SQL. */
  def cos5Reference(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 5)

  /** Cosine similarity rounded to 5 dp — the ranking/thresholding key
    * shared with the oracle. Backed by the native codegen'd
    * [[graft.functions.CosineSimilarity]] kernel (bitwise-identical to
    * [[cos5Reference]], spec-verified); the HOF form drops out of
    * whole-stage codegen and pays per-element lambda overhead, which
    * dominates when a bucket join evaluates millions of cosines. */
  def cos5(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    round(graft.functions.GraftFunctions.cosine(spark, a, b), 5)

  /** Exact cosine top-k: `queries` must be small (it is broadcast).
    * Output: (query_id, rank, neighbor_id, cos5), rank 1..k per query,
    * self-matches excluded, ties broken by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(embCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(embCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos5", cos5(corpus.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos5"))
  }

  /** Margin-scored cross-corpus match — the parallel-pair mining shape
    * (bitext mining, retrieval-pair construction for contrastive
    * training): for every query vector from corpus A, the single best
    * match in a DIFFERENT corpus B plus the top1−top2 margin, the
    * standard confidence signal (an isolated best match is
    * trustworthy; two near-ties are not). Downstream keeps pairs with
    * margin ≥ τ — the filter stays downstream so τ-sweeps reuse one
    * scored frame.
    *
    * Scale: same shape as [[bruteForceTopK]] — queries broadcast, the
    * corpus never shuffles, cosine is the codegen'd kernel, and the
    * per-query top-2 is one window pass; swap corpus B for its IVF
    * cell partitioning ([[ivfTopK]]) when B is the 100 TB side.
    * Output: (query_id, match_id, cos5, margin5), margin5 on the same
    * stable-round grid as cos5. */
  def marginMatch(corpusB: DataFrame, queriesA: DataFrame,
                  idCol: String, embCol: String): DataFrame = {
    val spark = corpusB.sparkSession
    val q = queriesA.select(col(idCol).as("query_id"),
      asDouble(embCol).as("qv"))
    val c = corpusB.select(col(idCol).as("match_id"),
      asDouble(embCol).as("cv"))
    top2Margin(c.crossJoin(broadcast(q))
      .withColumn("cos5", cos5(spark, col("qv"), col("cv"))))
  }

  /** Shared top-2/margin reduction for the margin-match family: one
    * window pass cuts each query to its two best candidates, then a
    * per-query pivot emits (match_id, cos5, margin5). Kept in ONE
    * place so the margin grid (floor-half-up on 1e-5 — exact because
    * margins are ≥ 0 by ranking — matching the DuckDB twins) cannot
    * silently diverge between the brute-force and IVF forms. */
  private def top2Margin(scored: DataFrame,
                         extraAgg: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("match_id").asc)
    val aggs = extraAgg ++ Seq(
      max(when(col("rank") === 1, col("match_id"))).as("match_id"),
      max(when(col("rank") === 1, col("cos5"))).as("cos5"),
      (floor((max(when(col("rank") === 1, col("cos5")))
        - coalesce(max(when(col("rank") === 2, col("cos5"))), lit(0.0)))
        * 1e5 + 0.5) / 1e5).as("margin5"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .groupBy(col("query_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** [[marginMatch]] routed through IVF cells — the 100 TB form: each
    * query matches only within its own coarse cell (equi-join on
    * `cellCol`, the [[ivfTopK]] contract), so corpus B is
    * hash-partitioned by cell and a probe touches one partition's
    * vectors instead of the corpus. Margin algebra unchanged; a
    * single-candidate cell yields margin = cos1 (nothing to tie
    * with), a query whose cell holds no B-vector is absent. */
  def marginMatchIvf(corpusB: DataFrame, queriesA: DataFrame,
                     idCol: String, embCol: String,
                     cellCol: String): DataFrame = {
    val spark = corpusB.sparkSession
    val q = queriesA.select(col(idCol).as("query_id"),
      col(cellCol).as("cell"), asDouble(embCol).as("qv"))
    val c = corpusB.select(col(idCol).as("match_id"),
      col(cellCol).as("cell"), asDouble(embCol).as("cv"))
    top2Margin(
      c.join(broadcast(q), Seq("cell"))
        .withColumn("cos5", cos5(spark, col("qv"), col("cv"))),
      extraAgg = Seq(max(col("cell")).as("cell")))
  }

  /** IVF-style search: each query scans only its own coarse cell
    * (equi-join on the cell column), then exact cosine top-k within
    * the cell. At 100 TB the corpus is hash-partitioned by cell and
    * each probe touches one partition's worth of vectors. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, cellCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(cellCol).as("cell"), asDouble(embCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(cellCol).as("cell"), asDouble(embCol).as("cv"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos5", cos5(corpus.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos5"))
  }

  /** Scalar int8 quantization of the whole corpus: per-dimension
    * [lo, hi] ranges (one map-side-combined aggregate over exploded
    * dims — dims are small), then each value becomes an 8-bit code
    * `least(255, floor((x-lo)/(hi-lo)*256))`. Returned frame carries
    * the DEQUANTIZED vectors (`lo + (code+0.5)·(hi-lo)/256` — the
    * bucket midpoint), which is what search scores against.
    *
    * Why: at 100 TB of float32 embeddings this is the scale path —
    * codes are 4× smaller than floats (25 GB/billion 64-dim vectors
    * vs 100), scans are bandwidth-bound, and recall loss is small
    * (spec-measured on the fixture). All arithmetic is fixed-order
    * IEEE double, so quantization is bit-identical in any engine. */
  def quantizeDequantized(emb: DataFrame, idCol: String,
                          embCol: String): DataFrame = {
    val e = emb.select(col(idCol), asDouble(embCol).as("v"))
    val dims = e
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"))
    // per-dim stats as position-ordered arrays (collect_list has no
    // order guarantee — sort structs, then project), broadcast to
    // every row; O(dims) payload
    val stats = dims
      .agg(expr("array_sort(collect_list(struct(pos, lo, hi)))").as("s"))
      .select(expr("transform(s, t -> t.lo)").as("los"),
        expr("transform(s, t -> t.hi)").as("his"))
    e.crossJoin(broadcast(stats))
      .select(col(idCol), expr(
        """transform(sequence(1, size(v)), i ->
          |  CASE WHEN element_at(his, i) = element_at(los, i)
          |    THEN element_at(los, i)
          |    ELSE element_at(los, i)
          |      + (cast(least(255L, floor((element_at(v, i) - element_at(los, i))
          |           / (element_at(his, i) - element_at(los, i)) * 256)) as double)
          |         + 0.5)
          |      * (element_at(his, i) - element_at(los, i)) / 256 END)"""
          .stripMargin).as("dv"))
  }

  /** ANN over int8-quantized vectors: quantize corpus AND queries with
    * the same per-dim ranges, then exact cosine top-k on the
    * dequantized codes — [[bruteForceTopK]]'s plan at a quarter of the
    * scan bytes. Output (query_id, rank, neighbor_id, cos5q). */
  def quantizedTopK(emb: DataFrame, idCol: String, embCol: String,
                    nQueries: Int, k: Int): DataFrame = {
    // persist the quantized corpus: BOTH the broadcast query side and
    // the probe side read it, and each would otherwise re-run the
    // whole quantization subtree (two scans + the per-dim range agg).
    // At 100 TB this materialization is the quantized-index table a
    // deployment stores once and reuses across queries.
    val dq = quantizeDequantized(emb, idCol, embCol).persist()
    val q = dq.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col("dv").as("qv"))
    val c = dq.select(col(idCol).as("neighbor_id"), col("dv").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos5q", cos5(emb.sparkSession, col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5q").desc, col("neighbor_id").asc)
    val result = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos5q"))
      .persist()
    result.count()
    dq.unpersist()
    result
  }

  /** Sign-LSH bucket id from `nBits` coordinate comparisons:
    * bit j = emb[2j] > emb[2j+1] (0-based). Float comparisons are
    * exact, so every engine buckets identically; real deployments swap
    * in random-hyperplane dot-sign bits — same plan shape. */
  def signBucket(embCol: String, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      s"IF(element_at($embCol, ${2 * j + 1}) > element_at($embCol, ${2 * j + 2}), ${1 << j}, 0)"
    }
    expr(bits.mkString(" + "))
  }

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: self-join on
    * the sign bucket (equi-join; ~N²/2^bits candidate pairs), exact
    * cosine ≥ tau within bucket. Output (vec_a, vec_b, bucket, cos5). */
  def lshBucketPairs(corpus: DataFrame, idCol: String, embCol: String,
                     nBits: Int, tau: Double): DataFrame = {
    val e = corpus.select(col(idCol).as("id"),
      signBucket(embCol, nBits).as("bucket"), asDouble(embCol).as("v"))
    val a = e.select(col("id").as("vec_a"), col("bucket"), col("v").as("va"))
    val b = e.select(col("id").as("vec_b"), col("bucket"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos5", cos5(corpus.sparkSession, col("va"), col("vb")))
      .filter(col("cos5") >= tau)
      .select(col("vec_a"), col("vec_b"), col("bucket").cast("long").as("bucket"),
        col("cos5"))
  }

  /** k-nearest-neighbour GRAPH over the whole corpus, LSH-bucketed:
    * every vector gets its top-`k` cosine neighbours WITHIN its sign
    * bucket. The self-join is an equi-join on the bucket key — each
    * vector compares against its bucket's members only (~N²/2^bits
    * candidate edges), never all-pairs — and the per-vector top-k is a
    * rank-over-window with partial pushdown (Spark's WindowGroupLimit
    * keeps only k rows per key on the map side before the shuffle).
    * This is the build step of kNN-graph methods (NN-Descent seeds,
    * graph-based ANN indexes, dataset cartography); production swaps
    * the comparison-bit bucket for random-hyperplane signs and unions
    * several rotations — same plan. Output (vec_id, rank, neighbor_id,
    * cos5). */
  def knnGraph(corpus: DataFrame, idCol: String, embCol: String,
               nBits: Int, k: Int): DataFrame = {
    val e = corpus.select(col(idCol).as("id"),
      signBucket(embCol, nBits).as("bucket"), asDouble(embCol).as("v"))
    val a = e.select(col("id").as("vec_id"), col("bucket"), col("v").as("va"))
    val b = e.select(col("id").as("neighbor_id"), col("bucket"),
      col("v").as("vb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos5", cos5(corpus.sparkSession, col("va"), col("vb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos5"))
  }

  /** Multi-probe LSH top-k: each query probes its OWN sign bucket plus
    * every Hamming-1 neighbour bucket (flip one bit), then exact
    * cosine top-k over the union of probed buckets. The standard
    * recall-vs-cost dial of bucketed ANN (Lv et al. 2007, "Multi-probe
    * LSH"): recall strictly contains the single-bucket result at
    * (nBits+1)× the candidate volume — still ~N·(nBits+1)/2^bits per
    * query, never a full scan. Probes are distinct buckets, so the
    * equi-join meets each (query, neighbour) pair at most once and no
    * dedup pass is needed. */
  def multiprobeTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, nBits: Int, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      signBucket(embCol, nBits).as("bucket"), asDouble(embCol).as("cv"))
    val probeArr = array(
      (Seq(col("qb")) ++ (0 until nBits).map(i =>
        col("qb").bitwiseXOR(lit(1 << i)))): _*)
    val q = queries.select(col(idCol).as("query_id"),
        signBucket(embCol, nBits).as("qb"), asDouble(embCol).as("qv"))
      .select(col("query_id"), col("qv"), explode(probeArr).as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos5", cos5(corpus.sparkSession, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos5"))
  }

  /** Embedding-space near-duplicate GROUPS (semantic dedup): sign-LSH
    * bucketed cosine pairs → connected components → (vec, canonical =
    * component-min vec, cluster size). The embedding analog of
    * [[graft.dedup.Dedup.dedupGroups]] — "keep one doc per semantic
    * cluster" for corpora deduped on meaning rather than surface text.
    * Same scale shape end to end: bucket equi-join for pairs (never
    * all-pairs), join-per-round label propagation for components. */
  def semanticDedupGroups(corpus: DataFrame, idCol: String, embCol: String,
                          nBits: Int, tau: Double): DataFrame = {
    val pairs = lshBucketPairs(corpus, idCol, embCol, nBits, tau).persist()
    val cc = graft.dedup.Dedup.connectedComponents(pairs, "vec_a", "vec_b")
    pairs.unpersist()
    cc.select(col("id").as("vec_id"), col("label").as("canonical_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("canonical_id")))
  }

  /** Per-cell element-wise centroid — the aggregation step of
    * distributed k-means: posexplode to (cell, pos, x), one hash
    * aggregate with map-side partial sums, so at 100 TB each executor
    * contributes one partial per (cell, pos) and only |cells|×dim rows
    * shuffle. Output (cell, pos, c5) with pos 0-based and the mean
    * rounded to 5 dp (the cross-engine comparison key — partial-sum
    * order is engine/partitioning-dependent below that). */
  def cellCentroids(corpus: DataFrame, embCol: String,
                    cellCol: String): DataFrame =
    corpus
      .select(col(cellCol).as("cell"), posexplode(asDouble(embCol)))
      .groupBy(col("cell"), col("pos"))
      .agg(round(avg(col("col")), 5).as("c5"))

  /** Hard-negative mining (contrastive-training prep, the DPR/
    * Contriever recipe): for each query, the top-`k` most-similar
    * vectors whose label DIFFERS from the query's — maximally
    * confusable negatives. Same broadcast scan-and-rank plan as
    * [[bruteForceTopK]] with the label-mismatch predicate applied
    * before scoring; a production run swaps the scan for the
    * LSH/IVF-bucketed probe, predicate unchanged ("filtered ANN").
    * Output (query_id, rank, neighbor_id, neg_label, cos5). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    embCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), asDouble(embCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neg_label"), asDouble(embCol).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neg_label") =!= col("q_label"))
      .withColumn("cos5", cos5(corpus.sparkSession, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neg_label"), col("cos5"))
  }

  /** Assign every vector to its nearest centroid by cosine (5-dp
    * ranking key, centroid-id tiebreak). `centroids` must be tiny —
    * it is broadcast, so the "cross join" is one streaming pass over
    * the corpus. Output: corpus row + (cluster, cos5). */
  private def assignToCentroids(e: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val w = Window.partitionBy("id")
      .orderBy(col("cos5").desc, col("cluster").asc)
    e.crossJoin(broadcast(centroids))
      .withColumn("cos5", cos5(spark, col("v"), col("cv")))
      .withColumn("arn", row_number().over(w))
      .filter(col("arn") === 1)
      .drop("arn", "cv")
  }

  /** Element-wise mean vectors per cluster with ORDER-INDEPENDENT
    * arithmetic: each coordinate contribution is quantized to 1e-9
    * (floor(x·1e9 + 0.5) as BIGINT) before the sum, so the partial-sum
    * order Spark's shuffle happens to use cannot change the result and
    * any engine reproduces the centroid bit-for-bit — necessary here
    * (unlike [[cellCentroids]]'s display rounding) because these means
    * feed ANOTHER cosine ranking where a 1-ulp drift flips argmaxes.
    * One posexplode + one hash aggregate: only |clusters|·dim rows
    * shuffle. */
  private def quantizedMeans(assigned: DataFrame): DataFrame = {
    val scale = 1e9
    assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cluster", "pos")
      .agg(sum(floor(col("x") * lit(scale) + lit(0.5)).cast("long")).as("qs"),
        count(lit(1)).as("n"))
      .withColumn("m",
        col("qs").cast("double") / lit(scale) / col("n").cast("double"))
      .groupBy("cluster")
      .agg(expr("array_sort(collect_list(struct(pos, m)))").as("s"))
      .select(col("cluster"), expr("transform(s, t -> t.m)").as("cv"))
  }

  /** Distributed k-means, `iters` full Lloyd rounds: seed centroids =
    * the `k` lowest-id vectors (deterministic init — production swaps
    * k-means|| sampling, same plan), then repeat [assign every vector
    * to its nearest centroid → recompute quantized element-wise mean
    * centroids]. Per round: one broadcast-assign pass over the corpus
    * (no shuffle of the vectors) and one |k|·dim-row centroid
    * aggregate — the textbook Spark k-means shape, every arithmetic
    * step cross-engine exact. Output: (vec_id, cluster, cos5 to the
    * final centroid) after a final assignment pass. */
  def kmeans(emb: DataFrame, idCol: String, embCol: String, k: Int,
             iters: Int): DataFrame = {
    val e = emb.select(col(idCol).as("id"), asDouble(embCol).as("v"))
    val seeds = e.filter(col("id") < k)
      .select(col("id").cast("long").as("cluster"), col("v").as("cv"))
    var centroids = seeds
    var assigned = assignToCentroids(e, centroids)
    (1 until iters).foreach { _ =>
      centroids = quantizedMeans(assigned)
      assigned = assignToCentroids(e, centroids)
    }
    assigned.select(col("id").as("vec_id"), col("cluster"), col("cos5"))
  }

  /** Two-stage retrieval (the production ANN serving shape): a CHEAP
    * coarse pass over int8-quantized vectors keeps `m` candidates per
    * query, then an exact full-precision cosine re-ranks only those
    * m·|queries| candidates down to top-`k`. The corpus-sized scan
    * touches 4×-smaller codes; full floats are read only for the
    * candidate set (at 100 TB: codes live hot, floats come from a
    * point-lookup-friendly store). Recall ≥ the coarse-only search
    * whenever the true neighbour survives the coarse cut. Output
    * (query_id, rank, neighbor_id, cos5, coarse_rank) — coarse_rank
    * shows how re-ranking reordered the shortlist. */
  def rerankTopK(emb: DataFrame, idCol: String, embCol: String,
                 nQueries: Int, m: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    val dq = quantizeDequantized(emb, idCol, embCol).persist()
    val q = dq.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col("dv").as("qv"))
    val c = dq.select(col(idCol).as("neighbor_id"), col("dv").as("cv"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("cos5q").desc, col("neighbor_id").asc)
    val shortlist = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos5q", cos5(spark, col("qv"), col("cv")))
      .withColumn("coarse_rank", row_number().over(wq).cast("long"))
      .filter(col("coarse_rank") <= m)
      .select("query_id", "neighbor_id", "coarse_rank")
      .persist()
    shortlist.count()
    dq.unpersist()
    // exact re-rank: full-precision vectors only for the shortlist
    val ex = emb.select(col(idCol), asDouble(embCol).as("ev"))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    val out = shortlist
      .join(broadcast(ex.select(col(idCol).as("query_id"),
        col("ev").as("qv"))), "query_id")
      .join(ex.select(col(idCol).as("neighbor_id"), col("ev").as("cv")),
        "neighbor_id")
      .withColumn("cos5", cos5(spark, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos5"), col("coarse_rank"))
      .persist()
    out.count()
    shortlist.unpersist()
    out
  }

  /** IVF with COMPUTED cells: a deterministic representative per cell
    * (the member with min id — a medoid stand-in chosen so both engines
    * agree exactly; a real deployment uses [[cellCentroids]] vectors),
    * each query routed to its nearest representative by cosine, then
    * exact top-k within that one cell. Two bounded joins — queries ×
    * |cells| for routing (broadcast both: tiny), then the cell-restricted
    * probe — never a full corpus scan per query. */
  /** Matryoshka two-stage retrieval (MRL-style): shortlist the top-`m`
    * by cosine over only the first `prefix` dimensions, then re-rank
    * the shortlist with the full vector. The coarse pass reads
    * `prefix/dim` of the data (a 64→16 prefix is a 4× smaller scan —
    * the column-pruned projection `slice(emb, 1, prefix)` means the
    * narrow vectors are all that flows through the broadcast compare),
    * and only |queries|·m full-width vectors are touched in stage two.
    * Both ranking keys are 5-dp-rounded cosines with id tiebreaks, so
    * the pipeline is engine-deterministic end to end. */
  def matryoshkaTopK(emb: DataFrame, idCol: String, embCol: String,
                     prefix: Int, nQueries: Int, m: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    val pre = emb.select(col(idCol),
      slice(asDouble(embCol), 1, prefix).as("pv"))
    val q = pre.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col("pv").as("qpv"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("cos5p").desc, col("neighbor_id").asc)
    val shortlist = pre
      .select(col(idCol).as("neighbor_id"), col("pv").as("cpv"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos5p", cos5(spark, col("qpv"), col("cpv")))
      .withColumn("coarse_rank", row_number().over(wq).cast("long"))
      .filter(col("coarse_rank") <= m)
      .select("query_id", "neighbor_id", "coarse_rank")
    val ex = emb.select(col(idCol), asDouble(embCol).as("ev"))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    shortlist
      .join(broadcast(ex.select(col(idCol).as("query_id"),
        col("ev").as("qv"))), "query_id")
      .join(ex.select(col(idCol).as("neighbor_id"), col("ev").as("cv")),
        "neighbor_id")
      .withColumn("cos5", cos5(spark, col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos5"), col("coarse_rank"))
  }

  /** Recall@k report for the IVF cell-restricted search against the
    * exact brute-force answer — the measurement loop every ANN
    * deployment needs before trusting its index. Per query: `hits` =
    * |IVF top-k ∩ exact top-k| and `recall5` = hits/k. A left join
    * from the exact side keeps 0-hit queries visible. Costs one
    * brute-force pass over the corpus (the thing being audited is the
    * cheap path, so the audit pays the exact price once). */
  def ivfRecall(corpus: DataFrame, queries: DataFrame, idCol: String,
                embCol: String, cellCol: String, k: Int): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, idCol, embCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = ivfTopK(corpus, queries, idCol, embCol, cellCol, k)
      .select(col("query_id"), col("neighbor_id").as("ivf_id"))
    exact
      .join(approx, exact("query_id") === approx("query_id")
        && col("neighbor_id") === col("ivf_id"), "left")
      .groupBy(exact("query_id"))
      .agg(sum(when(col("ivf_id").isNotNull, 1L).otherwise(0L)).as("hits"))
      .select(col("query_id"), col("hits"),
        graft.Oracle.stableRound(
          col("hits").cast("double") / lit(k.toDouble), 5).as("recall5"))
  }

  def ivfComputedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                      embCol: String, cellCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val e = corpus.select(col(idCol).as("neighbor_id"),
      col(cellCol).as("cell"), asDouble(embCol).as("cv"))
    // deterministic representative: the min-id member of each cell
    val repIds = e.groupBy("cell").agg(min("neighbor_id").as("rep_id"))
    val reps = repIds.join(e, repIds("rep_id") === e("neighbor_id"))
      .select(repIds("cell"), col("cv").as("rv"))
    // route each query to its nearest representative (cell asc tiebreak)
    val q = queries.select(col(idCol).as("query_id"), asDouble(embCol).as("qv"))
    val routed = q.crossJoin(broadcast(reps))
      .withColumn("rcos", cos5(spark, col("qv"), col("rv")))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("rcos").desc, col("cell").asc)
    val assigned = routed.withColumn("rr", row_number().over(wr))
      .filter(col("rr") === 1)
      .select(col("query_id"), col("cell"), col("qv"))
    // probe only the assigned cell
    val scored = e.join(broadcast(assigned), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos5", cos5(spark, col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos5").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"),
        col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos5"))
  }
}
