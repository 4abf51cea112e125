package graft.dedup

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Near-duplicate and exact deduplication for LLM training corpora.
  *
  * The load-bearing design rule at 100 TB: NEVER all-pairs. Every
  * pairwise comparison here is gated behind a blocking/bucketing key —
  * MinHash band buckets for [[lshCandidates]], (lang, length-bucket)
  * for [[ngramJaccardPairs]] — so the self-join is an equi-join on the
  * bucket key (hash-shuffle both sides on the key, compare within
  * buckets only). Bucket sizes stay bounded because band keys spread
  * uniformly; a 1000-executor cluster shuffles each doc's O(bands)
  * rows, not O(N²) pairs.
  *
  * Cross-engine determinism AND cheap inner loops: each shingle is
  * md5-hashed ONCE to a 60-bit int (15 hex chars — identical in any
  * md5-bearing engine); everything downstream is integer arithmetic.
  * The k MinHash functions are a pairwise-independent family
  * `h_i(x) = (a_i·hi(x) + b_i·lo(x) + i) mod P` over the two 30-bit
  * halves of x with P = 1073741789 (largest prime < 2^30): every
  * product stays < 2^60, so the arithmetic is overflow-free in BOTH
  * Spark (wrapping) and DuckDB (checked) int64 — bit-identical
  * signatures, candidate sets, and Jaccard ratios. (Round 1 hashed
  * every shingle k times through md5 and took min over hex STRINGS:
  * 12× the md5 calls, string compares in the inner loop, and the
  * whole chain interpreted — 6× slower end-to-end.)
  */
object Dedup {

  /** Largest prime below 2^30 — modulus of the MinHash family. */
  val P = 1073741789L
  private val HalfBits = 1073741824L // 2^30, splits a 60-bit hash

  /** MinHash signature over a column of 60-bit shingle hashes: k
    * pairwise-independent integer hashes, signature = element-wise
    * min. One narrow projection, no shuffle, no md5 in the loop —
    * HOF reference twin of the fused native kernel
    * ([[graft.functions.MinHashSignature]], spec-verified identical). */
  def minhashSignatureReference(hashCol: String, k: Int): Column = expr(
    s"""transform(sequence(0, ${k - 1}),
       |  h -> array_min(transform($hashCol,
       |         x -> (((2654435761 * (h + 1)) % $P) * (x div $HalfBits)
       |              + ((2246822519 * (h + 1)) % $P) * (x % $HalfBits)
       |              + h) % $P)))""".stripMargin)

  /** Banded LSH keys: split the k-wide signature into `bands` bands of
    * `rowsPerBand`, each band keyed by the md5 of its '|'-joined
    * minhash ints (md5 per DOC-band, not per shingle). Docs sharing
    * ANY band key become candidate pairs. */
  def bandKeys(sigCol: String, bands: Int, rowsPerBand: Int): Column = {
    val parts = (1 to rowsPerBand)
      .map(r => s"element_at($sigCol, b * $rowsPerBand + $r)")
      .mkString(", ")
    expr(
      s"""transform(sequence(0, ${bands - 1}),
         |  b -> md5(concat_ws('|', $parts)))""".stripMargin)
  }

  /** docs(idCol, textCol) → (id, shingles) word n-gram STRINGS with the
    * given width. The words array is materialized in its own projection
    * first — inlining `split` into the per-shingle lambda would
    * re-tokenize the whole document for every element_at (O(len²) per
    * doc; measured 10× on the shingle-heavy pipelines). */
  def withShingles(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val grams = (0 until n)
      .map(j => s"element_at(_graft_w, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(col(idCol), split(col(textCol), " ").as("_graft_w"))
      .select(col(idCol), expr(
        s"""CASE WHEN size(_graft_w) >= $n THEN
           |  array_distinct(transform(
           |    sequence(1, size(_graft_w) - ${n - 1}),
           |    i -> $grams))
           |ELSE cast(array() as array<string>) END""".stripMargin).as("shingles"))
  }

  /** docs → (id, shingles: SORTED DISTINCT 60-bit hashes of the word
    * n-grams), via the fused native [[graft.functions.ShingleHashes]]
    * kernel (one md5 per shingle, thread-local digest, in-place
    * sort+dedupe). Sortedness is what lets
    * [[graft.functions.JaccardSorted]] merge-scan instead of building
    * hash sets per pair. */
  def withHashedShingles(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    docs.select(col(idCol),
      GraftFunctions.shingles(docs.sparkSession,
        split(col(textCol), " "), n).as("shingles"))

  /** HOF twin of [[withHashedShingles]] — the auditable built-ins-only
    * form the native kernel is spec-verified against. */
  def withHashedShinglesReference(docs: DataFrame, idCol: String,
                                  textCol: String, n: Int): DataFrame =
    withShingles(docs, idCol, textCol, n)
      .withColumn("shingles", expr(
        """array_sort(array_distinct(transform(shingles,
          |  s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))))"""
          .stripMargin))

  /** LSH candidate pairs (idA < idB) from banded MinHash signatures.
    * Exploded to one row per (doc, band); the self-join is an equi-join
    * on (band index, band key) — the scale-safe bucket join. */
  def lshCandidates(hashed: DataFrame, idCol: String,
                    k: Int = 12, bands: Int = 4): DataFrame = {
    val rowsPerBand = k / bands
    val banded = hashed
      // GUARD: sub-n-token docs have EMPTY shingle sets; without this
      // filter they all share the identical all-null signature (band
      // key md5('')) and the self-join goes O(m²) over them — millions
      // of short rows in a real corpus. They can't be near-dups of
      // anything (Jaccard vs anyone is NaN/0), so drop them up front.
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", GraftFunctions.minhash(
        hashed.sparkSession, col("shingles"), k))
      .select(col(idCol), posexplode(bandKeys("sig", bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
      // persist the (id, band, key) projection: it is O(docs×bands) TINY
      // rows, and without it the self-join recomputes the signature
      // pipeline once per side. At 100 TB this materialization is an
      // intermediate table write.
      .persist()
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_key"))
    // materialize the (tiny) candidate set, then release the banded
    // cache — callers would otherwise leak it (nothing downstream can
    // unpersist an intermediate it never sees)
    val cand = a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .persist()
    cand.count()
    banded.unpersist()
    cand
  }

  /** Exact Jaccard over candidate pairs only: join the (small)
    * candidate set back to the sorted hashed-shingle arrays and
    * merge-scan — int/int division, bit-identical across engines. */
  def jaccardOnCandidates(candidates: DataFrame, hashed: DataFrame,
                          idCol: String, tau: Double): DataFrame = {
    val spark = candidates.sparkSession
    val sa = hashed.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val sb = hashed.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    candidates.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        GraftFunctions.jaccardSorted(spark, col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-duplicate pipeline: shingle → 60-bit hash →
    * integer signature → banded buckets → candidate equi-join →
    * merge-scan exact-Jaccard verify. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 12, bands: Int = 4,
                      tau: Double = 0.8): DataFrame = {
    // persisted because BOTH the candidate generation and the verify
    // join read it; rows are (id, ~50 longs) — tiny relative to text
    val sh = withHashedShingles(docs, idCol, textCol, n).persist()
    val cand = lshCandidates(sh, idCol, k, bands)
    // materialize the final (near-dup pairs, tiny) result so the two
    // intermediates can be released instead of leaking per invocation
    val result = jaccardOnCandidates(cand, sh, idCol, tau).persist()
    result.count()
    sh.unpersist(); cand.unpersist()
    result
  }

  /** Threshold-sweep report: near-dup pair counts at several Jaccard
    * thresholds in ONE pass over the LSH candidate set — the dial-
    * setting diagnostic run before committing a corpus to a τ (too
    * low: real content merged; too high: boilerplate survives). The
    * candidate set and exact Jaccards are computed once; each pair
    * then fans out to the thresholds it clears (explode over a
    * 5-element literal array — cost is |pairs|·|taus| tiny rows).
    * Candidates come from the SAME banding as [[minhashNearDups]], so
    * counts at τ below the banding's design point are recall-bounded
    * by the LSH curve — that is the point of the report. */
  def tauSweep(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 3, k: Int = 12, bands: Int = 4,
               taus: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)): DataFrame = {
    val sh = withHashedShingles(docs, idCol, textCol, n).persist()
    val cand = lshCandidates(sh, idCol, k, bands)
    val j = jaccardOnCandidates(cand, sh, idCol, tau = taus.min).persist()
    j.count()
    sh.unpersist(); cand.unpersist()
    j.select(col("jaccard"),
        explode(array(taus.map(lit): _*)).as("tau"))
      .filter(col("jaccard") >= col("tau"))
      .groupBy(col("tau"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Estimator-quality report: for every LSH candidate pair, the
    * MinHash SIGNATURE similarity (matching components / k — the
    * unbiased Jaccard estimator the banding scheme is built on) next
    * to the EXACT merge-scan Jaccard, plus the absolute error.
    * "Measure, don't guess" for the sketch itself: the error column
    * is what justifies (or indicts) a chosen k at corpus scale.
    * All three outputs are exact small-int ratios on identical
    * inputs — engine-identical with no rounding. */
  def minhashEstimateQuality(docs: DataFrame, idCol: String,
                             textCol: String, n: Int = 3, k: Int = 12,
                             bands: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val sh = withHashedShingles(docs, idCol, textCol, n).persist()
    val sig = sh.filter(size(col("shingles")) > 0)
      .withColumn("sig", GraftFunctions.minhash(spark, col("shingles"), k))
    val cand = lshCandidates(sh, idCol, k, bands)
    val a = sig.select(col(idCol).as("id_a"), col("shingles").as("sh_a"),
      col("sig").as("sig_a"))
    val b = sig.select(col(idCol).as("id_b"), col("shingles").as("sh_b"),
      col("sig").as("sig_b"))
    val matches = expr(
      """aggregate(zip_with(sig_a, sig_b,
        |  (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
        |  0, (acc, v) -> acc + v)""".stripMargin)
    val result = cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        (matches.cast("double") / lit(k.toDouble)).as("sig_est"),
        GraftFunctions.jaccardSorted(spark, col("sh_a"), col("sh_b"))
          .as("jaccard"))
      .withColumn("abs_err", abs(col("sig_est") - col("jaccard")))
      .persist()
    result.count()
    sh.unpersist(); cand.unpersist()
    result
  }

  /** Benchmark decontamination: flag every corpus doc sharing at least
    * one word n-gram with a (small) benchmark set. Both sides reduce to
    * DISTINCT 60-bit n-gram hashes; the join is an equi-join on the
    * hash with the benchmark side broadcast (eval suites are tiny
    * relative to a training corpus), then one aggregate per flagged
    * doc. Never ships document text — at 100 TB each doc contributes
    * |ngrams| longs and only matching ones survive the join. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame) =
      withHashedShingles(df, idCol, textCol, n)
        .select(col(idCol), explode(col("shingles")).as("gram"))
    val bench = grams(benchmark).select("gram").distinct()
    grams(corpus)
      .join(broadcast(bench), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  /** Bloom-pruned decontamination — same EXACT result as
    * [[decontaminate]], different physical plan for the 100 TB case
    * where even the corpus side's exploded n-gram stream is too big to
    * ship to a join: build a Bloom filter over the benchmark's gram
    * hashes (distributed build, merged bit sets), probe it inside the
    * corpus scan via the codegen'd [[graft.functions.BloomProbe]]
    * kernel, and only grams that MIGHT match (fpp-bounded) reach the
    * exact broadcast join that removes false positives. The filter is
    * a few MB broadcast to every task; non-matching grams — the
    * overwhelming majority — die inside whole-stage codegen without
    * ever being shuffled, exchanged, or even row-materialized. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, n: Int,
                         fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    def grams(df: DataFrame) =
      withHashedShingles(df, idCol, textCol, n)
        .select(col(idCol), explode(col("shingles")).as("gram"))
    val bench = grams(benchmark).select("gram").distinct().persist()
    val nGrams = math.max(bench.count(), 1L)
    val filter = bench.select("gram").rdd.map(_.getLong(0))
      .treeAggregate(BloomFilter.create(nGrams, fpp))(
        (f, v) => { f.putLong(v); f },
        (a, b) => a.mergeInPlace(b))
    val bytes = graft.functions.BloomProbe.serialize(filter)
    val result = grams(corpus)
      .filter(GraftFunctions.bloomProbe(spark, col("gram"), bytes))
      .join(broadcast(bench), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
      .persist()
    result.count()
    bench.unpersist()
    result
  }

  /** SimHash near-duplicate pairs: 32-bit SimHash per doc, banded into
    * four 8-bit bands; docs sharing ANY (band, byte) bucket become
    * candidates; exact verify keeps pairs with Hamming distance ≤
    * `maxHamming` of the full hash. Pigeonhole gives EXACT recall: ≤ 3
    * flipped bits can touch at most 3 of the 4 bands, so one band is
    * always untouched and the pair always shares a bucket.
    *
    * Scale: the self-join is an equi-join on (band, byte) — 4×256
    * buckets here (demo width; production widens to a 64-bit SimHash
    * with 16-bit bands = 65536 buckets/band, same plan). Never
    * all-pairs: each doc contributes `bands` rows to the shuffle. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val bits = 32; val bands = 4; val bandBits = bits / bands
    // relational simhash (explode + codegen'd vote sums) — the nested-
    // HOF form recomputes every token's md5 per bit after projection
    // collapse (32x redundant hashing, measured 11 s vs 0.5 s here)
    val sh = graft.text.TextOps
      .simhashAggK(docs.select(col(idCol).as("id"), col(textCol)),
        "id", textCol, bits)
    val banded = sh
      .select(col("id"), col("sh"), posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> shiftright(sh, b * $bandBits) % ${1 << bandBits})"""
          .stripMargin)))
      .select(col("id"), col("sh"), col("pos").as("band"),
        col("col").as("bkey"))
    // CPU-vs-bytes mismatch guard (r17): the banded self-join EXPLODES
    // pairs inside each bucket — CPU grows with the pair count while
    // the cached/shuffled BYTES stay tiny, so letting AQE re-plan the
    // CACHED plans here (cached-plan AQE is on session-wide) coalesces
    // them to 1–3 tasks by size and the pair explosion runs
    // near-serial (bench-caught: 1.5 s → 6.9 s; alternates measured —
    // dropping the cache re-plans the join as a BroadcastHashJoin
    // whose two children each recompute the whole simhash pipeline,
    // 4.2 s). The persist itself is load-bearing (it is what computes
    // the simhash once), so the cached-plan re-planning is scoped OFF
    // for exactly these caches and restored after.
    val sess = docs.sparkSession
    val aqeCacheKey =
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val prevAqeCache = sess.conf.getOption(aqeCacheKey)
    sess.conf.set(aqeCacheKey, "false")
    try {
      val cached = banded.persist()
      val a = cached.select(col("id").as("doc_a"), col("sh").as("sh_a"),
        col("band"), col("bkey"))
      val b = cached.select(col("id").as("doc_b"), col("sh").as("sh_b"),
        col("band"), col("bkey"))
      // hamming BEFORE distinct: the xor/popcount is a codegen'd bit
      // op on the join output, so the dedup shuffle carries only pairs
      // that already passed the radius cut (the large majority fail
      // it) — and a pair meeting in several bands has one hamming
      // value, so distinct-on-(pair, hamming) ≡ distinct-on-pair
      val result = a.join(b, Seq("band", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("hamming",
          expr("cast(bit_count(sh_a ^ sh_b) as bigint)"))
        .filter(col("hamming") <= maxHamming)
        .select("doc_a", "doc_b", "hamming").distinct()
        .persist()
      result.count()
      cached.unpersist()
      result
    } finally prevAqeCache match {
      case Some(v) => sess.conf.set(aqeCacheKey, v)
      case None => sess.conf.unset(aqeCacheKey)
    }
  }

  /** Partition-local union-find: parent map with path compression and
    * union-by-min, so the root of every set IS the set's minimum id. */
  private final class UnionFind {
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
  }

  /** One contraction round: per partition, union-find over the local
    * edges, emit the star forest (v → local root) — exact connectivity
    * in ≤ (local vertices − local components) edges. */
  private def localForest(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val uf = new UnionFind
    it.foreach { case (a, b) => if (a != b) uf.union(a, b) }
    uf.parent.keysIterator.flatMap { v =>
      val r = uf.find(v)
      if (r != v) Iterator((v, r)) else Iterator.empty
    }
  }

  /** Final round on a single partition: label EVERY vertex (roots
    * included) with its component minimum. */
  private def localLabels(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val uf = new UnionFind
    it.foreach { case (a, b) => if (a != b) uf.union(a, b) }
    uf.parent.keysIterator.map(v => (v, uf.find(v)))
  }

  /** Connected components over an undirected edge list, labelled with
    * the per-component minimum vertex id. Output columns (id, label),
    * one row per non-isolated vertex.
    *
    * Algorithm: iterative TREE CONTRACTION, not label propagation.
    * Each round repartitions the edge list with geometric fan-in (32×
    * fewer partitions) and runs an in-memory union-find per partition,
    * emitting the local star forest (v → component-min root) — exact
    * connectivity preserved in ≤ local-vertices edges. Once the
    * surviving forest fits one task (`maxLocalEdges`, default 2²⁶ ≈
    * 67 M edges ≈ 1 GB of long pairs), a single-partition union-find
    * labels every vertex. Star forests emit EVERY non-isolated local
    * vertex, so no vertex is lost across rounds.
    *
    * Scale: rounds = log₃₂(input partitions) — 3-4 jobs for a 100 k-
    * partition scan, each a straight repartition+mapPartitions with no
    * join and no per-diameter driver sync. Min-label JOIN propagation
    * needs DIAMETER rounds (near-dup graphs are frequently chain-
    * shaped: A≈B≈C… with no A≈C edge — a 19-hop chain profiled at 19
    * shuffled rounds); pointer doubling (Kiveris et al. 2014) still
    * needed 11. Contraction is 2 jobs on the same graph. For the
    * adversarial case where even the contracted forest exceeds
    * `maxLocalEdges` (≳ 2²⁶ vertices in CLUSTERS — a corpus whose
    * near-dup graph has billions of linked docs), the join loop with
    * pointer jumping runs as the fallback on the CONTRACTED edges,
    * whose star shape keeps its round count O(log) regardless of the
    * original diameter. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50,
                          maxLocalEdges: Long = 1L << 26): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // materialize the edge list once: every round (and the fallback)
    // re-reads it, and upstream is typically a whole LSH pipeline
    var e = edges.select(col(aCol).cast(LongType), col(bCol).cast(LongType))
      .as[(Long, Long)].filter(t => t._1 != t._2)
      .localCheckpoint(true)
    var cnt = e.count()
    var parts = math.max(e.rdd.getNumPartitions, 1)
    // Wide scans first contract IN PLACE (mapPartitions, no shuffle):
    // each partition's edges collapse to its star forest (≤ local
    // vertices) BEFORE any fan-in merges 32 partitions into one task —
    // without this, the first merged round would hold 32 partitions of
    // RAW edges in one union-find; after it, only forest edges ride
    // the shuffle. At bench scale (≤ 32 partitions) it's skipped.
    if (cnt > maxLocalEdges && parts > 32) {
      e = e.mapPartitions(localForest _).localCheckpoint(true)
      cnt = e.count()
    }
    // fan-in only while it SHRINKS and real parallelism remains: the
    // loop must never collapse an above-guard edge set into one task
    // (that single-task union-find is exactly what the guard exists to
    // prevent — the join-loop fallback below handles that case), and a
    // non-shrinking round (adversarial matching-like graphs) means
    // further fan-in only concentrates memory without progress.
    var prev = Long.MaxValue
    while (cnt > maxLocalEdges && parts > 32 && cnt < prev) {
      prev = cnt
      parts = math.max(32, parts / 32)
      e = e.repartition(parts).mapPartitions(localForest _)
        .localCheckpoint(true)
      cnt = e.count()
    }
    if (cnt <= maxLocalEdges) {
      e.repartition(1).mapPartitions(localLabels _)
        .toDF("id", "label")
    } else {
      connectedComponentsByPropagation(e.toDF("src", "dst"), maxIter)
    }
  }

  /** Join-based min-label propagation with pointer jumping — the
    * beyond-single-task fallback of [[connectedComponents]]. Each round:
    * label ← min(label, neighbours' labels), then label ← label[label]
    * (pointer doubling halves the remaining propagation distance, so
    * rounds = O(log diameter) — and on contracted star forests the
    * effective diameter is already O(rounds of contraction)).
    * `localCheckpoint` per round truncates the exponentially-growing
    * lineage; the convergence bit rides inside the checkpointed round
    * so the check is a scan, not an extra join. */
  private[graft] def connectedComponentsByPropagation(
      edges: DataFrame, maxIter: Int): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
    val sym = und
      .union(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"),
          col("label").as("nlabel")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nlabel")).as("nbr_label"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("mid"))
        .localCheckpoint(true)
      // `mid` is always a vertex id (labels only take vertex-id
      // values), so label[label] is a self-equi-join; left join +
      // coalesce guards the self-labelled roots
      val jmp = least(col("mid"), coalesce(col("jump"), col("mid")))
      val next = stepped
        .join(stepped.select(col("id").as("mid"), col("mid").as("jump")),
          Seq("mid"), "left")
        .select(col("id"), jmp.as("label"), (jmp < col("prev")).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("id", "label")
      iter += 1
    }
    sym.unpersist()
    // silent non-convergence would split one real component into
    // several canonical ids — a correctness failure downstream "keep
    // canonical only" can't detect. Fail loud.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "graph diameter exceeds maxIter")
    labels
  }

  /** Near-duplicate GROUPS: MinHash-LSH pairs → connected components →
    * (doc, canonical = component-min doc, cluster size). This is the
    * step a real corpus dedup needs after pair generation — "keep one
    * doc per cluster" is canonical_id = doc_id. */
  def dedupGroups(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, k: Int = 12, bands: Int = 4,
                  tau: Double = 0.8): DataFrame = {
    val pairs = minhashNearDups(docs, idCol, textCol, n, k, bands, tau)
    val cc = connectedComponents(pairs, "doc_a", "doc_b")
    // cc's labels are localCheckpointed (materialized) — the persisted
    // pair set minhashNearDups returned can be released now
    pairs.unpersist()
    cc.select(col("id").as("doc_id"), col("label").as("canonical_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("canonical_id")))
  }

  /** Incremental (new-batch-vs-corpus) near-dup admission — the
    * production shape of corpus dedup: an arriving batch is checked
    * against the ALREADY-ACCEPTED corpus, not against itself. Both
    * sides get MinHash band keys; the candidate join is new×corpus on
    * (band, key) — at 100 TB the corpus side's banded projection is a
    * precomputed index table partitioned by band key, so each arriving
    * batch shuffles only its own O(batch×bands) rows against it. Exact
    * Jaccard verifies candidates; output is EVERY new doc with its
    * corpus near-dup count, best match (jmax5, 0.0 when clean), and
    * the admission bit. */
  def incrementalNearDups(newDocs: DataFrame, corpus: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 3, k: Int = 12, bands: Int = 4,
                          tau: Double = 0.8): DataFrame = {
    val spark = newDocs.sparkSession
    val rowsPerBand = k / bands
    def hashed(df: DataFrame) =
      withHashedShingles(df, idCol, textCol, n)
        .filter(size(col("shingles")) > 0)
    def banded(df: DataFrame, side: String) =
      df.withColumn("sig", GraftFunctions.minhash(spark, col("shingles"), k))
        .select(col(idCol).as(side),
          posexplode(bandKeys("sig", bands, rowsPerBand)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_key")
    // the band join + distinct ship only (id, band, key) rows — the
    // shingle arrays join back AFTER the pair set is deduped, so a doc
    // matching in several bands never ships its array per band
    val newSh = hashed(newDocs).persist()
    val oldSh = hashed(corpus).persist()
    val cand = banded(newSh, "new_id")
      .join(banded(oldSh, "old_id"), Seq("band", "band_key"))
      .select("new_id", "old_id").distinct()
      .join(newSh.select(col(idCol).as("new_id"),
        col("shingles").as("sh_new")), "new_id")
      .join(oldSh.select(col(idCol).as("old_id"),
        col("shingles").as("sh_old")), "old_id")
      .withColumn("jaccard",
        GraftFunctions.jaccardSorted(spark, col("sh_new"), col("sh_old")))
      .filter(col("jaccard") >= tau)
    val dupStats = cand.groupBy(col("new_id").as(idCol))
      .agg(count(lit(1)).as("n_near_dups"),
        // stableRound, not round: jaccard is a small-int ratio that can
        // land on decimal half-points where engine round()s split
        graft.Oracle.stableRound(max(col("jaccard")), 5).as("jmax5"))
    val result = newDocs.select(col(idCol))
      .join(dupStats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        coalesce(col("jmax5"), lit(0.0)).as("jmax5"),
        coalesce(col("n_near_dups"), lit(0L)).equalTo(0L).as("admit"))
      .persist()
    result.count()
    newSh.unpersist(); oldSh.unpersist()
    result
  }

  /** Quality-ranked canonical per near-dup cluster: [[dedupGroups]]
    * clusters, but the keeper is the BEST-quality member (quality desc,
    * id asc tiebreak), not the min id — "dedup keeping the longest/
    * cleanest copy", which is what corpus curation actually wants. Adds
    * one broadcast-scale join of the (tiny) cluster table back to the
    * quality column and one window over clusters. Output (doc_id,
    * cluster_id = component-min label, keeper_id, keep). */
  def qualityCanonical(docs: DataFrame, idCol: String, textCol: String,
                       qualityCol: String, n: Int = 3, k: Int = 12,
                       bands: Int = 4, tau: Double = 0.8): DataFrame = {
    val groups = dedupGroups(docs, idCol, textCol, n, k, bands, tau)
      .select(col(idCol), col("canonical_id").as("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    groups.join(docs.select(col(idCol), col(qualityCol)), idCol)
      .withColumn("keeper_id", first(col(idCol)).over(w))
      .select(col(idCol), col("cluster_id"), col("keeper_id"),
        (col(idCol) === col("keeper_id")).as("keep"))
  }

  /** Corpus-level duplicated-span statistics (the signal behind
    * span-level dedup à la Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"): for every doc, how many of
    * its distinct word `n`-gram spans also occur in at least one OTHER
    * document. High dup_ratio docs are templated/boilerplate content.
    *
    * Scale: spans are 60-bit hashes (8 B each, never strings); one
    * shuffle on the span hash builds corpus-wide doc-frequencies with
    * map-side combine (per-doc-distinct spans mean count(*) IS the doc
    * frequency), one equi-join back tags shared spans, one per-doc
    * aggregate finishes. No pairwise anything. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 5): DataFrame = {
    val grams = withHashedShingles(docs, idCol, textCol, n)
      .select(col(idCol), size(col("shingles")).cast(LongType).as("n_spans"),
        explode_outer(col("shingles")).as("gram"))
    val shared = grams.groupBy("gram").agg(count(lit(1)).as("span_df"))
      .filter(col("span_df") >= 2)
    grams.join(shared, Seq("gram"), "left")
      .groupBy(col(idCol), col("n_spans"))
      .agg(count(col("span_df")).as("n_dup_spans"))
      .select(col(idCol), col("n_spans"), col("n_dup_spans"),
        when(col("n_spans") === 0, lit(0.0))
          // stableRound, not round: k/n with n divisible by 64 lands on
          // decimal half-points where engine round()s split
          .otherwise(graft.Oracle.stableRound(
            col("n_dup_spans").cast("double") / col("n_spans"), 5))
          .as("dup_ratio"))
  }

  /** SPAN-LEVEL dedup with actual removal (Lee et al. 2022's ExactSubstr
    * made corpus-shaped): cut from every document each word position
    * covered by an `n`-gram that also occurs in at least one OTHER
    * document, and reassemble the surviving words in order. [[dupSpans]]
    * is the measurement; this is the scrub. The cut is symmetric (all
    * occurrences go, including the "first" — the published finding is
    * that repeated sequences are memorization fuel wherever they sit).
    *
    * Returns (id, clean_text, n_kept, n_cut) for every input doc — a
    * fully scrubbed doc keeps the row with clean_text = ''.
    *
    * Scale: gram strings never shuffle — positions ride 60-bit md5
    * hashes (8 B). Three key-partitioned shuffles total: (gram → doc
    * frequency, map-side partial after a per-doc distinct), (gram ⋈
    * duplicated grams, broadcast-eligible when the dup set is small),
    * (doc id → covered-position merge + reassembly). No all-pairs, no
    * suffix array: an n-gram table IS the Lee et al. suffix-array
    * query for fixed n, and fixed n is what a distributed scrub wants
    * (bounded key width, bounded state). */
  def scrubDupSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 5): DataFrame = {
    val tok = docs.select(col(idCol), split(col(textCol), " ").as("w"))
      .withColumn("nw", size(col("w")))
    // positional gram hashes: starts i = 0..nw-n (none when nw < n)
    val grams = tok.select(col(idCol), col("nw"),
        posexplode(when(col("nw") >= n, expr(
          s"""transform(sequence(0, nw - $n), i ->
             |  cast(conv(substring(md5(concat_ws(' ',
             |    slice(w, i + 1, $n))), 1, 15), 16, 10) as bigint))"""
            .stripMargin))
          .otherwise(expr("cast(array() as array<bigint>)"))))
      .select(col(idCol), col("pos"), col("col").as("gram"))
    // corpus doc-frequency on the hash: per-doc distinct first, so
    // count(*) IS the distinct-doc frequency (map-side combinable)
    val dup = grams.select(col(idCol), col("gram")).distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("gram")
    // word positions covered by any duplicated gram
    val covered = grams.join(dup, Seq("gram"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("widx"))
      .distinct()
    // reassemble the survivors in order
    val words = tok.select(col(idCol), col("nw"),
        posexplode(col("w")).as(Seq("widx", "word")))
    val kept = words.join(covered, Seq(idCol, "widx"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("widx"), col("word")))),
          x => x("word")), " ").as("clean_text"))
    tok.select(col(idCol), col("nw"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("nw").cast(LongType) - coalesce(col("n_kept"), lit(0L)))
          .as("n_cut"))
  }

  /** Exact (hash-keyed) dedup: group by content md5, keep min id and
    * copy count. The groupBy gets map-side partial aggregation; at
    * 100 TB this is one shuffle on a 32-hex key. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Blocked n-gram Jaccard: pairwise word-bigram Jaccard, but only
    * within (lang, token-length bucket) blocks. The probe side is
    * exploded to its own and both adjacent length buckets so near-dups
    * straddling a boundary are still compared, and the join is a pure
    * equi-join on (lang, bucket) — the blocked analog of the LSH
    * bucket join; each pair matches exactly once because
    * lb_b − lb_a ∈ {−1, 0, 1} picks a unique probe row. */
  /** Asymmetric CONTAINMENT pairs on the LSH candidates — |A∩B|/|A|
    * and |A∩B|/|B| for every banded-MinHash candidate pair with either
    * side ≥ `tau`. The VERIFY stage is where this differs from
    * [[minhashNearDups]]: a short doc swallowed by a long one has
    * diluted jaccard (fails the 0.8 cut) but one-sided containment
    * 1.0. Candidate RECALL is still the minhash bands' — a band
    * collides with probability ≈ containment³ — so this catches
    * large-fraction excerpts; exhaustive small-excerpt detection needs
    * the span-level pass ([[dupSpans]]). Never all-pairs. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       tau: Double): DataFrame = {
    val sh = withHashedShingles(docs, idCol, textCol, 3)
      .filter(size(col("shingles")) > 0)
    val cand = lshCandidates(sh, idCol)
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    cand
      .join(sh.select(col(idCol).as("id_a"), col("shingles").as("sa")),
        "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingles").as("sb")),
        "id_b")
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        (inter / size(col("sa"))).as("ca"),
        (inter / size(col("sb"))).as("cb"))
      .filter(greatest(col("ca"), col("cb")) >= tau)
      .select(col("doc_a"), col("doc_b"),
        graft.Oracle.stableRound(col("ca"), 5).as("cont_a5"),
        graft.Oracle.stableRound(col("cb"), 5).as("cont_b5"))
  }

  /** IDF-WEIGHTED Jaccard on the LSH candidates — shared boilerplate
    * grams (high df, near-zero idf) stop inflating similarity, shared
    * RARE grams dominate: Σidf(∩) / Σidf(∪). The weighting is the
    * standard soft-dedup upgrade when corpora share templates. IDF is
    * smoothed ln((N+1)/(df+1)) quantized to 1e-9 BIGINTs, so every
    * per-pair sum is integer-exact; one division at the end. Work is
    * candidate-bounded (never all-pairs). */
  def weightedJaccardPairs(docs: DataFrame, idCol: String,
                           textCol: String, tau: Double): DataFrame = {
    // the shingle kernel's output feeds FIVE consumers (idf, both gw
    // branches, the id_b gram probe, candidate generation) — persist
    // it once instead of re-hashing the corpus per branch. At 100 TB
    // this materialization is the dedup pass's intermediate table.
    val sh = withHashedShingles(docs, idCol, textCol, 3)
      .filter(size(col("shingles")) > 0)
      .persist()
    val g = sh.select(col(idCol).as("gid"), explode(col("shingles"))
      .as("gram"))
    // N rides the plan as a broadcast scalar aggregate — no separate
    // driver-side count() pass over the corpus
    val nd = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val idf = g.groupBy("gram").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd))
      .select(col("gram"),
        floor(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
          * lit(1e9) + lit(0.5)).cast(LongType).as("w"))
    val cand = lshCandidates(sh, idCol)
    // df counts must see the WHOLE corpus (idf is a global statistic),
    // but gram WEIGHTS only matter for docs that appear in some
    // candidate pair — semi-join the gram table down to candidate doc
    // ids before paying the gram⋈idf join. At 100 TB the near-dup
    // candidate set is a small fraction of the corpus, so per-doc
    // weight maps materialize for that fraction only. No broadcast
    // hint: the candidate-id cardinality is data-dependent, so let
    // AQE pick broadcast vs shuffle from the measured size.
    val candIds = cand.select(col("id_a").as("gid"))
      .union(cand.select(col("id_b").as("gid"))).distinct()
    val gc = g.join(candIds, Seq("gid"), "left_semi")
    // ONE groupBy builds everything pair scoring needs per doc: the
    // gram→weight map and Σw. The pair-level intersection sum then
    // needs NO gram-level join at all — it is a codegen'd HOF over
    // array_intersect of the two docs' gram keys, looking weights up
    // in the a-side map. (The earlier form joined candidates back to
    // the gram table and re-aggregated per pair: one extra shuffle of
    // candidate-fanout × grams rows, and the dominant q173 cost.)
    val docws = gc.join(idf, "gram")
      .groupBy("gid")
      .agg(sum("w").as("dw"),
        map_from_entries(collect_list(struct(col("gram"), col("w"))))
          .as("wmap"))
      .persist()
    val wsExpr = aggregate(
      array_intersect(map_keys(col("wmap_a")), map_keys(col("wmap_b"))),
      lit(0L),
      (acc, gram) => acc + element_at(col("wmap_a"), gram))
    val out = cand
      .join(docws.select(col("gid").as("id_a"), col("dw").as("wa"),
        col("wmap").as("wmap_a")), "id_a")
      .join(docws.select(col("gid").as("id_b"), col("dw").as("wb"),
        col("wmap").as("wmap_b")), "id_b")
      .withColumn("ws", wsExpr)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        graft.Oracle.stableRound(col("ws").cast("double")
          / (col("wa") + col("wb") - col("ws")).cast("double"), 5)
          .as("wj5"))
      .filter(col("wj5") >= tau)
      // materialize the (tiny) pair result, then release the
      // intermediates — same leak-avoidance pattern as lshCandidates
      .persist()
    out.count()
    sh.unpersist()
    docws.unpersist()
    out
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, tau: Double): DataFrame = {
    val spark = docs.sparkSession
    // 60-bit hashed sorted shingles: the pair join ships ~8 B/shingle
    // instead of ~25 B strings, and the jaccard is a codegen'd merge
    // scan — the dominant cost of blocked pairwise Jaccard is
    // moving/comparing the shingle sets, not hashing them.
    val sh = withHashedShingles(docs, idCol, textCol, n = 2)
      .join(docs.select(col(idCol), col(langCol),
        // explicit floor: Spark `/` is double division and its long cast
        // truncates, DuckDB's rounds — floor() agrees everywhere
        floor(size(split(col(textCol), " ")) / lit(16)).cast(LongType)
          .as("lbucket")), idCol)
    val a = sh.select(col(idCol).as("id_a"), col("shingles").as("sh_a"),
        col(langCol).as("lang"), col("lbucket"))
      .withColumn("probe_bucket",
        explode(array(col("lbucket") - 1, col("lbucket"), col("lbucket") + 1)))
      .drop("lbucket")
    val b = sh.select(col(idCol).as("id_b"), col("shingles").as("sh_b"),
      col(langCol).as("lang"), col("lbucket").as("probe_bucket"))
    a.join(b, Seq("lang", "probe_bucket"))
      .filter(col("id_a") < col("id_b"))
      // size-ratio prefilter: jaccard = |∩|/|∪| ≤ min(|A|,|B|)/max, so
      // jaccard ≥ τ forces the smaller set to be ≥ τ× the larger. Two
      // array-header reads kill most blocked pairs BEFORE the O(|A|+|B|)
      // merge scan — Catalyst pushes this below the jaccard projection,
      // and it dominated the blocked-pairwise runtime (most pairs in a
      // (lang, length) block are nowhere near τ).
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double")
        >= lit(tau) * greatest(size(col("sh_a")), size(col("sh_b"))))
      // BOTH-empty pairs slip the ratio gate (0 >= τ·0) and then
      // jaccard = 0/0 = NaN, which Spark's comparison semantics order
      // ABOVE every double — `NaN >= τ` is TRUE and the pair would
      // survive here while the DuckDB twin's NULL division drops it.
      // Two one-token docs in the same (lang, bucket-0) block reach
      // this; gate them out explicitly.
      .filter(greatest(size(col("sh_a")), size(col("sh_b"))) > 0)
      .withColumn("jaccard",
        GraftFunctions.jaccardSorted(spark, col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("lang"), col("jaccard"))
  }
}
