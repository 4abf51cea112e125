package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` fixture (doc_id, text, lang, source, n_chars).
  *
  * These are the four text ops a 100 TB corpus pipeline needs before
  * anything model-shaped happens: tokenization stats, language ID,
  * quality scoring, and content fingerprinting. All of them are pure
  * per-row projections (narrow, no shuffle, whole-stage codegen) built
  * from `org.apache.spark.sql.functions` higher-order functions — at
  * scale they stream through the scan at parquet-read speed and any
  * aggregate on top gets map-side partial aggregation for free.
  *
  * Cross-engine determinism (DuckDB oracle, cf. graft.Oracle):
  *  - token arithmetic is integer-exact on both engines;
  *  - hashes route through md5 (identical lowercase hex in both);
  *  - per-row double math is identical IEEE expressions on identical
  *    inputs — no cross-row double accumulation anywhere here.
  */
object TextOps {

  /** Whitespace tokenization. The fixture text is single-space
    * separated; `split` on one space matches DuckDB `string_split`. */
  def words(text: Column): Column = split(text, " ")

  /** Sliding-window CHUNKING — the doc→chunk fan-out every
    * RAG/embedding pipeline runs before vectorizing: chunks of
    * `chunkSize` words advancing by `chunkSize - overlap`, last chunk
    * truncated, every word covered, consecutive chunks sharing
    * `overlap` words. Output one row per (doc, chunk):
    * `idCol, chunk_idx, chunk_text, n_words`.
    *
    * Entirely codegen'd column algebra (split → sequence → explode →
    * slice → array_join) — no UDF, no shuffle: the fan-out happens
    * inside the scan's stage, so at 100 TB each input split expands
    * locally and flows straight into the next operator (embedding,
    * dedup, indexing) without ever collecting a document. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && chunkSize > overlap,
      s"need 0 <= overlap < chunkSize, got $overlap/$chunkSize")
    val step = chunkSize - overlap
    docs.select(col(idCol), words(col(textCol)).as("_w"))
      .select(col(idCol), col("_w"),
        explode(sequence(lit(0),
          floor((size(col("_w")) - 1) / step).cast("int"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_w"),
          col("chunk_idx") * step + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        (least(col("chunk_idx") * step + chunkSize, size(col("_w")))
          - col("chunk_idx") * step).cast("long").as("n_words"))
  }

  /** Benchmark CONTAMINATION check — the n-gram-overlap decontamination
    * gate every serious training-data pipeline runs (the GPT-3/Gopher
    * appendix methodology, rebuilt relationally): a training document
    * is contaminated if it shares any `n`-word shingle with the
    * benchmark partition (`benchPred` rows). Returns one row per
    * contaminated training doc: `idCol, n_shared_shingles` (distinct
    * shared shingles).
    *
    * Scale: shingling is the same in-scan fan-out as [[chunkDocs]]
    * (no shuffle); the benchmark shingle set is benchmark-sized —
    * tiny against a 100 TB corpus — so the membership test is a
    * BROADCAST semi-join: the corpus never shuffles, each shingle
    * pays a hash probe. (At extreme benchmark sizes, xxhash64 the
    * shingles on both sides and semi-join the 8-byte hashes instead
    * of the strings — same plan, smaller broadcast; exact strings
    * kept here for oracle parity.) */
  def shingleContamination(docs: DataFrame, idCol: String,
                           textCol: String, n: Int,
                           benchPred: Column): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val sh = docs
      .select(col(idCol), benchPred.as("_bench"),
        words(col(textCol)).as("_w"))
      .filter(size(col("_w")) >= n)
      .select(col(idCol), col("_bench"), col("_w"),
        explode(sequence(lit(0), (size(col("_w")) - n).cast("int")))
          .as("_i"))
      .select(col(idCol), col("_bench"),
        array_join(slice(col("_w"), col("_i") + 1, lit(n)), " ")
          .as("shingle"))
    val bench = sh.filter(col("_bench")).select(col("shingle")).distinct()
    sh.filter(!col("_bench"))
      .join(broadcast(bench), Seq("shingle"), "left_semi")
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"))
  }

  /** Zipf fit over the corpus vocabulary: least-squares slope and
    * intercept of ln(freq) ~ ln(rank) for the top-`topR` tokens by
    * frequency — the rank-frequency power-law diagnostic (healthy
    * natural-language corpora sit near slope −1; templated/synthetic
    * corpora flatten or cliff).
    *
    * Scale: one shuffle builds token frequencies (map-side combine);
    * the top-R cut is a distributed TakeOrdered (per-partition top-R,
    * merged — never a global sort of the vocabulary); the regression
    * runs on R rows. Cross-engine: ln values are quantized to exact
    * 1e-9-scaled BIGINTs BEFORE summing (floor(x·1e9+0.5) — identical
    * IEEE ops on identical doubles), so the sums are integer-exact and
    * order-independent on both engines; the closed-form solve then
    * happens on identical doubles. Single-row output
    * (n_ranks, slope5, intercept5). */
  def zipfFit(docs: DataFrame, textCol: String, topR: Int): DataFrame = {
    val scale = 1e9
    val freq = docs.select(explode(words(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val top = freq.orderBy(col("freq").desc, col("tok").asc).limit(topR)
    val ranked = top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("tok").asc)))
    val q = ranked.select(
      log(col("rank").cast(DoubleType)).as("x"),
      log(col("freq").cast(DoubleType)).as("y"))
    val sums = q.select(
        floor(col("x") * scale + 0.5).cast(LongType).as("xq"),
        floor(col("y") * scale + 0.5).cast(LongType).as("yq"),
        floor(col("x") * col("y") * scale + 0.5).cast(LongType).as("xyq"),
        floor(col("x") * col("x") * scale + 0.5).cast(LongType).as("xxq"))
      .agg(count(lit(1)).cast(DoubleType).as("n"),
        (sum("xq").cast(DoubleType) / scale).as("sx"),
        (sum("yq").cast(DoubleType) / scale).as("sy"),
        (sum("xyq").cast(DoubleType) / scale).as("sxy"),
        (sum("xxq").cast(DoubleType) / scale).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    sums.select(col("n").cast(LongType).as("n_ranks"),
      graft.Oracle.stableRound(slope, 5).as("slope5"),
      graft.Oracle.stableRound((col("sy") - slope * col("sx")) / col("n"), 5)
        .as("intercept5"))
  }

  /** Unigram-LM cross-entropy per document — the perplexity-proxy
    * quality filter (the in-engine stand-in for KenLM scoring in
    * CCNet/RefinedWeb-style pipelines): train unigram probabilities on
    * the corpus itself (p(t) = tf/total), score each doc by the mean
    * −ln p over its token occurrences. Low = templated/common, high =
    * rare-token soup; both tails get gated in practice.
    *
    * Scale: the LM "training" is one token-frequency aggregate; the
    * "inference" is an equi-join of the token stream against the freq
    * table (broadcast for bounded vocabularies, shuffle join at web
    * scale) plus a per-doc aggregate. Cross-engine: −ln p quantizes to
    * 1e-9-scaled BIGINTs per OCCURRENCE before the per-doc sum, so
    * accumulation order cannot matter; the mean then runs on identical
    * doubles. */
  def unigramXent(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val scale = 1e9
    val toks = docs.select(col(idCol), explode(words(col(textCol))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val total = toks.count()
    val q = toks.join(freq, "tok")
      .select(col(idCol),
        floor(-log(col("tf") / lit(total)) * lit(scale) + lit(0.5))
          .cast(LongType).as("qln"))
    q.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum("qln").cast(DoubleType) / lit(scale)).as("sq"))
      .select(col(idCol), col("n_tokens"),
        graft.Oracle.stableRound(col("sq") / col("n_tokens"), 5).as("xent5"))
  }

  /** Bigram-LM cross-entropy per doc — the order-sensitive upgrade of
    * [[unigramXent]]: −mean ln P(w₂|w₁) under the corpus MLE bigram
    * model (P = c(w₁w₂)/c(w₁·), prefix count over bigram OCCURRENCES
    * so probabilities per context sum to exactly 1). Catches templated
    * text that unigram stats miss (common words in improbable order
    * score high). Two count shuffles (bigram grain, prefix grain) +
    * one per-doc aggregate; the same 1e-9 BIGINT quantization makes
    * every sum order-free. Docs with <2 tokens have no bigrams and are
    * absent, mirroring the oracle. */
  def bigramXent(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val scale = 1e9
    val bg = docs
      .select(col(idCol), words(col(textCol)).as("_w"))
      .select(col(idCol), explode(expr(
        """CASE WHEN size(_w) >= 2 THEN
          |  transform(sequence(1, size(_w) - 1),
          |    i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))
          |ELSE cast(array() as array<string>) END""".stripMargin)).as("bg"))
    val f2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val f1 = bg.select(split(col("bg"), " ").getItem(0).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    bg.join(f2, "bg")
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(f1, "w1")
      .select(col(idCol),
        floor(-log(col("c2").cast(DoubleType) / col("c1")) * lit(scale)
          + lit(0.5)).cast(LongType).as("qln"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum("qln").cast(DoubleType) / lit(scale)).as("sq"))
      .select(col(idCol), col("n_bigrams"),
        graft.Oracle.stableRound(col("sq") / col("n_bigrams"), 5)
          .as("xent5"))
  }

  /** Per-doc n-gram novelty: the share of a doc's DISTINCT word
    * trigrams that occur in no other document (document frequency 1)
    * — high novelty marks original content, low novelty marks boiler-
    * plate assembled from corpus-common phrasing. One shuffle on the
    * gram builds df (map-side combine on the per-doc-distinct stream),
    * one joins it back, one aggregates per doc. Docs shorter than 3
    * tokens have no grams and are absent, mirroring the oracle. */
  def gramNovelty(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    // hashed (60-bit md5) shingles, not raw strings: the df shuffle
    // moves 8-byte longs instead of ~30-byte trigram text — the same
    // trade q20 makes, same negligible collision budget
    val sh = graft.dedup.Dedup.withHashedShingles(docs, idCol, textCol, 3)
      .filter(size(col("shingles")) > 0)
    val grams = sh.select(col(idCol), explode(col("shingles")).as("gram"))
    // df over per-doc-DISTINCT grams (withShingles dedupes in-doc), so
    // df=1 ⇔ the gram lives in exactly one document; a hot gram never
    // materializes a doc list — it just counts and gets filtered out
    val unique = grams.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") === 1).select("gram")
    val novel = grams.join(unique, Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("novel"))
    sh.select(col(idCol), size(col("shingles")).cast(LongType).as("n_grams"))
      .join(novel, Seq(idCol), "left")
      .withColumn("novel", coalesce(col("novel"), lit(0L)))
      .select(col(idCol), col("n_grams"), col("novel"),
        graft.Oracle.stableRound(
          col("novel").cast(DoubleType) / col("n_grams"), 5)
          .as("novel_share5"))
  }

  /** Per-source Gini coefficient of document length — the corpus-
    * balance diagnostic (a source whose token mass concentrates in a
    * few giant docs skews any uniform-by-doc sampling). Exact rank
    * formulation G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending-
    * sorted lengths: one window shuffle on source (rank ties broken by
    * doc_id for determinism — same-length docs get distinct adjacent
    * ranks, and the SUM of i·xᵢ is tie-order-invariant because equal x
    * swap freely), then integer-exact sums and one final double
    * expression both engines evaluate identically. */
  def sourceGini(docs: DataFrame, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").asc, col(idCol).asc)
    docs.select(col("source"), col("n_chars"), col(idCol))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sx"),
        sum(col("rn") * col("n_chars")).as("srx"))
      .select(col("source"), col("n"),
        graft.Oracle.stableRound(
          (lit(2.0) * col("srx")) / (col("n") * col("sx"))
            - (col("n") + lit(1.0)) / col("n"), 5).as("gini5"))
  }

  /** KMV distinct-token SET ALGEBRA between sources — the mergeable-
    * sketch property `graft_kmv_distinct` (q45) is built on, exercised
    * end to end: per-source k-minima sketches merge into a union
    * sketch by keeping the k smallest of the combined minima, the
    * union estimate falls out of the same (k−1)·2⁶⁰/kth formula, and
    * |A∩B| follows by inclusion-exclusion. Everything is relational
    * (window top-k per source, equi-join per pair), deterministic
    * (md5-derived 60-bit hashes), and constant-size per source
    * regardless of corpus size — the sketch IS the shuffle payload.
    * When a merged sketch holds fewer than k hashes both inputs were
    * complete, so the "estimate" is exact — same guard as q45. */
  def sourceOverlapKmv(docs: DataFrame, sources: Seq[String],
                       k: Int = 64): DataFrame = {
    val twoPow60 = lit(1152921504606846976L)
    val tk = docs.filter(col("source").isin(sources: _*))
      .select(col("source"), explode(words(col("text"))).as("tok"))
      .select(col("source"),
        expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)")
          .as("hv"))
      .distinct()
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("hv")
    val wSAll = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val sk = tk.withColumn("rn", row_number().over(wS))
      .withColumn("nd", count(lit(1)).over(wSAll))
    val est = sk.groupBy("source")
      .agg(max("nd").as("nd"),
        max(when(col("rn") === k, col("hv"))).as("kth"))
      .select(col("source"),
        when(col("nd") < k, col("nd").cast(DoubleType))
          .otherwise(lit(63.0) * twoPow60 / col("kth")).as("est"))
    val sk64 = sk.filter(col("rn") <= k).select("source", "hv")
    val srcs = tk.select("source").distinct()
    val prs = srcs.select(col("source").as("source_a"))
      .crossJoin(srcs.select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    // merged sketch per pair via two equi-joins + distinct (an OR-join
    // would nested-loop; this unions the two sides instead)
    val mg = prs
      .join(sk64.withColumnRenamed("source", "source_a"), "source_a")
      .select("source_a", "source_b", "hv")
      .unionByName(prs
        .join(sk64.withColumnRenamed("source", "source_b"), "source_b")
        .select("source_a", "source_b", "hv"))
      .distinct()
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy("source_a", "source_b").orderBy("hv")
    val wPAll = org.apache.spark.sql.expressions.Window
      .partitionBy("source_a", "source_b")
    val uest = mg.withColumn("rn", row_number().over(wP))
      .withColumn("m", count(lit(1)).over(wPAll))
      .groupBy("source_a", "source_b")
      .agg(max("m").as("m"),
        max(when(col("rn") === k, col("hv"))).as("kth"))
      .select(col("source_a"), col("source_b"),
        when(col("m") < k, col("m").cast(DoubleType))
          .otherwise(lit(63.0) * twoPow60 / col("kth")).as("est_u"))
    uest
      .join(est.select(col("source").as("source_a"), col("est").as("ea")),
        "source_a")
      .join(est.select(col("source").as("source_b"), col("est").as("eb")),
        "source_b")
      .select(col("source_a"), col("source_b"),
        graft.Oracle.stableRound(col("ea"), 4).as("est_a4"),
        graft.Oracle.stableRound(col("eb"), 4).as("est_b4"),
        graft.Oracle.stableRound(col("est_u"), 4).as("est_union4"),
        graft.Oracle.stableRound(
          greatest(col("ea") + col("eb") - col("est_u"), lit(0.0)), 4)
          .as("est_inter4"))
  }

  /** Top-k collocations by pointwise mutual information: bigrams with
    * count ≥ `minCount` ranked by ln(c(ab)·N / (c(a)·c(b))) — the
    * classic phrase-mining signal (Church & Hanks 1990). Counts stay
    * LONG-exact through two shuffles (bigram grain, unigram grain);
    * the single ln runs on an integer-derived double both engines
    * compute identically, the rank key is 5-dp-quantized with the
    * bigram string as tiebreak, and top-k is a TakeOrdered, not a
    * global sort. */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Int, k: Int): DataFrame = {
    val toks = docs.select(explode(words(col(textCol))).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
    val n = toks.count()
    val bg = docs
      .select(words(col(textCol)).as("_w"))
      .select(explode(expr(
        """CASE WHEN size(_w) >= 2 THEN
          |  transform(sequence(1, size(_w) - 1),
          |    i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))
          |ELSE cast(array() as array<string>) END""".stripMargin)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    bg.withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(uni.select(col("tok").as("w1"), col("c1").as("ca")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c1").as("cb")), "w2")
      .select(col("bg"), col("c2"),
        graft.Oracle.stableRound(
          log((col("c2") * lit(n)).cast(DoubleType)
            / (col("ca") * col("cb")).cast(DoubleType)), 5).as("pmi5"))
      .orderBy(col("pmi5").desc, col("bg"))
      .limit(k)
  }

  /** Sentence segmentation stats: sentences per doc and mean sentence
    * length in words, from a '. '-delimiter split (the cheap segmenter
    * every heuristic pipeline starts with). Empty trailing segments
    * are dropped on both engines by filtering blank sentences. */
  def sentenceStats(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), "\\. ")).as("sent"))
      .filter(length(trim(col("sent"))) > 0)
      .select(col(idCol),
        size(split(trim(col("sent")), " ")).cast(LongType).as("wc"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sentences"), sum("wc").as("n_words"))
      .select(col(idCol), col("n_sentences"), col("n_words"),
        graft.Oracle.stableRound(col("n_words").cast(DoubleType)
          / col("n_sentences").cast(DoubleType), 5).as("words_per_sent5"))

  /** Vocabulary growth curve (Heaps'-law profile): corpus deciles (by
    * doc id) vs cumulative distinct word BIGRAMS (unigrams saturate in
    * the first slice of the synthetic corpus; the bigram space keeps
    * growing — exactly why Heaps' law is measured on n-grams). One
    * shuffle finds each bigram's FIRST document; the curve is then a
    * ≤10-row cumulative window — no per-prefix distinct scans. A
    * flattening curve means new data stops bringing new phrasing. */
  def vocabGrowth(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val maxId = docs.agg(max(col(idCol))).head().getLong(0)
    val first = docs
      .select(col(idCol), words(col(textCol)).as("_w"))
      .select(col(idCol), explode(expr(
        """CASE WHEN size(_w) >= 2 THEN
          |  transform(sequence(1, size(_w) - 1),
          |    i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))
          |ELSE cast(array() as array<string>) END""".stripMargin))
        .as("tok"))
      .groupBy("tok").agg(min(col(idCol)).as("first_doc"))
      .select(least(floor(col("first_doc") * 10.0 / (maxId + 1.0)),
        lit(9.0)).cast(LongType).as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_tokens"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0L)
    first.withColumn("cum_vocab", sum(col("new_tokens")).over(w))
  }

  /** EXACT distinct-token overlap between sources — the ground truth
    * [[sourceOverlapKmv]] approximates: |A∩B|, |A∪B|, and their
    * Jaccard per source pair, from one (source, token-hash) distinct
    * set and a pair equi-join. The sketch version stays O(k) per
    * source; this one shuffles the real token sets — run both and the
    * difference IS the estimator error report. */
  def sourceOverlapExact(docs: DataFrame, sources: Seq[String]): DataFrame = {
    val tk = docs.filter(col("source").isin(sources: _*))
      .select(col("source"), explode(words(col("text"))).as("tok"))
      .select(col("source"),
        expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)")
          .as("hv"))
      .distinct()
    val nd = tk.groupBy("source").agg(count(lit(1)).as("nd"))
    val inter = tk.select(col("source").as("source_a"), col("hv"))
      .join(tk.select(col("source").as("source_b"), col("hv")), "hv")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(nd.select(col("source").as("source_a"), col("nd").as("na")),
        "source_a")
      .join(nd.select(col("source").as("source_b"), col("nd").as("nb")),
        "source_b")
      .select(col("source_a"), col("source_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"),
        graft.Oracle.stableRound(col("n_inter").cast(DoubleType)
          / (col("na") + col("nb") - col("n_inter")).cast(DoubleType), 5)
          .as("jaccard5"))
  }

  /** CCNet-style perplexity bucketing: split each language's docs into
    * head/middle/tail terciles of the [[unigramXent]] score (CCNet,
    * Wenzek et al. 2020 §4.3 — in production the score is a KenLM
    * perplexity; the bucketing and its plan are identical). "head" =
    * most-fluent third, the slice usually kept outright; "tail" gets
    * heavier filtering. ntile runs over a window partitioned by lang
    * with a fully deterministic (xent5, doc_id) order, so bucket
    * boundaries are reproducible in any engine. Scale: the window
    * shuffles once on lang; skew-prone megalanguages would pre-slice
    * by hash the way [[graft.ops.CdcOps.latestPerKeySkewSafe]] does. */
  def ccnetBuckets(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("xent5").asc, col(idCol).asc)
    unigramXent(docs, idCol, textCol)
      .join(docs.select(col(idCol), col("lang")), idCol)
      .withColumn("tercile", ntile(3).over(w).cast(LongType))
      .withColumn("ppl_bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle").otherwise("tail"))
      .select(col(idCol), col("lang"), col("xent5"), col("tercile"),
        col("ppl_bucket"))
  }

  /** Count-Min-Sketch heavy hitters: build a `depth`×`width` CMS over
    * token occurrences, then report the sketch estimate next to the
    * exact count for the exact top-`k` tokens. The estimate is
    * min over rows of cell(h, bucket_h(token)) and always ≥ exact
    * (one-sided error ≤ εN with ε = e/width, Cormode & Muthukrishnan
    * 2005).
    *
    * Scale: the sketch is the point — ONE groupBy over (depth ×
    * occurrences) rows collapses to depth·width counters (map-side
    * combine makes each executor ship at most depth·width partials),
    * bounded memory regardless of vocabulary size, where the exact
    * per-token count table grows with the vocabulary. Cross-engine:
    * buckets come from the same overflow-free 30-bit-split integer
    * family as the MinHash signatures over the 60-bit md5 head —
    * bit-identical cells in any md5-bearing engine. */
  def cmsHeavyHitters(docs: DataFrame, textCol: String, depth: Int = 4,
                      width: Int = 1024, k: Int = 20): DataFrame = {
    val P = 1073741789L; val half = 1073741824L
    def bucketOf(h: String, x: String) =
      s"((((2654435761 * ($h + 1)) % $P) * ($x div $half)" +
        s" + ((2246822519 * ($h + 1)) % $P) * ($x % $half) + $h) % $P) % $width"
    val hash60 = "cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"
    val buckets = s"transform(sequence(0, ${depth - 1}), h -> ${bucketOf("h", "x")})"
    val toks = docs.select(explode(words(col(textCol))).as("tok"))
    val cells = toks.select(expr(hash60).as("x"))
      .select(posexplode(expr(buckets)))
      .withColumnRenamed("pos", "h").withColumnRenamed("col", "bucket")
      .groupBy("h", "bucket").agg(count(lit(1)).as("c"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(k)
      .withColumn("x", expr(hash60))
    top.select(col("tok"), col("cnt"), posexplode(expr(buckets)))
      .withColumnRenamed("pos", "h").withColumnRenamed("col", "bucket")
      .join(cells, Seq("h", "bucket"))
      .groupBy("tok", "cnt").agg(min("c").as("cms_est"))
      .select(col("tok"), col("cnt").as("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("overcount"))
  }

  /** Gopher-style intra-document repetition signals: most-common
    * unigram share, most-common bigram share, and the share of trigram
    * OCCURRENCES whose gram repeats within the doc (Rae et al. 2021
    * §A1.1 repetition filters). Templated/boilerplate docs spike all
    * three.
    *
    * Scale: counting is explode → groupBy(doc, gram) with map-side
    * partial aggregation — linear in tokens, never the O(n²)
    * per-row HOF scan (filter-per-distinct-token), which dies on
    * 100k-token documents. Three narrow aggregates re-join on doc_id;
    * docs too short for a gram width keep 0.0. */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val base = docs.select(col(idCol), words(col(textCol)).as("w"))
      .select(col(idCol), col("w"), size(col("w")).cast(LongType).as("n"))
    // top-unigram share
    val uni = base.select(col(idCol), col("n"), explode(col("w")).as("g"))
      .groupBy(col(idCol), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n")).agg(max("c").as("maxc"))
      .select(col(idCol), graft.Oracle.stableRound(
        col("maxc").cast(DoubleType) / col("n").cast(DoubleType), 5)
        .as("top_uni5"))
    def gramCounts(k: Int) = {
      val parts = (0 until k).map(j => s"element_at(w, i + $j)")
        .mkString("concat_ws(' ', ", ", ", ")")
      base.filter(col("n") >= k)
        .select(col(idCol), (col("n") - (k - 1)).as("m"),
          explode(expr(s"transform(sequence(1, size(w) - ${k - 1}), i -> $parts)"))
            .as("g"))
        .groupBy(col(idCol), col("m"), col("g"))
        .agg(count(lit(1)).as("c"))
    }
    val bi = gramCounts(2)
      .groupBy(col(idCol), col("m")).agg(max("c").as("maxc"))
      .select(col(idCol), graft.Oracle.stableRound(
        col("maxc").cast(DoubleType) / col("m").cast(DoubleType), 5)
        .as("top_bi5"))
    val tri = gramCounts(3)
      .groupBy(col(idCol), col("m"))
      .agg(sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dupocc"))
      .select(col(idCol), graft.Oracle.stableRound(
        col("dupocc").cast(DoubleType) / col("m").cast(DoubleType), 5)
        .as("dup_tri5"))
    base.select(col(idCol))
      .join(uni, Seq(idCol), "left")
      .join(bi, Seq(idCol), "left")
      .join(tri, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("top_uni5"), lit(0.0)).as("top_uni5"),
        coalesce(col("top_bi5"), lit(0.0)).as("top_bi5"),
        coalesce(col("dup_tri5"), lit(0.0)).as("dup_tri5"))
      .withColumn("repetitive",
        col("top_uni5") >= 0.125 || col("dup_tri5") >= 0.25)
  }

  /** Per-document token statistics: token count, distinct count,
    * type-token ratio, average token length (chars excluding the
    * n-1 separator spaces), stopword ratio. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    docs.select(
      col("doc_id"), col("lang"), col("source"),
      size(w).cast(LongType).as("n_tokens"),
      size(array_distinct(w)).cast(LongType).as("n_distinct"),
      (size(array_distinct(w)).cast(DoubleType) / size(w)).as("ttr"),
      ((length(col("text")) - size(w) + 1).cast(DoubleType) / size(w))
        .as("avg_token_len"),
      (size(filter(w, t => t.isin("the", "a"))).cast(DoubleType) / size(w))
        .as("stopword_ratio"))
  }

  /** BPE-ish regexp token counting: letter runs, digit runs, and single
    * non-alphanumeric marks counted as separate tokens (the usual
    * pre-tokenizer shape). Codegen'd `regexp_count`, no UDF. */
  def regexpTokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))
        .cast(LongType).as("n_bpe_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z]+")).cast(LongType)
        .as("n_word_tokens"),
      regexp_count(col("text"), lit("[0-9]+")).cast(LongType)
        .as("n_number_tokens"))

  /** Language identification by n-gram profile scoring: each candidate
    * language has a token profile; a document is scored per candidate
    * by how many of its distinct tokens hit that profile, argmax wins
    * (deterministic tiebreak on language code).
    *
    * The profile here is a DETERMINISTIC STAND-IN: token t belongs to
    * lang l's profile iff ascii(md5(l~t)[0]) % 4 == 0 (~25% of tokens
    * per lang). A real deployment ships trained char-trigram profiles;
    * this container has none, so the profile function is stubbed while
    * the operator shape — explode candidates, score per (doc, lang),
    * window argmax — is the real, scale-correct pipeline (narrow
    * projection + 5x row explode + one window per doc_id).
    */
  def langId(docs: DataFrame, candidates: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs
      .select(col("doc_id"), col("lang"),
        array_distinct(words(col("text"))).as("ws"))
      .withColumn("cand", explode(array(candidates.map(lit): _*)))
      .withColumn("score",
        size(filter(col("ws"), t =>
          ascii(substring(md5(concat(col("cand"), lit("~"), t)), 1, 1)) % 4 === 0))
          .cast(LongType))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("cand").as("predicted_lang"), col("score"))
  }

  /** Per-document quality score in [0,1]: length adequacy, lexical
    * diversity, and stopword-presence signals, banded into tiers.
    * All inputs are integer-derived so both engines compute identical
    * doubles row-by-row. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nTok = size(w).cast(DoubleType)
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val diversity = size(array_distinct(w)).cast(DoubleType) / nTok
    val stopHits = size(filter(w, t => t.isin("the", "a"))).cast(DoubleType)
    val stopScore = least(stopHits / lit(5.0), lit(1.0))
    val score = lenScore * lit(0.4) + diversity * lit(0.4) + stopScore * lit(0.2)
    docs.select(col("doc_id"), col("lang"), col("source"),
      score.as("quality_score"),
      when(score >= 0.6, "high").when(score >= 0.4, "mid").otherwise("low")
        .as("quality_tier"))
  }

  /** Model-scored quality filter: a fixed linear model over
    * integer-derived features pushed through a logistic link — the
    * shape of a fastText/classifier quality gate applied at corpus
    * scale (weights here are fixed stand-ins; a real deployment loads
    * trained weights — same single-projection, no-shuffle plan). The
    * keep decision is `z >= 0` on the PRE-link score: z is a fixed
    * left-associated chain of IEEE double ops on integer-derived
    * inputs, so the gate is bit-identical in any engine; exp only
    * decorates the reported probability. */
  def qualityModel(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nTok = size(w).cast(DoubleType)
    val lenAdq = least(nTok / lit(128.0), lit(1.0))
    val ttr = size(array_distinct(w)).cast(DoubleType) / nTok
    val stopSc = least(
      size(filter(w, t => t.isin("the", "a"))).cast(DoubleType) / lit(4.0),
      lit(1.0))
    val z = lit(-3.0) + lenAdq * lit(2.0) + ttr * lit(2.5) + stopSc * lit(1.5)
    // stableRound, not round: z is small-rational arithmetic (k/128,
    // k/4 scaled) that lands on decimal half-points where the engines'
    // round() algorithms split (graft.Oracle.stableRound)
    docs.select(col("doc_id"), col("lang"),
      graft.Oracle.stableRound(z, 5).as("z5"),
      graft.Oracle.stableRound(lit(1.0) / (lit(1.0) + exp(-z)), 5).as("prob5"),
      (z >= lit(0.0)).as("keep"))
  }

  /** Content fingerprint: polynomial rolling hash over the token
    * stream, each token mapped to a 24-bit integer via its md5 prefix.
    * acc = (acc * 1000003 + tokHash) mod 1e9+7 — exact BIGINT
    * arithmetic, order-sensitive (it IS the rolling property), and
    * identical in any engine with md5 + 64-bit ints. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      words(text),
      lit(0L),
      (acc, w0) =>
        (acc * lit(1000003L)
          + conv(substring(md5(w0), 1, 6), 16, 10).cast(LongType))
          % lit(1000000007L))

  /** 16-bit SimHash over the distinct-token set: bit b is the sign of
    * the sum over tokens of ±1 votes, where token t votes +1 on bit b
    * iff hex digit b of md5(t) is odd. Integer votes ⇒ exact and
    * order-independent; near-duplicate docs land at small Hamming
    * distance. (16 bits is demo-width; widen k for real corpora.)
    * SQL-expr form (explicit lambda names) because the per-bit vote
    * nests two higher-order functions. */
  def simhash16(textColName: String): Column = expr(
    s"""aggregate(sequence(0, 15), cast(0 as bigint), (acc, b) ->
       |  acc + IF(
       |    aggregate(array_distinct(split($textColName, ' ')), 0,
       |      (a2, t) -> a2 + (ascii(substring(md5(t), b + 1, 1)) % 2) * 2 - 1) > 0,
       |    shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""".stripMargin)

  /** K-bit SimHash over a PRECOMPUTED column of per-token md5 strings
    * (one md5 per distinct token, hoisted — [[simhash16]] recomputes
    * `split`+`md5` inside the per-bit lambda, which is O(bits·len) per
    * doc; this form is O(len + bits·tokens)). Same vote rule: bit b set
    * iff the sum over tokens of ±1 (hex digit b of the token's md5 odd
    * → +1) is positive. bits ≤ 32 (md5 has 32 hex digits). */
  def simhashK(tokenMd5Col: String, bits: Int): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), cast(0 as bigint), (acc, b) ->
       |  acc + IF(
       |    aggregate($tokenMd5Col, 0,
       |      (a2, h) -> a2 + (ascii(substring(h, b + 1, 1)) % 2) * 2 - 1) > 0,
       |    shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""".stripMargin)

  /** K-bit SimHash as a RELATIONAL aggregate — the hot-path form of
    * [[simhashK]] (spec-verified identical). The HOF forms nest the
    * per-token pass inside the per-bit lambda; after Catalyst's
    * CollapseProject inlines the "hoisted" md5 array into the lambda,
    * every token's md5 is recomputed once PER BIT in interpreted
    * (non-codegen) eval — 32× redundant hashing that measured 11 s
    * cold on the sf0.1 corpus. This form explodes distinct tokens
    * (md5 computed exactly once each) and takes the per-bit ±1 vote
    * sums as `bits` codegen'd SUM aggregates in ONE hash aggregate —
    * map-side partials make the shuffle |docs|×(bits+1) ints, and the
    * whole pipeline stays in whole-stage codegen: 0.5 s on the same
    * corpus. Output: (idCol, sh). */
  def simhashAggK(docs: DataFrame, idCol: String, textCol: String,
                  bits: Int): DataFrame = {
    require(bits <= 32, "md5 has 32 hex digits")
    // all `bits` votes packed into ONE long per token: hex digit i of
    // the md5 maps to its ascii parity ('0'→0, '1'→1, …, 'a'→1, 'b'→0,
    // …) via translate, and the 0/1 string parses as a base-2 mask —
    // one string pass per token instead of `bits` substring+ascii
    // calls; the per-bit vote is then a shift/mask int op. Mask char
    // b+1 is bit (31−b) of the conv value.
    val toks = docs
      .select(col(idCol),
        explode(expr(s"array_distinct(split($textCol, ' '))")).as("tok"))
      .withColumn("m", expr(
        """cast(conv(translate(md5(tok),
          |  '0123456789abcdef', '0101010101101010'), 2, 10) as bigint)"""
          .stripMargin))
    val votes = (0 until bits).map(b =>
      sum(expr(s"(shiftright(m, ${31 - b}) % 2) * 2 - 1")).as(s"s$b"))
    toks.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), expr((0 until bits)
        .map(b => s"IF(s$b > 0, cast(${1L << b} as bigint), cast(0 as bigint))")
        .mkString(" + ")).as("sh"))
  }

  /** doc fingerprints query: rolling hash + simhash per document. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      rollingFingerprint(col("text")).as("rolling_fp"),
      simhash16("text").as("simhash"))

  /** Global top-k vocabulary n-grams by document frequency: explode
    * each doc's DISTINCT n-grams (df, not tf — one count per doc),
    * one hash aggregate with map-side combine, then `orderBy.limit`
    * which Spark plans as TakeOrderedAndProject — per-partition top-k
    * + driver merge of k·partitions rows, never a global sort. Ties
    * broken on the ngram string so the cut is deterministic. */
  def vocabTopK(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val grams = (0 until n)
      .map(j => s"element_at(w, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        s"""CASE WHEN size(w) >= $n THEN
           |  array_distinct(transform(sequence(1, size(w) - ${n - 1}),
           |    i -> $grams))
           |ELSE cast(array() as array<string>) END""".stripMargin))
        .as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram").asc)
      .limit(k)
  }

  /** Gopher-style repetition/quality gates (Rae et al. 2021, §A1.1 —
    * public paper): token-count bounds, mean-word-length band, max
    * stopword presence, repetition ratio. All signals integer-derived
    * per doc ⇒ exact cross-engine booleans; one narrow projection. */
  def gopherQuality(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nTok = size(w).cast(DoubleType)
    val meanLen =
      aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) / nTok
    val repRatio = lit(1.0) - size(array_distinct(w)).cast(DoubleType) / nTok
    val stopHits = size(filter(w, t => t.isin("the", "a", "of", "to", "and")))
    docs.select(col("doc_id"), col("lang"),
      (size(w) >= 5 && size(w) <= 1000).as("ok_len"),
      (meanLen >= 2.0 && meanLen <= 12.0).as("ok_mean_word_len"),
      (stopHits >= 1).as("ok_stopwords"),
      (repRatio <= 0.5).as("ok_repetition"))
      .withColumn("keep",
        col("ok_len") && col("ok_mean_word_len")
          && col("ok_stopwords") && col("ok_repetition"))
  }

  /** Fixed-budget token chunking (sequence packing prep): doc tokens →
    * ⌈n/size⌉ chunks of `size` tokens (last ragged). `slice` over one
    * pre-split array + posexplode of the chunk index range — per-row
    * narrow work, no shuffle, the 100 TB form of corpus tokenize+pack. */
  def chunkTokens(docs: DataFrame, size: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(expr(s"sequence(0, int(ceil(size(w) / $size.0d)) - 1)")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_no"),
        expr(s"size(slice(w, pos * $size + 1, $size))").cast("long")
          .as("n_tokens"),
        expr(s"element_at(w, pos * $size + 1)").as("first_token"))

  /** PII scrubbing: redact email-shaped and long-digit-run tokens with
    * typed placeholders, counting redactions per doc. Patterns stay in
    * the RE2 ∩ Java-regex common dialect (no backrefs/lookaround) so
    * any engine applies them identically; one narrow projection. */
  def redactPii(docs: DataFrame, textCol: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    val digitsRe = "[0-9]{4,}"
    val redacted = regexp_replace(
      regexp_replace(col(textCol), emailRe, "<EMAIL>"),
      digitsRe, "<NUM>")
    docs
      .withColumn("n_emails",
        regexp_count(col(textCol), lit(emailRe)))
      .withColumn("n_long_nums",
        regexp_count(regexp_replace(col(textCol), emailRe, "<EMAIL>"),
          lit(digitsRe)))
      .withColumn("redacted", redacted)
  }

  /** Per-language length-distribution profile: doc count plus EXACT
    * interpolated median/p95 of n_chars (Spark `percentile` and DuckDB
    * `quantile_cont` share the p·(n−1) linear-interpolation definition;
    * rounded to 4 dp as the comparison key). Exact percentile sorts
    * within each group — correct here because groups are |langs|-many
    * and each fits an executor; at 100 TB per-group sort memory is the
    * constraint and the swap-in is `approx_percentile` (t-digest,
    * partial-mergeable, one pass) at the cost of engine-specific
    * results. */
  def lengthQuantiles(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
        round(expr("percentile(n_chars, 0.95)"), 4).as("p95_chars"))

  /** Robust per-language outlier flags on document length: median and
    * MAD (median absolute deviation) per language, docs beyond 3×MAD
    * flagged. The robust alternative to mean/stddev gates —
    * unkillable by the very outliers it hunts. Exact interpolated
    * percentiles here return k or k.5 values (dyadic — bit-exact
    * doubles), so the comparison is engine-identical with no rounding
    * at all. Scale: two |langs|-group aggregates plus broadcast joins
    * back; the doc table streams through, never a global sort. */
  def madOutliers(docs: DataFrame): DataFrame = {
    val med = docs.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(broadcast(med), "lang")
      .withColumn("adev", abs(col("n_chars") - col("med")))
    val mad = dev.groupBy("lang", "med")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.drop("med")
      .join(broadcast(mad), "lang")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("med"), col("mad"),
        (col("adev") > lit(3.0) * col("mad")).as("outlier"))
  }
}
