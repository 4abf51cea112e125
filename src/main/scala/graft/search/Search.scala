package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Full-text relevance search over a document corpus — the retrieval
  * primitive a training-data pipeline uses for corpus exploration and
  * targeted selection ("all docs about X, best first").
  *
  * BM25 (Robertson/Spärck Jones probabilistic relevance framework;
  * public formula) with the standard k1/b parametrization. Everything
  * is computed as one declarative plan: token explode → per-doc tf for
  * the query terms only → df per term → score → top-k.
  *
  * Scale shape at 100 TB:
  *  - the token explode is filtered to the QUERY TERMS before any
  *    shuffle — per doc only O(matching tokens) rows move, not the
  *    whole posting universe;
  *  - df and the (n_docs, avgdl) corpus stats are tiny aggregates,
  *    broadcast back (two single-digit-row build sides);
  *  - the final top-k is `orderBy(...).limit(k)`
  *    (TakeOrderedAndProject — per-partition heaps, no global sort),
  *    with the oracle's rank column computed afterwards over just the
  *    k survivors.
  * A real search deployment precomputes (doc_id, term, tf, dl) as an
  * inverted-index table and reuses it across queries — same plan from
  * the tf stage down.
  */
object Search {

  /** BM25 top-k: score `docs` against `queryTerms`, return the top
    * `topK` docs as (doc_id, rank, score4). Score is rounded to 4 dp
    * BEFORE ranking so ordering (and therefore the k-cut) is identical
    * in any IEEE-754 engine; ties break on doc_id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], topK: Int = 20): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast(LongType).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("tok").isin(queryTerms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // literals spelled exactly as in the SQL oracle (2.2 = k1+1,
    // 0.25 = 1-b) — deriving them arithmetically could differ in the
    // last ulp from the engine's decimal-literal parse
    val scored = tf
      .join(broadcast(dfq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2)
             * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum(col("s")), 4).as("score4"))
    // TakeOrderedAndProject cuts to topK rows BEFORE the global rank
    // window, so WindowExec's single partition holds topK rows, never
    // the corpus — the limit and the window share one sort key, making
    // the rank identical to ranking the full set then filtering ≤ k
    scored
      .orderBy(col("score4").desc, col("doc_id").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score4").desc, col("doc_id").asc))
        .cast(LongType))
      .select("doc_id", "rank", "score4")
  }

  /** Exact-phrase search via a positional inverted index — the scale
    * path for phrase queries. Posting lists carry (doc, position); a
    * phrase of m terms is matched by m−1 equi-joins with position
    * arithmetic (term i must sit at anchor_pos + i), never by
    * re-scanning text. Every join side is pre-filtered to ONE term's
    * postings, so the shuffled data is the phrase terms' postings
    * only — at 100 TB the posting table is the precomputed inverted
    * index, partitioned by term, and each phrase query touches m
    * partitions of it. Output: (doc_id, n_hits, first_pos) per doc
    * containing the phrase at least once. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val post = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    matchPhrase(t => post.filter(col("tok") === t)
      .select(col("doc_id"), col("pos")), phrase)
  }

  /** The phrase-match core shared by [[phraseSearch]] (postings built
    * inline) and [[phraseSearchIndexed]] (postings read from the
    * persisted index): anchor on term 0's postings, then m−1
    * equi-joins on (doc_id, pos − i). */
  private def matchPhrase(postingsOf: String => DataFrame,
                          phrase: Seq[String]): DataFrame = {
    val anchor = postingsOf(phrase.head)
    val matched = phrase.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (term, i)) =>
        acc.join(postingsOf(term)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matched.groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_hits"),
        min(col("pos")).cast(LongType).as("first_pos"))
  }

  /** Driver-side twin of [[graft.sampling.Sampling.hashBucket]] (md5
    * head, base-16 → long, mod) — the same bucket a row's `tok` gets
    * in [[buildPostings]], computable for a literal query term so the
    * read can prune partitions. */
  private def termBucket(term: String, nBuckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % nBuckets
  }

  /** Build the PERSISTED positional inverted index: one row per
    * (doc, position, token), written partitioned by a stable hash
    * bucket of the token. Bucketing (not one partition per term) keeps
    * the directory count bounded at web-scale vocabularies while still
    * letting a phrase query prune to ≤ m partitions — the 100 TB form
    * where the index is built once and amortized across every query.
    * The explode+shuffle cost paid here is exactly what every
    * [[phraseSearch]] call pays inline. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String,
                    dir: String, nBuckets: Int = 64): Unit =
    writePostings(docs, idCol, textCol, dir, nBuckets, "overwrite")

  /** INCREMENTAL index maintenance: append a new batch's postings into
    * the existing bucket partitions — the production property that an
    * arriving batch costs O(batch), not an index rebuild. New files
    * land inside the same `tok_bucket=` dirs, so the pruned read path
    * is unchanged; doc ids must be new (append never rewrites an
    * existing doc's postings — delete-then-append for updates).
    * Periodic [[graft.sink.Compaction]] keeps per-bucket file counts
    * sane under high batch cadence. */
  def appendPostings(newDocs: DataFrame, idCol: String, textCol: String,
                     dir: String, nBuckets: Int = 64): Unit =
    writePostings(newDocs, idCol, textCol, dir, nBuckets, "append")

  private def writePostings(docs: DataFrame, idCol: String,
                            textCol: String, dir: String,
                            nBuckets: Int, mode: String): Unit = {
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("tok_bucket",
        graft.sampling.Sampling.hashBucket(col("tok"), nBuckets))
      .repartition(col("tok_bucket"))
      .write.mode(mode).partitionBy("tok_bucket").parquet(dir)
  }

  /** Exact-phrase search over a [[buildPostings]] index: identical
    * output contract to [[phraseSearch]], but each term's postings
    * come from ONE partition of the persisted index —
    * `tok_bucket = <driver-computed bucket>` is a literal filter on
    * the partition column, so the scan lists ≤ m of the nBuckets
    * directories (partition pruning) and the `tok = term` filter
    * pushes into the parquet scan of just those. No tokenize, no
    * explode, no full-index read per query. */
  def phraseSearchIndexed(spark: org.apache.spark.sql.SparkSession,
                          dir: String, phrase: Seq[String],
                          nBuckets: Int = 64): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val post = spark.read.parquet(dir)
    matchPhrase(t => post
      .filter(col("tok_bucket") === lit(termBucket(t, nBuckets))
        && col("tok") === t)
      .select(col("doc_id"), col("pos")), phrase)
  }

  /** Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al. 2009):
    * fuse a lexical (BM25) rank list and a dense (cosine ANN) rank list
    * over the same id space into one ranking by
    * score(d) = Σ_lists 1/(rrfK + rank_list(d)), missing list → 0.
    * The production RAG retrieval shape — two cheap top-`m` retrievers
    * beat either alone, and RRF needs no score calibration because it
    * only consumes RANKS (integers, engine-exact), so the fused
    * ordering is bit-identical in any IEEE-754 engine.
    *
    * Scale: each retriever already ends at `m` rows per query; the
    * fusion is a full-outer join of two m-row lists plus a 2m-row
    * sort — driver-trivial regardless of corpus size. */
  def hybridRrf(bm25Ranks: DataFrame, annRanks: DataFrame,
                k: Int, rrfK: Int = 60): DataFrame = {
    val a = bm25Ranks.select(col("doc_id"), col("rank").as("r_bm25"))
    val b = annRanks.select(col("doc_id"), col("rank").as("r_ann"))
    val fused = a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("r_bm25")), lit(0.0))
          + coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("r_ann")), lit(0.0)))
    fused
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast(LongType))
      .filter(col("fused_rank") <= k)
      .select(col("doc_id"), col("fused_rank"), col("r_bm25"), col("r_ann"),
        graft.Oracle.stableRound(col("rrf"), 6).as("rrf6"))
  }

  /** Per-doc top-`k` characteristic terms with TF-IDF scores: tf per
    * (doc, term), df per term, tfidf = tf·ln(N/df) reported per kept
    * term. The RANK is the lexicographic integer order (tf DESC, df
    * ASC, term ASC) — "most frequent, rarity-tiebroken" — chosen over
    * ranking on the float score itself so the k-cut is bit-identical
    * in every IEEE-754 engine (no float compare decides membership);
    * the rounded score is annotation, not the sort key.
    *
    * Scale: tf is one shuffle on (doc, term) with map-side combine;
    * df re-aggregates tf on term and joins back WITHOUT a forced
    * broadcast — the df table is one row per vocabulary term, which is
    * unbounded at web scale (that is why q38's vocab top-k exists);
    * AQE broadcasts it when it measures small and shuffle-joins
    * otherwise. N is a single-row broadcast. The per-doc window
    * partitions on doc_id — each doc's term list sorts locally. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast(LongType).as("n_docs"))
    tf.join(dft, "term")
      .crossJoin(broadcast(n))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("term").asc))
        .cast(LongType))
      .filter(col("rnk") <= k)
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 5))
      .select("doc_id", "term", "tf", "df", "rnk", "tfidf")
  }
}
