package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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
  * Cross-engine determinism: MinHash = lexicographic min over md5 hex
  * strings (seeded by hash index), so Spark and DuckDB compute
  * bit-identical signatures, identical candidate sets, and exact
  * Jaccard as a ratio of small ints — the whole pipeline twins in SQL.
  */
object Dedup {

  /** MinHash signature of a shingle-set column: k independent hash
    * functions, hash h = md5("h|" + shingle), signature = element-wise
    * min (lexicographic over hex — identical in any md5-bearing
    * engine). One narrow projection, no shuffle. */
  def minhashSignature(shingleCol: String, k: Int): Column = expr(
    s"""transform(sequence(0, ${k - 1}),
       |  h -> array_min(transform($shingleCol,
       |         s -> md5(concat(cast(h as string), '|', s)))))""".stripMargin)

  /** Banded LSH keys: split the k-wide signature into `bands` bands of
    * `rowsPerBand`, each band keyed by the md5 of its concatenated
    * minhashes. Docs sharing ANY band key become candidate pairs. */
  def bandKeys(sigCol: String, bands: Int, rowsPerBand: Int): Column = expr(
    s"""transform(sequence(0, ${bands - 1}),
       |  b -> md5(concat_ws('', transform(
       |         sequence(1, $rowsPerBand),
       |         r -> element_at($sigCol, b * $rowsPerBand + r)))))""".stripMargin)

  /** docs(idCol, textCol) → (id, shingles) with the given n-gram width.
    * The words array is materialized in its own projection first —
    * inlining `split` into the per-shingle lambda would re-tokenize the
    * whole document for every element_at (O(len²) per doc; measured 10×
    * on the shingle-heavy pipelines). */
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

  /** LSH candidate pairs (idA < idB) from banded MinHash signatures.
    * Exploded to one row per (doc, band); the self-join is an equi-join
    * on (band index, band key) — the scale-safe bucket join. */
  def lshCandidates(shingled: DataFrame, idCol: String,
                    k: Int = 12, bands: Int = 4): DataFrame = {
    val rowsPerBand = k / bands
    val banded = shingled
      .withColumn("sig", minhashSignature("shingles", k))
      .select(col(idCol), posexplode(bandKeys("sig", bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
      // persist the (id, band, key) projection: it is O(docs×bands) TINY
      // rows, and without it the self-join recomputes the k·|shingles|
      // md5 signature pipeline once per side (measured 2-3× the query).
      // At 100 TB this materialization is an intermediate table write.
      .persist()
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard over candidate pairs only: join the (small)
    * candidate set back to the shingle arrays and compare set overlap —
    * int/int division, bit-identical across engines. */
  def jaccardOnCandidates(candidates: DataFrame, shingled: DataFrame,
                          idCol: String, tau: Double): DataFrame = {
    val sa = shingled.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    candidates.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType)
          / size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= tau)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-duplicate pipeline: shingle → signature →
    * banded buckets → candidate equi-join → exact-Jaccard verify. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 12, bands: Int = 4,
                      tau: Double = 0.8): DataFrame = {
    val sh = withShingles(docs, idCol, textCol, n)
    jaccardOnCandidates(lshCandidates(sh, idCol, k, bands), sh, idCol, tau)
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
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, tau: Double): DataFrame = {
    // Shingles are HASHED to 60-bit ints (15 hex chars of md5): the pair
    // join ships ~8 B/shingle instead of ~25 B strings and intersects
    // longs, not strings — the dominant cost of blocked pairwise Jaccard
    // is moving/comparing the shingle sets, not hashing them. Collision
    // odds at 60 bits are negligible at any realistic block size.
    val hashed = withShingles(docs, idCol, textCol, n = 2)
      .withColumn("shingles", expr(
        "transform(shingles, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))"))
    val sh = hashed
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
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType)
          / size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= tau)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("lang"), col("jaccard"))
  }
}
