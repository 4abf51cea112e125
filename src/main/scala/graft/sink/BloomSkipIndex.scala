package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file BLOOM-FILTER data skipping — the equality-probe complement
  * to [[ZOrderLayout]]'s min/max manifest.
  *
  * The gap it closes: min/max stats prune RANGE predicates and only
  * help when the layout makes each file's range tight. A table
  * hash-clustered on a key (the natural layout for a co-located join,
  * [[BucketedFactStore]]) gives every file a near-full [min, max] span
  * on that key — stats prune nothing — yet each file holds only
  * 1/nFiles of the KEY VALUES. A per-file Bloom filter captures
  * exactly that set-membership structure: a point lookup
  * (`key = v` / `key IN (…)`) skips every file whose filter provably
  * excludes the value, reading ~|values|/nFiles of the table instead
  * of all of it. This is the lakehouse bloom index (Delta bloom
  * filters, Parquet bloom filters — public formats) rebuilt as an
  * explicit sidecar on plain parquet, and it works for ANY layout:
  * hash-clustered (best case), append-ordered, or Z-ordered.
  *
  * Sidecars are PER COLUMN (`dir/_bloom_<col>`), so one table carries
  * independent bloom indexes on several keys at once — e.g. clustered
  * on `user_id` (co-located joins + point lookups) with a SECOND
  * index on `event_id` for primary-key fetches. A near-unique
  * secondary key prunes just as hard as the cluster key: each value
  * lives in exactly one file regardless of which column the layout
  * hashes on — set membership, unlike min/max stats, never needs the
  * layout's help.
  *
  * Mechanics: m = 1024 bits per file as 16 long words; k = 4 bit
  * positions per value from `xxhash64(seed_j, key)`. Per row the mask
  * contribution to each word is pure codegen'd column algebra
  * (when/shiftleft/OR — no UDF); per file the filter is one `bit_or`
  * hash aggregate with map-side partials, so building costs one scan
  * with |files|×16 longs of shuffle. The sidecar at `dir/_bloom` is
  * one metadata-sized parquet row per file (like the `_manifest`
  * sidecar, hidden from plain readers by the underscore); the probe
  * reads the sidecar plus one directory listing — zero data bytes —
  * to decide what to skip, then hands only surviving files to the
  * reader. Stale sidecars (data rewritten behind our back) are
  * detected by file-name-set comparison and fall back to a recompute,
  * so a probe can never return wrong rows, only read more files.
  *
  * False positives cost extra reads, never wrong results — the exact
  * predicate is re-applied on the surviving files. With n ≈ 10 keys
  * per file, FPR ≈ (1−e^(−kn/m))^k ≈ 2·10⁻⁶; at n ≈ 250 it is ~4%
  * (worse layouts want a bigger m — the word count is a constant
  * here, a config knob in a deployment).
  */
object BloomSkipIndex {

  /** Filter geometry: 1024 bits = 16 long words, 4 probes per value. */
  private val WordCount = 16
  private val MBits = WordCount * 64
  private val KHashes = 4

  private def bloomDir(dir: String, keyCol: String): String =
    s"$dir/_bloom_$keyCol"

  /** The k bit positions of one key value (column form — evaluated
    * per row at build time, over literals at probe time). The key is
    * hashed through its STRING form (the repo-wide md5-bucket
    * convention): xxhash64 hashes by input type, so a probe literal
    * typed differently than the stored column (lit(7): Int vs a LONG
    * key) would otherwise hash to different bits and silently skip
    * files that DO contain the value — string normalization makes
    * numeric-literal width irrelevant. */
  private def positions(key: Column): Seq[Column] =
    (0 until KHashes).map(j =>
      pmod(xxhash64(lit(j), key.cast("string")), lit(MBits.toLong)))

  /** Per-row contribution to word `w`: OR of the probe bits that land
    * in that word (0 when none do). */
  private def wordMask(key: Column, w: Int): Column =
    positions(key).map { pos =>
      when(floor(pos / 64) === w,
          call_function("shiftleft", lit(1L), (pos % 64).cast("int")))
        .otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Hash-cluster `df` into `nFiles` files on `keyCol` (co-located
    * point lookups AND joins on the key) and persist the per-file
    * bloom sidecar in the same commit. */
  def bloomWrite(df: DataFrame, keyCol: String, dir: String,
                 nFiles: Int): Unit = {
    df.repartition(nFiles, col(keyCol))
      .write.mode("overwrite").parquet(dir)
    writeBloomSidecar(df.sparkSession, dir, keyCol)
  }

  private def bloomAggs(keyCol: String): Seq[Column] =
    (0 until WordCount).map(w =>
      bit_or(wordMask(col(keyCol), w)).as(s"w$w"))

  /** One sidecar row for a ZERO-ROW data file: the all-zero filter —
    * it provably contains no value, so every probe prunes it. See
    * [[Sidecars.withZeroRowFiles]] for why these rows must exist. */
  private def zeroBloomRow(path: String): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row.fromSeq(path +: Seq.fill(WordCount)(0L))

  /** Recompute the per-file bloom table by scanning the data — the
    * write-time build and the fallback for foreign directories. One
    * row per file: (file, w0…w15); 0-row files carry the all-zero
    * filter (a scan-side aggregate alone would miss them and the
    * sidecar could never match the listing again). */
  def computeBloom(spark: SparkSession, dir: String,
                   keyCol: String): DataFrame = {
    val aggs = bloomAggs(keyCol)
    Sidecars.withZeroRowFiles(spark, dir,
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("file"))
        .agg(aggs.head, aggs.tail: _*))(zeroBloomRow)
  }

  /** Fold an appended batch into the bloom sidecar: keep the recorded
    * rows of files still present, bloom-scan ONLY the files the
    * sidecar has not seen, drop rows of removed files, rewrite. The
    * result is row-identical to a full rebuild (per-file filters are
    * independent) at O(appended batch) data read + metadata — the
    * incremental-maintenance path completing the sidecar family
    * (manifest [[ZOrderLayout.zorderAppendRankedN]], postings,
    * vectors). Works after ANY append, not just ours: the fold keys
    * on the listing diff, not on who wrote the files. A missing or
    * unreadable sidecar degrades to the full recompute-and-write;
    * an already-fresh sidecar is a metadata-only no-op. */
  def foldBloomSidecar(spark: SparkSession, dir: String,
                       keyCol: String): Unit = {
    val cols = "file" +: (0 until WordCount).map(w => s"w$w")
    Sidecars.readRaw(spark, dir, s"_bloom_$keyCol", cols) match {
      case None => writeBloomSidecar(spark, dir, keyCol)
      case Some(side) =>
        val current = Sidecars.dataFileNames(spark, dir)
        // snapshot the sidecar rows BEFORE overwriting the dir we
        // read them from (metadata-sized, like the manifest fold)
        val all = side.collect().toSeq
        val kept = all.filter(r =>
          current(new Path(r.getString(0)).getName))
        val seen = kept.map(r => new Path(r.getString(0)).getName).toSet
        val missing = (current -- seen).toSeq.sorted.map(n => s"$dir/$n")
        if (missing.isEmpty && kept.size == all.size) return
        val keptDf = spark.createDataFrame(
          spark.sparkContext.parallelize(kept, 1), side.schema)
        val aggs = bloomAggs(keyCol)
        val out =
          if (missing.isEmpty) keptDf
          else keptDf.unionByName(
            spark.read.parquet(missing: _*)
              .groupBy(input_file_name().as("file"))
              .agg(aggs.head, aggs.tail: _*))
        // zero-complete: a 0-row appended/rewritten file never shows
        // up in the scan aggregate — record it with the all-zero
        // filter or the fold can never reach freshness again
        Sidecars.withZeroRowFiles(spark, dir, out)(zeroBloomRow)
          .coalesce(1)
          .write.mode("overwrite").parquet(bloomDir(dir, keyCol))
    }
  }

  /** Persist the bloom sidecar for (`dir`, `keyCol`) (one tiny
    * parquet at `dir/_bloom_<keyCol>`). Stats come from one read of
    * the files just written — a fixed write-side cost, never a
    * read-side one. Call once per indexed column. */
  def writeBloomSidecar(spark: SparkSession, dir: String,
                        keyCol: String): Unit =
    computeBloom(spark, dir, keyCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(bloomDir(dir, keyCol))

  /** Hash-clustered append + sidecar fold — the appending twin of
    * [[bloomWrite]]. Batch files land beside the existing layout
    * (same key hashing, so point lookups still confine each value to
    * few files) and every per-column sidecar is reconciled at
    * O(batch) via [[foldAllBloomSidecars]]. */
  def bloomAppend(df: DataFrame, keyCol: String, dir: String,
                  nFiles: Int): Unit = {
    SchemaGuard.requireSameColumns(df.sparkSession, dir, df, "bloomAppend")
    df.repartition(nFiles, col(keyCol))
      .write.mode("append").parquet(dir)
    foldAllBloomSidecars(df.sparkSession, dir)
  }

  /** Fold every per-column bloom sidecar under `dir` (the
    * `_bloom_<col>` listing) — one call refreshes ALL indexed keys
    * after an append, so a table with a cluster-key index and
    * secondary indexes never serves a stale filter from any of them. */
  def foldAllBloomSidecars(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("_bloom_"))
      .foreach(n => foldBloomSidecar(spark, dir, n.stripPrefix("_bloom_")))
  }

  /** The bloom table for (`dir`, `keyCol`): the write-time sidecar
    * when present, well-formed, and matching the directory's CURRENT
    * file listing ([[Sidecars.readFresh]]); otherwise the scan
    * recompute. The happy path reads one metadata-sized parquet and
    * zero data. */
  def bloomTable(spark: SparkSession, dir: String,
                 keyCol: String): DataFrame =
    Sidecars.readFresh(spark, dir, s"_bloom_$keyCol",
        "file" +: (0 until WordCount).map(w => s"w$w"))
      .getOrElse(computeBloom(spark, dir, keyCol))

  /** True when a FRESH sidecar exists for `keyCol` — i.e.
    * [[survivingFiles]] would prune from metadata alone, without the
    * computeBloom full-scan fallback. Callers deciding between a
    * pruned locate and a plain scan should check this first: paying a
    * full scan to BUILD a throwaway bloom and then scanning again is
    * strictly worse than one scan. */
  def hasFreshSidecar(spark: SparkSession, dir: String,
                      keyCol: String): Boolean =
    Sidecars.readFresh(spark, dir, s"_bloom_$keyCol",
      "file" +: (0 until WordCount).map(w => s"w$w")).nonEmpty

  /** The k (word, mask) probes of each literal value, computed by ONE
    * driver-local evaluation of the SAME column expressions the build
    * used (no hand-rolled twin hash to drift). Metadata-sized. */
  private def probeWords(spark: SparkSession,
                         values: Seq[Column]): Seq[Seq[(Int, Long)]] = {
    val cols = values.zipWithIndex.flatMap { case (v, i) =>
      positions(v).zipWithIndex.map { case (p, j) => p.as(s"p_${i}_$j") }
    }
    val row = spark.range(1).select(cols: _*).collect().head
    values.indices.map { i =>
      (0 until KHashes).map { j =>
        val pos = row.getLong(row.fieldIndex(s"p_${i}_$j"))
        ((pos / 64).toInt, 1L << (pos % 64))
      }
    }
  }

  /** Files that MAY contain at least one of `values`: for each value,
    * every probed bit must be set in the file's filter; a file
    * survives if any value passes. Collected list is metadata. */
  def survivingFiles(spark: SparkSession, dir: String, keyCol: String,
                     values: Seq[Column]): Seq[String] = {
    require(values.nonEmpty, "empty probe set")
    val pred = probeWords(spark, values).map { probes =>
      probes.map { case (w, mask) =>
        col(s"w$w").bitwiseAND(lit(mask)) === lit(mask)
      }.reduce(_ && _)
    }.reduce(_ || _)
    bloomTable(spark, dir, keyCol).filter(pred)
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Files that MAY contain at least one key of `keys` (a DataFrame —
    * the form a large CDC batch's key set arrives in): the DISTRIBUTED
    * twin of [[survivingFiles]], for key sets too big to collect as
    * driver-side probe literals. Each key row computes its k probe
    * positions with the SAME column expressions the build used; the
    * probe set broadcasts (O(batch) — a CDC batch is broadcast-sized
    * by definition, it just arrived over the wire) and streams against
    * the bloom table, which is one metadata row per file and NEVER
    * collects to the driver here — at 10⁶ files × 10⁴ keys the
    * predicate evaluates distributed across the sidecar's partitions,
    * no shuffle, output O(matched files). A file survives iff some key
    * finds all its probed bits set, so no containing file is ever
    * skipped (same guarantee as the literal path). */
  def survivingFilesForKeyDf(spark: SparkSession, dir: String,
                             keyCol: String,
                             keys: DataFrame): Seq[String] = {
    val probes = keys.select(col(keyCol)).distinct()
      .select(positions(col(keyCol)).zipWithIndex.map {
        case (p, j) => p.as(s"_p$j")
      }: _*)
    val words = array((0 until WordCount).map(w => col(s"w$w")): _*)
    val pred = (0 until KHashes).map { j =>
      val pos = col(s"_p$j")
      val mask = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      element_at(col("_words"), (floor(pos / 64) + 1).cast("int"))
        .bitwiseAND(mask) === mask
    }.reduce(_ && _)
    bloomTable(spark, dir, keyCol)
      .withColumn("_words", words)
      .join(broadcast(probes), pred, "left_semi")
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Bloom-pruned point lookup: consult the (write-maintained) bloom
    * sidecar, read ONLY the files that may contain a probed value,
    * re-apply the exact `keyCol IN (values)` predicate. Identical to
    * filtering the full table — a false positive costs one extra file
    * read, a true negative is a skipped file, and no file containing
    * a match can ever be skipped (its filter has all probed bits
    * set by construction). */
  def prunedPointScan(spark: SparkSession, dir: String, keyCol: String,
                      values: Seq[Column]): DataFrame = {
    val files = survivingFiles(spark, dir, keyCol, values)
    val src =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    src.filter(values.map(col(keyCol) === _).reduce(_ || _))
  }
}
