package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Versioned snapshots persisted as BUCKETED catalog tables, so that
  * adjacent-pair change-feed diffs plan with ZERO Exchange — the
  * 100 TB form of [[AtomicParquetSink.tableChanges]].
  *
  * The plain version-dir feed pays one full-outer shuffle join per
  * adjacent snapshot pair: at 100 TB per snapshot that is two full
  * table shuffles per pair, and the pair count grows with retention.
  * Persisting each snapshot bucketed on the diff key (Spark's
  * `bucketBy` + `sortBy`, the public Hive-bucketing layout) stamps
  * every scan with `HashPartitioning(key, n)`, so the full-outer
  * sort-merge join of any two snapshots is already co-located —
  * `.explain` shows no ShuffleExchange on either side (spec-asserted,
  * Round9Spec), and with one file per bucket (the `repartition`
  * before write guarantees it) the scans come back sorted too. Diff
  * cost per pair drops from 2 shuffles + sort to a streaming merge of
  * co-located buckets.
  *
  * This is the same lesson [[BucketedFactStore]] applies to the merge
  * write path, applied to snapshot HISTORY: the reference warehouse
  * hash-distributes its fact on the key for exactly this class of
  * join (synapse_table_creation.sql:30-47, README.md:454-487).
  *
  * Catalog notes: snapshots are EXTERNAL tables (`path` option) so
  * the data lives where the caller says; bucketing metadata lives in
  * the session catalog (like every Spark bucketed table — the open
  * lakehouse formats carry it in their own manifests instead). The
  * writer `repartition`s into one file per bucket, which is what lets
  * Spark trust the sort order at scan time. Version naming mirrors
  * the atomic sink's monotone versions: the caller supplies an
  * increasing `version` tag.
  */
object BucketedSnapshots {

  private def tableName(name: String, version: Long): String =
    s"${name}_v$version"

  /** Persist `df` as snapshot `version` of `name`: bucketed AND
    * sorted on `keyCols` into `nBuckets` (one file per bucket), data
    * under `dir/v<version>`. Overwrites a same-version snapshot (the
    * retry case). */
  def write(df: DataFrame, name: String, version: Long, dir: String,
            keyCols: Seq[String], nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS ${tableName(name, version)}")
    df.repartition(nBuckets, keyCols.map(col): _*)
      .write.mode("overwrite")
      .option("path", s"$dir/v$version")
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(tableName(name, version))
  }

  /** Read snapshot `version` of `name` through the catalog (the scan
    * carries the bucketing — reading the parquet path directly would
    * lose it and reintroduce the shuffle). */
  def read(spark: SparkSession, name: String, version: Long): DataFrame =
    spark.table(tableName(name, version))

  /** The change feed between two bucketed snapshots: same
    * classification and payload shape as [[AtomicParquetSink
    * .diffFull]] (`key…, change, _old, _new`), but the full-outer
    * join runs Exchange-free over the co-located bucket scans. */
  def diff(spark: SparkSession, name: String, fromVersion: Long,
           toVersion: Long, keyCols: Seq[String]): DataFrame =
    AtomicParquetSink.diffFrames(
      read(spark, name, fromVersion), read(spark, name, toVersion),
      keyCols, s"v$fromVersion", s"v$toVersion")

  /** Drop a snapshot's catalog entry (external data files stay where
    * `write` put them — retention of the files is the caller's GC,
    * as in the atomic sink). */
  def drop(spark: SparkSession, name: String, version: Long): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${tableName(name, version)}")
    ()
  }
}
