package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema enforcement for every append path onto a plain parquet
  * directory (MoR upserts, Z-order appends, bloom-layout appends,
  * streaming indexed appends): a batch whose column set drifts from
  * the table's would append a mixed-schema file — parquet unions by
  * the reader's schema, so the drift SILENTLY drops columns on reads
  * long after the write "succeeded". Fail loud at write time instead,
  * naming the drift (Delta's schema-enforcement stance); schema
  * evolution stays an explicit atomic-sink rewrite
  * ([[AtomicParquetSink]]). */
object SchemaGuard {

  /** Schema-in-metadata, the Delta/Iceberg stance: after a schema
    * evolution the table's schema can no longer be derived from a
    * sampled data-file footer (old files miss the new columns, and
    * WHICH file defines the schema would be listing-order roulette),
    * so [[DeletionVectors.evolveAppend]] persists the union schema in
    * a `_schema.json` sidecar and every read/rewrite of the directory
    * resolves through it — one file stat per read, no per-file footer
    * merging (`mergeSchema` is O(files), this is O(1)). Absent
    * sidecar = never evolved = the plain parquet-derived schema. */
  private def schemaPath(dir: String) = new Path(dir, "_schema.json")

  def storedSchema(spark: SparkSession,
                   dir: String): Option[org.apache.spark.sql.types.StructType] = {
    val p = schemaPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(
        new String(buf, "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  /** Atomically persist the table schema — overwrite-rename via
    * [[AtomicFiles.replace]], no delete-then-rename window: this file
    * is CORRECTNESS-BEARING (a reader finding no sidecar falls back
    * to footer-derived schema, resurrecting dropped columns), so a
    * crash mid-swap must leave the old schema readable, never a gap. */
  def writeSchema(spark: SparkSession, dir: String,
                  schema: org.apache.spark.sql.types.StructType): Unit =
    AtomicFiles.replace(spark.sparkContext.hadoopConfiguration,
      schemaPath(dir), schema.json.getBytes("UTF-8"))

  /** A column DROPPED by [[DeletionVectors.dropColumn]] stays in the
    * stored schema flagged with this metadata key (column-mapping
    * lite): the flag remembers the physical name+type so a later
    * evolve can't re-add a conflicting column that would resurrect
    * old file values, while [[visible]] keeps it out of every read
    * projection. */
  val DroppedKey = "graft.dropped"

  def visible(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(schema.fields.filterNot(f =>
      f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)))

  /** The table's authoritative VISIBLE schema: the stored sidecar
    * (minus dropped columns) when the table has evolved, else the
    * parquet-derived one. */
  def tableSchema(spark: SparkSession,
                  dir: String): org.apache.spark.sql.types.StructType =
    storedSchema(spark, dir).map(visible)
      .getOrElse(spark.read.parquet(dir).schema)

  /** Safe metadata-only type widenings (the lattice Spark's
    * vectorized parquet reader decodes natively: old narrow pages
    * under the wider read schema) — shared by the directory-listing
    * tier's [[DeletionVectors.evolveAppend]] and the log-backed
    * [[MorLog.evolveAppend]]. */
  def widens(from: org.apache.spark.sql.types.DataType,
             to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
  }

  /** No-op when `dir` holds no data file yet (first write defines the
    * schema). */
  def requireSameColumns(spark: SparkSession, dir: String,
                         batch: DataFrame, who: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (!hasData) return
    val table = tableSchema(spark, dir)
      .map(f => f.name -> f.dataType).toMap
    val b = batch.schema.map(f => f.name -> f.dataType).toMap
    val retyped = table.keySet.intersect(b.keySet)
      .filter(c => table(c) != b(c))
      .map(c => s"$c: ${table(c).simpleString} -> ${b(c).simpleString}")
    require(b == table,
      s"$who: batch schema drifts from the table's — " +
        s"extra ${(b.keySet -- table.keySet).toSeq.sorted}, " +
        s"missing ${(table.keySet -- b.keySet).toSeq.sorted}, " +
        s"retyped ${retyped.toSeq.sorted}; evolve the schema " +
        "through an explicit atomic-sink rewrite, not an append")
  }
}
