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

  /** No-op when `dir` holds no data file yet (first write defines the
    * schema). */
  def requireSameColumns(spark: SparkSession, dir: String,
                         batch: DataFrame, who: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (!hasData) return
    val table = spark.read.parquet(dir).schema
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
