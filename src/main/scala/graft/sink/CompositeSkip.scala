package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite data skipping: ONE table, TWO orthogonal metadata
  * sidecars, one scan. A Z-order layout gives every file a tight
  * min/max box over the curve dims (range pruning, `_manifest`);
  * a bloom index gives every file a membership filter over any
  * high-cardinality column (equality pruning, `_bloom_<col>`). A
  * query carrying BOTH predicate shapes — "these ids, inside this
  * box" — reads only the files surviving the INTERSECTION of the two
  * prune passes, each of which consults a metadata-sized sidecar and
  * zero data bytes. This is the Delta/Iceberg stacking of file stats
  * with bloom indexes: the prune sets compose by plain set
  * intersection because each is independently sound (neither can
  * drop a file that holds a matching row), so their intersection is
  * sound too, and it is never larger than the tighter of the two.
  *
  * At 100 TB this is the difference between "the box prunes to 2% of
  * files but the id fetch inside it still scans all 2%" and "the id
  * fetch touches the one or two files that BOTH contain the id and
  * intersect the box". Stale sidecars degrade independently: each
  * side falls back to its scan recompute, and the intersection stays
  * exact (just slower to decide).
  *
  * Reference anchor: the reference indexes SEVERAL paths on one
  * container (README.md:261-270 — booking_id, customer_id,
  * booking_date, timestamp in one indexing policy) and pairs hash
  * distribution with a columnstore's segment elimination on the
  * warehouse side (README.md:455-472); this composes the same
  * multi-access-path idea onto one parquet layout.
  */
object CompositeSkip {

  /** Files surviving BOTH the manifest box prune and the bloom
    * membership prune — intersected by file name (the recorded
    * qualified paths can differ in scheme between sidecars). */
  def survivingFiles(spark: SparkSession, dir: String,
                     box: Seq[(String, Column, Column)],
                     keyCol: String, values: Seq[Column]): Seq[String] = {
    val boxFiles = ZOrderLayout.survivingFilesN(
      ZOrderLayout.manifestN(spark, dir, box.map(_._1)), box)
    val mayContain = BloomSkipIndex.survivingFiles(spark, dir, keyCol, values)
      .map(f => new Path(f).getName).toSet
    boxFiles.filter(f => mayContain(new Path(f).getName))
  }

  /** Composite-pruned scan: read only the files surviving both prune
    * passes, then re-apply the exact box AND membership predicates.
    * Row-identical to filtering the full table — both prune sides are
    * individually sound, so no file holding a matching row can be
    * skipped by their intersection. */
  def prunedScan(spark: SparkSession, dir: String,
                 box: Seq[(String, Column, Column)],
                 keyCol: String, values: Seq[Column]): DataFrame = {
    val files = survivingFiles(spark, dir, box, keyCol, values)
    val src =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    src.filter(box.map { case (d, lo, hi) =>
        col(d) >= lo && col(d) <= hi
      }.reduce(_ && _))
      .filter(values.map(col(keyCol) === _).reduce(_ || _))
  }
}
