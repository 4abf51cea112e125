package graft

import graft.ann.Pq
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the PQ-ADC operator: code-range/compression structure,
  * and the defining ADC invariant the row oracle can't state — the
  * ADC score of (query, neighbor) equals the EXACT dot product of the
  * query with the neighbor's centroid-decoded reconstruction. */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("codes are one byte per subspace (m ints in [0,256))") {
    val e = Tables.embeddings(spark, d)
    val means = Pq.fitMeans(e, "embedding")
    assert(means.length == 64)
    val codes = e.select(Pq.codesColumn("embedding", means, 8).as("c"))
      .select(explode(col("c")).as("code"))
    val mm = codes.agg(min("code"), max("code"), count(lit(1))).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= 255)
    assert(mm.getLong(2) == e.count() * 8) // 8 bytes per vector
  }

  test("persisted index answers exactly like the inline scan; appends encode against the stored codebook") {
    val work = java.nio.file.Files.createTempDirectory("graft-pqidx-")
      .toString
    val e = Tables.embeddings(spark, d)
    val queries = e.filter(col("vec_id") < 5)
    // full-corpus index == inline ADC
    graft.ann.PqIndex.write(e, "embedding", "vec_id", s"$work/a", m = 8)
    val persisted = graft.ann.PqIndex.adcTopK(spark, s"$work/a",
      queries, "embedding", "vec_id", m = 8, k = 3)
    val means = Pq.fitMeans(e, "embedding")
    val inline = Pq.adcTopK(e, queries, "embedding", "vec_id", means,
      m = 8, k = 3)
    assert(persisted.exceptAll(inline).isEmpty &&
      inline.exceptAll(persisted).isEmpty)
    // append path: stored thresholds, not retrained ones
    val train = e.filter(col("vec_id") % 10 =!= 0)
    val rest = e.filter(col("vec_id") % 10 === 0)
    graft.ann.PqIndex.write(train, "embedding", "vec_id", s"$work/b",
      m = 8)
    graft.ann.PqIndex.append(spark, rest, "embedding", "vec_id",
      s"$work/b", m = 8)
    val trainMeans = Pq.fitMeans(train, "embedding")
    val expected = e.select(col("vec_id"),
      Pq.codesColumn("embedding", trainMeans, 8).as("codes"))
    val stored = spark.read.parquet(s"$work/b/codes")
    assert(stored.count() == e.count())
    assert(stored.exceptAll(expected).isEmpty &&
      expected.exceptAll(stored).isEmpty,
      "appended codes must come from the STORED thresholds")
  }

  test("ADC score = query · centroid-decoded neighbor, exactly") {
    val e = Tables.embeddings(spark, d)
    val means = Pq.fitMeans(e, "embedding")
    val queries = e.filter(col("vec_id") < 3)
    val top = Pq.adcTopK(e, queries, "embedding", "vec_id", means,
      m = 8, k = 3).collect()
    assert(top.length == 9)
    // reference: decode every vector through the codebook, dot with
    // the raw query — driver-side on the tiny fixture
    val cb = Pq.codebook(e, "embedding", means, 8).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
      .toMap
    val vecs = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val codes = e.select(col("vec_id"),
        Pq.codesColumn("embedding", means, 8).as("c")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    top.foreach { r =>
      val q = vecs(r.getLong(0))
      val nCodes = codes(r.getLong(2))
      val expected = (0 until 8).map { s =>
        (0 until 8).map { b =>
          q(s * 8 + b) * cb((s, nCodes(s), b))
        }.sum
      }.sum
      val exp5 = math.floor(expected * 1e5 + 0.5) / 1e5
      assert(math.abs(r.getDouble(3) - exp5) < 1e-9,
        s"ADC ${r.getDouble(3)} != q·decode $exp5 for " +
          s"(${r.getLong(0)}, ${r.getLong(2)})")
    }
  }
}
