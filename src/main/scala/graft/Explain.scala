package graft


/** Plan auditor: prints the formatted physical plan of each named
  * `SparkEntry` query (all queries if none named) over a given sf dir.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 q58_simhash_pairs ..."
  *
  * Used to keep plans honest as the surface grows: pushed filters,
  * broadcast choices, WholeStageCodegen spans, and the absence of
  * Cartesian products are all visible here.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate(cores = 8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      try println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
    }
    spark.stop()
  }
}
