package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostics: prints `explain("formatted")` for selected
  * queries (all batch queries by default — streaming entries execute
  * on construction, so they're skipped unless named explicitly).
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.filterNot(_.startsWith("stream_")).toSeq.sorted
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
