package graft

/** Plan-audit helper: print the formatted physical plan of one or
  * more SparkEntry queries without executing them —
  * `runMain graft.Explain <sfDir> <query> [query…]`. The per-round
  * bench-hygiene loop is: add an operator, read its plan here (are
  * filters pushed? dims broadcast? codegen spans wide? exchanges
  * justified?), and only then freeze a baseline row.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
