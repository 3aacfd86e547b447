package graft

import org.apache.spark.sql.SparkSession

/** Throughput surface: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query
  * wall-times. Queries are materialized through the `noop` sink —
  * full execution of the physical plan (unlike `count()`, which lets
  * the optimizer delete final sorts/projections) with zero write
  * cost. Failures are surfaced per-query in an `errors` object and
  * via a nonzero exit, never silently recorded as a timing. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JIT + codegen infrastructure + parquet reader +
    // noop sink init. Without it the first timed query absorbs ~6s of
    // one-time session cost regardless of what it computes.
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().orderBy("r_regionkey")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.toSet).toMap
      else SparkEntry.queries
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        // Timing includes any memo-cache/persist fill the query does —
        // honest per-query cost against a clean JVM.
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        // Failed queries are NOT recorded in the timings/total — a
        // fast failure must not read as a fast run.
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      // Bench hygiene (round-2 verdict): memoized persisted tables,
      // cached blocks, and streaming temp dirs from one query must not
      // contaminate the next query's timing.
      GraftCaches.clearAll()
      spark.catalog.clearCache()
      // Spark's ContextCleaner reclaims dead shuffle files / broadcast
      // blocks only when the JVM garbage-collects — on a 24g heap that
      // can be never, so 49 queries' worth of shuffle state piles up on
      // /tmp and bleeds IO into later timings. Outside the timed
      // window by construction.
      System.gc()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
