package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-route physical writes — the batch half of the reference's
  * multi-sink fan-out (`/root/reference/src/process.py:43-115`, one
  * changelog stream → ClickHouse + Redis + external HTTP with
  * per-sink filters). Here each route is a parquet partition:
  * `partitionBy("route")` gives one directory per destination from a
  * single pass over the data, so downstream per-sink consumers read
  * only their partition (partition pruning — no re-scan, no
  * per-sink job).
  *
  * The streaming variant is
  * [[graft.streaming.EngagementStream.runFanout]], which calls
  * [[writeRouted]] per micro-batch inside `foreachBatch`.
  */
object Router {

  /** Tag each event with its destination and write one parquet
    * partition per route. `mode` is overwrite for batch loads,
    * append for streaming micro-batches. */
  def writeRouted(events: DataFrame, outDir: String, mode: String = "overwrite"): Unit =
    events
      .withColumn("route", Engagement.routeExpr(col("event_type")))
      .write
      .partitionBy("route")
      .mode(mode)
      .parquet(outDir)

  /** Read back the routed output and re-aggregate per route — used to
    * assert the physical fan-out agrees with the logical
    * [[Engagement.eventRouter]] counts. */
  def routedCounts(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(col("route"))
      .agg(count("*").as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("route"))
}
