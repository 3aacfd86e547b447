package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming upsert/changelog compaction — the Structured Streaming
  * analog of the reference's CDC relay
  * (`/root/reference/src/ingest.py:34-56`: postgres-cdc →
  * upsert-kafka keyed by id, where the topic IS the latest-per-key
  * table).
  *
  * Each micro-batch is MERGEd into a compacted parquet table inside
  * `foreachBatch`: union the previous compacted state with the new
  * batch, keep the latest row per key by (ts, event_id), write the
  * new version, drop the old one. The compacted table is
  * latest-per-key at every version boundary, and after the stream
  * drains it equals the batch
  * [[graft.operators.Engagement.cdcLatestByKey]] — which is exactly
  * what the correctness gate checks (same DuckDB oracle).
  *
  * Scale: state size is O(distinct keys), not O(stream length); the
  * merge shuffles only the compacted table + the new batch on the
  * key. At warehouse scale the same `merge` body targets a format
  * with real MERGE INTO (Delta/Iceberg) instead of
  * versioned-directory swaps.
  */
final class CdcCompact(stateDir: String) {
  /** Recovered on construction so a restarted job (new instance, same
    * state dir + checkpoint) continues from the last committed
    * version instead of silently dropping prior state. Re-running an
    * uncommitted batch after a crash is harmless: `merge` is
    * idempotent (latest-per-key over already-merged rows is a
    * no-op). */
  @volatile private var version: Long = {
    val d = new java.io.File(stateDir)
    if (!d.exists()) -1L
    else d.listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
      .sorted.lastOption.getOrElse(-1L)
  }

  private val outCols =
    Seq(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))

  private def latestPerKey(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(outCols: _*)
  }

  /** foreachBatch body. */
  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    val spark = batch.sparkSession
    val incoming = batch.select(outCols: _*)
    val merged =
      if (version < 0) latestPerKey(incoming)
      else latestPerKey(spark.read.parquet(s"$stateDir/v$version").unionByName(incoming))
    merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  /** The compacted table at the current version. */
  def table(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$stateDir/v$version")
}

object CdcCompact {

  /** Stage the events table as `nFiles` parquet files so the file
    * source delivers a genuinely incremental stream
    * (maxFilesPerTrigger=1 → one MERGE per file). */
  private[streaming] def stageSplitEvents(spark: SparkSession, dir: String,
                                          out: String, nFiles: Int): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(out)
  }

  /** Queries entry: run the compaction over a multi-batch replay of
    * the events table and return the final compacted table (oracle:
    * same SQL as `cdc_latest_by_key`). */
  def streamCdcCompact(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = Files.createTempDirectory("graft_cdc_").toString
    stageSplitEvents(spark, dir, s"$work/input", nFiles)
    val cdc = new CdcCompact(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      cdc.merge)
    cdc.table(spark).orderBy(col("user_id"))
  }
}
