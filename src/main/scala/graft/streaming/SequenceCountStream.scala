package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructType}

import graft.operators.Sequences

/** Streaming sequence-count: [[Sequences.sequenceCountTransform]]'s
  * packed-DFA fold maintained incrementally — state is ONE BIGINT per
  * user (`acc = count*4 + stage`), each batch folds its time-sorted
  * codes on top of the stored accumulator (the fold's init is the
  * prior state column, so the DFA literally resumes mid-pattern
  * across the batch boundary). The DFA step is the very
  * [[Sequences.seqDfaStep]] lambda the batch operator folds with —
  * stream/batch parity by shared code, not by parallel
  * implementations.
  *
  * Like [[AttributionStream]]/[[FunnelStream]], correctness rests on
  * event-time-ordered replay (staged via
  * [[FunnelStream.stageTimeOrdered]]): a later batch may not deliver
  * an earlier event, because a DFA mid-state cannot be rewound.
  * State is |users| rows of two BIGINTs — the smallest state table
  * in the streaming family; replay-guarded and versioned like every
  * state here.
  */
final class SequenceCountState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, acc BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = Sequences.codedEvents(batch)
      .groupBy(col("user_id"))
      .agg(transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("code")))),
        s => s.getField("code")).as("codes"))
    val merged = prior(spark).join(partial, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        aggregate(
          coalesce(col("codes"), lit(Array.empty[Long])),
          coalesce(col("acc"), lit(0L)),
          Sequences.seqDfaStep).as("acc"))
    merged.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  /** Same histogram shape (and oracle) as the batch query. */
  def histogram(spark: SparkSession): DataFrame =
    prior(spark)
      .select((col("acc") / 4).cast("long").as("n_sequences"))
      .groupBy(col("n_sequences")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_sequences"))
}

object SequenceCountStream {

  /** Queries entry: time-ordered replay through the incremental DFA
    * (oracle: same recursive-CTE SQL as `sequence_count`). */
  def streamSequenceCount(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_seqcnt_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new SequenceCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.histogram(spark)
  }
}
