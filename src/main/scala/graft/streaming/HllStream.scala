package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming approximate-distinct (daily unique users) over HLL
  * sketch state — the scale path for "DAU on an unbounded stream":
  * exact distinct needs per-key user sets (state grows with users),
  * a Datasketches HLL union is a few KB per day FOREVER, and the
  * union is associative + commutative, so batch boundaries are
  * invisible by construction. The same sketch-column discipline as
  * [[graft.operators.Olap]] `hllSketchDaily` (reference: the daily
  * rollups its ClickHouse sink serves, `src/process.py:43-76`);
  * state versioning/replay-guard is the [[ValueCountState]] pattern.
  *
  * Approximate by construction → no DuckDB oracle (rows-only);
  * spec-gated instead on (a) EXACT equality with the one-shot batch
  * sketch (merge-invariance: same sketches whether the stream saw 1
  * batch or 10) and (b) ±5% of true exact distinct.
  */
final class HllDistinctState(stateDir: String, lgConfigK: Int = 14) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, sk BINARY"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgConfigK)).as("sk"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("day"))
      .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def estimates(spark: SparkSession): DataFrame =
    prior(spark)
      .select(col("day"),
        round(hll_sketch_estimate(col("sk"))).cast("long").as("est_users"))
      .orderBy(col("day"))
}

object HllStream {

  /** Queries entry (rows-only): daily `est_users` after draining the
    * staged corpus through the real streaming engine. */
  def streamApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_hll_")
    val state = new HllDistinctState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.estimates(spark)
  }

  /** Queries entry (rows-only): weekly p50/p95/p99 from the merged
    * per-day KLL state after draining the staged corpus — the
    * streaming face of `kll_quantiles_daily`. KLL merges are
    * associative/commutative but RANDOMIZED (compaction coin flips),
    * so unlike the HLL/CMS twins the parity spec asserts rank-error
    * bounds, not byte equality. */
  def streamKllQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_kll_")
    val state = new KllDailyState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `cms_top_items`): the CMS
    * counter grid is plain Long addition, so the sketch a stream
    * maintains equals the sketch a batch build produces — the
    * deterministic-hash design makes that an exact equality, checked
    * by the shared DuckDB oracle. */
  def streamCms(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_scms_")
    val state = new CmsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.topItems(spark)
  }
}

/** Streaming Count–Min state — [[graft.operators.Sketches]]' twin:
  * the d×w counter grid is additive (Long sums), so the per-batch
  * merge is a grid union + re-sum and batch boundaries are invisible
  * in the estimates; the candidate dictionary (the sketch answers
  * point queries, it cannot enumerate keys) is the idempotent
  * distinct-item presence set, vocab-like and hash-sharded on write.
  * Versioned-parquet + replay-guard discipline ([[CdcCompact]]).
  *
  * This pair is exactly what a production streaming counter keeps:
  * bounded sketch for the heavy tail, a key dictionary for the
  * queryable head. */
final class CmsState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorCounters(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "j BIGINT, bucket BIGINT, c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/counters")

  private def priorItems(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](),
        StructType.fromDDL("item BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/items")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val items = batch
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"))
    val partial = graft.operators.Sketches.cmsCountersTransform(items)
    val counters = priorCounters(spark).unionByName(partial)
      .groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))
    val dict = priorItems(spark)
      .unionByName(items.filter(col("item").isNotNull).distinct())
      .distinct()
    StreamUtil.writeGrid(counters, s"$stateDir/v$batchId/counters")
    StreamUtil.writeSharded(dict, s"$stateDir/v$batchId/items", Seq("item"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def topItems(spark: SparkSession): DataFrame =
    graft.operators.Sketches.cmsTopFromState(
      priorCounters(spark), priorItems(spark))
}

/** Streaming KLL quantile state — `kll_quantiles_daily`'s twin: one
  * few-KB binary sketch per (week, day), merged per batch with
  * [[graft.functions.KllMergeAgg]] (associative + commutative, so
  * batch boundaries never change what the sketch REPRESENTS — only
  * the randomized compaction path, whose error the spec bounds).
  * Exact weekly percentiles on an unbounded stream would need
  * per-key value multisets (state grows with events); this state is
  * O(weeks · days) sketches forever. Report is the batch operator's
  * own [[graft.operators.Olap.kllWeeklyReport]].
  * Versioned-parquet + replay-guard discipline ([[CdcCompact]]). */
final class KllDailyState(stateDir: String, k: Int = 200) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "week TIMESTAMP, day TIMESTAMP, sk BINARY"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val partial = batch
      .select(date_trunc("week", col("ts")).as("week"),
        date_trunc("day", col("ts")).as("day"), col("value"))
      .groupBy(col("week"), col("day"))
      .agg(call_function("graft_kll_agg", col("value"), lit(k)).as("sk"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("week"), col("day"))
      .agg(call_function("graft_kll_merge", col("sk"), lit(k)).as("sk"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    graft.operators.Olap.kllWeeklyReport(prior(spark), k)
  }
}
