package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.Tables

/** Streaming last-touch attribution: the carry-forward window of
  * [[graft.operators.Behavior.attributionTransform]] maintained
  * incrementally across micro-batches.
  *
  * State = two small tables, versioned per batch (the [[FunnelState]]
  * MERGE pattern, replay-guarded the same way):
  *  - `lt`: one row per user — the latest touch seen so far as
  *    (ts, event_id, event_type), i.e. exactly the struct the batch
  *    operator's window max carries, with its ORIGINAL timestamp so
  *    the lookback expiry keeps working across batches;
  *  - `acc`: accumulated per-touch-type conversion counts and
  *    attributed value in integer CENTS (the tumble-agg exact-sum
  *    trick: per-batch rounded doubles would drift from the batch
  *    oracle, integer cents cannot).
  *
  * Each batch unions the prior per-user touch (as a pseudo-row that
  * sorts before every batch event — delivery is time-ordered) with
  * the batch events, runs the SAME struct-max window, attributes the
  * batch's purchases, and merges both state tables. Correctness
  * rests on event-time-ordered replay, as in [[FunnelStream]]: a
  * purchase is attributed when its batch closes, and no later batch
  * may deliver an earlier touch.
  */
final class AttributionState(stateDir: String, lookback: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def ltPrior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, event_type STRING"))
    else spark.read.parquet(s"$stateDir/v$version/lt")

  private def accPrior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "touch_type STRING, n_conversions BIGINT, cents BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/acc")

  /** foreachBatch body; exactly-once under replay via the
    * batchId <= version guard. */
  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession

    // prior per-user touch as a pseudo event: value never read (it is
    // not a purchase), event_type is the touch's own type
    val pseudo = ltPrior(spark)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lit(null).cast("double").as("value"))
    val uni = batch
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .union(pseudo)

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("view", "click"),
      struct(col("ts"), col("event_id"), col("event_type")))

    // batch purchases attributed against state ∪ batch touches;
    // pseudo rows are never purchases, so no double counting
    val batchAttr = uni.withColumn("last_touch", max(touch).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("touch_type",
        when(col("last_touch").isNotNull &&
             col("last_touch.ts") >= col("ts") - expr(lookback),
          col("last_touch.event_type")).otherwise(lit("none")))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("b_n"),
           sum(round(col("value") * 100).cast("long")).as("b_cents"))

    val acc = accPrior(spark).join(batchAttr, Seq("touch_type"), "full_outer")
      .select(col("touch_type"),
        (coalesce(col("n_conversions"), lit(0L)) + coalesce(col("b_n"), lit(0L))).as("n_conversions"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("b_cents"), lit(0L))).as("cents"))

    // merged latest touch per user = struct max over prior ∪ batch
    val lt = uni.filter(col("event_type").isin("view", "click"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("t"))
      .select(col("user_id"), col("t.ts").as("ts"),
        col("t.event_id").as("event_id"), col("t.event_type").as("event_type"))

    // lt is |users| rows — sharded by user_id hash so the rewrite
    // scales with the cluster; acc is |touch_types| rows (grid)
    StreamUtil.writeSharded(lt, s"$stateDir/v$batchId/lt", Seq("user_id"))
    StreamUtil.writeGrid(acc, s"$stateDir/v$batchId/acc")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  /** The attribution report over the accumulated state — same shape
    * (and oracle) as the batch query: cents/100 equals the oracle's
    * round(sum(value), 2) because inputs are 2-decimal. */
  def report(spark: SparkSession): DataFrame =
    accPrior(spark)
      .select(col("touch_type"), col("n_conversions"),
        (col("cents").cast("double") / 100.0).as("attributed_value"))
      .orderBy(col("touch_type"))
}

object AttributionStream {

  /** Queries entry: time-ordered replay through the incremental
    * attribution state machine (oracle: same SQL as
    * `attribution_last_touch`). */
  def streamAttribution(spark: SparkSession, dir: String, nFiles: Int = 4,
                        lookback: String = "INTERVAL 7 DAYS"): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_attr_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new AttributionState(s"$work/state", lookback)
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }
}

/** Streaming Markov (removal-effect) attribution —
  * [[graft.operators.MultiTouch.markovAttributionTransform]]'s twin
  * under time-ordered replay: the chain's transition counts are
  * ADDITIVE once journeys are truncated consistently, and the
  * truncation state is a per-user frontier (last journey state + a
  * converted flag). Per batch: events of already-converted users are
  * dropped, each live user's batch slice truncates at its first
  * purchase, the first batch transition hangs off the frontier's
  * last state (START for new users), and the frontier advances.
  * Terminal NULL rows are NOT stored — the READ face derives them
  * from the frontier (a non-converted user's journey "ends today"
  * exactly like the batch operator's last-event terminal), then runs
  * the SHARED `markovFromCounts` folds. Correctness rests on
  * event-time-ordered replay like [[FunnelStream]]/[[AttributionState]].
  */
final class MarkovAttrState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorCounts(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "prev STRING, curr STRING, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/counts")

  private def priorFrontier(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, last_st STRING, converted BOOLEAN"))
    else spark.read.parquet(s"$stateDir/v$version/frontier")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val fr = priorFrontier(spark)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val seq0 = batch
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
    val live = seq0.join(
      fr.filter(col("converted")).select(col("user_id")), Seq("user_id"), "left_anti")
    val pcut = live.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("rn")).as("prn"))
    val j = live.join(pcut, Seq("user_id"), "left")
      .filter(col("prn").isNull || col("rn") <= col("prn"))
      .select(col("user_id"), col("rn"),
        when(col("event_type") === "purchase", lit("CONV"))
          .otherwise(col("event_type")).as("st"))
    val wj = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    val trans = j.withColumn("p0", lag(col("st"), 1).over(wj))
      .join(fr.select(col("user_id"), col("last_st")), Seq("user_id"), "left")
      .select(coalesce(col("p0"), col("last_st"), lit("START")).as("prev"),
        col("st").as("curr"))
    val counts = priorCounts(spark)
      .unionByName(trans.groupBy(col("prev"), col("curr")).agg(count(lit(1)).as("n")))
      .groupBy(col("prev"), col("curr")).agg(sum(col("n")).as("n"))
    val lastRow = j
      .withColumn("mx", max(col("rn")).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === col("mx"))
      .select(col("user_id"), col("st").as("b_st"))
    val frontier = fr.join(lastRow, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("b_st"), col("last_st")).as("last_st"),
        (coalesce(col("converted"), lit(false)) || col("b_st") === "CONV")
          .as("converted"))
      .select(col("user_id"), col("last_st"),
        coalesce(col("converted"), lit(false)).as("converted"))
    StreamUtil.writeGrid(counts, s"$stateDir/v$batchId/counts")
    StreamUtil.writeSharded(frontier, s"$stateDir/v$batchId/frontier", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  /** Read face: counts ∪ the frontier's derived NULL terminals →
    * the shared removal-effect folds. */
  def report(spark: SparkSession): DataFrame = {
    val nulls = priorFrontier(spark).filter(!col("converted"))
      .select(col("last_st").as("prev"), lit("NULL").as("curr"))
      .groupBy(col("prev"), col("curr")).agg(count(lit(1)).as("n"))
    graft.operators.MultiTouch.markovFromCounts(
      priorCounts(spark).unionByName(nulls)
        .groupBy(col("prev"), col("curr")).agg(sum(col("n")).as("n")))
  }
}

object MarkovAttrStream {

  /** Queries entry (oracle: same SQL as `markov_attribution`):
    * time-ordered replay through the incremental journey-chain state. */
  def streamMarkovAttribution(spark: SparkSession, dir: String,
                              nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_smattr_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new MarkovAttrState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }
}
