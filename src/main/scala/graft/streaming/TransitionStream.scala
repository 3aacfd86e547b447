package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming twins for the per-user-order family that [[graft
  * .operators.Behavior.transitionsTransform]] heads, plus the EXACT
  * distinct-users counterpart of [[HllStream]]'s approximate sketch.
  *
  * [[TransitionState]] is the interesting one: transition counting is
  * NOT purely additive — the pair that spans a micro-batch boundary
  * (user's last event in batch k, first event in batch k+1) exists in
  * no single batch — so the state carries two tables: the additive
  * `(prev, curr, n)` counts AND a per-user `(ts, event_id,
  * event_type)` frontier whose join against each new batch's
  * first-per-user rows reconstructs exactly the boundary pairs. Under
  * time-ordered replay the stream total therefore equals the batch
  * window count row-for-row (the stream_attribution argument; ties in
  * `ts` across a file boundary are the one caveat, and the staged
  * replay's range partitioning makes them impossible at µs
  * resolution).
  *
  * Both states follow the versioned-parquet + replayed-batch-guard
  * discipline of [[CdcCompact]] (idempotent under crash replay).
  */
final class TransitionState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorPairs(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "prev_type STRING, curr_type STRING, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/pairs")

  private def priorLast(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, p_ts TIMESTAMP, p_eid BIGINT, p_type STRING"))
    else spark.read.parquet(s"$stateDir/v$version/last")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val b = batch.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
    val inBatch = b.filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("curr_type"))
      .agg(count(lit(1)).as("n"))
    val boundary = priorLast(spark)
      .join(b.filter(col("rn") === 1).select(col("user_id"), col("event_type")), Seq("user_id"))
      .groupBy(col("p_type").as("prev_type"), col("event_type").as("curr_type"))
      .agg(count(lit(1)).as("n"))
    val pairs = priorPairs(spark).unionByName(inBatch).unionByName(boundary)
      .groupBy(col("prev_type"), col("curr_type"))
      .agg(sum(col("n")).as("n"))
    // per-user frontier: the (ts, event_id)-max event, batch vs prior
    val bLast = b.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("s"))
      .select(col("user_id"), col("s.ts").as("b_ts"),
        col("s.event_id").as("b_eid"), col("s.event_type").as("b_type"))
    // CASE branches must agree on struct FIELD NAMES, not just types
    val pS = struct(col("p_ts").as("ts"), col("p_eid").as("eid"), col("p_type").as("tp"))
    val bS = struct(col("b_ts").as("ts"), col("b_eid").as("eid"), col("b_type").as("tp"))
    val last = priorLast(spark).join(bLast, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("b_ts").isNull, pS)
          .when(col("p_ts").isNull, bS)
          .when(struct(col("b_ts"), col("b_eid")) >= struct(col("p_ts"), col("p_eid")), bS)
          .otherwise(pS).as("s"))
      .select(col("user_id"), col("s.ts").as("p_ts"),
        col("s.eid").as("p_eid"), col("s.tp").as("p_type"))
    StreamUtil.writeGrid(pairs, s"$stateDir/v$batchId/pairs")
    StreamUtil.writeSharded(last, s"$stateDir/v$batchId/last", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Behavior.transitionReport(priorPairs(spark))

  /** The SAME (prev, curr, n) pair state serves the stationary-
    * distribution fold — second face (a fixed point is a whole-
    * matrix read; the counts merge). */
  def reportMarkov(spark: SparkSession): DataFrame =
    graft.operators.Stats.markovFromCounts(
      priorPairs(spark).select(col("prev_type"), col("curr_type"), col("n")))

  /** THIRD face: expected steps to absorption — the value iteration
    * is a whole-matrix read, the pair counts merge. */
  def reportAbsorption(spark: SparkSession): DataFrame =
    graft.operators.Stats.absorptionFromCounts(
      priorPairs(spark).select(col("prev_type"), col("curr_type"), col("n")))

  /** FOURTH face: the full first-passage matrix — |types| value
    * iterations over the SAME additive pair counts. */
  def reportFirstPassage(spark: SparkSession): DataFrame = {
    val counts = priorPairs(spark)
      .select(col("prev_type"), col("curr_type"), col("n")).localCheckpoint()
    Seq("click", "error", "purchase", "signup", "view").map { t =>
      graft.operators.Stats.absorptionFromCounts(counts, t)
        .select(org.apache.spark.sql.functions.lit(t).as("target"),
          col("event_type"), col("e6"), col("expected_steps"))
    }.reduce(_ unionByName _).orderBy(col("target"), col("event_type"))
  }
}

/** Exact distinct users per day on an unbounded stream — the
  * ground-truth twin [[HllStream]]'s sketch is judged against when
  * the key space still fits: a distinct `(day, user_id)` rollup (set
  * union is idempotent, so replayed batches cannot double-count) plus
  * an additive per-day event tally. State is |days|·|active users|
  * rows — the honest cost of exactness; the sketch twin is the
  * constant-memory 100 TB default. */
final class DistinctDailyState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorPairs(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, user_id BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/pairs")

  private def priorCounts(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, n_events BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/counts")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val days = batch.select(date_trunc("day", col("ts")).as("day"), col("user_id"))
    val pairs = priorPairs(spark).unionByName(days.distinct()).distinct()
    val counts = priorCounts(spark)
      .unionByName(days.groupBy(col("day")).agg(count(lit(1)).as("n_events")))
      .groupBy(col("day")).agg(sum(col("n_events")).as("n_events"))
    StreamUtil.writeGrid(pairs, s"$stateDir/v$batchId/pairs")
    StreamUtil.writeGrid(counts, s"$stateDir/v$batchId/counts")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    priorPairs(spark).groupBy(col("day")).agg(count(lit(1)).as("n_users"))
      .join(priorCounts(spark), Seq("day"))
      .select(col("day"), col("n_users"), col("n_events"))
      .orderBy(col("day"))

  /** The SAME distinct-(day,user) state serves the whole
    * activity-derived family: growth accounting and trailing
    * actives both derive from it through the batch operators' own
    * expression trees. */
  def reportLifecycle(spark: SparkSession): DataFrame =
    graft.operators.Behavior.lifecycleFromDays(
      priorPairs(spark).select(col("user_id"), col("day")))

  def reportDauWauMau(spark: SparkSession): DataFrame =
    graft.operators.Behavior.dauWauMauFromDays(
      priorPairs(spark).select(col("day"), col("user_id")))
}

/** Inter-event gap histogram on an unbounded stream — the FOURTH
  * cross-batch-pair family member (after transitions / TWA /
  * strict-funnel): the gap spanning a micro-batch boundary (user's
  * last event in batch k → first in k+1) exists in no single batch,
  * so the state carries the additive `(bucket, n_gaps)` histogram
  * PLUS the per-user `(ts, event_id)` frontier whose join against
  * each batch's first-per-user row reconstructs exactly the boundary
  * gap. In-batch gaps and the bucket expression go through the SAME
  * shared trees as the batch operator
  * ([[graft.operators.Behavior.gapBucketCounts]] /
  * `bucketizeGapUs`), so stream ≡ batch by construction under
  * time-ordered replay. */
final class IntereventState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorBuckets(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "bucket BIGINT, n_gaps BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/buckets")

  private def priorLast(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, p_ts TIMESTAMP, p_eid BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/last")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val b = batch.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
    val inBatch = graft.operators.Behavior.gapBucketCounts(b)
    val boundary = graft.operators.Behavior.bucketizeGapUs(
      priorLast(spark)
        .join(b.filter(col("rn") === 1).select(col("user_id"), col("ts")), Seq("user_id"))
        .select((unix_micros(col("ts")) - unix_micros(col("p_ts"))).as("gap_us")))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_gaps"))
    val buckets = priorBuckets(spark).unionByName(inBatch).unionByName(boundary)
      .groupBy(col("bucket")).agg(sum(col("n_gaps")).as("n_gaps"))
    val bLast = b.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"))).as("s"))
      .select(col("user_id"), col("s.ts").as("b_ts"), col("s.event_id").as("b_eid"))
    val pS = struct(col("p_ts").as("ts"), col("p_eid").as("eid"))
    val bS = struct(col("b_ts").as("ts"), col("b_eid").as("eid"))
    val last = priorLast(spark).join(bLast, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("b_ts").isNull, pS)
          .when(col("p_ts").isNull, bS)
          .when(struct(col("b_ts"), col("b_eid")) >= struct(col("p_ts"), col("p_eid")), bS)
          .otherwise(pS).as("s"))
      .select(col("user_id"), col("s.ts").as("p_ts"), col("s.eid").as("p_eid"))
    StreamUtil.writeGrid(buckets, s"$stateDir/v$batchId/buckets")
    StreamUtil.writeSharded(last, s"$stateDir/v$batchId/last", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Behavior.intereventFromBuckets(priorBuckets(spark))
}

/** Peak session concurrency on an unbounded stream — the SESSION
  * member of the cross-batch family: a 30-minute-gap session can
  * stay open across ANY number of micro-batch boundaries, so the
  * state is the append-only table of CLOSED `(s_ts, e_ts)` intervals
  * plus a per-user OPEN-session frontier `(o_sts, o_lts)`. Each
  * batch sessionizes through the batch operator's own
  * gaps-and-islands tree ([[graft.operators.Retention
  * .sessionIntervals]]); a user's first batch session merges into
  * the frontier when the boundary gap is within the session gap,
  * every non-final session closes, and the final one becomes the new
  * frontier. The report derives the per-day peak over closed ∪ open
  * through the shared `peakFromSessions` — stream ≡ batch by
  * construction under time-ordered replay. State is |closed
  * sessions| rows — the honest cost of exact session accounting (the
  * DistinctDailyState class); a watermark would bound it by closing
  * frontiers past the horizon. */
final class PeakSessionState(stateDir: String, gapMinutes: Int = 30) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)
  private val gapUs = gapMinutes * 60L * 1000000L

  private def priorClosed(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "s_ts TIMESTAMP, e_ts TIMESTAMP"))
    else spark.read.parquet(s"$stateDir/v$version/closed")

  private def priorOpen(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, o_sts TIMESTAMP, o_lts TIMESTAMP"))
    else spark.read.parquet(s"$stateDir/v$version/open")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val sess = graft.operators.Retention.sessionIntervals(batch, gapMinutes)
    val w = Window.partitionBy(col("user_id")).orderBy(col("s_ts"))
    val marked = sess
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .join(priorOpen(spark), Seq("user_id"), "left")
      .withColumn("merged", col("rn") === 1 && col("o_lts").isNotNull &&
        unix_micros(col("s_ts")) - unix_micros(col("o_lts")) <= gapUs)
      .withColumn("s_ts2", when(col("merged"), col("o_sts")).otherwise(col("s_ts")))
    // a frontier NOT continued by its user's first batch session closes
    val frontierClosed = marked.filter(col("rn") === 1 &&
        col("o_lts").isNotNull && !col("merged"))
      .select(col("o_sts").as("s_ts"), col("o_lts").as("e_ts"))
    val inBatchClosed = marked.filter(col("rn") < col("n"))
      .select(col("s_ts2").as("s_ts"), col("e_ts"))
    val closed = priorClosed(spark)
      .unionByName(frontierClosed).unionByName(inBatchClosed)
    // new frontier: each batch user's LAST session; untouched users keep theirs
    val openBatch = marked.filter(col("rn") === col("n"))
      .select(col("user_id"), col("s_ts2").as("o_sts"), col("e_ts").as("o_lts"))
    val openKept = priorOpen(spark)
      .join(sess.select(col("user_id")).distinct(), Seq("user_id"), "left_anti")
    val open = openKept.unionByName(openBatch)
    StreamUtil.writeSharded(closed, s"$stateDir/v$batchId/closed", Seq("s_ts"))
    StreamUtil.writeSharded(open, s"$stateDir/v$batchId/open", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Retention.peakFromSessions(allSessions(spark))

  /** The SAME closed-∪-open session state serves the duration
    * histogram — one state, two session-shaped faces. */
  def reportDurations(spark: SparkSession): DataFrame =
    graft.operators.Retention.durationsFromSessions(allSessions(spark))

  private def allSessions(spark: SparkSession): DataFrame =
    priorClosed(spark).unionByName(
      priorOpen(spark).select(col("o_sts").as("s_ts"), col("o_lts").as("e_ts")))
}

/** Incremental item-transition EDGE SET — `scc_items`' twin: the
  * distinct directed (item → next item) graph maintained across
  * micro-batches. Unlike [[TransitionState]]'s counts, the state is
  * a SET (distinct union = idempotent, so replays and boundary
  * re-derivations cannot corrupt it), bounded by |items|² — grid
  * class, versioned-rewrite layout. In-batch hops come from the same
  * (ts, event_id) window as the batch operator; cross-batch hops are
  * stitched from the per-user frontier (last non-null-item event),
  * the [[TransitionState]] discipline at item grain. The report runs
  * [[graft.operators.Graph.sccFromEdges]], so the coloring/peeling
  * derivation is shared code. */
final class ItemEdgeState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorEdges(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "a BIGINT, b BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/edges")

  private def priorItems(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "item BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/items")

  private def priorLast(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, p_ts TIMESTAMP, p_eid BIGINT, p_item BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/last")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // null-item events are transparent (the batch operator filters
    // them BEFORE its lead window), so filter first, then window
    val b = batch
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_item", lag(col("item"), 1).over(w))
    val inBatch = b.filter(col("prev_item").isNotNull)
      .select(col("prev_item").as("a"), col("item").as("b"))
    val boundary = priorLast(spark)
      .join(b.filter(col("rn") === 1).select(col("user_id"), col("item")), Seq("user_id"))
      .select(col("p_item").as("a"), col("item").as("b"))
    val edges = priorEdges(spark).unionByName(inBatch).unionByName(boundary)
      .distinct()
    val items = priorItems(spark).unionByName(b.select(col("item"))).distinct()
    val bLast = b.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("item"))).as("s"))
      .select(col("user_id"), col("s.ts").as("b_ts"),
        col("s.event_id").as("b_eid"), col("s.item").as("b_item"))
    val pS = struct(col("p_ts").as("ts"), col("p_eid").as("eid"), col("p_item").as("it"))
    val bS = struct(col("b_ts").as("ts"), col("b_eid").as("eid"), col("b_item").as("it"))
    val last = priorLast(spark).join(bLast, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("b_ts").isNull, pS)
          .when(col("p_ts").isNull, bS)
          .when(struct(col("b_ts"), col("b_eid")) >= struct(col("p_ts"), col("p_eid")), bS)
          .otherwise(pS).as("s"))
      .select(col("user_id"), col("s.ts").as("p_ts"),
        col("s.eid").as("p_eid"), col("s.it").as("p_item"))
    StreamUtil.writeGrid(edges, s"$stateDir/v$batchId/edges")
    StreamUtil.writeGrid(items, s"$stateDir/v$batchId/items")
    StreamUtil.writeSharded(last, s"$stateDir/v$batchId/last", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Graph.sccFromEdges(spark,
      priorItems(spark), priorEdges(spark))
}

object TransitionStream {

  /** Queries entry (oracle: same SQL as `scc_items`): time-ordered
    * staged replay; the edge SET is batching-invariant (in-batch
    * window + frontier stitching reproduce every consecutive hop
    * exactly once; distinct union absorbs any overlap), so the
    * drained stream's SCC labeling equals the batch operator's. */
  def streamSccItems(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sscc_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new ItemEdgeState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `event_transitions`). */
  def streamTransitions(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_trans_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TransitionState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `distinct_daily`). */
  def streamDistinctDaily(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_ddaily_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new DistinctDailyState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  private def drainedDayState(spark: SparkSession, dir: String,
                              prefix: String, nFiles: Int): DistinctDailyState = {
    val work = graft.GraftCaches.trackTempDir(prefix)
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new DistinctDailyState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state
  }

  /** Queries entry (oracle: same SQL as `markov_stationary`): the
    * SAME (prev, curr, n) pair state as stream_transitions, second
    * face. */
  def streamMarkov(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_smkv_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TransitionState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportMarkov(spark)
  }

  /** Queries entry (oracle: same SQL as `absorption_steps`): the
    * SAME transition-pair state, third face. */
  def streamAbsorption(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sabs_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TransitionState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportAbsorption(spark)
  }

  /** Queries entry (oracle: same SQL as `first_passage_matrix`): the
    * SAME transition-pair state, fourth face. */
  def streamFirstPassage(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sfpm_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TransitionState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportFirstPassage(spark)
  }

  /** Queries entry (oracle: same SQL as `interevent_histogram`). */
  def streamInterevent(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sgap_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new IntereventState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `peak_concurrency`). */
  def streamPeakConcurrency(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame =
    drainedSessionState(spark, dir, "graft_speak_", nFiles).report(spark)

  /** Queries entry (oracle: same SQL as `session_duration`). */
  def streamSessionDuration(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame =
    drainedSessionState(spark, dir, "graft_sdur_", nFiles).reportDurations(spark)

  private def drainedSessionState(spark: SparkSession, dir: String,
                                  prefix: String, nFiles: Int): PeakSessionState = {
    val work = graft.GraftCaches.trackTempDir(prefix)
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new PeakSessionState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state
  }

  /** Queries entry (oracle: same SQL as `user_lifecycle`). */
  def streamUserLifecycle(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame =
    drainedDayState(spark, dir, "graft_slife_", nFiles).reportLifecycle(spark)

  /** Queries entry (oracle: same SQL as `dau_wau_mau`). */
  def streamDauWauMau(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame =
    drainedDayState(spark, dir, "graft_sdau_", nFiles).reportDauWauMau(spark)
}
