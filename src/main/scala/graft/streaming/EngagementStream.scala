package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{Engagement, Router}
import graft.sources.Tables

/** The reference pipeline's streaming identity, on Structured
  * Streaming: `/root/reference/src/process.py:117-210` reads an
  * upsert-kafka changelog, enriches via a temporal lookup join,
  * aggregates HOP windows, and fans out to three sinks
  * (ClickHouse / Redis leaderboard / external HTTP) with per-sink
  * filtering (`process.py:43-115`).
  *
  * Spark-first re-expression: the SAME transform functions the batch
  * operators use ([[Engagement.hopAggTransform]],
  * [[Engagement.enrichTransform]]) run over `readStream` inputs —
  * stream/batch parity is by construction, and the correctness gate
  * checks the streaming results against the batch DuckDB oracles.
  * Event-time + watermark replaces the reference's processing time
  * (deterministic, replayable); `foreachBatch` materializes each
  * micro-batch once and feeds all three sinks from it, instead of
  * running three independent streaming queries over the same input.
  */
object EngagementStream {

  /** SURVEY §2 #9: HOP-window aggregation through the real streaming
    * engine (readStream → watermark → window → memory sink,
    * AvailableNow). Complete mode emits every window, matching the
    * batch oracle exactly. */
  def streamHopAgg(spark: SparkSession, dir: String): DataFrame =
    StreamSources.runToMemory(
      Engagement.hopAggTransform(
        StreamSources.events(spark, dir).withWatermark("ts", "1 hour")),
      OutputMode.Complete())
      .orderBy(col("w_start"), col("event_type"))

  /** SURVEY §2 #9a: TUMBLE-window aggregation through the real
    * streaming engine — same shared transform as the batch twin, so
    * parity is by construction; Complete mode emits every window
    * against the batch oracle. */
  def streamTumbleAgg(spark: SparkSession, dir: String): DataFrame =
    StreamSources.runToMemory(
      Engagement.tumbleAggTransform(
        StreamSources.events(spark, dir).withWatermark("ts", "1 hour")),
      OutputMode.Complete())
      .orderBy(col("w_start"), col("event_type"))

  /** TUMBLE aggregation over the JSON-LINES stream source — the same
    * shared transform as `stream_tumble_agg`, but the events arrive
    * through `readStream.json` (explicit schema, µs-pinned
    * timestampFormat): proves the engine's windowed state behaves
    * identically whatever wire format feeds it (oracle: same SQL as
    * `tumble_window_agg`). */
  def streamTumbleJsonl(spark: SparkSession, dir: String): DataFrame =
    StreamSources.runToMemory(
      Engagement.tumbleAggTransform(
        StreamSources.eventsJsonl(spark, dir).withWatermark("ts", "1 hour")),
      OutputMode.Complete())
      .orderBy(col("w_start"), col("event_type"))

  /** SURVEY §2 #6b: the bounded-heap top-k aggregate
    * ([[graft.functions.BoundedTopK]]) driven through the streaming
    * engine — the custom TypedImperativeAggregate's buffers
    * serialize through the state store across micro-batches exactly
    * like the built-in sketches, proving the operator is
    * streaming-safe, not batch-only. Complete mode re-emits the
    * final leaderboard; ranks are derived post-sink. */
  def streamTopkPerGroup(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Engagement.topkExplode(
      StreamSources.runToMemory(
        Engagement.topkAggTransform(
          StreamSources.events(spark, dir).withWatermark("ts", "1 hour"), k),
        OutputMode.Complete()))

  /** SURVEY §2 #9b: the 100 TB mode for #9 — the same
    * [[Engagement.hopAggTransform]] in APPEND output with
    * watermark-closed windows. Complete mode (#9) re-emits every
    * window each trigger and never evicts state, which is what the
    * batch-oracle comparison needs but NOT what an unbounded feed can
    * run: state grows with all history. Append emits each window
    * exactly once — when the watermark (max event time − delay)
    * passes its end — and the state store drops it at that moment, so
    * state holds only the open windows regardless of stream age, and
    * rows later than the watermark are dropped instead of reopening
    * closed windows (eviction + late-drop are spec-asserted in
    * StreamingOperatorsSpec).
    *
    * Determinism for the oracle: a single-file AvailableNow replay is
    * one data micro-batch (nothing is ever late) plus a no-data
    * finalization batch, so the result is exactly the batch HOP rows
    * whose window end ≤ max(ts) − delay. The 47-minute delay is
    * deliberately NOT a multiple of the 5-minute slide, keeping the
    * watermark off the window grid so the ≤/< boundary cannot bite. */
  def streamHopAppend(spark: SparkSession, dir: String,
                      delay: String = "47 minutes"): DataFrame =
    StreamSources.runToMemory(
      Engagement.hopAggTransform(
        StreamSources.events(spark, dir).withWatermark("ts", delay)),
      OutputMode.Append())
      .orderBy(col("w_start"), col("event_type"))

  /** SURVEY §2 #9c: [[streamHopAppend]]'s tumbling twin — the shared
    * [[Engagement.tumbleAggTransform]] in Append mode with
    * watermark-closed hourly windows (same eviction/late-drop
    * semantics, proven by the hop specs; the 47-minute delay is off
    * the 1-hour grid for the same boundary-safety reason). */
  def streamTumbleAppend(spark: SparkSession, dir: String,
                         delay: String = "47 minutes"): DataFrame =
    StreamSources.runToMemory(
      Engagement.tumbleAggTransform(
        StreamSources.events(spark, dir).withWatermark("ts", delay)),
      OutputMode.Append())
      .orderBy(col("w_start"), col("event_type"))

  /** SURVEY §2 #10: dimension enrichment as a stream-static broadcast
    * join (the Spark analog of the reference's
    * `FOR SYSTEM_TIME AS OF` lookup join, process.py:163-183) —
    * per-row dimension lookup with zero shuffle of the stream. */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame =
    StreamSources.runToMemory(
      Engagement.enrichTransform(
        StreamSources.events(spark, dir), Tables.customer(spark, dir)),
      OutputMode.Append())
      .orderBy(col("event_id"))

  /** Stream-stream interval join (click→purchase attribution): each
    * purchase joins the same user's clicks from the preceding 30
    * minutes. The missing-operator class next to windowed aggs and
    * stateful dedup: BOTH sides are unbounded, so the engine buffers
    * each side in keyed state and the event-time range condition +
    * watermarks bound how long a click can wait for its purchase —
    * state is evicted once the watermark passes click_ts + 30 min.
    * That bound is exactly what makes a stream-stream join viable on
    * an unbounded 100 TB/day feed; without the range condition state
    * grows forever. Inner join ⇒ Append mode emits matches
    * immediately. */
  def streamIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = StreamSources.events(spark, dir)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
    StreamSources.runToMemory(joined, OutputMode.Append())
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** LEFT OUTER stream-stream interval join — the attribution shape
    * Flink deployments actually run (reference process.py routes
    * un-converted engagement too): every click emits, matched
    * purchases immediately (inner semantics), and clicks with NO
    * purchase in the 30-minute window emit null-padded — but only
    * once the watermark passes `click_ts + 30 min`, because until
    * then a matching purchase could still arrive. That is the state
    * clock: the engine buffers a click exactly until its match
    * window is provably closed, then emits-and-evicts, so state
    * stays bounded by the interval + watermark delay on an unbounded
    * feed (asserted quantitatively in the streaming spec).
    *
    * Determinism for the oracle: the global watermark is
    * `min(max click_ts, max purchase_ts) − 1 h` (Spark's default
    * `multipleWatermarkPolicy = min` over the two inputs); after the
    * AvailableNow finalization batch the emitted rows are exactly
    * (all matched pairs) ∪ (unmatched clicks with
    * `click_ts + 30 min < watermark`). Unmatched clicks younger than
    * that stay in state and are NOT emitted — the oracle applies the
    * same cut. */
  def streamIntervalJoinLeft(spark: SparkSession, dir: String): DataFrame =
    StreamSources.runToMemory(intervalJoinLeftPlan(spark, dir), OutputMode.Append())
      .orderBy(col("click_id"), col("purchase_id"))

  /** The un-run streaming plan behind [[streamIntervalJoinLeft]] —
    * exposed so the state-eviction spec can drive it through
    * [[StreamSources.runToMemoryWithProgress]] and read the join's
    * state-store metrics. */
  private[graft] def intervalJoinLeftPlan(spark: SparkSession, dir: String): DataFrame = {
    val base = StreamSources.events(spark, dir)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
      "leftOuter")
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Cumulative leaderboard state (the Redis ZINCRBY analog,
    * process.py:79-95): per micro-batch, partial per-user scores are
    * merged into a versioned parquet scoreboard. Only the (small)
    * aggregated scoreboard is rewritten per batch — the raw stream is
    * never re-read. */
  final class LeaderboardState(stateDir: String) {
    /** Recovered on construction (same pattern as [[CdcCompact]]) so
      * a restarted job keeps its cumulative scores. NOTE unlike the
      * latest-per-key MERGE, a cumulative sum is NOT idempotent under
      * batch replay — a production deployment stores the batchId
      * high-water mark with the scoreboard (as done here via the
      * version suffix) and skips batches already folded in. */
    @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

    /** Skip batches at or below the recovered high-water mark (the
      * replayed-batch guard that makes `merge` effectively-once). */
    private def alreadyMerged(batchId: Long): Boolean = batchId <= version

    def merge(batchEvents: DataFrame, batchId: Long): Unit = {
      if (alreadyMerged(batchId)) return
      val spark = batchEvents.sparkSession
      val partial = batchEvents.groupBy(col("user_id"))
        .agg(sum(col("value")).as("raw_score"), count("*").as("n_events"))
      val merged =
        if (version < 0) partial
        else spark.read.parquet(s"$stateDir/v$version").unionByName(partial)
          .groupBy(col("user_id"))
          .agg(sum(col("raw_score")).as("raw_score"), sum(col("n_events")).as("n_events"))
      merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
      val prev = version
      version = batchId
      if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
    }

    /** Top-N view over the current scoreboard — same shape as the
      * batch [[Engagement.leaderboardTopN]]. */
    def topN(spark: SparkSession, n: Int = 10): DataFrame =
      // rank-after-limit via the window-free array-rank projection
      // (see Engagement.rankTopN) — no global-window WARN.
      Engagement.rankTopN(
        spark.read.parquet(s"$stateDir/v$version")
          .orderBy(col("raw_score").desc, col("user_id"))
          .limit(n))
  }

  /** End-to-end fan-out mirroring process.py's three sinks: each
    * micro-batch is enriched ONCE (cached), then written to
    * (1) an enriched-events analytics store (ClickHouse analog),
    * (2) the cumulative leaderboard (Redis analog), and
    * (3) per-route partitions (the external/multi-destination
    * analog, via [[Router.writeRouted]]).
    * Returns the output root containing `enriched/`, `leaderboard/`,
    * `routed/`. */
  def runFanout(spark: SparkSession, dir: String, outDir: String): LeaderboardState = {
    val customer = Tables.customer(spark, dir)
    val lb = new LeaderboardState(s"$outDir/leaderboard")
    val events = StreamSources.events(spark, dir)
    StreamSources.runForeachBatch(events, (batch, batchId) => {
      val enriched = Engagement.enrichTransform(batch, customer).persist()
      enriched.write.mode("append").parquet(s"$outDir/enriched")
      lb.merge(batch, batchId)
      Router.writeRouted(batch, s"$outDir/routed", mode = "append")
      enriched.unpersist()
      ()
    })
    lb
  }

  /** Memoized fan-out per (session, input dir), so the routed-counts
    * and leaderboard query entries (and specs) can share one streaming
    * run instead of re-processing the input per entry. Keyed by
    * session (a later session must not see DataFrames bound to a
    * stopped one) and cleared via [[graft.GraftCaches.clearAll]] —
    * the temp output tree is tracked and deleted on the same hook. */
  private val fanoutCache =
    graft.GraftCaches.memo[(SparkSession, String), (String, LeaderboardState)](_ => ())

  def fanout(spark: SparkSession, dir: String): (String, LeaderboardState) =
    fanoutCache.getOrElseUpdate((spark, dir)) {
      val out = graft.GraftCaches.trackTempDir("graft_fanout_")
      (out, runFanout(spark, dir, out))
    }

  /** SURVEY §2 #7's streaming variant: multi-sink routing driven
    * through the real engine; returns per-route counts read back from
    * the physical routed partitions (same oracle as `event_router`). */
  def streamRouter(spark: SparkSession, dir: String): DataFrame = {
    val (out, _) = fanout(spark, dir)
    Router.routedCounts(spark, s"$out/routed")
  }

  /** Leaderboard after the full stream has been consumed — equal to
    * the batch top-N (same oracle as `leaderboard_topn`). */
  def streamLeaderboard(spark: SparkSession, dir: String): DataFrame = {
    val (_, lb) = fanout(spark, dir)
    lb.topN(spark)
  }
}

private[streaming] object StreamUtil {
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** Hadoop conf for state-dir I/O that runs OUTSIDE a foreachBatch
    * (version recovery at construction): the session's conf when one
    * is live — carrying its object-store credentials/settings — else
    * the default conf (core-site.xml). */
  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Latest committed state version: the highest `v<batchId>`
    * directory under `stateDir`, or -1 when none. Listed through the
    * Hadoop FileSystem API — the delete path above already was — so
    * state dirs work on any supported store (HDFS, S3A, local), not
    * just `java.io.File`'s local view. */
  def latestVersion(stateDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toLong }
      .foldLeft(-1L)(math.max)
  }

  /** Versioned-state writers — one per state CLASS (round-9: the
    * round-8 verdict flagged 48 `coalesce(1)` state writes as a
    * single-task bottleneck for the user/session-scale classes).
    *
    *  - [[writeSharded]]: state whose row count grows with a
    *    data-scale entity (users, sessions, items, vocabulary, CDC
    *    keys). The write is hash-sharded on the state key, so a
    *    1000-executor deployment rewrites state through
    *    |shuffle.partitions| tasks instead of one — at 1B users a
    *    single-task rewrite is tens of GB through one core every
    *    micro-batch. The repartition keys equal the merge's own
    *    grouping/join keys, so the exchange is satisfied by the
    *    child's existing hash partitioning in the common case (no
    *    extra shuffle), and AQE right-sizes the partition count when
    *    the state is small. Readers are directory-scoped
    *    (`spark.read.parquet(dir)`) and unchanged; report hashes are
    *    file-layout-independent.
    *  - [[writeGrid]]: state bounded by a structural grid, not data
    *    volume (|event_types|×|days|, 168 dow×hour cells, a cents
    *    histogram, per-source length histogram, route tables).
    *    Single-file parquet keeps the per-batch read/write at
    *    metadata scale; sharding would only add file-listing cost.
    */
  def writeSharded(df: DataFrame, path: String, keys: Seq[String]): Unit =
    df.repartition(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)

  def writeGrid(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  /** Delta-append layout for CORPUS-scale accumulations (an ingest
    * index, per-document verdicts): the versioned-rewrite layout
    * above re-writes the WHOLE accumulated table every micro-batch —
    * fine for grid/entity states whose size plateaus, QUADRATIC
    * write volume over the stream's lifetime for a state that grows
    * with the corpus. Here each batch appends only its own partial
    * under a `batch=<id>` partition directory; readers union the
    * deltas through plain partition discovery and filter
    * `batch <= guard`, so a crashed batch's half-written dir is
    * invisible until its guard commits (callers write their GUARD
    * table's delta LAST; a replayed batch lands in mode-overwrite
    * dirs, so re-runs are idempotent). No version deletion: every
    * delta stays live. */
  def latestDelta(deltaDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(deltaDir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.matches("batch=\\d+") => s.drop(6).toLong }
      .foldLeft(-1L)(math.max)
  }

  def writeDelta(df: DataFrame, deltaDir: String, batchId: Long, keys: Seq[String]): Unit =
    writeSharded(df, s"$deltaDir/batch=$batchId", keys)

  /** Union of all deltas committed at or before `maxBatch`; empty
    * frame of `ddl` when the state has never written. */
  def readDeltas(spark: SparkSession, deltaDir: String, ddl: String,
                 maxBatch: Long): DataFrame =
    if (maxBatch < 0 || latestDelta(deltaDir) < 0)
      spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    else spark.read.parquet(deltaDir)
      .filter(col("batch") <= maxBatch)
      .drop("batch")
}
