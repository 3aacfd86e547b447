package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference pipeline's core surface, re-expressed Spark-first.
  *
  * Reference: saqqaf/flink-engagement-pipeline `src/process.py` —
  * upsert-kafka source (changelog compaction), temporal lookup join
  * against a Postgres dim (`process.py:150-176`), derived engagement
  * metrics, HOP-window aggregation feeding a Redis leaderboard
  * (`process.py:195-204`), and per-sink changelog routing
  * (`process.py:43-115`).
  *
  * These are the *batch* semantics of each operator on the test
  * corpus (events fact + customer dim); `graft.streaming` carries the
  * same logic on Structured Streaming. Every op is a declarative
  * DataFrame transform: Catalyst handles pushdown, broadcast picks,
  * and partial aggregation. Scale notes on each method.
  */
object Engagement {

  /** Changelog/upsert compaction: keep the latest record per key.
    *
    * The batch analog of the reference's upsert-kafka topic keyed by
    * `id` (`ingest.py:35-52`): given an append log, the compacted
    * table is the last row per key by event time.
    *
    * Scale: single shuffle on the key (`row_number` window). At 100
    * TB, prefer partitioned parquet on key-hash so compaction is a
    * per-partition sort with no wide shuffle.
    */
  def cdcLatestByKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .orderBy($"user_id")
  }

  /** Changelog compaction WITH delete semantics: the reference's
    * changelog carries row-kinds (postgres-cdc WAL deletes,
    * `ingest.py:21-31`; sinks filter kinds, `process.py:45-46`).
    * Batch semantics: latest row per key wins — unless that row is a
    * tombstone, in which case the key is gone. The row-kind here is
    * derived from the test corpus ([[opExpr]]: `error` = delete); the
    * streaming twin ([[graft.streaming.CdcCompact]]) retains
    * tombstones in state so late-arriving older upserts cannot
    * resurrect a key.
    */
  def cdcWithDeletes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("op", opExpr($"event_type"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" === "upsert")
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .orderBy($"user_id")
  }

  /** SCD type-2 history reconstruction from the changelog — the
    * versioned-dimension table a warehouse keeps where
    * [[cdcLatestByKey]] keeps only the live row: per key, each run
    * of consecutive IDENTICAL states collapses to one validity
    * interval `[valid_from, valid_to)`, open-ended (`valid_to`
    * NULL, `is_current` true) for the latest state. No-op changes
    * (same state re-asserted) extend the interval instead of
    * splitting it — the run-collapse uses the gaps-and-islands
    * row_number difference, not a lag-filter that would mis-date
    * `valid_to` at run boundaries.
    *
    * Shape: ONE user_id shuffle; both row_number windows and the
    * lead() share the same (user_id, ts, event_id) sort, so Catalyst
    * plans a single Window over a single Sort — no second exchange;
    * output ≤ input rows.
    */
  def cdcScd2Transform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val byTs = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val byTypeTs = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    val runs = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("rn", row_number().over(byTs))
      // gaps-and-islands: rows of one state run share (rn - rn_type)
      .withColumn("grp", $"rn" - row_number().over(byTypeTs))
      .groupBy($"user_id", $"event_type", $"grp")
      .agg(min($"ts").as("valid_from"), min($"rn").as("orun"))
    val byRun = Window.partitionBy($"user_id").orderBy($"orun")
    runs
      .withColumn("valid_to", lead($"valid_from", 1).over(byRun))
      .withColumn("version", row_number().over(byRun).cast("long"))
      .select($"user_id", $"version", $"event_type".as("state"),
        $"valid_from", $"valid_to", $"valid_to".isNull.as("is_current"))
      .orderBy($"user_id", $"version")
  }

  def cdcScd2(spark: SparkSession, dir: String): DataFrame =
    cdcScd2Transform(Tables.events(spark, dir))

  /** Incremental SCD2 maintenance — apply a NEW change batch to an
    * EXISTING versioned dimension without rebuilding history (the
    * nightly-merge a warehouse actually runs; [[cdcScd2Transform]] is
    * the from-scratch backfill): closed versions pass through
    * untouched; each key's OPEN row re-enters the run-collapse as a
    * pseudo-event carrying its run start, so a batch that re-asserts
    * the current state EXTENDS the open interval and a state change
    * closes it at exactly the new run's `valid_from`; version numbers
    * continue from the stored history. By construction the result
    * equals the full-log rebuild row-for-row — which is precisely the
    * oracle (`cdc_scd2`'s SQL over the whole log).
    *
    * Shape: history and batch meet only on co-partitioned user_id
    * joins; the rebuild windows run over open-rows+batch (the
    * incremental slice), never the full history.
    */
  def scd2ApplyTransform(history: DataFrame, batch: DataFrame): DataFrame = {
    val spark = history.sparkSession
    import spark.implicits._
    val closed = history.filter(!$"is_current")
      .select($"user_id", $"version", $"state", $"valid_from", $"valid_to", $"is_current")
    val open = history.filter($"is_current")
    // the open run re-enters as a pseudo-event at its run start;
    // event_id −1 sorts before any real event at the same µs (ids are
    // non-negative), preserving the original run order under ties
    val tailEvents = open
      .select($"user_id", $"valid_from".as("ts"), lit(-1L).as("event_id"),
        $"state".as("event_type"))
      .unionByName(batch.select($"user_id", $"ts", $"event_id", $"event_type"))
    val offsets = open.select($"user_id", ($"version" - 1L).as("voff"))
    val tail = cdcScd2Transform(tailEvents)
      .join(offsets, Seq("user_id"), "left")
      .select($"user_id", ($"version" + coalesce($"voff", lit(0L))).as("version"),
        $"state", $"valid_from", $"valid_to", $"is_current")
    closed.unionByName(tail).orderBy($"user_id", $"version")
  }

  /** Queries entry: split the log at mid-span, build the dim from the
    * first half, apply the second half incrementally. The oracle is
    * the FULL-log `cdc_scd2` SQL — incremental-equals-rebuild is the
    * operator's correctness contract, so the split point is free to
    * be anything. */
  def scd2ApplyBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val bounds = events.agg(
      date_trunc("day", min($"ts")).as("lo"), date_trunc("day", max($"ts")).as("hi"))
    val withCut = events.crossJoin(broadcast(bounds))
      .withColumn("cut", expr("lo + make_interval(0, 0, 0, CAST(datediff(hi, lo) div 2 AS INT))"))
    scd2ApplyTransform(
      cdcScd2Transform(withCut.filter($"ts" < $"cut")),
      withCut.filter($"ts" >= $"cut"))
  }

  /** DuckDB oracle for [[cdcScd2Transform]]. */
  val cdcScd2OracleSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
      |         row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |       - row_number() OVER (PARTITION BY user_id, event_type ORDER BY CAST(ts AS TIMESTAMP), event_id) AS grp
      |  FROM events),
      |r AS (SELECT user_id, event_type, grp, min(ts) AS valid_from, min(rn) AS orun
      |      FROM e GROUP BY 1, 2, 3),
      |v AS (SELECT user_id, event_type, valid_from,
      |             lead(valid_from) OVER (PARTITION BY user_id ORDER BY orun) AS valid_to,
      |             CAST(row_number() OVER (PARTITION BY user_id ORDER BY orun) AS BIGINT) AS version
      |      FROM r)
      |SELECT user_id, version, event_type AS state, valid_from, valid_to,
      |       valid_to IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  /** Dimension-enrichment lookup join + derived engagement metrics.
    *
    * Mirrors `process.py:150-176`: events LEFT JOIN dim, then
    * `engagement_seconds = duration/1000` and a divide-guarded
    * `engagement_pct`. The dim (customer) is broadcast — a lookup
    * join at any scale, zero shuffle of the fact table.
    */
  /** The join + derived-metric transform shared verbatim by the batch
    * query and the Structured Streaming variant
    * ([[graft.streaming.EngagementStream]]) — stream/batch parity by
    * construction. Works on any events-shaped DataFrame (bounded or
    * unbounded). */
  def enrichTransform(events: DataFrame, customer: DataFrame): DataFrame = {
    val c = customer.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    events.join(broadcast(c), events("user_id") === c("c_custkey"), "left")
      .select(
        events("event_id"), events("user_id"), events("event_type"), events("value"),
        c("c_mktsegment").as("segment"),
        round(events("value") / lit(1000.0), 6).as("engagement_seconds"),
        when(c("c_acctbal") > 0, round(events("value") / c("c_acctbal"), 6))
          .otherwise(lit(null)).as("engagement_pct"))
  }

  def enrichEvents(spark: SparkSession, dir: String): DataFrame =
    enrichTransform(Tables.events(spark, dir), Tables.customer(spark, dir))
      .orderBy(col("event_id"))

  /** Sliding (HOP) window aggregation: 10-minute windows sliding by 5.
    *
    * The reference does `HOP(proc_time, 5s, 10min)` (`process.py:
    * 197-204`); we use event time (deterministic + replayable) via
    * Spark's streaming-unified `window()` — the same expression runs
    * unchanged under Structured Streaming with a watermark.
    *
    * Scale: window() is a generator (size/slide rows per event, here
    * 2x) followed by a hash aggregate with map-side partial agg — no
    * per-window state materialization.
    *
    * Streaming-unified: identical expression tree for the batch query
    * ([[hopWindowAgg]]) and the readStream variant. */
  def hopAggTransform(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count("*").as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))

  def hopWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hopAggTransform(Tables.events(spark, dir))
      .orderBy($"w_start", $"event_type")
  }

  /** Tumbling window aggregation (hourly rollup per event type).
    *
    * `value` is an exact 2-decimal quantity, so the aggregate runs on
    * integer cents: the sum is order-independent (double summation
    * noise flipped `round(avg, 4)` at boundary values — 3 windows at
    * sf0.1 disagreed with the oracle), and the final averages are a
    * single IEEE division of exact integers — bit-identical in any
    * engine.
    *
    * Streaming-unified: identical expression tree for the batch query
    * ([[tumbleWindowAgg]]) and the readStream variant (the
    * [[hopAggTransform]] pattern). */
  def tumbleAggTransform(events: DataFrame): DataFrame =
    events
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"), sum(col("cents")).as("sc"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"),
        (col("sc").cast("double") / 100.0).as("total"),
        (col("sc").cast("double") / (col("n") * 100.0)).as("avg_value"))

  def tumbleWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tumbleAggTransform(Tables.events(spark, dir))
      .orderBy($"w_start", $"event_type")
  }

  /** Session windows: 30-minute-gap sessions per user.
    *
    * Uses Spark's `session_window` (streaming-unified; merges
    * overlapping [ts, ts+gap) intervals). Window end = last event +
    * gap, matching the oracle's gaps-and-islands SQL.
    */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count("*").as("n_events"), round(sum($"value"), 2).as("total"))
      .select(
        $"user_id", $"session_window.start".as("s_start"),
        $"session_window.end".as("s_end"), $"n_events", $"total")
      .orderBy($"user_id", $"s_start")
  }

  /** Top-N leaderboard by cumulative engagement score.
    *
    * Redis-ZSET semantics from `process.py:79-95` (ZINCRBY then
    * ZRANGE): total score per key, take the top N. Implemented as
    * aggregate → `orderBy().limit(n)` so Spark plans a
    * TakeOrderedAndProject (per-partition top-N + tiny driver merge,
    * no global sort) — the shape that survives 100 TB.
    */
  def leaderboardTopN(spark: SparkSession, dir: String, n: Int = 10): DataFrame = {
    import spark.implicits._
    val scores = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(sum($"value").as("raw_score"), count("*").as("n_events"))
      .orderBy($"raw_score".desc, $"user_id")
      .limit(n)
    // Global rank over the n surviving rows. A window would need an
    // empty (or constant — which the optimizer folds away) partition
    // spec and emit the global-window WARN; instead the tiny top-N is
    // collected into ONE sorted array (negated score = descending,
    // user_id tie-break) and positions become ranks — no WindowExec,
    // one n-row aggregate. The ZRANGE half of the Redis analog.
    Engagement.rankTopN(scores)
  }

  /** rank/score/user_id/n_events projection of an already-limited
    * (user_id, raw_score, n_events) top-N set, without a global
    * window: sort_array over a collect_list of the ≤N rows, positions
    * = ranks. Shared by the batch leaderboard and the streaming
    * scoreboard view. */
  def rankTopN(scores: DataFrame): DataFrame =
    scores
      .agg(sort_array(collect_list(struct(
        (-col("raw_score")).as("neg_score"), col("user_id"),
        col("raw_score"), col("n_events")))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("pos", "r")))
      .select((col("pos") + 1).cast("long").as("rank"), col("r.user_id").as("user_id"),
        round(col("r.raw_score"), 2).as("score"), col("r.n_events").as("n_events"))
      .orderBy(col("rank"))

  /** Multi-sink routing: classify each event to a destination.
    *
    * The reference fans one changelog stream out to ClickHouse /
    * Redis / an external API with per-sink filters (`process.py:
    * 43-115`). Batch analog: a route column + per-route aggregate;
    * `Router.writeRouted` writes the actual per-route outputs, and
    * the streaming variant fans out in one foreachBatch pass.
    */
  def routeExpr(eventType: Column): Column =
    when(eventType === "purchase", "billing")
      .when(eventType === "signup", "crm")
      .when(eventType === "error", "ops")
      .otherwise("analytics")

  /** Synthetic changelog row-kind over the test corpus: `error`
    * events play the role of WAL deletes (account teardown), all
    * other kinds are upserts. Shared verbatim by [[cdcWithDeletes]],
    * the streaming twin, and the DuckDB oracle. */
  def opExpr(eventType: Column): Column =
    when(eventType === "error", "delete").otherwise("upsert")

  def eventRouter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("route", routeExpr($"event_type"))
      .groupBy($"route")
      .agg(count("*").as("n"), round(sum($"value"), 2).as("total"))
      .orderBy($"route")
  }

  /** Ordered funnel conversion: how many users reach each stage of
    * view → click → purchase IN ORDER (a later-stage event counts
    * only if it happens after the user's first qualifying
    * earlier-stage event). The sequential-pattern query every
    * engagement stack runs (ClickHouse `windowFunnel`, the classic
    * cohort funnel).
    *
    * Shape: a chain of per-stage conditional-min aggregations, each
    * keyed on user_id — stage k's aggregate filters its events
    * against stage k-1's first-time and takes `min(ts)`. Every
    * aggregate and every join shares the user_id hash partitioning,
    * so the plan shuffles the events table once per stage filter and
    * never builds per-user event lists (a `collect_list` funnel is
    * the per-user agg-buffer bomb at scale — a power user's millions
    * of events would sit in one buffer; conditional min is constant
    * state, mergeable, map-side-combinable). */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"event_type", $"ts")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = ev.filter($"event_type" === "click")
      .join(v, Seq("user_id")).filter($"ts" > $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id")).filter($"ts" > $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    ev.select($"user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c.select($"user_id", $"t_click"), Seq("user_id"), "left")
      .join(p.select($"user_id", $"t_purchase"), Seq("user_id"), "left")
      .agg(
        count($"t_view").as("reached_view"),
        count($"t_click").as("reached_click"),
        count($"t_purchase").as("reached_purchase"),
        count("*").as("n_users"))
  }

  /** Time-bounded ordered funnel (the ClickHouse `windowFunnel(T)`
    * gate): stages must still occur in order, and every later stage
    * must land within `windowHours` of the user's FIRST view — a
    * view→click chain a week apart is not a conversion journey. Same
    * chained conditional-min shape as [[funnelConversion]] (constant
    * agg state, no per-user event lists); the bound is one extra
    * predicate on each stage join, so the plan and scale story are
    * unchanged.
    */
  def funnelConversionWindowed(spark: SparkSession, dir: String,
                               windowHours: Int = 24): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"event_type", $"ts")
    val bound = expr(s"INTERVAL $windowHours HOURS")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = ev.filter($"event_type" === "click")
      .join(v, Seq("user_id"))
      .filter($"ts" > $"t_view" && $"ts" <= $"t_view" + bound)
      .groupBy($"user_id").agg(min($"ts").as("t_click"), min($"t_view").as("tv"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id"))
      .filter($"ts" > $"t_click" && $"ts" <= $"tv" + bound)
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    ev.select($"user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c.select($"user_id", $"t_click"), Seq("user_id"), "left")
      .join(p.select($"user_id", $"t_purchase"), Seq("user_id"), "left")
      .agg(
        count($"t_view").as("reached_view"),
        count($"t_click").as("reached_click"),
        count($"t_purchase").as("reached_purchase"),
        count("*").as("n_users"))
  }

  /** Funnel with an EXCLUSION step (the Amplitude/Mixpanel
    * "exclude users who did X between" gate): view → purchase
    * conversions, split by whether an `error` event landed STRICTLY
    * between the user's first view and their first subsequent
    * purchase — "purchased, but the journey hit an error" is a
    * different product story than a clean conversion, and the plain
    * funnels ([[funnelConversion]]) cannot see it.
    *
    * Same chained conditional-min shape as the ordered funnels
    * (constant agg state, no per-user event lists); the exclusion is
    * ONE more user_id-partitioned semi-join of the error slice
    * against the (t_view, t_purchase) interval — every join in the
    * plan shares the user_id hash partitioning. Strict inequalities
    * keep tie semantics engine-identical. */
  def funnelExcluding(spark: SparkSession, dir: String): DataFrame =
    funnelExcludingTransform(Tables.events(spark, dir))

  def funnelExcludingTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select($"user_id", $"event_type", $"ts")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val p = ev.filter($"event_type" === "purchase")
      .join(v, Seq("user_id")).filter($"ts" > $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"), min($"t_view").as("t_view"))
    val dirty = ev.filter($"event_type" === "error")
      .join(p, Seq("user_id"))
      .filter($"ts" > $"t_view" && $"ts" < $"t_purchase")
      .select($"user_id").distinct()
    v.agg(count(lit(1)).as("users_view"))
      .crossJoin(p.agg(count(lit(1)).as("converted")))
      .crossJoin(dirty.agg(count(lit(1)).as("excluded")))
      .select($"users_view", $"converted",
        ($"converted" - $"excluded").as("clean_converted"),
        expr("""CASE WHEN converted > 0 THEN
               |  round(CAST(converted - excluded AS DOUBLE) / converted, 6)
               |END""".stripMargin).as("clean_rate"))
  }

  /** DuckDB oracle for [[funnelExcluding]]. */
  val funnelExcludingOracleSql: String =
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |v AS (SELECT user_id, min(ts) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t_purchase, min(v.t_view) AS t_view
      |      FROM e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      |      WHERE e.event_type = 'purchase' GROUP BY 1),
      |x AS (SELECT DISTINCT e.user_id
      |      FROM e JOIN p ON e.user_id = p.user_id
      |      WHERE e.event_type = 'error' AND e.ts > p.t_view AND e.ts < p.t_purchase),
      |c AS (SELECT (SELECT count(*) FROM v) AS users_view,
      |             (SELECT count(*) FROM p) AS converted,
      |             (SELECT count(*) FROM x) AS excluded)
      |SELECT users_view, converted, converted - excluded AS clean_converted,
      |       CASE WHEN converted > 0 THEN
      |         round(CAST(converted - excluded AS DOUBLE) / converted, 6)
      |       END AS clean_rate
      |FROM c""".stripMargin

  /** Retention cohorts: users grouped by first-seen day, tracked by
    * how many are active again k days later — the DAU retention
    * triangle behind every growth dashboard.
    *
    * Two narrow aggregations: distinct (user, day) activity, a
    * per-user min(day) cohort, then a count per (cohort_day, k).
    * Everything shuffles on ids and day numbers only. The cohort
    * lookup broadcasts (one row per user — at warehouse scale this is
    * the one table worth bucketing instead; the join key is the same
    * user_id the activity table already shuffles on, so co-location
    * makes the join exchange-free). */
  def retentionCohorts(spark: SparkSession, dir: String, maxDays: Int = 7): DataFrame = {
    import spark.implicits._
    val activity = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
    val cohorts = activity.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    activity.join(cohorts, Seq("user_id"))
      .withColumn("k", datediff($"day", $"cohort_day"))
      .filter($"k" <= maxDays)
      .groupBy($"cohort_day", $"k")
      // activity is distinct (user, day) and k is a function of
      // (user, day), so each user hits a (cohort, k) cell at most
      // once — plain count avoids count-distinct's two-phase expand
      .agg(count("*").as("n_active"))
      .select(date_format($"cohort_day", "yyyy-MM-dd").as("cohort_day"), $"k".cast("long").as("k"), $"n_active")
      .orderBy($"cohort_day", $"k")
  }

  /** As-of join: each event picks up the user's most recent order at
    * or before the event's timestamp — the bounded-data cousin of the
    * reference's `FOR SYSTEM_TIME AS OF` temporal join
    * (`process.py:163-183`), where the "dimension" is itself
    * versioned by time.
    *
    * Spark-first shape: NOT a key-join-then-filter (that materializes
    * every (event, earlier-order) pair — quadratic in versions per
    * key). Instead the classic distributed merge: union both inputs
    * into one keyed timeline, one shuffle on the key, one in-partition
    * sort, and `last(..., ignoreNulls)` carries the latest order
    * forward onto each event row. O(n log n) per partition, constant
    * state per row, spills through the sort machinery — the plan you
    * want at 100 TB. Orders are first compacted to one row per
    * (custkey, date) with a deterministic tie-break (max orderkey),
    * which also makes the DuckDB `ASOF JOIN` oracle deterministic.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("last_orderkey"),
        max_by($"o_totalprice", $"o_orderkey").as("last_totalprice"))

    // side 0 = order version rows, side 1 = event rows; at an equal
    // timestamp the order sorts first, so `>=` (at-or-before) holds.
    val ou = o.select($"o_custkey".as("user_id"), $"o_orderdate".as("t"),
      lit(0).as("side"), lit(null).cast("long").as("event_id"),
      $"last_orderkey", $"o_orderdate".as("last_orderdate"), $"last_totalprice")
    val eu = Tables.events(spark, dir).select($"user_id", $"ts".as("t"),
      lit(1).as("side"), $"event_id",
      lit(null).cast("long").as("last_orderkey"),
      lit(null).cast("timestamp").as("last_orderdate"),
      lit(null).cast("double").as("last_totalprice"))

    val w = Window.partitionBy($"user_id").orderBy($"t", $"side")
      .rowsBetween(Window.unboundedPreceding, 0)
    ou.unionByName(eu)
      .withColumn("lk", last($"last_orderkey", ignoreNulls = true).over(w))
      .withColumn("ld", last($"last_orderdate", ignoreNulls = true).over(w))
      .withColumn("lp", last($"last_totalprice", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"event_id", $"t".as("ts"), $"user_id",
        $"lk".as("last_orderkey"), $"ld".as("last_orderdate"),
        round($"lp", 2).as("last_totalprice"))
      .orderBy($"event_id")
  }

  /** As-of join WITH TOLERANCE (pandas `merge_asof(tolerance=...)`):
    * the backward carry of [[asofJoin]], but a match older than
    * `tolDays` is nulled out — the semantics a feature pipeline
    * actually wants ("the customer's last order, IF it's recent
    * enough to still describe them"; an 11-month-old order row is
    * worse than NULL for a freshness-sensitive model). Same union →
    * one-shuffle → one-sort distributed merge; the tolerance is a
    * per-row datediff test on the carried order date, applied to all
    * carried columns consistently.
    */
  def asofJoinTolerance(spark: SparkSession, dir: String, tolDays: Int = 7): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("last_orderkey"),
        max_by($"o_totalprice", $"o_orderkey").as("last_totalprice"))
    val ou = o.select($"o_custkey".as("user_id"), $"o_orderdate".as("t"),
      lit(0).as("side"), lit(null).cast("long").as("event_id"),
      $"last_orderkey", $"o_orderdate".as("last_orderdate"), $"last_totalprice")
    val eu = Tables.events(spark, dir).select($"user_id", $"ts".as("t"),
      lit(1).as("side"), $"event_id",
      lit(null).cast("long").as("last_orderkey"),
      lit(null).cast("timestamp").as("last_orderdate"),
      lit(null).cast("double").as("last_totalprice"))
    val w = Window.partitionBy($"user_id").orderBy($"t", $"side")
      .rowsBetween(Window.unboundedPreceding, 0)
    ou.unionByName(eu)
      .withColumn("lk", last($"last_orderkey", ignoreNulls = true).over(w))
      .withColumn("ld", last($"last_orderdate", ignoreNulls = true).over(w))
      .withColumn("lp", last($"last_totalprice", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .withColumn("in_tol", $"ld".isNotNull && datediff($"t", $"ld") <= tolDays)
      .select($"event_id", $"t".as("ts"), $"user_id",
        when($"in_tol", $"lk").as("last_orderkey"),
        when($"in_tol", $"ld").as("last_orderdate"),
        when($"in_tol", round($"lp", 2)).as("last_totalprice"))
      .orderBy($"event_id")
  }

  /** DuckDB oracle for [[asofJoinTolerance]] — the native backward
    * ASOF join with the identical datediff null-out. */
  def asofJoinToleranceOracleSql(tolDays: Int = 7): String =
    s"""WITH o AS (
       |  SELECT o_custkey, o_orderdate,
       |         max(o_orderkey) AS last_orderkey,
       |         max_by(o_totalprice, o_orderkey) AS last_totalprice
       |  FROM orders GROUP BY 1, 2),
       |e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
       |j AS (SELECT e.event_id, e.ts, e.user_id,
       |             o.last_orderkey, o.o_orderdate AS last_orderdate, o.last_totalprice
       |      FROM e ASOF LEFT JOIN o
       |        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
       |SELECT event_id, ts, user_id,
       |       CASE WHEN last_orderdate IS NOT NULL AND date_diff('day', last_orderdate, ts) <= $tolDays
       |            THEN last_orderkey END AS last_orderkey,
       |       CASE WHEN last_orderdate IS NOT NULL AND date_diff('day', last_orderdate, ts) <= $tolDays
       |            THEN last_orderdate END AS last_orderdate,
       |       CASE WHEN last_orderdate IS NOT NULL AND date_diff('day', last_orderdate, ts) <= $tolDays
       |            THEN round(last_totalprice, 2) END AS last_totalprice
       |FROM j ORDER BY event_id""".stripMargin

  /** FORWARD as-of join — [[asofJoin]]'s time-mirror (pandas
    * `merge_asof(direction='forward')` / kdb `aj` reversed): each
    * event picks the EARLIEST order at-or-after its timestamp — the
    * "what did this touch lead to" direction where backward answers
    * "what state was current". Same distributed-merge shape (union →
    * one key shuffle → one in-partition sort), with the carry
    * flipped: `first(..., ignoreNulls)` over `[current, ∞)`, and the
    * side bit ordered so an order AT the event's timestamp sorts
    * after the event and stays inside the forward frame (`<=`
    * semantics, matching the DuckDB forward ASOF oracle's
    * `e.ts <= o.o_orderdate`).
    */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("next_orderkey"),
        max_by($"o_totalprice", $"o_orderkey").as("next_totalprice"))

    val ou = o.select($"o_custkey".as("user_id"), $"o_orderdate".as("t"),
      lit(1).as("side"), lit(null).cast("long").as("event_id"),
      $"next_orderkey", $"o_orderdate".as("next_orderdate"), $"next_totalprice")
    val eu = Tables.events(spark, dir).select($"user_id", $"ts".as("t"),
      lit(0).as("side"), $"event_id",
      lit(null).cast("long").as("next_orderkey"),
      lit(null).cast("timestamp").as("next_orderdate"),
      lit(null).cast("double").as("next_totalprice"))

    val w = Window.partitionBy($"user_id").orderBy($"t", $"side")
      .rowsBetween(0, Window.unboundedFollowing)
    ou.unionByName(eu)
      .withColumn("nk", first($"next_orderkey", ignoreNulls = true).over(w))
      .withColumn("nd", first($"next_orderdate", ignoreNulls = true).over(w))
      .withColumn("np", first($"next_totalprice", ignoreNulls = true).over(w))
      .filter($"side" === 0)
      .select($"event_id", $"t".as("ts"), $"user_id",
        $"nk".as("next_orderkey"), $"nd".as("next_orderdate"),
        round($"np", 2).as("next_totalprice"))
      .orderBy($"event_id")
  }

  /** NEAREST as-of join (pandas `direction='nearest'`): backward and
    * forward carries computed over ONE partition sort (two window
    * frames, same ordering), then per event the closer order wins;
    * exact-integer microsecond distances, ties to the backward side.
    */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("okey"))

    val ou = o.select($"o_custkey".as("user_id"), $"o_orderdate".as("t"),
      lit(0).as("side"), lit(null).cast("long").as("event_id"),
      $"okey", $"o_orderdate".as("odate"))
    val eu = Tables.events(spark, dir).select($"user_id", $"ts".as("t"),
      lit(1).as("side"), $"event_id",
      lit(null).cast("long").as("okey"),
      lit(null).cast("timestamp").as("odate"))

    val ord = Window.partitionBy($"user_id").orderBy($"t", $"side")
    val wb = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wf = ord.rowsBetween(0, Window.unboundedFollowing)
    ou.unionByName(eu)
      .withColumn("bk", last($"okey", ignoreNulls = true).over(wb))
      .withColumn("bd", last($"odate", ignoreNulls = true).over(wb))
      .withColumn("fk", first($"okey", ignoreNulls = true).over(wf))
      .withColumn("fd", first($"odate", ignoreNulls = true).over(wf))
      .filter($"side" === 1)
      .withColumn("db", unix_micros($"t") - unix_micros($"bd"))
      .withColumn("df", unix_micros($"fd") - unix_micros($"t"))
      .select($"event_id", $"t".as("ts"), $"user_id",
        when($"bd".isNull && $"fd".isNull, lit(null).cast("long"))
          .when($"bd".isNull, $"fk")
          .when($"fd".isNull, $"bk")
          .when($"db" <= $"df", $"bk").otherwise($"fk").as("nearest_orderkey"),
        when($"bd".isNull && $"fd".isNull, lit(null).cast("string"))
          .when($"bd".isNull, lit("f"))
          .when($"fd".isNull, lit("b"))
          .when($"db" <= $"df", lit("b")).otherwise(lit("f")).as("direction"),
        when($"bd".isNull && $"fd".isNull, lit(null).cast("long"))
          .when($"bd".isNull, $"df")
          .when($"fd".isNull, $"db")
          .otherwise(least($"db", $"df")).as("dist_us"))
      .orderBy($"event_id")
  }

  /** JSON payload extraction (the reference's `raw_payload JSONB`).
    *
    * `get_json_object` is a codegen'd Catalyst expression — no UDF.
    */
  def jsonExtractProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy(($"k" % 10).as("k_bucket"))
      .agg(count("*").as("n"), round(avg($"value"), 4).as("avg_value"))
      .orderBy($"k_bucket")
  }

  /** Per-group top-k rows via the bounded-heap aggregate
    * ([[graft.functions.BoundedTopK]]): the k highest-value events
    * per event_type, ties to the smaller event_id.
    *
    * The window formulation (`row_number` per event_type) shuffles
    * EVERY row and sorts whole partitions — with few groups that is
    * one task per group at any cluster size (the percentile_stats
    * lesson). The aggregate formulation reduces each map task to ≤ k
    * entries per group before the shuffle, so the shuffle carries
    * O(groups · k · tasks) bounded buffers and nothing is ever fully
    * sorted. Same shape the leaderboard's Redis ZSET analog needs at
    * 100 TB.
    *
    * Streaming-unified: [[topkPerGroup]] = this transform +
    * [[topkExplode]]'s rank-exploding projection (applied post-sink
    * for the streaming twin, where the memory table holds the
    * aggregated arrays). */
  def topkAggTransform(events: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events.groupBy(col("event_type"))
      .agg(call_function("graft_topk", col("value"), col("event_id"), lit(k)).as("top"))
  }

  def topkExplode(agged: DataFrame): DataFrame =
    agged.select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("event_id"), round(col("col.score"), 2).as("value"))
      .orderBy(col("event_type"), col("rank"))

  def topkPerGroup(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    topkExplode(topkAggTransform(Tables.events(spark, dir), k))

  /** DuckDB oracle for [[topkPerGroup]] — the window formulation the
    * aggregate replaces. */
  def topkPerGroupOracleSql(k: Int = 5): String =
    s"""SELECT event_type, CAST(rn AS BIGINT) AS rank, event_id, round(value, 2) AS value
       |FROM (SELECT event_type, event_id, value,
       |             row_number() OVER (PARTITION BY event_type
       |                                ORDER BY value DESC, event_id ASC) AS rn
       |      FROM events WHERE value IS NOT NULL) t
       |WHERE rn <= $k ORDER BY event_type, rank""".stripMargin

  /** Snapshot reconciliation (table diff): the compacted live state
    * as of the stream's midpoint vs the final state, classified per
    * key into added / removed / changed (unchanged keys suppressed).
    * The data-engineering answer to "what did the last half of the
    * changelog do to my table" — migration validation, backfill
    * audits, CDC drift checks.
    *
    * Both snapshots are [[cdcWithDeletes]] semantics (tombstones
    * kill a key), so `removed` is reachable: an upsert before the
    * cut whose key's final row is a delete. Scale shape: the two
    * compactions and the diff all key on user_id — one shuffle
    * partitioning serves all three; the midpoint is a one-row
    * aggregate broadcast back (a deployment passes the snapshot
    * boundary as a literal).
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", opExpr($"event_type").as("op"))
    val cutoff = ev.agg(min($"ts").as("lo"), max($"ts").as("hi"))
      .select(expr("timestamp_micros((unix_micros(lo) + unix_micros(hi)) div 2)").as("cut"))
    val tagged = ev.crossJoin(broadcast(cutoff))
    def live(df: DataFrame): DataFrame = {
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      df.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1 && $"op" === "upsert")
        .select($"user_id", $"event_id")
    }
    val a = live(tagged.filter($"ts" < $"cut")).withColumnRenamed("event_id", "a_id")
    val b = live(tagged).withColumnRenamed("event_id", "b_id")
    a.join(b, Seq("user_id"), "full_outer")
      .withColumn("status",
        when($"a_id".isNull, "added")
          .when($"b_id".isNull, "removed")
          .when($"a_id" =!= $"b_id", "changed")
          .otherwise("unchanged"))
      .filter($"status" =!= "unchanged")
      .select($"user_id", $"status")
      .orderBy($"user_id")
  }

  /** DuckDB oracle for [[snapshotDiff]]. */
  val snapshotDiffOracleSql: String =
    """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |                   CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
      |            FROM events),
      |c AS (SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2) AS cut FROM ev),
      |a AS (SELECT user_id, event_id AS a_id FROM
      |        (SELECT ev.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |         FROM ev, c WHERE ts < cut) WHERE rn = 1 AND op = 'upsert'),
      |b AS (SELECT user_id, event_id AS b_id FROM
      |        (SELECT ev.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |         FROM ev) WHERE rn = 1 AND op = 'upsert')
      |SELECT coalesce(a.user_id, b.user_id) AS user_id,
      |       CASE WHEN a.user_id IS NULL THEN 'added'
      |            WHEN b.user_id IS NULL THEN 'removed'
      |            WHEN a_id != b_id THEN 'changed' END AS status
      |FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
      |WHERE NOT (a.user_id IS NOT NULL AND b.user_id IS NOT NULL AND a_id = b_id)
      |ORDER BY 1""".stripMargin

  /** Per-event session assignment (the feature-engineering face of
    * [[sessionWindowAgg]]): every event gets its session's ordinal —
    * gaps-and-islands with a 30-minute inactivity gap, as a column on
    * the fact rather than an aggregate. One shuffle on user_id; both
    * window passes (the lag flag and the running island count) share
    * the same partitioning and sort.
    */
  def eventsSessionized(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts")
      .withColumn("new_session",
        when(unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))
               > gapMinutes * 60L * 1000000L, 1L)
          .when(lag($"ts", 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum($"new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"event_id", $"user_id", $"session_seq")
      .orderBy($"event_id")
  }

  /** DuckDB oracle for [[eventsSessionized]]. */
  def eventsSessionizedOracleSql(gapMinutes: Int = 30): String =
    s"""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |f AS (SELECT event_id, user_id, ts,
       |             CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > $gapMinutes * 60 * 1000000 THEN 1
       |                  ELSE 0 END AS new_session
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT event_id, user_id,
       |       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |FROM f ORDER BY event_id""".stripMargin

  /** Cohort lifetime-value curves — [[retentionCohorts]]'s revenue
    * twin: users grouped by first-seen day, each cohort's CUMULATIVE
    * engagement value tracked by age-in-days. Exact integer cents;
    * the fact collapses to a (cohort, age) aggregate (≤ days² rows,
    * map-side combined) before the running total runs over that
    * planning-scale triangle.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", date_trunc("day", $"ts").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val cohorts = ev.groupBy($"user_id").agg(min($"day").as("cohort"))
    val byAge = ev.join(cohorts, "user_id")
      .groupBy($"cohort", datediff($"day", $"cohort").cast("long").as("age_days"))
      .agg(count_distinct($"user_id").as("n_active"), sum($"cents").as("cents"))
    byAge
      .withColumn("cents_cum",
        sum($"cents").over(Window.partitionBy($"cohort").orderBy($"age_days")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"cohort", $"age_days", $"n_active", $"cents", $"cents_cum")
      .orderBy($"cohort", $"age_days")
  }

  /** DuckDB oracle for [[cohortLtv]]. */
  val cohortLtvOracleSql: String =
    """WITH ev AS (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |c AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1),
      |a AS (SELECT cohort, CAST(date_diff('day', cohort, day) AS BIGINT) AS age_days,
      |             count(DISTINCT ev.user_id) AS n_active,
      |             CAST(sum(cents) AS BIGINT) AS cents
      |      FROM ev JOIN c ON ev.user_id = c.user_id GROUP BY 1, 2)
      |SELECT cohort, age_days, n_active, cents,
      |       CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age_days
      |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cents_cum
      |FROM a ORDER BY 1, 2""".stripMargin

  /** Daily trending items: top-`k` items per day by event count,
    * selected with the bounded-heap `graft_topk` aggregate over the
    * per-(day, item) counts — the custom aggregate exercised on a
    * second grouping shape (time-bucketed trend boards). Counts pass
    * through the aggregate's double score losslessly (< 2⁵³).
    */
  def trendingDaily(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val counts = Tables.events(spark, dir)
      .select(date_trunc("day", $"ts").as("day"),
        get_json_object($"props", "$.k").cast("long").as("item"))
      .groupBy($"day", $"item").agg(count(lit(1)).as("n"))
    counts.groupBy($"day")
      .agg(call_function("graft_topk", $"n".cast("double"), $"item", lit(k)).as("top"))
      .select($"day", posexplode($"top"))
      .select($"day", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("item"), $"col.score".cast("long").as("n"))
      .orderBy($"day", $"rank")
  }

  /** DuckDB oracle for [[trendingDaily]]. */
  def trendingDailyOracleSql(k: Int = 5): String =
    s"""WITH c AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       |                  TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
       |                  count(*) AS n
       |           FROM events GROUP BY 1, 2)
       |SELECT day, CAST(rn AS BIGINT) AS rank, item, n
       |FROM (SELECT *, row_number() OVER (PARTITION BY day ORDER BY n DESC, item ASC) AS rn FROM c)
       |WHERE rn <= $k ORDER BY day, rank""".stripMargin
}
