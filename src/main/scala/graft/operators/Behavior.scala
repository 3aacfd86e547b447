package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Behavioral-analytics surface downstream of the reference's
  * engagement stream: attribution, transition graphs, time-decayed
  * scoring, ML feature preparation, and statistical anomaly
  * flagging. The reference feeds its ClickHouse sink exactly so an
  * analyst can run this family over the event log
  * (`src/process.py:43-76` routes the enriched stream to the
  * analytics store); here each is a first-class distributed operator.
  *
  * Common scale shape: everything keyed by `user_id` shuffles ONCE on
  * that key and then stays inside the partition (window functions
  * over `(user_id, ts)` need co-partitioning + intra-partition sort,
  * not a global sort). Aggregated outputs are bounded by
  * |event_type|² or top-N, so the final collect is trivially small.
  *
  * Each operator is a pure `DataFrame => DataFrame` transform over an
  * events-shaped input (same pattern as [[Engagement.enrichTransform]])
  * so specs can plant adversarial scenarios and the streaming layer
  * can reuse the expression trees; the `(spark, dir)` wrappers bind
  * the test corpus.
  */
object Behavior {

  /** Last-touch attribution: each conversion (`purchase`) is credited
    * to the user's most recent preceding touch (`view`/`click`)
    * within the lookback window; conversions with no touch in the
    * window fall into the `none` bucket.
    *
    * Spark-first shape: a per-user carry-forward window over
    * `max(struct(ts, event_id, event_type))` with a
    * `[unbounded, 1 preceding]` frame — the struct max carries the
    * latest touch's type alongside its timestamp in ONE window pass,
    * so there is no touches×conversions self-join (the naive
    * formulation that blows up quadratically on power users). One
    * shuffle on user_id; the attribution aggregate is map-side
    * combinable and ≤ |touch types|+1 rows.
    */
  def attributionTransform(events: DataFrame, lookback: String = "INTERVAL 7 DAYS"): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("view", "click"),
      struct(col("ts"), col("event_id"), col("event_type")))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("last_touch", max(touch).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("touch_type",
        when(col("last_touch").isNotNull &&
             col("last_touch.ts") >= col("ts") - expr(lookback),
          col("last_touch.event_type")).otherwise(lit("none")))
      .groupBy(col("touch_type"))
      .agg(count("*").as("n_conversions"),
           round(sum(col("value")), 2).as("attributed_value"))
      .orderBy(col("touch_type"))
  }

  def attributionLastTouch(spark: SparkSession, dir: String): DataFrame =
    attributionTransform(Tables.events(spark, dir))

  /** Event-type transition counts (first-order Markov graph): for
    * each user's time-ordered stream, count `prev → curr` event-type
    * pairs and the per-source transition probability. The behavioral
    * fingerprint behind "what do users do after an error?" dashboards.
    *
    * One shuffle on user_id for the lag window; the pair aggregate is
    * map-side combinable down to |types|² rows, and the probability
    * normalization is a window over that tiny aggregate (not the raw
    * stream).
    */
  def transitionsTransform(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("curr_type"))
      .agg(count("*").as("n"))
    transitionReport(pairs)
  }

  /** Probability normalization + ordering over a `(prev_type,
    * curr_type, n)` count table — split out so the streaming twin
    * ([[graft.streaming.TransitionState]]) derives its report through
    * the identical expression tree (stream/batch parity by shared
    * code, the modeFromDailyCounts pattern). */
  private[graft] def transitionReport(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("p", round(col("n") / sum(col("n")).over(Window.partitionBy(col("prev_type"))), 4))
      .orderBy(col("prev_type"), col("curr_type"))

  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    transitionsTransform(Tables.events(spark, dir))

  /** Time-decayed leaderboard: per-user engagement score where each
    * event contributes `value · 2^(−age/half-life)` (half-life
    * `halfLifeSec`, aged against the corpus max timestamp). The
    * exponential-decay upgrade of the reference's cumulative Redis
    * ZINCRBY leaderboard (`process.py:88-104`) — recent engagement
    * dominates, stale engagement fades, and the score is a plain SUM
    * so it stays map-side combinable (decay applied per event BEFORE
    * the aggregate; no per-user event lists, no state).
    *
    * The reference timestamp is a one-row aggregate broadcast back
    * via cross join — at 100 TB the anchor is typically the batch
    * boundary and arrives as a literal instead.
    */
  def decayedTransform(events: DataFrame, topN: Int, halfLifeSec: Double): DataFrame = {
    val ev = events.select(col("user_id"), col("ts"), col("value"))
    val tRef = ev.agg(max(col("ts")).as("t_ref"))
    val ageSec = (unix_micros(col("t_ref")) - unix_micros(col("ts"))).cast("double") / 1e6
    ev.crossJoin(broadcast(tRef))
      .withColumn("decayed", col("value") * exp(lit(-math.log(2.0) / halfLifeSec) * ageSec))
      .groupBy(col("user_id"))
      .agg(round(sum(col("decayed")), 4).as("score"))
      .orderBy(col("score").desc, col("user_id"))
      .limit(topN)
  }

  def decayedLeaderboard(spark: SparkSession, dir: String, topN: Int = 20): DataFrame =
    decayedTransform(Tables.events(spark, dir), topN, halfLifeSec = 86400.0)

  /** Per-user lag/rolling feature preparation — the standard
    * training-data shape for sequence models over event streams:
    * previous values, inter-event gap, and a trailing-3 rolling mean,
    * all strictly from PAST events (frame ends at `1 preceding`) so
    * the features are leakage-free for next-event prediction.
    *
    * One shuffle on user_id; every feature comes out of the same
    * window pass (Spark collapses same-spec window functions into one
    * physical Window operator — the rolling frame shares the sort).
    */
  def lagFeaturesTransform(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRoll = w.rowsBetween(-3, -1)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("value_lag1", lag(col("value"), 1).over(w))
      .withColumn("value_lag2", lag(col("value"), 2).over(w))
      .withColumn("gap_seconds",
        round((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).cast("double") / 1e6, 3))
      .withColumn("rolling_avg3", round(avg(col("value")).over(wRoll), 4))
      .select(col("event_id"), col("user_id"), col("value"),
        col("value_lag1"), col("value_lag2"), col("gap_seconds"), col("rolling_avg3"))
      .orderBy(col("event_id"))
  }

  def lagFeatures(spark: SparkSession, dir: String): DataFrame =
    lagFeaturesTransform(Tables.events(spark, dir))

  /** Statistical anomaly flagging: per event type, how many events
    * sit more than `nSigma` sample standard deviations from that
    * type's mean. The classic two-pass z-score screen over a metrics
    * stream.
    *
    * Pass 1 is a tiny aggregate (|types| rows of Welford moments,
    * map-side combined); it broadcasts back onto the fact table so
    * the classification pass re-scans WITHOUT shuffling the events —
    * at 100 TB the stats table is bytes and the fact never moves.
    */
  def anomalyTransform(events: DataFrame, nSigma: Double): DataFrame = {
    val ev = events.select(col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mean"), stddev_samp(col("value")).as("sd"))
    ev.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count("*").as("n"),
        sum(when(abs(col("value") - col("mean")) > lit(nSigma) * col("sd"), 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_share", round(col("n_outliers") / col("n"), 4))
      .orderBy(col("event_type"))
  }

  def anomalyZscore(spark: SparkSession, dir: String, nSigma: Double = 2.5): DataFrame =
    anomalyTransform(Tables.events(spark, dir), nSigma)

  /** Robust outlier screen — [[anomalyZscore]]'s median/MAD twin: a
    * z-score's mean and stddev are themselves dragged by the
    * outliers being hunted (one 10⁶× corrupt reading inflates σ
    * until nothing else flags); the median and the median absolute
    * deviation have a 50% breakdown point, so this is the screen a
    * data-quality pipeline actually deploys against corrupt feeds.
    *
    * Both medians are DISCRETE rank selections over exact integer
    * cents (k = ⌈n/2⌉, the [[Olap.rollingP95Value]] integer-k
    * pattern), so both engines pick the identical element; a row
    * flags when |x − med| · 10 > k10 · mad — the k = 2.5 threshold
    * cross-multiplied into pure integer arithmetic (mad is cents, so
    * no float enters the comparison at all).
    *
    * Scale shape: two windowed rank selections per type (the second
    * over |x − med|, derived map-side after a broadcast join of the
    * |types|-row median table) and one counting aggregate; the fact
    * shuffles on event_type — at 100 TB the same plan runs per
    * (type, day) partition, or swaps the exact medians for the GK
    * sketch when ±ε is acceptable.
    */
  def anomalyMad(spark: SparkSession, dir: String, k10: Long = 25L): DataFrame =
    anomalyMadTransform(Tables.events(spark, dir), k10)

  def anomalyMadTransform(events: DataFrame, k10: Long = 25L): DataFrame = {
    val ev = events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    val byType = Window.partitionBy(col("event_type"))
    def medianOf(df: DataFrame, valueCol: String): DataFrame = df
      .withColumn("rn", row_number().over(byType.orderBy(col(valueCol))))
      .withColumn("n", count(lit(1)).over(byType))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col(valueCol).as("med_" + valueCol), col("n"))
    val med = medianOf(ev, "c")
    val dev = ev.join(broadcast(med.select(col("event_type"), col("med_c"))), Seq("event_type"))
      .withColumn("d", abs(col("c") - col("med_c")))
    val mad = medianOf(dev.select(col("event_type"), col("d")), "d")
      .select(col("event_type"), col("med_d"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("med_c")).as("med_c"), max(col("med_d")).as("mad_c"),
        sum(when(col("d") * 10L > lit(k10) * col("med_d"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        round(col("med_c") / 100.0, 2).as("median"),
        round(col("mad_c") / 100.0, 2).as("mad"),
        col("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Item co-engagement counts ("users who engaged with X also
    * engaged with Y"): distinct (user, item) pairs self-joined within
    * each user, emitting `(item_a < item_b)` pair counts with support
    * ≥ `minSupport` — the co-occurrence matrix behind
    * item-similarity recommenders. Items are the `props.k` payload
    * field (the reference's `raw_payload` JSONB analog).
    *
    * The quadratic guard is the point at scale: a user with n items
    * contributes n² pairs, so power users (bots, crawlers) with more
    * than `maxItems` distinct items are EXCLUDED — the standard
    * practice (cap or sample) that bounds the blow-up at
    * maxItems²·|users|. The per-user item count joins back on the
    * same user_id partitioning the items already have (co-located,
    * no extra wide shuffle), and the pair aggregate is map-side
    * combinable down to ≤ |items|² rows. (This single-query
    * formulation scans the fact for each self-join side; a pipeline
    * materializes the distinct (user, item) projection once upstream
    * and both sides read it back co-partitioned.)
    */
  def coEngagementTransform(events: DataFrame, maxItems: Int, minSupport: Long): DataFrame =
    coEngagementFromItems(events
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .distinct(), maxItems, minSupport)

  /** The pair rollup from an already-distinct (user_id, item) table —
    * split out so the streaming graph faces read it over their
    * idempotent presence state (set union merges exactly; the
    * per-user cap and the pair counts are pure reads). */
  private[graft] def coEngagementFromItems(items: DataFrame, maxItems: Int,
                                           minSupport: Long): DataFrame = {
    val kept = items.join(
      items.groupBy(col("user_id")).agg(count(lit(1)).as("n_items"))
        .filter(col("n_items") <= maxItems),
      Seq("user_id"))
    val a = kept.select(col("user_id"), col("item").as("item_a"))
    val b = kept.select(col("user_id"), col("item").as("item_b"))
    a.join(b, Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minSupport)
      .orderBy(col("item_a"), col("item_b"))
  }

  def coEngagement(spark: SparkSession, dir: String): DataFrame =
    coEngagementTransform(Tables.events(spark, dir), maxItems = 50, minSupport = 3L)

  /** DAU / WAU / MAU with stickiness — the canonical engagement
    * health metrics: per day, distinct users active that day, in the
    * trailing 7 days, and in the trailing 30 days, plus
    * DAU/MAU·10⁴. One bounded 30× fan-out of the distinct
    * (day, user) pairs serves all three windows (the offset `i`
    * rides along and three filtered distinct-counts share one
    * aggregate), so the fact is reduced and shuffled once — the same
    * non-decomposable-sliding-metric shape as
    * [[Olap.rollingDistinctUsers]], generalized to nested windows.
    */
  def dauWauMau(spark: SparkSession, dir: String): DataFrame =
    dauWauMauFromDays(Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct())

  /** The trailing-window derivation over a distinct `(day, user_id)`
    * table — shared with the streaming twin (same sharing rationale
    * as [[lifecycleFromDays]]). */
  private[graft] def dauWauMauFromDays(d0: DataFrame): DataFrame = {
    val spark = d0.sparkSession
    import spark.implicits._
    val d = d0
    val bounds = d.agg(min($"day").as("lo"), max($"day").as("hi"))
    d.crossJoin(broadcast(bounds))
      .select(explode(expr(
        "transform(sequence(0, 29), i -> struct(timestampadd(DAY, i, day) AS tday, i AS i))")).as("x"),
        $"user_id", $"lo", $"hi")
      .select($"x.tday".as("day"), $"x.i".as("i"), $"user_id", $"lo", $"hi")
      .filter($"day" >= $"lo" && $"day" <= $"hi")
      .groupBy($"day")
      .agg(
        count_distinct(when($"i" < 1, $"user_id")).as("dau"),
        count_distinct(when($"i" < 7, $"user_id")).as("wau"),
        count_distinct(when($"i" < 30, $"user_id")).as("mau"))
      .withColumn("stickiness_10000", expr("(dau * 10000) div mau"))
      .orderBy($"day")
  }

  /** DuckDB oracle for [[dauWauMau]]. */
  val dauWauMauOracleSql: String =
    """WITH d AS (SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id FROM events),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
      |x AS (SELECT day + i * INTERVAL 1 DAY AS day, i, user_id
      |      FROM d CROSS JOIN (SELECT unnest(range(0, 30)) AS i)),
      |f AS (SELECT x.day, i, user_id FROM x, b WHERE x.day >= lo AND x.day <= hi)
      |SELECT day,
      |       count(DISTINCT user_id) FILTER (i < 1) AS dau,
      |       count(DISTINCT user_id) FILTER (i < 7) AS wau,
      |       count(DISTINCT user_id) FILTER (i < 30) AS mau,
      |       CAST((count(DISTINCT user_id) FILTER (i < 1) * 10000)
      |            // count(DISTINCT user_id) FILTER (i < 30) AS BIGINT) AS stickiness_10000
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** Session-quality KPI rollup: sessions (30-min gap), bounce share
    * (single-event sessions), events-per-session, and mean ACTIVE
    * duration (last−first event, not the gap-padded window end) — the
    * product-health one-liner on top of the sessionization the
    * reference's windows power. Exact integers: counts, scaled
    * ratios, µs durations with truncating division.
    */
  def sessionKpis(spark: SparkSession, dir: String, gap: String = "30 minutes"): DataFrame = {
    import spark.implicits._
    val sessions = Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", gap))
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("t0"), max($"ts").as("t1"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .select($"n_events",
        (unix_micros($"t1") - unix_micros($"t0")).as("dur_us"), $"cents")
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      sum(when($"n_events" === 1, 1L).otherwise(0L)).as("n_bounce"),
      expr("(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000) div count(1)").as("bounce_10000"),
      expr("(sum(n_events) * 100) div count(1)").as("events_per_session_100"),
      expr("sum(dur_us) div count(1) div 1000000").as("avg_active_s"),
      sum($"cents").as("total_cents"))
  }

  /** DuckDB oracle for [[sessionKpis]] — the gaps-and-islands
    * formulation of the same sessions. */
  val sessionKpisOracleSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id FROM events),
      |x AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |                          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
      |      FROM x),
      |s AS (SELECT count(*) AS n_events,
      |             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
      |             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |      FROM y GROUP BY user_id, sess)
      |SELECT count(*) AS n_sessions,
      |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
      |       CAST((sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) AS bounce_10000,
      |       CAST((sum(n_events) * 100) // count(*) AS BIGINT) AS events_per_session_100,
      |       CAST(sum(dur_us) // count(*) // 1000000 AS BIGINT) AS avg_active_s,
      |       CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM s""".stripMargin

  /** Day-of-week × hour activity heatmap — the standard engagement
    * dashboard grid. One map-side-combinable count aggregate (≤ 168
    * cells), shares as exact scaled integers against a one-row total.
    */
  def activityHeatmap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(dayofweek($"ts").cast("long").as("dow"), hour($"ts").cast("long").as("hod"))
    val cells = ev.groupBy($"dow", $"hod").agg(count(lit(1)).as("n"))
    cells.crossJoin(broadcast(cells.agg(sum($"n").as("total"))))
      .select($"dow", $"hod", $"n", expr("(n * 10000) div total").as("share_10000"))
      .orderBy($"dow", $"hod")
  }

  /** DuckDB oracle for [[activityHeatmap]] — DuckDB's dayofweek is
    * 0-based Sunday, Spark's is 1-based Sunday, hence the +1. */
  val activityHeatmapOracleSql: String =
    """WITH ev AS (SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
      |                   CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod
      |            FROM events),
      |c AS (SELECT CAST(dow AS BIGINT) AS dow, hod, count(*) AS n FROM ev GROUP BY 1, 2),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
      |SELECT dow, hod, n, CAST((n * 10000) // total AS BIGINT) AS share_10000
      |FROM c, t ORDER BY 1, 2""".stripMargin

  /** Time-to-convert statistics: per converting user, the lag from
    * first view to first subsequent purchase, aggregated to count /
    * mean / min / max seconds — all exact integers (µs differences,
    * truncating div). The funnel family's latency report: the same
    * conditional-min shape as [[Engagement.funnelConversion]], no
    * per-user event lists.
    */
  def conversionLagTransform(events: DataFrame): DataFrame = {
    val firsts = events
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .filter(col("first_view").isNotNull && col("first_purchase") > col("first_view"))
      .select(((unix_micros(col("first_purchase")) - unix_micros(col("first_view")))
        .cast("long")).as("lag_us"))
    firsts.agg(
      count(lit(1)).as("n_conversions"),
      expr("sum(lag_us) div count(1) div 1000000").as("avg_lag_s"),
      expr("min(lag_us) div 1000000").as("min_lag_s"),
      expr("max(lag_us) div 1000000").as("max_lag_s"))
  }

  def conversionLagStats(spark: SparkSession, dir: String): DataFrame =
    conversionLagTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[conversionLagStats]]. */
  val conversionLagOracleSql: String =
    """WITH f AS (SELECT user_id,
      |                  min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS fv,
      |                  min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS fp
      |           FROM events GROUP BY 1),
      |l AS (SELECT epoch_us(fp) - epoch_us(fv) AS lag_us FROM f
      |      WHERE fv IS NOT NULL AND fp > fv)
      |SELECT count(*) AS n_conversions,
      |       CAST(sum(lag_us) // count(*) // 1000000 AS BIGINT) AS avg_lag_s,
      |       CAST(min(lag_us) // 1000000 AS BIGINT) AS min_lag_s,
      |       CAST(max(lag_us) // 1000000 AS BIGINT) AS max_lag_s
      |FROM l""".stripMargin

  /** Frequent sequential patterns (PrefixSpan/SPAM class, bounded):
    * the most common temporally-ordered event-type subsequences of
    * length ≤ 3, counted by DISTINCT supporting users. Each user's
    * timeline first collapses to the sequence of FIRST occurrences
    * per type (≤ |alphabet| rows — the bound that makes this tractable
    * without candidate generation), then ordered 1/2/3-subsequences
    * come from self-joins on first-occurrence position, and support
    * is a distinct-user count per pattern.
    *
    * Scale shape: everything after the first-occurrence aggregate
    * operates on ≤ |alphabet| rows per user (alphabet = event types,
    * single digits), so the subsequence fan-out is ≤ 41 rows per user
    * — linear in users, never in events. One shuffle on user_id, one
    * on the pattern string; both map-side combinable.
    */
  def frequentSequencesTransform(events: DataFrame, topN: Int): DataFrame = {
    val firsts = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts"), col("event_id"))).as("first_at"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("first_at"))))
      .select(col("user_id"), col("event_type").as("t"), col("pos"))
    val s1 = firsts.select(col("user_id"), col("t").as("pattern"))
    val s2 = firsts.as("a").join(firsts.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.pos") < col("b.pos"))
      .select(col("a.user_id").as("user_id"),
        concat_ws(">", col("a.t"), col("b.t")).as("pattern"))
    val s3 = firsts.as("a").join(firsts.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.pos") < col("b.pos"))
      .join(firsts.as("c"),
        col("a.user_id") === col("c.user_id") && col("b.pos") < col("c.pos"))
      .select(col("a.user_id").as("user_id"),
        concat_ws(">", col("a.t"), col("b.t"), col("c.t")).as("pattern"))
    s1.unionByName(s2).unionByName(s3)
      .groupBy(col("pattern")).agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("pattern"))
      .limit(topN)
  }

  def frequentSequences(spark: SparkSession, dir: String): DataFrame =
    frequentSequencesTransform(Tables.events(spark, dir), topN = 30)

  /** Association rules over the co-engagement pairs (Apriori's
    * output stage): for each qualifying item pair, support,
    * directional confidence, and lift — the classic
    * "viewers of X also engage Y" recommender table. All three
    * metrics are reported as exact scaled integers (÷10000), so the
    * ranking is bit-reproducible: conf = n_ab·10⁴ div n_a,
    * lift = n_ab·N·10⁴ div (n_a·n_b).
    *
    * Scale shape: pair counts come from [[coEngagementTransform]]
    * (heavy-user-capped); per-item counts are a tiny aggregate
    * broadcast back; both rule directions emit from one pair row.
    */
  def associationRulesTransform(events: DataFrame, maxItems: Int,
                                minSupport: Long): DataFrame = {
    val items = events
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .distinct()
    val kept = items.join(
      items.groupBy(col("user_id")).agg(count(lit(1)).as("n_items"))
        .filter(col("n_items") <= maxItems),
      Seq("user_id"))
    val nUsers = kept.agg(count_distinct(col("user_id")).as("n_users"))
    val itemCounts = kept.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = kept.select(col("user_id"), col("item").as("item_a"))
      .join(kept.select(col("user_id"), col("item").as("item_b")), Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val withCounts = pairs
      .join(broadcast(itemCounts.withColumnsRenamed(Map("item" -> "item_a", "n_item" -> "n_a"))), "item_a")
      .join(broadcast(itemCounts.withColumnsRenamed(Map("item" -> "item_b", "n_item" -> "n_b"))), "item_b")
      .crossJoin(broadcast(nUsers))
    val fwd = withCounts.select(col("item_a").as("antecedent"), col("item_b").as("consequent"),
      col("n_ab"), expr("(n_ab * 10000) div n_a").as("conf_10000"),
      expr("(n_ab * n_users * 10000) div (n_a * n_b)").as("lift_10000"))
    val bwd = withCounts.select(col("item_b").as("antecedent"), col("item_a").as("consequent"),
      col("n_ab"), expr("(n_ab * 10000) div n_b").as("conf_10000"),
      expr("(n_ab * n_users * 10000) div (n_a * n_b)").as("lift_10000"))
    fwd.unionByName(bwd)
      .orderBy(col("conf_10000").desc, col("antecedent"), col("consequent"))
      .limit(50)
  }

  def associationRules(spark: SparkSession, dir: String): DataFrame =
    associationRulesTransform(Tables.events(spark, dir), maxItems = 50, minSupport = 3L)

  /** Diversified top-k leaderboard: the k highest-value events per
    * type with AT MOST `perUser` entries from any one user — the
    * anti-monoculture constraint every production leaderboard ends up
    * needing (one whale must not fill the board).
    *
    * Two stages, both bounded: stage 1 ranks within (type, user) —
    * high-cardinality balanced window partitions — and keeps ≤
    * perUser rows each; stage 2 reuses the bounded-heap
    * `graft_topk` aggregate ([[Engagement.topkAggTransform]]) over
    * the capped survivors, so the per-type selection shuffles ≤
    * k-entry buffers instead of window-sorting whole type partitions
    * (|types| is small — a global window here would be one task per
    * type). The winning ids then pull their user back via a
    * broadcast semi-join against the fact (tiny side broadcast, fact
    * never shuffles).
    */
  /** First-touch attribution — the acquisition-channel twin of
    * [[attributionTransform]]: each conversion is credited to the
    * EARLIEST touch inside the lookback window. Where last-touch can
    * carry one struct-max forward forever, first-touch needs the
    * window's left edge to move with time, so the frame is a RANGE
    * frame over `unix_micros(ts)` spanning `[ts − lookback, ts)` —
    * still one window pass per user partition, still no
    * touches×conversions self-join. `min(struct(ts, event_id, type))`
    * picks the earliest touch (ties by event_id), null → `none`.
    */
  def firstTouchTransform(events: DataFrame, lookbackSec: Long = 7L * 86400): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-lookbackSec * 1000000L, -1L)
    val touch = when(col("event_type").isin("view", "click"),
      struct(col("ts"), col("event_id"), col("event_type")))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("first_touch", min(touch).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("touch_type", coalesce(col("first_touch.event_type"), lit("none")))
      .groupBy(col("touch_type"))
      .agg(count("*").as("n_conversions"),
           round(sum(col("value")), 2).as("attributed_value"))
      .orderBy(col("touch_type"))
  }

  def attributionFirstTouch(spark: SparkSession, dir: String): DataFrame =
    firstTouchTransform(Tables.events(spark, dir))

  /** Top user journeys: the `depth`-prefix of each user's
    * time-ordered event-type sequence, rendered `a>b>c`, counted and
    * ranked — the "what are the most common first sessions" product
    * question (path/Sankey analytics).
    *
    * One shuffle on user_id for the prefix window, which also CAPS
    * the per-user payload at `depth` rows before anything aggregates;
    * the in-group ordering is made deterministic by sorting
    * `(rn, type)` structs inside the aggregate (collect_list order is
    * not a contract under retries/merges — never rely on it). The
    * path-count aggregate is map-side combinable and the final top-N
    * is a bounded TakeOrdered, so nothing global ever sorts.
    */
  def topPathsTransform(events: DataFrame, depth: Int, topN: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= depth)
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topN)
  }

  def topPaths(spark: SparkSession, dir: String): DataFrame =
    topPathsTransform(Tables.events(spark, dir), depth = 5, topN = 20)

  /** Key-skew diagnostics over a prospective shuffle key — the
    * measurement that DECIDES the salting/AQE-skew strategy every
    * other operator here documents: per-key counts, each heavy
    * hitter's share, the cumulative share of the top-N, and a skew
    * ratio normalized so 1.0 = perfectly uniform (`n · |keys| /
    * total`). Run it on a candidate join/groupBy key before sizing a
    * 100 TB job; a top-1 ratio of 50 means the biggest key's
    * partition does 50× the uniform work.
    *
    * Shape: one map-side-combinable count aggregate, a one-row totals
    * aggregate broadcast back, bounded top-N; the cumulative window
    * runs over ≤ topN rows (constant partition key — planning-scale
    * by construction).
    */
  def keySkewTransform(events: DataFrame, topN: Int): DataFrame = {
    val counts = events
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("n").desc, col("item")).limit(topN)
    val w = Window.partitionBy(lit(0)).orderBy(col("n").desc, col("item"))
      .rowsBetween(Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(tot))
      .withColumn("share", round(col("n") / col("total"), 4))
      .withColumn("cum_share", round(sum(col("n")).over(w) / col("total"), 4))
      .withColumn("skew_ratio", round(col("n") * col("n_keys") / col("total"), 4))
      .select(col("item"), col("n"), col("share"), col("cum_share"), col("skew_ratio"))
      .orderBy(col("n").desc, col("item"))
  }

  def keySkewStats(spark: SparkSession, dir: String): DataFrame =
    keySkewTransform(Tables.events(spark, dir), topN = 10)

  /** RFM (recency / frequency / monetary) quartile segmentation —
    * the classic customer-base cut an analyst runs first on the
    * reference's ClickHouse sink: per user, days since last activity
    * (vs the corpus max day), event count, and exact spend cents;
    * each metric quartiled 1..4 (1 = best) and the base reported as
    * (r,f,m) segment counts with total spend and events.
    *
    * Quartiles are RANK-based with a total order (metric, then
    * user_id), so the assignment `q = ((rn−1)·4) div n + 1` is
    * deterministic and engine-identical — no float thresholds, no
    * ntile tie ambiguity. The three ranks are DISTRIBUTED
    * ([[GlobalRank.withGlobalOrder]]'s range-partitioned slice rank,
    * round-9 verdict task 1): the per-user table is |users| rows —
    * data scale, ~10⁹ at 100 TB — so each metric's global order runs
    * as P parallel slice sorts with in-plan offsets, never one task.
    *
    * Scale shape: fact shuffles ONCE on user_id into the three-metric
    * aggregate (map-side combinable: max/count/sum); everything after
    * is user-scale (3 range exchanges, one per metric order — the
    * price of three independent total orders); output is ≤ 64
    * segment rows.
    */
  def rfmSegmentsTransform(events: DataFrame): DataFrame =
    rfmFromUsers(rfmPerUser(events))

  /** Per-user (last_ts, freq, cents) table — the shared extraction
    * (batch operator + the streaming twin's per-batch partial). */
  def rfmPerUser(events: DataFrame): DataFrame = events
    .select(col("user_id"), col("ts"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    .groupBy(col("user_id"))
    .agg(max(col("ts")).as("last_ts"),
      count(lit(1)).as("freq"),
      sum(col("cents")).as("cents"))

  /** Report face over the per-user (last_ts, freq, cents) table —
    * shared by the batch operator and `stream_rfm_segments`'
    * additive state (max of maxes / sum of counts / sum of sums), so
    * stream ≡ batch by code. */
  def rfmFromUsers(perUser: DataFrame): DataFrame = {
    def quartile(order: Column, name: String)(df: DataFrame): DataFrame =
      GlobalRank.withGlobalOrder(df, Seq(order, col("user_id")))
        .withColumn(name, expr("CAST((grk - 1) * 4 div n_total + 1 AS INT)"))
        .drop("grk", "n_total")
    val scored = quartile(col("last_ts").desc, "r_q")(
      quartile(col("freq").desc, "f_q")(
        quartile(col("cents").desc, "m_q")(perUser)))
    scored.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("freq")).as("n_events"),
        round(sum(col("cents")) / 100.0, 2).as("monetary"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  def rfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmSegmentsTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[rfmSegmentsTransform]] — same rank-quartile
    * arithmetic (`(rn−1)·4 // n + 1`) over the same total orders.
    */
  val rfmSegmentsOracleSql: String =
    """WITH u AS (
      |  SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS last_ts, count(*) AS freq,
      |         sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1),
      |q AS (
      |  SELECT user_id, freq, cents,
      |    (row_number() OVER (ORDER BY last_ts DESC, user_id) - 1) * 4 // count(*) OVER () + 1 AS r_q,
      |    (row_number() OVER (ORDER BY freq DESC, user_id) - 1) * 4 // count(*) OVER () + 1 AS f_q,
      |    (row_number() OVER (ORDER BY cents DESC, user_id) - 1) * 4 // count(*) OVER () + 1 AS m_q
      |  FROM u)
      |SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q, CAST(m_q AS INT) AS m_q,
      |       count(*) AS n_users, CAST(sum(freq) AS BIGINT) AS n_events,
      |       round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS monetary
      |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Item-item Jaccard similarity over co-engagement user sets —
    * |U_a ∩ U_b| / |U_a ∪ U_b| for every co-engaged item pair with
    * support ≥ `minSupport` — the similarity matrix behind
    * "users who engaged with X also…" recommenders, one level up
    * from [[coEngagementTransform]]'s raw counts.
    *
    * All three set sizes come from the SAME capped distinct
    * (user, item) basis (power users past `maxItems` excluded before
    * any pair is formed, identically for intersection and union), so
    * the Jaccard denominators are consistent: n_a + n_b − n_both.
    * The per-item counts join the pair table twice as planning-scale
    * broadcasts (|items| rows). No top-k float ranking — the full
    * thresholded pair list is emitted and ordered by ids, so the only
    * float (the rounded ratio) never decides row membership.
    *
    * Scale shape: identical to [[coEngagementTransform]] (its
    * quadratic guard IS the scale story) plus two broadcast joins of
    * |items|-row count tables; at 100 TB the pair aggregate is the
    * same bounded maxItems²·|users| shuffle.
    */
  /** The capped distinct (user, item) basis shared by
    * [[itemSimilarityTransform]] and [[itemCfRecommendTransform]] —
    * power users past `maxItems` excluded BEFORE any pair forms, so
    * similarity and recommendation run over the identical matrix. */
  private def cappedUserItems(events: DataFrame, maxItems: Int): DataFrame = {
    val items = events
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .distinct()
    items.join(
      items.groupBy(col("user_id")).agg(count(lit(1)).as("n_items"))
        .filter(col("n_items") <= maxItems),
      Seq("user_id")).select(col("user_id"), col("item"))
  }

  def itemSimilarityTransform(events: DataFrame, maxItems: Int, minSupport: Long): DataFrame = {
    val kept = cappedUserItems(events, maxItems)
    val itemCounts = kept.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val a = kept.select(col("user_id"), col("item").as("item_a"))
    val b = kept.select(col("user_id"), col("item").as("item_b"))
    a.join(b, Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
      .join(broadcast(itemCounts.select(col("item").as("item_a"), col("n").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("item").as("item_b"), col("n").as("n_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both") / (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
      .orderBy(col("item_a"), col("item_b"))
  }

  def itemSimilarity(spark: SparkSession, dir: String): DataFrame =
    itemSimilarityTransform(Tables.events(spark, dir), maxItems = 50, minSupport = 3L)

  /** DuckDB oracle for [[itemSimilarityTransform]]. */
  val itemSimilarityOracleSql: String =
    """WITH it AS (
      |  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item FROM events),
      |kept AS (
      |  SELECT it.user_id, it.item FROM it
      |  JOIN (SELECT user_id FROM it GROUP BY 1 HAVING count(*) <= 50) u USING (user_id)),
      |ic AS (SELECT item, count(*) AS n FROM kept GROUP BY 1),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_both
      |  FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT item_a, item_b, ia.n AS n_a, ib.n AS n_b, n_both,
      |       round(n_both / (ia.n + ib.n - n_both), 6) AS jaccard
      |FROM pairs JOIN ic ia ON pairs.item_a = ia.item
      |           JOIN ic ib ON pairs.item_b = ib.item
      |ORDER BY item_a, item_b""".stripMargin

  /** Item-based collaborative-filtering top-N recommendations — the
    * "users who engaged with X also engaged with…" READ of the
    * [[itemSimilarityTransform]] matrix, completing the recommender
    * loop (similarity → per-user scored candidates).
    *
    * Fully deterministic integer pipeline: each co-engaged pair's
    * similarity collapses to basis points by truncating division
    * (`n_both·10⁴ div (n_a+n_b−n_both)` — no float ever ranks), every
    * item keeps only its `topNbr` strongest neighbours (row_number
    * ordered (bp DESC, neighbour id) — total order, no tie
    * ambiguity), a user's candidate score is the exact Long sum of
    * the similarity bps of their owned items that neighbour the
    * candidate, owned items drop by LEFT ANTI on the same capped
    * basis, and the final top-`topRec` per user ranks (score DESC,
    * item) — again total.
    *
    * Scale shape: the pair aggregate is [[itemSimilarityTransform]]'s
    * bounded shuffle; the trimmed neighbour table is ≤ |items|·topNbr
    * rows — a BROADCAST, so scoring is a map-side join of the
    * (user, item) basis against it, then ONE (user, candidate)
    * shuffle; the per-user rank window partitions by user_id. No
    * stage touches |users|·|items|.
    */
  def itemCfRecommendTransform(events: DataFrame, maxItems: Int = 50,
                               minSupport: Long = 3L, topNbr: Int = 10,
                               topRec: Int = 5): DataFrame = {
    val kept = cappedUserItems(events, maxItems)
    val sims0 = itemSimilarityTransform(events, maxItems, minSupport)
      .select(col("item_a"), col("item_b"),
        expr("CAST(n_both * 10000 div (n_a + n_b - n_both) AS BIGINT)").as("bp"))
    val sims = sims0.select(col("item_a").as("item"), col("item_b").as("nbr"), col("bp"))
      .unionByName(sims0.select(col("item_b").as("item"), col("item_a").as("nbr"), col("bp")))
    val byStrength = Window.partitionBy(col("item")).orderBy(col("bp").desc, col("nbr"))
    val topSims = sims.withColumn("rk", row_number().over(byStrength))
      .filter(col("rk") <= topNbr).select(col("item"), col("nbr"), col("bp"))
    val scored = kept.join(broadcast(topSims), Seq("item"))
      .groupBy(col("user_id"), col("nbr").as("item_rec"))
      .agg(sum(col("bp")).as("score"))
      .join(kept.select(col("user_id"), col("item").as("item_rec")),
        Seq("user_id", "item_rec"), "left_anti")
    val byScore = Window.partitionBy(col("user_id")).orderBy(col("score").desc, col("item_rec"))
    scored.withColumn("rank", row_number().over(byScore).cast("long"))
      .filter(col("rank") <= topRec)
      .select(col("user_id"), col("item_rec"), col("score"), col("rank"))
      .orderBy(col("user_id"), col("rank"))
  }

  def itemCfRecommend(spark: SparkSession, dir: String): DataFrame =
    itemCfRecommendTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[itemCfRecommendTransform]] — the same
    * integer pipeline (DuckDB `//` truncates toward zero exactly like
    * Spark's `div` on the non-negative values here). */
  val itemCfRecommendOracleSql: String =
    """WITH it AS (
      |  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item FROM events),
      |kept AS (
      |  SELECT it.user_id, it.item FROM it
      |  JOIN (SELECT user_id FROM it GROUP BY 1 HAVING count(*) <= 50) u USING (user_id)),
      |ic AS (SELECT item, count(*) AS n FROM kept GROUP BY 1),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_both
      |  FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |sims0 AS (
      |  SELECT item_a, item_b, n_both * 10000 // (ia.n + ib.n - n_both) AS bp
      |  FROM pairs JOIN ic ia ON item_a = ia.item JOIN ic ib ON item_b = ib.item),
      |sims AS (SELECT item_a AS item, item_b AS nbr, bp FROM sims0
      |         UNION ALL SELECT item_b, item_a, bp FROM sims0),
      |top_sims AS (
      |  SELECT item, nbr, bp FROM (
      |    SELECT *, row_number() OVER (PARTITION BY item ORDER BY bp DESC, nbr) AS rk FROM sims)
      |  WHERE rk <= 10),
      |scored AS (
      |  SELECT k.user_id, t.nbr AS item_rec, CAST(sum(t.bp) AS BIGINT) AS score
      |  FROM kept k JOIN top_sims t ON k.item = t.item
      |  GROUP BY 1, 2),
      |cand AS (
      |  SELECT s.* FROM scored s
      |  LEFT JOIN kept ON s.user_id = kept.user_id AND s.item_rec = kept.item
      |  WHERE kept.item IS NULL)
      |SELECT user_id, item_rec, score, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY score DESC, item_rec) AS BIGINT) AS rank
      |  FROM cand)
      |WHERE rank <= 5
      |ORDER BY user_id, rank""".stripMargin

  /** Gini coefficient of engagement concentration across items — THE
    * one-number inequality read ("do 1% of items soak up 99% of
    * events?") that decides skew strategy (salting, hot-key caches)
    * before any per-item query runs; the economics formulation
    * (Lorenz-curve area) computed exactly: with per-item event
    * counts x₁ ≤ … ≤ xₙ (ties broken by item id — a TOTAL order, so
    * both engines rank identically),
    * G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ).
    *
    * All three sums run in Decimal(38,0) (DuckDB HUGEINT): at fleet
    * scale i reaches |items| (~10⁸) and Σxᵢ ~10¹², putting Σi·xᵢ
    * past a Long. The single float is the final division of two
    * exact decimals — each converts to its nearest double
    * identically in both engines, so the rounded G is
    * engine-bit-equal.
    *
    * Scale shape: fact → per-item counts (ONE map-side-combinable
    * shuffle, |items| rows out); the rank rides
    * [[GlobalRank.withGlobalOrder]]'s range-partitioned slice rank
    * (round-9 verdict task 1 — |items| is data scale: a catalog at
    * 100 TB is ~10⁸ items, too many for a one-task sort), and the
    * aggregate reduces to ONE row.
    */
  def engagementGiniTransform(events: DataFrame): DataFrame =
    giniFromCounts(itemEngagementCounts(events))

  /** Per-item engagement counts from props.$.k — the shared
    * extraction (batch operator + the streaming twin's per-batch
    * partial), so parity is by construction. */
  def itemEngagementCounts(events: DataFrame): DataFrame = events
    .select(get_json_object(col("props"), "$.k").cast("long").as("item"))
    .filter(col("item").isNotNull)
    .groupBy(col("item")).agg(count(lit(1)).as("cnt"))

  /** Report face over the per-item (item, cnt) table — shared by the
    * batch operator and `stream_engagement_gini`'s additive count
    * state, so stream ≡ batch by code. */
  def giniFromCounts(counts: DataFrame): DataFrame = {
    val ranked = GlobalRank.withGlobalOrder(counts, Seq(col("cnt"), col("item")))
      .withColumnRenamed("grk", "rn")
    ranked
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("cnt")).as("total_events"),
        sum(col("rn").cast("decimal(38,0)") * col("cnt").cast("decimal(38,0)")).as("wsum"))
      .select(col("n_items"), col("total_events"),
        round(
          (lit(2).cast("decimal(38,0)") * col("wsum")
            - (col("n_items") + lit(1)).cast("decimal(38,0)") * col("total_events").cast("decimal(38,0)"))
            .cast("double")
          / (col("n_items").cast("decimal(38,0)") * col("total_events").cast("decimal(38,0)"))
            .cast("double"), 6).as("gini"))
  }

  def engagementGini(spark: SparkSession, dir: String): DataFrame =
    engagementGiniTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[engagementGiniTransform]] — identical exact
    * HUGEINT arithmetic, one double division at the end. */
  val engagementGiniOracleSql: String =
    """WITH it AS (
      |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item, count(*) AS cnt
      |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL GROUP BY 1),
      |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, item) AS rn FROM it),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
      |             CAST(sum(cnt) AS BIGINT) AS total_events,
      |             CAST(sum(CAST(rn AS HUGEINT) * CAST(cnt AS HUGEINT)) AS HUGEINT) AS wsum
      |      FROM r)
      |SELECT n_items, total_events,
      |       round(CAST(2 * wsum - (CAST(n_items AS HUGEINT) + 1) * CAST(total_events AS HUGEINT) AS DOUBLE)
      |             / CAST(CAST(n_items AS HUGEINT) * CAST(total_events AS HUGEINT) AS DOUBLE), 6) AS gini
      |FROM s""".stripMargin

  /** CUSUM changepoint detection over the daily event-count series —
    * "WHEN did traffic shift?" (deploy/incident/bot-wave dating), the
    * temporal complement of [[anomalyTransform]]'s per-point z-score:
    * a level change too small to flag any single day accumulates in
    * the cumulative deviation. Classic mean-centered CUSUM
    * (Page 1954), argmax form: the changepoint estimate is the day
    * maximizing |Σ_{i≤t}(x_i − x̄)|.
    *
    * Exact integers throughout: with S_t the running sum, T days and
    * N total events, T·S_t − t·N = T·Σ(x_i − N/T) — the deviation
    * scaled by T, avoiding the fractional mean entirely. Long-safe
    * while days·events < 9·10¹⁸ (a 100 TB decade is ~3.6·10¹⁵;
    * past that the documented Decimal(38,0) swap of
    * [[metricCorrelationsTransform]]). The changepoint flag is
    * decided on integers only: max |dev| as a one-row broadcast,
    * earliest-day tie-break as a second — both the repo's standard
    * one-row stats crossJoins.
    *
    * Scale shape: fact → |days| rows in one map-side-combinable
    * shuffle; calendar zero-fill from a one-row min/max broadcast
    * (missing days are 0-count observations, not gaps — a silent
    * ingestion outage IS the changepoint); cumsum window over the
    * planning-scale day series.
    */
  def changepointCusumTransform(events: DataFrame): DataFrame =
    changepointFromDaily(events.select(date_trunc("day", col("ts")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n")))

  /** The CUSUM derivation from an already-aggregated (day, n) count
    * table — split out so the STREAMING twin
    * ([[graft.streaming.ChangepointStream]]) can maintain the daily
    * counts as additive state and derive the report through this
    * identical expression tree (the [[modeFromDailyCounts]] /
    * sourceDriftFromCounts parity pattern). */
  def changepointFromDaily(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val axis = bounds.select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val filled = axis.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n_events"))
    val wDay = Window.partitionBy(lit(0)).orderBy(col("day"))
    val withCum = filled
      .withColumn("t_idx", row_number().over(wDay).cast("long"))
      .withColumn("cum", sum(col("n_events")).over(wDay))
    val totals = withCum.agg(max(col("t_idx")).as("t_total"), max(col("cum")).as("n_total"))
    val dev = withCum.crossJoin(broadcast(totals))
      .select(col("day"), col("n_events"),
        (col("t_total") * col("cum") - col("t_idx") * col("n_total")).as("dev"))
    val peak = dev.agg(max(abs(col("dev"))).as("max_dev"))
    val cpDay = dev.crossJoin(broadcast(peak))
      .filter(abs(col("dev")) === col("max_dev"))
      .agg(min(col("day")).as("cp_day"))
    dev.crossJoin(broadcast(cpDay))
      .select(col("day"), col("n_events"), col("dev"),
        (col("day") === col("cp_day")).as("is_changepoint"))
      .orderBy(col("day"))
  }

  def changepointCusum(spark: SparkSession, dir: String): DataFrame =
    changepointCusumTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[changepointCusumTransform]] — identical
    * integer deviation, scalar-subquery max and tie-break. */
  val changepointCusumOracleSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      |axis AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
      |filled AS (
      |  SELECT axis.day, CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events
      |  FROM axis LEFT JOIN daily ON axis.day = daily.day),
      |cumed AS (
      |  SELECT day, n_events,
      |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t_idx,
      |         CAST(sum(n_events) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM filled),
      |tot AS (SELECT max(t_idx) AS t_total, max(cum) AS n_total FROM cumed),
      |dev AS (
      |  SELECT day, n_events, CAST(t_total * cum - t_idx * n_total AS BIGINT) AS dev
      |  FROM cumed, tot),
      |cp AS (SELECT min(day) AS cp_day FROM dev
      |       WHERE abs(dev) = (SELECT max(abs(dev)) FROM dev))
      |SELECT day, n_events, dev, (day = cp_day) AS is_changepoint
      |FROM dev, cp ORDER BY day""".stripMargin

  /** Pairwise Pearson correlation between event types' DAILY revenue
    * series — the metric-correlation screen ("does `click` revenue
    * move with `purchase` revenue?") behind dashboard anomaly
    * root-causing. The day×type grid is ZERO-FILLED (a missing day is
    * 0 revenue, not an ignored observation), so every pair correlates
    * over the identical n = |days| sample.
    *
    * All five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are
    * EXACT integer sums of daily cents — commutative, engine- and
    * order-independent; the cross-products run in Decimal(38,0)
    * (DuckDB HUGEINT) because a 1e9-cent day already puts xa·xb at
    * ~1e18 and the sf0.01 corpus overflows a Long in ANSI mode.
    * Floats appear only in the final
    * r = (nΣxy − ΣxΣy)/√((nΣx² − (Σx)²)(nΣy² − (Σy)²)) — both
    * engines convert the same exact decimal to the same
    * correctly-rounded double, so the rounded r is engine-identical.
    *
    * Scale shape: fact → (day, type) partial-agg (map-side
    * combinable, one shuffle), grid is |days|·|types| planning-scale
    * rows; the pair join fans each day row |types|² ways — bounded by
    * the type-count square, never by data volume.
    */
  def metricCorrelationsTransform(events: DataFrame): DataFrame = {
    val daily = events
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("cents")).as("cents"))
    val days = daily.select(col("day")).distinct()
    val types = daily.select(col("event_type")).distinct()
    val grid = days.crossJoin(broadcast(types))
      .join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"), coalesce(col("cents"), lit(0L)).as("cents"))
    val x = grid.select(col("day"), col("event_type").as("type_a"), col("cents").as("xa"))
    val y = grid.select(col("day"), col("event_type").as("type_b"), col("cents").as("xb"))
    val dec = "decimal(38,0)"
    x.join(y, Seq("day"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("xa")).cast(dec).as("sx"), sum(col("xb")).cast(dec).as("sy"),
        sum(col("xa").cast(dec) * col("xb")).as("sxy"),
        sum(col("xa").cast(dec) * col("xa")).as("sxx"),
        sum(col("xb").cast(dec) * col("xb")).as("syy"))
      .select(col("type_a"), col("type_b"), col("n"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
               (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6).as("pearson_r"))
      .orderBy(col("type_a"), col("type_b"))
  }

  def metricCorrelations(spark: SparkSession, dir: String): DataFrame =
    metricCorrelationsTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[metricCorrelationsTransform]] — the same
    * integer sufficient statistics, the same final expression.
    */
  val metricCorrelationsOracleSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
      |         sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT d.day, t.event_type, coalesce(daily.cents, 0) AS cents
      |  FROM (SELECT DISTINCT day FROM daily) d
      |  CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
      |  LEFT JOIN daily ON daily.day = d.day AND daily.event_type = t.event_type),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n,
      |         CAST(sum(a.cents) AS HUGEINT) AS sx, CAST(sum(b.cents) AS HUGEINT) AS sy,
      |         sum(CAST(a.cents AS HUGEINT) * b.cents) AS sxy,
      |         sum(CAST(a.cents AS HUGEINT) * a.cents) AS sxx,
      |         sum(CAST(b.cents AS HUGEINT) * b.cents) AS syy
      |  FROM grid a JOIN grid b ON a.day = b.day AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n,
      |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |             sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
      |FROM p ORDER BY type_a, type_b""".stripMargin

  /** Daily modal item — per day, the most-engaged item (by event
    * count) with a deterministic tie-break (smallest item id), its
    * count, and its integer share of the day in basis points. The
    * ClickHouse `topK(1)`/`anyHeavy` per-bucket analog, exact.
    *
    * Shape: fact → (day, item) counts (map-side combinable), then a
    * row_number window PARTITIONED BY day (distributed — every day
    * sorts only its own items) picks rank 1; the day-total joins back
    * co-partitioned on day. Integer share (n·10⁴ div total) keeps
    * the output float-free.
    */
  def modeDailyItemTransform(events: DataFrame): DataFrame =
    modeFromDailyCounts(events
      .select(date_trunc("day", col("ts")).as("day"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .groupBy(col("day"), col("item"))
      .agg(count(lit(1)).as("n")))

  /** Mode selection from a (day, item, n) count table — shared by the
    * batch operator above and [[graft.streaming.DailyModeState]]'s
    * report (stream/batch parity by construction: the streaming twin
    * maintains the SAME count table additively and derives the mode
    * through this exact expression tree).
    */
  def modeFromDailyCounts(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy(col("day")).agg(sum(col("n")).as("total"))
    val w = Window.partitionBy(col("day")).orderBy(col("n").desc, col("item"))
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(totals, Seq("day"))
      .select(col("day"), col("item").as("top_item"), col("n"),
        expr("n * 10000 div total").as("share_bp"))
      .orderBy(col("day"))
  }

  def modeDailyItem(spark: SparkSession, dir: String): DataFrame =
    modeDailyItemTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[modeDailyItemTransform]]. */
  val modeDailyItemOracleSql: String =
    """WITH c AS (
      |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT day, sum(n) AS total FROM c GROUP BY 1),
      |r AS (SELECT day, item, n, row_number() OVER (PARTITION BY day ORDER BY n DESC, item) AS rn FROM c)
      |SELECT r.day, r.item AS top_item, r.n,
      |       CAST(r.n * 10000 // t.total AS BIGINT) AS share_bp
      |FROM r JOIN t ON r.day = t.day WHERE r.rn = 1 ORDER BY r.day""".stripMargin

  /** Daily growth accounting — the new / retained / resurrected /
    * churned user-state ledger every growth dashboard runs (and the
    * identity `active(d) = new + retained + resurrected`,
    * `churned(d) = active(d−1) − retained(d)` audits it): per
    * calendar day over [min_day, max_day], classified from each
    * user's previous active day — no prior day → `new`, exactly
    * yesterday → `retained`, older → `resurrected`; churned are
    * yesterday's actives who didn't return, accounted on the day
    * they went missing. Zero-activity calendar days zero-fill (their
    * churn is yesterday's whole active base).
    *
    * Shape: fact → distinct (user, day) (one user_id-keyed shuffle),
    * per-user lag window co-partitioned on the same key, conditional
    * count aggregate to |days| rows; the calendar grid comes from a
    * one-row min/max broadcast + `sequence()`, and the final churn
    * lag runs over the |days|-row series (planning scale). Nothing
    * after the distinct touches event rows.
    */
  def lifecycleTransform(events: DataFrame): DataFrame =
    lifecycleFromDays(
      events.select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct())

  /** The growth-accounting derivation over a distinct `(user_id,
    * day)` activity table — split out so the streaming twin
    * ([[graft.streaming.DistinctDailyState]], which keeps exactly
    * this set) reports through the identical expression tree. */
  private[graft] def lifecycleFromDays(d: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val classified = d.withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("state",
        when(col("prev").isNull, "new")
          .when(expr("timestampdiff(DAY, prev, day)") === 1, "retained")
          .otherwise("resurrected"))
    val perDay = classified.groupBy(col("day"))
      .agg(count(lit(1)).as("active"),
        sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val bounds = d.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val grid = bounds.select(explode(expr(
      "sequence(lo, hi, interval 1 day)")).as("day"))
    val filled = grid.join(perDay, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("active"), lit(0L)).as("active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"))
    val wd = Window.partitionBy(lit(0)).orderBy(col("day"))
    filled
      .withColumn("n_churned",
        coalesce(lag(col("active"), 1).over(wd) - col("n_retained"), lit(0L)))
      .orderBy(col("day"))
  }

  def userLifecycle(spark: SparkSession, dir: String): DataFrame =
    lifecycleTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[lifecycleTransform]]. */
  val userLifecycleOracleSql: String =
    """WITH d AS (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
      |cl AS (SELECT day,
      |              CASE WHEN prev IS NULL THEN 'new'
      |                   WHEN date_diff('day', prev, day) = 1 THEN 'retained'
      |                   ELSE 'resurrected' END AS state
      |       FROM (SELECT user_id, day, lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev FROM d)),
      |pd AS (SELECT day, count(*) AS active,
      |              sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS n_new,
      |              sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS n_retained,
      |              sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
      |       FROM cl GROUP BY 1),
      |grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |         FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |f AS (SELECT g.day,
      |             CAST(coalesce(pd.active, 0) AS BIGINT) AS active,
      |             CAST(coalesce(pd.n_new, 0) AS BIGINT) AS n_new,
      |             CAST(coalesce(pd.n_retained, 0) AS BIGINT) AS n_retained,
      |             CAST(coalesce(pd.n_resurrected, 0) AS BIGINT) AS n_resurrected
      |      FROM grid g LEFT JOIN pd ON g.day = pd.day)
      |SELECT day, active, n_new, n_retained, n_resurrected,
      |       CAST(coalesce(lag(active) OVER (ORDER BY day) - n_retained, 0) AS BIGINT) AS n_churned
      |FROM f ORDER BY day""".stripMargin

  /** Inter-event gap histogram — the traffic-burstiness profile
    * (bot screens and session-gap tuning both read it): per
    * consecutive same-user event pair, the gap in whole seconds,
    * bucketed by powers of two (`⌊log₂(gap+1)⌋` — exact for doubles
    * at every power-of-two boundary, identical in both engines) with
    * the bucket's closed integer bounds spelled out.
    *
    * Shape: per-user lag window (one user_id shuffle, co-partitioned
    * sort), then a map-side-combinable bucket count — ≤ ~40 output
    * rows at any scale.
    */
  def intereventHistogramTransform(events: DataFrame): DataFrame =
    intereventFromBuckets(gapBucketCounts(events))

  /** Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of the per-(user, type)
    * inter-event gaps, per type — ONE number for what the
    * [[intereventHistogramTransform]] buckets show as a shape
    * (B → −1 metronome, 0 Poisson, → +1 bursty; the Fano factor
    * reads the same property off daily COUNTS, this reads it off the
    * GAPS, so sub-day burst structure the daily grid integrates away
    * is visible here): exact µs gaps (the raw epoch-µs subtraction
    * discipline), per-type moments n/Σg/Σg² as DECIMAL(38,0) (a
    * 90-day gap squares to 6·10³¹ — past Long), then the
    * cross-multiplied form B = (√(nΣg²−(Σg)²) − Σg)/(√(nΣg²−(Σg)²)
    * + Σg): one sqrt, one division, zero-spread guarded to NULL.
    * Shape: one (user, type) window pass, map-side-combinable
    * moments, |types| rows out. */
  def burstinessIndexTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    events.select($"user_id", $"event_type", $"ts", $"event_id")
      .withColumn("gap_us",
        expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(w))
      .filter($"gap_us".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(expr("CAST(gap_us AS DECIMAL(38,0))")).as("s1"),
        sum(expr("CAST(gap_us AS DECIMAL(38,0)) * gap_us")).as("s2"))
      .select($"event_type", $"n_gaps",
        expr("round(CAST(s1 AS DOUBLE) / n_gaps / 1e6, 4)").as("mean_gap_s"),
        expr("""CASE WHEN n_gaps > 1 AND
               |          sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) + CAST(s1 AS DOUBLE) > 0 THEN
               |  round((sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) - CAST(s1 AS DOUBLE)) /
               |        (sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) + CAST(s1 AS DOUBLE)), 6)
               |END""".stripMargin).as("burstiness"))
      .orderBy($"event_type")
  }

  def burstinessIndex(spark: SparkSession, dir: String): DataFrame =
    burstinessIndexTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[burstinessIndexTransform]]. */
  val burstinessIndexOracleSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP))
      |           - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, event_type
      |               ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      |m AS (SELECT event_type, count(*) AS n_gaps,
      |             sum(CAST(gap_us AS HUGEINT)) AS s1,
      |             sum(CAST(gap_us AS HUGEINT) * gap_us) AS s2
      |      FROM g WHERE gap_us IS NOT NULL GROUP BY 1)
      |SELECT event_type, n_gaps,
      |       round(CAST(s1 AS DOUBLE) / n_gaps / 1e6, 4) AS mean_gap_s,
      |       CASE WHEN n_gaps > 1 AND
      |                 sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) + CAST(s1 AS DOUBLE) > 0 THEN
      |         round((sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) - CAST(s1 AS DOUBLE)) /
      |               (sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) + CAST(s1 AS DOUBLE)), 6)
      |       END AS burstiness
      |FROM m ORDER BY 1""".stripMargin

  /** The in-order gap extraction + bucketing — shared BY CONSTRUCTION
    * with the streaming twin's per-batch pass
    * ([[graft.streaming.IntereventState]]): exact µs integers then
    * truncating div (Spark's timestampdiff truncates the interval
    * while DuckDB's date_diff counts boundary CROSSINGS, so the two
    * disagree on sub-second timestamps; raw epoch-µs subtraction
    * sidesteps the semantic entirely). */
  private[graft] def gapBucketCounts(events: DataFrame): DataFrame =
    bucketizeGapUs(events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us", expr("unix_micros(ts) - lag(unix_micros(ts), 1) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id)"))
      .filter(col("gap_us").isNotNull))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"))

  /** µs gap → power-of-two bucket, one expression tree for every
    * caller (batch lag pairs AND stream boundary pairs). */
  private[graft] def bucketizeGapUs(gaps: DataFrame): DataFrame =
    gaps.withColumn("gap_s", expr("gap_us div 1000000"))
      .select(expr("CAST(floor(log2(gap_s + 1)) AS BIGINT)").as("bucket"))

  /** Bucket counts → labeled histogram rows — the read-time face the
    * streaming twin derives from its additive (bucket, n_gaps)
    * state. Re-aggregates on entry so callers may pass partials. */
  private[graft] def intereventFromBuckets(buckets: DataFrame): DataFrame =
    buckets
      .groupBy(col("bucket"))
      .agg(sum(col("n_gaps")).as("n_gaps"))
      .select(col("bucket"),
        expr("CAST(pow(2, bucket) AS BIGINT) - 1").as("gap_lo_s"),
        expr("CAST(pow(2, bucket + 1) AS BIGINT) - 2").as("gap_hi_s"),
        col("n_gaps"))
      .orderBy(col("bucket"))

  def intereventHistogram(spark: SparkSession, dir: String): DataFrame =
    intereventHistogramTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[intereventHistogramTransform]]. */
  val intereventHistogramOracleSql: String =
    """WITH g AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) -
      |           lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
      |  FROM events),
      |b AS (SELECT CAST(floor(log2(gap_us // 1000000 + 1)) AS BIGINT) AS bucket
      |      FROM g WHERE gap_us IS NOT NULL)
      |SELECT bucket,
      |       CAST(pow(2, bucket) AS BIGINT) - 1 AS gap_lo_s,
      |       CAST(pow(2, bucket + 1) AS BIGINT) - 2 AS gap_hi_s,
      |       count(*) AS n_gaps
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  def topkDiversified(spark: SparkSession, dir: String, k: Int = 10, perUser: Int = 2): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val w1 = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val capped = ev.withColumn("ur", row_number().over(w1)).filter(col("ur") <= perUser)
    val top = Engagement.topkExplode(Engagement.topkAggTransform(capped, k))
    ev.select(col("event_id"), col("user_id"))
      .join(broadcast(top), Seq("event_id"))
      .select(col("event_type"), col("rank"), col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_type"), col("rank"))
  }

  /** Day-over-day revenue-rank movement of the top items — the
    * "movers" board next to [[graft.operators.Engagement
    * .trendingDaily]]'s plain top-k: today's top `k` items by exact
    * cents with yesterday's rank joined on the shifted calendar key
    * (same discipline as `yoy_revenue` — a LAG over the day axis
    * lies when a day is missing; an explicit day−1 join cannot).
    * `rank_delta` > 0 = climbed, NULL = new to the board's universe.
    *
    * Shape: fact → (day, item) cents in one map-side-combinable
    * shuffle; ranks are per-day windows (each day sorts only its own
    * items); the top-k board joins the FULL previous-day rank table
    * so a riser's old rank is visible even when it was outside
    * yesterday's top k. Output ≤ k·|days| rows.
    */
  def rankDeltaDailyTransform(events: DataFrame, k: Int = 10): DataFrame = {
    val daily = events
      .select(date_trunc("day", col("ts")).as("day"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .filter(col("item").isNotNull)
      .groupBy(col("day"), col("item"))
      .agg(sum(col("cents")).as("cents"))
    val byDay = Window.partitionBy(col("day"))
      .orderBy(col("cents").desc, col("item"))
    val ranked = daily.withColumn("rank", row_number().over(byDay).cast("long"))
    ranked.filter(col("rank") <= k)
      .join(ranked.select((col("day") + expr("INTERVAL 1 DAY")).as("day"),
          col("item"), col("rank").as("prev_rank")),
        Seq("day", "item"), "left")
      .select(col("day"), col("rank"), col("item"), col("cents"),
        col("prev_rank"), (col("prev_rank") - col("rank")).as("rank_delta"))
      .orderBy(col("day"), col("rank"))
  }

  def rankDeltaDaily(spark: SparkSession, dir: String): DataFrame =
    rankDeltaDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[rankDeltaDailyTransform]] (k = 10). */
  val rankDeltaDailyOracleSql: String =
    """WITH d AS (
      |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      |  GROUP BY 1, 2),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY day ORDER BY cents DESC, item) AS BIGINT) AS rank FROM d)
      |SELECT a.day, a.rank, a.item, a.cents, b.rank AS prev_rank,
      |       b.rank - a.rank AS rank_delta
      |FROM r a LEFT JOIN r b ON a.item = b.item AND a.day = b.day + INTERVAL 1 DAY
      |WHERE a.rank <= 10 ORDER BY a.day, a.rank""".stripMargin

  /** Exponentially-weighted daily revenue per event type — the
    * smoothed KPI line under every ops dashboard — computed as a
    * DYADIC integer convolution so two engines agree bit-for-bit:
    * with α = 1/2 the 20-day-truncated EWMA numerator is
    * Σₖ cents_{t−k} · 2^(19−k), an EXACT BIGINT (tail weight past 20
    * days < 1e−6 of the total — below the output rounding), and the
    * only float is the final ratio of two exact integers. A
    * recurrence (`s_t = αx + (1−α)s`) would accumulate
    * order-dependent float error and is windowless in both engines;
    * a float-weight window would sum in engine-specific order.
    *
    * Shape: fact → zero-filled |types|×|days| grid (one map-side-
    * combinable shuffle, then a broadcast calendar spine); the
    * 20-tap convolution is an equi-join on event_type with a bounded
    * day-range predicate — grid-scale (≤ 20·|grid| intermediate
    * rows), never fact-scale.
    */
  def ewmaDailyTransform(events: DataFrame, taps: Int = 20): DataFrame =
    ewmaFromDaily(events
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("day")).agg(sum(col("cents")).as("cents")),
      taps)

  /** The EWMA derivation from an already-aggregated (event_type, day,
    * cents) table — split out so the STREAMING twin
    * ([[graft.streaming.EwmaStream]]) can maintain daily cents as
    * additive state and derive the smoothed series through this
    * identical expression tree (the changepointFromDaily /
    * modeFromDailyCounts parity pattern). */
  def ewmaFromDaily(daily0: DataFrame, taps: Int = 20): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    // calendar spine exploded from a ONE-ROW bounds aggregate (the
    // changepoint_cusum pattern) — the types×days grid materializes
    // through a generator + equi-join, never a nested-loop join
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"cents", lit(0L)).as("cents"))
    val m = taps - 1
    grid.as("a")
      .join(grid.as("b"),
        $"a.event_type" === $"b.event_type" &&
          $"b.day" <= $"a.day" &&
          $"b.day" >= $"a.day" - expr(s"INTERVAL $m DAY"))
      .select($"a.event_type".as("event_type"), $"a.day".as("day"),
        $"a.cents".as("cents"),
        // DECIMAL(38,0), not BIGINT: daily cents × 2^19 summed over 20
        // taps wraps a Long silently past ~1.8e13 cents/day while the
        // DECIMAL numerator stays exact at any revenue scale (the
        // revenueHhi/abWelchTtest discipline); the one float remains
        // the final ratio of two exact integers.
        expr(s"CAST(b.cents AS DECIMAL(38,0)) * CAST(pow(2, $m - datediff(a.day, b.day)) AS DECIMAL(38,0))").as("wc"),
        expr(s"CAST(pow(2, $m - datediff(a.day, b.day)) AS BIGINT)").as("w"))
      .groupBy($"event_type", $"day")
      .agg(first($"cents").as("cents"),
        round(sum($"wc").cast("double") / sum($"w").cast("double"), 4).as("ewma_cents"))
      .orderBy($"event_type", $"day")
  }

  def ewmaDaily(spark: SparkSession, dir: String): DataFrame =
    ewmaDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[ewmaDailyTransform]] (taps = 20). */
  val ewmaDailyOracleSql: String =
    """WITH d AS (
      |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |grid AS (SELECT t.event_type, s.day, CAST(coalesce(d.cents, 0) AS BIGINT) AS cents
      |         FROM (SELECT DISTINCT event_type FROM d) t
      |         CROSS JOIN spine s
      |         LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day)
      |SELECT a.event_type, a.day, a.cents,
      |       round(CAST(sum(CAST(b.cents AS HUGEINT) * CAST(pow(2, 19 - date_diff('day', b.day, a.day)) AS HUGEINT)) AS DOUBLE)
      |             / CAST(sum(CAST(pow(2, 19 - date_diff('day', b.day, a.day)) AS BIGINT)) AS DOUBLE), 4) AS ewma_cents
      |FROM grid a JOIN grid b
      |  ON a.event_type = b.event_type AND b.day <= a.day AND b.day >= a.day - INTERVAL 19 DAY
      |GROUP BY a.event_type, a.day, a.cents
      |ORDER BY a.event_type, a.day""".stripMargin

  /** Revenue concentration per event type — the Pareto/"whale" board
    * a monetization team reads next to [[engagementGini]]'s single
    * inequality number: how many users cover 80 % of the type's
    * revenue (integer cumulative-cents compare, `5·cum ≥ 4·total` —
    * no float thresholds), and the exact share held by the top
    * decile of users (⌈n/10⌉ by integer arithmetic; the one float is
    * the final ratio, rounded).
    *
    * Shape: ONE shuffle to (type, user) cents, then per-type windows
    * (each type sorts only its own users) collapsing to |types| rows.
    */
  def paretoUsersTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val perUser = events
      .select($"event_type", $"user_id",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"event_type", $"user_id").agg(sum($"cents").as("cents"))
    val byRev = Window.partitionBy($"event_type")
      .orderBy($"cents".desc, $"user_id")
    val cum = byRev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy($"event_type")
    perUser
      .withColumn("rn", row_number().over(byRev).cast("long"))
      .withColumn("cum", sum($"cents").over(cum))
      .withColumn("total", sum($"cents").over(whole))
      .withColumn("n", count(lit(1)).over(whole))
      .groupBy($"event_type")
      .agg(max($"n").as("n_users"),
        max($"total").as("total_cents"),
        min(when(expr("5 * cum >= 4 * total"), $"rn")).as("users_80pct"),
        max(when($"rn" === expr("(n + 9) div 10"), $"cum")).as("decile_cum"))
      .select($"event_type", $"n_users", $"total_cents",
        $"users_80pct",
        round($"decile_cum" / $"total_cents", 6).as("top_decile_share"))
      .orderBy($"event_type")
  }

  def paretoUsers(spark: SparkSession, dir: String): DataFrame =
    paretoUsersTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[paretoUsersTransform]]. */
  val paretoUsersOracleSql: String =
    """WITH u AS (SELECT event_type, user_id,
      |                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |           FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, cents,
      |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents DESC, user_id) AS BIGINT) AS rn,
      |             CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY cents DESC, user_id
      |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |             CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |             count(*) OVER (PARTITION BY event_type) AS n
      |      FROM u)
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n_users, max(total) AS total_cents,
      |       min(CASE WHEN 5 * cum >= 4 * total THEN rn END) AS users_80pct,
      |       round(CAST(max(CASE WHEN rn = (n + 9) // 10 THEN cum END) AS DOUBLE) / max(total), 6) AS top_decile_share
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** Tukey box-plot profile per event type — the outlier screen a
    * data-quality pass runs before z-scores (which [[anomalyZscore]]
    * already covers; MAD in [[anomalyMadTransform]]): discrete
    * quartiles as exact k-th order statistics (k = ⌈p·n⌉ — the same
    * integer discipline as `rolling_p95_value`, no interpolation to
    * disagree on), IQR, and counts outside the 1.5·IQR fences
    * compared in DOUBLED cents (`2c < 5q₁ − 3q₃`) so the fence
    * arithmetic never leaves the integers.
    *
    * Shape: one shuffle on event_type; per-type window rank, the
    * k-th rows collapse to |types| quartile rows that broadcast back
    * onto the fact for the fence count.
    */
  def boxplotStatsTransform(events: DataFrame): DataFrame =
    boxplotFromCounts(events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt")))

  /** The quartile/fence derivation from an already-aggregated
    * (event_type, cents, cnt) value-count table — split out so the
    * STREAMING twin ([[graft.streaming.BoxplotStream]]) can maintain
    * the count table as additive state and derive the report through
    * this identical tree. The k-th order statistic over counts is
    * "first cents whose cumulative count reaches k" — identical to
    * ranking raw rows, but the input is value-cardinality-bounded
    * (the classic counting-sort quantile at 100 TB: the fact never
    * re-sorts, only the count grid does). */
  def boxplotFromCounts(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val byVal = Window.partitionBy($"event_type").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy($"event_type")
    val quart = counts
      .withColumn("cum", sum($"cnt").over(byVal))
      .withColumn("n", sum($"cnt").over(whole))
      .groupBy($"event_type")
      .agg(max($"n").as("n"),
        min(when(expr("cum >= (n + 3) div 4"), $"cents")).as("q1_cents"),
        min(when(expr("cum >= (2 * n + 3) div 4"), $"cents")).as("med_cents"),
        min(when(expr("cum >= (3 * n + 3) div 4"), $"cents")).as("q3_cents"))
    counts.join(broadcast(quart), Seq("event_type"))
      .groupBy($"event_type")
      .agg(max($"n").as("n"),
        max($"q1_cents").as("q1_cents"),
        max($"med_cents").as("med_cents"),
        max($"q3_cents").as("q3_cents"),
        (max($"q3_cents") - max($"q1_cents")).as("iqr_cents"),
        sum(when(expr("2 * cents < 5 * q1_cents - 3 * q3_cents"), $"cnt")
          .otherwise(0L)).as("n_low_outliers"),
        sum(when(expr("2 * cents > 5 * q3_cents - 3 * q1_cents"), $"cnt")
          .otherwise(0L)).as("n_high_outliers"))
      .orderBy($"event_type")
  }

  def boxplotStats(spark: SparkSession, dir: String): DataFrame =
    boxplotStatsTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[boxplotStatsTransform]]. */
  val boxplotStatsOracleSql: String =
    """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |r AS (SELECT event_type, cents,
      |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS rn,
      |             count(*) OVER (PARTITION BY event_type) AS n
      |      FROM c),
      |q AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      |             max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1_cents,
      |             max(CASE WHEN rn = (2 * n + 3) // 4 THEN cents END) AS med_cents,
      |             max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3_cents
      |      FROM r GROUP BY 1)
      |SELECT c.event_type, max(q.n) AS n,
      |       max(q.q1_cents) AS q1_cents, max(q.med_cents) AS med_cents,
      |       max(q.q3_cents) AS q3_cents,
      |       max(q.q3_cents) - max(q.q1_cents) AS iqr_cents,
      |       CAST(sum(CASE WHEN 2 * c.cents < 5 * q.q1_cents - 3 * q.q3_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
      |       CAST(sum(CASE WHEN 2 * c.cents > 5 * q.q3_cents - 3 * q.q1_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
      |FROM c JOIN q ON c.event_type = q.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Hour-of-week seasonality profile per event type — the weekly
    * heat-grid behind capacity planning and anomaly-baseline tuning
    * (the FULL week axis where [[Behavior]]'s `activity_heatmap`
    * reports the observed cells): per (type, day-of-week, hour) its
    * count, integer basis-point share of the type's traffic, and the
    * deviation from a uniform 168-cell week (`n·168·10⁴ div total −
    * 10⁴` — positive = hot cell), all in pure integer arithmetic.
    * Day-of-week derives from EPOCH-DAY arithmetic
    * (`(days + 4) mod 7`, 0 = Sunday) — Spark's `dayofweek` and
    * DuckDB's `dayofweek` disagree on numbering conventions; epoch
    * math cannot.
    *
    * Shape: fact collapses map-side to ≤ 168·|types| cells; the
    * share/deviation windows run at cell scale.
    */
  def seasonalityProfileTransform(events: DataFrame): DataFrame =
    seasonalityFromCells(events
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
        hour(col("ts")).cast("long").as("hour"))
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n")))

  /** The share/deviation derivation from an already-aggregated
    * (event_type, dow, hour, n) cell table — split out so the
    * STREAMING twin ([[graft.streaming.SeasonalityStream]]) can
    * maintain the 168-cell grid as additive state and derive the
    * report through this identical expression tree. */
  def seasonalityFromCells(cells: DataFrame): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells
      .withColumn("total", sum($"n").over(Window.partitionBy($"event_type")))
      .select($"event_type", $"dow", $"hour", $"n",
        expr("n * 10000 div total").as("share_bp"),
        expr("n * 168 * 10000 div total - 10000").as("dev_bp"))
      .orderBy($"event_type", $"dow", $"hour")
  }

  def seasonalityProfile(spark: SparkSession, dir: String): DataFrame =
    seasonalityProfileTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[seasonalityProfileTransform]]. */
  val seasonalityProfileOracleSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |         (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow,
      |         CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1)
      |SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, c.hour, CAST(c.n AS BIGINT) AS n,
      |       c.n * 10000 // t.total AS share_bp,
      |       c.n * 168 * 10000 // t.total - 10000 AS dev_bp
      |FROM c JOIN t USING (event_type)
      |ORDER BY 1, 2, 3""".stripMargin

  /** Daily value-percentile bands — the p50/p90/p99 latency-style
    * ribbon chart over the event value stream (the per-day axis
    * where [[boxplotStatsTransform]] profiles per type and
    * `rolling_p95_value` slides a window): discrete ⌈p·n⌉-th order
    * statistics per day via the counting-sort trick — (day, cents)
    * counts, cumulative sum per day, "first cents whose cum reaches
    * k" — exact integers end to end, no interpolation semantics to
    * disagree on.
    *
    * Shape: fact collapses map-side to the (day, value)-cardinality
    * count grid; the cumulative window sorts only each day's own
    * distinct values. The fact itself is never globally sorted.
    */
  def percentileBandsDailyTransform(events: DataFrame): DataFrame =
    percentileBandsFromCounts(events
      .select(date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"), col("cents")).agg(count(lit(1)).as("cnt")))

  /** The band derivation from an already-aggregated (day, cents, cnt)
    * count grid — split out so the STREAMING twin
    * ([[graft.streaming.PercentileBandsStream]]) can keep the grid as
    * additive state (the [[boxplotFromCounts]] pattern, keyed by
    * day). */
  def percentileBandsFromCounts(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val byVal = Window.partitionBy($"day").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum", sum($"cnt").over(byVal))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"day")))
      .groupBy($"day")
      .agg(max($"n").as("n"),
        min(when(expr("cum >= (n + 1) div 2"), $"cents")).as("p50_cents"),
        min(when(expr("cum >= (9 * n + 9) div 10"), $"cents")).as("p90_cents"),
        min(when(expr("cum >= (99 * n + 99) div 100"), $"cents")).as("p99_cents"))
      .orderBy($"day")
  }

  def percentileBandsDaily(spark: SparkSession, dir: String): DataFrame =
    percentileBandsDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[percentileBandsDailyTransform]]. */
  val percentileBandsDailyOracleSql: String =
    """WITH c AS (
      |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |         CAST(round(value * 100) AS BIGINT) AS cents, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT day, cents,
      |             CAST(sum(cnt) OVER (PARTITION BY day ORDER BY cents
      |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |             CAST(sum(cnt) OVER (PARTITION BY day) AS BIGINT) AS n
      |      FROM c)
      |SELECT day, max(n) AS n,
      |       min(CASE WHEN cum >= (n + 1) // 2 THEN cents END) AS p50_cents,
      |       min(CASE WHEN cum >= (9 * n + 9) // 10 THEN cents END) AS p90_cents,
      |       min(CASE WHEN cum >= (99 * n + 99) // 100 THEN cents END) AS p99_cents
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  /** Audience overlap between event types — Jaccard of user sets
    * per type pair (the TYPE-level face of [[Behavior]]'s
    * `item_similarity`; answers "do purchasers also click?"):
    * |U_a∩U_b| from one distinct (type, user) self-join on user_id,
    * per-type totals from the SAME distinct basis so the
    * denominators are consistent (n_a + n_b − n_both), the rounded
    * ratio never decides membership.
    *
    * Shape: distinct basis is one (user) shuffle; the pair fan-out
    * per user is ≤ C(|types|, 2); totals attach as a broadcast.
    */
  def typeUserOverlapTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val tu = events.select($"event_type", $"user_id").distinct()
    val totals = tu.groupBy($"event_type").agg(count(lit(1)).as("nu"))
    val pairs = tu.as("a").join(tu.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.select($"event_type".as("type_a"), $"nu".as("n_a"))), Seq("type_a"))
      .join(broadcast(totals.select($"event_type".as("type_b"), $"nu".as("n_b"))), Seq("type_b"))
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_both",
        round($"n_both" / ($"n_a" + $"n_b" - $"n_both").cast("double"), 6).as("jaccard"))
      .orderBy($"type_a", $"type_b")
  }

  def typeUserOverlap(spark: SparkSession, dir: String): DataFrame =
    typeUserOverlapTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[typeUserOverlapTransform]]. */
  val typeUserOverlapOracleSql: String =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      |t AS (SELECT event_type, count(*) AS nu FROM tu GROUP BY 1),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
      |      FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |      GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, CAST(ta.nu AS BIGINT) AS n_a, CAST(tb.nu AS BIGINT) AS n_b,
      |       CAST(p.n_both AS BIGINT) AS n_both,
      |       round(CAST(p.n_both AS DOUBLE) / (ta.nu + tb.nu - p.n_both), 6) AS jaccard
      |FROM p JOIN t ta ON ta.event_type = p.type_a
      |       JOIN t tb ON tb.event_type = p.type_b
      |ORDER BY 1, 2""".stripMargin

  /** Revenue-concentration Herfindahl–Hirschman index per event type
    * over items — the market-concentration number next to
    * [[paretoUsersTransform]]'s whale curve and `engagement_gini`'s
    * inequality: HHI = Σᵢ shareᵢ² = Σ centsᵢ² / total² with the
    * numerator an exact Decimal(38,0) sum (order-independent) and
    * the single float division rounded once. 1/HHI is the "effective
    * number of items" a mix decision reads.
    *
    * Shape: fact → (type, item) cents in one map-side-combinable
    * shuffle, then a |types|-row aggregate. */
  def revenueHhiTransform(events: DataFrame): DataFrame =
    hhiFromItemCents(itemCentsGrid(events))

  /** The (event_type, item, cents) extraction + aggregation shared BY
    * CONSTRUCTION between the batch [[revenueHhiTransform]] and the
    * streaming twin's `ItemCentsState.merge` — one expression tree, so
    * stream/batch parity survives config changes (ANSI mode flips
    * `cast` vs `TRY_CAST` semantics; with a single shared select there
    * is no second expression to drift). */
  def itemCentsGrid(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .filter(col("item").isNotNull)
      .groupBy(col("event_type"), col("item"))
      .agg(sum(col("cents")).as("cents"))

  /** The HHI derivation from an already-aggregated (event_type,
    * item, cents) table — split out so the STREAMING twin
    * ([[graft.streaming.HhiStream]]) can keep the item-cents grid as
    * additive state. */
  def hhiFromItemCents(itemCents: DataFrame): DataFrame = {
    val spark = itemCents.sparkSession
    import spark.implicits._
    itemCents
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_items"),
        sum($"cents").as("total_cents"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("sq"))
      .select($"event_type", $"n_items", $"total_cents",
        expr("round(CAST(sq AS DOUBLE) / (CAST(total_cents AS DOUBLE) * total_cents), 6)")
          .as("hhi"))
      .orderBy($"event_type")
  }

  def revenueHhi(spark: SparkSession, dir: String): DataFrame =
    revenueHhiTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[revenueHhiTransform]]. */
  val revenueHhiOracleSql: String =
    """WITH ic AS (
      |  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT event_type, count(*) AS n_items,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       round(CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
      |             / (CAST(sum(cents) AS DOUBLE) * sum(cents)), 6) AS hhi
      |FROM ic GROUP BY 1 ORDER BY 1""".stripMargin

  /** Welch's two-sample t between every pair of event types on the
    * per-event value — the A/B readout layered on the same
    * exact-sufficient-statistics discipline as [[Behavior]]'s
    * `metric_correlations`: n as BIGINT, Σcents as BIGINT, Σcents²
    * as Decimal(38,0) (a 1e6-cent event squares past a Long), and
    * ONLY the final mean/variance/t/df arithmetic in floats — the
    * identical expression tree on identical integer inputs is
    * deterministic across engines.
    *
    * Shape: fact collapses to |types| sufficient-stat rows in one
    * map-side-combinable shuffle; the pairing is a broadcast
    * self-join on the |types|² triangle. Output ≤ |types|² rows.
    */
  def abWelchTtestTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val stats = events
      .select($"event_type", expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"cents").as("s1"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("s2"))
      // n >= 2 in BOTH engines: a single-sample type divides by (n-1)=0
      // and Spark (non-ANSI) yields NULL where DuckDB's IEEE mode yields
      // inf/NaN — excluding degenerate types identically keeps the
      // cross-engine rows equal by construction.
      .filter($"n" >= 2)
    val a = stats.select($"event_type".as("type_a"), $"n".as("na"),
      $"s1".as("s1a"), $"s2".as("s2a"))
    val b = stats.select($"event_type".as("type_b"), $"n".as("nb"),
      $"s1".as("s1b"), $"s2".as("s2b"))
    a.join(broadcast(b), $"type_a" < $"type_b")
      .select($"type_a", $"type_b", $"na", $"nb",
        // nullif on both pooled-variance denominators: two zero-variance
        // samples give 0/0, where Spark returns NULL but DuckDB's IEEE
        // mode returns NaN — nullif makes both engines emit NULL.
        expr("""round((CAST(s1a AS DOUBLE) / na - CAST(s1b AS DOUBLE) / nb) /
                nullif(sqrt((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / na) / (na - 1) / na +
                     (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / nb) / (nb - 1) / nb), 0), 4)""")
          .as("t_welch"),
        expr("""round(pow((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / na) / (na - 1) / na +
                          (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / nb) / (nb - 1) / nb, 2) /
                nullif(pow((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / na) / (na - 1) / na, 2) / (na - 1) +
                 pow((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / nb) / (nb - 1) / nb, 2) / (nb - 1), 0), 4)""")
          .as("df_welch"))
      .orderBy($"type_a", $"type_b")
  }

  def abWelchTtest(spark: SparkSession, dir: String): DataFrame =
    abWelchTtestTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[abWelchTtestTransform]]. */
  val abWelchTtestOracleSql: String =
    """WITH s AS (SELECT event_type, count(*) AS n,
      |                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
      |                  sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) * CAST(round(value * 100) AS BIGINT)) AS s2
      |           FROM events GROUP BY 1 HAVING count(*) >= 2)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |       CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb,
      |       round((CAST(a.s1 AS DOUBLE) / a.n - CAST(b.s1 AS DOUBLE) / b.n) /
      |             nullif(sqrt((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1) / a.n +
      |                  (CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / (b.n - 1) / b.n), 0), 4) AS t_welch,
      |       round(pow((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1) / a.n +
      |                 (CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / (b.n - 1) / b.n, 2) /
      |             nullif(pow((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1) / a.n, 2) / (a.n - 1) +
      |              pow((CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / (b.n - 1) / b.n, 2) / (b.n - 1), 0), 4) AS df_welch
      |FROM s a JOIN s b ON a.event_type < b.event_type
      |ORDER BY 1, 2""".stripMargin

  /** Winsorized & trimmed value stats per event type — the
    * outlier-robust mean pair next to [[boxplotStatsTransform]]'s
    * fences (a single mis-keyed 1e9-cent event moves the plain mean
    * for a month; the 5 %-winsorized mean barely notices): cut points
    * are exact ⌈p·n⌉-th order statistics (the rolling_p95 integer
    * discipline — no interpolation semantics to disagree on) under
    * the TOTAL order (cents, event_id); winsorizing clamps every
    * value into [q05, q95] BY VALUE (tie-robust); trimming keeps
    * ranks (k05, k95] only. All sums exact BIGINT cents; the two
    * means are final one-shot divisions rounded at 1e−4.
    *
    * Shape: one (type) shuffle for the rank windows (each type sorts
    * only its own rows — distributed by partition), cut points
    * broadcast back onto the same sorted basis, one
    * map-side-combinable rollup to |types| rows.
    */
  def winsorizedStatsTransform(events: DataFrame): DataFrame =
    winsorizedFromCounts(events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("cnt")))

  /** The winsorized/trimmed derivation over the COUNTING-SORT grid
    * `(event_type, cents, cnt)` — the boxplotFromCounts re-expression
    * applied here for the same two reasons: the fact collapses
    * map-side to value-cardinality rows (never a per-row rank over
    * the raw stream), and the streaming twin can keep the identical
    * grid as additive state and report through this exact tree.
    * Rank-range trimming becomes per-bucket overlap arithmetic:
    * a bucket covering ranks [cum−cnt+1, cum] contributes
    * `min(cum,k95) − max(cum−cnt,k05)` rows (clamped at 0) to the
    * (k05, k95] trim window — identical to the row-rank formulation
    * on the same multiset. */
  private[graft] def winsorizedFromCounts(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val byVal = Window.partitionBy($"event_type").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy($"event_type")
    val c = counts
      .withColumn("cum", sum($"cnt").over(byVal))
      .withColumn("n", sum($"cnt").over(whole))
      .withColumn("k05", expr("(n * 5 + 99) div 100"))
      .withColumn("k95", expr("(n * 95 + 99) div 100"))
    val cuts = c.groupBy($"event_type")
      .agg(first($"n").as("n"), first($"k05").as("k05"), first($"k95").as("k95"),
        min(when($"cum" >= $"k05", $"cents")).as("q05_cents"),
        min(when($"cum" >= $"k95", $"cents")).as("q95_cents"))
    val dec = "decimal(38,0)"
    counts
      .withColumn("cum", sum($"cnt").over(byVal))
      .join(broadcast(cuts), Seq("event_type"))
      .withColumn("tcnt",
        greatest(lit(0L), least($"cum", $"k95") - greatest($"cum" - $"cnt", $"k05")))
      .groupBy($"event_type")
      .agg(first($"n").as("n"),
        first($"q05_cents").as("q05_cents"),
        first($"q95_cents").as("q95_cents"),
        sum(least(greatest($"cents", $"q05_cents"), $"q95_cents").cast(dec) * $"cnt").as("wsum"),
        sum($"cents".cast(dec) * $"tcnt").as("tsum"),
        first($"k95" - $"k05").as("tn"))
      .select($"event_type", $"n", $"q05_cents", $"q95_cents",
        round($"wsum".cast("double") / $"n", 4).as("winsorized_mean_cents"),
        when($"tn" === 0L, lit(null).cast("double"))
          .otherwise(round($"tsum".cast("double") / $"tn", 4)).as("trimmed_mean_cents"))
      .orderBy($"event_type")
  }

  def winsorizedStats(spark: SparkSession, dir: String): DataFrame =
    winsorizedStatsTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[winsorizedStatsTransform]] — same total
    * order, same ⌈⌉ ranks, same integer clamps. */
  val winsorizedStatsOracleSql: String =
    """WITH b AS (SELECT event_type, event_id,
      |                  CAST(round(value * 100) AS BIGINT) AS cents
      |           FROM events),
      |r AS (SELECT event_type, event_id, cents,
      |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS BIGINT) AS rn,
      |             count(*) OVER (PARTITION BY event_type) AS n
      |      FROM b),
      |c AS (SELECT event_type, CAST(any_value(n) AS BIGINT) AS n,
      |             min(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS q05_cents,
      |             min(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS q95_cents
      |      FROM r GROUP BY 1)
      |SELECT r.event_type, c.n, c.q05_cents, c.q95_cents,
      |       round(CAST(sum(least(greatest(r.cents, c.q05_cents), c.q95_cents)) AS DOUBLE) / c.n, 4) AS winsorized_mean_cents,
      |       round(CAST(sum(CASE WHEN r.rn > (c.n * 5 + 99) // 100 AND r.rn <= (c.n * 95 + 99) // 100 THEN r.cents END) AS DOUBLE)
      |             / sum(CASE WHEN r.rn > (c.n * 5 + 99) // 100 AND r.rn <= (c.n * 95 + 99) // 100 THEN 1 ELSE 0 END), 4) AS trimmed_mean_cents
      |FROM r JOIN c ON r.event_type = c.event_type
      |GROUP BY r.event_type, c.n, c.q05_cents, c.q95_cents
      |ORDER BY r.event_type""".stripMargin

  /** Per-user revenue percentile — "what percentile is THIS account"
    * (support-tier routing, churn-risk weighting, the per-account
    * face of B30's aggregate whale curve): rank under the TOTAL
    * order (cents, user_id), percentile as exact truncating basis
    * points `rn·10⁴ div n` — no cume_dist float semantics to
    * disagree on — plus the user's exact cumulative revenue share in
    * bp.
    *
    * Shape: fact → one row per user (map-side combinable), then the
    * rank and running share are DISTRIBUTED via
    * [[GlobalRank.withGlobalOrder]]'s range-partitioned slice rank
    * (round-9 verdict task 1: |users| rows is data scale — an
    * unpartitioned window would put ~10⁹ rows through one task at
    * 100 TB); |users| rows out.
    */
  def userRevenuePercentileTransform(events: DataFrame): DataFrame =
    revenuePercentileFromUsers(events
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("user_id")).agg(sum(col("cents")).as("cents")))

  /** Report face over the per-user (user_id, cents) table — shared
    * by the batch operator and `stream_user_revenue_percentile`'s
    * additive cents state, so stream ≡ batch by code. */
  def revenuePercentileFromUsers(perUser: DataFrame): DataFrame =
    GlobalRank.withGlobalOrder(perUser, Seq(col("cents"), col("user_id")), Seq("cents"))
      .select(col("user_id"), col("cents"),
        col("grk").as("revenue_rank"),
        expr("grk * 10000 div n_total").as("percentile_bp"),
        expr("cum_cents * 10000 div total_cents").as("cum_share_bp"))
      .orderBy(col("user_id"))

  def userRevenuePercentile(spark: SparkSession, dir: String): DataFrame =
    userRevenuePercentileTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[userRevenuePercentileTransform]]. */
  val userRevenuePercentileOracleSql: String =
    """WITH u AS (SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |           FROM events GROUP BY 1),
      |r AS (SELECT user_id, cents,
      |             CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS rn,
      |             count(*) OVER () AS n,
      |             sum(cents) OVER (ORDER BY cents, user_id ROWS UNBOUNDED PRECEDING) AS cum,
      |             sum(cents) OVER () AS total
      |      FROM u)
      |SELECT user_id, cents, rn AS revenue_rank,
      |       CAST(rn * 10000 // n AS BIGINT) AS percentile_bp,
      |       CAST(cum * 10000 // total AS BIGINT) AS cum_share_bp
      |FROM r ORDER BY user_id""".stripMargin

  /** Item adoption profile — launch health per item: first-seen day
    * and what share of the item's lifetime engagement landed in its
    * first `earlyDays` days ("spike-and-die" vs "slow burn" — the
    * read a catalog team uses to separate launch-promo artifacts
    * from durable items). Exact integers: first day from a per-item
    * min, early share in truncating basis points.
    *
    * Shape: fact → (item, day) counts map-side, per-item min-day
    * window + conditional sums on the same item shuffle; |items|
    * rows out.
    */
  def itemAdoptionTransform(events: DataFrame, earlyDays: Int = 3): DataFrame =
    adoptionFromCounts(events
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
        date_trunc("day", col("ts")).as("day"))
      .filter(col("item").isNotNull)
      .groupBy(col("item"), col("day")).agg(count(lit(1)).as("n")), earlyDays)

  /** The adoption derivation over the additive `(item, day, n)` count
    * grid — shared with the streaming twin
    * ([[graft.streaming.ItemDayCountState]]); the first-seen day is a
    * min over the grid, so late micro-batches re-date it correctly. */
  private[graft] def adoptionFromCounts(counts0: DataFrame, earlyDays: Int = 3): DataFrame = {
    val spark = counts0.sparkSession
    import spark.implicits._
    val counts = counts0
    val w = Window.partitionBy($"item")
    counts
      .withColumn("first_day", min($"day").over(w))
      .groupBy($"item")
      .agg(first($"first_day").as("first_day"),
        sum(when(datediff($"day", $"first_day") < earlyDays, $"n").otherwise(0L))
          .as("n_early"),
        sum($"n").as("n_total"))
      .select($"item", $"first_day", $"n_early", $"n_total",
        expr("n_early * 10000 div n_total").as("early_share_bp"))
      .orderBy($"item")
  }

  def itemAdoption(spark: SparkSession, dir: String): DataFrame =
    itemAdoptionTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[itemAdoptionTransform]] (earlyDays = 3). */
  val itemAdoptionOracleSql: String =
    """WITH c AS (
      |  SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
      |         date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, count(*) AS n
      |  FROM events
      |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      |  GROUP BY 1, 2),
      |f AS (SELECT item, min(day) AS first_day FROM c GROUP BY 1)
      |SELECT c.item, f.first_day,
      |       CAST(sum(CASE WHEN date_diff('day', f.first_day, c.day) < 3 THEN c.n ELSE 0 END) AS BIGINT) AS n_early,
      |       CAST(sum(c.n) AS BIGINT) AS n_total,
      |       CAST(sum(CASE WHEN date_diff('day', f.first_day, c.day) < 3 THEN c.n ELSE 0 END) * 10000
      |            // sum(c.n) AS BIGINT) AS early_share_bp
      |FROM c JOIN f ON c.item = f.item
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** Session-level type AFFINITY: which event types co-occur inside
    * the same session, with lift — the within-visit face of
    * [[coEngagementTransform]]'s cross-visit item graph ("users who
    * error also purchase *in the same sitting*" is a product signal
    * the user-level overlap tables miss): sessions by the shared
    * gaps-and-islands collapse, distinct (session, type) presence,
    * pair counts and lift = n_ab·S / (n_a·n_b) as ONE float over
    * exact integers.
    *
    * Shape: one user_id shuffle for the session labels, a
    * per-session type-pair fan-out bounded by |types|²/2 per session
    * (≤ 10 rows at 5 types — NOT fact-scale), session-key equi-joins
    * throughout, |types|²/2 rows out. */
  def sessionTypeAffinityTransform(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val st = events.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("new_session",
        when(unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))
               > gapMinutes * 60L * 1000000L, 1L)
          .when(lag($"ts", 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum($"new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"user_id", $"session_seq", $"event_type")
      .distinct()
    affinityFromPresence(st)
  }

  /** The affinity rollup from distinct (user_id, session_seq,
    * event_type) presence rows — shared with the streaming face,
    * which feeds it the union of its closed-session count tables and
    * its open-session frontiers re-expressed as presence. */
  private[graft] def affinityFromPresence(st0: DataFrame): DataFrame = {
    val spark = st0.sparkSession
    import spark.implicits._
    val st = st0
    val total = st.select($"user_id", $"session_seq").distinct()
      .agg(count(lit(1)).as("s_total"))
    val perType = st.groupBy($"event_type").agg(count(lit(1)).as("n_t"))
    val a = st.select($"user_id", $"session_seq", $"event_type".as("type_a"))
    val b = st.select($"user_id", $"session_seq", $"event_type".as("type_b"))
    a.join(b, Seq("user_id", "session_seq")).filter($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n_both"))
      .join(perType.withColumnsRenamed(Map("event_type" -> "type_a", "n_t" -> "n_a")), Seq("type_a"))
      .join(perType.withColumnsRenamed(Map("event_type" -> "type_b", "n_t" -> "n_b")), Seq("type_b"))
      .crossJoin(broadcast(total))
      .select($"type_a", $"type_b", $"n_both", $"n_a", $"n_b",
        expr("round(CAST(n_both AS DOUBLE) * s_total / (CAST(n_a AS DOUBLE) * n_b), 6)")
          .as("lift"))
      .orderBy($"type_a", $"type_b")
  }

  def sessionTypeAffinity(spark: SparkSession, dir: String): DataFrame =
    sessionTypeAffinityTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[sessionTypeAffinityTransform]] (gap 30m). */
  val sessionTypeAffinityOracleSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
      |f AS (SELECT user_id, ts, event_id, event_type,
      |             CASE WHEN lag(ts) OVER w IS NULL THEN 1
      |                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000 THEN 1
      |                  ELSE 0 END AS new_session
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (SELECT user_id, event_type,
      |             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      |      FROM f),
      |st AS (SELECT DISTINCT user_id, session_seq, event_type FROM g),
      |tot AS (SELECT count(*) AS s_total FROM (SELECT DISTINCT user_id, session_seq FROM st)),
      |pt AS (SELECT event_type, count(*) AS n_t FROM st GROUP BY 1),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
      |      FROM st a JOIN st b ON a.user_id = b.user_id AND a.session_seq = b.session_seq
      |                         AND a.event_type < b.event_type
      |      GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, p.n_both,
      |       pa.n_t AS n_a, pb.n_t AS n_b,
      |       round(CAST(p.n_both AS DOUBLE) * tot.s_total / (CAST(pa.n_t AS DOUBLE) * pb.n_t), 6) AS lift
      |FROM p JOIN pt pa ON pa.event_type = p.type_a
      |       JOIN pt pb ON pb.event_type = p.type_b
      |CROSS JOIN tot ORDER BY 1, 2""".stripMargin

  /** Engagement-DIVERSITY histogram: per-user entropy of the
    * event-type mix, bucketed — "how many users are one-trick vs
    * broad" (a recommender's exploration health metric; the per-USER
    * face of [[graft.operators.Stats.transitionEntropyTransform]]'s
    * per-state entropy): H(u) = log2(n_u) − Σ_t c·log2(c) / n_u over
    * the user's per-type counts, each n·log2(n) term one float on an
    * exact integer rounded to the 1e-6 grid and summed EXACTLY as
    * DECIMAL(20,6) (order-free), H rounded to 1e-6 and bucketed at
    * width ¼ bit by integer floor — identical doubles in both
    * engines, so the bucket boundary cannot disagree.
    *
    * Shape: (user, type) counts map-side, per-user rollup on the
    * same user_id shuffle, |buckets| ≤ 4·log2(|types|)+1 rows out. */
  def userTypeEntropyTransform(events: DataFrame): DataFrame =
    entropyFromUserTypeCounts(events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c")))

  /** The histogram rollup from an already-aggregated (user_id,
    * event_type, c) table — the streaming face's additive state. */
  private[graft] def entropyFromUserTypeCounts(counts: DataFrame): DataFrame = counts
    .select(col("user_id"), col("c"),
      expr("CAST(round(c * log2(c), 6) AS DECIMAL(20,6))").as("clogc"))
    .groupBy(col("user_id"))
    .agg(sum(col("c")).as("n"), sum(col("clogc")).as("scl"))
    .select(expr("CAST(floor(round(log2(n) - CAST(scl AS DOUBLE) / n + 0.0, 6) * 4) AS BIGINT)")
      .as("h_bucket_x4"))
    .groupBy(col("h_bucket_x4"))
    .agg(count(lit(1)).as("n_users"))
    .orderBy(col("h_bucket_x4"))

  def userTypeEntropy(spark: SparkSession, dir: String): DataFrame =
    userTypeEntropyTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[userTypeEntropyTransform]]. */
  val userTypeEntropyOracleSql: String =
    """WITH c AS (SELECT user_id, event_type, count(*) AS c
      |           FROM events GROUP BY 1, 2),
      |u AS (SELECT user_id, sum(c) AS n,
      |             sum(CAST(round(c * log2(c), 6) AS DECIMAL(20,6))) AS scl
      |      FROM c GROUP BY 1),
      |h AS (SELECT CAST(floor(round(log2(n) - CAST(scl AS DOUBLE) / n + 0.0, 6) * 4) AS BIGINT)
      |               AS h_bucket_x4
      |      FROM u)
      |SELECT h_bucket_x4, count(*) AS n_users
      |FROM h GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bot/scripted-traffic burst screen — the rate-based heuristic
    * every engagement pipeline runs before trusting its own counts
    * (a scraper firing 30 requests in one minute poisons the DAU,
    * funnel, and leaderboard families upstream of it): per user, the
    * minute-bucket activity profile — total events, distinct ACTIVE
    * minutes, the single busiest minute — and a pure-integer flag
    * (peak ≥ 10 events in one minute, OR a sustained 5+ events per
    * active minute, cross-multiplied so no rate float ever decides).
    * The report is the top-20 burstiest accounts (peak DESC, total
    * DESC, user_id — unique tie-break) with the flag attached, so
    * the output is useful review queue, not an empty table when the
    * corpus is organic.
    *
    * Shape: one map-side-combinable (user, minute) collapse, a
    * per-user rollup on the same user_id shuffle, then a global
    * top-20 via TakeOrderedAndProject (sort pushed to partial
    * per-partition top-k — no global sort, no window). */
  def botBurstScreenTransform(events: DataFrame, topK: Int = 20): DataFrame =
    botFromMinutes(events
      .select(col("user_id"), date_trunc("minute", col("ts")).as("minute"))
      .groupBy(col("user_id"), col("minute")).agg(count(lit(1)).as("n")), topK)

  /** The screen rollup from an already-aggregated (user_id, minute,
    * n) table — shared with the streaming face, whose additive
    * minute-grid state this is exactly. */
  private[graft] def botFromMinutes(perMinute: DataFrame, topK: Int = 20): DataFrame =
    perMinute.groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("active_minutes"),
        max(col("n")).as("peak_minute_events"))
      .select(col("user_id"), col("n_events"), col("active_minutes"),
        col("peak_minute_events"),
        (col("peak_minute_events") >= 10 ||
          col("n_events") >= col("active_minutes") * 5).as("flagged"))
      .orderBy(col("peak_minute_events").desc, col("n_events").desc,
        col("user_id"))
      .limit(topK)

  def botBurstScreen(spark: SparkSession, dir: String): DataFrame =
    botBurstScreenTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[botBurstScreenTransform]] (topK = 20). */
  val botBurstScreenOracleSql: String =
    """WITH m AS (SELECT user_id, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |u AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
      |             count(*) AS active_minutes,
      |             CAST(max(n) AS BIGINT) AS peak_minute_events
      |      FROM m GROUP BY 1)
      |SELECT user_id, n_events, active_minutes, peak_minute_events,
      |       (peak_minute_events >= 10 OR n_events >= active_minutes * 5) AS flagged
      |FROM u
      |ORDER BY peak_minute_events DESC, n_events DESC, user_id
      |LIMIT 20""".stripMargin

  /** Decile lift table — the campaign-analytics evaluation read that
    * sits downstream of every scoring model here ([[CorpusQa
    * .nbLangClassifierTransform]]'s confusion matrix evaluates a
    * classifier; this evaluates a RANKING): users ranked by an
    * engagement score (non-purchase event count — the propensity
    * proxy a reference deployment would replace with a model score),
    * cut into 10 equal-depth deciles, each reporting its conversion
    * rate against the base rate as a lift multiple. A useful model
    * front-loads converters into decile 1; lift ≈ 1 everywhere means
    * the score carries no signal.
    *
    * Determinism: decile boundaries come from the global rank under
    * (score DESC, user_id) — the integer tie-break the sampling
    * family uses — and decile_d = (rank−1)·10 DIV N (Spark's
    * integral division, matching the oracle's `//` exactly); lift =
    * c_d·N / (n_d·C) is a ratio of exact integers divided once.
    * Shape: one user-level aggregate, then the rank is DISTRIBUTED —
    * [[GlobalRank.withGlobalOrder]]'s range-partitioned slice rank
    * (round-9 verdict task 1: the per-user table is |users| rows —
    * data scale, ~10⁹ at 100 TB — so an unpartitioned window here
    * would funnel it through one task); a 10-row output. */
  def decileLiftTransform(events: DataFrame): DataFrame =
    decileFromUsers(events.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted")))

  /** The decile derivation over the per-user (score, converted)
    * aggregate — shared with the streaming twin
    * ([[graft.streaming.UserScoreState]]), whose additive per-user
    * state is exactly this input (score sums, converted maxes across
    * micro-batches). */
  private[graft] def decileFromUsers(users: DataFrame): DataFrame = {
    val spark = users.sparkSession
    import spark.implicits._
    val ranked = GlobalRank.withGlobalOrder(users, Seq($"score".desc, $"user_id"))
      .withColumn("decile", expr("(grk - 1) * 10 div n_total") + 1L)
    val tot = users.agg(count(lit(1)).as("nt"), sum($"converted").as("ct"))
    ranked.groupBy($"decile")
      .agg(count(lit(1)).as("n_users"), sum($"converted").as("n_converters"))
      .join(broadcast(tot)) // 1-row build side
      .select($"decile", $"n_users", $"n_converters",
        expr("round(CAST(n_converters AS DOUBLE) / n_users, 6)").as("conv_rate"),
        expr("""CASE WHEN ct > 0 THEN
               |  round(CAST(n_converters AS DOUBLE) * nt / (CAST(n_users AS DOUBLE) * ct), 6)
               |END""".stripMargin).as("lift"))
      .orderBy($"decile")
  }

  def decileLift(spark: SparkSession, dir: String): DataFrame =
    decileLiftTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[decileLiftTransform]]. */
  val decileLiftOracleSql: String =
    """WITH users AS (SELECT user_id,
      |                      sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS score,
      |                      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      |               FROM events GROUP BY 1),
      |ranked AS (SELECT converted,
      |                  (row_number() OVER (ORDER BY score DESC, user_id) - 1) * 10
      |                    // (SELECT count(*) FROM users) + 1 AS decile
      |           FROM users),
      |tot AS (SELECT count(*) AS nt, sum(converted) AS ct FROM users)
      |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_users,
      |       CAST(sum(converted) AS BIGINT) AS n_converters,
      |       round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conv_rate,
      |       CASE WHEN tot.ct > 0 THEN
      |         round(CAST(sum(converted) AS DOUBLE) * tot.nt
      |               / (CAST(count(*) AS DOUBLE) * tot.ct), 6) END AS lift
      |FROM ranked, tot GROUP BY decile, tot.nt, tot.ct ORDER BY 1""".stripMargin
}
