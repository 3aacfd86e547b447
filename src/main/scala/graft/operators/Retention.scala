package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Retention and load-profile analytics over the engagement stream —
  * the two ops an operator-of-the-product asks for right after
  * [[Engagement]]'s classic cohort grid: "do users COME BACK at all"
  * (rolling retention — day-N-or-later, robust to the exact-day
  * sparsity that makes classic N-day retention jagged) and "what is
  * peak simultaneous load" (interval-stabbing concurrency from the
  * sessionized stream — the capacity-planning number).
  */
object Retention {

  /** Rolling retention per signup cohort: a user counts as retained
    * at N if they were active on ANY day ≥ cohort + N. Collapses the
    * fact to one (cohort, last_day) row per user (two
    * map-side-combinable aggregates, one user_id shuffle), so the
    * cohort report reads a users-sized table — never the raw stream.
    * All counts exact BIGINTs. */
  def rollingRetentionTransform(events: DataFrame): DataFrame =
    reportFromUsers(
      events.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort"), max(col("day")).as("last_day")))

  /** The cohort report over a `(user_id, cohort, last_day)` table —
    * shared by the batch collapse above and the streaming span state
    * ([[graft.streaming.UserSpanState]]), so stream/batch parity is
    * by shared derivation. */
  private[graft] def reportFromUsers(u: DataFrame): DataFrame = {
    def retained(n: Int) =
      sum(when(datediff(col("last_day"), col("cohort")) >= n, 1L).otherwise(0L))
    u.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"),
        retained(1).as("retained_1d"),
        retained(7).as("retained_7d"),
        retained(14).as("retained_14d"))
      .orderBy(col("cohort"))
  }

  def rollingRetention(spark: SparkSession, dir: String): DataFrame =
    rollingRetentionTransform(Tables.events(spark, dir))

  /** Oracle for [[rollingRetentionTransform]]. */
  val rollingRetentionOracleSql: String =
    """WITH e AS (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
      |u AS (SELECT user_id, min(day) AS cohort, max(day) AS last_day FROM e GROUP BY 1)
      |SELECT cohort, CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(sum(CASE WHEN datediff('day', cohort, last_day) >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS retained_1d,
      |       CAST(sum(CASE WHEN datediff('day', cohort, last_day) >= 7 THEN 1 ELSE 0 END) AS BIGINT) AS retained_7d,
      |       CAST(sum(CASE WHEN datediff('day', cohort, last_day) >= 14 THEN 1 ELSE 0 END) AS BIGINT) AS retained_14d
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  /** Peak concurrent sessions per day (interval stabbing): sessions
    * are the 30-minute-gap islands of [[Engagement.eventsSessionized]]
    * collapsed to `[start, end]` intervals, each contributing a `+1`
    * boundary at its start and a `−1` at `end + 1 µs`; the running
    * boundary sum's maximum is the day's peak simultaneous sessions.
    * A session is accounted to its START day (30-min-gap sessions
    * virtually never span midnight; a clamping variant would split
    * the interval at day boundaries).
    *
    * Scale shape: the session collapse is the shared
    * gaps-and-islands pass (one user_id shuffle); boundaries then
    * partition by DAY, so the running sum never needs a global
    * single-partition sort — the per-day boundary count is
    * 2·sessions-per-day. The day peak is tie-order-independent:
    * closes sort before opens at equal timestamps, and within a
    * same-signed tie group the running extremum lands at the group
    * edge, so both engines agree without a total row order. */
  def peakConcurrencyTransform(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    peakFromSessions(sessionIntervals(events, gapMinutes))

  /** The gaps-and-islands session collapse to `(user_id, s_ts, e_ts)`
    * intervals — shared BY CONSTRUCTION with the streaming twin's
    * per-batch pass ([[graft.streaming.PeakSessionState]]), which
    * stitches the batch-boundary session through its per-user open
    * frontier. */
  private[graft] def sessionIntervals(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("new_session",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
               > gapMinutes * 60L * 1000000L, 1L)
          .when(lag(col("ts"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("s_ts"), max(col("ts")).as("e_ts"))
      .select(col("user_id"), col("s_ts"), col("e_ts"))
  }

  /** Interval table → per-day peak — the read-time face the streaming
    * twin derives over closed-∪-open session state. */
  private[graft] def peakFromSessions(sess: DataFrame): DataFrame = {
    val bounds = sess
      .select(date_trunc("day", col("s_ts")).as("day"), col("s_ts").as("bts"),
        lit(1L).as("delta"))
      .unionByName(sess.select(date_trunc("day", col("s_ts")).as("day"),
        (col("e_ts") + expr("INTERVAL 1 MICROSECOND")).as("bts"), lit(-1L).as("delta")))
    val wd = Window.partitionBy(col("day")).orderBy(col("bts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, 0)
    bounds.withColumn("conc", sum(col("delta")).over(wd))
      .groupBy(col("day"))
      .agg(max(col("conc")).as("peak_concurrent"),
        expr("count(1) div 2").as("n_sessions"))
      .orderBy(col("day"))
  }

  def peakConcurrency(spark: SparkSession, dir: String): DataFrame =
    peakConcurrencyTransform(Tables.events(spark, dir))

  /** Session-duration histogram in power-of-two second buckets — the
    * engagement-depth profile next to [[peakConcurrencyTransform]]'s
    * capacity peak (both read the SAME gaps-and-islands interval
    * table; single-event sessions land in bucket 0 as 0-second
    * durations): `⌊log₂(dur+1)⌋` exact at every power-of-two
    * boundary (the interevent_histogram discipline), closed integer
    * bounds, ≤ ~30 rows at any scale.
    *
    * Shape: one user_id shuffle for the session collapse, then a
    * map-side-combinable bucket count. */
  def sessionDurationTransform(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    durationsFromSessions(sessionIntervals(events, gapMinutes))

  /** Interval table → duration histogram — the second read-time face
    * the streaming twin ([[graft.streaming.PeakSessionState]])
    * derives over its closed-∪-open session state. */
  private[graft] def durationsFromSessions(sess: DataFrame): DataFrame =
    sess
      .select(expr("(unix_micros(e_ts) - unix_micros(s_ts)) div 1000000").as("dur_s"))
      .select(expr("CAST(floor(log2(dur_s + 1)) AS BIGINT)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"))
      .select(col("bucket"),
        expr("CAST(pow(2, bucket) AS BIGINT) - 1").as("dur_lo_s"),
        expr("CAST(pow(2, bucket + 1) AS BIGINT) - 2").as("dur_hi_s"),
        col("n_sessions"))
      .orderBy(col("bucket"))

  def sessionDuration(spark: SparkSession, dir: String): DataFrame =
    sessionDurationTransform(Tables.events(spark, dir))

  /** Sessions-per-user histogram in power-of-two buckets — the
    * visit-frequency profile that closes the session triple (B41
    * peak concurrency = capacity, B53 durations = depth, this =
    * frequency): per user the session count from the SAME
    * gaps-and-islands collapse, then the bucket rollup with closed
    * integer bounds. One user_id shuffle + two map-side-combinable
    * aggregates; ≤ ~30 rows at any scale. */
  def sessionsPerUserTransform(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionsHistFromK(sessionIntervals(events, gapMinutes)
      .groupBy(col("user_id")).agg(count(lit(1)).as("k")))

  /** The power-of-two histogram from a per-user (user_id, k) session
    * count — shared with the streaming session-count state. */
  private[graft] def sessionsHistFromK(k: DataFrame): DataFrame = k
      .select(expr("CAST(floor(log2(k)) AS BIGINT)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("bucket"),
        expr("CAST(pow(2, bucket) AS BIGINT)").as("sessions_lo"),
        expr("CAST(pow(2, bucket + 1) AS BIGINT) - 1").as("sessions_hi"),
        col("n_users"))
      .orderBy(col("bucket"))

  def sessionsPerUser(spark: SparkSession, dir: String): DataFrame =
    sessionsPerUserTransform(Tables.events(spark, dir))

  /** Oracle for [[sessionsPerUserTransform]]. */
  def sessionsPerUserOracleSql(gapMinutes: Int = 30): String =
    s"""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |f AS (SELECT user_id, event_id, ts,
       |             CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > $gapMinutes * 60 * 1000000 THEN 1
       |                  ELSE 0 END AS new_session
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |k AS (SELECT user_id, CAST(sum(new_session) AS BIGINT) AS k FROM f GROUP BY 1),
       |b AS (SELECT CAST(floor(log2(k)) AS BIGINT) AS bucket FROM k)
       |SELECT bucket,
       |       CAST(pow(2, bucket) AS BIGINT) AS sessions_lo,
       |       CAST(pow(2, bucket + 1) AS BIGINT) - 1 AS sessions_hi,
       |       count(*) AS n_users
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle for [[sessionDurationTransform]]. */
  def sessionDurationOracleSql(gapMinutes: Int = 30): String =
    s"""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |f AS (SELECT user_id, event_id, ts,
       |             CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > $gapMinutes * 60 * 1000000 THEN 1
       |                  ELSE 0 END AS new_session
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |g AS (SELECT user_id, ts,
       |             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                    ROWS UNBOUNDED PRECEDING) AS session_seq
       |      FROM f),
       |s AS (SELECT user_id, session_seq, min(ts) AS s_ts, max(ts) AS e_ts
       |      FROM g GROUP BY 1, 2),
       |b AS (SELECT CAST(floor(log2((epoch_us(e_ts) - epoch_us(s_ts)) // 1000000 + 1)) AS BIGINT) AS bucket
       |      FROM s)
       |SELECT bucket,
       |       CAST(pow(2, bucket) AS BIGINT) - 1 AS dur_lo_s,
       |       CAST(pow(2, bucket + 1) AS BIGINT) - 2 AS dur_hi_s,
       |       count(*) AS n_sessions
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle for [[peakConcurrencyTransform]]. */
  def peakConcurrencyOracleSql(gapMinutes: Int = 30): String =
    s"""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |f AS (SELECT user_id, event_id, ts,
       |             CASE WHEN lag(ts) OVER w IS NULL THEN 1
       |                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > $gapMinutes * 60 * 1000000 THEN 1
       |                  ELSE 0 END AS new_session
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |g AS (SELECT user_id, ts,
       |             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                    ROWS UNBOUNDED PRECEDING) AS session_seq
       |      FROM f),
       |s AS (SELECT user_id, session_seq, min(ts) AS s_ts, max(ts) AS e_ts
       |      FROM g GROUP BY 1, 2),
       |b AS (SELECT date_trunc('day', s_ts) AS day, s_ts AS bts, 1 AS delta FROM s
       |      UNION ALL
       |      SELECT date_trunc('day', s_ts), e_ts + INTERVAL 1 MICROSECOND, -1 FROM s),
       |c AS (SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY bts, delta
       |                                   ROWS UNBOUNDED PRECEDING) AS conc
       |      FROM b)
       |SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrent,
       |       CAST(count(*) // 2 AS BIGINT) AS n_sessions
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Capture–recapture audience estimate (Chapman 1951) — "how many
    * users does this product REALLY have" when any one window only
    * samples them: the observed corpus is split at its calendar
    * midpoint, the two halves play capture and recapture, and
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 estimates the full population from
    * the overlap (few repeat users ⇒ the halves sample a much bigger
    * pool). The TRUE distinct count rides along, so the output is
    * self-evaluating — the estimator's bias on this corpus is visible
    * in the row itself (panels/telemetry use this when the true count
    * is unknowable).
    *
    * Membership is pure integer logic on the per-user span: active in
    * the first half ⟺ first_day index < span div 2, in the second ⟺
    * last_day index ≥ span div 2 — so the (user, first, last) span
    * table ([[graft.streaming.UserSpanState]]'s exact state) is the
    * sufficient statistic, and the streaming face is a pure read. */
  def captureRecaptureTransform(events: DataFrame): DataFrame =
    captureFromUsers(
      events.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort"), max(col("day")).as("last_day")))

  /** The Chapman estimate from the `(user_id, cohort, last_day)`
    * span table — the SECOND face of the streaming span state. */
  private[graft] def captureFromUsers(u: DataFrame): DataFrame = {
    val spark = u.sparkSession
    import spark.implicits._
    val bounds = u.agg(min($"cohort").as("lo"), max($"last_day").as("hi"))
    u.crossJoin(broadcast(bounds))
      .select(
        expr("datediff(cohort, lo) < (datediff(hi, lo) + 1) div 2").as("seen_a"),
        expr("datediff(last_day, lo) >= (datediff(hi, lo) + 1) div 2").as("seen_b"))
      .agg(count(lit(1)).as("n_users_true"),
        sum(when($"seen_a", 1L).otherwise(0L)).as("n_first_half"),
        sum(when($"seen_b", 1L).otherwise(0L)).as("n_second_half"),
        sum(when($"seen_a" && $"seen_b", 1L).otherwise(0L)).as("n_both"))
      .select($"n_users_true", $"n_first_half", $"n_second_half", $"n_both",
        expr("""round(CAST(n_first_half + 1 AS DOUBLE) * (n_second_half + 1)
               |      / (n_both + 1) - 1, 6)""".stripMargin).as("chapman_estimate"),
        expr("""CASE WHEN n_both > 0 THEN
               |  round(CAST(n_first_half AS DOUBLE) * n_second_half / n_both, 6)
               |END""".stripMargin).as("lincoln_estimate"))
  }

  def captureRecapture(spark: SparkSession, dir: String): DataFrame =
    captureRecaptureTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[captureRecaptureTransform]]. */
  val captureRecaptureOracleSql: String =
    """WITH u AS (SELECT user_id,
      |                  min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS cohort,
      |                  max(date_trunc('day', CAST(ts AS TIMESTAMP))) AS last_day
      |           FROM events GROUP BY 1),
      |b AS (SELECT min(cohort) AS lo, max(last_day) AS hi FROM u),
      |s AS (SELECT date_diff('day', b.lo, u.cohort) <
      |               (date_diff('day', b.lo, b.hi) + 1) // 2 AS seen_a,
      |             date_diff('day', b.lo, u.last_day) >=
      |               (date_diff('day', b.lo, b.hi) + 1) // 2 AS seen_b
      |      FROM u CROSS JOIN b),
      |c AS (SELECT count(*) AS n_users_true,
      |             CAST(sum(CASE WHEN seen_a THEN 1 ELSE 0 END) AS BIGINT) AS n_first_half,
      |             CAST(sum(CASE WHEN seen_b THEN 1 ELSE 0 END) AS BIGINT) AS n_second_half,
      |             CAST(sum(CASE WHEN seen_a AND seen_b THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      |      FROM s)
      |SELECT n_users_true, n_first_half, n_second_half, n_both,
      |       round(CAST(n_first_half + 1 AS DOUBLE) * (n_second_half + 1)
      |             / (n_both + 1) - 1, 6) AS chapman_estimate,
      |       CASE WHEN n_both > 0 THEN
      |         round(CAST(n_first_half AS DOUBLE) * n_second_half / n_both, 6)
      |       END AS lincoln_estimate
      |FROM c""".stripMargin
}
