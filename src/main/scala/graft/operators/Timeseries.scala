package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Serial-structure diagnostics over the daily engagement series —
  * the three reads a forecasting/anomaly stack asks for after the
  * smoothed line ([[Behavior.ewmaDailyTransform]]) and the
  * changepoint date ([[Behavior.changepointCusumTransform]]):
  * "how self-similar is the series" (autocorrelation), "do volume
  * and revenue move together THIS week" (rolling correlation), and
  * "how long until a viewer converts, counting the ones who never
  * did" (Kaplan–Meier survival — the censoring-aware answer the
  * plain conversion-lag mean gets wrong).
  *
  * Exactness discipline (the B21/B29 pattern): every sufficient
  * statistic is an exact integer/Decimal(38,0) sum — cross-multiplied
  * so no fractional mean ever enters a sum — and floats appear only
  * in a final expression over exact integers, which two engines
  * evaluate to the same correctly-rounded double.
  */
object Timeseries {

  /** Autocorrelation of the daily event-count series per event type,
    * lags 1..`maxLag` — the "is there weekly structure / how fast does
    * the series forget" read that decides seasonal-naive vs flat
    * baselines before any forecast is attempted.
    *
    * r_k = Σ_t (x_t−x̄)(x_{t−k}−x̄) / Σ_t (x_t−x̄)² over the
    * ZERO-FILLED calendar (a missing day is a real 0, not a skipped
    * lag — LAG over sparse days would silently compare non-adjacent
    * days). Cross-multiplying by n² makes both sums exact:
    * num_k·n² = Σ (n·x_t−S)(n·x_{t−k}−S), den·n² = Σ (n·x_t−S)²
    * with S = Σx — Decimal(38,0) products (n·x reaches ~1e12 at
    * fleet scale; its square passes a Long), one float division per
    * (type, lag), rounded.
    *
    * Shape: fact → (type, day) counts in one map-side-combinable
    * shuffle; the lag pairing is an equi-join on (type, day) against
    * the lag-shifted grid (grid×maxLag rows — planning scale); the
    * one-row-per-type stats table broadcasts back. Never fact-scale
    * past the first aggregate.
    */
  def acfDailyTransform(events: DataFrame, maxLag: Int = 7): DataFrame =
    acfFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x")), maxLag)

  /** The ACF derivation over an already-aggregated `(event_type, day,
    * x)` count table — split out so the streaming twin
    * ([[graft.streaming.TypeDailyCountState]]) maintains the daily
    * counts as additive state and derives the correlogram through
    * this identical expression tree (the ewmaFromDaily parity
    * pattern). */
  private[graft] def acfFromDaily(daily0: DataFrame, maxLag: Int = 7): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"x", lit(0L)).as("x"))
    // per-type n and S broadcast back (|types| rows), then the exact
    // centered square for the lag-independent denominator
    val stats = grid.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val centered = grid.join(broadcast(stats), Seq("event_type"))
      .select($"event_type", $"day", $"n", $"s",
        expr("CAST(n * x - s AS DECIMAL(38,0))").as("c"))
    val den = centered.groupBy($"event_type")
      .agg(sum($"c" * $"c").as("den"), first($"n").as("n_days"))
    // lag fan-out via a generator (not a small-table cross join — a
    // 7-row BNLJ build side would be flagged by the plan audit; the
    // generator keeps the fan-out inside whole-stage codegen)
    val pairs = centered
      .withColumn("lag", explode(expr(s"sequence(1, $maxLag)")))
      .select($"event_type", $"lag", expr("day - make_interval(0, 0, 0, lag)").as("day"),
        $"c".as("c_t"))
      .join(centered.select($"event_type", $"day", $"c".as("c_lag")),
        Seq("event_type", "day"))
      .groupBy($"event_type", $"lag")
      .agg(sum($"c_t" * $"c_lag").as("num"))
    // a CONSTANT series has zero variance — NaN would round-trip
    // differently through the two engines' hashing, NULL is identical
    pairs.join(broadcast(den), Seq("event_type"))
      .select($"event_type", $"lag".cast("long").as("lag"), $"n_days",
        round($"num".cast("double") /
          expr("CAST(nullif(den, CAST(0 AS DECIMAL(38,0))) AS DOUBLE)"), 6).as("acf"))
      .orderBy($"event_type", $"lag")
  }

  def acfDaily(spark: SparkSession, dir: String): DataFrame =
    acfDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[acfDailyTransform]] (maxLag = 7). */
  val acfDailyOracleSql: String =
    """WITH d AS (
      |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |         count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |grid AS (SELECT t.event_type, s.day, CAST(coalesce(d.x, 0) AS BIGINT) AS x
      |         FROM (SELECT DISTINCT event_type FROM d) t
      |         CROSS JOIN spine s
      |         LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |st AS (SELECT event_type, count(*) AS n, sum(x) AS s FROM grid GROUP BY 1),
      |c AS (SELECT g.event_type, g.day, st.n,
      |             CAST(st.n * g.x - st.s AS HUGEINT) AS c
      |      FROM grid g JOIN st ON g.event_type = st.event_type),
      |den AS (SELECT event_type, sum(c * c) AS den, CAST(any_value(n) AS BIGINT) AS n_days
      |        FROM c GROUP BY 1),
      |num AS (SELECT a.event_type, l.lag, sum(a.c * b.c) AS num
      |        FROM c a
      |        CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l
      |        JOIN c b ON b.event_type = a.event_type
      |               AND b.day = a.day - to_days(CAST(l.lag AS INTEGER))
      |        GROUP BY 1, 2)
      |SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag, d.n_days,
      |       round(CAST(n.num AS DOUBLE) / CAST(nullif(d.den, 0) AS DOUBLE), 6) AS acf
      |FROM num n JOIN den d ON n.event_type = d.event_type
      |ORDER BY n.event_type, n.lag""".stripMargin

  /** Ljung–Box portmanteau statistic over the first 7 daily-count
    * autocorrelations per type — "is there ANY autocorrelation at
    * all", the single-number significance readout over
    * [[acfFromDaily]]'s per-lag view: Q = n(n+2)·Σ_k ρ_k²/(n−k),
    * with each term computed from the ALREADY-1e-6-ROUNDED ρ_k (so
    * both engines square identical doubles), rounded to the 1e-10
    * grid and summed EXACTLY as DECIMAL(24,10) (order-free — the
    * cramers_v discipline), then ONE final multiply-and-round.
    * Constant series (ρ NULL) drop their terms identically.
    */
  def ljungBoxDailyTransform(events: DataFrame): DataFrame =
    ljungBoxFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x")))

  /** The Q derivation over the (event_type, day, x) grid — the
    * EIGHTH face of [[graft.streaming.TypeDailyCountState]] (it
    * reads straight through [[acfFromDaily]]). */
  private[graft] def ljungBoxFromDaily(daily0: DataFrame, maxLag: Int = 7): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    acfFromDaily(daily0, maxLag)
      .filter($"acf".isNotNull)
      .select($"event_type", $"n_days", $"lag",
        expr("CAST(round(acf * acf / (n_days - lag), 10) AS DECIMAL(24,10))").as("t"))
      .groupBy($"event_type")
      .agg(first($"n_days").as("n_days"), count(lit(1)).as("k_lags"),
        sum($"t").as("st"))
      .select($"event_type", $"n_days", $"k_lags",
        expr("round(n_days * (n_days + 2) * CAST(st AS DOUBLE), 4)").as("ljung_box_q"))
      .orderBy($"event_type")
  }

  def ljungBoxDaily(spark: SparkSession, dir: String): DataFrame =
    ljungBoxDailyTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[ljungBoxDailyTransform]] — the acf oracle
    * as a subquery + the exact-decimal portmanteau rollup. */
  val ljungBoxDailyOracleSql: String =
    s"""WITH acf_out AS (
       |${acfDailyOracleSql.linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
       |       count(*) AS k_lags,
       |       round(max(n_days) * (max(n_days) + 2) *
       |             CAST(sum(CAST(round(acf * acf / (n_days - lag), 10) AS DECIMAL(24,10))) AS DOUBLE), 4)
       |         AS ljung_box_q
       |FROM acf_out WHERE acf IS NOT NULL
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** 7-day rolling Pearson correlation between daily event volume and
    * daily revenue — "are we monetizing the traffic we got THIS week",
    * the windowed face of [[Behavior.metricCorrelationsTransform]]'s
    * whole-corpus r (a launch that brings clicks but no purchases
    * shows here a month before it moves the global number).
    *
    * Per window: r = (mΣxy−ΣxΣy)/√((mΣx²−(Σx)²)(mΣy²−(Σy)²)) with x
    * = day's event count, y = day's cents, every Σ an exact
    * Decimal(38,0) window sum over the ZERO-FILLED spine (so the ROWS
    * frame is exactly the trailing 7 calendar days), m the in-window
    * day count (< 7 only in the series head); zero-variance windows
    * yield NULL through an integer `nullif`, identically in both
    * engines. Floats only in the final per-row expression.
    *
    * Shape: fact → |days| rows in one map-side-combinable shuffle;
    * the rolling frame is an unpartitioned ROWS window over the
    * day-scale aggregate (planning-scale by the plan-audit rule; the
    * 100 TB variant partitions by coarse date bucket and stitches the
    * 6-row seam, or rides the 19 slice-locate pattern).
    */
  def rollingCorrDailyTransform(events: DataFrame, windowDays: Int = 7): DataFrame =
    corrFromDaily(events
      .select(date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("x"), sum(col("cents")).as("y")), windowDays)

  /** The rolling-correlation derivation over an already-aggregated
    * `(day, x, y)` table — split out for the streaming twin
    * ([[graft.streaming.DailyVolRevState]]), same sharing rationale
    * as [[acfFromDaily]]. */
  private[graft] def corrFromDaily(daily0: DataFrame, windowDays: Int = 7): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("day"), "left")
      .select($"day", coalesce($"x", lit(0L)).as("x"), coalesce($"y", lit(0L)).as("y"))
    val w = Window.orderBy($"day").rowsBetween(-(windowDays - 1), Window.currentRow)
    val dec = "decimal(38,0)"
    spine
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("sx", sum($"x".cast(dec)).over(w))
      .withColumn("sy", sum($"y".cast(dec)).over(w))
      .withColumn("sxy", sum($"x".cast(dec) * $"y").over(w))
      .withColumn("sxx", sum($"x".cast(dec) * $"x").over(w))
      .withColumn("syy", sum($"y".cast(dec) * $"y").over(w))
      .select($"day", $"m".as("n_days"), $"x".as("n_events"), $"y".as("cents"),
        round((($"m" * $"sxy" - $"sx" * $"sy").cast("double")) /
          sqrt(expr(s"CAST(nullif(m * sxx - sx * sx, CAST(0 AS $dec)) AS DOUBLE)") *
               expr(s"CAST(nullif(m * syy - sy * sy, CAST(0 AS $dec)) AS DOUBLE)")), 6)
          .as("rolling_r"))
      .orderBy($"day")
  }

  def rollingCorrDaily(spark: SparkSession, dir: String): DataFrame =
    rollingCorrDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[rollingCorrDailyTransform]] (window = 7). */
  val rollingCorrDailyOracleSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |         count(*) AS x, sum(CAST(round(value * 100) AS BIGINT)) AS y
      |  FROM events GROUP BY 1),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM daily)),
      |g AS (SELECT s.day, CAST(coalesce(d.x, 0) AS BIGINT) AS x,
      |             CAST(coalesce(d.y, 0) AS BIGINT) AS y
      |      FROM spine s LEFT JOIN daily d ON d.day = s.day),
      |r AS (SELECT day, x, y,
      |             count(*) OVER w AS m,
      |             sum(CAST(x AS HUGEINT)) OVER w AS sx,
      |             sum(CAST(y AS HUGEINT)) OVER w AS sy,
      |             sum(CAST(x AS HUGEINT) * y) OVER w AS sxy,
      |             sum(CAST(x AS HUGEINT) * x) OVER w AS sxx,
      |             sum(CAST(y AS HUGEINT) * y) OVER w AS syy
      |      FROM g WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day, CAST(m AS BIGINT) AS n_days, x AS n_events, y AS cents,
      |       round(CAST(m * sxy - sx * sy AS DOUBLE) /
      |             sqrt(CAST(nullif(m * sxx - sx * sx, 0) AS DOUBLE) *
      |                  CAST(nullif(m * syy - sy * sy, 0) AS DOUBLE)), 6) AS rolling_r
      |FROM r ORDER BY day""".stripMargin

  /** Kaplan–Meier time-to-conversion survival (first `view` → first
    * subsequent `purchase`, day granularity) — the censoring-aware
    * answer to "how long until viewers convert": a viewer who has not
    * purchased BY CORPUS END is right-censored at their observed
    * span, not dropped (dropping them — what a plain mean over
    * [[Behavior.conversionLagStatsTransform]]'s lags does — biases
    * conversion time optimistic, hardest at the corpus edge).
    *
    * Standard product-limit estimator: at each day t with d_t
    * conversions out of n_t users still at risk (duration ≥ t),
    * S(t) = Π_{u≤t} (1 − d_u/n_u). Risk sets and event counts are
    * exact integers (n_t = suffix-cumulative count over the duration
    * axis); the product is evaluated as exp(Σ ln((n_u−d_u)/n_u)) in
    * BOTH engines — each ln argument is the same correctly-rounded
    * double of two exact BIGINTs, ln/exp agree to ULPs and the output
    * rounds at 1e−6, argued safe the same way as the quantized-OLS
    * zipf_slope; a step that converts the entire risk set (ratio 0)
    * pins S to exactly 0.0 through a cumulative flag, never through
    * ln(0) (Spark yields NULL there, DuckDB -inf).
    *
    * Shape: fact → one (first_view, first_purchase) row per user
    * (conditional-min aggregate, ONE user_id shuffle), → |duration|
    * rows (≤ corpus span in days); the KM recursion runs as
    * unpartitioned windows over that day-scale table (planning-scale
    * by the plan-audit rule). Output only at event days (standard KM
    * steps) plus the day-0 row when present.
    */
  def survivalKmTransform(events: DataFrame,
                          startType: String = "view",
                          endType: String = "purchase"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // one conditional-min aggregate per user (ONE user_id shuffle)
    // and a one-row horizon — exactly the state the streaming twin
    // keeps ([[graft.streaming.SurvivalState]]: mins/max merge
    // exactly across batches)
    val users = events
      .select($"user_id", $"event_type", date_trunc("day", $"ts").as("day"))
      .groupBy($"user_id")
      .agg(min(when($"event_type" === startType, $"day")).as("v_day"),
        min(when($"event_type" === endType, $"day")).as("any_p"))
    val horizon = events.agg(date_trunc("day", max($"ts")).as("h"))
    survivalFromUsers(users, horizon)
  }

  /** The product-limit derivation over the sufficient per-user state
    * `(user_id, v_day, any_p)` + one-row horizon — shared with the
    * streaming twin (parity by shared derivation). */
  private[graft] def survivalFromUsers(users: DataFrame, horizon: DataFrame): DataFrame = {
    val spark = users.sparkSession
    import spark.implicits._
    val durations = users.filter($"v_day".isNotNull)
      .crossJoin(broadcast(horizon))
      .select($"user_id",
        when($"any_p".isNotNull && $"any_p" >= $"v_day",
          datediff($"any_p", $"v_day")).as("event_day"),
        datediff($"h", $"v_day").as("censor_day"))
      .select(
        coalesce($"event_day", $"censor_day").cast("long").as("duration"),
        when($"event_day".isNotNull, 1L).otherwise(0L).as("is_event"))
    val byDur = durations.groupBy($"duration")
      .agg(count(lit(1)).as("n_at"), sum($"is_event").as("d"))
    val suffix = Window.orderBy($"duration")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cum = Window.orderBy($"duration")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .withColumn("n_risk", sum($"n_at").over(suffix))
      .withColumn("ratio", ($"n_risk" - $"d").cast("double") / $"n_risk".cast("double"))
      .withColumn("dead", max(when($"ratio" === 0.0, 1L).otherwise(0L)).over(cum))
      .withColumn("lnsum", sum(when($"ratio" > 0.0, log($"ratio")).otherwise(lit(0.0))).over(cum))
      .filter($"d" > 0)
      .select($"duration", $"n_risk", $"d".as("n_events"),
        when($"dead" === 1L, lit(0.0)).otherwise(round(exp($"lnsum"), 6)).as("survival"))
      .orderBy($"duration")
  }

  def survivalKm(spark: SparkSession, dir: String): DataFrame =
    survivalKmTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[survivalKmTransform]] (view → purchase). */
  val survivalKmOracleSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |                  date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
      |           FROM events),
      |pu AS (SELECT user_id,
      |              min(CASE WHEN event_type = 'view' THEN day END) AS v_day
      |       FROM e GROUP BY 1),
      |fp AS (SELECT user_id, min(day) AS any_p FROM e WHERE event_type = 'purchase' GROUP BY 1),
      |h AS (SELECT date_trunc('day', max(ts)) AS h FROM e),
      |dur AS (
      |  SELECT CAST(coalesce(
      |           CASE WHEN fp.any_p IS NOT NULL AND fp.any_p >= pu.v_day
      |                THEN date_diff('day', pu.v_day, fp.any_p) END,
      |           date_diff('day', pu.v_day, h.h)) AS BIGINT) AS duration,
      |         CASE WHEN fp.any_p IS NOT NULL AND fp.any_p >= pu.v_day THEN 1 ELSE 0 END AS is_event
      |  FROM pu LEFT JOIN fp ON pu.user_id = fp.user_id CROSS JOIN h
      |  WHERE pu.v_day IS NOT NULL),
      |bd AS (SELECT duration, count(*) AS n_at, CAST(sum(is_event) AS BIGINT) AS d
      |       FROM dur GROUP BY 1),
      |r AS (SELECT duration, d,
      |             sum(n_at) OVER (ORDER BY duration ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
      |      FROM bd),
      |s AS (SELECT duration, d, n_risk,
      |             CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS ratio
      |      FROM r),
      |k AS (SELECT duration, d, n_risk,
      |             max(CASE WHEN ratio = 0 THEN 1 ELSE 0 END)
      |               OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING) AS dead,
      |             sum(CASE WHEN ratio > 0 THEN ln(ratio) ELSE 0 END)
      |               OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING) AS lnsum
      |      FROM s)
      |SELECT duration, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
      |       CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lnsum), 6) END AS survival
      |FROM k WHERE d > 0 ORDER BY duration""".stripMargin

  /** Time-weighted average engagement value per day — the
    * sampling-bias-free daily level (a plain AVG over events
    * overweights burst periods: a user firing 100 events in one
    * minute dominates a day they were otherwise idle; weighting each
    * value by the µs it was the user's CURRENT state until their
    * next event is the telemetry-standard TWA): weight = exact µs
    * gap to the same user's next event (lead window), the user's
    * last event carries no interval and is excluded; Σ cents·w and
    * Σ w as exact Decimal(38,0) (cents·µs passes a Long within one
    * busy day), one float division per day.
    *
    * Shape: one user_id shuffle for the lead window, then a
    * map-side-combinable day rollup — the lag_features plan with an
    * aggregate instead of a feature matrix.
    */
  def timeWeightedValueTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val dec = "decimal(38,0)"
    twaFromDaily(events
      .select($"user_id", $"ts", $"event_id",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("w_us", lead(unix_micros($"ts"), 1).over(w) - unix_micros($"ts"))
      .filter($"w_us".isNotNull)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n_intervals"),
        sum($"cents".cast(dec) * $"w_us").as("cw"),
        sum($"w_us".cast(dec)).as("sw")))
  }

  /** Moving-average crossover signal over daily revenue — the
    * golden-cross/death-cross detector (ops reads it as "sustained
    * shift vs noise": a 7-day mean crossing the 28-day mean commits
    * to a trend the way no single day can): zero-filled daily cents,
    * trailing S7/S28 window sums, comparison cross-multiplied to
    * exact integers (28·S7 vs 7·S28 — the means never materialize as
    * floats), only FULL windows compared (first 27 days emit no
    * signal), output = the crossing days only with both sums.
    *
    * Shape: fact → |days| rows map-side; ROWS windows + one lag over
    * the day-scale aggregate (plan-audit bounded).
    */
  def maCrossoverTransform(events: DataFrame, fast: Int = 7, slow: Int = 28): DataFrame =
    maFromDaily(events
      .select(date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("y")), fast, slow)

  /** The crossover derivation over an already-aggregated `(day, y)`
    * table — shared with the streaming twin (which keeps the daily
    * cents additively; the [[corrFromDaily]] sharing pattern). */
  private[graft] def maFromDaily(daily0: DataFrame, fast: Int = 7, slow: Int = 28): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("day"), "left")
      .select($"day", coalesce($"y", lit(0L)).as("y"))
    val ord = Window.orderBy($"day")
    val wF = ord.rowsBetween(-(fast - 1), Window.currentRow)
    val wS = ord.rowsBetween(-(slow - 1), Window.currentRow)
    spine
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("sf", sum($"y").over(wF))
      .withColumn("ss", sum($"y").over(wS))
      .filter($"i" >= slow)
      .withColumn("sig",
        when(lit(slow) * $"sf" > lit(fast) * $"ss", 1L)
          .when(lit(slow) * $"sf" < lit(fast) * $"ss", -1L)
          .otherwise(0L))
      .withColumn("prev_sig", lag($"sig", 1).over(ord))
      // every full-window day emits (the signal line is the product;
      // a crossing-only output is legitimately empty on short spans)
      .select($"day", $"sf".as("fast_sum_cents"), $"ss".as("slow_sum_cents"), $"sig",
        when($"prev_sig".isNotNull && $"sig" =!= $"prev_sig" && $"sig" === 1L, "golden")
          .when($"prev_sig".isNotNull && $"sig" =!= $"prev_sig" && $"sig" === -1L, "death")
          .otherwise(lit(null).cast("string")).as("cross"))
      .orderBy($"day")
  }

  def maCrossover(spark: SparkSession, dir: String): DataFrame =
    maCrossoverTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[maCrossoverTransform]] (7/28). */
  val maCrossoverOracleSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |         sum(CAST(round(value * 100) AS BIGINT)) AS y
      |  FROM events GROUP BY 1),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM daily)),
      |g AS (SELECT s.day, CAST(coalesce(d.y, 0) AS BIGINT) AS y
      |      FROM spine s LEFT JOIN daily d ON d.day = s.day),
      |m AS (SELECT day,
      |             row_number() OVER (ORDER BY day) AS i,
      |             sum(y) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sf,
      |             sum(y) OVER (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS ss
      |      FROM g),
      |sg AS (SELECT day, sf, ss,
      |              CASE WHEN 28 * sf > 7 * ss THEN 1
      |                   WHEN 28 * sf < 7 * ss THEN -1 ELSE 0 END AS sig
      |       FROM m WHERE i >= 28),
      |x AS (SELECT day, sf, ss, sig, lag(sig) OVER (ORDER BY day) AS prev_sig FROM sg)
      |SELECT day, CAST(sf AS BIGINT) AS fast_sum_cents, CAST(ss AS BIGINT) AS slow_sum_cents,
      |       CAST(sig AS BIGINT) AS sig,
      |       CASE WHEN prev_sig IS NOT NULL AND sig <> prev_sig AND sig = 1 THEN 'golden'
      |            WHEN prev_sig IS NOT NULL AND sig <> prev_sig AND sig = -1 THEN 'death'
      |            END AS cross
      |FROM x ORDER BY day""".stripMargin

  /** Daily event-type mix drift — "did the SHAPE of traffic change
    * today" (an outage that drops one event type leaves total volume
    * looking fine; the composition moves): total-variation distance
    * between today's event-type distribution and the trailing 7-day
    * baseline mix, cross-multiplied to exact integers —
    * TV·(2·N·M) = Σ_t |n_t·M − m_t·N| with n/N today's per-type/total
    * counts and m/M the baseline's — so no fraction enters a sum and
    * the one float is the final division, rounded. The DAILY axis of
    * [[graft.operators.TextOps]]' source_drift_tv (which compares
    * SOURCES over the whole corpus).
    *
    * Shape: fact → |days|×|types| grid map-side; baseline sums are
    * per-type ROWS windows over the day axis; day totals join back
    * at day scale. Plan-audit bounded throughout.
    */
  def typeMixDriftTransform(events: DataFrame, baselineDays: Int = 7): DataFrame =
    mixDriftFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x")), baselineDays)

  /** The drift derivation over the `(event_type, day, x)` count grid
    * — the SAME state shape [[acfFromDaily]] reads, so the streaming
    * twin shares [[graft.streaming.TypeDailyCountState]] (one state,
    * two daily-composition faces). */
  private[graft] def mixDriftFromDaily(daily0: DataFrame, baselineDays: Int = 7): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0.select($"event_type", $"day", $"x".as("n"))
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"n", lit(0L)).as("n"))
    val wBase = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-baselineDays, -1)
    val withM = grid.withColumn("m", coalesce(sum($"n").over(wBase), lit(0L)))
    val totals = withM.groupBy($"day")
      .agg(sum($"n").as("nt"), sum($"m").as("mt"))
    val dec = "decimal(38,0)"
    withM.join(totals, Seq("day"))
      .filter($"nt" > 0 && $"mt" > 0)
      .groupBy($"day")
      .agg(first($"nt").as("n_today"), first($"mt").as("n_baseline"),
        sum(abs($"n".cast(dec) * $"mt" - $"m".cast(dec) * $"nt")).as("num"))
      .select($"day", $"n_today", $"n_baseline",
        round($"num".cast("double") /
          (lit(2.0) * $"n_today".cast("double") * $"n_baseline".cast("double")), 6)
          .as("tv_drift"))
      .orderBy($"day")
  }

  def typeMixDrift(spark: SparkSession, dir: String): DataFrame =
    typeMixDriftTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[typeMixDriftTransform]] (baseline = 7). */
  val typeMixDriftOracleSql: String =
    """WITH d AS (
      |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |grid AS (SELECT t.event_type, s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n
      |         FROM (SELECT DISTINCT event_type FROM d) t
      |         CROSS JOIN spine s
      |         LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |wm AS (SELECT event_type, day, n,
      |              CAST(coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS m
      |       FROM grid),
      |tot AS (SELECT day, sum(n) AS nt, sum(m) AS mt FROM wm GROUP BY 1)
      |SELECT w.day, CAST(any_value(t.nt) AS BIGINT) AS n_today,
      |       CAST(any_value(t.mt) AS BIGINT) AS n_baseline,
      |       round(CAST(sum(abs(CAST(w.n AS HUGEINT) * t.mt - CAST(w.m AS HUGEINT) * t.nt)) AS DOUBLE)
      |             / (2.0 * CAST(any_value(t.nt) AS DOUBLE) * CAST(any_value(t.mt) AS DOUBLE)), 6) AS tv_drift
      |FROM wm w JOIN tot t ON w.day = t.day
      |WHERE t.nt > 0 AND t.mt > 0
      |GROUP BY w.day ORDER BY w.day""".stripMargin

  /** The final TWA select over the additive daily sufficient sums
    * `(day, n_intervals, cw, sw)` — shared with the streaming twin
    * ([[graft.streaming.TwaState]]), which maintains exactly this
    * table (plus a per-user frontier for the cross-batch interval). */
  private[graft] def twaFromDaily(daily: DataFrame): DataFrame =
    daily.select(col("day"), col("n_intervals"),
        round(col("cw").cast("double") / col("sw").cast("double"), 4).as("twa_cents"))
      .orderBy(col("day"))

  def timeWeightedValue(spark: SparkSession, dir: String): DataFrame =
    timeWeightedValueTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[timeWeightedValueTransform]]. */
  val timeWeightedValueOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |g AS (SELECT date_trunc('day', ts) AS day, cents,
      |             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |               - epoch_us(ts) AS w_us
      |      FROM e)
      |SELECT day, count(*) AS n_intervals,
      |       round(CAST(sum(CAST(cents AS HUGEINT) * w_us) AS DOUBLE)
      |             / CAST(sum(CAST(w_us AS HUGEINT)) AS DOUBLE), 4) AS twa_cents
      |FROM g WHERE w_us IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin

  /** Holt's linear-trend double exponential smoothing (α = β = ½)
    * over daily revenue per type — the FORECASTING read next to
    * [[Behavior.ewmaDailyTransform]]'s level-only smoother: a level
    * that tracks the series plus a trend that carries momentum, and
    * the one-day-ahead forecast level+trend. α = β = ½ keeps every
    * step two halvings — but unlike the EWMA's 20-tap window the
    * recurrence is genuinely sequential (trend feeds back), so the
    * fold runs on the DRIVER over the zero-filled |types|×|days|
    * grid (planning-scale, the k-means/ADC-LUT collect class) in
    * IEEE doubles with a FIXED operation order: l′ = 0.5·x +
    * 0.5·(l+b); b′ = 0.5·(l′−l) + 0.5·b, seeded l₀ = x₀, b₀ = 0.
    * The DuckDB oracle replays the identical expression tree through
    * a recursive CTE — same doubles in, same order, bit-identical
    * out; rounding happens ONCE at output.
    */
  def holtLinearTrendTransform(events: DataFrame): DataFrame =
    holtFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("day")).agg(sum(col("cents")).as("cents")))

  /** The Holt fold from an already-aggregated (event_type, day,
    * cents) table — split out so the STREAMING twin reads it over
    * [[graft.streaming.DailyTypeCentsState]]'s additive daily state
    * (the ewma_daily sharing pattern: one daily-cents state, two
    * smoother faces — a late batch reshapes the whole fold, which is
    * exactly why per-batch Holt outputs cannot merge but daily cents
    * can). */
  private[graft] def holtFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"cents", lit(0L)).as("cents"))
    // planning-scale: |types|×|days| rows folded on the driver
    val rows = grid.orderBy($"event_type", $"day").collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, java.sql.Timestamp, Double, Double, Double)]
    var curType: String = null
    var l = 0.0; var b = 0.0
    rows.foreach { r =>
      val (tp, day, x) =
        (r.getString(0), r.getTimestamp(1), r.getLong(2).toDouble)
      if (tp != curType) { curType = tp; l = x; b = 0.0 }
      else {
        val lNew = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (lNew - l) + 0.5 * b
        l = lNew
      }
      out += ((tp, day, r6(l), r6(b), r6(l + b)))
    }
    out.toSeq.toDF("event_type", "day", "level", "trend", "forecast")
      .orderBy($"event_type", $"day")
  }

  def holtLinearTrend(spark: SparkSession, dir: String): DataFrame =
    holtLinearTrendTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[holtLinearTrendTransform]] — the identical
    * recurrence replayed through a recursive CTE. */
  val holtLinearTrendOracleSql: String =
    """WITH RECURSIVE d AS (
      |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS MATERIALIZED (
      |  SELECT t.event_type, s.day, CAST(coalesce(d.cents, 0) AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY t.event_type ORDER BY s.day) AS rn
      |  FROM (SELECT DISTINCT event_type FROM d) t
      |  CROSS JOIN spine s
      |  LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |hw AS (
      |  SELECT event_type, day, rn, CAST(cents AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
      |  FROM g WHERE rn = 1
      |  UNION ALL
      |  SELECT g.event_type, g.day, g.rn,
      |         0.5 * CAST(g.cents AS DOUBLE) + 0.5 * (hw.l + hw.b),
      |         0.5 * ((0.5 * CAST(g.cents AS DOUBLE) + 0.5 * (hw.l + hw.b)) - hw.l)
      |           + 0.5 * hw.b
      |  FROM hw JOIN g ON g.event_type = hw.event_type AND g.rn = hw.rn + 1)
      |SELECT event_type, day, round(l, 6) AS level, round(b, 6) AS trend,
      |       round(l + b, 6) AS forecast
      |FROM hw ORDER BY 1, 2""".stripMargin

  /** Jarque–Bera normality screen on each type's daily-count series —
    * the distribution-shape companion of the Fano/runs screens (Fano
    * asks "is the variance Poisson-consistent", runs asks "is the
    * sign sequence random", JB asks "are the third and fourth moments
    * Gaussian-consistent"): skewness g1 = M3/M2^1.5 and kurtosis
    * g2 = M4/M2², where M_k are the CROSS-MULTIPLIED central power
    * sums — M2 = n·S2 − S1², M3 = n²·S3 − 3n·S1·S2 + 2S1³,
    * M4 = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3S1⁴ — kept EXACT as
    * DECIMAL(38,0) over the integer daily counts (the normalizing
    * n-powers cancel: m3/m2^1.5 = M3/M2^1.5, m4/m2² = M4/M2², so no
    * division ever happens in integer space), then ONE float each
    * for g1/g2 and JB = n/6·(g1² + (g2−3)²/4). Constant series
    * (M2 = 0) report null rather than an engine-dependent ±inf.
    *
    * Headroom: S1⁴ must fit 38 digits → exact up to ~3·10⁹ total
    * events per type (DuckDB's HUGEINT has the same int128 ceiling);
    * past that a deployment standardizes the daily counts first.
    * Shape: one map-side-combinable shuffle to |types| rows of four
    * power sums; the zero-filled grid is |types|×|days|. */
  def jarqueBeraDailyTransform(events: DataFrame): DataFrame =
    jarqueBeraFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  /** The JB derivation from an already-aggregated (event_type, day,
    * n) table — the ELEVENTH face of [[graft.streaming
    * .TypeDailyCountState]]'s additive grid (a late day re-centers
    * every moment, but the counts merge exactly). */
  private[graft] def jarqueBeraFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", coalesce($"n", lit(0L)).as("n"))
    grid.groupBy($"event_type")
      .agg(count(lit(1)).as("nd"),
        sum(expr("CAST(n AS DECIMAL(38,0))")).as("s1"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("s2"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n * n")).as("s3"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n * n * n")).as("s4"))
      .select($"event_type", $"nd".as("n_days"),
        expr("nd * s2 - s1 * s1").as("m2"),
        expr("nd * nd * s3 - 3 * nd * s1 * s2 + 2 * s1 * s1 * s1").as("m3"),
        expr("nd * nd * nd * s4 - 4 * nd * nd * s1 * s3 " +
          "+ 6 * nd * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1").as("m4"),
        $"nd")
      .select($"event_type", $"n_days",
        expr("CASE WHEN m2 > 0 THEN round(CAST(m3 AS DOUBLE) / pow(CAST(m2 AS DOUBLE), 1.5), 6) END")
          .as("skewness"),
        expr("CASE WHEN m2 > 0 THEN round(CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6) END")
          .as("kurtosis"),
        expr("""CASE WHEN m2 > 0 THEN
               |  round(nd / 6.0 *
               |        (pow(CAST(m3 AS DOUBLE) / pow(CAST(m2 AS DOUBLE), 1.5), 2) +
               |         pow(CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0, 2) / 4.0), 6)
               |END""".stripMargin).as("jb_stat"))
      .orderBy($"event_type")
  }

  def jarqueBeraDaily(spark: SparkSession, dir: String): DataFrame =
    jarqueBeraDailyTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[jarqueBeraDailyTransform]] — HUGEINT power
    * sums, the identical cross-multiplied moments, one float each. */
  val jarqueBeraDailyOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type, CAST(coalesce(d.n, 0) AS HUGEINT) AS n
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |ps AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS nd,
      |              sum(n) AS s1, sum(n * n) AS s2,
      |              sum(n * n * n) AS s3, sum(n * n * n * n) AS s4
      |       FROM g GROUP BY 1),
      |mm AS (SELECT event_type, CAST(nd AS BIGINT) AS n_days, nd,
      |              nd * s2 - s1 * s1 AS m2,
      |              nd * nd * s3 - 3 * nd * s1 * s2 + 2 * s1 * s1 * s1 AS m3,
      |              nd * nd * nd * s4 - 4 * nd * nd * s1 * s3
      |                + 6 * nd * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS m4
      |       FROM ps)
      |SELECT event_type, n_days,
      |       CASE WHEN m2 > 0 THEN round(CAST(m3 AS DOUBLE) / pow(CAST(m2 AS DOUBLE), 1.5), 6) END AS skewness,
      |       CASE WHEN m2 > 0 THEN round(CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6) END AS kurtosis,
      |       CASE WHEN m2 > 0 THEN
      |         round(CAST(nd AS BIGINT) / 6.0 *
      |               (pow(CAST(m3 AS DOUBLE) / pow(CAST(m2 AS DOUBLE), 1.5), 2) +
      |                pow(CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0, 2) / 4.0), 6)
      |       END AS jb_stat
      |FROM mm ORDER BY 1""".stripMargin

  /** Partial autocorrelation (PACF) of each type's daily series via
    * Durbin–Levinson — completes the correlogram family (ACF = raw
    * correlation at lag k, Ljung–Box = "any of it significant",
    * PACF = correlation at lag k WITH THE SHORTER LAGS REGRESSED
    * OUT — the AR-order readout: an AR(p) series cuts off after p):
    * φ_kk = (ρ_k − Σ_j φ_{k−1,j} ρ_{k−j}) / (1 − Σ_j φ_{k−1,j} ρ_j),
    * φ_kj = φ_{k−1,j} − φ_kk φ_{k−1,k−j}.
    *
    * Determinism: the recursion consumes the ALREADY-1e-6-ROUNDED
    * ρ from [[acfFromDaily]] (identical doubles in both engines) and
    * runs on the DRIVER over the planning-scale |types|×7 rows (the
    * [[holtFromDaily]] collect class) with a FIXED left-associated
    * operation order the oracle's unrolled CTE levels replay
    * literally; a zero denominator (perfect fit) nulls that lag and
    * every later one in both engines; rounding happens ONCE at
    * output. */
  def pacfDailyTransform(events: DataFrame, maxLag: Int = 7): DataFrame =
    pacfFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x")), maxLag)

  private[graft] def pacfFromDaily(daily0: DataFrame, maxLag: Int = 7): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val acf = acfFromDaily(daily0, maxLag).collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Option[Double])]
    acf.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (tp, rows) =>
      val rho: Map[Long, Option[Double]] = rows.map(r =>
        r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      def r(k: Int): Option[Double] = rho.getOrElse(k.toLong, None)
      // φ_{k-1, j} carried between levels; null-poisoning mirrors the
      // oracle's NULL propagation exactly
      var phi = Map.empty[Int, Double]
      var dead = false
      for (k <- 1 to maxLag) {
        val pk: Option[Double] =
          if (dead) None
          else if (k == 1) r(1)
          else (r(k), (1 until k).foldLeft(Option(0.0)) { (acc, j) =>
            for (a <- acc; p <- phi.get(j); rr <- r(k - j)) yield a + p * rr
          }, (1 until k).foldLeft(Option(0.0)) { (acc, j) =>
            for (a <- acc; p <- phi.get(j); rr <- r(j)) yield a + p * rr
          }) match {
            case (Some(rk), Some(num0), Some(den0)) if 1.0 - den0 != 0.0 =>
              Some((rk - num0) / (1.0 - den0))
            case _ => None
          }
        pk match {
          case Some(v) =>
            val prev = phi
            phi = ((1 until k).map(j => j -> (prev(j) - v * prev(k - j))) :+ (k -> v)).toMap
          case None => dead = true
        }
        out += ((tp, k.toLong, pk.map(r6)))
      }
    }
    out.toSeq.map { case (t, l, p) => (t, l, p.map(Double.box).orNull) }
      .toDF("event_type", "lag", "pacf")
      .select($"event_type", $"lag", $"pacf".cast("double").as("pacf"))
      .orderBy($"event_type", $"lag")
  }

  def pacfDaily(spark: SparkSession, dir: String): DataFrame =
    pacfDailyTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[pacfDailyTransform]] — the Durbin–Levinson
    * levels unrolled with the identical left-associated sums. */
  def pacfDailyOracleSql(maxLag: Int = 7): String = {
    // level 1 seeds phi_1_1 = r1; level k derives phi_k_* from the
    // pivoted r columns and level k-1's phi columns
    val levels = (2 to maxLag).map { k =>
      val num = (1 until k).map(j => s"phi_${k - 1}_$j * r${k - j}").mkString(" + ")
      val den = (1 until k).map(j => s"phi_${k - 1}_$j * r$j").mkString(" + ")
      val kk = s"(r$k - ($num)) / nullif(1.0 - ($den), 0.0)"
      val carry = (1 until k).map(j =>
        s"phi_${k - 1}_$j - ($kk) * phi_${k - 1}_${k - j} AS phi_${k}_$j").mkString(",\n|         ")
      s"""l$k AS (SELECT event_type, ${(1 to maxLag).map(i => s"r$i").mkString(", ")},
         |         $carry,
         |         $kk AS phi_${k}_$k
         |  FROM l${k - 1})""".stripMargin
    }.mkString(",\n")
    val unions = (1 to maxLag).map(k =>
      s"SELECT event_type, $k AS lag, round(phi_${k}_$k, 6) AS pacf FROM l$k")
      .mkString("\n UNION ALL ")
    s"""WITH acf AS ($acfDailyOracleSql),
       |r AS (SELECT event_type,
       |             ${(1 to maxLag).map(i =>
                        s"max(CASE WHEN lag = $i THEN acf END) AS r$i").mkString(",\n|             ")}
       |      FROM acf GROUP BY 1),
       |l1 AS (SELECT event_type, ${(1 to maxLag).map(i => s"r$i").mkString(", ")},
       |              r1 AS phi_1_1 FROM r),
       |$levels
       |SELECT CAST(event_type AS VARCHAR) AS event_type, CAST(lag AS BIGINT) AS lag, pacf
       |FROM ($unions) ORDER BY 1, 2""".stripMargin
  }

  /** Lagged cross-correlation (CCF) between every type pair's daily
    * series — the LEAD/LAG structure the symmetric same-day measures
    * (Spearman/Kendall/Pearson-window) cannot see: ccf(k) =
    * corr(x_t, y_{t+k}) for k ∈ [−7, 7], so "views lead purchases by
    * two days" shows as the off-center peak. Negative k means type_a
    * LAGS type_b.
    *
    * Exactness: per (pair, lag) the five power sums over the day
    * overlap are exact integers (products as DECIMAL(38,0)), the
    * correlation is ONE float in the same fixed expression as
    * [[graft.operators.Stats]]' Spearman; zero-variance overlaps
    * report null. Shape: the lag fan-out is a 15-row literal
    * crossJoin BEFORE the pair join on (day index + lag) — grid rows
    * × 15, calendar-bounded like every face of the count state
    * (FIFTEENTH face). */
  def crossCorrelationDailyTransform(events: DataFrame, maxLag: Int = 7): DataFrame =
    ccfFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")), maxLag)

  private[graft] def ccfFromDaily(daily0: DataFrame, maxLag: Int = 7): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"), $"lo")
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", datediff($"day", $"lo").cast("long").as("di"),
        coalesce($"n", lit(0L)).as("n"))
    // lag fan-out via a generator, NOT a 15-row cross join — a
    // multi-row BNLJ build side is the exact shape the whole-suite
    // plan audit rejects (the acfFromDaily precedent); the generator
    // keeps the fan-out inside whole-stage codegen and the pair join
    // hashes on the computed (di + lag) day key
    val a = grid.select($"event_type".as("type_a"), $"di", $"n".as("x"))
      .withColumn("lag", explode(expr(s"sequence(CAST(${-maxLag} AS BIGINT), CAST($maxLag AS BIGINT))")))
    val b = grid.select($"event_type".as("type_b"), $"di".as("dib"), $"n".as("y"))
    a.join(b, $"type_a" < $"type_b" && $"dib" === $"di" + $"lag")
      .groupBy($"type_a", $"type_b", $"lag")
      .agg(count(lit(1)).as("n_days"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select($"type_a", $"type_b", $"lag", $"n_days",
        expr("""CASE WHEN n_days * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0
               |      AND n_days * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0 THEN
               |  round((n_days * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
               |        (sqrt(n_days * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) *
               |         sqrt(n_days * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6)
               |END""".stripMargin).as("ccf"))
      .orderBy($"type_a", $"type_b", $"lag")
  }

  def crossCorrelationDaily(spark: SparkSession, dir: String): DataFrame =
    crossCorrelationDailyTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[crossCorrelationDailyTransform]]. */
  def crossCorrelationDailyOracleSql(maxLag: Int = 7): String =
    s"""WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       |                  count(*) AS n
       |           FROM events GROUP BY 1, 2),
       |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day, lo
       |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
       |g AS (SELECT t.event_type, CAST(date_diff('day', s.lo, s.day) AS BIGINT) AS di,
       |             CAST(coalesce(d.n, 0) AS BIGINT) AS n
       |      FROM (SELECT DISTINCT event_type FROM d) t
       |      CROSS JOIN spine s
       |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
       |l AS (SELECT unnest(generate_series(-$maxLag, $maxLag)) AS lag),
       |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
       |             count(*) AS n_days,
       |             CAST(sum(a.n) AS BIGINT) AS sx, CAST(sum(b.n) AS BIGINT) AS sy,
       |             sum(CAST(a.n AS HUGEINT) * b.n) AS sxy,
       |             sum(CAST(a.n AS HUGEINT) * a.n) AS sxx,
       |             sum(CAST(b.n AS HUGEINT) * b.n) AS syy
       |      FROM g a CROSS JOIN l
       |      JOIN g b ON a.event_type < b.event_type AND b.di = a.di + l.lag
       |      GROUP BY 1, 2, 3)
       |SELECT type_a, type_b, lag, n_days,
       |       CASE WHEN n_days * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0
       |             AND n_days * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0 THEN
       |         round((n_days * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
       |               (sqrt(n_days * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) *
       |                sqrt(n_days * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6)
       |       END AS ccf
       |FROM p ORDER BY 1, 2, 3""".stripMargin

  /** Theil–Sen robust trend per type — the slope estimate the
    * anomaly screens want when OLS would chase one spiked day: the
    * MEDIAN of all pairwise slopes (x_j − x_i)/(j − i) over the
    * zero-filled daily series. Breakdown point ~29%, versus 0% for
    * the least-squares line inside [[holtFromDaily]]'s smoother.
    *
    * Exactness: each slope is ONE float quotient of two exact
    * integers (count delta / day delta); the median interpolates the
    * two middle order statistics with the same (n−1)·p rule in both
    * engines (Spark `percentile`, DuckDB `quantile_cont`), so the
    * doubles agree bit-for-bit before the single round.
    *
    * Shape: the pair join is |days|²/2 per type — ~4k rows per type
    * at a 90-day window, BOUNDED BY THE CALENDAR not the fact table
    * (a year is 66k pairs); the fact table collapses to the daily
    * grid in one map-side-combinable shuffle first. */
  def theilSenTrendTransform(events: DataFrame): DataFrame =
    theilSenFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  /** The Theil–Sen derivation from an already-aggregated
    * (event_type, day, n) table — the TWELFTH face of
    * [[graft.streaming.TypeDailyCountState]]'s additive grid. */
  private[graft] def theilSenFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"), $"lo")
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", datediff($"day", $"lo").cast("long").as("di"),
        coalesce($"n", lit(0L)).as("n"))
    val a = grid.select($"event_type", $"di".as("di_a"), $"n".as("n_a"))
    val b = grid.select($"event_type", $"di".as("di_b"), $"n".as("n_b"))
    a.join(b, Seq("event_type")).filter($"di_b" > $"di_a")
      .select($"event_type",
        expr("CAST(n_b - n_a AS DOUBLE) / (di_b - di_a)").as("slope"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        expr("round(percentile(slope, 0.5), 6)").as("ts_slope"))
      .orderBy($"event_type")
  }

  def theilSenTrend(spark: SparkSession, dir: String): DataFrame =
    theilSenTrendTransform(graft.sources.Tables.events(spark, dir))

  /** DuckDB oracle for [[theilSenTrendTransform]]. */
  val theilSenTrendOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day, lo
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type, CAST(date_diff('day', s.lo, s.day) AS BIGINT) AS di,
      |             CAST(coalesce(d.n, 0) AS BIGINT) AS n
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day)
      |SELECT a.event_type, count(*) AS n_pairs,
      |       round(quantile_cont(CAST(b.n - a.n AS DOUBLE) / (b.di - a.di), 0.5), 6) AS ts_slope
      |FROM g a JOIN g b ON a.event_type = b.event_type AND b.di > a.di
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Heavy changers (Cormode–Muthukrishnan's "what's new/what's hot"
    * read, exact form): the items whose SHARE of engagement moved
    * most between the first and second half of the window — the
    * trend screen a feed-ranking or sketch-monitoring pipeline runs
    * (the approximate version diffs two CMS sketches; on a warehouse
    * the exact diff is one aggregate, so exact is the right tool).
    *
    * The period splits at min(day)+15 days. Per item, conditional
    * half counts (n₁, n₂) come off the daily grid in one aggregate;
    * the ORDERING key |n₂·N₁ − n₁·N₂| is an exact DECIMAL (the
    * common denominator N₁·N₂ cancels), so the top-k is
    * order-deterministic with no float compare; shares round once at
    * 1e-6 for display. Output = top 20 by |Δshare| (ties → smaller
    * item).
    *
    * Shape: fact → (item, day) grid (the streaming face's additive
    * state) → one conditional aggregate to |items| rows → top-k. */
  private[graft] def heavyChangersFromDaily(obs: DataFrame, topK: Int = 20): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    val cut = obs.agg((min($"day") + expr("INTERVAL 15 DAYS")).as("cut"))
    val halves = obs.join(broadcast(cut)) // 1-row build side
      .groupBy($"item")
      .agg(sum(when($"day" < $"cut", $"n").otherwise(0L)).as("n_first"),
        sum(when($"day" >= $"cut", $"n").otherwise(0L)).as("n_second"))
    val totals = halves.agg(sum($"n_first").as("t1"), sum($"n_second").as("t2"))
    halves.join(broadcast(totals)) // 1-row build side
      .select($"item", $"n_first", $"n_second", $"t1", $"t2",
        abs(expr("CAST(n_second AS DECIMAL(38,0)) * t1 - CAST(n_first AS DECIMAL(38,0)) * t2"))
          .as("score"))
      .orderBy($"score".desc, $"item")
      .limit(topK)
      .select($"item", $"n_first", $"n_second",
        expr("round(CAST(n_first AS DOUBLE) / nullif(t1, 0), 6)").as("share_first"),
        expr("round(CAST(n_second AS DOUBLE) / nullif(t2, 0), 6)").as("share_second"),
        expr("""round(CAST(n_second AS DOUBLE) / nullif(t2, 0)
               |      - CAST(n_first AS DOUBLE) / nullif(t1, 0), 6)""".stripMargin)
          .as("share_delta"))
  }

  def heavyChangersTransform(events: DataFrame): DataFrame =
    heavyChangersFromDaily(events
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
        date_trunc("day", col("ts")).as("day"))
      .filter(col("item").isNotNull)
      .groupBy(col("item"), col("day")).agg(count(lit(1)).as("n")))

  def heavyChangers(spark: SparkSession, dir: String): DataFrame =
    heavyChangersTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[heavyChangersTransform]]. */
  val heavyChangersOracleSql: String =
    """WITH obs AS (SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
      |                    date_trunc('day', ts) AS day, count(*) AS n
      |             FROM events
      |             WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      |             GROUP BY 1, 2),
      |cut AS (SELECT min(day) + INTERVAL 15 DAY AS cut FROM obs),
      |halves AS (SELECT item,
      |                  sum(CASE WHEN day < cut.cut THEN n ELSE 0 END) AS n_first,
      |                  sum(CASE WHEN day >= cut.cut THEN n ELSE 0 END) AS n_second
      |           FROM obs, cut GROUP BY 1),
      |totals AS (SELECT sum(n_first) AS t1, sum(n_second) AS t2 FROM halves),
      |scored AS (SELECT item, n_first, n_second, t1, t2,
      |                  abs(CAST(n_second AS HUGEINT) * t1 - CAST(n_first AS HUGEINT) * t2) AS score
      |           FROM halves, totals)
      |SELECT item, CAST(n_first AS BIGINT) AS n_first, CAST(n_second AS BIGINT) AS n_second,
      |       round(CAST(n_first AS DOUBLE) / nullif(t1, 0), 6) AS share_first,
      |       round(CAST(n_second AS DOUBLE) / nullif(t2, 0), 6) AS share_second,
      |       round(CAST(n_second AS DOUBLE) / nullif(t2, 0)
      |             - CAST(n_first AS DOUBLE) / nullif(t1, 0), 6) AS share_delta
      |FROM scored ORDER BY score DESC, item LIMIT 20""".stripMargin
}
