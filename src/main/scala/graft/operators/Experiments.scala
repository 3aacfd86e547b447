package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Experimentation / uncertainty-quantification operators the
  * reference's engagement log feeds in production: CUPED
  * variance-reduced A/B readouts (Deng, Xu, Kohavi & Walker, WSDM
  * 2013 — the standard pre-period covariate adjustment every modern
  * experimentation platform applies before a t-test) and split
  * conformal prediction intervals (Vovk et al.; Lei et al. 2018 —
  * distribution-free coverage from calibration-split residual order
  * statistics). Both live in the repo's exact-sufficient-statistic
  * discipline: per-user / per-type state collapses map-side to exact
  * BIGINT/DECIMAL sums or counting grids, and floats appear only in
  * final one-shot divisions rounded at fixed precision (the
  * [[Behavior.abWelchTtestTransform]] contract).
  */
object Experiments {

  // ---------------------------------------------------------------
  // CUPED
  // ---------------------------------------------------------------

  /** The experiment's pre/post boundary: corpus start + 15 days — a
    * FIXED cutoff timestamp, not a day-of-month test (a
    * `dayofmonth(ts) <= 15` boundary silently resets every calendar
    * month, interleaving each month's first half into the "pre"
    * covariate on multi-month data). One-row driver probe (the
    * documented one-row-normalizer pattern); on a real platform this
    * is configuration — the experiment's start date — known a priori,
    * which is also why the streaming twin can take it as a
    * constructor parameter without breaking per-batch additivity. */
  private[graft] def preCutoff(events: DataFrame): java.sql.Timestamp = {
    val m = events.agg(min(col("ts"))).head.getTimestamp(0)
    java.sql.Timestamp.from(m.toInstant.plus(java.time.Duration.ofDays(15)))
  }

  /** Per-user pre/post-period value sums in exact cents — the
    * experiment's unit-level table: arm assignment is a deterministic
    * hash of the unit id (here `user_id % 2`, the parity bucketing a
    * real platform replaces with a salted hash), the covariate X is
    * the user's PRE-period spend (`ts < cutoff`, before "the
    * experiment started"), the metric Y the POST-period spend
    * (`ts >= cutoff`). Period membership is a pure function of the
    * event's own timestamp against the fixed cutoff, so the grid is
    * additive under any event batching — the streaming twin's state.
    */
  private[graft] def userPrePost(events: DataFrame,
                                 cutoff: java.sql.Timestamp): DataFrame =
    events
      .select(col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (col("ts") < lit(cutoff)).as("is_pre"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("is_pre"), col("cents")).otherwise(0L)).as("pre_cents"),
        sum(when(!col("is_pre"), col("cents")).otherwise(0L)).as("post_cents"))

  /** CUPED-adjusted A/B readout from the per-user (pre, post) grid.
    *
    * θ = cov(X,Y)/var(X) is estimated POOLED over both arms (the
    * standard guard: a per-arm θ reintroduces the treatment effect
    * into the adjustment), entirely from five exact sufficient
    * statistics (n, ΣX, ΣY, ΣXY, ΣX² — DECIMAL(38,0) products so the
    * sums are order-independent), then each arm reports its raw and
    * adjusted means:
    * {{{ Ŷ_cuped(arm) = mean_Y(arm) − θ·(mean_X(arm) − mean_X(pooled)) }}}
    * plus the pooled variance-reduction factor ρ²(X,Y) — the fraction
    * of metric variance the covariate removes (CUPED's whole value
    * proposition: the readout needs 1/(1−ρ²) fewer users for the same
    * power).
    *
    * Scale shape: one map-side-combinable per-user aggregate (the
    * grid), one 2-row arm rollup joined with a broadcast 1-row pooled
    * aggregate. Float appears only in the final θ/mean divisions,
    * each rounded (4dp means, 6dp θ/ρ²) — the Welch discipline.
    */
  private[graft] def cupedFromUsers(users: DataFrame): DataFrame = {
    val spark = users.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val u = users.select(
      (col("user_id") % 2).as("arm"), col("pre_cents").as("x"), col("post_cents").as("y"))
    val pooled = u.agg(
      count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum(expr(s"CAST(x AS $dec) * y")).as("sxy"),
      sum(expr(s"CAST(x AS $dec) * x")).as("sxx"),
      sum(expr(s"CAST(y AS $dec) * y")).as("syy"))
    val arms = u.groupBy($"arm").agg(
      count(lit(1)).as("n_users"), sum($"x").as("sxa"), sum($"y").as("sya"))
    arms.crossJoin(broadcast(pooled))
      .withColumn("theta_raw",
        expr("""(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
               |nullif(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx, 0)""".stripMargin))
      .select($"arm",
        $"n_users",
        round(expr("CAST(sya AS DOUBLE) / n_users"), 4).as("mean_post_cents"),
        round(expr("""CAST(sya AS DOUBLE) / n_users -
                     |theta_raw * (CAST(sxa AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n)"""
          .stripMargin), 4).as("cuped_mean_cents"),
        round($"theta_raw", 6).as("theta"),
        round(expr(
          """pow(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy, 2) /
            |nullif((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) *
            |       (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy), 0)""".stripMargin), 6)
          .as("var_reduction"))
      .orderBy($"arm")
  }

  def abCuped(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    cupedFromUsers(userPrePost(ev, preCutoff(ev)))
  }

  /** DuckDB oracle for [[abCuped]] — identical sufficient statistics
    * and the identical final-division parenthesization; the pre/post
    * cutoff mirrors [[preCutoff]]: min(ts) + 15 days. */
  val abCupedOracleSql: String =
    """WITH cut AS (SELECT min(CAST(ts AS TIMESTAMP)) + INTERVAL 15 DAY AS c FROM events),
      |u AS (SELECT user_id,
      |  CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < (SELECT c FROM cut)
      |           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
      |  CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) >= (SELECT c FROM cut)
      |           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |pooled AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |  sum(CAST(x AS HUGEINT) * y) AS sxy,
      |  sum(CAST(x AS HUGEINT) * x) AS sxx,
      |  sum(CAST(y AS HUGEINT) * y) AS syy FROM u),
      |arms AS (SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya
      |  FROM u GROUP BY 1),
      |j AS (SELECT a.*, p.*,
      |  (p.n * CAST(p.sxy AS DOUBLE) - CAST(p.sx AS DOUBLE) * p.sy) /
      |    nullif(p.n * CAST(p.sxx AS DOUBLE) - CAST(p.sx AS DOUBLE) * p.sx, 0) AS theta_raw
      |  FROM arms a CROSS JOIN pooled p)
      |SELECT arm, n_users,
      |  round(CAST(sya AS DOUBLE) / n_users, 4) AS mean_post_cents,
      |  round(CAST(sya AS DOUBLE) / n_users -
      |        theta_raw * (CAST(sxa AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n), 4) AS cuped_mean_cents,
      |  round(theta_raw, 6) AS theta,
      |  round(pow(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy, 2) /
      |        nullif((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) *
      |               (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy), 0), 6) AS var_reduction
      |FROM j ORDER BY arm""".stripMargin

  // ---------------------------------------------------------------
  // Sample-ratio mismatch
  // ---------------------------------------------------------------

  /** Sample-ratio mismatch check — the FIRST gate any experiment
    * readout must pass (Fabijan et al. 2019: a biased assignment
    * invalidates every downstream metric, and SRM is the most common
    * way experiments silently rot): χ² goodness-of-fit of the
    * per-arm UNIT counts against the designed 50/50 split. For two
    * cells with E = n/2 the statistic collapses to the exact rational
    * {{{ χ² = (n₀ − n₁)² / n }}}
    * — integer numerator, one final division (6dp). Flagged at the
    * conventional p < 0.001 (1 df) threshold χ² > 10.83: an SRM alarm
    * must be LOUD and rare, not a p=0.04 nag.
    *
    * Shape: a distinct-user aggregate (map-side combinable) to 2
    * rows, then a 1-row fold. */
  private[graft] def srmFromUsers(users: DataFrame): DataFrame = {
    val spark = users.sparkSession
    import spark.implicits._
    users.select((col("user_id") % 2).as("arm"))
      .groupBy($"arm").agg(count(lit(1)).as("n"))
      .agg(sum($"n").as("n_users"),
        sum(when($"arm" === 0L, $"n").otherwise(0L)).as("n_arm0"),
        sum(when($"arm" === 1L, $"n").otherwise(0L)).as("n_arm1"))
      .withColumn("chi2", round(expr(
        "CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE) / n_users"), 6))
      .select($"n_users", $"n_arm0", $"n_arm1", $"chi2",
        ($"chi2" > 10.83).as("srm_flag"))
  }

  def abSrmCheck(spark: SparkSession, dir: String): DataFrame =
    srmFromUsers(Tables.events(spark, dir).select(col("user_id")).distinct())

  /** DuckDB oracle for [[abSrmCheck]]. */
  val abSrmOracleSql: String =
    """WITH a AS (SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n
      |           FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_users,
      |             CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n_arm0,
      |             CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n_arm1
      |      FROM a)
      |SELECT n_users, n_arm0, n_arm1,
      |       round(CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE) / n_users, 6) AS chi2,
      |       round(CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE) / n_users, 6) > 10.83 AS srm_flag
      |FROM t""".stripMargin

  // ---------------------------------------------------------------
  // Post-stratified treatment effect
  // ---------------------------------------------------------------

  /** Post-stratified average treatment effect — the covariate-
    * adjustment that survives NON-LINEAR confounding where CUPED's
    * single θ cannot (stratification needs no functional form;
    * Imbens & Rubin 2015 ch. 17): units are binned into pre-period
    * spend deciles (the propensity proxy), the arm contrast is taken
    * WITHIN each stratum, and the per-stratum weight n_d/n
    * reconstructs the population effect.
    *
    * Strata come from the EXACT global rank under the total order
    * (pre_cents DESC, user_id) — the distributed
    * [[GlobalRank.withGlobalOrder]] slice rank, never a single-task
    * window. Output per stratum: sizes, per-arm means (4dp), the
    * within-stratum difference, and the stratum's weight share; the
    * weighted ATE is the Σ w·diff fold the caller reads off. A
    * stratum missing an arm reports NULL difference (surfaced, not
    * dropped). */
  private[graft] def stratifiedAteFromUsers(users: DataFrame): DataFrame = {
    val spark = users.sparkSession
    import spark.implicits._
    val ranked = GlobalRank.withGlobalOrder(users, Seq($"pre_cents".desc, $"user_id"))
      .withColumn("stratum", expr("(grk - 1) * 10 div n_total") + 1L)
      .withColumn("arm", $"user_id" % 2)
    ranked.groupBy($"stratum")
      .agg(count(lit(1)).as("n_d"),
        first($"n_total").as("n_total"),
        sum(when($"arm" === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when($"arm" === 1L, $"post_cents").otherwise(0L)).as("s1"),
        sum(when($"arm" === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when($"arm" === 0L, $"post_cents").otherwise(0L)).as("s0"))
      .select($"stratum", $"n_d", $"n1", $"n0",
        round(expr("CAST(s1 AS DOUBLE) / nullif(n1, 0)"), 4).as("mean1_cents"),
        round(expr("CAST(s0 AS DOUBLE) / nullif(n0, 0)"), 4).as("mean0_cents"),
        round(expr("CAST(s1 AS DOUBLE) / nullif(n1, 0) - CAST(s0 AS DOUBLE) / nullif(n0, 0)"), 4)
          .as("diff_cents"),
        round(expr("CAST(n_d AS DOUBLE) / n_total"), 6).as("weight"))
      .orderBy($"stratum")
  }

  def stratifiedAte(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    stratifiedAteFromUsers(userPrePost(ev, preCutoff(ev)))
  }

  /** DuckDB oracle for [[stratifiedAte]] — plain row_number rank
    * (the semantics GlobalRank reproduces distributed); pre/post
    * cutoff mirrors [[preCutoff]]: min(ts) + 15 days. */
  val stratifiedAteOracleSql: String =
    """WITH cut AS (SELECT min(CAST(ts AS TIMESTAMP)) + INTERVAL 15 DAY AS c FROM events),
      |u AS (SELECT user_id,
      |  CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < (SELECT c FROM cut)
      |           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
      |  CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) >= (SELECT c FROM cut)
      |           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |r AS (SELECT user_id % 2 AS arm, y,
      |             (row_number() OVER (ORDER BY x DESC, user_id) - 1) * 10
      |               // (SELECT count(*) FROM u) + 1 AS stratum,
      |             (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_total
      |      FROM u),
      |g AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_d, max(n_total) AS n_total,
      |             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |             CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
      |             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |             CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS s0
      |      FROM r GROUP BY 1)
      |SELECT CAST(stratum AS BIGINT) AS stratum, n_d, n1, n0,
      |       round(CAST(s1 AS DOUBLE) / nullif(n1, 0), 4) AS mean1_cents,
      |       round(CAST(s0 AS DOUBLE) / nullif(n0, 0), 4) AS mean0_cents,
      |       round(CAST(s1 AS DOUBLE) / nullif(n1, 0) - CAST(s0 AS DOUBLE) / nullif(n0, 0), 4) AS diff_cents,
      |       round(CAST(n_d AS DOUBLE) / n_total, 6) AS weight
      |FROM g ORDER BY stratum""".stripMargin

  // ---------------------------------------------------------------
  // Peeking curve (daily cumulative z)
  // ---------------------------------------------------------------

  /** The additive per-(arm, day) moments grid both peeking faces
    * derive from. */
  private[graft] def peekingGrid(events: DataFrame): DataFrame =
    events
      .select((col("user_id") % 2).as("arm"),
        date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("arm"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s1"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("s2"))

  /** The peeking curve — the daily CUMULATIVE Welch z an impatient
    * experimenter reads every morning: the textbook demonstration of
    * why unadjusted sequential looks inflate false positives (each
    * day's |z| > 1.96 is a "significant!" temptation; the curve makes
    * the multiplicity visible and is the input any alpha-spending
    * boundary is checked against). Per day, both arms' moments
    * accumulate as exact prefix sums (BIGINT/DECIMAL(38,0)) and the
    * z statistic is [[Behavior.abWelchTtestTransform]]'s formula on
    * the cumulative stats, with the information fraction n_cum/n
    * alongside.
    *
    * Shape: the daily grid is map-side combinable; prefix sums are
    * per-arm windows over |days| rows; the arm pivot is a |days|-row
    * join. */
  private[graft] def peekingFromGrid(grid: DataFrame): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val cum = Window.partitionBy($"arm").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = grid
      .withColumn("cn", sum($"n").over(cum))
      .withColumn("cs1", sum($"s1").over(cum))
      .withColumn("cs2", sum($"s2").over(cum))
    val a1 = c.filter($"arm" === 1L)
      .select($"day", $"cn".as("n1"), $"cs1".as("a1"), $"cs2".as("b1"))
    val a0 = c.filter($"arm" === 0L)
      .select($"day", $"cn".as("n0"), $"cs1".as("a0"), $"cs2".as("b0"))
    val total = grid.agg(sum($"n").as("n_final"))
    a1.join(a0, Seq("day"))
      .filter($"n1" >= 2L && $"n0" >= 2L)
      .crossJoin(broadcast(total))
      .select($"day", $"n0", $"n1",
        round(expr(
          """(CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0) /
            |nullif(sqrt((CAST(b1 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1) / (n1 - 1) / n1 +
            |            (CAST(b0 AS DOUBLE) - CAST(a0 AS DOUBLE) * a0 / n0) / (n0 - 1) / n0), 0)"""
            .stripMargin), 4).as("z_welch"),
        round(expr("CAST(n0 + n1 AS DOUBLE) / n_final"), 6).as("info_frac"))
      .orderBy($"day")
  }

  def abPeekingCurve(spark: SparkSession, dir: String): DataFrame =
    peekingFromGrid(peekingGrid(Tables.events(spark, dir)))

  /** DuckDB oracle for [[abPeekingCurve]] — identical prefix sums and
    * the identical Welch parenthesization. */
  val abPeekingOracleSql: String =
    """WITH g AS (SELECT user_id % 2 AS arm, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  CAST(count(*) AS BIGINT) AS n,
      |                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
      |                  sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
      |                      * CAST(round(value * 100) AS BIGINT)) AS s2
      |           FROM events GROUP BY 1, 2),
      |c AS (SELECT *, CAST(sum(n) OVER w AS BIGINT) AS cn,
      |             CAST(sum(s1) OVER w AS BIGINT) AS cs1,
      |             sum(s2) OVER w AS cs2
      |      FROM g WINDOW w AS (PARTITION BY arm ORDER BY day
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_final FROM g),
      |j AS (SELECT o.day, o.cn AS n0, i.cn AS n1,
      |             i.cs1 AS a1, i.cs2 AS b1, o.cs1 AS a0, o.cs2 AS b0
      |      FROM (SELECT * FROM c WHERE arm = 1) i
      |      JOIN (SELECT * FROM c WHERE arm = 0) o USING (day)
      |      WHERE i.cn >= 2 AND o.cn >= 2)
      |SELECT day, n0, n1,
      |       round((CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0) /
      |             nullif(sqrt((CAST(b1 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1) / (n1 - 1) / n1 +
      |                         (CAST(b0 AS DOUBLE) - CAST(a0 AS DOUBLE) * a0 / n0) / (n0 - 1) / n0), 0), 4) AS z_welch,
      |       round(CAST(n0 + n1 AS DOUBLE) / t.n_final, 6) AS info_frac
      |FROM j CROSS JOIN t ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // Quantile treatment effects
  // ---------------------------------------------------------------

  /** The additive per-arm value grid both QTE faces derive from. */
  private[graft] def armCentsGrid(events: DataFrame): DataFrame =
    events
      .select((col("user_id") % 2).as("arm"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("arm"), col("cents"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile treatment effects at the deciles — the DISTRIBUTIONAL
    * A/B readout next to [[cupedFromUsers]]'s mean shift: a treatment
    * that fattens the tail while thinning the middle nets to zero in
    * the mean but shows immediately as a tilted QTE curve. Per decile
    * q ∈ {10..90}, the exact ⌈q·n/100⌉-th order statistic of event
    * value per arm (the winsorized/rolling-p95 integer rank
    * discipline — no interpolation semantics to disagree on), and
    * their difference.
    *
    * Shape: everything on the (arm, cents) counting grid —
    * cumulative-window reads over value-cardinality rows ×9 decile
    * probes, then a 9-row pivot. Never a per-row global sort. */
  private[graft] def qteFromGrid(grid: DataFrame): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val byVal = Window.partitionBy($"arm").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy($"arm")
    val qs = (10L to 90L by 10L).map(lit(_))
    grid
      .withColumn("cum", sum($"cnt").over(byVal))
      .withColumn("n", sum($"cnt").over(whole))
      .select($"arm", $"cents", $"cum", $"n", explode(array(qs: _*)).as("q"))
      .withColumn("k", expr("(n * q + 99) div 100"))
      .groupBy($"q", $"arm")
      .agg(min(when($"cum" >= $"k", $"cents")).as("q_cents"))
      .groupBy($"q")
      .agg(min(when($"arm" === 0L, $"q_cents")).as("arm0_cents"),
        min(when($"arm" === 1L, $"q_cents")).as("arm1_cents"))
      .withColumn("qte_cents", $"arm1_cents" - $"arm0_cents")
      .orderBy($"q")
  }

  def qteDeciles(spark: SparkSession, dir: String): DataFrame =
    qteFromGrid(armCentsGrid(Tables.events(spark, dir)))

  /** DuckDB oracle for [[qteDeciles]] — same grid, same rank
    * arithmetic, same decile probes. */
  val qteOracleSql: String =
    """WITH g AS (SELECT user_id % 2 AS arm, CAST(round(value * 100) AS BIGINT) AS cents,
      |                  CAST(count(*) AS BIGINT) AS cnt
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY arm ORDER BY cents) AS BIGINT) AS cum,
      |             CAST(sum(cnt) OVER (PARTITION BY arm) AS BIGINT) AS n
      |      FROM g),
      |p AS (SELECT w.*, q.q, (w.n * q.q + 99) // 100 AS k
      |      FROM w CROSS JOIN (SELECT CAST(unnest([10,20,30,40,50,60,70,80,90]) AS BIGINT) AS q) q),
      |c AS (SELECT q, arm, min(CASE WHEN cum >= k THEN cents END) AS q_cents
      |      FROM p GROUP BY 1, 2),
      |f AS (SELECT q, min(CASE WHEN arm = 0 THEN q_cents END) AS arm0_cents,
      |             min(CASE WHEN arm = 1 THEN q_cents END) AS arm1_cents
      |      FROM c GROUP BY 1)
      |SELECT q, arm0_cents, arm1_cents, arm1_cents - arm0_cents AS qte_cents
      |FROM f ORDER BY q""".stripMargin

  // ---------------------------------------------------------------
  // Off-policy evaluation (IPS / SNIPS)
  // ---------------------------------------------------------------

  /** Off-policy evaluation of a TARGET action policy from the logged
    * event stream (inverse-propensity scoring, Horvitz & Thompson
    * 1952 via Bottou et al. 2013; self-normalized variant per
    * Swaminathan & Joachims 2015) — the counterfactual readout a
    * recommender team wants BEFORE an online test: "what would mean
    * reward have been under the new action distribution?". Actions =
    * event types; logging propensity π₀(t) = its empirical share;
    * target π₁ boosts 'purchase' to probability ½ and splits the
    * rest uniformly. Reports V_logging (observed mean cents), V_IPS,
    * V_SNIPS (weight-normalized — the variance-reduced estimator that
    * tolerates propensity misfit), and the effective sample size
    * (Σw)²/Σw² — the honesty number that says how many logged events
    * actually back the counterfactual.
    *
    * Exactness: per-type weights/terms are computed once on the
    * |types|-row sufficient table and quantized to DECIMAL(38,9)
    * BEFORE the cross-type sums (the `jackknife_ratio` discipline —
    * double addition order never matters), finals rounded 4dp.
    *
    * Shape: one map-side-combinable grid collapse, then |types|-row
    * arithmetic — collect-free, scale-invariant. */
  private[graft] def offpolicyFromGrid(grid: DataFrame): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val dec = "DECIMAL(38,9)"
    val types = grid.groupBy($"event_type")
      .agg(sum(expr("cents * c")).as("s_t"), sum($"c").as("n_t"))
    val tot = types.agg(count(lit(1)).as("n_types"),
      sum($"n_t").as("n"), sum($"s_t").as("s"))
    types.crossJoin(broadcast(tot))
      .withColumn("pi1", expr(
        "CASE WHEN event_type = 'purchase' THEN 0.5 " +
          "WHEN n_types > 1 THEN 0.5 / (n_types - 1) ELSE 0.5 END"))
      .withColumn("w", expr("pi1 * n / n_t"))
      .select($"n_types", $"n", $"s",
        expr(s"CAST(round(CAST(s_t AS DOUBLE) * w, 9) AS $dec)").as("swt"),
        expr(s"CAST(round(n_t * w, 9) AS $dec)").as("nwt"),
        expr(s"CAST(round(n_t * w * w, 9) AS $dec)").as("nw2t"))
      .groupBy($"n_types", $"n", $"s")
      .agg(sum($"swt").as("sw"), sum($"nwt").as("nw"), sum($"nw2t").as("nw2"))
      .select($"n", $"n_types",
        round(expr("CAST(s AS DOUBLE) / n"), 4).as("v_logging"),
        round(expr("CAST(sw AS DOUBLE) / n"), 4).as("v_ips"),
        round(expr("CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE)"), 4).as("v_snips"),
        round(expr("CAST(nw AS DOUBLE) * CAST(nw AS DOUBLE) / CAST(nw2 AS DOUBLE)"), 4)
          .as("ess"))
  }

  def offpolicyEval(spark: SparkSession, dir: String): DataFrame =
    offpolicyFromGrid(Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("c")))

  /** DuckDB oracle for [[offpolicyEval]] — identical per-type terms,
    * 1e-9 quantization, and final parenthesization. */
  val offpolicyOracleSql: String =
    """WITH g AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY 1, 2),
      |ty AS (SELECT event_type, CAST(sum(cents * c) AS BIGINT) AS s_t,
      |              CAST(sum(c) AS BIGINT) AS n_t
      |       FROM g GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
      |               CAST(sum(n_t) AS BIGINT) AS n, CAST(sum(s_t) AS BIGINT) AS s
      |        FROM ty),
      |w AS (SELECT ty.*, tot.n_types, tot.n, tot.s,
      |             (CASE WHEN event_type = 'purchase' THEN 0.5
      |                   WHEN tot.n_types > 1 THEN 0.5 / (tot.n_types - 1)
      |                   ELSE 0.5 END) * tot.n / ty.n_t AS w
      |      FROM ty CROSS JOIN tot),
      |q AS (SELECT n_types, n, s,
      |             CAST(round(CAST(s_t AS DOUBLE) * w, 9) AS DECIMAL(38,9)) AS swt,
      |             CAST(round(n_t * w, 9) AS DECIMAL(38,9)) AS nwt,
      |             CAST(round(n_t * w * w, 9) AS DECIMAL(38,9)) AS nw2t
      |      FROM w),
      |a AS (SELECT n_types, n, s, sum(swt) AS sw, sum(nwt) AS nw, sum(nw2t) AS nw2
      |      FROM q GROUP BY 1, 2, 3)
      |SELECT n, n_types,
      |       round(CAST(s AS DOUBLE) / n, 4) AS v_logging,
      |       round(CAST(sw AS DOUBLE) / n, 4) AS v_ips,
      |       round(CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE), 4) AS v_snips,
      |       round(CAST(nw AS DOUBLE) * CAST(nw AS DOUBLE) / CAST(nw2 AS DOUBLE), 4) AS ess
      |FROM a""".stripMargin

  // ---------------------------------------------------------------
  // k-anonymity / l-diversity release gate
  // ---------------------------------------------------------------

  /** The additive per-(QI-cell, user) grid both anonymity faces
    * derive from: quasi-identifiers are (event_type, day-of-week,
    * value bucket) — the release-table projection — and the grid
    * keeps per-cell-per-user record counts (n_records = Σc is
    * additive; n_users = per-cell key count is idempotent under the
    * user dimension). */
  private[graft] def anonymityGrid(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        // Spark dayofweek: 1=Sunday; −1 aligns with DuckDB's dow (0=Sunday)
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        // Floor division via the pmod shift: Spark's `div` truncates
        // toward zero while DuckDB's `//` floors, so a bare `div 1000`
        // would assign negative values (refunds) to a different QI
        // cell than the oracle. (cents − pmod(cents,1000)) is the
        // largest multiple of 1000 ≤ cents, exact in BIGINT.
        expr("""(CAST(round(value * 100) AS BIGINT)
               | - pmod(CAST(round(value * 100) AS BIGINT), 1000)) div 1000"""
          .stripMargin).as("cents_bucket"),
        col("user_id"))
      .groupBy(col("event_type"), col("dow"), col("cents_bucket"), col("user_id"))
      .agg(count(lit(1)).as("c"))

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * et al. 2007) — the release gate a training-data pipeline runs
    * BEFORE publishing an event-level extract: every quasi-identifier
    * cell (type, day-of-week, 10-unit value bucket) reports its
    * record count (k-anonymity: a cell with < k records re-identifies
    * by linkage) and its DISTINCT-user count (l-diversity: a cell
    * whose records all belong to one user leaks even at high k).
    * Flags at the conventional k = 5 and l = 3.
    *
    * Shape: everything on the QI×user grid — n_records is a map-side
    * combinable sum, n_users a per-cell key count; output is
    * QI-cardinality rows (bounded by types × 7 × buckets, not data
    * volume). */
  private[graft] def kAnonymityFromGrid(grid: DataFrame): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    grid.groupBy($"event_type", $"dow", $"cents_bucket")
      .agg(sum($"c").as("n_records"), count(lit(1)).as("n_users"))
      .select($"event_type", $"dow", $"cents_bucket", $"n_records", $"n_users",
        ($"n_records" >= 5L).as("k_anon_5"),
        ($"n_users" >= 3L).as("l_div_3"))
      .orderBy($"event_type", $"dow", $"cents_bucket")
  }

  def kAnonymityCheck(spark: SparkSession, dir: String): DataFrame =
    kAnonymityFromGrid(anonymityGrid(Tables.events(spark, dir)))

  /** DuckDB oracle for [[kAnonymityCheck]]. */
  val kAnonymityOracleSql: String =
    """WITH g AS (SELECT event_type,
      |                  CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
      |                  CAST(round(value * 100) AS BIGINT) // 1000 AS cents_bucket,
      |                  user_id, count(*) AS c
      |           FROM events GROUP BY 1, 2, 3, 4)
      |SELECT event_type, dow, cents_bucket,
      |       CAST(sum(c) AS BIGINT) AS n_records,
      |       CAST(count(*) AS BIGINT) AS n_users,
      |       sum(c) >= 5 AS k_anon_5, count(*) >= 3 AS l_div_3
      |FROM g GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------
  // Split conformal prediction intervals
  // ---------------------------------------------------------------

  /** The additive state both conformal faces derive from: per
    * (event_type, split, cents) counts, where split is the
    * deterministic even/odd `event_id` partition (train fits the
    * center, calibration supplies the residual order statistics).
    * Counting-grid, value-cardinality rows — the boxplot/winsorized
    * state shape. */
  private[graft] def conformalGrid(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        (col("event_id") % 2 === 0L).as("is_train"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("is_train"), col("cents"))
      .agg(count(lit(1)).as("cnt"))

  /** Split conformal interval per event type at miscoverage α = 10%:
    * the train split fixes the point predictor (here the truncated
    * integer mean `Σcents div n` — exact, engine-agnostic), the
    * calibration split supplies nonconformity scores |y − center|
    * (exact integers), and the interval half-width is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual — the rank
    * whose coverage guarantee P(Y ∈ interval) ≥ 1−α is
    * distribution-free (Lei et al. 2018, eq. 2.2). k > n_cal (tiny
    * calibration sets) degenerates to an unbounded interval, surfaced
    * as NULL bounds rather than a silent clamp.
    *
    * Scale shape: everything runs on the counting grid — residual
    * order statistics are cumulative-count window reads over
    * value-cardinality rows (the winsorized/boxplot discipline),
    * never a per-row global sort. */
  private[graft] def conformalFromGrid(grid: DataFrame, alphaPct: Long = 10L): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val centers = grid.filter($"is_train")
      .groupBy($"event_type")
      .agg(expr("sum(cents * cnt) div sum(cnt)").as("center_cents"),
        sum($"cnt").as("n_train"))
    val resid = grid.filter(!$"is_train")
      .join(broadcast(centers), Seq("event_type"))
      .select($"event_type", $"n_train", $"center_cents",
        abs($"cents" - $"center_cents").as("r"), $"cnt")
      .groupBy($"event_type", $"n_train", $"center_cents", $"r")
      .agg(sum($"cnt").as("cnt"))
    val byR = Window.partitionBy($"event_type").orderBy($"r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy($"event_type")
    resid
      .withColumn("cum", sum($"cnt").over(byR))
      .withColumn("n_cal", sum($"cnt").over(whole))
      .withColumn("k", expr(s"((n_cal + 1) * (100 - $alphaPct) + 99) div 100"))
      .groupBy($"event_type", $"n_train", $"center_cents", $"n_cal", $"k")
      .agg(min(when($"cum" >= $"k", $"r")).as("q_cents"))
      .select($"event_type", $"n_train", $"n_cal", $"center_cents",
        when($"k" <= $"n_cal", $"q_cents").as("half_width_cents"),
        when($"k" <= $"n_cal", $"center_cents" - $"q_cents").as("lo_cents"),
        when($"k" <= $"n_cal", $"center_cents" + $"q_cents").as("hi_cents"))
      .orderBy($"event_type")
  }

  def conformalInterval(spark: SparkSession, dir: String): DataFrame =
    conformalFromGrid(conformalGrid(Tables.events(spark, dir)))

  /** DuckDB oracle for [[conformalInterval]] — same grid, same rank
    * arithmetic. */
  val conformalOracleSql: String =
    """WITH g AS (SELECT event_type, event_id % 2 = 0 AS is_train,
      |                  CAST(round(value * 100) AS BIGINT) AS cents, count(*) AS cnt
      |           FROM events GROUP BY 1, 2, 3),
      |c AS (SELECT event_type,
      |             CAST(sum(cents * cnt) // sum(cnt) AS BIGINT) AS center_cents,
      |             CAST(sum(cnt) AS BIGINT) AS n_train
      |      FROM g WHERE is_train GROUP BY 1),
      |r AS (SELECT g.event_type, c.n_train, c.center_cents,
      |             abs(g.cents - c.center_cents) AS r, CAST(sum(g.cnt) AS BIGINT) AS cnt
      |      FROM g JOIN c USING (event_type) WHERE NOT g.is_train
      |      GROUP BY 1, 2, 3, 4),
      |w AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY r) AS BIGINT) AS cum,
      |             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_cal
      |      FROM r),
      |k AS (SELECT *, ((n_cal + 1) * 90 + 99) // 100 AS k FROM w)
      |SELECT event_type, n_train, n_cal, center_cents,
      |       CASE WHEN k <= n_cal THEN min(CASE WHEN cum >= k THEN r END) END AS half_width_cents,
      |       CASE WHEN k <= n_cal THEN center_cents - min(CASE WHEN cum >= k THEN r END) END AS lo_cents,
      |       CASE WHEN k <= n_cal THEN center_cents + min(CASE WHEN cum >= k THEN r END) END AS hi_cents
      |FROM k GROUP BY event_type, n_train, n_cal, center_cents, k
      |ORDER BY event_type""".stripMargin
}
