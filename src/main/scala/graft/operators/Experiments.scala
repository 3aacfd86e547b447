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

  /** Per-user pre/post-period value sums in exact cents — the
    * experiment's unit-level table: arm assignment is a deterministic
    * hash of the unit id (here `user_id % 2`, the parity bucketing a
    * real platform replaces with a salted hash), the covariate X is
    * the user's PRE-period spend (days 1-15, before "the experiment
    * started"), the metric Y the POST-period spend (days 16+).
    * Additive under any event batching — the streaming twin's state.
    */
  private[graft] def userPrePost(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (dayofmonth(col("ts")) <= 15).as("is_pre"))
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

  def abCuped(spark: SparkSession, dir: String): DataFrame =
    cupedFromUsers(userPrePost(Tables.events(spark, dir)))

  /** DuckDB oracle for [[abCuped]] — identical sufficient statistics
    * and the identical final-division parenthesization. */
  val abCupedOracleSql: String =
    """WITH u AS (SELECT user_id,
      |  CAST(sum(CASE WHEN EXTRACT(day FROM CAST(ts AS TIMESTAMP)) <= 15
      |           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
      |  CAST(sum(CASE WHEN EXTRACT(day FROM CAST(ts AS TIMESTAMP)) > 15
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
