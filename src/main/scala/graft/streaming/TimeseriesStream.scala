package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming twins for the [[graft.operators.Timeseries]] family —
  * three more members of the state-merge family, each keeping the
  * SUFFICIENT state its statistic needs and deriving the report
  * through the batch operator's own expression tree:
  *
  *  - [[TypeDailyCountState]] → `stream_acf`: an autocorrelation is a
  *    whole-series regression (per-batch ACFs cannot merge — one
  *    late day re-centers every product), but the daily count grid is
  *    additive; report = `Timeseries.acfFromDaily`.
  *  - [[DailyVolRevState]] → `stream_rolling_corr`: same argument per
  *    window; additive `(day, x, y)` state, report =
  *    `Timeseries.corrFromDaily`.
  *  - [[SurvivalState]] → `stream_survival`: risk sets are suffix
  *    sums over ALL users' durations (a late first-view moves a
  *    user's whole duration), but the per-user `(v_day, any_p)`
  *    conditional mins and the one-row horizon max merge exactly;
  *    report = `Timeseries.survivalFromUsers`.
  *
  * All three follow the versioned-parquet + replayed-batch-guard
  * discipline ([[CdcCompact]]).
  */
final class TypeDailyCountState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, day TIMESTAMP, x BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("day")).agg(sum(col("x")).as("x"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.acfFromDaily(prior(spark))

  /** The SAME (type, day, x) grid serves the mix-drift report — one
    * state, two daily-composition faces. */
  def reportMixDrift(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.mixDriftFromDaily(prior(spark))

  /** THIRD face: day-of-week is a pure function of the day, so the
    * daily grid is a sufficient statistic for the χ² contingency
    * cells — no new state, the same additive counts. */
  def reportChi2Dow(spark: SparkSession): DataFrame =
    graft.operators.Stats.chi2FromObs(prior(spark)
      .select(col("event_type"),
        (dayofweek(col("day")) - 1).cast("long").as("dow"), col("x"))
      .groupBy(col("event_type"), col("dow")).agg(sum(col("x")).as("n")))

  /** FOURTH face: the burstiness (Fano) read over the same grid. */
  def reportFano(spark: SparkSession): DataFrame =
    graft.operators.Stats.fanoFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** FIFTH face: Spearman rank correlation between the type series —
    * rank space is a whole-series read, the counts stay additive. */
  def reportSpearman(spark: SparkSession): DataFrame =
    graft.operators.Stats.spearmanFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** SIXTH face: the Wald–Wolfowitz runs test — run boundaries are a
    * whole-series read (a late day can split or merge runs). */
  def reportRuns(spark: SparkSession): DataFrame =
    graft.operators.Stats.runsFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** SEVENTH face: Kendall τ-b between the type series. */
  def reportKendall(spark: SparkSession): DataFrame =
    graft.operators.Stats.kendallFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** EIGHTH face: the Ljung–Box portmanteau over the ACF. */
  def reportLjungBox(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.ljungBoxFromDaily(prior(spark))

  /** NINTH face: the day-of-week residual outlier screen — the
    * per-dow history is a whole-grid read, the counts are additive. */
  def reportDowResidual(spark: SparkSession): DataFrame =
    graft.operators.Stats.dowResidualFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** TENTH face: type↔weekday mutual information over the same
    * grid (dow derives from the day, the chi2FromObs route). */
  def reportMutualInfo(spark: SparkSession): DataFrame =
    graft.operators.Stats.miFromObs(prior(spark)
      .select(col("event_type"),
        (dayofweek(col("day")) - 1).cast("long").as("dow"), col("x"))
      .groupBy(col("event_type"), col("dow")).agg(sum(col("x")).as("n")))

  /** ELEVENTH face: the Jarque–Bera normality screen — the central
    * moments are whole-series reads (a late day re-centers all
    * four), but the daily counts stay additive. */
  def reportJarqueBera(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.jarqueBeraFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** TWELFTH face: the Theil–Sen robust trend — every pairwise slope
    * touches two days, so per-batch medians cannot merge; the grid
    * can. */
  def reportTheilSen(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.theilSenFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** THIRTEENTH face: the seasonal-strength η² of dow on the daily
    * counts — between/within sums are whole-grid reads, the counts
    * merge. */
  def reportSeasonalStrength(spark: SparkSession): DataFrame =
    graft.operators.Stats.seasonalStrengthFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** FOURTEENTH face: the Wilcoxon signed-rank z between type pairs —
    * signed ranks are whole-series reads (a late day re-ranks every
    * |d|), the counts merge. */
  def reportWilcoxon(spark: SparkSession): DataFrame =
    graft.operators.Stats.wilcoxonFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** FIFTEENTH face: the lagged cross-correlation between type
    * pairs — every lag overlap is a whole-series read, the counts
    * merge. */
  def reportCcf(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.ccfFromDaily(
      prior(spark).select(col("event_type"), col("day"), col("x").as("n")))

  /** SIXTEENTH face: the PACF — the Durbin–Levinson recursion is a
    * whole-correlogram read, the counts merge. */
  def reportPacf(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.pacfFromDaily(prior(spark))

  /** SEVENTEENTH face: the Friedman repeated-measures test — does
    * the type activity ORDERING hold day after day; within-day ranks
    * are a whole-grid read, the counts stay additive. */
  def reportFriedman(spark: SparkSession): DataFrame =
    graft.operators.Stats.friedmanFromDailyCounts(
      prior(spark).select(col("day"), col("event_type"), col("x")))
}

/** Additive (item, day, n) engagement grid for the adoption profile —
  * the first-seen day is a MIN over the grid, so a late micro-batch
  * that back-dates an item's launch re-dates every share correctly
  * at read time (a per-batch "first seen" would be wrong forever). */
final class ItemDayCountState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "item BIGINT, day TIMESTAMP, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
        date_trunc("day", col("ts")).as("day"))
      .filter(col("item").isNotNull)
      .groupBy(col("item"), col("day")).agg(count(lit(1)).as("n"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("item"), col("day")).agg(sum(col("n")).as("n"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("item", "day"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Behavior.adoptionFromCounts(prior(spark))

  /** SECOND face: the heavy-changers share-delta screen — the period
    * cut is a min over the same grid, so a late back-dating batch
    * re-dates the halves correctly at read time. */
  def reportHeavyChangers(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.heavyChangersFromDaily(prior(spark))
}

final class DailyVolRevState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, x BIGINT, y BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("x"), sum(col("cents")).as("y"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("day")).agg(sum(col("x")).as("x"), sum(col("y")).as("y"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.corrFromDaily(prior(spark))

  /** The SAME (day, x, y) grid serves the crossover signal — one
    * state, two daily-series faces (the ValueCountState pattern). */
  def reportMaCrossover(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.maFromDaily(prior(spark).select(col("day"), col("y")))
}

final class SurvivalState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorUsers(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, v_day TIMESTAMP, any_p TIMESTAMP"))
    else spark.read.parquet(s"$stateDir/v$version/users")

  private def priorHorizon(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "h TIMESTAMP"))
    else spark.read.parquet(s"$stateDir/v$version/horizon")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("user_id"), col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("day"))).as("b_v"),
        min(when(col("event_type") === "purchase", col("day"))).as("b_p"))
    // least(...) of a NULL and a value is the value only via
    // coalesce-wrapping: conditional mins may legitimately be NULL
    val users = priorUsers(spark).join(partial, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        least(coalesce(col("v_day"), col("b_v")), coalesce(col("b_v"), col("v_day"))).as("v_day"),
        least(coalesce(col("any_p"), col("b_p")), coalesce(col("b_p"), col("any_p"))).as("any_p"))
    val bh = batch.agg(date_trunc("day", max(col("ts"))).as("h"))
    val horizon = priorHorizon(spark).unionByName(bh)
      .agg(max(col("h")).as("h"))
    StreamUtil.writeSharded(users, s"$stateDir/v$batchId/users", Seq("user_id"))
    StreamUtil.writeGrid(horizon, s"$stateDir/v$batchId/horizon")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    // re-aggregate the one-row horizon at read time: the stored
    // parquet IS one row, but a scan can't prove that to the plan
    // audit — the max() makes the broadcast side a provable one-row
    // aggregate (the isOneRowBuild shape), at the cost of nothing
    graft.operators.Timeseries.survivalFromUsers(
      priorUsers(spark), priorHorizon(spark).agg(max(col("h")).as("h")))
}

/** Streaming time-weighted average — the SECOND cross-batch-pair
  * member (after [[TransitionState]]): the interval spanning a
  * micro-batch boundary (user's last event in batch k held until
  * their first event in batch k+1) exists in no single batch, so the
  * state is the additive daily `(n_intervals, cw, sw)` sufficient
  * sums PLUS a per-user `(ts, event_id, cents)` frontier that
  * reconstructs exactly the boundary interval — weight accrues to
  * the EARLIER event's day with the earlier event's value, the batch
  * lead-gap semantics. Report via the shared `twaFromDaily`. */
final class TwaState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorDaily(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, n_intervals BIGINT, cw DECIMAL(38,0), sw DECIMAL(38,0)"))
    else spark.read.parquet(s"$stateDir/v$version/daily")

  private def priorLast(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, p_ts TIMESTAMP, p_eid BIGINT, p_cents BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/last")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dec = "decimal(38,0)"
    val b = batch
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("w_us", lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
    val inBatch = b.filter(col("w_us").isNotNull)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("cents").cast(dec) * col("w_us")).as("cw"),
        sum(col("w_us").cast(dec)).as("sw"))
    val boundary = priorLast(spark)
      .join(b.filter(col("rn") === 1).select(col("user_id"), col("ts")), Seq("user_id"))
      .select(date_trunc("day", col("p_ts")).as("day"), col("p_cents").as("cents"),
        (unix_micros(col("ts")) - unix_micros(col("p_ts"))).as("w_us"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("cents").cast(dec) * col("w_us")).as("cw"),
        sum(col("w_us").cast(dec)).as("sw"))
    val daily = priorDaily(spark).unionByName(inBatch).unionByName(boundary)
      .groupBy(col("day"))
      .agg(sum(col("n_intervals")).as("n_intervals"),
        sum(col("cw")).cast(dec).as("cw"), sum(col("sw")).cast(dec).as("sw"))
    val bLast = b.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("cents"))).as("s"))
      .select(col("user_id"), col("s.ts").as("b_ts"),
        col("s.event_id").as("b_eid"), col("s.cents").as("b_cents"))
    val pS = struct(col("p_ts").as("ts"), col("p_eid").as("eid"), col("p_cents").as("c"))
    val bS = struct(col("b_ts").as("ts"), col("b_eid").as("eid"), col("b_cents").as("c"))
    val last = priorLast(spark).join(bLast, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("b_ts").isNull, pS)
          .when(col("p_ts").isNull, bS)
          .when(struct(col("b_ts"), col("b_eid")) >= struct(col("p_ts"), col("p_eid")), bS)
          .otherwise(pS).as("s"))
      .select(col("user_id"), col("s.ts").as("p_ts"),
        col("s.eid").as("p_eid"), col("s.c").as("p_cents"))
    StreamUtil.writeGrid(daily, s"$stateDir/v$batchId/daily")
    StreamUtil.writeSharded(last, s"$stateDir/v$batchId/last", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.twaFromDaily(priorDaily(spark))
}

object TimeseriesStream {

  /** Queries entry (oracle: same SQL as `time_weighted_value`). */
  def streamTimeWeighted(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_stwa_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TwaState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `acf_daily`). */
  def streamAcf(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sacf_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `type_mix_drift`): the SAME
    * (type, day) count state as stream_acf, second face. */
  def streamTypeMixDrift(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_smix_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportMixDrift(spark)
  }

  /** Queries entry (oracle: same SQL as `chi2_type_dow`): the SAME
    * (type, day) count state as stream_acf / stream_type_mix_drift,
    * third face. */
  def streamChi2TypeDow(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_schi2_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportChi2Dow(spark)
  }

  /** Queries entry (oracle: same SQL as `fano_factor_daily`): the
    * SAME (type, day) count state, fourth face. */
  def streamFano(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sfano_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportFano(spark)
  }

  /** Queries entry (oracle: same SQL as `spearman_daily_pairs`): the
    * SAME (type, day) count state, fifth face. */
  def streamSpearman(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sspear_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportSpearman(spark)
  }

  /** Queries entry (oracle: same SQL as `runs_test_daily`): the SAME
    * (type, day) count state, sixth face. */
  def streamRunsTest(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sruns_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportRuns(spark)
  }

  /** Queries entry (oracle: same SQL as `kendall_tau_daily`): the
    * SAME (type, day) count state, seventh face. */
  def streamKendall(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_skend_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportKendall(spark)
  }

  /** Queries entry (oracle: same SQL as `ljung_box_daily`): the SAME
    * (type, day) count state, eighth face. */
  def streamLjungBox(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_slb_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportLjungBox(spark)
  }

  /** Queries entry (oracle: same SQL as `mutual_info_type_dow`):
    * the SAME (type, day) count state, tenth face. */
  def streamMutualInfo(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_smi_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportMutualInfo(spark)
  }

  /** Queries entry (oracle: same SQL as `jarque_bera_daily`): the
    * SAME (type, day) count state, eleventh face. */
  def streamJarqueBera(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sjb_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportJarqueBera(spark)
  }

  /** Queries entry (oracle: same SQL as `theil_sen_trend`): the SAME
    * (type, day) count state, twelfth face. */
  def streamTheilSen(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sthsen_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportTheilSen(spark)
  }

  /** Queries entry (oracle: same SQL as `seasonal_strength`): the
    * SAME (type, day) count state, thirteenth face. */
  def streamSeasonalStrength(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sseas_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportSeasonalStrength(spark)
  }

  /** Queries entry (oracle: same SQL as `wilcoxon_signed_rank`): the
    * SAME (type, day) count state, fourteenth face. */
  def streamWilcoxon(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_swsr_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportWilcoxon(spark)
  }

  /** Queries entry (oracle: same SQL as `cross_correlation_daily`):
    * the SAME (type, day) count state, fifteenth face. */
  def streamCcf(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sccf_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportCcf(spark)
  }

  /** Queries entry (oracle: same SQL as `friedman_daily`): the SAME
    * (type, day) count state, seventeenth face. */
  def streamFriedman(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sfried_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportFriedman(spark)
  }

  /** Queries entry (oracle: same SQL as `pacf_daily`): the SAME
    * (type, day) count state, sixteenth face. */
  def streamPacf(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_spacf_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportPacf(spark)
  }

  /** Queries entry (oracle: same SQL as `dow_residual_outliers`):
    * the SAME (type, day) count state, ninth face. */
  def streamDowResidual(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sdowr_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new TypeDailyCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportDowResidual(spark)
  }

  /** Queries entry (oracle: same SQL as `item_adoption`). */
  def streamItemAdoption(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sadopt_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new ItemDayCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `heavy_changers`): the SAME
    * (item, day) count state, second face — order-free additive
    * counts, so no staged time ordering is needed. */
  def streamHeavyChangers(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_shvychg_")
    val state = new ItemDayCountState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportHeavyChangers(spark)
  }

  /** Queries entry (oracle: same SQL as `rolling_corr_daily`). */
  def streamRollingCorr(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_scorr_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new DailyVolRevState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `ma_crossover`): the SAME
    * daily (x, y) state as stream_rolling_corr, second face. */
  def streamMaCrossover(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_smacx_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new DailyVolRevState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportMaCrossover(spark)
  }

  /** Queries entry (oracle: same SQL as `survival_km`). */
  def streamSurvival(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_ssurv_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new SurvivalState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }
}
