package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming statistical moments: per event type, the additive
  * sufficient statistics `(n, Σx, Σx²)` maintained incrementally
  * across micro-batches — the streaming half of
  * [[graft.operators.Behavior.anomalyTransform]]'s two-pass z-score
  * screen, and the canonical "mergeable aggregation state" shape
  * (ClickHouse `AggregatingMergeTree` avgState/varState analog) for
  * a metrics feed.
  *
  * Exactness: values scale to integer CENTS, so Σx and Σx² are Long
  * sums — order-independent and replay-stable — and mean/stddev are
  * derived from the exact integers only in the final report, with an
  * expression shape the DuckDB oracle mirrors literally. A per-batch
  * float accumulation would drift; integer moments cannot.
  *
  * State is |event types| rows, versioned per batch with the
  * [[graft.streaming.CdcCompact]]-family `batchId ≤ version` replay
  * guard (a cumulative sum is not idempotent under micro-batch
  * replay). Merging is a full-outer coalesce-add, so types appearing
  * for the first time mid-stream just materialize.
  *
  * Scale: per batch the stream collapses map-side to |types| moment
  * rows; the state read/write is metadata-scale. Σx² headroom: cents
  * ≤ 10⁵ squared is 10¹⁰ per row — Long overflows past ~9·10⁸ rows
  * per type; a 100 TB deployment promotes sumsq to DECIMAL(38,0)
  * (or shards the state by ingest partition) — at bench scale the
  * Long path is exact and 4× cheaper.
  */
final class MomentsState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, n BIGINT, sum_c BIGINT, sumsq_c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val cents = round(col("value") * 100).cast("long")
    val partial = batch
      .select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"),
           sum(col("c") * col("c")).as("sumsq_c"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"),
           sum(col("sumsq_c")).as("sumsq_c"))
    // Loud-fail overflow invariant (round-5 advice): the scaladoc's
    // ~9·10⁸-rows-per-type Σx² ceiling was documented but unenforced —
    // past it the state would corrupt silently. A Long overflow of a
    // sum of positives shows up as a negative (or an n beyond the
    // documented ceiling); raise_error inside the filter condition
    // survives column pruning and costs one comparison per state row.
    val guarded = merged.filter(
      when(col("sumsq_c") < 0 || col("sum_c") < 0 || col("n") > 900000000L,
        raise_error(concat(lit("MomentsState Long overflow for event_type="),
          col("event_type"), lit(" — promote sumsq_c to DECIMAL(38,0)"))))
      .otherwise(lit(true)))
    StreamUtil.writeGrid(guarded, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  /** Mean / sample stddev derived from the exact integer moments.
    * The expression shape (casts, operation order, /100 scaling)
    * matches the oracle literally so the doubles agree bit-for-bit;
    * degenerate n ≤ 1 groups report a null sd rather than a
    * divide-by-zero Infinity.
    */
  def report(spark: SparkSession): DataFrame =
    prior(spark)
      .select(col("event_type"), col("n"),
        round((col("sum_c") / 100.0) / col("n"), 4).as("mean"),
        when(col("n") > 1,
          round(sqrt((col("sumsq_c") - col("sum_c").cast("double") * col("sum_c") / col("n"))
            / (col("n") - 1)) / 100.0, 4)).as("sd"))
      .orderBy(col("event_type"))

  /** SECOND face: the one-way ANOVA omnibus F over the same additive
    * per-type moments — the between/within decomposition is a
    * whole-state read, but (n, Σc, Σc²) is exactly its sufficient
    * statistic ([[graft.operators.Stats.anovaFromMoments]]). The
    * state stores sumsq_c as BIGINT; the rollup's DECIMAL(38,9)
    * terms widen it before any cross-type arithmetic. */
  def reportAnova(spark: SparkSession): DataFrame =
    graft.operators.Stats.anovaFromMoments(prior(spark))
}

object MomentsStream {

  /** Queries entry: the full feed replayed through the incremental
    * moments state, reported as per-type n/mean/sd (oracle: the same
    * formula over the whole corpus in one pass — additive state makes
    * batch boundaries invisible, no ordering staging needed).
    */
  /** Queries entry (oracle: same SQL as `anova_f_cents`): the SAME
    * per-type moments state as `stream_moments`, second face. */
  def streamAnova(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sanova_")
    val state = new MomentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportAnova(spark)
  }

  def streamMoments(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_moments_")
    val state = new MomentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }
}

/** Streaming incremental rollup — [[graft.operators.Olap
  * .incrementalRollup]]'s streaming twin, closing the
  * materialized-view-maintenance story across batch and stream: the
  * per-(day, event_type) daily rollup maintained by merging each
  * micro-batch's partial aggregate into versioned state (additive
  * Long metrics, [[MomentsState]]'s replay guard). Late rows for any
  * old day fold in exactly like the batch operator's delta MERGE —
  * there is no watermark cut-off because the state keys on day, not
  * on open windows; a deployment bounds state by archiving days past
  * the lateness horizon to the serving store.
  */
final class RollupState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, event_type STRING, n BIGINT, cents BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def view(spark: SparkSession): DataFrame =
    prior(spark).orderBy(col("day"), col("event_type"))

  /** SECOND face: the wide type × day-of-week pivot — dow is a pure
    * function of the rollup's day key, so the BI pivot is a read
    * over the same additive daily grid. */
  def pivotTypeDow(spark: SparkSession): DataFrame =
    graft.operators.Olap.pivotFromTypeDow(
      prior(spark)
        .select(col("event_type"),
          (dayofweek(col("day")) - 1).cast("long").as("dow"), col("n"))
        .groupBy(col("event_type"), col("dow")).agg(sum(col("n")).as("n")))
}

object RollupStream {

  /** Queries entry: oracle = the same full recompute that gates
    * `incremental_rollup` (additivity makes batch boundaries
    * invisible). */
  def streamRollup(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_rollup_")
    val state = new RollupState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.view(spark)
  }

  /** Queries entry (oracle: same SQL as `pivot_type_dow`): the SAME
    * daily rollup state, second face. */
  def streamPivotTypeDow(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_spivot_")
    val state = new RollupState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.pivotTypeDow(spark)
  }
}

/** Streaming daily modal item —
  * [[graft.operators.Behavior.modeDailyItemTransform]]'s twin: the
  * (day, item, n) count table is the additive state (the mode itself
  * is NOT additive — a per-batch mode cannot be merged, which is
  * exactly why the state must be the sufficient counts, the
  * `uniqState`-style lesson this family keeps re-proving), maintained
  * with [[MomentsState]]'s `batchId ≤ version` replay guard; the mode
  * is derived at report time through
  * [[graft.operators.Behavior.modeFromDailyCounts]] — the identical
  * expression tree the batch operator runs, so stream equals batch
  * row-for-row regardless of how batches split or ties land.
  *
  * State is (days × items) rows — bounded by key cardinality, not
  * input volume; late rows fold into their (old) day like
  * [[RollupState]].
  */
final class DailyModeState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, item BIGINT, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(date_trunc("day", col("ts")).as("day"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .groupBy(col("day"), col("item"))
      .agg(count(lit(1)).as("n"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("day"), col("item"))
      .agg(sum(col("n")).as("n"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("day", "item"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def mode(spark: SparkSession): DataFrame =
    graft.operators.Behavior.modeFromDailyCounts(prior(spark))
}

/** Streaming corpus-drift state —
  * [[graft.operators.TextOps.sourceDriftTvTransform]]'s twin: the
  * (source, tok, n) unigram count table is the additive sufficient
  * state (a TV distance is NOT additive — per-batch TVs cannot merge,
  * same non-additive-metric lesson as [[DailyModeState]]), maintained
  * with the `batchId ≤ version` replay guard; the pairwise TV report
  * derives at read time through
  * [[graft.operators.TextOps.sourceDriftFromCounts]] — the identical
  * expression tree the batch operator runs, so stream equals batch
  * bit-for-bit regardless of how document batches split.
  *
  * State is (sources × vocab) rows — bounded by vocabulary, not
  * document volume, but a 100 TB web corpus's vocabulary is itself
  * data-scale, so the state write is hash-sharded on (source, tok).
  */
final class DriftState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "source STRING, tok STRING, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("source"), col("tok"))
      .agg(sum(col("n")).as("n"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("source", "tok"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def drift(spark: SparkSession): DataFrame =
    graft.operators.TextOps.sourceDriftFromCounts(prior(spark))
}

object DriftStream {

  /** Queries entry: oracle = the same SQL that gates
    * `source_drift_tv` (sufficient-count state + shared TV
    * derivation make batch boundaries invisible). */
  def streamSourceDrift(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_drift_")
    val state = new DriftState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.documents(spark, dir), state.merge)
    state.drift(spark)
  }
}

/** Streaming changepoint state —
  * [[graft.operators.Behavior.changepointCusumTransform]]'s twin:
  * the (day, n) daily count table is the additive sufficient state
  * (a CUSUM argmax is NOT additive — every new batch can move the
  * changepoint anywhere in history, so per-batch changepoints cannot
  * merge), replay-guarded; the CUSUM report derives at read time
  * through [[graft.operators.Behavior.changepointFromDaily]] — the
  * identical expression tree the batch operator runs. State is
  * |days| rows; late rows fold into their (old) day.
  */
final class DailyCountState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(date_trunc("day", col("ts")).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("day"))
      .agg(sum(col("n")).as("n"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def changepoint(spark: SparkSession): DataFrame =
    graft.operators.Behavior.changepointFromDaily(prior(spark))
}

object ChangepointStream {

  /** Queries entry: oracle = the same SQL that gates
    * `changepoint_cusum` (sufficient-count state + shared CUSUM
    * derivation make batch boundaries invisible). */
  def streamChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_cusum_")
    val state = new DailyCountState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.changepoint(spark)
  }
}

object DailyModeStream {

  /** Queries entry: oracle = the same SQL that gates
    * `mode_daily_item` (sufficient-count state + shared mode
    * derivation make batch boundaries invisible). */
  def streamModeDaily(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_mode_")
    val state = new DailyModeState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.mode(spark)
  }
}

/** Streaming EWMA state —
  * [[graft.operators.Behavior.ewmaDailyTransform]]'s twin: the
  * (event_type, day, cents) daily revenue table is the additive
  * sufficient state (an EWMA value itself is NOT mergeable across
  * out-of-order batches — a late row re-weights every later day —
  * but the daily cents grid is a plain Long sum), replay-guarded;
  * the dyadic convolution derives at read time through
  * [[graft.operators.Behavior.ewmaFromDaily]] — the identical
  * expression tree the batch operator runs, so batch boundaries and
  * late data are invisible in the report. State is
  * |types|×|days| rows.
  */
final class DailyTypeCentsState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, day TIMESTAMP, cents BIGINT, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("cents"), sum(col("n")).as("n"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def ewma(spark: SparkSession): DataFrame =
    graft.operators.Behavior.ewmaFromDaily(prior(spark))

  /** The SAME daily-cents state serves Holt's level+trend smoother —
    * one state, two smoother faces. */
  def holt(spark: SparkSession): DataFrame =
    graft.operators.Timeseries.holtFromDaily(prior(spark))

  /** Third face: the Grubbs daily-outlier screen over the same
    * additive sums. */
  def grubbs(spark: SparkSession): DataFrame =
    graft.operators.Stats.grubbsFromDaily(prior(spark))

  /** Fifth face: the jackknife ratio-SE read — leave-day-out blocks
    * over the same (Σcents, n) grid. */
  def jackknifeRatio(spark: SparkSession): DataFrame =
    graft.operators.Stats.jackknifeRatioFromDaily(prior(spark))

  /** Fourth face: the Page–Hinkley drift monitor — the (Σcents, n)
    * grid added round 9 carries the daily means the running-mean
    * recursion needs (the recursion itself cannot merge across
    * out-of-order batches; the grid can). */
  def pageHinkley(spark: SparkSession): DataFrame =
    graft.operators.Stats.pageHinkleyFromDaily(prior(spark))
}

object EwmaStream {

  /** Queries entry: oracle = the same SQL that gates `ewma_daily`
    * (sufficient-state daily cents + shared dyadic derivation make
    * batch boundaries invisible). */
  def streamEwma(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_ewma_")
    val state = new DailyTypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.ewma(spark)
  }

  /** Queries entry (oracle: same SQL as `holt_linear_trend`). */
  def streamHolt(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_holt_")
    val state = new DailyTypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.holt(spark)
  }

  /** Queries entry (oracle: same SQL as `grubbs_daily`): the SAME
    * daily-cents state, third face. */
  def streamGrubbs(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sgrub_")
    val state = new DailyTypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.grubbs(spark)
  }

  /** Queries entry (oracle: same SQL as `jackknife_ratio`): the SAME
    * daily-cents state, fifth face. */
  def streamJackknife(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sjack_")
    val state = new DailyTypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.jackknifeRatio(spark)
  }

  /** Queries entry (oracle: same SQL as `page_hinkley_daily`): the
    * SAME daily-cents state, fourth face. */
  def streamPageHinkley(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sph_")
    val state = new DailyTypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.pageHinkley(spark)
  }
}

/** Streaming seasonality state —
  * [[graft.operators.Behavior.seasonalityProfileTransform]]'s twin:
  * the ≤ 168·|types| hour-of-week cell-count grid is the additive
  * sufficient state (shares/deviations are ratios over the WHOLE
  * grid, so per-batch profiles cannot merge), replay-guarded; the
  * report derives at read time through
  * [[graft.operators.Behavior.seasonalityFromCells]] — the identical
  * expression tree the batch operator runs.
  */
final class SeasonalityCellState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, dow BIGINT, hour BIGINT, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
        hour(col("ts")).cast("long").as("hour"))
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg(sum(col("n")).as("n"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def profile(spark: SparkSession): DataFrame =
    graft.operators.Behavior.seasonalityFromCells(prior(spark))
}

/** Streaming box-plot state —
  * [[graft.operators.Behavior.boxplotStatsTransform]]'s twin: the
  * (event_type, cents, cnt) value-count table is the additive
  * sufficient state (a quantile is a rank over the WHOLE
  * distribution — per-batch quartiles cannot merge; the counting-sort
  * count grid can), replay-guarded, bounded by value cardinality, and
  * the quartile/fence report derives at read time through
  * [[graft.operators.Behavior.boxplotFromCounts]] — the identical
  * expression tree the batch operator runs.
  */
final class ValueCountState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, cents BIGINT, cnt BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("cents"))
      .agg(sum(col("cnt")).as("cnt"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def boxplot(spark: SparkSession): DataFrame =
    graft.operators.Behavior.boxplotFromCounts(prior(spark))

  /** The SAME grid serves the winsorized/trimmed report — one state,
    * two robust-stat faces. */
  def winsorized(spark: SparkSession): DataFrame =
    graft.operators.Behavior.winsorizedFromCounts(prior(spark))
}

object BoxplotStream {

  /** Queries entry: oracle = the same SQL that gates `boxplot_stats`
    * (additive value counts + shared counting-sort quantile
    * derivation make batch boundaries invisible). */
  def streamBoxplot(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_boxplot_")
    val state = new ValueCountState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.boxplot(spark)
  }

  /** Queries entry: oracle = the same SQL that gates
    * `winsorized_stats`, derived from the same additive grid. */
  def streamWinsorized(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_winsor_")
    val state = new ValueCountState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.winsorized(spark)
  }
}

/** Streaming percentile-band state — the per-day-keyed sibling of
  * [[ValueCountState]]: the (day, cents, cnt) grid is additive
  * state, and the daily p50/p90/p99 report derives at read time
  * through [[graft.operators.Behavior.percentileBandsFromCounts]].
  */
final class DailyValueCountState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "day TIMESTAMP, cents BIGINT, cnt BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("day"), col("cents"))
      .agg(sum(col("cnt")).as("cnt"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def bands(spark: SparkSession): DataFrame =
    graft.operators.Behavior.percentileBandsFromCounts(prior(spark))
}

object PercentileBandsStream {

  /** Queries entry: oracle = the same SQL that gates
    * `percentile_bands_daily`. */
  def streamPercentileBands(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_bands_")
    val state = new DailyValueCountState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.bands(spark)
  }
}

/** Streaming document-length-histogram state: a histogram is ALREADY
  * additive (bucket counts and token totals are plain sums), so the
  * state IS the report grid minus its derived bound columns —
  * the degenerate-but-real end of the state-merge family where
  * merge and report coincide. Derivation still routes through one
  * shared expression shape so batch/stream parity is by
  * construction.
  */
final class DoclenBucketState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "bucket BIGINT, n_docs BIGINT, total_words BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(size(split(col("text"), " ")).cast("long").as("nw"))
      .select(expr("CAST(floor(log2(nw + 1)) AS BIGINT)").as("bucket"), col("nw"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("total_words"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("bucket"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_words")).as("total_words"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def histogram(spark: SparkSession): DataFrame =
    prior(spark)
      .select(col("bucket"),
        expr("CAST(pow(2, bucket) AS BIGINT) - 1").as("words_lo"),
        expr("CAST(pow(2, bucket + 1) AS BIGINT) - 2").as("words_hi"),
        col("n_docs"), col("total_words"))
      .orderBy(col("bucket"))
}

object DoclenStream {

  /** Queries entry: oracle = the same SQL that gates
    * `doclen_histogram`. */
  def streamDoclen(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_doclen_")
    val state = new DoclenBucketState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.documents(spark, dir), state.merge)
    state.histogram(spark)
  }
}

/** Streaming Zipf-fit state — the additive (tok, cf) VOCABULARY is
  * the sufficient state (a regression over ranked logs is a global
  * fit — per-batch slopes cannot merge; token counts can), and the
  * fit derives through [[graft.operators.TextOps.zipfFromVocab]].
  * Vocab-scale state is exactly what any streaming corpus-stats /
  * tokenizer-training pipeline already keeps.
  */
final class VocabState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "tok STRING, cf BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cf"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("tok")).agg(sum(col("cf")).as("cf"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("tok"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def zipf(spark: SparkSession): DataFrame =
    graft.operators.TextOps.zipfFromVocab(prior(spark))

  /** The SAME (tok, cf) vocabulary state serves the coverage curve —
    * one vocab state, two read-time faces. */
  def coverage(spark: SparkSession): DataFrame =
    graft.operators.TextOps.coverageFromVocab(prior(spark))
}

object ZipfStream {

  /** Queries entry: oracle = the same SQL that gates `zipf_slope`. */
  def streamZipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_zipf_")
    val state = new VocabState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.documents(spark, dir), state.merge)
    state.zipf(spark)
  }

  /** Queries entry (oracle: same SQL as `vocab_coverage_curve`). */
  def streamVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_vcov_")
    val state = new VocabState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.documents(spark, dir), state.merge)
    state.coverage(spark)
  }
}

/** Streaming HHI state — the additive (event_type, item, cents)
  * revenue grid (a share² sum is a ratio over the whole
  * distribution; per-batch HHIs cannot merge, item cents can),
  * derived through [[graft.operators.Behavior.hhiFromItemCents]].
  */
final class ItemCentsState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, item BIGINT, cents BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    // IDENTICAL extraction to the batch path — shared helper, not a
    // re-typed copy, so stream/batch parity is by construction even if
    // ANSI mode ever changes cast semantics.
    val partial = graft.operators.Behavior.itemCentsGrid(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("item"))
      .agg(sum(col("cents")).as("cents"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("event_type", "item"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def hhi(spark: SparkSession): DataFrame =
    graft.operators.Behavior.hhiFromItemCents(prior(spark))
}

object HhiStream {

  /** Queries entry: oracle = the same SQL that gates `revenue_hhi`. */
  def streamRevenueHhi(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_hhi_")
    val state = new ItemCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.hhi(spark)
  }
}

object SeasonalityStream {

  /** Queries entry: oracle = the same SQL that gates
    * `seasonality_profile` (additive cell counts + shared
    * share/deviation derivation make batch boundaries invisible). */
  def streamSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_season_")
    val state = new SeasonalityCellState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.profile(spark)
  }
}

/** Streaming Poisson-bootstrap state —
  * [[graft.operators.Sampling.bootstrapMeanCi]]'s twin: each row's
  * replicate weight is a pure function of (event_id, replicate), so
  * the per-replicate (n_eff, Σw·cents) partials are ADDITIVE across
  * micro-batches — the whole sampling distribution of the mean rides
  * in a 32-row grid state, updated with one map-side-combinable
  * aggregate per batch. This is the streaming shape of the
  * uncertainty pipes in Chamandy et al. 2012: the estimator's
  * resamples advance with the stream, no buffering, no replay.
  * Versioned-parquet + replay-guard discipline ([[ValueCountState]]).
  */
final class BootstrapState(stateDir: String, b: Int = 32) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "b BIGINT, n_eff BIGINT, sum_c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.Sampling.bootstrapPartial(batch.toDF(), b)
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("b"))
      .agg(sum(col("n_eff")).as("n_eff"), sum(col("sum_c")).as("sum_c"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Sampling.bootstrapReport(prior(spark))
}

object BootstrapStream {

  /** Queries entry (oracle: same SQL as `bootstrap_mean_ci`). */
  def streamBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sboot_")
    val state = new BootstrapState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }
}
