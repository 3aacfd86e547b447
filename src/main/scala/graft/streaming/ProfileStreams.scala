package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Additive-sufficient-state streaming twins for the profiling
  * family — the [[ValueCountState]] discipline applied to two more
  * state shapes:
  *
  *  - [[UserSpanState]]: per-user `(cohort, last_day)` span — min and
  *    max merge exactly, so rolling retention on an unbounded stream
  *    is |users| rows of state and the report is
  *    [[graft.operators.Retention.reportFromUsers]], the very
  *    derivation the batch operator runs (parity by shared code).
  *  - [[LabelCentroidState]]: the `(label, dim, n, Σq)` grid of
  *    [[graft.operators.VectorOps.labelDimSums]] — sums of sums merge
  *    exactly; the centroid report is the shared
  *    `centroidsFromSums`. The embedding stream is a staged parquet
  *    replay ([[StreamSources.parquetStream]]) — the corpus arrives
  *    in micro-batches exactly as an ingest pipeline would deliver
  *    it.
  *
  * Both are replay-guarded and versioned like every state here.
  */
final class UserSpanState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, cohort TIMESTAMP, last_day TIMESTAMP"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("b_first"), max(col("day")).as("b_last"))
    val merged = prior(spark).join(partial, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        least(coalesce(col("cohort"), col("b_first")),
              coalesce(col("b_first"), col("cohort"))).as("cohort"),
        greatest(coalesce(col("last_day"), col("b_last")),
                 coalesce(col("b_last"), col("last_day"))).as("last_day"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Retention.reportFromUsers(prior(spark))

  /** SECOND face: the capture–recapture audience estimate — half
    * membership is integer logic on the same (cohort, last_day)
    * span, so the Chapman read shares the state untouched. */
  def reportCapture(spark: SparkSession): DataFrame =
    graft.operators.Retention.captureFromUsers(prior(spark))
}

/** Additive (user, minute, n) burst grid for the streaming bot
  * screen — per-minute counts merge exactly, so the peak-minute and
  * events-per-active-minute flags are pure reads over the state via
  * the shared [[graft.operators.Behavior.botFromMinutes]] rollup.
  * State is one row per ACTIVE (user, minute) pair — bounded by the
  * event count, not the calendar (a production deployment ages
  * minutes past its review horizon out of the state; the flags only
  * ever need the recent window). */
final class UserMinuteCountState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, minute TIMESTAMP, n BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("user_id"), date_trunc("minute", col("ts")).as("minute"))
      .groupBy(col("user_id"), col("minute")).agg(count(lit(1)).as("n"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("user_id"), col("minute")).agg(sum(col("n")).as("n"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("user_id", "minute"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Behavior.botFromMinutes(prior(spark))
}

/** Additive per-source readability sums for the streaming Flesch
  * face — (n_docs, n_sentences, n_words, n_syllables) are plain
  * integer sums of per-doc counts, so the state is |sources| rows
  * and the FRE report is the shared
  * [[graft.operators.TextOps.fleschFromSums]] read. */
final class FleschState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "source STRING, n_docs BIGINT, n_sentences BIGINT, n_words BIGINT, n_syllables BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.TextOps.fleschDocCounts(batch.toDF())
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_sent")).as("n_sentences"),
        sum(col("n_words")).as("n_words"), sum(col("n_syll")).as("n_syllables"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_sentences")).as("n_sentences"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_syllables")).as("n_syllables"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.TextOps.fleschFromSums(prior(spark))
}

/** Additive (user_id, event_type, c) count grid for the streaming
  * engagement-diversity histogram — per-user entropies cannot merge
  * (one new event re-weights every term), the counts can; report via
  * the shared [[graft.operators.Behavior.entropyFromUserTypeCounts]]. */
final class UserTypeCountState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, event_type STRING, c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("user_id"), col("event_type")).agg(sum(col("c")).as("c"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("user_id", "event_type"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Behavior.entropyFromUserTypeCounts(prior(spark))
}

/** Per-user session-count frontier for the streaming sessions-per-
  * user histogram: (last_ts, k) — under [[FunnelStream]]'s
  * time-ordered-delivery contract a batch's first event either
  * continues the frontier session (gap ≤ timeout) or opens session
  * k+1, and batch-internal boundaries count with the ordinary lag
  * rule, so TWO columns of per-user state replace the whole event
  * history. The histogram is a pure read
  * ([[graft.operators.Retention.sessionsHistFromK]]). */
final class SessionCountState(stateDir: String, gapMinutes: Int = 30) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)
  private val gapUs = gapMinutes * 60L * 1000000L

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, last_ts TIMESTAMP, k BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val partial = batch
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .join(prior(spark), Seq("user_id"), "left")
      .select(col("user_id"), col("ts"),
        when(col("prev").isNotNull,
          when(unix_micros(col("ts")) - unix_micros(col("prev")) > gapUs, 1L).otherwise(0L))
        .otherwise(
          when(col("last_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("last_ts")) > gapUs, 1L).otherwise(0L))
        .as("new_s"))
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("b_last"), sum(col("new_s")).as("b_k"))
    val merged = prior(spark).join(partial, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("b_last"), col("last_ts")).as("last_ts"),
        (coalesce(col("k"), lit(0L)) + coalesce(col("b_k"), lit(0L))).as("k"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Retention.sessionsHistFromK(
      prior(spark).select(col("user_id"), col("k")))
}

/** Session-affinity state: per-user STABLE session ids assigned
  * incrementally under time-ordered delivery — state is the distinct
  * (user_id, sid, event_type) presence set (idempotent union; a
  * batch that re-adds a continuing session's types is a no-op) plus
  * a (last_ts, cur_sid) frontier per user. A batch's first session
  * either continues `cur_sid` (gap ≤ timeout — its types union into
  * the same sid) or opens `cur_sid`+1; the affinity report is the
  * batch rollup over the presence rows
  * ([[graft.operators.Behavior.affinityFromPresence]]), so
  * stream ≡ batch by shared derivation. */
final class SessionAffinityState(stateDir: String, gapMinutes: Int = 30) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)
  private val gapUs = gapMinutes * 60L * 1000000L

  private def priorPresence(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, sid BIGINT, event_type STRING"))
    else spark.read.parquet(s"$stateDir/v$version/presence")

  private def priorFrontier(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, last_ts TIMESTAMP, cur_sid BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/frontier")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val labeled = batch
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_s",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs, 1L)
          .when(lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("seq",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val firstMin = labeled.filter(col("seq") === 1L)
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    val offsets = firstMin.join(priorFrontier(spark), Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("cur_sid").isNotNull &&
          unix_micros(col("first_ts")) - unix_micros(col("last_ts")) <= gapUs,
          col("cur_sid") - 1L)
        .otherwise(coalesce(col("cur_sid"), lit(0L))).as("offset"))
    val withSid = labeled.join(offsets, Seq("user_id"))
      .select(col("user_id"), (col("offset") + col("seq")).as("sid"),
        col("event_type"), col("ts"))
    val presence = priorPresence(spark)
      .unionByName(withSid.select(col("user_id"), col("sid"), col("event_type")))
      .distinct()
    val newFrontier = withSid.groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), max(col("sid")).as("cur_sid"))
    val frontier = priorFrontier(spark).join(newFrontier, Seq("user_id"), "left_anti")
      .unionByName(newFrontier)
    StreamUtil.writeSharded(presence, s"$stateDir/v$batchId/presence", Seq("user_id"))
    StreamUtil.writeSharded(frontier, s"$stateDir/v$batchId/frontier", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Behavior.affinityFromPresence(
      priorPresence(spark).select(col("user_id"),
        col("sid").as("session_seq"), col("event_type")))
}

final class LabelCentroidState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "label BIGINT, dim BIGINT, n_vecs BIGINT, sum_q BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.VectorOps.labelDimSums(batch)
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("n_vecs")).as("n_vecs"), sum(col("sum_q")).as("sum_q"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.VectorOps.centroidsFromSums(prior(spark))
}

/** Dataset-card state over a DOCUMENTS stream: the per-(lang, source)
  * sufficient grid ([[graft.operators.CorpusQa.cardGrid]]) — sums
  * add, mins/maxs merge — and the one-row card derives at read time
  * through the shared `cardFromGrid`. Distinct lang/source counts are
  * grid-key counts, so they too are exact under any batch split. */
final class DatasetCardState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "lang STRING, source STRING, n_docs BIGINT, ws_tokens BIGINT, " +
        "bpe_tokens BIGINT, n_chars BIGINT, min_chars BIGINT, max_chars BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.CorpusQa.cardGrid(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("ws_tokens")).as("ws_tokens"),
        sum(col("bpe_tokens")).as("bpe_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.CorpusQa.cardFromGrid(prior(spark))

  /** The SAME card grid serves Cramér's V — n_docs per (source,
    * lang) cell is one of its additive sums; second face. */
  def reportCramersV(spark: SparkSession): DataFrame =
    graft.operators.Stats.cramersFromObs(
      prior(spark).select(col("source"), col("lang"), col("n_docs").as("n")))
}

/** Additive (source, len) document-length grid for the streaming KS
  * test — length counts add across micro-batches while the ECDF
  * comparison is a whole-grid read (per-batch D statistics cannot
  * merge: a batch's max-gap point may not be the corpus's), so the
  * state is the sufficient grid and [[graft.operators.Stats
  * .ksFromCounts]] derives the pairwise distances at read time. */
final class SourceLenState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "source STRING, len BIGINT, c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("source"), length(col("text")).cast("long").as("len"))
      .groupBy(col("source"), col("len")).agg(count(lit(1)).as("c"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("source"), col("len")).agg(sum(col("c")).as("c"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Stats.ksFromCounts(prior(spark))

  /** The SAME length grid serves the Neyman sampling design — one
    * state, two design faces (drift test + allocation). */
  def reportNeyman(spark: SparkSession): DataFrame =
    graft.operators.Stats.neymanFromCounts(prior(spark))

  /** Third face: Wasserstein-1 between the per-source length ECDFs —
    * the KS face's integral companion, same sufficient grid (a
    * per-batch W1 cannot merge: one new length shifts every later
    * cumulative gap, so the distance derives whole-grid at read). */
  def reportW1(spark: SparkSession): DataFrame =
    graft.operators.Stats.w1FromCounts(prior(spark))
}

/** Additive (event_type, is_base, bucket) PSI grid —
  * [[graft.operators.Stats.psiGrid]] merged additively (period
  * membership is a pure function of each event's own timestamp
  * against the FIXED cutoff, bucket of its value), |types|×2×|buckets|
  * rows. Report = [[graft.operators.Stats.psiFromGrid]], the batch
  * derivation (smoothing and logs run at read time — a PSI computed
  * per batch would smooth against a per-batch support). On a real
  * platform `cutoff` is the monitoring baseline boundary, known
  * configuration — the [[UserPrePostState]] convention. */
final class PsiGridState(stateDir: String, cutoff: java.sql.Timestamp) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, is_base BOOLEAN, bucket BIGINT, c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.Stats.psiGrid(batch.toDF(), cutoff)
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("is_base"), col("bucket"))
      .agg(sum(col("c")).as("c"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Stats.psiFromGrid(prior(spark))
}

/** Additive (event_type, cents) value-support grid for the streaming
  * rank-sum test — counts merge across micro-batches while the
  * tie-averaged pooled ranks are a whole-support read, so the state
  * is the sufficient grid (cents-bounded, never |events|) and
  * [[graft.operators.Stats.mwFromCounts]] derives U/AUC at read
  * time. */
final class TypeCentsState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, cents BIGINT, c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("c"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("cents")).agg(sum(col("c")).as("c"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Stats.mwFromCounts(prior(spark))

  /** The SAME cents-support grid serves the Benford screen (digits
    * derive from the values; type rolls up) — second face. */
  def reportBenford(spark: SparkSession): DataFrame =
    graft.operators.Stats.benfordFromCents(
      prior(spark).groupBy(col("cents")).agg(sum(col("c")).as("c")))

  /** Off-policy face: IPS/SNIPS counterfactual evaluation — per-type
    * sufficient stats are a rollup of the same cents-support grid. */
  def reportOffpolicy(spark: SparkSession): DataFrame =
    graft.operators.Experiments.offpolicyFromGrid(prior(spark))

  /** Third face: the k-group Kruskal–Wallis omnibus — pooled ranks
    * are a whole-support read over the same additive grid. */
  def reportKruskal(spark: SparkSession): DataFrame =
    graft.operators.Stats.kwFromCounts(prior(spark))

  /** Fourth face: the Brown–Forsythe variance-homogeneity screen —
    * per-type medians and z-moments read off the same grid. */
  def reportLevene(spark: SparkSession): DataFrame =
    graft.operators.Stats.leveneFromCounts(prior(spark))
}

/** Per-user (score, converted) state for the streaming decile-lift
  * table (round-9 verdict task 7): both columns merge additively —
  * the non-purchase engagement score is a sum of per-batch sums, the
  * converted flag a max of maxes — so |users| rows of hash-sharded
  * state replace the event history, and the report is
  * [[graft.operators.Behavior.decileFromUsers]], the batch
  * operator's own distributed-rank derivation (parity by shared
  * code, including [[graft.operators.GlobalRank]]'s slice rank). */
final class UserScoreState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, score BIGINT, converted BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("user_id"))
      .agg(sum(col("score")).as("score"), max(col("converted")).as("converted"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Behavior.decileFromUsers(prior(spark))
}

/** Per-user (last_ts, freq, cents) RFM state — every column merges
  * additively (recency a max of maxes, frequency a sum of per-batch
  * counts, monetary a sum of sums), hash-sharded at |users| rows;
  * TWO report faces over the same state: the quartile segmentation
  * ([[graft.operators.Behavior.rfmFromUsers]]) and the revenue
  * percentile table
  * ([[graft.operators.Behavior.revenuePercentileFromUsers]]), both
  * the batch operators' own derivations including the distributed
  * [[graft.operators.GlobalRank]] slice rank — stream ≡ batch by
  * shared code. */
final class UserRfmState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, last_ts TIMESTAMP, freq BIGINT, cents BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    // IDENTICAL extraction to the batch path (shared helper).
    val partial = graft.operators.Behavior.rfmPerUser(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("user_id"))
      .agg(max(col("last_ts")).as("last_ts"),
        sum(col("freq")).as("freq"),
        sum(col("cents")).as("cents"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def reportRfm(spark: SparkSession): DataFrame =
    graft.operators.Behavior.rfmFromUsers(prior(spark))

  def reportRevenuePercentile(spark: SparkSession): DataFrame =
    graft.operators.Behavior.revenuePercentileFromUsers(
      prior(spark).select(col("user_id"), col("cents")))

  /** Third face: the Hill tail-index estimator — a bounded top-k
    * read over the same per-user monetary state. */
  def reportHill(spark: SparkSession): DataFrame =
    graft.operators.Stats.hillFromUsers(
      prior(spark).select(col("user_id"), col("cents")))
}

/** Per-user (pre_cents, post_cents) CUPED state — both columns are
  * sums of per-batch sums (the event's period membership is a pure
  * function of its own timestamp against the FIXED `cutoff`, which is
  * what keeps the grid additive: a data-derived boundary would shift
  * as batches arrive), so the grid merges additively under any
  * batching/replay order; |users| rows, hash-sharded. On a real
  * platform `cutoff` is configuration — the experiment start date.
  * Report = [[graft.operators.Experiments.cupedFromUsers]], the batch
  * operator's own derivation (parity by shared code). */
final class UserPrePostState(stateDir: String, cutoff: java.sql.Timestamp) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, pre_cents BIGINT, post_cents BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.Experiments.userPrePost(batch.toDF(), cutoff)
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("user_id"))
      .agg(sum(col("pre_cents")).as("pre_cents"),
        sum(col("post_cents")).as("post_cents"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("user_id"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Experiments.cupedFromUsers(prior(spark))

  /** Second face: the sample-ratio-mismatch gate over the same
    * per-user state (the state's key set IS the unit census). */
  def reportSrm(spark: SparkSession): DataFrame =
    graft.operators.Experiments.srmFromUsers(prior(spark).select(col("user_id")))

  /** Third face: the post-stratified ATE — stratum ranks derive at
    * report time over the merged grid (a stratum frozen at ingest
    * would shift as later users land). */
  def reportStratifiedAte(spark: SparkSession): DataFrame =
    graft.operators.Experiments.stratifiedAteFromUsers(prior(spark))
}

/** Per-(arm, day) moments grid — [[graft.operators.Experiments
  * .peekingGrid]] merged additively (counts, Σ, Σ² are sums of
  * per-batch sums); |arms|×|days| rows. Report = the batch peeking
  * derivation: cumulative prefix sums and every z derive at report
  * time. */
final class ArmDayState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "arm BIGINT, day TIMESTAMP, n BIGINT, s1 BIGINT, s2 DECIMAL(38,0)"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.Experiments.peekingGrid(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("arm"), col("day"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Experiments.peekingFromGrid(prior(spark))
}

/** Per-arm value counting grid — [[graft.operators.Experiments
  * .armCentsGrid]] merged additively; value-cardinality rows. Report
  * = the batch QTE derivation over the merged grid. */
final class ArmCentsState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "arm BIGINT, cents BIGINT, cnt BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.Experiments.armCentsGrid(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("arm"), col("cents"))
      .agg(sum(col("cnt")).as("cnt"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Experiments.qteFromGrid(prior(spark))
}

/** Split-conformal counting-grid state — per (event_type, is_train,
  * cents) counts (split membership is a pure function of event_id),
  * additive under any batching; value-cardinality rows. BOTH the
  * train-split center and the calibration residual order statistics
  * derive at report time through
  * [[graft.operators.Experiments.conformalFromGrid]] — residuals
  * depend on the FINAL center, so they must never be frozen into the
  * state (the classic streaming-conformal mistake this state shape
  * avoids by construction). */
final class ConformalGridState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, is_train BOOLEAN, cents BIGINT, cnt BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.Experiments.conformalGrid(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("is_train"), col("cents"))
      .agg(sum(col("cnt")).as("cnt"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Experiments.conformalFromGrid(prior(spark))
}

/** Heaps'-law corpus state: TWO merged rollups — per-doc token
  * counts (doc_id, t), a sum of per-batch counts, and per-token
  * first-seen doc (tok, doc_id), a min of per-batch mins — both
  * exact under any batching/replay order; |docs| + |vocab| rows,
  * each hash-sharded. Report =
  * [[graft.operators.CorpusQa.heapsFromRollups]], the batch
  * operator's own regression including the distributed range-
  * partitioned cumsum. */
final class CorpusHeapsState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def perDoc(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "doc_id BIGINT, t BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/perdoc")

  private def tokFirst(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "tok STRING, doc_id BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/tokfirst")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    // IDENTICAL tokenization to the batch path (shared helper).
    val toks = graft.operators.CorpusQa.heapsTokens(batch.toDF())
    val mergedPerDoc = perDoc(spark)
      .unionByName(toks.groupBy(col("doc_id")).agg(count(lit(1)).as("t")))
      .groupBy(col("doc_id")).agg(sum(col("t")).as("t"))
    val mergedTokFirst = tokFirst(spark)
      .unionByName(toks.groupBy(col("tok")).agg(min(col("doc_id")).as("doc_id")))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("doc_id"))
    StreamUtil.writeSharded(mergedPerDoc, s"$stateDir/v$batchId/perdoc", Seq("doc_id"))
    StreamUtil.writeSharded(mergedTokFirst, s"$stateDir/v$batchId/tokfirst", Seq("tok"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.CorpusQa.heapsFromRollups(perDoc(spark), tokFirst(spark))
}

/** Per-item engagement count state (props.$.k), additive sums of
  * per-batch counts, hash-sharded at |items| rows; report = the
  * batch Gini derivation over the same distributed rank. */
final class ItemEngagementState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "item BIGINT, cnt BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    // IDENTICAL extraction to the batch path (shared helper).
    val partial = graft.operators.Behavior.itemEngagementCounts(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("item")).agg(sum(col("cnt")).as("cnt"))
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("item"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Behavior.giniFromCounts(prior(spark))
}

object ProfileStreams {

  /** Queries entry (oracle: same SQL as `dataset_card`): the
    * documents corpus staged as 4 files and replayed one per
    * micro-batch through the additive card grid. */
  def streamDatasetCard(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_scard_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new DatasetCardState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `decile_lift`) — order-free
    * additive per-user (score, converted) state, so the raw events
    * stream needs no staged time ordering. */
  def streamDecileLift(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sdlift_")
    val state = new UserScoreState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `rfm_segments`) — order-free
    * additive per-user RFM state, so the raw events stream needs no
    * staged time ordering. */
  def streamRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_srfm_")
    val state = new UserRfmState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportRfm(spark)
  }

  /** Queries entry (oracle: same SQL as `user_revenue_percentile`):
    * the SAME RFM state, second face. */
  def streamUserRevenuePercentile(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_surp_")
    val state = new UserRfmState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportRevenuePercentile(spark)
  }

  /** Queries entry (oracle: same SQL as `heaps_law_fit`): the
    * documents corpus staged as 4 files and replayed one per
    * micro-batch through the min/sum-merge heaps rollup state. */
  def streamHeapsLawFit(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sheaps_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new CorpusHeapsState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `engagement_gini`) —
    * order-free additive per-item counts. */
  def streamEngagementGini(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sgini_")
    val state = new ItemEngagementState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `ab_cuped`) — order-free
    * additive per-user (pre, post) sums. */
  def streamAbCuped(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_scuped_")
    val cutoff = graft.operators.Experiments.preCutoff(graft.sources.Tables.events(spark, dir))
    val state = new UserPrePostState(s"$work/state", cutoff)
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `ab_srm_check`): the SAME
    * per-user CUPED state, second face — its key set is the unit
    * census the SRM gate counts. */
  def streamAbSrm(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_ssrm_")
    val cutoff = graft.operators.Experiments.preCutoff(graft.sources.Tables.events(spark, dir))
    val state = new UserPrePostState(s"$work/state", cutoff)
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportSrm(spark)
  }

  /** Queries entry (oracle: same SQL as `qte_deciles`) — order-free
    * additive per-arm value grid. */
  def streamQte(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sqte_")
    val state = new ArmCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `stratified_ate`): the SAME
    * per-user CUPED state, third face — strata re-rank at report. */
  def streamStratifiedAte(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_ssate_")
    val cutoff = graft.operators.Experiments.preCutoff(graft.sources.Tables.events(spark, dir))
    val state = new UserPrePostState(s"$work/state", cutoff)
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportStratifiedAte(spark)
  }

  /** Queries entry (oracle: same SQL as `ab_peeking_curve`) — order-
    * free additive per-(arm, day) moments; the cumulative prefix
    * sums and every daily z derive at report time. */
  def streamPeeking(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_speek_")
    val state = new ArmDayState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `conformal_interval`) —
    * order-free additive counting grid; center and residual ranks
    * both derive at report time. */
  def streamConformal(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sconf_")
    val state = new ConformalGridState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `hill_tail_index`): the SAME
    * per-user RFM state as `stream_rfm_segments`, third face. */
  def streamHill(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_shill_")
    val state = new UserRfmState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportHill(spark)
  }

  /** Queries entry (oracle: same SQL as `dsir_importance`): the
    * documents corpus staged as 4 files, the hashed-feature grid
    * delta-appended one micro-batch at a time, every weight derived
    * at report time against the FINAL bucket LMs. */
  def streamDsir(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sdsir_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new DsirGridState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: the dsir SQL over the live corpus): the
    * retraction face — upserts for every doc plus a delete op for
    * each `doc_id % 7 == 3`; the masked grid re-derives bucket LMs
    * and every weight over the live corpus only. */
  def streamDsirTombstone(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sdsirt_")
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.withColumn("op", lit("u"))
      .unionByName(docs.filter(col("doc_id") % 7 === 3).withColumn("op", lit("d")))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new DsirTombstoneState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (rows-only like `bpe_train` itself; gated by the
    * stream≡batch and straight-Scala reference specs): the documents
    * corpus staged as 4 files through the additive word-frequency
    * dict; all merge rules learn at report time over the final dict. */
  def streamBpeTrain(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sbpe_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new WordFreqState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `offpolicy_eval`): the SAME
    * cents-support state as `stream_mann_whitney`, another face. */
  def streamOffpolicy(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sops_")
    val state = new TypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportOffpolicy(spark)
  }

  /** Queries entry (oracle: same SQL as `k_anonymity_check`) —
    * order-free additive QI×user grid. */
  def streamKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_skanon_")
    val state = new AnonymityGridState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (rows-only like `bpe_fertility_by_source`; gated
    * by the stream≡batch parity spec): staged corpus through the
    * additive (source, word) grid. */
  def streamBpeFertility(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sbpef_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new SourceWordState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `hybrid_rrf_topk`): documents
    * FULL-OUTER joined with their embeddings (the batch operator
    * consumes the two tables independently, so the staging must not
    * drop a doc that lacks an embedding row or vice versa — an inner
    * join here would silently break stream≡batch≡oracle parity on
    * any id asymmetry; [[HybridIndexState.merge]] routes the two
    * null-tolerant halves to their own delta stores), staged as 4
    * files; the inverted index and the vector store accrue per
    * micro-batch and serving re-derives everything from the final
    * index. */
  def streamHybridRrf(spark: SparkSession, dir: String, nQueries: Int = 3,
                      nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_shyb_")
    graft.sources.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .join(graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"), "full_outer")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new HybridIndexState(s"$work/state", nQueries)
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: the hybrid fusion SQL over the tombstone-
    * compacted live corpus): the retraction face — the staged stream
    * carries upserts for every doc AND a delete op for each corpus
    * doc with `doc_id % 7 == 3` (a deterministic retraction slice);
    * the serving index masks tombstoned docs, so the report equals
    * the batch operator run on the corpus WITHOUT them. Delete-wins
    * semantics keep the staging order-free (deletes land in their own
    * trailing rows but would compact identically in any order). */
  def streamHybridRrfTombstone(spark: SparkSession, dir: String, nQueries: Int = 3,
                               nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_shybt_")
    val ups = graft.sources.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .join(graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"), "full_outer")
      .withColumn("op", lit("u"))
    val dels = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") >= nQueries && col("doc_id") % 7 === 3)
      .select(col("doc_id"),
        lit(null).cast("string").as("text"),
        lit(null).cast("array<float>").as("embedding"),
        lit("d").as("op"))
    ups.unionByName(dels).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new HybridTombstoneState(s"$work/state", nQueries)
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (rows-only like `semantic_clusters_ivf` itself;
    * gated by the stream≡batch parity spec): embeddings staged as
    * `nFiles` files and IVF-screened one micro-batch at a time
    * against the accumulated probe index; centroids and the sized
    * cell count are fixed configuration derived once from the corpus
    * (the offline-trained-model convention). */
  def streamSemanticIvf(spark: SparkSession, dir: String, threshold: Double = 0.3,
                        nProbe: Int = 2, seed: Long = 7L, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_ssiv_")
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    val nCells = math.max(8L, n / 512L).toInt
    val cents = graft.operators.VectorOps.trainIvfCentroids(spark, dir, nCells, seed)
    graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new SemanticIvfState(s"$work/state", cents, threshold, nProbe)
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `mann_whitney_u`) — order-
    * free additive counts, so the raw events stream needs no staged
    * time ordering. */
  def streamMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_smw_")
    val state = new TypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `benford_first_digit`): the
    * SAME cents-support state, second face. */
  def streamBenford(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sbenf_")
    val state = new TypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportBenford(spark)
  }

  /** Queries entry (oracle: same SQL as `kruskal_wallis`): the SAME
    * cents-support state, third face. */
  def streamKruskal(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_skw_")
    val state = new TypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportKruskal(spark)
  }

  /** Queries entry (oracle: same SQL as `levene_brown_forsythe`):
    * the SAME cents-support state, fourth face. */
  def streamLevene(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_slev_")
    val state = new TypeCentsState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportLevene(spark)
  }

  /** Queries entry (oracle: same SQL as `cramers_v_source_lang`):
    * the SAME card grid as stream_dataset_card, second face. */
  def streamCramersV(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_scrv_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new DatasetCardState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.reportCramersV(spark)
  }

  /** Queries entry (oracle: same SQL as `bot_burst_screen`): the
    * additive (user, minute) burst grid drained from the unstaged
    * event stream (counts merge in any delivery order), reported
    * through the batch rollup. */
  def streamBotScreen(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sbot_")
    val state = new UserMinuteCountState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `flesch_reading_ease`): the
    * document stream drained through the additive per-source
    * readability sums. */
  def streamFlesch(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sfre_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new FleschState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `ks_doclen_sources`). */
  def streamKsDoclen(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame =
    drainedLenState(spark, dir, "graft_sks_", nFiles).report(spark)

  /** Queries entry (oracle: same SQL as `neyman_allocation`). */
  def streamNeyman(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame =
    drainedLenState(spark, dir, "graft_sney_", nFiles).reportNeyman(spark)

  /** Queries entry (oracle: same SQL as `wasserstein_doclen`): the
    * SAME additive length grid, third face. */
  def streamWassersteinDoclen(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame =
    drainedLenState(spark, dir, "graft_sw1_", nFiles).reportW1(spark)

  /** Queries entry (oracle: same SQL as `psi_value_drift`) —
    * order-free additive PSI grid; the fixed baseline cutoff is
    * derived once from the batch table (configuration standing in
    * for the monitoring boundary, the stream_ab_cuped convention). */
  def streamPsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_spsi_")
    val cutoff = graft.operators.Experiments.preCutoff(graft.sources.Tables.events(spark, dir))
    val state = new PsiGridState(s"$work/state", cutoff)
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  private def drainedLenState(spark: SparkSession, dir: String,
                              prefix: String, nFiles: Int): SourceLenState = {
    val work = graft.GraftCaches.trackTempDir(prefix)
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new SourceLenState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state
  }

  /** Queries entry (oracle: same SQL as `rolling_retention`). */
  def streamRollingRetention(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_uspan_")
    val state = new UserSpanState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `user_type_entropy`): the
    * event stream drained through the additive (user, type) count
    * grid — no staging needed. */
  def streamUserTypeEntropy(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_suent_")
    val state = new UserTypeCountState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `sessions_per_user`): the
    * time-ordered replay drained through the per-user (last_ts, k)
    * session-count frontier. */
  def streamSessionsPerUser(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sspu_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new SessionCountState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `session_type_affinity`):
    * the time-ordered replay drained through the stable-session-id
    * presence state. */
  def streamSessionAffinity(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_saff_")
    FunnelStream.stageTimeOrdered(spark, dir, s"$work/input", nFiles)
    val state = new SessionAffinityState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.eventsFrom(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `capture_recapture`): the
    * SAME per-user span state as stream_rolling_retention, second
    * face. */
  def streamCaptureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_scapt_")
    val state = new UserSpanState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportCapture(spark)
  }

  /** Queries entry (oracle: same SQL as `label_centroids`): the
    * embedding corpus staged as 4 files and replayed one file per
    * micro-batch. */
  def streamLabelCentroids(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_lcent_")
    graft.sources.Tables.embeddings(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new LabelCentroidState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `pii_density`): the documents
    * corpus staged as 4 files and replayed one per micro-batch through
    * the additive per-source PII grid. */
  def streamPiiDensity(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_spii_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new PiiSourceState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }

  /** Queries entry (oracle: same SQL as `decontaminate_semantic`):
    * the corpus embeddings staged as 4 files and screened one
    * micro-batch at a time against the broadcast eval side — the
    * daily-ingest contamination gate. Verdicts are per-vector and
    * STATELESS given the eval set, so the state is append-only. */
  def streamDecontaminateSemantic(spark: SparkSession, dir: String,
                                  nEval: Int = 20, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sdecon_")
    graft.operators.VectorOps.corpusSide(spark, dir, nEval).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new SemanticVerdictState(s"$work/state", dir, nEval)
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark)
  }
}

/** Additive per-source PII grid —
  * [[graft.operators.TextOps.piiDensityCounts]]'s twin: every column
  * of the per-source partial (docs, pii_docs, per-class matches,
  * chars) is a sum, so the state merges exactly under any batching;
  * |sources| rows total. Report is the shared
  * [[graft.operators.TextOps.piiDensityFromCounts]] (parity by
  * shared code). Versioned-parquet + replay-guard discipline. */
final class PiiSourceState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "source STRING, docs BIGINT, pii_docs BIGINT, n_emails BIGINT, " +
          "n_phones BIGINT, n_ips BIGINT, n_chars BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.TextOps.piiDensityCounts(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("source"))
      .agg(sum(col("docs")).as("docs"), sum(col("pii_docs")).as("pii_docs"),
        sum(col("n_emails")).as("n_emails"), sum(col("n_phones")).as("n_phones"),
        sum(col("n_ips")).as("n_ips"), sum(col("n_chars")).as("n_chars"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.TextOps.piiDensityFromCounts(prior(spark))
}

/** Append-only semantic-decontamination verdict state —
  * [[graft.operators.VectorOps.decontaminateSemanticVerdicts]]'s
  * twin. Each corpus vector arrives in exactly one micro-batch and
  * its verdict depends only on the (broadcast) eval side, so each
  * batch APPENDS its own verdict delta ([[StreamUtil.writeDelta]] —
  * the verdict table grows with the corpus; rewriting the
  * accumulation per batch would be quadratic write volume) and a
  * replayed batch overwrites its own delta dir. */
final class SemanticVerdictState(stateDir: String, dir: String, nEval: Int) {
  @volatile private var version: Long = StreamUtil.latestDelta(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    StreamUtil.readDeltas(spark, stateDir,
      "vec_id BIGINT, nearest_eval_id BIGINT, max_cosine DOUBLE, is_kept BOOLEAN",
      version)

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val verdicts = graft.operators.VectorOps.decontaminateSemanticVerdicts(
      graft.operators.VectorOps.evalSide(spark, dir, nEval), batch.toDF())
    StreamUtil.writeDelta(verdicts, stateDir, batchId, Seq("vec_id"))
    version = batchId
  }

  def report(spark: SparkSession): DataFrame =
    prior(spark).orderBy(col("vec_id"))
}

/** DSIR doc-bucket grid state —
  * [[graft.operators.CorpusQa.dsirDocBuckets]] delta-appended per
  * micro-batch: docs are immutable and batches id-disjoint, so each
  * batch's hashed-feature counts land once and are never rewritten
  * (the corpus-scale append discipline — versioned rewrite would be
  * quadratic write volume). CRUCIALLY both bucket LMs and every doc
  * weight derive at REPORT time through the batch operator's own
  * [[graft.operators.CorpusQa.dsirFromDocBuckets]]: a weight frozen
  * at ingest would be scored against a stale target model (the same
  * final-center argument as the conformal state). */
final class DsirGridState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestDelta(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    StreamUtil.readDeltas(spark, stateDir,
      "doc_id BIGINT, lang STRING, bucket BIGINT, c BIGINT", version)

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    StreamUtil.writeDelta(
      graft.operators.CorpusQa.dsirDocBuckets(batch.toDF()), stateDir, batchId,
      Seq("doc_id"))
    version = batchId
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.CorpusQa.dsirFromDocBuckets(prior(spark))
}

/** [[DsirGridState]] WITH RETRACTIONS — the tombstone discipline on
  * the importance-weight grid: 'u' rows delta-append their
  * hashed-feature counts, 'd' rows delta-append the doc_id to a
  * tombstone store; the report masks the grid (doc_id anti-join)
  * BEFORE deriving bucket LMs and weights, so a retracted doc leaves
  * both the output AND the target/proposal models — the same
  * final-center argument as the append-only face, now also
  * retraction-correct (a weight scored against LMs that still count
  * dead docs would silently bias the mixture). Replay guard = MIN
  * over both delta stores (the [[HybridIndexState]] rule). */
final class DsirTombstoneState(stateDir: String) {
  @volatile private var version: Long = math.min(
    StreamUtil.latestDelta(s"$stateDir/grid"),
    StreamUtil.latestDelta(s"$stateDir/tomb"))

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val df = batch.toDF()
    StreamUtil.writeDelta(
      graft.operators.CorpusQa.dsirDocBuckets(df.filter(col("op") === "u").drop("op")),
      s"$stateDir/grid", batchId, Seq("doc_id"))
    StreamUtil.writeDelta(
      df.filter(col("op") === "d").select(col("doc_id")).distinct(),
      s"$stateDir/tomb", batchId, Seq("doc_id"))
    version = batchId
  }

  def report(spark: SparkSession): DataFrame = {
    val tomb = StreamUtil.readDeltas(spark, s"$stateDir/tomb", "doc_id BIGINT", version)
    graft.operators.CorpusQa.dsirFromDocBuckets(
      StreamUtil.readDeltas(spark, s"$stateDir/grid",
        "doc_id BIGINT, lang STRING, bucket BIGINT, c BIGINT", version)
        .join(tomb, Seq("doc_id"), "left_anti"))
  }
}

/** Streaming BPE-training state — the word-frequency dict
  * ([[graft.operators.TextOps.wordFreqTransform]]) merged additively
  * per batch (vocab-scale, the tokenizer-training state any subword
  * fit keeps); the k-round merge learning runs at REPORT time over
  * the final dict through the batch operator's own
  * [[graft.operators.TextOps.bpeTrainFromVocab]] — merge rules
  * depend on GLOBAL pair counts, so learning incrementally per batch
  * would lock in early-corpus rules (the stale-model argument, BPE
  * edition). */
final class WordFreqState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "word STRING, cnt BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.TextOps.wordFreqTransform(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.TextOps.bpeTrainFromVocab(prior(spark))
}

/** QI-cell × user grid — [[graft.operators.Experiments
  * .anonymityGrid]] merged additively (per-cell-per-user record
  * counts are sums of sums; the user dimension makes the distinct-
  * user read idempotent). Report = the batch k-anonymity derivation. */
final class AnonymityGridState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "event_type STRING, dow BIGINT, cents_bucket BIGINT, user_id BIGINT, c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = graft.operators.Experiments.anonymityGrid(batch.toDF())
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("event_type"), col("dow"), col("cents_bucket"), col("user_id"))
      .agg(sum(col("c")).as("c"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.Experiments.kAnonymityFromGrid(prior(spark))
}

/** Per-(source, word) count grid — ONE additive state serving the
  * trained-tokenizer fertility face: the pooled training dict is the
  * over-sources sum of the same grid, so merges, segmentation, and
  * every per-source bill derive at report time through
  * [[graft.operators.TextOps.bpeFertilityFromGrid]]. */
final class SourceWordState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "source STRING, word STRING, c BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val partial = batch.select(col("source"),
      explode(split(col("text"), " ")).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
    val merged = prior(spark).unionByName(partial)
      .groupBy(col("source"), col("word")).agg(sum(col("c")).as("c"))
    StreamUtil.writeGrid(merged, s"$stateDir/v$batchId")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.TextOps.bpeFertilityFromGrid(prior(spark))
}

/** Streaming hybrid-retrieval index — the serve-while-ingesting
  * shape: each micro-batch of documents delta-appends its inverted-
  * index postings ([[graft.operators.VectorOps.hybridPostings]] —
  * the index build does NOT know the queries) and its embedding
  * rows; at report time queries, corpus stats, df, and both rankings
  * derive from the accrued index through the batch operator's own
  * fusion core ([[graft.operators.VectorOps.hybridFromIndex]]).
  * Both stores are append-only because docs are immutable and
  * batches id-disjoint (the corpus-scale append discipline).
  * Replay guard = MIN over BOTH delta stores: the state writes two
  * tables per batch (post, then emb), so guarding on either one
  * alone inverts the delta layer's "guard written LAST" rule for
  * the other — a crash between the two writeDelta calls would leave
  * post/batch=N committed with no emb/batch=N, and a post-seeded
  * guard would skip the replay, silently losing that batch's
  * embeddings. min() makes an interrupted batch look uncommitted,
  * so it replays into the idempotent mode-overwrite delta dirs. */
final class HybridIndexState(stateDir: String, nQueries: Int) {
  @volatile private var version: Long = math.min(
    StreamUtil.latestDelta(s"$stateDir/post"),
    StreamUtil.latestDelta(s"$stateDir/emb"))

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val df = batch.toDF()
    // Null-tolerant halves: the staging full-outer-joins docs to
    // embeddings, so a doc with no embedding (null embedding) still
    // feeds the sparse index, and an embedding with no doc (null
    // text) still feeds the vector store — matching the batch
    // operator, which reads the two tables independently.
    StreamUtil.writeDelta(
      graft.operators.VectorOps.hybridPostings(
        df.filter(col("text").isNotNull).select(col("doc_id"), col("text"))),
      s"$stateDir/post", batchId, Seq("doc_id"))
    StreamUtil.writeDelta(
      df.filter(col("embedding").isNotNull)
        .select(col("doc_id").as("vec_id"), col("embedding")),
      s"$stateDir/emb", batchId, Seq("vec_id"))
    version = batchId
  }

  def report(spark: SparkSession): DataFrame =
    graft.operators.VectorOps.hybridFromIndex(
      StreamUtil.readDeltas(spark, s"$stateDir/post",
        "doc_id BIGINT, dl BIGINT, term STRING, tf BIGINT", version),
      StreamUtil.readDeltas(spark, s"$stateDir/emb",
        "vec_id BIGINT, embedding ARRAY<FLOAT>", version),
      nQueries)
}

/** Streaming hybrid-retrieval index WITH RETRACTIONS — the
  * [[HybridIndexState]] serve-while-ingesting shape extended with the
  * CDC family's tombstone discipline ([[CdcCompact]] 10a' semantics
  * — reference src/process.py:189's changelog-stream delete handling
  * applied to a serving index instead of a sink): each
  * micro-batch row carries an `op` column — 'u' rows delta-append
  * their postings and embedding exactly as the append-only face
  * does; 'd' rows delta-append the doc_id to a third, tombstone
  * store. Serving masks both stores through a tombstone anti-join,
  * so a retracted doc LEAVES the serving index; the batch oracle is
  * the same fusion SQL over the tombstone-compacted live corpus.
  *
  * Semantics are delete-wins (tombstone-forever): a tombstone
  * removes the doc no matter the arrival order, which keeps every
  * store order-free and idempotent — the same commutativity
  * discipline as the additive grids, and what makes crash-replay
  * safe without sequence numbers. Replay guard = MIN over all THREE
  * delta stores (the [[HybridIndexState]] rule): an interrupted
  * batch looks uncommitted and replays into mode-overwrite dirs.
  *
  * Scale shape: the tombstone set is retraction-scale (≪ corpus);
  * the masks are doc_id equi-anti-joins against delta stores that
  * are already hash-sharded on doc_id. At warehouse scale a
  * compaction job would periodically rewrite the post/emb deltas
  * minus the tombstone set and truncate the tombstone store — the
  * serving read is unchanged either way. */
final class HybridTombstoneState(stateDir: String, nQueries: Int) {
  @volatile private var version: Long = Seq("post", "emb", "tomb")
    .map(t => StreamUtil.latestDelta(s"$stateDir/$t")).min

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val df = batch.toDF()
    val ups = df.filter(col("op") === "u")
    StreamUtil.writeDelta(
      graft.operators.VectorOps.hybridPostings(
        ups.filter(col("text").isNotNull).select(col("doc_id"), col("text"))),
      s"$stateDir/post", batchId, Seq("doc_id"))
    StreamUtil.writeDelta(
      ups.filter(col("embedding").isNotNull)
        .select(col("doc_id").as("vec_id"), col("embedding")),
      s"$stateDir/emb", batchId, Seq("vec_id"))
    StreamUtil.writeDelta(
      df.filter(col("op") === "d").select(col("doc_id")).distinct(),
      s"$stateDir/tomb", batchId, Seq("doc_id"))
    version = batchId
  }

  def report(spark: SparkSession): DataFrame = {
    val tomb = StreamUtil.readDeltas(spark, s"$stateDir/tomb",
      "doc_id BIGINT", version)
    graft.operators.VectorOps.hybridFromIndex(
      StreamUtil.readDeltas(spark, s"$stateDir/post",
        "doc_id BIGINT, dl BIGINT, term STRING, tf BIGINT", version)
        .join(tomb, Seq("doc_id"), "left_anti"),
      StreamUtil.readDeltas(spark, s"$stateDir/emb",
        "vec_id BIGINT, embedding ARRAY<FLOAT>", version)
        .join(tomb.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_anti"),
      nQueries)
  }
}

/** Streaming semantic-dedup index — the serve-while-ingesting shape
  * of [[graft.operators.VectorOps.semanticClustersIvf]]: centroids
  * are FIXED configuration (a real platform trains them offline and
  * ships them with the job — the stream_ab_cuped cutoff convention),
  * each micro-batch delta-appends its probed rows and is IVF-screened
  * against the accumulated probe index (batch × seen + batch ×
  * batch, never seen × seen — [[graft.operators.VectorOps
  * .ivfPairsIncremental]], the corpus-filter incremental discipline
  * on the IVF index instead of the LSH index); verified pairs
  * accrue, and the report runs the SAME min-label component election
  * as the batch path. Under id-disjoint batching the accrued pair
  * set equals the batch pair set, so drained ≡ batch (the parity
  * spec's contract). Pairs written LAST as the commit guard. */
final class SemanticIvfState(stateDir: String, cents: Array[Float],
                             threshold: Double, nProbe: Int) {
  @volatile private var version: Long = StreamUtil.latestDelta(s"$stateDir/pairs")

  private def probeDdl = "vec_id BIGINT, embedding ARRAY<FLOAT>, pcell INT"

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val batchProbe = graft.operators.VectorOps.ivfProbeRows(
      batch.toDF().select(col("vec_id"), col("embedding")), cents, nProbe)
    val seen = StreamUtil.readDeltas(spark, s"$stateDir/probe", probeDdl, version)
    val newPairs = graft.operators.VectorOps.ivfPairsIncremental(
      batchProbe, seen, threshold)
    StreamUtil.writeDelta(batchProbe, s"$stateDir/probe", batchId, Seq("vec_id"))
    StreamUtil.writeDelta(newPairs, s"$stateDir/pairs", batchId, Seq("vec_a"))
    version = batchId
  }

  def report(spark: SparkSession): DataFrame = {
    // memo-registered so GraftCaches.clearAll releases the persisted
    // label table (the CorpusFilterStream.labelsCache discipline)
    val labels = SemanticIvfState.labelsCache
      .getOrElseUpdate((spark, stateDir, version)) {
        graft.operators.Dedup.propagateMinLabels(spark,
          StreamUtil.readDeltas(spark, s"$stateDir/pairs",
            "vec_a BIGINT, vec_b BIGINT", version)
            .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")),
          maxIters = 60, who = "streamSemanticIvf")
      }
    StreamUtil.readDeltas(spark, s"$stateDir/probe", probeDdl, version)
      .select(col("vec_id")).distinct()
      .join(labels.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("lbl"), col("vec_id")).as("cluster_rep"))
      .withColumn("is_kept", col("cluster_rep") === col("vec_id"))
      .orderBy(col("vec_id"))
  }
}

object SemanticIvfState {
  private[streaming] val labelsCache =
    graft.GraftCaches.memo[(SparkSession, String, Long), DataFrame](_.unpersist())
}

/** Streaming Naive-Bayes training state —
  * [[graft.operators.CorpusQa.nbLangClassifierTransform]]'s twin:
  * the classifier's sufficient statistics are two ADDITIVE count
  * grids (per-(class, token) counts — vocab-scale, hash-sharded on
  * write — and per-class doc priors), so the model trains
  * incrementally with one map-side-combinable aggregate per batch;
  * the evaluation face re-reads the staged corpus and scores it
  * through the SAME `nbConfusionFromState` derivation the batch
  * operator runs. This is the online shape of every
  * retrain-as-data-arrives quality/language filter.
  * Versioned-parquet + replay-guard discipline ([[CdcCompact]]). */
final class NbLangState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def priorGrid(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "lang STRING, tok STRING, cnt BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/grid")

  private def priorDocs(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "lang STRING, n_docs BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version/priors")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val (pGrid, pPriors) = graft.operators.CorpusQa.nbTrainCounts(batch.toDF())
    val grid = priorGrid(spark).unionByName(pGrid)
      .groupBy(col("lang"), col("tok")).agg(sum(col("cnt")).as("cnt"))
    val priors = priorDocs(spark).unionByName(pPriors)
      .groupBy(col("lang")).agg(sum(col("n_docs")).as("n_docs"))
    StreamUtil.writeSharded(grid, s"$stateDir/v$batchId/grid", Seq("lang", "tok"))
    StreamUtil.writeGrid(priors, s"$stateDir/v$batchId/priors")
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  /** Evaluation face: confusion matrix of the trained model over the
    * given corpus (the staged input the stream just drained). */
  def confusion(spark: SparkSession, docsPath: String): DataFrame =
    graft.operators.CorpusQa.nbConfusionFromState(
      priorGrid(spark), priorDocs(spark), spark.read.parquet(docsPath))
}

object NbLangStream {

  /** Queries entry (oracle: same SQL as `nb_lang_classifier`): the
    * documents corpus staged as 4 files, trained through the
    * additive NB state one micro-batch at a time, then evaluated on
    * the same staged corpus through the shared scoring derivation. */
  def streamNbLang(spark: SparkSession, dir: String, nFiles: Int = 4): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_snb_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new NbLangState(s"$work/state")
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.confusion(spark, s"$work/input")
  }
}
