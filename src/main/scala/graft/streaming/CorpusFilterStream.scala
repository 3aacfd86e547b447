package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** The end-to-end corpus keep/drop gate as a STREAM — the daily-
  * ingest shape of [[graft.operators.TextOps.corpusFilter]] (the
  * composition every cleaning stage exists for): documents arrive in
  * micro-batches; language and quality verdicts are per-doc and
  * stateless, and the near-dup verdict is maintained INCREMENTALLY —
  * each batch is LSH-screened against the accumulated signature
  * index (batch × seen + batch × batch, never seen × seen), the
  * verified pair graph accrues, and the final report re-elects
  * cluster representatives over the full pair set and runs the SAME
  * keep/drop derivation as the batch operator
  * ([[graft.operators.TextOps.corpusFilterVerdict]] — parity by
  * shared code).
  *
  * Why representatives are elected at REPORT time, not per batch: a
  * later document can bridge two earlier components (5—9 and 1—9
  * edges arriving after 5 was already "kept"), so per-doc dedup
  * verdicts are not final until the pair graph stops growing — the
  * report is the election. The per-batch work (the expensive part:
  * signatures + index probe + Jaccard verify) IS incremental; the
  * election is pair-graph-sized, not corpus-sized.
  *
  * State (DELTA-APPEND parquet, [[StreamUtil.writeDelta]] — these
  * tables grow with the CORPUS, so the versioned-rewrite layout the
  * grid states use would re-write the whole index every batch,
  * quadratic write volume over the stream's lifetime; each batch
  * appends only its own partial):
  *  - `bands` (doc_id, band, band_hash): the LSH index, equi-join
  *    probed by each batch — 32 short rows per doc;
  *  - `sets`  (doc_id, sh): shingle sets for exact verification of
  *    the candidates the index surfaces;
  *  - `pairs` (doc_a, doc_b): the verified near-dup graph — each
  *    pair surfaces in exactly one batch (its later endpoint's), so
  *    deltas never duplicate;
  *  - `meta`  (doc_id, pred_lang, quality): the stateless verdicts —
  *    written LAST as the commit guard (a crashed batch's other
  *    deltas stay invisible behind the `batch <= guard` read filter
  *    and are overwritten on replay).
  *
  * Scale: per batch the seen index is only equi-joined on
  * (band, band_hash) — queried, never self-joined; the union of
  * per-batch pair discoveries over an id-disjoint batching equals
  * the full self-join pair set (each pair surfaces when its later
  * endpoint arrives), so the drained stream equals the batch
  * operator row-for-row and shares its oracle.
  */
final class CorpusFilterState(stateDir: String, threshold: Double) {
  @volatile private var version: Long = StreamUtil.latestDelta(s"$stateDir/meta")

  private def part(spark: SparkSession, name: String, ddl: String): DataFrame =
    StreamUtil.readDeltas(spark, s"$stateDir/$name", ddl, version)

  private def bands(spark: SparkSession) =
    part(spark, "bands", "doc_id BIGINT, band INT, band_hash BIGINT")
  private def sets(spark: SparkSession) =
    part(spark, "sets", "doc_id BIGINT, sh ARRAY<STRING>")
  private def pairs(spark: SparkSession) =
    part(spark, "pairs", "doc_a BIGINT, doc_b BIGINT")
  private def meta(spark: SparkSession) =
    part(spark, "meta", "doc_id BIGINT, pred_lang STRING, quality DOUBLE")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val docs = batch.toDF()
    // prior reads filter batch <= version (pre-update), so the new
    // deltas written below are invisible to this batch's probe
    val (newPairs, batchBands, batchSets) =
      Dedup.incrementalPairs(spark, docs, bands(spark), sets(spark), threshold)
    val batchMeta = TextOps.langIdTransform(docs).select(col("doc_id"), col("pred_lang"))
      .join(TextOps.textQualityTransform(docs).select(col("doc_id"), col("quality")),
        Seq("doc_id"))
    StreamUtil.writeDelta(batchBands, s"$stateDir/bands", batchId, Seq("doc_id"))
    StreamUtil.writeDelta(batchSets, s"$stateDir/sets", batchId, Seq("doc_id"))
    StreamUtil.writeDelta(newPairs, s"$stateDir/pairs", batchId, Seq("doc_a"))
    StreamUtil.writeDelta(batchMeta, s"$stateDir/meta", batchId, Seq("doc_id"))
    version = batchId
  }

  /** The election + keep/drop report over the drained state. The
    * converged label table is persisted by the propagation core;
    * registering it in [[CorpusFilterStream.labelsCache]] keyed by
    * (state, version) puts its release under GraftCaches.clearAll
    * like every other memoized table. */
  def report(spark: SparkSession, minQuality: Double, langs: Seq[String]): DataFrame = {
    val labels = CorpusFilterStream.labelsCache
      .getOrElseUpdate((spark, stateDir, version)) {
        Dedup.propagateMinLabels(spark,
          pairs(spark), maxIters = 20, who = "streamCorpusFilter")
      }
    val m = meta(spark)
    val dedup = m.select(col("doc_id"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("lbl"), col("doc_id")) === col("doc_id")).as("dedup_kept"))
    TextOps.corpusFilterVerdict(
      m.select(col("doc_id"), col("pred_lang")),
      m.select(col("doc_id"), col("quality")),
      dedup, minQuality, langs)
  }
}

/** [[CorpusFilterState]] WITH RETRACTIONS — the CDC tombstone
  * discipline ([[CdcCompact]] 10a' semantics, the
  * [[HybridTombstoneState]] shape) applied to the ingest gate: 'u'
  * rows run the normal incremental screen; 'd' rows delta-append the
  * doc_id to a fifth, tombstone store (written BEFORE meta, which
  * stays the commit guard — every store lands before the guard, so a
  * crash anywhere replays the whole batch). Serving masks the
  * verdict table (meta anti-join tomb) and the pair graph (BOTH
  * endpoints must be live) before the representative election.
  *
  * Why endpoint masking is EXACT: a verified near-dup pair depends
  * only on its two endpoint documents (signatures → candidates →
  * Jaccard verify — no third doc enters), so the live-endpoint
  * subset of the accrued pair graph IS the pair set the batch
  * operator computes over the tombstone-compacted corpus — including
  * re-election when the retracted doc was a component's min-id
  * representative, and component SPLITS when it was the only bridge
  * (5—9—1 with 9 retracted leaves 5 and 1 kept separately, exactly
  * as batch-over-live does).
  *
  * Scale note: dead docs' bands stay in the LSH index until a
  * compaction rewrites the delta stores minus tombstones — later
  * batches may surface (live, dead) candidates whose verified pairs
  * are then masked at report; wasted probe work bounded by the
  * retraction rate, correctness unaffected. */
final class CorpusFilterTombstoneState(stateDir: String, threshold: Double) {
  @volatile private var version: Long = StreamUtil.latestDelta(s"$stateDir/meta")

  private def part(spark: SparkSession, name: String, ddl: String): DataFrame =
    StreamUtil.readDeltas(spark, s"$stateDir/$name", ddl, version)

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    val docs = batch.toDF()
    val ups = docs.filter(col("op") === "u").drop("op")
    val (newPairs, batchBands, batchSets) = Dedup.incrementalPairs(spark, ups,
      part(spark, "bands", "doc_id BIGINT, band INT, band_hash BIGINT"),
      part(spark, "sets", "doc_id BIGINT, sh ARRAY<STRING>"), threshold)
    val batchMeta = TextOps.langIdTransform(ups).select(col("doc_id"), col("pred_lang"))
      .join(TextOps.textQualityTransform(ups).select(col("doc_id"), col("quality")),
        Seq("doc_id"))
    StreamUtil.writeDelta(batchBands, s"$stateDir/bands", batchId, Seq("doc_id"))
    StreamUtil.writeDelta(batchSets, s"$stateDir/sets", batchId, Seq("doc_id"))
    StreamUtil.writeDelta(newPairs, s"$stateDir/pairs", batchId, Seq("doc_a"))
    StreamUtil.writeDelta(
      docs.filter(col("op") === "d").select(col("doc_id")).distinct(),
      s"$stateDir/tomb", batchId, Seq("doc_id"))
    StreamUtil.writeDelta(batchMeta, s"$stateDir/meta", batchId, Seq("doc_id"))
    version = batchId
  }

  def report(spark: SparkSession, minQuality: Double, langs: Seq[String]): DataFrame = {
    val tomb = part(spark, "tomb", "doc_id BIGINT")
    val livePairs = part(spark, "pairs", "doc_a BIGINT, doc_b BIGINT")
      .join(tomb.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
      .join(tomb.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
    val labels = CorpusFilterStream.labelsCache
      .getOrElseUpdate((spark, stateDir, version)) {
        Dedup.propagateMinLabels(spark, livePairs,
          maxIters = 20, who = "streamCorpusFilterTombstone")
      }
    val m = part(spark, "meta", "doc_id BIGINT, pred_lang STRING, quality DOUBLE")
      .join(tomb, Seq("doc_id"), "left_anti")
    val dedup = m.select(col("doc_id"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("lbl"), col("doc_id")) === col("doc_id")).as("dedup_kept"))
    TextOps.corpusFilterVerdict(
      m.select(col("doc_id"), col("pred_lang")),
      m.select(col("doc_id"), col("quality")),
      dedup, minQuality, langs)
  }
}

object CorpusFilterStream {

  private[streaming] val labelsCache =
    graft.GraftCaches.memo[(SparkSession, String, Long), DataFrame](_.unpersist())

  /** Queries entry (oracle: same SQL as `corpus_filter`): the
    * documents corpus staged as `nFiles` files and replayed one per
    * micro-batch through the incremental gate. */
  def streamCorpusFilter(spark: SparkSession, dir: String, nFiles: Int = 4,
                         minQuality: Double = 0.5, threshold: Double = 0.5,
                         langs: Seq[String] = Seq("en")): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_scfilter_")
    graft.sources.Tables.documents(spark, dir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new CorpusFilterState(s"$work/state", threshold)
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark, minQuality, langs)
  }

  /** Queries entry (oracle: the corpus_filter SQL over the
    * tombstone-compacted live corpus — a `documents` CTE shadowing
    * the table): upserts for every doc plus a delete op for each doc
    * with `doc_id % 7 == 3` (the retraction slice convention of
    * `stream_hybrid_rrf_tombstone`); delete-wins semantics keep the
    * staging order-free. */
  def streamCorpusFilterTombstone(spark: SparkSession, dir: String, nFiles: Int = 4,
                                  minQuality: Double = 0.5, threshold: Double = 0.5,
                                  langs: Seq[String] = Seq("en")): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_scftomb_")
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.withColumn("op", lit("u"))
      .unionByName(docs.filter(col("doc_id") % 7 === 3)
        .withColumn("op", lit("d")))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$work/input")
    val state = new CorpusFilterTombstoneState(s"$work/state", threshold)
    StreamSources.runForeachBatch(
      StreamSources.parquetStream(spark, s"$work/input", maxFilesPerTrigger = 1),
      state.merge)
    state.report(spark, minQuality, langs)
  }
}
