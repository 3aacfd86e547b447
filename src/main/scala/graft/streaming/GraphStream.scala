package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming faces for the graph-analytics family: the co-engagement
  * graph maintained INCREMENTALLY. The state is not the graph — it is
  * the distinct (user_id, item) PRESENCE set, which merges by set
  * union (idempotent: replays and duplicate deliveries are free) —
  * and the graph is a pure read: the per-user item cap, the pair
  * counts, the top-E edge cut, and the centrality iterations all
  * derive through the batch operators' own code
  * ([[graft.operators.Behavior.coEngagementFromItems]] →
  * [[graft.operators.Graph.pagerankTransform]]/`katzTransform`), so
  * stream/batch parity is by construction.
  *
  * Why presence and not edges: per-batch edge counts do NOT merge —
  * a user contributing items across two micro-batches creates pairs
  * that neither batch sees locally. The presence set is the minimal
  * state from which every cross-batch pair is recoverable, and it is
  * bounded by distinct (user, item) pairs — the same cardinality the
  * batch query's first aggregate materializes.
  *
  * Versioned-parquet + replay-guard discipline ([[CdcCompact]]). */
final class UserItemState(stateDir: String) {
  @volatile private var version: Long = StreamUtil.latestVersion(stateDir)

  private def prior(spark: SparkSession): DataFrame =
    if (version < 0)
      spark.createDataFrame(java.util.List.of[Row](), StructType.fromDDL(
        "user_id BIGINT, item BIGINT"))
    else spark.read.parquet(s"$stateDir/v$version")

  def merge(batch: Dataset[Row], batchId: Long): Unit = {
    if (batchId <= version) return
    val spark = batch.sparkSession
    // NULL items kept: the batch twin's per-user item count includes
    // them (they only drop at the pair filter), and the ≤50 cap must
    // see the identical count
    val partial = batch
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .distinct()
    val merged = prior(spark).unionByName(partial).distinct()
    StreamUtil.writeSharded(merged, s"$stateDir/v$batchId", Seq("user_id", "item"))
    val prev = version
    version = batchId
    if (prev >= 0) StreamUtil.delete(spark, s"$stateDir/v$prev")
  }

  private def edges(spark: SparkSession): DataFrame =
    graft.operators.Behavior
      .coEngagementFromItems(prior(spark), maxItems = 50, minSupport = 1L)
      .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
      .limit(800)
      .select(col("item_a"), col("item_b"))

  /** PageRank over the state-derived graph — the batch transform on
    * the read-time edge cut. */
  def reportPagerank(spark: SparkSession): DataFrame =
    graft.operators.Graph.pagerankTransform(edges(spark))

  /** SECOND face: Katz centrality over the same presence state. */
  def reportKatz(spark: SparkSession): DataFrame =
    graft.operators.Graph.katzTransform(edges(spark))

  /** THIRD face: degree assortativity over the same presence state —
    * the mixing-structure one-liner next to the centrality reads. */
  def reportAssortativity(spark: SparkSession): DataFrame =
    graft.operators.Graph.degreeAssortativityTransform(edges(spark))

  /** FOURTH face: k-core decomposition over the same presence state
    * (the h-index locality iteration is a pure read over the
    * state-derived edge cut, like the centrality faces). */
  def reportKCore(spark: SparkSession): DataFrame =
    graft.operators.Graph.kCoreTransform(edges(spark))

  /** FIFTH face: personalized PageRank over the same presence state
    * — the seed-local relevance read next to the global centralities. */
  def reportPpr(spark: SparkSession): DataFrame =
    graft.operators.Graph.pprTransform(edges(spark))

  /** SIXTH face: the derandomized random-walk corpus over the same
    * presence state — graph-embedding training data as a pure read. */
  def reportRandomWalks(spark: SparkSession): DataFrame =
    graft.operators.Graph.randomWalksTransform(edges(spark))

  /** SEVENTH face: sampled harmonic centrality over the same
    * presence state. */
  def reportHarmonic(spark: SparkSession): DataFrame =
    graft.operators.Graph.harmonicCentralityTransform(edges(spark))

  /** EIGHTH face: sampled betweenness over the same presence state. */
  def reportBetweenness(spark: SparkSession): DataFrame =
    graft.operators.Graph.betweennessTransform(edges(spark))
}

object GraphStream {

  /** Queries entry (oracle: same SQL as `pagerank_items`): the event
    * stream drained through the presence state — no staging needed,
    * set union merges in any delivery order. */
  def streamPagerank(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sgraph_")
    val state = new UserItemState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportPagerank(spark)
  }

  /** Queries entry (oracle: same SQL as `katz_centrality`): the SAME
    * presence state, second face. */
  def streamKatz(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_skatz_")
    val state = new UserItemState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportKatz(spark)
  }

  /** Queries entry (oracle: same SQL as `degree_assortativity`): the
    * SAME presence state, third face. */
  def streamAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sassort_")
    val state = new UserItemState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportAssortativity(spark)
  }

  /** Queries entry (rows-only, like `k_core` itself — the peel/round
    * count is data-dependent, not a fixed unrolled CTE; gated by the
    * stream≡batch parity spec + k_core's property spec): the SAME
    * presence state, fourth face. */
  def streamKCore(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_skcore_")
    val state = new UserItemState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportKCore(spark)
  }

  /** Queries entry (oracle: same SQL as `ppr_items`): the SAME
    * presence state, fifth face. */
  def streamPpr(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sppr_")
    val state = new UserItemState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportPpr(spark)
  }

  /** Queries entry (oracle: same SQL as `random_walks`): the SAME
    * presence state, sixth face. */
  def streamRandomWalks(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_swalk_")
    val state = new UserItemState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportRandomWalks(spark)
  }

  /** Queries entry (oracle: same SQL as `harmonic_centrality`): the
    * SAME presence state, seventh face. */
  def streamHarmonic(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sharm_")
    val state = new UserItemState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportHarmonic(spark)
  }

  /** Queries entry (rows-only like `betweenness_centrality` itself —
    * the depth-peeled backward recurrence has no fixed relational
    * unrolling; gated by the stream≡batch parity spec + the batch
    * operator's Brandes-reference spec): the SAME presence state,
    * eighth face. */
  def streamBetweenness(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_sbetw_")
    val state = new UserItemState(s"$work/state")
    StreamSources.runForeachBatch(StreamSources.events(spark, dir), state.merge)
    state.reportBetweenness(spark)
  }
}
