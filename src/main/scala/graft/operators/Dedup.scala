package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftCaches
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Near-duplicate detection at scale: MinHash+LSH and SimHash.
  *
  * Both operators follow the same scale-safe shape: per-document
  * fingerprints are computed map-side (one scan, codegen'd array
  * expressions), candidate generation is a shuffle on short bucket
  * keys (never the text), and only candidate pairs are verified
  * exactly. Nothing here is O(n²) in the corpus — that's the whole
  * point versus TextOps.wordJaccardPairs (the exact, blocked
  * baseline).
  */
object Dedup {

  /** 3-word shingles of the document, as an array<string> column. */
  private val shingleExpr =
    """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
      |  i -> concat_ws(' ', slice(split(text, ' '), i, 3)))""".stripMargin

  /** MinHash + banded LSH near-dup pairs (Broder 1997).
    *
    * Each shingle is string-hashed ONCE (FNV-1a + splitmix64
    * avalanche, [[graft.functions.MinHash.compute]]); the per-
    * permutation values derive from that 64-bit h via the splitmix64
    * stream (mix(h + p·golden), p = 0..63) and sig[p] is the min over
    * shingles. `bands` bands x `rows` rows: docs sharing any band hash become
    * candidate pairs; candidates are confirmed with exact shingle-set
    * Jaccard. P(candidate | j) = 1 - (1 - j^rows)^bands — with the
    * default 32x2 that is > 0.9999 at j = 0.5, so on any corpus
    * whose near-dup pairs sit at or above the threshold the output
    * equals the exact quadratic all-pairs result (which is the
    * DuckDB oracle for this query).
    *
    * Scale contract: only (doc_id, band, band_hash) goes through the
    * candidate shuffle — never shingles or text. The surviving pair
    * list (tiny) is then joined back to a compact doc_id → shingle-set
    * table for exact verification, so document content is read twice
    * but shuffled at most once, keyed by doc_id, for candidate docs
    * only.
    */
  /** Materialized MinHash signature table: (doc_id, sig[64]).
    *
    * Materialization (persist; at warehouse scale: a parquet stage)
    * matters twice over: (a) the banded self-join would otherwise
    * recompute all 64 minhash passes per side, and (b) Catalyst's
    * projection collapse inlines the sig-building lambda into every
    * downstream per-band reference, multiplying the minhash work
    * ~20× (measured: the band projection alone went 9.1s → 0.12s at
    * sf0.01 once the table is materialized). 520 bytes per doc —
    * storage-trivial next to the corpus. Memoized per (session, dir,
    * size). */
  private val sigCache =
    GraftCaches.memo[(SparkSession, String, Int), DataFrame](_.unpersist())

  private val setsCache =
    GraftCaches.memo[(SparkSession, String), DataFrame](_.unpersist())

  private def sigTable(spark: SparkSession, dir: String, nHashes: Int): DataFrame =
    sigCache.getOrElseUpdate((spark, dir, nHashes)) {
      import spark.implicits._
      GraftFunctions.register(spark)
      val t = Tables.documents(spark, dir)
        .select($"doc_id",
          call_function("graft_minhash", expr(shingleExpr), lit(nHashes)).as("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // eager: the banded self-join's sides + broadcast threads must
      // not race to fill the cache (per-partition block-lock waits)
      t.count()
      t
    }

  /** Verified near-dup pair list, memoized + persisted: both the
    * pair query itself and downstream consumers (clustering) read it,
    * and it is tiny (ids + jaccard). */
  private val pairsCache =
    GraftCaches.memo[(SparkSession, String, Double, Int, Int), DataFrame](_.unpersist())

  private def minHashPairs(spark: SparkSession, dir: String, threshold: Double,
                           bands: Int, rows: Int): DataFrame =
    pairsCache.getOrElseUpdate((spark, dir, threshold, bands, rows)) {
      import spark.implicits._
      // Candidate generation: ids + 64-bit band hashes only. The band
      // hash mixes the band's `rows` signature slots through the
      // scalar (codegen'd) xxhash64 — no array allocation per band.
      val bandHashExpr = (0 until rows).map(r => s"element_at(sig, b * $rows + ${r + 1})")
        .mkString(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(", ", ", ", b))")
      val banded = sigTable(spark, dir, bands * rows)
        .select($"doc_id", posexplode(expr(bandHashExpr)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_hash")

      val candidates = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .dropDuplicates("id_a", "id_b")

      // Exact verification: fetch shingle sets for candidate docs only.
      // Persisted + eager for the same reason as the signature table —
      // it feeds both sides of the pair join, and shingling each doc
      // twice is the larger half of this query's work.
      val sets = setsCache.getOrElseUpdate((spark, dir)) {
        val t = Tables.documents(spark, dir)
          .select($"doc_id", array_sort(array_distinct(expr(shingleExpr))).as("sh"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        t.count()
        t
      }
      val pairs = candidates
        .join(sets.select($"doc_id".as("id_a"), $"sh".as("da")), Seq("id_a"))
        .join(sets.select($"doc_id".as("id_b"), $"sh".as("db")), Seq("id_b"))
        .withColumn("inter", call_function("graft_sorted_intersect_size", $"da", $"db"))
        .withColumn("jaccard",
          round($"inter".cast("double") / (size($"da") + size($"db") - $"inter"), 4))
        .filter($"jaccard" >= threshold)
        .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"jaccard")
        .persist(StorageLevel.MEMORY_AND_DISK)
      pairs.count()
      pairs
    }

  def minHashLsh(spark: SparkSession, dir: String, threshold: Double = 0.5,
                 bands: Int = 32, rows: Int = 2): DataFrame = {
    import spark.implicits._
    minHashPairs(spark, dir, threshold, bands, rows).orderBy($"doc_a", $"doc_b")
  }

  /** Per-batch pair discovery for the incremental corpus gate: the
    * verified shingle-Jaccard pairs CONTRIBUTED by a new batch —
    * batch × seen-index plus batch × batch — using the identical
    * signature/band/verify chain as [[minHashPairs]], so the union of
    * per-batch pairs over an id-disjoint batching of the corpus
    * equals the full self-join's pair set (every pair surfaces when
    * its later endpoint arrives).
    *
    * Inputs: the batch docs (doc_id, text) and the accumulated index
    * — `seenBands` (doc_id, band, band_hash) and `seenSets`
    * (doc_id, sh). Returns (verifiedPairs, batchBands, batchSets);
    * the caller folds the latter two into its state. Scale: the
    * batch side is small; the seen side is only ever EQUI-joined on
    * (band, band_hash) — the index is queried, never self-joined. */
  private[graft] def incrementalPairs(spark: SparkSession, batchDocs: DataFrame,
                                      seenBands: DataFrame, seenSets: DataFrame,
                                      threshold: Double, bands: Int = 32,
                                      rows: Int = 2): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val bandHashExpr = (0 until rows).map(r => s"element_at(sig, b * $rows + ${r + 1})")
      .mkString(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(", ", ", ", b))")
    val batchBands = batchDocs
      .select($"doc_id",
        call_function("graft_minhash", expr(shingleExpr), lit(bands * rows)).as("sig"))
      .select($"doc_id", posexplode(expr(bandHashExpr)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val batchSets = batchDocs
      .select($"doc_id", array_sort(array_distinct(expr(shingleExpr))).as("sh"))

    val allBands = seenBands.unionByName(batchBands)
    val candidates = batchBands.as("a")
      .join(allBands.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val allSets = seenSets.unionByName(batchSets)
    val verified = candidates
      .join(allSets.select($"doc_id".as("id_a"), $"sh".as("da")), Seq("id_a"))
      .join(allSets.select($"doc_id".as("id_b"), $"sh".as("db")), Seq("id_b"))
      .withColumn("inter", call_function("graft_sorted_intersect_size", $"da", $"db"))
      .withColumn("jaccard",
        round($"inter".cast("double") / (size($"da") + size($"db") - $"inter"), 4))
      .filter($"jaccard" >= threshold)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"))
    (verified, batchBands, batchSets)
  }

  /** Incremental dedup: screen a NEW batch of documents against an
    * EXISTING corpus — the shape production ingestion actually runs
    * (the self-join variants above are the bootstrap pass; every
    * day after that is this asymmetric pass). The batch/corpus split
    * here is the deterministic `md5(doc_id:salt) mod 100` slice
    * ([[graft.operators.Sampling.splitHash]], `hv >= 100-batchPct` =
    * new batch) standing in for "today's crawl".
    *
    * Verdict per batch document:
    *   - `exact_dup`  — a corpus document has identical content
    *     (md5 equi-join; (hash, id) through the shuffle, never text);
    *   - `near_dup`   — best corpus match by shingle Jaccard ≥
    *     `threshold`, found via the SAME banded-LSH join as
    *     [[minHashLsh]] but batch-side × corpus-side (never
    *     batch × batch, never corpus × corpus): candidates carry only
    *     (id, band, band_hash), verification fetches shingle sets for
    *     survivors, `dup_of` = argmax Jaccard (ties → min corpus id);
    *   - `unique`     — neither.
    *
    * Scale: the corpus side is the big one and it is never
    * self-joined; band posting lists bound the candidate count, and
    * the output shuffles (batch_id, corpus_id, jaccard) triples.
    * The full-oracle argument is [[minHashLshOracleSql]]'s: 32×2
    * banding has >0.9999 recall at t=0.5 and false positives are
    * removed exactly, so the DuckDB all-pairs oracle matches. */
  def dedupIncremental(spark: SparkSession, dir: String, threshold: Double = 0.5,
                       batchPct: Int = 20, bands: Int = 32, rows: Int = 2,
                       salt: String = "graft"): DataFrame = {
    import spark.implicits._
    val hv = Sampling.splitHash($"doc_id", salt) % 100
    val cut = 100 - batchPct
    val batch = Tables.documents(spark, dir)
      .filter(hv >= cut).select($"doc_id", $"text")
    screenBatch(spark, dir, batch, threshold, batchPct, bands, rows, salt)
      .orderBy($"doc_id")
  }

  /** The screening core shared by [[dedupIncremental]] and the
    * streaming twin ([[graft.streaming.StreamIncrementalDedup]]):
    * verdicts for an ARBITRARY batch of (doc_id, text) documents
    * against the corpus slice of `dir`. The corpus-side signature
    * table is the memoized [[sigTable]] (built once, reused by every
    * micro-batch — the "index the warehouse once, screen each
    * delivery" shape); the batch side computes its signatures and
    * shingle sets on the fly, map-side. */
  def screenBatch(spark: SparkSession, dir: String, batch: DataFrame,
                  threshold: Double = 0.5, batchPct: Int = 20,
                  bands: Int = 32, rows: Int = 2,
                  salt: String = "graft"): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val hv = Sampling.splitHash($"doc_id", salt) % 100
    val cut = 100 - batchPct
    val corpus = Tables.documents(spark, dir).filter(hv < cut)

    // exact layer: content-hash equi-join, min corpus id per batch doc
    val batchIds = batch.select($"doc_id", md5($"text").as("ch"))
    val corpusHashes = corpus.select($"doc_id".as("c_id"), md5($"text").as("ch"))
    val exactBest = batchIds.join(corpusHashes, Seq("ch"))
      .groupBy($"doc_id").agg(min($"c_id").as("exact_of"))

    // near layer: banded LSH join, batch side × corpus side
    val bandHashExpr = (0 until rows).map(r => s"element_at(sig, b * $rows + ${r + 1})")
      .mkString(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(", ", ", ", b))")
    def explodeBands(sigs: DataFrame): DataFrame = sigs
      .select($"doc_id", posexplode(expr(bandHashExpr)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val corpusBands = explodeBands(
      sigTable(spark, dir, bands * rows)
        .join(corpus.select($"doc_id"), Seq("doc_id")))
      .select($"doc_id".as("c_id"), $"band", $"band_hash")
    val batchBands = explodeBands(
      batch.select($"doc_id",
        call_function("graft_minhash", expr(shingleExpr), lit(bands * rows)).as("sig")))
    val candidates = batchBands
      .join(corpusBands, Seq("band", "band_hash"))
      .select($"doc_id", $"c_id")
      .dropDuplicates("doc_id", "c_id")

    val corpusSets = setsCache.getOrElseUpdate((spark, dir)) {
      val t = Tables.documents(spark, dir)
        .select($"doc_id", array_sort(array_distinct(expr(shingleExpr))).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t.count()
      t
    }
    val batchSets = batch
      .select($"doc_id", array_sort(array_distinct(expr(shingleExpr))).as("bs"))
    val verified = candidates
      .join(batchSets, Seq("doc_id"))
      .join(corpusSets.select($"doc_id".as("c_id"), $"sh".as("cs")), Seq("c_id"))
      .withColumn("inter", call_function("graft_sorted_intersect_size", $"bs", $"cs"))
      .withColumn("jaccard",
        round($"inter".cast("double") / (size($"bs") + size($"cs") - $"inter"), 4))
      .filter($"jaccard" >= threshold)
    val bestNear = verified
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
          .orderBy($"jaccard".desc, $"c_id")))
      .filter($"rk" === 1)
      .select($"doc_id", $"c_id".as("near_of"), $"jaccard")

    batch.select($"doc_id")
      .join(exactBest, Seq("doc_id"), "left")
      .join(bestNear, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"exact_of".isNotNull, "exact_dup")
          .when($"near_of".isNotNull, "near_dup")
          .otherwise("unique").as("verdict"),
        when($"exact_of".isNotNull, $"exact_of").otherwise($"near_of").as("dup_of"),
        when($"exact_of".isNull, $"jaccard").as("jaccard"))
  }

  /** Exact all-pairs shingle-Jaccard — the quadratic correctness
    * oracle for [[minHashLsh]]; used by the spec at sf0.001 and as
    * the DuckDB oracle shape. Never the production path. */
  def exactShingleJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .select($"doc_id", array_distinct(expr(shingleExpr)).as("sh"))
    val a = d.select($"doc_id".as("doc_a"), $"sh".as("da"))
    val b = d.select($"doc_id".as("doc_b"), $"sh".as("db"))
    a.join(b, $"doc_a" < $"doc_b")
      .withColumn("inter", size(array_intersect($"da", $"db")))
      .withColumn("jaccard",
        round($"inter".cast("double") / (size($"da") + size($"db") - $"inter"), 4))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** DuckDB analog of [[exactShingleJaccard]] — valid as the oracle
    * for [[minHashLsh]] because the banding (32x2 over a 64-long
    * signature) has >0.9999 recall at the 0.5 threshold and the
    * final exact-Jaccard filter removes all false positives; parity
    * is additionally asserted by the spec at sf0.001. */
  def minHashLshOracleSql(threshold: Double = 0.5): String =
    s"""WITH d AS (SELECT doc_id,
       |                  list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
       |                    i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
       |           FROM documents),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |                   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
       |      FROM d a JOIN d b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** Near-dup clustering: connected components over the MinHash-LSH
    * pair graph, emitting the dedup DECISION a training pipeline
    * actually consumes — every document labeled with its cluster
    * representative (the component's min doc_id) and a keep/drop
    * flag.
    *
    * Implementation is Pregel-style iterative min-label propagation:
    * each round, every node takes the min of its own label and its
    * neighbors' labels (one join + one aggregate per round on the
    * edge list — ids only, never text). Rounds needed = component
    * diameter; near-dup components are short chains, so this
    * converges in a handful of rounds (convergence is checked, with
    * a documented cap; adversarial long-chain graphs at warehouse
    * scale would swap in the large-star/small-star variant, same
    * join-based plumbing). The driver loop carries only the
    * converged/iteration state — all data stays distributed.
    */
  /** Converged (node, lbl) label table for the LSH pair graph —
    * memoized + persisted like every shared table here (freed via
    * [[graft.GraftCaches.clearAll]]); the returned DataFrame is
    * eagerly materialized, so nothing downstream re-triggers the
    * iteration. */
  private val labelsCache =
    GraftCaches.memo[(SparkSession, String, Double, Int), DataFrame](_.unpersist())

  private def clusterLabels(spark: SparkSession, dir: String, threshold: Double,
                            maxIters: Int): DataFrame =
    labelsCache.getOrElseUpdate((spark, dir, threshold, maxIters)) {
      import spark.implicits._
      propagateMinLabels(spark,
        minHashPairs(spark, dir, threshold, 32, 2).select($"doc_a", $"doc_b"),
        maxIters, "dedupClusters")
    }

  /** Min-label propagation over an undirected pair graph — the
    * shared connected-components core of [[dedupClusters]] (MinHash
    * edges) and [[dedupSimhashClusters]] (SimHash edges). Takes the
    * (doc_a, doc_b) candidate pairs, symmetrizes, and iterates the
    * per-node neighborhood min until fixpoint; returns the converged
    * (node, lbl) table, eagerly persisted so callers never re-trigger
    * the loop. */
  private[graft] def propagateMinLabels(spark: SparkSession, pairs: DataFrame,
                                        maxIters: Int, who: String): DataFrame = {
    import spark.implicits._
    val edges = pairs
      .unionByName(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    var labels = edges.select($"doc_a".as("node")).distinct()
      .select($"node", $"node".as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    var converged = false
    var iter = 0
    // The iteration jobs shuffle only the (tiny) pair-graph node set;
    // scope the shuffle width down for the loop the same way the
    // streaming runners do — the propagation joins are latency-bound
    // on task count, not data. Restored before the returned plan runs.
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevShuffle = spark.conf.get(shuffleKey)
    spark.conf.set(shuffleKey, "8")
    try {
      while (!converged && iter < maxIters) {
        // ONE job per round: the new label and a changed flag come
        // out of the same join (the flag is just lbl != new lbl, no
        // second labels join needed), and the materializing action
        // is an aggregate over the persisted table rather than a
        // separate count + change-probe — round-3 fix after the
        // honest per-query bench (memo caches cleared) made this
        // loop the slowest operator at 3 jobs per iteration.
        val nbrMin = edges.join(labels, edges("doc_b") === labels("node"))
          .groupBy(edges("doc_a").as("n2")).agg(min($"lbl").as("nbr"))
        // truncateLineage, not persist: the iterate's plan nests the
        // previous round TWICE (join + aggregate input), so the
        // logical plan doubles per round — a long-diameter pair graph
        // (the semantic-cluster components hit this first) blows the
        // driver heap at ANALYSIS time around round ~18 even though
        // each round's data is tiny. Checkpointing flattens every
        // round to a scan; dead rounds go to the ContextCleaner.
        val next = truncateLineage(
          labels.join(nbrMin, labels("node") === nbrMin("n2"), "left")
            .select($"node", $"lbl".as("old_lbl"), least($"lbl", coalesce($"nbr", $"lbl")).as("lbl")))
        // coalesce: sum over an EMPTY label table is NULL — an empty
        // pair graph (every pair tombstone-masked) must read as
        // converged, not crash the driver fold
        val chg = next.agg(coalesce(sum(when($"lbl" =!= $"old_lbl", 1L).otherwise(0L)), lit(0L)))
          .collect()(0).getLong(0)
        labels.unpersist()
        labels = next
        converged = chg == 0
        iter += 1
      }
    } finally spark.conf.set(shuffleKey, prevShuffle)
    // An unconverged labeling is NOT the connected-components answer
    // — surface it instead of letting it be consumed as exact. (A
    // component with diameter > maxIters means an adversarially long
    // near-dup chain; the large-star/small-star variant is the
    // production escalation.)
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$who did NOT converge within $maxIters iterations; " +
          "cluster labels may be incorrect for long-chain components")
    // Memoize the 2-column projection as its own persisted table
    // (tiny: pair-graph nodes only) so the cache cleanup hook
    // releases the actual cached blocks, then free the loop
    // iterate and the edge list — the returned table re-reads
    // neither.
    val out = labels.select($"node", $"lbl").persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    labels.unpersist()
    edges.unpersist()
    out
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", 2014) — the production escalation for ADVERSARIAL
    * graphs: min-label propagation needs diameter rounds (a
    * 10k-long near-dup chain = 10k shuffles), star contraction
    * converges in O(log² n) rounds on any shape.
    *
    * Each round is two join+aggregate passes over the edge list —
    * per node u with neighborhood N(u): m = min(N(u) ∪ {u});
    * large-star connects every neighbor v > u to m, small-star
    * connects every neighbor v ≤ u (and u itself) to m. Edges only
    * ever shuffle as (id, id) pairs; neighborhood minima come from a
    * plain groupBy-min (constant agg state, no neighbor lists).
    * Convergence = the edge multiset stops changing (checked by
    * count + an order-insensitive checksum, one tiny aggregate).
    * Output shape identical to [[dedupClusters]]; equality
    * spec-asserted on the LSH pair graph. */
  /** Per-round lineage truncation for iterative algorithms. With a
    * checkpoint dir configured (`spark.sparkContext.setCheckpointDir`
    * — the cluster deployment) the round is written reliably, so an
    * executor loss mid-iteration recomputes nothing; otherwise falls
    * back to executor-local localCheckpoint (this sandbox / dev),
    * whose blocks die with their executor but whose dead rounds the
    * ContextCleaner reclaims for free. `eager` in both paths, so each
    * round materializes before the next plans on top of it. */
  private def truncateLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  def dedupClustersStar(spark: SparkSession, dir: String, threshold: Double = 0.5,
                        maxIters: Int = 30): DataFrame = {
    import spark.implicits._
    val pairs = minHashPairs(spark, dir, threshold, 32, 2).select($"doc_a", $"doc_b")

    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevShuffle = spark.conf.get(shuffleKey)
    spark.conf.set(shuffleKey, "8")

    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select($"v".as("u"), $"u".as("v"))).filter($"u" =!= $"v").distinct()

    // the two star operators, rendered as join+aggregate passes:
    //  large-star(u): m = min(Γ(u) ∪ {u}) over the FULL neighborhood;
    //    every strictly larger neighbor attaches to m;
    //  small-star(u): edges first direct to their larger endpoint, so
    //    Γ≤(u) holds only smaller neighbors; m = min(Γ≤(u) ∪ {u});
    //    every smaller neighbor AND u itself attach to m.
    def largeStar(e: DataFrame): DataFrame = {
      // symmetrize first: small-star emits directed (large→small)
      // edges, but large-star's minimum is over the FULL undirected
      // neighborhood Γ(u) — Kiveris et al.'s MR formulation emits
      // both (u,v) and (v,u) before grouping, and skipping that step
      // can fix-point on a non-components edge set.
      val s = sym(e)
      val mins = s.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
      s.filter($"v" > $"u").join(mins, Seq("u"))
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v")
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      val mins = dir.groupBy($"u").agg(min($"v").as("m")) // v < u always
      dir.join(mins, Seq("u"))
        .select($"v".as("u"), $"m".as("v"))
        .unionByName(mins.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .distinct()
    }

    def checksum(e: DataFrame): (Long, Long) = {
      // bit_xor, not sum: overflow-free under ANSI and still
      // order-insensitive (edges are distinct, so nothing cancels)
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val labels = try {
      // Lineage truncation, not persist: persist caches the DATA but
      // the LOGICAL PLAN still nests every prior round, so Catalyst
      // re-analyzes an exponentially growing tree each iteration
      // (measured 13.4 s vs ~2 s at sf0.001 — the classic iterative-
      // algorithm trap; GraphX checkpoints for the same reason).
      // truncateLineage picks reliable checkpoint() when the caller
      // set a checkpoint dir (executor-loss safety on a cluster) and
      // executor-local localCheckpoint otherwise.
      var edges = truncateLineage(
        sym(pairs.select($"doc_a".as("u"), $"doc_b".as("v"))))
      var sig = checksum(edges)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIters) {
        val next = truncateLineage(smallStar(largeStar(edges)))
        val nextSig = checksum(next)
        edges = next
        converged = nextSig == sig
        sig = nextSig
        iter += 1
      }
      if (!converged)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"dedupClustersStar did NOT converge within $maxIters rounds")
      // converged stars: every non-center node has exactly one edge to
      // its component min; centers label themselves
      edges.groupBy($"u".as("node")).agg(min($"v").as("lbl"))
        .select($"node", least($"node", $"lbl").as("lbl"))
    } finally spark.conf.set(shuffleKey, prevShuffle)

    Tables.documents(spark, dir).select($"doc_id")
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"lbl", $"doc_id").as("cluster_rep"))
      .withColumn("is_kept", $"cluster_rep" === $"doc_id")
      .orderBy($"doc_id")
  }

  def dedupClusters(spark: SparkSession, dir: String, threshold: Double = 0.5,
                    maxIters: Int = 20): DataFrame = {
    import spark.implicits._
    val labels = clusterLabels(spark, dir, threshold, maxIters)
    Tables.documents(spark, dir).select($"doc_id")
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"lbl", $"doc_id").as("cluster_rep"))
      .withColumn("is_kept", $"cluster_rep" === $"doc_id")
      .orderBy($"doc_id")
  }

  def dedupClustersOracleSql(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE
       |d AS (SELECT doc_id,
       |             list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
       |               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
       |      FROM documents),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |      FROM d a JOIN d b ON a.doc_id < b.doc_id
       |      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $threshold),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a)
       |SELECT a AS doc_id, min(b) AS cluster_rep, (min(b) = a) AS is_kept
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** SimHash near-dup candidates (Charikar 2002 / Manku et al. 2007).
    *
    * 64-bit SimHash over tokens via the native expression; the
    * fingerprint is split into 4 16-bit chunks — two docs within
    * Hamming distance 3 must agree on at least one chunk (pigeonhole),
    * so an equi-join per chunk finds all of them without a cross
    * join. Pairs are then filtered by exact Hamming distance.
    */
  /** Materialized SimHash fingerprint table (doc_id, sim) — same
    * rationale as [[sigTable]]: one codegen'd SimHash pass per doc,
    * shared by the chunked self-join's two sides. 16 bytes/doc. */
  private val simCache =
    GraftCaches.memo[(SparkSession, String), DataFrame](_.unpersist())

  private def simTable(spark: SparkSession, dir: String): DataFrame =
    simCache.getOrElseUpdate((spark, dir)) {
      import spark.implicits._
      GraftFunctions.register(spark)
      val t = Tables.documents(spark, dir)
        .select($"doc_id",
          call_function("graft_simhash64", split($"text", " ")).as("sim"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t.count()
      t
    }

  def simHashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val chunks = 4
    val chunked = simTable(spark, dir).select($"doc_id", $"sim",
        posexplode(expr(s"transform(sequence(0, ${chunks - 1}), c -> (sim >> (c * 16)) & 65535)")))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")

    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count($"sim_a".bitwiseXOR($"sim_b")).cast("long"))
      .filter($"hamming" <= maxHamming)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Exact DuckDB oracle for [[dedupIncremental]] — all-pairs
    * batch × corpus Jaccard (valid for the LSH side by the same
    * recall argument as [[minHashLshOracleSql]]; the exact layer is
    * an md5 equi-join in both engines). */
  def dedupIncrementalOracleSql(threshold: Double = 0.5, batchPct: Int = 20): String = {
    val cut = 100 - batchPct
    s"""WITH h AS (SELECT doc_id, text, md5(text) AS ch,
       |                  ('0x' || substr(md5(doc_id || ':graft'), 1, 8))::UBIGINT % 100 AS hv
       |           FROM documents),
       |ex AS (SELECT b.doc_id, min(c.doc_id) AS exact_of
       |       FROM h b JOIN h c ON b.ch = c.ch AND b.hv >= $cut AND c.hv < $cut
       |       GROUP BY b.doc_id),
       |sh AS (SELECT doc_id, hv,
       |              list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
       |                i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
       |       FROM h),
       |near AS (SELECT bb.doc_id, cc.doc_id AS c_id,
       |                round(CAST(len(list_intersect(bb.s, cc.s)) AS DOUBLE)
       |                      / (len(bb.s) + len(cc.s) - len(list_intersect(bb.s, cc.s))), 4) AS j
       |         FROM sh bb JOIN sh cc ON bb.hv >= $cut AND cc.hv < $cut),
       |nbest AS (SELECT doc_id, c_id AS near_of, j,
       |                 row_number() OVER (PARTITION BY doc_id ORDER BY j DESC, c_id) AS rk
       |          FROM near WHERE j >= $threshold)
       |SELECT h.doc_id,
       |       CASE WHEN ex.exact_of IS NOT NULL THEN 'exact_dup'
       |            WHEN nb.near_of IS NOT NULL THEN 'near_dup'
       |            ELSE 'unique' END AS verdict,
       |       COALESCE(ex.exact_of, nb.near_of) AS dup_of,
       |       CASE WHEN ex.exact_of IS NULL THEN nb.j END AS jaccard
       |FROM h LEFT JOIN ex ON h.doc_id = ex.doc_id
       |       LEFT JOIN (SELECT * FROM nbest WHERE rk = 1) nb ON h.doc_id = nb.doc_id
       |WHERE h.hv >= $cut
       |ORDER BY h.doc_id""".stripMargin
  }

  /** Exact DuckDB oracle for [[simHashPairs]]. SimHash is
    * deterministic (the pigeonhole chunk join finds EVERY pair within
    * the Hamming radius, it is not approximate), so the oracle
    * recomputes the fingerprints from scratch: FNV-1a 64 over each
    * token's bytes, the splitmix64 avalanche, per-bit ±1 votes, then
    * all-pairs Hamming — mirroring [[graft.functions.Hash64]] bit for
    * bit in SQL.
    *
    * Mod-2^64 arithmetic rides on HUGEINT: the FNV multiply
    * (h < 2^64 times the 40-bit prime < 2^104) fits directly; the two
    * splitmix multiplies (full 64×64 bit) are split at 32 bits —
    * (a·b) mod 2^64 = (a_lo·b mod 2^64 + ((a_hi·b mod 2^32)·2^32))
    * mod 2^64 — so no intermediate exceeds 2^97. XOR runs through
    * UBIGINT (both operands < 2^64); `x // 2^k` is `x >>> k` for the
    * non-negative HUGEINT intermediates. Byte iteration uses
    * codepoints, which equal UTF-8 bytes on the all-ASCII test
    * corpus (asserted: sf0.1 has zero non-ASCII documents);
    * `list_filter(c <> '')` reproduces FNV("") = offset-basis for
    * empty tokens, where DuckDB's `string_split('','')` yields
    * `['']`. */
  def simHashOracleSql(maxHamming: Int = 3): String =
    s"""WITH $simhashFpCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  /** The `toks…fp` CTE chain both SimHash oracles share: the
    * DuckDB-mirrored FNV-1a + splitmix64 fingerprint per doc. */
  private val simhashFpCte: String =
    """toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |f0 AS (SELECT doc_id,
       |  list_reduce(
       |    list_prepend(14695981039346656037::HUGEINT,
       |                 list_transform(list_filter(string_split(tok,''), c -> c <> ''),
       |                                c -> ord(c)::HUGEINT)),
       |    (h, b) -> ((h - (h % 256) + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT) * 1099511628211::HUGEINT)
       |              % 18446744073709551616::HUGEINT) AS h0
       |  FROM toks),
       |m1 AS (SELECT doc_id, (h0 + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS z0 FROM f0),
       |m2 AS (SELECT doc_id, xor(z0::UBIGINT, (z0 // 1073741824)::UBIGINT)::HUGEINT AS x0 FROM m1),
       |m3 AS (SELECT doc_id,
       |  ( ((x0 % 4294967296) * 13787848793156543929::HUGEINT) % 18446744073709551616::HUGEINT
       |    + (((x0 // 4294967296) * 13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
       |  ) % 18446744073709551616::HUGEINT AS z1 FROM m2),
       |m4 AS (SELECT doc_id, xor(z1::UBIGINT, (z1 // 134217728)::UBIGINT)::HUGEINT AS x1 FROM m3),
       |m5 AS (SELECT doc_id,
       |  ( ((x1 % 4294967296) * 10723151780598845931::HUGEINT) % 18446744073709551616::HUGEINT
       |    + (((x1 // 4294967296) * 10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT
       |  ) % 18446744073709551616::HUGEINT AS z2 FROM m4),
       |hashes AS (SELECT doc_id, xor(z2::UBIGINT, (z2 // 2147483648)::UBIGINT) AS h FROM m5),
       |votes AS (
       |  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hashes, (SELECT unnest(range(0, 64)) AS b) bits
       |  GROUP BY doc_id, b),
       |fp AS (
       |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::UBIGINT << b)::HUGEINT ELSE 0::HUGEINT END)::UBIGINT AS sim
       |  FROM votes GROUP BY doc_id)""".stripMargin

  /** Connected components over the SimHash near-dup graph — the
    * cluster face of [[simHashPairs]], exactly as [[dedupClusters]]
    * is the cluster face of [[minHashLsh]]: every document labeled
    * with the min doc_id of its Hamming-≤k component, `is_kept` for
    * the representative. SimHash clusters catch the boilerplate-heavy
    * duplication class whose word-set Jaccard sits BELOW the MinHash
    * threshold while the 64-bit profile still collides (near-identical
    * token frequency profiles) — running both faces and diffing the
    * cluster maps is the standard corpus-QA audit.
    *
    * Scale: pairs come from the pigeonhole chunk join (never
    * all-pairs); components ride the shared min-label propagation —
    * per round, one equi-join + aggregate over the (tiny) pair-graph
    * node set. Same convergence contract/warning as dedupClusters;
    * the star-contraction variant is the adversarial-chain
    * escalation. */
  def dedupSimhashClusters(spark: SparkSession, dir: String,
                           maxHamming: Int = 3, maxIters: Int = 60): DataFrame = {
    import spark.implicits._
    val labels = simLabelsCache.getOrElseUpdate((spark, dir, maxHamming, maxIters)) {
      propagateMinLabels(spark,
        simHashPairs(spark, dir, maxHamming).select($"doc_a", $"doc_b"),
        maxIters, "dedupSimhashClusters")
    }
    Tables.documents(spark, dir).select($"doc_id")
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"lbl", $"doc_id").as("cluster_rep"))
      .withColumn("is_kept", $"cluster_rep" === $"doc_id")
      .orderBy($"doc_id")
  }

  private val simLabelsCache =
    GraftCaches.memo[(SparkSession, String, Int, Int), DataFrame](_.unpersist())

  /** DuckDB oracle for [[dedupSimhashClusters]]: the shared
    * fingerprint CTE + the same reachability recursion as
    * [[dedupClustersOracleSql]]. */
  def simHashClustersOracleSql(maxHamming: Int = 3): String =
    s"""WITH RECURSIVE $simhashFpCte,
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |      WHERE bit_count(xor(a.sim, b.sim)) <= $maxHamming),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a)
       |SELECT a AS doc_id, min(b) AS cluster_rep, (min(b) = a) AS is_kept
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** Repeated-substring exact dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * suffix-array pass, re-expressed as k-gram postings): per
    * document, the spans of ≥ `k` consecutive tokens that occur more
    * than once ANYWHERE in the corpus — cross-document boilerplate
    * (license headers, templates) or within-document repetition, the
    * duplication class whole-document MinHash similarity misses when
    * two long documents share only a paragraph.
    *
    * Equivalence to the suffix-array formulation: a token run of
    * length L ≥ k repeats iff each of its L−k+1 k-grams repeats
    * (pigeonhole both ways), so "tokens covered by a repeated
    * ≥k-token substring" = "tokens covered by a repeated k-gram".
    * The plan:
    *  1. hash each doc's k-grams map-side (one xxhash64 per
    *     position) → (doc_id, pos, gram_hash) postings; TEXT never
    *     enters a shuffle — only 8-byte hashes and positions;
    *  2. count occurrences per hash (map-side partial agg absorbs
    *     the per-doc fan-out), keep count ≥ 2 = the repeated-gram
    *     set;
    *  3. join the postings back on the hash (ids + positions only)
    *     and merge each doc's covered intervals [pos, pos+k−1] with
    *     one gaps-and-islands window partitioned by doc_id (all
    *     intervals have length k, so a new span starts exactly where
    *     pos > prev_pos + k);
    *  4. per-doc span stats + covered-token fraction as a truncated
    *     integer ratio (bit-identical in any engine).
    *
    * Nothing is quadratic in the corpus: the postings table is
    * O(total tokens), the count is a hash aggregate, and the window
    * partitions by doc_id (bounded per-doc work). The DuckDB oracle
    * runs the identical algorithm on the gram STRINGS (no xxhash64
    * there) — equal output unless two distinct grams collide in 64
    * bits. */
  def dedupSubstring(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    dedupSubstringTransform(spark, Tables.documents(spark, dir), k)

  /** Postings tables materialized per call (freed on clearAll): the
    * postings feed BOTH the repeated-gram aggregate and the join
    * back, and without materialization Catalyst plans the whole
    * scan→split→gram-hash→explode subtree once per consumer (the
    * sigTable lesson — self-joins don't share non-identical
    * exchanges). At warehouse scale this is an eager parquet stage. */
  private val substringPostsCache =
    GraftCaches.memo[AnyRef, DataFrame](_.unpersist())

  /** Shared core of the substring-dedup family: tokenized docs and
    * their merged repeated-span intervals. */
  private def substringSpans(spark: SparkSession, documents: DataFrame,
                             k: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val docs = documents
      .select($"doc_id", split($"text", " ").as("words"))
      .withColumn("n_tokens", size($"words").cast("long"))
    // one hash per gram start position; guarded because
    // sequence(1, 0) counts DOWN in Spark rather than being empty
    val withGrams = docs.withColumn("ghs",
      expr(s"""CASE WHEN size(words) >= $k
              |THEN transform(sequence(1, size(words) - ${k - 1}),
              |               i -> xxhash64(concat_ws(' ', slice(words, i, $k))))
              |ELSE CAST(array() AS array<bigint>) END""".stripMargin))
    val posts = substringPostsCache.getOrElseUpdate(new Object) {
      val p = withGrams
        .select($"doc_id", posexplode($"ghs").as(Seq("p0", "h")))
        .select($"doc_id", ($"p0" + 1).cast("long").as("pos"), $"h")
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // eager: both consumers racing the cache fill serialize on block locks
      p
    }

    val dupHashes = posts.groupBy($"h").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= 2).select($"h")

    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val spans = posts.join(dupHashes, Seq("h"))
      .withColumn("ni", when(lag($"pos", 1).over(w).isNull
        || $"pos" > lag($"pos", 1).over(w) + k, 1).otherwise(0))
      .withColumn("island", sum($"ni").over(w))
      .groupBy($"doc_id", $"island")
      .agg(min($"pos").as("s"), (max($"pos") + lit(k.toLong - 1)).as("e"))
    (docs, spans)
  }

  /** [[dedupSubstring]] over any (doc_id, text) frame — lets the spec
    * feed documents with a known planted repeat. */
  def dedupSubstringTransform(spark: SparkSession, documents: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val (docs, spans) = substringSpans(spark, documents, k)

    val summary = spans.groupBy($"doc_id")
      .agg(count(lit(1)).as("spans"),
        sum($"e" - $"s" + 1).as("dtok"),
        max($"e" - $"s" + 1).as("mspan"))

    docs.select($"doc_id", $"n_tokens")
      .join(summary, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"spans", lit(0L)).as("n_dup_spans"),
        coalesce($"dtok", lit(0L)).as("dup_tokens"),
        coalesce($"mspan", lit(0L)).as("max_span_tokens"))
      .withColumn("dup_frac",
        expr("dup_tokens * 10000 div n_tokens").cast("double") / 10000.0)
      .orderBy($"doc_id")
  }

  /** The REMOVAL half of ExactSubstr dedup (Lee et al. 2022 §4.1):
    * strip every repeated-span token from every document and report
    * the cleaned text (as md5 — engines must agree byte-for-byte).
    * This is the aggressive strip-all-occurrences variant several
    * open reimplementations ship: simple, order-free, and it removes
    * boilerplate everywhere it appears; a keep-one-canonical-copy
    * policy would additionally need a global occurrence election
    * (min (doc_id, pos) per repeated run) feeding an exception list
    * into the anti-join below — the plan shape stays identical.
    *
    * Scale shape on top of [[substringSpans]]: spans explode to
    * (doc_id, pos) covered positions (output-sized, no text), kept
    * tokens are one anti-join away, and the cleaned text reassembles
    * with one doc_id-keyed sort_array aggregation — order restored
    * from the carried pos, not from shuffle order. */
  def dedupSubstringRemove(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    dedupSubstringRemoveTransform(spark, Tables.documents(spark, dir), k)

  def dedupSubstringRemoveTransform(spark: SparkSession, documents: DataFrame,
                                    k: Int): DataFrame = {
    import spark.implicits._
    val (docs, spans) = substringSpans(spark, documents, k)

    // merged islands never overlap, so the explode emits each covered
    // position exactly once
    val covered = spans.select($"doc_id", explode(sequence($"s", $"e")).as("pos"))
    val toks = docs.select($"doc_id", posexplode($"words").as(Seq("p0", "tok")))
      .select($"doc_id", ($"p0" + 1).cast("long").as("pos"), $"tok")
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct($"pos", $"tok"))), x => x("tok"))))
          .as("chash"))

    docs.select($"doc_id", $"n_tokens")
      .join(kept, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"kept", lit(0L)).as("kept_tokens"),
        // a fully-covered doc keeps nothing: hash of the empty string
        coalesce($"chash", md5(lit(""))).as("cleaned_hash"))
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[dedupSubstringRemove]] — same spans, same
    * anti-join, cleaned text rebuilt with an ordered string_agg. */
  def dedupSubstringRemoveOracleSql(k: Int = 8): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |t AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws FROM d),
       |g AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
       |             array_to_string(ws[u.i:u.i+$k-1], ' ') AS gram
       |      FROM t, unnest(range(1, len(ws) - $k + 2)) AS u(i)),
       |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
       |m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
       |i1 AS (SELECT doc_id, pos,
       |              CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + $k
       |                   THEN 1 ELSE 0 END AS ni
       |       FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |i2 AS (SELECT doc_id, pos,
       |              sum(ni) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |       FROM i1),
       |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos) + $k - 1 AS e
       |       FROM i2 GROUP BY 1, 2),
       |cov AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos
       |        FROM sp, unnest(range(s, e + 1)) AS u(pos)),
       |toks AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos, ws[u.i] AS tok
       |         FROM t, unnest(range(1, len(ws) + 1)) AS u(i)),
       |kept AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS kept,
       |                md5(string_agg(tk.tok, ' ' ORDER BY tk.pos)) AS chash
       |         FROM toks tk ANTI JOIN cov c ON tk.doc_id = c.doc_id AND tk.pos = c.pos
       |         GROUP BY tk.doc_id)
       |SELECT t.doc_id, t.n_tokens,
       |       CAST(coalesce(kept, 0) AS BIGINT) AS kept_tokens,
       |       coalesce(chash, md5('')) AS cleaned_hash
       |FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** DuckDB oracle for [[dedupSubstring]]: the same postings →
    * repeated-gram → interval-merge algorithm, keyed on the gram
    * STRING instead of its 64-bit hash. */
  def dedupSubstringOracleSql(k: Int = 8): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |t AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws FROM d),
       |g AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
       |             array_to_string(ws[u.i:u.i+$k-1], ' ') AS gram
       |      FROM t, unnest(range(1, len(ws) - $k + 2)) AS u(i)),
       |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
       |m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
       |i1 AS (SELECT doc_id, pos,
       |              CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + $k
       |                   THEN 1 ELSE 0 END AS ni
       |       FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |i2 AS (SELECT doc_id, pos,
       |              sum(ni) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |       FROM i1),
       |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos) + $k - 1 AS e
       |       FROM i2 GROUP BY 1, 2),
       |summ AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS spans,
       |                CAST(sum(e - s + 1) AS BIGINT) AS dtok,
       |                CAST(max(e - s + 1) AS BIGINT) AS mspan
       |         FROM sp GROUP BY 1)
       |SELECT t.doc_id, t.n_tokens,
       |       CAST(coalesce(spans, 0) AS BIGINT) AS n_dup_spans,
       |       CAST(coalesce(dtok, 0) AS BIGINT) AS dup_tokens,
       |       CAST(coalesce(mspan, 0) AS BIGINT) AS max_span_tokens,
       |       (CAST(coalesce(dtok, 0) AS BIGINT) * 10000 // n_tokens) / 10000.0 AS dup_frac
       |FROM t LEFT JOIN summ ON t.doc_id = summ.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** Paragraph-granularity exact dedup with document rebuild (the
    * RefinedWeb / Dolma "line dedup" stage): documents are cut into
    * fixed units (`segWords` consecutive words — the corpus has no
    * newline structure, so the unit boundary is positional; on real
    * data the same plan splits on '\n'), every unit is hashed, the
    * globally FIRST occurrence of each distinct unit (min (doc_id,
    * idx)) survives, and each document is rebuilt from its surviving
    * units in original order. Catches the cross-document boilerplate
    * (headers, navigation, license blocks) that whole-document
    * hashing misses and that MinHash only catches probabilistically.
    *
    * Scale shape, in three doc_id-keyed stages with ONE hash-keyed
    * shuffle in between: (1) units are derived map-side
    * (`posexplode` over the word array), and only `(xxhash64(unit),
    * doc_id, idx)` — never unit text — shuffles to the per-hash
    * min-winner aggregate (map-side partial min); (2) winners
    * collapse to a per-doc keep-set (`collect_set(idx)`, bounded by
    * units-per-doc); (3) the keep-set joins back onto the re-derived
    * units co-partitioned on doc_id, and the rebuild groupBy reuses
    * that same partitioning. The only stage that moves text is the
    * rebuild itself, which any rebuild must. 64-bit unit hashes:
    * collision odds over even 10^10 units are ~1e-9 (birthday
    * bound); the oracle groups on unit STRINGS, so a collision
    * would surface as a mismatch rather than hide. */
  def dedupParagraph(spark: SparkSession, dir: String, segWords: Int = 10): DataFrame =
    dedupParagraphTransform(spark, Tables.documents(spark, dir), segWords)

  def dedupParagraphTransform(spark: SparkSession, documents: DataFrame,
                              segWords: Int): DataFrame = {
    import spark.implicits._
    val docs = documents.select($"doc_id", split($"text", " ").as("ws"))
    def units(d: DataFrame): DataFrame = d.select($"doc_id",
      posexplode(expr(
        s"transform(sequence(0, (size(ws) - 1) div $segWords), " +
        s"i -> array_join(slice(ws, i * $segWords + 1, $segWords), ' '))"))
        .as(Seq("idx", "seg")))

    val winners = units(docs)
      .select(xxhash64($"seg").as("h"), struct($"doc_id", $"idx").as("at"))
      .groupBy($"h").agg(min($"at").as("w"))
      .select($"w.doc_id".as("doc_id"), $"w.idx".as("idx"))
    val keepSets = winners.groupBy($"doc_id").agg(collect_set($"idx").as("keep"))

    val rebuilt = units(docs)
      .join(keepSets, Seq("doc_id"))
      .filter(array_contains($"keep", $"idx"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct($"idx", $"seg"))), x => x("seg"))))
          .as("chash"))

    docs.select($"doc_id",
        expr(s"CAST((size(ws) - 1) div $segWords + 1 AS BIGINT)").as("n_units"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select($"doc_id", $"n_units",
        coalesce($"kept", lit(0L)).as("kept_units"),
        // a doc whose every unit appeared earlier keeps nothing
        coalesce($"chash", md5(lit(""))).as("cleaned_hash"))
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[dedupParagraph]] — identical units, winners
    * chosen per unit STRING (no hash), identical rebuild. */
  def dedupParagraphOracleSql(segWords: Int = 10): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |u AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
       |             array_to_string(ws[i * $segWords + 1 : i * $segWords + $segWords], ' ') AS seg
       |      FROM d, unnest(range(0, (len(ws) - 1) // $segWords + 1)) AS t(i)),
       |k AS (SELECT doc_id, idx, seg,
       |             row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) AS rn
       |      FROM u),
       |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_units,
       |               md5(string_agg(seg, ' ' ORDER BY idx)) AS cleaned_hash
       |        FROM k WHERE rn = 1 GROUP BY 1),
       |n AS (SELECT doc_id, CAST((len(ws) - 1) // $segWords + 1 AS BIGINT) AS n_units FROM d)
       |SELECT n.doc_id, n.n_units,
       |       COALESCE(reb.kept_units, 0) AS kept_units,
       |       COALESCE(reb.cleaned_hash, md5('')) AS cleaned_hash
       |FROM n LEFT JOIN reb USING (doc_id)
       |ORDER BY n.doc_id""".stripMargin
}
