package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Embedding similarity operators over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * The cosine kernel is a native Catalyst expression
  * ([[graft.functions.CosineSimilarity]]) with codegen — the O(n·m)
  * comparison loops run unboxed inside whole-stage codegen.
  *
  * Scale story: the exact variants are the correctness baseline
  * (quadratic, usable to ~10⁵ vectors per block); the LSH variant is
  * the 100 TB path — random-hyperplane bucketing turns the cross
  * join into per-bucket joins, trading recall for a ~bucket-count
  * speedup, and re-ranking candidates exactly.
  */
object VectorOps {

  private def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Trained coarse centroids for IVF, memoized per (session, dir,
    * nCells, seed) and returned as one flat row-major float array
    * (k·dim values), unit-normalized so cell scoring is a plain dot
    * product.
    *
    * Training = spherical k-means on a bounded driver-side sample:
    * take ≤ `sampleN` vectors (deterministic vec_id order), normalize,
    * seed with greedy farthest-point (k-center: each next centroid is
    * the sample point with the lowest max-cosine to those already
    * chosen — deterministic, spread-out, no RNG sensitivity), then run
    * `iters` Lloyd rounds (assign by max dot, recompute means,
    * renormalize; an emptied cell is reseeded to the point worst
    * served by its current cell). The ≤10k-row collect is the ONE
    * intentional driver-side action in the library: coarse-quantizer
    * training is O(sample · k · dim) and sample-bounded by
    * construction — at warehouse scale the same code runs on a
    * `.sample(fraction)` of the corpus, and only the k·dim centroid
    * array (a few KB) ever enters the distributed plan. */
  private val centroidCache =
    graft.GraftCaches.memo[(SparkSession, String, Int, Long), Array[Float]](_ => ())

  /** Deterministic MAP-SIDE training sample (the Sampling.splitHash
    * pattern), unit-normalized: membership = hash(vec_id) under a
    * threshold sized to ~1.1·sampleN of the corpus, then a
    * driver-side cap in hash order. A previous `orderBy(vec_id)
    * .limit(sampleN)` sat exactly at topKSortFallbackThreshold
    * (10000), so Spark planned a FULL global sort of the embeddings
    * table just to pick a training sample; the threshold filter
    * touches each row once with no shuffle, and membership stays
    * stable under corpus growth and partition layout. Shared by the
    * IVF and PQ trainers. */
  private def sampleNormalized(spark: SparkSession, dir: String,
                               sampleN: Int): Array[Array[Float]] = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val total = math.max(emb.select($"vec_id").count(), 1L)
    val frac = math.min(1.0, sampleN.toDouble * 1.1 / total)
    val rows = emb
      .select($"vec_id", $"embedding",
        Sampling.splitHash($"vec_id", "ivf-train").as("h"))
      .filter($"h" < math.ceil(frac * 4294967296.0).toLong)
      .collect()
    rows.sortBy(r => (r.getLong(2), r.getLong(0))).take(sampleN).map { r =>
      val v = r.getSeq[Float](1).toArray
      val n = math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x)).toFloat
      if (n > 0f) v.map(_ / n) else v
    }
  }

  def trainIvfCentroids(spark: SparkSession, dir: String, nCells: Int = 16,
                        seed: Long = 7L, sampleN: Int = 10000, iters: Int = 5): Array[Float] =
    centroidCache.getOrElseUpdate((spark, dir, nCells, seed)) {
      val sample: Array[Array[Float]] = sampleNormalized(spark, dir, sampleN)
      val n = sample.length
      val dim = if (n > 0) sample(0).length else 0
      val k = math.min(nCells, math.max(n, 1))
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var d = 0
        while (d < dim) { s += a(d).toDouble * b(d); d += 1 }
        s
      }
      // greedy farthest-point init
      val chosen = scala.collection.mutable.ArrayBuffer((seed % math.max(n, 1)).toInt.abs)
      while (chosen.length < k) {
        var bestIdx = -1; var bestScore = Double.MaxValue
        var i = 0
        while (i < n) {
          if (!chosen.contains(i)) {
            val nearest = chosen.iterator.map(c => dot(sample(i), sample(c))).max
            if (nearest < bestScore) { bestScore = nearest; bestIdx = i }
          }
          i += 1
        }
        chosen += bestIdx
      }
      var cents: Array[Array[Float]] = chosen.map(sample(_).clone()).toArray
      // Lloyd rounds
      var it = 0
      while (it < iters && n > 0) {
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Int](k)
        val assign = new Array[Int](n)
        var i = 0
        while (i < n) {
          var best = 0; var bestS = Double.MinValue
          var c = 0
          while (c < k) {
            val s = dot(sample(i), cents(c))
            if (s > bestS) { bestS = s; best = c }
            c += 1
          }
          assign(i) = best; counts(best) += 1
          var d = 0
          while (d < dim) { sums(best)(d) += sample(i)(d); d += 1 }
          i += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) {
            // reseed an emptied cell to the worst-served point
            var worst = 0; var worstS = Double.MaxValue
            var j = 0
            while (j < n) {
              val s = dot(sample(j), cents(assign(j)))
              if (s < worstS) { worstS = s; worst = j }
              j += 1
            }
            sample(worst).clone()
          } else {
            val m = sums(c).map(_ / counts(c))
            val norm = math.sqrt(m.foldLeft(0.0)((s, x) => s + x * x))
            if (norm > 0) m.map(x => (x / norm).toFloat) else cents(c)
          }
        }
        it += 1
      }
      cents.flatten
    }

  /** Exact embedding near-duplicate pairs: all (a, b) with
    * cosine >= threshold. */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val a = e.alias("a")
    val b = e.alias("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.embedding"), col("b.embedding")))
      .filter($"cos" >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round($"cos", 4).as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** Semantic duplicate CLUSTERS — connected components over the
    * exact cosine pair graph ([[embeddingNearDup]], cosine ≥ t),
    * completing the cluster-family triple: MinHash components
    * (`dedup_clusters`), SimHash components (`dedup_simhash_clusters`)
    * and embedding components here. The verdict table a semantic
    * dedup pass actually lands: every vector labeled with its
    * component's min vec_id, `is_kept` for the representative.
    *
    * Scale: the pair generation here is the DECLARED exact all-pairs
    * baseline (embeddingNearDup's contract — allowlisted); the scale
    * path swaps in `dedup_semantic`'s IVF-cell pairs, and the
    * component labeling is the same shared min-label propagation
    * either way (pair-graph-sized, never corpus-sized). */
  def semanticClusters(spark: SparkSession, dir: String,
                       threshold: Double = 0.3, maxIters: Int = 60): DataFrame = {
    import spark.implicits._
    val labels = semLabelsCache.getOrElseUpdate((spark, dir, threshold, maxIters)) {
      Dedup.propagateMinLabels(spark,
        embeddingNearDup(spark, dir, threshold).select($"vec_a".as("doc_a"), $"vec_b".as("doc_b")),
        maxIters, "semanticClusters")
    }
    Tables.embeddings(spark, dir).select($"vec_id")
      .join(labels.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"lbl", $"vec_id").as("cluster_rep"))
      .withColumn("is_kept", $"cluster_rep" === $"vec_id")
      .orderBy($"vec_id")
  }

  private val semLabelsCache =
    graft.GraftCaches.memo[(SparkSession, String, Double, Int), DataFrame](_.unpersist())

  /** [[semanticClusters]]'s PRODUCTION path — the swap its contract
    * promises: the same min-label connected components over the IVF
    * multi-probe pair graph ([[ivfPairs]]) instead of the exact
    * all-pairs cosine join. The round-12 100× anchor is WHY this
    * entry exists: the exact baseline's n² cosine stage times out at
    * 500k vectors BY DESIGN (its declared contract, the
    * word_jaccard_naive shape), while the IVF pair stage is bounded
    * per cell (~C²/2 per cell, nCells ∝ |corpus|/C — the
    * [[dedupSemantic]] sizing rule).
    *
    * Approximate by construction (cross-cell edges outside the
    * probed cells are missed) → rows-only oracle; gated by the
    * refinement/recall spec: every edge is cosine-VERIFIED, so IVF
    * components are always a refinement of the exact components
    * (soundness is structural — only recall is statistical). */
  def semanticClustersIvf(spark: SparkSession, dir: String, threshold: Double = 0.3,
                          nCells: Int = 8, nProbe: Int = 2, seed: Long = 7L,
                          maxIters: Int = 60): DataFrame = {
    import spark.implicits._
    val labels = semIvfLabelsCache.getOrElseUpdate((spark, dir, threshold, nCells, nProbe)) {
      Dedup.propagateMinLabels(spark,
        ivfPairs(spark, dir, threshold, nCells, nProbe, seed)
          .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b")),
        maxIters, "semanticClustersIvf")
    }
    Tables.embeddings(spark, dir).select($"vec_id")
      .join(labels.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"lbl", $"vec_id").as("cluster_rep"))
      .withColumn("is_kept", $"cluster_rep" === $"vec_id")
      .orderBy($"vec_id")
  }

  private val semIvfLabelsCache =
    graft.GraftCaches.memo[(SparkSession, String, Double, Int, Int), DataFrame](_.unpersist())

  /** Probed rows for one batch of embeddings against FIXED trained
    * centroids — (vec_id, pcell, embedding), nProbe rows per vector.
    * The streaming IVF state's per-batch unit ([[ivfPairs]] is this
    * joined to itself; the incremental face joins batch × accrued). */
  private[graft] def ivfProbeRows(e: DataFrame, cents: Array[Float],
                                  nProbe: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    e.select($"vec_id", $"embedding",
      explode(call_function("graft_ivf_probe_trained", $"embedding",
        typedLit(cents), lit(nProbe))).as("pcell"))
  }

  /** Incremental verified IVF pairs — batch × (seen ∪ batch) on the
    * probed cell, normalized (least, greatest) and deduped within
    * the batch output: under id-disjoint batching each pair surfaces
    * exactly once, in its LATER endpoint's batch (the
    * [[Dedup.incrementalPairs]] discipline on the IVF index instead
    * of the LSH index). Cosine-verified before emission, so the
    * accrued pair set equals [[ivfPairs]] over the drained corpus. */
  private[graft] def ivfPairsIncremental(batchProbe: DataFrame, seenProbe: DataFrame,
                                         threshold: Double): DataFrame = {
    val all = seenProbe.unionByName(batchProbe)
    batchProbe.alias("a").join(all.alias("b"),
        col("a.pcell") === col("b.pcell") && col("a.vec_id") =!= col("b.vec_id"))
      .filter(cosine(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
  }

  def semanticClustersOracleSql(threshold: Double = 0.3): String =
    s"""WITH RECURSIVE
       |p AS (SELECT a.vec_id AS va, b.vec_id AS vb
       |      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |      WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= $threshold),
       |e AS (SELECT va AS a, vb AS b FROM p UNION ALL SELECT vb, va FROM p),
       |reach(a, b) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a)
       |SELECT a AS vec_id, min(b) AS cluster_rep, (min(b) = a) AS is_kept
       |FROM reach GROUP BY a ORDER BY vec_id""".stripMargin

  /** Semantic (embedding-cosine) decontamination — the embedding
    * analog of `decontaminate`/`decontaminate_fuzzy`'s n-gram screens:
    * a training corpus must not contain near-paraphrases of the
    * eval/benchmark set, which token-overlap screens miss when the
    * contamination is a reworded copy. Verdict per corpus vector:
    * its max cosine against ANY eval vector (4dp), the eval item that
    * attains it (ties broken to the lowest eval id on the ROUNDED
    * value, mirrored in the oracle), and keep = max < threshold.
    *
    * Scale: the eval side is benchmark-sized (thousands of rows, KBs
    * to MBs) → broadcast; the corpus streams map-side through the
    * codegen'd cosine with partial aggregation collapsing the nEval
    * fan-out BEFORE the one-row-per-vector shuffle. Never
    * corpus×corpus — the shape is ann_topk's, with the verdict
    * aggregate in place of top-k. For an eval set too big to
    * broadcast, screen through `dedup_semantic`'s IVF cells instead
    * (approximate, recall-gated). */
  def decontaminateSemantic(spark: SparkSession, dir: String,
                            nEval: Int = 20, threshold: Double = 0.35): DataFrame = {
    import spark.implicits._
    val verdicts = decontaminateSemanticVerdicts(
      evalSide(spark, dir, nEval), corpusSide(spark, dir, nEval), threshold)
    verdicts.orderBy($"vec_id")
  }

  private[graft] def evalSide(spark: SparkSession, dir: String, nEval: Int): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir).filter($"vec_id" < nEval)
      .select($"vec_id".as("eval_id"), $"embedding".as("ev_emb"))
  }

  private[graft] def corpusSide(spark: SparkSession, dir: String, nEval: Int): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir).filter($"vec_id" >= nEval)
      .select($"vec_id", $"embedding")
  }

  /** Shared verdict transform ([[decontaminateSemantic]] + the
    * streaming twin): one row per corpus vector, stateless given the
    * broadcast eval side — which is what makes the streaming face a
    * per-batch map with an append-only verdict state. */
  private[graft] def decontaminateSemanticVerdicts(evalDf: DataFrame, corpus: DataFrame,
                                                   threshold: Double = 0.35): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    corpus.join(broadcast(evalDf))
      .withColumn("cos_r", round(cosine(col("embedding"), col("ev_emb")), 4))
      .groupBy(col("vec_id"))
      .agg(max_by(col("eval_id"), struct(col("cos_r"), -col("eval_id"))).as("nearest_eval_id"),
        max(col("cos_r")).as("max_cosine"))
      .select(col("vec_id"), col("nearest_eval_id"), col("max_cosine"),
        (col("max_cosine") < threshold).as("is_kept"))
  }

  def decontaminateSemanticOracleSql(nEval: Int = 20, threshold: Double = 0.35): String =
    s"""WITH ev AS (SELECT vec_id AS eval_id, embedding FROM embeddings WHERE vec_id < $nEval),
       |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $nEval),
       |p AS (SELECT c.vec_id, ev.eval_id,
       |             round(list_cosine_similarity(c.embedding::DOUBLE[], ev.embedding::DOUBLE[]), 4) AS cos_r
       |      FROM c CROSS JOIN ev),
       |r AS (SELECT vec_id, eval_id, cos_r,
       |             row_number() OVER (PARTITION BY vec_id ORDER BY cos_r DESC, eval_id) AS rn
       |      FROM p)
       |SELECT vec_id, eval_id AS nearest_eval_id, cos_r AS max_cosine,
       |       cos_r < $threshold AS is_kept
       |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** Brute-force cosine top-k neighbors for a query set — the exact
    * ANN baseline. Broadcast the (small) query side; the corpus
    * streams through codegen'd cosine + per-query top-k. */
  def annTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val corpus = e.filter($"vec_id" >= nQueries)
    corpus.join(broadcast(queries))
      .withColumn("cos", cosine($"q_emb", $"embedding"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** IVF-style approximate top-k: corpus vectors are assigned to
    * their nearest coarse centroid cell; each query probes its
    * `nProbe` nearest cells and re-ranks exactly within them. The
    * complementary ANN shape to [[annLshTopK]]: cells partition the
    * corpus (1 row per vector — no explode), probes fan out only on
    * the tiny broadcast query side. Approximate (rows-only oracle);
    * recall vs [[annTopK]] measured in the spec.
    *
    * `trained = true` (default) scores cells against k-means
    * centroids from [[trainIvfCentroids]], carried into the plan as a
    * few-KB flat literal ([[graft.functions.TrainedIvfAssign]]);
    * `trained = false` keeps the training-free hash-derived centroids
    * ([[graft.functions.IvfAssign]]) — the zero-setup fallback the
    * recall spec measures the trained variant against. */
  def annIvfTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
                 nCells: Int = 16, nProbe: Int = 4, seed: Long = 7L,
                 trained: Boolean = true): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val (assignCol, probeCol) =
      if (trained) {
        val cents = typedLit(trainIvfCentroids(spark, dir, nCells, seed))
        (call_function("graft_ivf_assign_trained", $"embedding", cents),
         call_function("graft_ivf_probe_trained", $"embedding", cents, lit(nProbe)))
      } else
        (call_function("graft_ivf_assign", $"embedding", lit(seed), lit(nCells)),
         call_function("graft_ivf_probe", $"embedding", lit(seed), lit(nCells), lit(nProbe)))
    val corpus = e.filter($"vec_id" >= nQueries).withColumn("cell", assignCol)
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        explode(probeCol).as("cell"))
    corpus.join(broadcast(queries), Seq("cell"))
      .select($"query_id", $"vec_id", cosine($"q_emb", $"embedding").as("cos"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** LSH-bucketed approximate top-k: random-hyperplane signatures
    * ([[graft.functions.HyperplaneSignature]], codegen'd, planes
    * derived from the seed — no materialized plane matrix, no
    * driver-side action, constant plan size at any embedding dim) →
    * bucket join → exact re-rank within candidates.
    *
    * Standard OR-amplified construction: `nTables` independent hash
    * tables (seeds seed..seed+nTables-1); a corpus vector is a
    * candidate if it shares a bucket with the query in ANY table.
    * Each query additionally probes the nPlanes buckets at Hamming
    * distance 1 per table (multi-probe). All fan-out lives on the
    * tiny broadcast query side plus a narrow corpus explode — the
    * corpus is never shuffled; only (query_id, vec_id, cos)
    * candidate triples go through the dedup + top-k exchange.
    * Approximate by construction (rows-only oracle); recall measured
    * in the spec against annTopK. */
  def annLshTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
                 nPlanes: Int = 8, nTables: Int = 4, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    def sig(t: Int): Column =
      call_function("graft_hyperplane_sig", $"embedding", lit(seed + t), lit(nPlanes))
    val withBuckets = e.select($"vec_id" +: $"embedding" +:
      (0 until nTables).map(t => sig(t).as(s"b$t")): _*)

    val corpus = withBuckets.filter($"vec_id" >= nQueries)
      .select($"vec_id", $"embedding", explode(array(
        (0 until nTables).map(t => struct(lit(t).as("tbl"), col(s"b$t").as("bucket"))): _*)).as("tb"))
      .select($"vec_id", $"embedding", $"tb.tbl".as("tbl"), $"tb.bucket".as("bucket"))

    val probes = for (t <- 0 until nTables; j <- 0 to nPlanes) yield {
      val b = if (j == 0) col(s"b$t") else col(s"b$t").bitwiseXOR(lit(1 << (j - 1)))
      struct(lit(t).as("tbl"), b.as("bucket"))
    }
    val queries = withBuckets.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        explode(array(probes: _*)).as("tb"))
      .select($"query_id", $"q_emb", $"tb.tbl".as("tbl"), $"tb.bucket".as("bucket"))

    corpus.join(broadcast(queries), Seq("tbl", "bucket"))
      .select($"query_id", $"vec_id",
        cosine($"q_emb", $"embedding").as("cos"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster
    * embeddings into k-means cells, find cosine-similar pairs ONLY
    * within each cell, keep the lowest-id member of each similar
    * group. The scale path for embedding dedup: the quadratic
    * comparison is bounded per-cell (n²/k per cell on balanced data)
    * and the join key is the cell id, so nothing ever all-pairs
    * across the corpus — [[embeddingNearDup]] stays the exact
    * correctness baseline this is measured against (recall spec).
    *
    * Trained centroids ride into the plan as the same few-KB literal
    * IVF uses; assignment is one codegen'd pass. Cross-cell near-dups
    * are missed by construction — the SemDeDup trade: with trained
    * centroids, truly similar pairs overwhelmingly co-locate.
    * Threshold note: real embedding corpora run this at ~0.95; the
    * synthetic test corpus tops out at cos 0.48, so the default
    * targets its near-dup band instead.
    *
    * Approximate by construction → rows-only oracle; the spec pins
    * soundness (every emitted dup pair really is ≥ threshold) and
    * recall vs the exact pair set — at TWO cell counts, so recall is
    * known not to collapse as cells shrink.
    *
    * Sizing at scale: nCells ∝ |corpus| / target-cell-size — pick the
    * per-cell row count C the quadratic can afford (the in-cell join
    * does ~C²/2 cosine evals per cell, so C ~ 10⁴-10⁵ keeps each
    * cell's work a single-task affair), then nCells = |corpus|/C;
    * SemDeDup itself runs 10⁵ cells over LAION-scale corpora. Recall
    * lost to boundary splits is bought back with nProbe (OR-
    * amplified membership, fan-out × nProbe), not with fewer cells.
    * Both knobs are wired through the `queries` registration
    * (SparkEntry) the way dedup_minhash_lsh's threshold is — the
    * defaults here are test-corpus scale (|embeddings| at sf0.01 is
    * small, so 8 cells ≈ the C ~ corpus/8 sweet spot). */
  /** The IVF multi-probe verified pair graph — SemDeDup's candidate
    * + verify stage exposed as a pair set: (vec_a < vec_b) with
    * cosine ≥ threshold, candidates restricted to vectors sharing at
    * least one of their nProbe nearest trained cells. Shared by
    * [[dedupSemantic]] (min-neighbor verdicts) and
    * [[semanticClustersIvf]] (connected components) — the ONE
    * corpus-scale pair generator of the semantic family. A pair met
    * in several probed cells appears once PER shared cell: a
    * distinct here would cost an extra shuffle, and both consumers
    * absorb the multiset for free (min-aggregates and min-label
    * propagation are idempotent over duplicate edges). */
  private[graft] def ivfPairs(spark: SparkSession, dir: String, threshold: Double,
                              nCells: Int, nProbe: Int, seed: Long): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val cents = typedLit(trainIvfCentroids(spark, dir, nCells, seed))
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    // multi-probe membership (OR-amplification over the vector's
    // nProbe nearest cells): two vectors compare if ANY probed cell
    // is shared — boundary pairs that single-cell SemDeDup splits
    // still meet. Corpus fan-out is nProbe rows/vector.
    val probed = e.select($"vec_id", $"embedding",
      explode(call_function("graft_ivf_probe_trained", $"embedding", cents, lit(nProbe)))
        .as("pcell"))
    probed.alias("a").join(probed.alias("b"),
        col("a.pcell") === col("b.pcell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
  }

  def dedupSemantic(spark: SparkSession, dir: String, threshold: Double = 0.35,
                    nCells: Int = 8, nProbe: Int = 2, seed: Long = 7L): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val cents = typedLit(trainIvfCentroids(spark, dir, nCells, seed))
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val dupOf = ivfPairs(spark, dir, threshold, nCells, nProbe, seed)
      .groupBy($"vec_b".as("vec_id")).agg(min($"vec_a").as("dup_of"))
    e.withColumn("cell",
        call_function("graft_ivf_assign_trained", $"embedding", cents).cast("long"))
      .select($"vec_id", $"cell")
      .join(dupOf, Seq("vec_id"), "left")
      .withColumn("is_kept", $"dup_of".isNull)
      .withColumn("dup_of", coalesce($"dup_of", $"vec_id"))
      .select($"vec_id", $"cell", $"dup_of", $"is_kept")
      .orderBy($"vec_id")
  }

  private val pqCache =
    graft.GraftCaches.memo[(SparkSession, String, Int, Int), Array[Float]](_ => ())

  /** Product-quantization codebooks (Jégou et al. 2011): the
    * embedding is split into `m` contiguous subspaces of dim/m dims;
    * each subspace gets its own `ksub`-centroid L2 k-means codebook,
    * trained on the same deterministic hash sample the IVF trainer
    * uses (vectors unit-normalized first, so PQ dot products
    * approximate cosine). Returned flat: centroid j of subspace s
    * occupies [(s·ksub + j)·dsub, +dsub).
    *
    * Init is deterministic (even strides through the hash-ordered
    * sample); Lloyd assigns by min L2, recomputes plain means (sub-
    * vectors are not unit vectors — no renormalization), reseeds an
    * emptied cell to the worst-served subvector. m·ksub·dsub floats =
    * exactly dim·ksub values (1 KB-ish) enter the plan as a literal. */
  def trainPqCodebooks(spark: SparkSession, dir: String, m: Int = 16,
                       ksub: Int = 16, sampleN: Int = 10000,
                       iters: Int = 5): Array[Float] =
    pqCache.getOrElseUpdate((spark, dir, m, ksub)) {
      val sample = sampleNormalized(spark, dir, sampleN)
      val n = sample.length
      require(n > 0, "PQ training needs a non-empty sample")
      val dim = sample(0).length
      require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
      val dsub = dim / m
      val out = new Array[Float](m * ksub * dsub)
      var s = 0
      while (s < m) {
        val off = s * dsub
        val k = math.min(ksub, n)
        // deterministic spread init: even strides through the sample
        var cents = Array.tabulate(k)(j => java.util.Arrays.copyOfRange(
          sample((j * n) / k), off, off + dsub))
        def d2(v: Array[Float], c: Array[Float]): Double = {
          var acc = 0.0; var d = 0
          while (d < dsub) { val x = v(off + d) - c(d); acc += x * x; d += 1 }
          acc
        }
        var it = 0
        while (it < iters) {
          val sums = Array.fill(k)(new Array[Double](dsub))
          val counts = new Array[Int](k)
          val assign = new Array[Int](n)
          var i = 0
          while (i < n) {
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < k) {
              val dd = d2(sample(i), cents(c))
              if (dd < bestD) { bestD = dd; best = c }
              c += 1
            }
            assign(i) = best; counts(best) += 1
            var d = 0
            while (d < dsub) { sums(best)(d) += sample(i)(off + d); d += 1 }
            i += 1
          }
          cents = Array.tabulate(k) { c =>
            if (counts(c) == 0) {
              var worst = 0; var worstD = Double.MinValue
              var j = 0
              while (j < n) {
                val dd = d2(sample(j), cents(assign(j)))
                if (dd > worstD) { worstD = dd; worst = j }
                j += 1
              }
              java.util.Arrays.copyOfRange(sample(worst), off, off + dsub)
            } else sums(c).map(x => (x / counts(c)).toFloat)
          }
          it += 1
        }
        var j = 0
        while (j < k) {
          System.arraycopy(cents(j), 0, out, (s * ksub + j) * dsub, dsub)
          j += 1
        }
        // if k < ksub (tiny sample) the remaining slots stay zero —
        // valid centroids that simply never win an argmin on real data
        s += 1
      }
      out
    }

  /** PQ-compressed ANN top-k — the storage-side 100 TB path, the
    * complement of the routing-side IVF/LSH entries: every corpus
    * vector is ENCODED as `m` small codes (m·log2(ksub) bits — with
    * the 16×16 default, 16 nibbles = 8 bytes vs 256 bytes of raw
    * float32, a 32× compression), and queries score candidates with
    * asymmetric distance computation (ADC): one per-query lookup
    * table of m·ksub inner products ⟨q_sub, centroid⟩, then each
    * corpus vector costs m table lookups instead of dim multiplies.
    * At warehouse scale the code table IS the index — it fits in
    * memory where the raw vectors cannot, the scan reads 8-byte
    * codes instead of 256-byte vectors, and the LUT join is a
    * broadcast of (queries × 1 KB).
    *
    * Two-stage: ADC ranks candidates approximately (reconstruction
    * error bounds the dot-product error), the top `rerank` per query
    * are re-scored EXACTLY against the raw vectors, and the final
    * top-k is exact-cosine-ordered — so reported cosines are true
    * cosines; only the candidate choice is approximate (rows-only
    * oracle; recall vs [[annTopK]] spec-gated). Candidate selection
    * runs through the bounded-heap `graft_topk` aggregate: map tasks
    * reduce to ≤rerank entries per query before the shuffle.
    *
    * The encode/ADC expressions are built-in HOFs over the codebook
    * literal — fine at 16·16·4 ops/row here; a deployment hot-path
    * would promote them to a codegen'd Expression exactly as
    * CosineSimilarity/MinHash did. */
  def annPqTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
                m: Int = 16, ksub: Int = 16, rerank: Int = 32): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val cb = trainPqCodebooks(spark, dir, m, ksub)
    val dsub = cb.length / (m * ksub)

    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val codeTable = e.filter($"vec_id" >= nQueries)
      .select($"vec_id", normalizedEmbedding)
      .select($"vec_id", pqCodes(typedLit(cb), m, ksub, dsub))
    val luts = pqLuts(spark, e.filter($"vec_id" < nQueries).collect(), cb, m, ksub, dsub)

    // ADC score = m lookups; candidate top-`rerank` per query through
    // the bounded-heap aggregate (≤rerank entries per map task)
    val adcTop = codeTable.join(broadcast(luts))
      .select($"query_id", $"vec_id", pqAdcScore(m, ksub).as("adc"))
      .groupBy($"query_id")
      .agg(call_function("graft_topk", $"adc", $"vec_id", lit(rerank)).as("top"))
      .select($"query_id", explode($"top.id").as("vec_id"))

    exactRerank(adcTop, e, nQueries, k)
  }

  /** IVF+PQ composed — the full FAISS-IVFPQ shape and THE
    * warehouse-scale serving architecture: IVF routes each query to
    * `nProbe` of `nCells` coarse cells (pruning the scan to
    * ~nProbe/nCells of the corpus), and within the probed cells
    * candidates are scored from 8-byte PQ codes via ADC — so the
    * scan is bounded on BOTH axes: rows touched (IVF) and bytes per
    * row (PQ). Corpus side stays one row per vector (cell id + codes,
    * no explode); the probe fan-out and the per-query LUTs live on
    * the tiny broadcast side; the exact re-rank only ever sees
    * ≤rerank ids per query.
    *
    * Codes quantize the full normalized vector against the SHARED
    * codebook (not the cell residual): residual-PQ would need
    * per-cell codebooks (nCells× training + a codebook lookup per
    * row) for one extra bit of precision — the wrong trade at 16
    * cells; revisit if nCells grows to thousands. Approximate by
    * construction (rows-only oracle); recall spec-gated between
    * [[annIvfTopK]] (same routing loss, lossless scoring) and
    * [[annPqTopK]] (no routing loss, same quantization loss). */
  def annIvfPqTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
                   nCells: Int = 16, nProbe: Int = 4, m: Int = 16, ksub: Int = 16,
                   rerank: Int = 32, seed: Long = 7L): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val cb = trainPqCodebooks(spark, dir, m, ksub)
    val dsub = cb.length / (m * ksub)
    val cents = typedLit(trainIvfCentroids(spark, dir, nCells, seed))

    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val codeTable = e.filter($"vec_id" >= nQueries)
      .withColumn("cell", call_function("graft_ivf_assign_trained", $"embedding", cents))
      .select($"vec_id", $"cell", normalizedEmbedding)
      .select($"vec_id", $"cell", pqCodes(typedLit(cb), m, ksub, dsub))
    val probes = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"),
        explode(call_function("graft_ivf_probe_trained", $"embedding", cents, lit(nProbe)))
          .as("cell"))
      .join(pqLuts(spark, e.filter($"vec_id" < nQueries).collect(), cb, m, ksub, dsub),
        Seq("query_id"))

    val adcTop = codeTable.join(broadcast(probes), Seq("cell"))
      .select($"query_id", $"vec_id", pqAdcScore(m, ksub).as("adc"))
      .groupBy($"query_id")
      .agg(call_function("graft_topk", $"adc", $"vec_id", lit(rerank)).as("top"))
      .select($"query_id", explode($"top.id").as("vec_id"))

    exactRerank(adcTop, e, nQueries, k)
  }

  /** Unit-normalized embedding, MATERIALIZED as its own projection
    * before [[pqCodes]] consumes it: inlining it would splice the
    * norm aggregate into every one of the m·ksub·dsub score
    * sub-expressions (a several-thousand-node tree that stalls
    * codegen), where a projected column costs one pass per row. */
  private def normalizedEmbedding: Column = {
    val norm = sqrt(aggregate(col("embedding"), lit(0.0d), (a, x) => a + x * x))
    transform(col("embedding"), x => x / norm).as("nx")
  }

  /** PQ encoding of the materialized `nx` column (so inner products
    * approximate cosine): per subspace, argmin-L2 centroid of the
    * normalized subvector (`array_position` finds the FIRST minimal
    * score — deterministic tie-break). */
  private def pqCodes(cbCol: Column, m: Int, ksub: Int, dsub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), mi => {
      val scores = transform(sequence(lit(0), lit(ksub - 1)), j =>
        aggregate(sequence(lit(1), lit(dsub)), lit(0.0d), (acc, d) => {
          val diff = element_at(col("nx"), mi * dsub + d) -
            element_at(cbCol, (mi * ksub + j) * dsub + d)
          acc + diff * diff
        }))
      array_position(scores, array_min(scores)) - 1
    }).as("codes")

  /** Per-query ADC lookup tables, built driver-side from the tiny
    * query set (the k-means-training/bloom-sketch planning pattern):
    * `lut[mi*ksub + j] = <q_sub(mi), centroid(mi, j)>`. */
  private def pqLuts(spark: SparkSession, qRows: Array[org.apache.spark.sql.Row],
                     cb: Array[Float], m: Int, ksub: Int, dsub: Int): DataFrame = {
    import spark.implicits._
    qRows.map { r =>
      val v = r.getSeq[Float](1).toArray
      val nrm = math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x))
      val q = if (nrm > 0) v.map(_ / nrm.toFloat) else v
      val lut = new Array[Double](m * ksub)
      for (mi <- 0 until m; j <- 0 until ksub) {
        var s = 0.0; var d = 0
        while (d < dsub) {
          s += q(mi * dsub + d).toDouble * cb((mi * ksub + j) * dsub + d)
          d += 1
        }
        lut(mi * ksub + j) = s
      }
      (r.getLong(0), lut)
    }.toSeq.toDF("query_id", "lut")
  }

  /** ADC score over `codes`/`lut` columns: m table lookups. */
  private def pqAdcScore(m: Int, ksub: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0d), (acc, mi) =>
      acc + element_at(col("lut"),
        (mi * ksub + element_at(col("codes"), mi + 1) + 1).cast("int")))

  /** Exact cosine re-rank of per-query candidate ids — shared tail
    * of every two-stage ANN entry; reported cosines are true. */
  private def exactRerank(candidates: DataFrame, e: DataFrame,
                          nQueries: Int, k: Int): DataFrame = {
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    candidates.join(e, Seq("vec_id")).join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Vector data-quality profiling: per-vector dimensionality and L2
    * norm — the sanity pass a 100 TB embedding corpus runs before any
    * ANN/clustering stage (dimension drift and un-normalized vectors
    * are the two classic upstream bugs). EXACT path: elements scale
    * to integers (×10⁶, round-half-up — float→double widening is
    * exact in both engines), the squared-norm sum is pure Long
    * arithmetic (order-independent; 128-dim · (10⁶)² ≈ 10¹⁴ ≪
    * Long.Max), and the only float is the final sqrt of an exact
    * integer. Embarrassingly parallel single scan, no shuffle before
    * the ordered output.
    */
  def embeddingNorms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", size($"embedding").cast("long").as("dim"),
        expr("""aggregate(embedding, 0L, (acc, x) ->
                 acc + CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                     * CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))""").as("norm_sq_scaled"))
      .withColumn("l2_norm", round(sqrt($"norm_sq_scaled") / lit(1000000.0), 4))
      .orderBy($"vec_id")
  }

  /** DuckDB oracle for [[embeddingNorms]] — same integer scaling
    * (list order is irrelevant: integer sums commute). */
  val embeddingNormsOracleSql: String =
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
      |       CAST(list_sum(list_transform(embedding,
      |              x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
      |                 * CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS norm_sq_scaled,
      |       round(sqrt(CAST(list_sum(list_transform(embedding,
      |              x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
      |                 * CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT)) / 1000000.0, 4) AS l2_norm
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** k-NN label classification over the embedding corpus — the
    * standard "is this embedding space any good" evaluation: each
    * query vector is labeled by the majority vote of its k nearest
    * corpus neighbors (ties broken toward the smaller label id), and
    * the report carries the true label + correctness flag so accuracy
    * is one aggregation away.
    *
    * Same exact brute-force shape as [[annTopK]] (queries broadcast,
    * corpus never shuffles, per-query rank window on balanced
    * query_id partitions); at 100 TB the neighbor stage swaps to the
    * IVF/LSH/PQ paths unchanged — the vote is agnostic to how the
    * top-k arrived.
    */
  def knnClassify(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 50): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"label".cast("long").as("true_label"))
    val corpus = e.filter($"vec_id" >= nQueries)
      .select($"vec_id", $"embedding", $"label".cast("long").as("label"))
    val nn = corpus.join(broadcast(queries))
      .withColumn("cos", cosine($"q_emb", $"embedding"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")))
      .filter($"rank" <= k)
    nn.groupBy($"query_id", $"true_label", $"label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("r", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"votes".desc, $"label")))
      .filter($"r" === 1)
      .select($"query_id", $"label".as("predicted"), $"votes", $"true_label",
        ($"label" === $"true_label").as("correct"))
      .orderBy($"query_id")
  }

  /** DuckDB oracle for [[knnClassify]]. */
  def knnClassifyOracleSql(k: Int = 10, nQueries: Int = 50): String =
    s"""WITH nn AS (SELECT a.vec_id AS query_id,
       |                   CAST(a.label AS BIGINT) AS true_label,
       |                   CAST(b.label AS BIGINT) AS label,
       |                   row_number() OVER (PARTITION BY a.vec_id
       |                     ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id) AS rank
       |            FROM embeddings a JOIN embeddings b ON a.vec_id < $nQueries AND b.vec_id >= $nQueries),
       |v AS (SELECT query_id, true_label, label, count(*) AS votes
       |      FROM nn WHERE rank <= $k GROUP BY 1, 2, 3),
       |p AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS r FROM v)
       |SELECT query_id, label AS predicted, votes, true_label, label = true_label AS correct
       |FROM p WHERE r = 1 ORDER BY query_id""".stripMargin

  /** Per-label centroid of the embedding corpus — the cluster-center
    * table every IVF build, drift monitor, and label-quality audit
    * starts from ([[annIvfTopK]] trains its own centroids by k-means;
    * this is the LABELED ground-truth version). EXACT discipline as
    * [[embeddingNorms]]: elements quantize to ×10⁶ integers
    * (float→double widening exact in both engines), per-dimension
    * sums are pure Long arithmetic in any order, and the only float
    * is the final sum/count division, rounded once.
    *
    * Shape: posexplode fans each vector into (label, dim, q) rows
    * that collapse MAP-SIDE into the |labels|×|dims| grid — the
    * shuffle carries only the grid, never vectors; output is
    * dashboard-scale.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    labelCentroidsTransform(Tables.embeddings(spark, dir))

  def labelCentroidsTransform(embeddings: DataFrame): DataFrame =
    centroidsFromSums(labelDimSums(embeddings))

  /** The additive `(label, dim, n_vecs, sum_q)` sufficient state —
    * shared with [[graft.streaming.LabelCentroidState]]'s per-batch
    * partials (sums of sums merge exactly). */
  private[graft] def labelDimSums(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label").cast("long").as("label"), posexplode(col("embedding")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        expr("CAST(round(CAST(col AS DOUBLE) * 1000000) AS BIGINT)").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("q")).as("sum_q"))

  /** The centroid derivation over the sufficient state — shared by
    * batch and stream so parity is by construction. */
  private[graft] def centroidsFromSums(g: DataFrame): DataFrame =
    g.select(col("label"), col("dim"), col("n_vecs"), col("sum_q"),
        round(col("sum_q") / col("n_vecs") / lit(1000000.0), 6).as("centroid"))
      .orderBy(col("label"), col("dim"))

  /** Per-label embedding drift between two corpus snapshots — the
    * "did this label's region move" monitor a retraining decision
    * reads (here the snapshots are the even/odd `vec_id` halves —
    * deterministic, disjoint, and balanced; a deployment feeds two
    * real snapshot tables through the same transform): per label the
    * L2 distance between the two halves' centroids, exact until the
    * final sqrt. Centroid sums use the [[labelCentroids]] ×10⁶
    * integer quantization; the per-dimension mean DIFFERENCE is the
    * ratio of exact integers (aΣb − bΣa over n_a·n_b in exact
    * DECIMAL cross-multiplication), squared and summed as DOUBLE —
    * the one float reduction; its summation-order noise (~1e-16
    * relative over 64 terms) sits far below the 1e-6 output
    * rounding.
    *
    * Shape: one posexplode pass → map-side collapse to
    * |labels|×|dims|×2 sums → |labels| rows out; vectors never
    * shuffle.
    */
  def centroidDriftTransform(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sums = embeddings
      .select($"label".cast("long").as("label"), ($"vec_id" % 2 === 0).as("snap_a"),
        posexplode($"embedding"))
      .select($"label", $"snap_a", ($"pos" + 1).cast("long").as("dim"),
        expr("CAST(round(CAST(col AS DOUBLE) * 1000000) AS BIGINT)").as("q"))
      .groupBy($"label", $"dim")
      .agg(sum(when($"snap_a", $"q")).as("sa"),
        sum(when(!$"snap_a", $"q")).as("sb"),
        sum(when($"snap_a", 1L).otherwise(0L)).as("na"),
        sum(when(!$"snap_a", 1L).otherwise(0L)).as("nb"))
    sums
      .withColumn("diff", expr(
        "(CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na)"))
      .groupBy($"label")
      .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
        round(sqrt(sum(
          expr("CAST(diff AS DOUBLE) / (CAST(na AS DOUBLE) * nb) / 1000000.0" +
            " * (CAST(diff AS DOUBLE) / (CAST(na AS DOUBLE) * nb) / 1000000.0)"))),
          6).as("centroid_l2_drift"))
      .orderBy($"label")
  }

  def centroidDrift(spark: SparkSession, dir: String): DataFrame =
    centroidDriftTransform(Tables.embeddings(spark, dir))

  /** DuckDB oracle for [[centroidDriftTransform]]. */
  val centroidDriftOracleSql: String =
    """WITH e AS (SELECT CAST(label AS BIGINT) AS label, vec_id % 2 = 0 AS snap_a,
      |                  CAST(i AS BIGINT) AS dim,
      |                  CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
      |           FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |s AS (SELECT label, dim,
      |             CAST(sum(CASE WHEN snap_a THEN q END) AS BIGINT) AS sa,
      |             CAST(sum(CASE WHEN NOT snap_a THEN q END) AS BIGINT) AS sb,
      |             CAST(sum(CASE WHEN snap_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |             CAST(sum(CASE WHEN NOT snap_a THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |      FROM e GROUP BY 1, 2),
      |d AS (SELECT label, na, nb,
      |             CAST(CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na AS DOUBLE)
      |               / (CAST(na AS DOUBLE) * nb) / 1000000.0 AS dm
      |      FROM s)
      |SELECT label, max(na) AS n_a, max(nb) AS n_b,
      |       round(sqrt(sum(dm * dm)), 6) AS centroid_l2_drift
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[labelCentroids]] (1-based dim, same ×10⁶
    * integer quantization — sums commute). */
  val labelCentroidsOracleSql: String =
    """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
      |       count(*) AS n_vecs,
      |       CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_q,
      |       round(CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
      |             / count(*) / 1000000.0, 6) AS centroid
      |FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Micro-unit element table shared by the two profiling ops below:
    * each embedding element as an EXACT ×10⁶ BIGINT
    * ([[labelCentroids]]' quantization discipline) — every
    * downstream sum/min/max is integer arithmetic, so both engines
    * agree bit-for-bit until the one final rounded division. */
  private def elements(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("label"),
        (col("pos") + 1).cast("long").as("dim"),
        expr("CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").as("x6"))

  /** Per-dimension corpus health profile — the dead/saturated
    * dimension screen read before any quantization or index choice:
    * `(dim, lo, hi, mean, variance)`. One map-side-combinable
    * shuffle to |dims| rows; the variance numerator is an exact
    * Decimal(38,0) sum (x6² overflows BIGINT past ~2e10 elements —
    * the [[graft.operators.Behavior]] revenueHhi discipline). */
  def embeddingDimStats(spark: SparkSession, dir: String): DataFrame =
    elements(Tables.embeddings(spark, dir))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        min(col("x6")).as("lo6"), max(col("x6")).as("hi6"),
        sum(col("x6")).as("s6"),
        sum((col("x6") * col("x6")).cast("decimal(38,0)")).as("ss12"))
      .select(col("dim"),
        round(col("lo6").cast("double") / 1e6, 6).as("lo"),
        round(col("hi6").cast("double") / 1e6, 6).as("hi"),
        round(col("s6").cast("double") / col("n") / 1e6, 6).as("mean"),
        round((col("ss12").cast("double") - col("s6").cast("double") * col("s6") / col("n"))
          / (col("n") - 1) / 1e12, 6).as("variance"))
      .orderBy(col("dim"))

  /** DuckDB oracle for [[embeddingDimStats]] (HUGEINT where Spark
    * uses Decimal(38,0)). */
  val embeddingDimStatsOracleSql: String =
    """WITH ex AS (SELECT CAST(i AS BIGINT) AS dim,
      |                   CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x6
      |            FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |s AS (SELECT dim, count(*) AS n, min(x6) AS lo6, max(x6) AS hi6,
      |             CAST(sum(x6) AS BIGINT) AS s6,
      |             sum(CAST(x6 AS HUGEINT) * x6) AS ss12
      |      FROM ex GROUP BY 1)
      |SELECT dim, round(CAST(lo6 AS DOUBLE) / 1e6, 6) AS lo,
      |       round(CAST(hi6 AS DOUBLE) / 1e6, 6) AS hi,
      |       round(CAST(s6 AS DOUBLE) / n / 1e6, 6) AS mean,
      |       round((CAST(ss12 AS DOUBLE) - CAST(s6 AS DOUBLE) * s6 / n) / (n - 1) / 1e12, 6) AS variance
      |FROM s ORDER BY dim""".stripMargin

  /** Scalar (int8) quantization error profile — the cheapest
    * vector-compression rung under [[annPqTopK]]'s PQ (4× vs 32×,
    * but per-element affine: no codebook training, decode = one FMA):
    * per-dim [lo, hi] affine maps each element to 0..255, and the
    * report gives per-label reconstruction `(mse, max_abs_err)` — the
    * "is 4× compression free for THIS corpus" decision table.
    *
    * Everything stays in exact micro-units: the quantize/dequantize
    * round-trips are integer-in, `round(double)`-out with identical
    * expressions in both engines, the error is an exact BIGINT, and
    * the squared-error sum is Decimal(38,0)/HUGEINT. Per-dim ranges
    * are a |dims|-row broadcast back onto the element stream — one
    * extra map-side pass, no second corpus shuffle. */
  def embeddingQuantizeSq(spark: SparkSession, dir: String): DataFrame = {
    val ex = elements(Tables.embeddings(spark, dir))
    val ranges = ex.groupBy(col("dim"))
      .agg(min(col("x6")).as("lo6"), max(col("x6")).as("hi6"))
    ex.join(broadcast(ranges), Seq("dim"))
      .withColumn("span", col("hi6") - col("lo6"))
      .withColumn("q", when(col("span") === 0, lit(0L))
        .otherwise(expr("CAST(round(CAST((x6 - lo6) * 255 AS DOUBLE) / span) AS BIGINT)")))
      .withColumn("err6", col("x6") - (col("lo6") + when(col("span") === 0, lit(0L))
        .otherwise(expr("CAST(round(CAST(q * span AS DOUBLE) / 255) AS BIGINT)"))))
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_el"),
        sum((col("err6") * col("err6")).cast("decimal(38,0)")).as("sse12"),
        max(abs(col("err6"))).as("maxe6"))
      .select(col("label"), expr("n_el div 64").as("n_vecs"),
        round(col("sse12").cast("double") / col("n_el") / 1e12, 8).as("mse"),
        round(col("maxe6").cast("double") / 1e6, 6).as("max_abs_err"))
      .orderBy(col("label"))
  }

  /** DuckDB oracle for [[embeddingQuantizeSq]]. */
  val embeddingQuantizeSqOracleSql: String =
    """WITH ex AS (SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
      |                   CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x6
      |            FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |r AS (SELECT dim, min(x6) AS lo6, max(x6) AS hi6 FROM ex GROUP BY 1),
      |qz AS (SELECT label, x6, lo6, hi6 - lo6 AS span,
      |              CASE WHEN hi6 = lo6 THEN 0
      |                   ELSE CAST(round(CAST((x6 - lo6) * 255 AS DOUBLE) / (hi6 - lo6)) AS BIGINT) END AS q
      |       FROM ex JOIN r USING (dim)),
      |er AS (SELECT label,
      |              x6 - (lo6 + CASE WHEN span = 0 THEN 0
      |                               ELSE CAST(round(CAST(q * span AS DOUBLE) / 255) AS BIGINT) END) AS err6
      |       FROM qz)
      |SELECT label, CAST(count(*) // 64 AS BIGINT) AS n_vecs,
      |       round(CAST(sum(CAST(err6 AS HUGEINT) * err6) AS DOUBLE) / count(*) / 1e12, 8) AS mse,
      |       round(CAST(max(abs(err6)) AS DOUBLE) / 1e6, 6) AS max_abs_err
      |FROM er GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pairwise dimension covariance of the embedding corpus (upper
    * triangle incl. the diagonal) — the redundancy map read between
    * [[embeddingDimStats]]' per-dim variances and any PCA/whitening
    * decision: a block of near-duplicate dimensions means the
    * effective dimensionality is lower than the stored one and PQ
    * subspace splits should cut ACROSS the block, not along it.
    *
    * Exact sufficient statistics in micro-units (the x6 discipline):
    * per (i ≤ j) pair, Σxᵢxⱼ as Decimal(38,0), per-dim sums Σxᵢ as
    * BIGINT; population covariance (n·Σxy − ΣxᵢΣxⱼ)/n² emerges from
    * ONE float division of exact integers, both engines identical.
    *
    * Shape: the d²/2 pair fan-out happens MAP-SIDE inside the
    * partial aggregate (explode → self-join on vec_id is
    * co-partitioned by construction — Catalyst keeps the exploded
    * stream partition-local), and the shuffle moves only the
    * d(d+1)/2-row partial sums per partition — corpus size never
    * crosses the wire. At warehouse scale this is the standard
    * one-pass distributed Gramian.
    */
  def embeddingCovarianceTransform(embeddings: DataFrame): DataFrame = {
    val ex = elements(embeddings).select(col("vec_id"), col("dim"), col("x6"))
    val a = ex.select(col("vec_id"), col("dim").as("dim_i"), col("x6").as("xi"))
    val b = ex.select(col("vec_id"), col("dim").as("dim_j"), col("x6").as("xj"))
    val pair = a.join(b, Seq("vec_id")).filter(col("dim_i") <= col("dim_j"))
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(count(lit(1)).as("n"),
        sum(col("xi")).as("si"), sum(col("xj")).as("sj"),
        sum((col("xi") * col("xj")).cast("decimal(38,0)")).as("sij"))
    pair.select(col("dim_i"), col("dim_j"), col("n"),
        round((col("n") * col("sij") - col("si").cast("decimal(38,0)") * col("sj"))
          .cast("double") / (col("n").cast("double") * col("n").cast("double")) / 1e12, 9)
          .as("covariance"))
      .orderBy(col("dim_i"), col("dim_j"))
  }

  def embeddingCovariance(spark: SparkSession, dir: String): DataFrame =
    embeddingCovarianceTransform(Tables.embeddings(spark, dir))

  /** DuckDB oracle for [[embeddingCovarianceTransform]] (HUGEINT for
    * Decimal(38,0)). */
  val embeddingCovarianceOracleSql: String =
    """WITH ex AS (SELECT vec_id, CAST(i AS BIGINT) AS dim,
      |                   CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x6
      |            FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |p AS (SELECT a.dim AS dim_i, b.dim AS dim_j, count(*) AS n,
      |             CAST(sum(a.x6) AS BIGINT) AS si, CAST(sum(b.x6) AS BIGINT) AS sj,
      |             sum(CAST(a.x6 AS HUGEINT) * b.x6) AS sij
      |      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      |      GROUP BY 1, 2)
      |SELECT dim_i, dim_j, n,
      |       round(CAST(n * sij - CAST(si AS HUGEINT) * sj AS DOUBLE)
      |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12, 9) AS covariance
      |FROM p ORDER BY dim_i, dim_j""".stripMargin

  /** Mislabel/contamination screen: per label, the `topK` vectors
    * FARTHEST from their own label centroid — exactly the rows a
    * labeling audit reads first (a vec far from its centroid is
    * either mislabeled, an outlier document, or a centroid drifting
    * on it). Distance to the centroid in EXACT integers: with n =
    * label count and S_d = Σx6 per dim, n²·dist² = Σ_d (n·x6_d −
    * S_d)² is an exact Decimal(38,0) — ranking never touches a
    * float; the reported distance √(n²d²)/n/10⁶ is derived after
    * rank, rounded. Ranking is per-label under the total order
    * (n²d² DESC, vec_id).
    *
    * Shape: the (label, dim) sufficient sums are [[labelDimSums]]'
    * planning-scale grid broadcast back onto the element stream; the
    * per-vec reduction is map-side combinable on vec_id; the rank
    * window partitions by label. Vectors never shuffle whole.
    */
  def embeddingOutliersTransform(embeddings: DataFrame, topK: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val ex = elements(embeddings)
    val sums = labelDimSums(embeddings) // (label, dim, n_vecs, sum_q)
    val d2 = ex.join(broadcast(sums), Seq("label", "dim"))
      .select($"vec_id", $"label", $"n_vecs",
        expr("CAST(n_vecs * x6 - sum_q AS DECIMAL(38,0))").as("c"))
      .groupBy($"vec_id", $"label")
      .agg(first($"n_vecs").as("n"), sum($"c" * $"c").as("d2n2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"label").orderBy($"d2n2".desc, $"vec_id")
    d2.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= topK)
      .select($"label".cast("long").as("label"), $"rk", $"vec_id",
        round(sqrt($"d2n2".cast("double")) / $"n".cast("double") / 1e6, 6)
          .as("centroid_dist"))
      .orderBy($"label", $"rk")
  }

  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame =
    embeddingOutliersTransform(Tables.embeddings(spark, dir))

  /** DuckDB oracle for [[embeddingOutliersTransform]] (topK = 5). */
  val embeddingOutliersOracleSql: String =
    """WITH ex AS (SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
      |                   CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x6
      |            FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |s AS (SELECT label, dim, count(*) AS n_vecs, CAST(sum(x6) AS BIGINT) AS sum_q
      |      FROM ex GROUP BY 1, 2),
      |d AS (SELECT ex.vec_id, ex.label, CAST(any_value(s.n_vecs) AS BIGINT) AS n,
      |             sum(CAST(s.n_vecs * ex.x6 - s.sum_q AS HUGEINT)
      |                 * CAST(s.n_vecs * ex.x6 - s.sum_q AS HUGEINT)) AS d2n2
      |      FROM ex JOIN s ON ex.label = s.label AND ex.dim = s.dim
      |      GROUP BY 1, 2),
      |r AS (SELECT label, vec_id, n, d2n2,
      |             CAST(row_number() OVER (PARTITION BY label ORDER BY d2n2 DESC, vec_id) AS BIGINT) AS rk
      |      FROM d)
      |SELECT label, rk, vec_id,
      |       round(sqrt(CAST(d2n2 AS DOUBLE)) / CAST(n AS DOUBLE) / 1e6, 6) AS centroid_dist
      |FROM r WHERE rk <= 5 ORDER BY label, rk""".stripMargin

  /** Hard-negative mining — for each query vector, the most-similar
    * corpus vector with a DIFFERENT label: exactly the pairs a
    * contrastive/triplet trainer wants next to its positives (random
    * negatives are too easy; the near-miss with the wrong label is
    * the gradient that matters) and simultaneously the
    * labeling-audit read ("these two are nearly identical and
    * labeled differently — which label is wrong?").
    *
    * Same bounded-broadcast shape as [[knnClassify]]/[[annTopK]]
    * (nQueries-row query side broadcast, corpus streams map-side —
    * plan-audit allowlisted with them), different-label filter
    * BEFORE the rank window, deterministic `(cos DESC, vec_id)`
    * order, cosine reported at the shared 4-decimal rounding.
    */
  def hardNegativesTransform(embeddings: DataFrame, k: Int = 3, nQueries: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val queries = embeddings.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"label".cast("long").as("query_label"))
    val corpus = embeddings.filter($"vec_id" >= nQueries)
      .select($"vec_id", $"embedding", $"label".cast("long").as("neg_label"))
    corpus.join(broadcast(queries))
      .filter($"neg_label" =!= $"query_label")
      .withColumn("cos", cosine($"q_emb", $"embedding"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"query_label", $"rank",
        $"vec_id".as("hard_negative_id"), $"neg_label",
        round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    hardNegativesTransform(Tables.embeddings(spark, dir))

  /** DuckDB oracle for [[hardNegativesTransform]] (k=3, nQueries=20). */
  def hardNegativesOracleSql(k: Int = 3, nQueries: Int = 20): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS query_id, CAST(a.label AS BIGINT) AS query_label,
       |         b.vec_id AS hard_negative_id, CAST(b.label AS BIGINT) AS neg_label,
       |         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS c,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id) AS rank
       |  FROM embeddings a JOIN embeddings b
       |    ON a.vec_id < $nQueries AND b.vec_id >= $nQueries AND a.label <> b.label)
       |SELECT query_id, query_label, CAST(rank AS BIGINT) AS rank,
       |       hard_negative_id, neg_label, round(c, 4) AS cosine
       |FROM p WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Principal direction of the embedding corpus by EXACT-INTEGER
    * power iteration on the (uncentered) Gramian — the spectral read
    * behind "is this embedding space effectively low-rank" that
    * [[embeddingCovarianceTransform]]'s raw matrix only hints at:
    * G(i,j) = Σ_v x6ᵢ·x6ⱼ is one distributed map-side-combinable
    * pass (the corpus never shuffles whole — only d² partial sums
    * cross the wire); the d×d eigen-iteration is then inherently
    * planning-scale driver math (the k-means-training / ADC-LUT
    * collect class, d² ≤ 10⁶ rows documented) done in arbitrary-
    * precision INTEGERS so the DuckDB oracle can replay it
    * bit-for-bit: v₀ = 1e6·𝟙, and each step is v' = sign(Gv) ·
    * (|Gv|·10⁶ div max|Gv|) — truncating div on non-negative
    * operands, identical in BigInt and HUGEINT. After `iters` steps
    * the sign is canonicalized on the first nonzero component, and
    * the Rayleigh quotient λ = vᵀGv / vᵀv emerges from ONE float
    * division of exact integers (as does the λ/trace share).
    * Magnitudes stay < 1e38 (HUGEINT's range) up to ~1e12 vectors —
    * the documented bound.
    */
  def embeddingPcaPowerTransform(embeddings: DataFrame, iters: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val ex = elements(embeddings).select($"vec_id", $"dim", $"x6")
    val gram = ex.select($"vec_id", $"dim".as("i"), $"x6".as("xi"))
      .join(ex.select($"vec_id", $"dim".as("j"), $"x6".as("xj")), Seq("vec_id"))
      .groupBy($"i", $"j")
      .agg(sum(($"xi" * $"xj").cast("decimal(38,0)")).as("g"))
    // planning-scale: d² sufficient statistics (4096 rows at d=64)
    val cells = gram.collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
      BigInt(r.getDecimal(2).toBigInteger)))
    val d = cells.iterator.map(_._1).max
    val a = Array.ofDim[BigInt](d + 1, d + 1)
    for (i <- 0 to d; j <- 0 to d) a(i)(j) = BigInt(0)
    cells.foreach { case (i, j, g) => a(i)(j) = g }
    var v = Array.fill(d + 1)(BigInt(1000000)); v(0) = BigInt(0)
    for (_ <- 1 to iters) {
      val mv = Array.tabulate(d + 1) { i =>
        if (i == 0) BigInt(0)
        else (1 to d).iterator.map(j => a(i)(j) * v(j)).sum
      }
      val mx = mv.iterator.map(_.abs).max
      v = mv.map(x => x.signum * ((x.abs * 1000000) / mx))
    }
    val firstNz = (1 to d).find(v(_) != 0).getOrElse(1)
    if (v(firstNz) < 0) v = v.map(-_)
    val num = (for (i <- 1 to d; j <- 1 to d) yield v(i) * a(i)(j) * v(j)).sum
    val den = (1 to d).iterator.map(i => v(i) * v(i)).sum
    val trace = (1 to d).iterator.map(i => a(i)(i)).sum
    val norm = math.sqrt(den.toDouble)
    // HALF_UP mirrors both engines' round() (away-from-zero on ties),
    // NOT math.rint's half-to-even
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lambda = r6(num.toDouble / den.toDouble / 1e12)
    val share = r6(num.toDouble / den.toDouble / trace.toDouble)
    (1 to d).map { i =>
      (i.toLong, v(i).toLong, r6(v(i).toDouble / norm), lambda, share)
    }.toDF("dim", "v6", "loading", "lambda_x6sq", "var_share")
      .orderBy($"dim")
  }

  def embeddingPcaPower(spark: SparkSession, dir: String): DataFrame =
    embeddingPcaPowerTransform(Tables.embeddings(spark, dir))

  /** DuckDB oracle for [[embeddingPcaPowerTransform]] (iters = 8,
    * unrolled — HUGEINT mirrors BigInt exactly under the |·|-then-
    * truncating-div rescale). */
  val embeddingPcaPowerOracleSql: String = {
    // every chained CTE is MATERIALIZED: DuckDB inlines CTEs by
    // default, and v_k references mv_k twice (directly and through
    // mx_k) — inlining would re-expand the whole prefix 2^8 times
    val iter = (k: Int) =>
      s"""mv$k AS MATERIALIZED (SELECT g.i AS dim, sum(g.g * v.v) AS mv
         |         FROM gram g JOIN v${k - 1} v ON v.dim = g.j GROUP BY 1),
         |mx$k AS MATERIALIZED (SELECT max(abs(mv)) AS mx FROM mv$k),
         |v$k AS MATERIALIZED (SELECT dim, CAST(sign(mv) AS HUGEINT) * ((abs(mv) * 1000000) // mx) AS v
         |        FROM mv$k, mx$k)""".stripMargin
    s"""WITH ex AS MATERIALIZED (SELECT vec_id, CAST(i AS BIGINT) AS dim,
       |                   CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x6
       |            FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
       |gram AS MATERIALIZED (SELECT a.dim AS i, b.dim AS j, sum(CAST(a.x6 AS HUGEINT) * b.x6) AS g
       |         FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |v0 AS MATERIALIZED (SELECT DISTINCT i AS dim, CAST(1000000 AS HUGEINT) AS v FROM gram),
       |${(1 to 8).map(iter).mkString(",\n")},
       |sg AS (SELECT CASE WHEN (SELECT v FROM v8
       |                         WHERE dim = (SELECT min(dim) FROM v8 WHERE v <> 0)) < 0
       |                   THEN -1 ELSE 1 END AS s),
       |vf AS (SELECT dim, v * s AS v FROM v8, sg),
       |ray AS (SELECT sum(va.v * g.g * vb.v) AS num
       |        FROM gram g JOIN vf va ON va.dim = g.i JOIN vf vb ON vb.dim = g.j),
       |dn AS (SELECT sum(v * v) AS den FROM vf),
       |tr AS (SELECT sum(g) AS trace FROM gram WHERE i = j)
       |SELECT vf.dim, CAST(vf.v AS BIGINT) AS v6,
       |       round(CAST(vf.v AS DOUBLE) / sqrt(CAST(dn.den AS DOUBLE)), 6) AS loading,
       |       round(CAST(ray.num AS DOUBLE) / CAST(dn.den AS DOUBLE) / 1e12, 6) AS lambda_x6sq,
       |       round(CAST(ray.num AS DOUBLE) / CAST(dn.den AS DOUBLE)
       |             / CAST(tr.trace AS DOUBLE), 6) AS var_share
       |FROM vf, ray, dn, tr ORDER BY vf.dim""".stripMargin
  }

  // ---------------------------------------------------------------
  // Hybrid retrieval: BM25 ⊕ dense cosine via reciprocal-rank fusion
  // ---------------------------------------------------------------

  /** Hybrid top-k retrieval — the modern RAG-serving shape: a SPARSE
    * lexical ranking (the [[TextOps.bm25TopK]] exact-integer BM25,
    * here generalized to per-query term sets drawn from the query
    * documents themselves) and a DENSE ranking (exact cosine against
    * the query embedding, [[annTopK]]'s shape) are fused by
    * reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * {{{ rrf(d) = Σ_lists 1e6 div (60 + rank_list(d)) }}}
    * over each list's top-`pool` — integer arithmetic, so fusion is
    * bit-reproducible; absence from a list contributes 0 (standard
    * pooled RRF). RRF needs no score calibration between the lists —
    * exactly why it wins over weighted-sum fusion when one side is an
    * integer BM25 surrogate and the other a cosine.
    *
    * Queries are doc_ids < nQueries (documents and embeddings share
    * the id space — a query contributes its distinct terms to the
    * sparse side and its vector to the dense side).
    *
    * Scale shape: the sparse side is an inverted-index equi-join
    * (corpus postings filtered to the broadcast query-term set BEFORE
    * aggregation); the dense side broadcasts nQueries vectors and
    * never shuffles the corpus; both rank windows partition by
    * query_id; the fuse is a pool-bounded full-outer join. */
  def hybridRrfTopK(spark: SparkSession, dir: String, nQueries: Int = 3,
                    pool: Int = 50, topN: Int = 10): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .withColumn("dl", size($"ws").cast("long"))
    val corpusDocs = docs.filter($"doc_id" >= nQueries)
    val qTerms = docs.filter($"doc_id" < nQueries)
      .select($"doc_id".as("query_id"), explode(array_distinct($"ws")).as("term"))
    val stats = corpusDocs.agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_words"))
    // pushdown: the corpus explode is filtered to the broadcast
    // query-term set BEFORE the tf aggregate touches anything
    val post = corpusDocs
      .select($"doc_id", $"dl", explode($"ws").as("term"))
      .join(broadcast(qTerms.select($"term").distinct()), Seq("term"))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    hybridFuse(post, qTerms, stats,
      e.filter($"vec_id" >= nQueries),
      e.filter($"vec_id" < nQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb")),
      pool, topN)
  }

  /** The shared fusion core both hybrid faces run: BM25 scoring of
    * the (already query-term-restricted) corpus postings, dense
    * cosine ranking, pooled RRF. `post` = (doc_id, dl, term, tf),
    * `qTerms` = (query_id, term) distinct, `stats` = 1-row
    * (n_docs, total_words) over the corpus. */
  private[graft] def hybridFuse(post: DataFrame, qTerms: DataFrame, stats: DataFrame,
                                corpusEmb: DataFrame, qEmb: DataFrame,
                                pool: Int, topN: Int): DataFrame = {
    val spark = post.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val k1_100 = 120L
    val b_100 = 75L
    val df_ = post.groupBy($"term").agg(count(lit(1)).as("df"))
    val byScore = Window.partitionBy($"query_id").orderBy($"score".desc, $"doc_id")
    val sparse = post
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("norm_100",
        lit(100L) - lit(b_100) + expr(s"($b_100 * dl * n_docs) div total_words"))
      .withColumn("denom", $"tf" * 100L + expr(s"($k1_100 * norm_100) div 100"))
      .withColumn("tfc_10000", expr(s"(tf * ${k1_100 + 100} * 10000) div denom"))
      .withColumn("idf_10000", expr("((n_docs - df) * 10000) div df"))
      .withColumn("term_score", expr("(idf_10000 * tfc_10000) div 10000"))
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"term_score").as("score"))
      .withColumn("sparse_rank", row_number().over(byScore).cast("long"))
      .filter($"sparse_rank" <= pool)
      .select($"query_id", $"doc_id", $"sparse_rank")
    val byCos = Window.partitionBy($"query_id").orderBy($"cos4".desc, $"vec_id")
    val dense = corpusEmb
      .join(broadcast(qEmb))
      .withColumn("cos4", round(cosine($"q_emb", $"embedding"), 4))
      .withColumn("dense_rank", row_number().over(byCos).cast("long"))
      .filter($"dense_rank" <= pool)
      .select($"query_id", $"vec_id".as("doc_id"), $"dense_rank")
    val byRrf = Window.partitionBy($"query_id").orderBy($"rrf_score".desc, $"doc_id")
    dense.join(sparse, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        expr("coalesce(1000000 div (60 + dense_rank), 0) + coalesce(1000000 div (60 + sparse_rank), 0)"))
      .withColumn("rank", row_number().over(byRrf).cast("long"))
      .filter($"rank" <= topN)
      .select($"query_id", $"doc_id", $"rank", $"rrf_score", $"dense_rank", $"sparse_rank")
      .orderBy($"query_id", $"rank")
  }

  /** Full (unfiltered) postings for one batch of documents — the
    * inverted-index rows the streaming hybrid face delta-appends.
    * Index build does NOT know the queries; serving filters. */
  private[graft] def hybridPostings(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id", split($"text", " ").as("ws"))
      .withColumn("dl", size($"ws").cast("long"))
      .select($"doc_id", $"dl", explode($"ws").as("term"))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
  }

  /** The streaming report: re-derive query terms, corpus stats, and
    * the query-term-restricted postings from the accrued index, then
    * run the SAME fusion core. */
  private[graft] def hybridFromIndex(post: DataFrame, emb: DataFrame, nQueries: Int,
                                     pool: Int = 50, topN: Int = 10): DataFrame = {
    val spark = post.sparkSession
    import spark.implicits._
    val qTerms = post.filter($"doc_id" < nQueries)
      .select($"doc_id".as("query_id"), $"term").distinct()
    val corpusPost = post.filter($"doc_id" >= nQueries)
    val stats = corpusPost.select($"doc_id", $"dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_words"))
    hybridFuse(
      corpusPost.join(broadcast(qTerms.select($"term").distinct()), Seq("term"))
        .select($"doc_id", $"dl", $"term", $"tf"),
      qTerms, stats,
      emb.filter($"vec_id" >= nQueries),
      emb.filter($"vec_id" < nQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb")),
      pool, topN)
  }

  /** DuckDB oracle for [[hybridRrfTopK]] — identical BM25 integer
    * recurrence, 4dp cosine grid, and RRF arithmetic. `live` is an
    * extra corpus predicate (`{col}` substituted per side) — the
    * tombstone face passes the retraction slice's complement so the
    * oracle runs over the tombstone-compacted live corpus. */
  def hybridRrfOracleSql(nQueries: Int = 3, pool: Int = 50, topN: Int = 10,
                         live: String = "TRUE"): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |docs AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM d),
       |corpus AS (SELECT * FROM docs WHERE doc_id >= $nQueries
       |           AND ${live.replace("{col}", "doc_id")}),
       |qt AS (SELECT DISTINCT docs.doc_id AS query_id, u.term AS term
       |       FROM docs, unnest(ws) AS u(term) WHERE doc_id < $nQueries),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS total_words FROM corpus),
       |post AS (SELECT doc_id, dl, u.term AS term, CAST(count(*) AS BIGINT) AS tf
       |         FROM corpus, unnest(ws) AS u(term)
       |         WHERE u.term IN (SELECT DISTINCT term FROM qt)
       |         GROUP BY 1, 2, 3),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
       |s AS (SELECT qt.query_id, p.doc_id,
       |             p.tf * 100 + (120 * (100 - 75 + (75 * p.dl * st.n_docs) // st.total_words)) // 100 AS denom,
       |             p.tf, dfq.df, st.n_docs
       |      FROM post p JOIN qt USING (term) JOIN dfq USING (term) CROSS JOIN stats st),
       |sc AS (SELECT query_id, doc_id,
       |              CAST(sum((((n_docs - df) * 10000) // df) * ((tf * 220 * 10000) // denom) // 10000) AS BIGINT) AS score
       |       FROM s GROUP BY 1, 2),
       |sparse AS (SELECT query_id, doc_id,
       |                  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS sparse_rank
       |           FROM sc QUALIFY sparse_rank <= $pool),
       |dense AS (SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
       |                 CAST(row_number() OVER (PARTITION BY a.vec_id
       |                   ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) DESC,
       |                            b.vec_id) AS BIGINT) AS dense_rank
       |          FROM embeddings a JOIN embeddings b
       |            ON a.vec_id < $nQueries AND b.vec_id >= $nQueries
       |            AND ${live.replace("{col}", "b.vec_id")}
       |          QUALIFY dense_rank <= $pool),
       |f AS (SELECT query_id, doc_id,
       |             CAST(COALESCE(1000000 // (60 + dense_rank), 0)
       |                + COALESCE(1000000 // (60 + sparse_rank), 0) AS BIGINT) AS rrf_score,
       |             dense_rank, sparse_rank
       |      FROM dense FULL OUTER JOIN sparse USING (query_id, doc_id))
       |SELECT query_id, doc_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank,
       |       rrf_score, dense_rank, sparse_rank
       |FROM f QUALIFY rank <= $topN
       |ORDER BY query_id, rank""".stripMargin
}
