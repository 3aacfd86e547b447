package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over the item co-engagement graph — the natural
  * downstream of [[Behavior.coEngagementTransform]]'s co-occurrence
  * matrix (reference `src/process.py:43-76` feeds the same event log
  * to its analytics store; ranking items and finding tightly-knit
  * item communities are the two classic graph asks on top of it).
  *
  * Graph basis shared by both operators: co-engagement pairs capped
  * at `maxItems` per user (the quadratic guard documented on
  * [[Behavior.coEngagementTransform]]), then the TOP-`topEdges` pairs
  * by co-occurrence count (total order `(n_users DESC, item_a,
  * item_b)` so the cut is deterministic). A fixed support threshold
  * degenerates as data grows — at sf0.01 every one of the C(100,2)
  * item pairs already clears support 3 and the graph is complete —
  * whereas a top-E cut keeps edge count (and therefore iteration
  * cost) bounded and the structure non-trivial at every scale.
  *
  * Scale shape: everything downstream of the pair aggregate operates
  * on (id, id) edges — a few dozen bytes per edge, never event rows.
  * The edge list after the top-E cut is planning-scale (≤ topEdges
  * rows) here; on a 100 TB deployment where the retained graph is
  * itself large, the same plans hold with the `limit` replaced by a
  * support threshold tuned to keep |E| ~ billions: every join below
  * is keyed on a node id (co-partitionable), every aggregate is
  * map-side combinable, and iteration lineage is truncated per round
  * exactly like [[Dedup.dedupClustersStar]].
  *
  * CONCURRENCY NOTE (round-5 advice): the iterative transforms
  * ([[pagerankTransform]], [[hitsTransform]], [[lpaTransform]]) pin
  * `spark.sql.shuffle.partitions` and disable AQE on the SHARED
  * session conf for the iteration scope (restored in `finally`).
  * Session conf is per-session, not per-query: anything planned
  * concurrently on the same SparkSession inside that window silently
  * picks up the iteration's settings. Fine in this library's
  * sequential bench/verify harness; a multi-tenant caller should run
  * these transforms on `spark.newSession()` (shared SparkContext and
  * cache, isolated conf) or serialize them with its other planning.
  */
object Graph {

  /** Co-engagement edge list: top-`topEdges` item pairs by
    * co-occurrence count. Columns `(item_a, item_b)` with
    * `item_a < item_b`, each row one undirected edge.
    */
  def edgeTransform(events: DataFrame, maxItems: Int, topEdges: Int): DataFrame =
    Behavior.coEngagementTransform(events, maxItems, minSupport = 1L)
      .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
      .limit(topEdges)
      .select(col("item_a"), col("item_b"))

  /** Per-round lineage truncation — same rationale as
    * [[Dedup.dedupClustersStar]]'s: persist caches data but the
    * logical plan still nests every prior round (exponential Catalyst
    * re-analysis); checkpoint()/localCheckpoint() cuts the plan.
    */
  private def truncateLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Fixed-iteration PageRank (Page et al. 1999) in EXACT integer
    * arithmetic, so the result is bit-reproducible and
    * hash-comparable against an independent engine: floating-point
    * PageRank sums contributions in nondeterministic order, integer
    * sums are order-independent.
    *
    * Formulation: undirected graph, every node starts at `scale`;
    * one round is
    * {{{ score'(v) = (15·scale)/100  +  (85 · Σ_{u∈Γ(v)} score(u) div deg(u)) div 100 }}}
    * with `div` = truncating integer division (all values positive,
    * so Spark's `div` and DuckDB's `//` agree). Undirected means
    * deg(u) ≥ 1 for every node in an edge and every node receives
    * mass each round — no dangling-mass correction term needed.
    * Truncation drops < deg(u) units per neighbor per round — at
    * `scale` = 1e9 a relative error < 1e-6, far below ranking
    * resolution, and identical in both engines.
    *
    * Scale shape: per iteration, scores ⋈ deg is co-partitioned on
    * `item`, the contribution fan-out joins edges on `src` (edges
    * persist partitioned once, scores shuffle — the small side), and
    * the in-sum is a map-side-combinable groupBy on `dst`. Overflow
    * headroom: total mass stays ≤ |V|·scale, so 85·Σ fits a Long up
    * to |V| ≈ 1e8 nodes at scale = 1e9.
    */
  def pagerankTransform(pairs: DataFrame, iters: Int = 10, scale: Long = 1000000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // iteration shuffles scoped to few partitions: per-round data is
    // ids+scores (KBs here; at a billion-edge deployment this knob is
    // sized to the edge list instead) — same pattern as
    // dedupClustersStar's iteration scope
    // materialize the edge list ONCE before anything references it:
    // the symmetric union below (and deg, and every round) would
    // otherwise re-execute the co-engagement aggregation chain per
    // reference — the classic diamond-reuse trap. CRUCIALLY this runs
    // BEFORE the iteration conf scope narrows the shuffle width: the
    // upstream pair fan-out is FACT-scale (per-user k²/2 pairs over
    // the whole corpus) and squeezing it into 8 partitions with AQE
    // off turned a 100× run from seconds into a timeout — measured,
    // third stint.
    val p = truncateLineage(pairs)
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(shuffleKey, "8")
    // AQE off for the iteration scope: each round is a fixed tiny
    // 2-shuffle job, and adaptive re-planning at every stage boundary
    // costs more than it can ever save on planning-scale state; the
    // conf is restored before the caller's plan executes
    spark.conf.set(aqeKey, "false")
    val edges = p.select($"item_a".as("src"), $"item_b".as("dst"))
      .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst")))
      .persist()
    val deg = edges.groupBy($"src".as("item")).agg(count(lit(1)).as("deg")).persist()
    val base = 15L * scale / 100L
    try {
      var scores = truncateLineage(deg.select($"item", lit(scale).as("score")))
      for (i <- 1 to iters) {
        val contrib = scores.join(deg, "item")
          .join(edges, $"item" === $"src")
          .select($"dst".as("item"), expr("score div deg").as("c"))
        val next = contrib.groupBy($"item")
          .agg(expr(s"$base + (85 * sum(c)) div 100").as("score"))
        // Truncation every FOURTH round (and on the last): unlike star
        // contraction the plan growth here is linear (each round
        // references the prior scores once), so a 4-deep nested plan
        // is safe — and each eager checkpoint is a whole extra job, so
        // thinning them is the dominant per-round saving. The cut on
        // the final round keeps ALL iteration execution inside this
        // conf scope (shuffle width + AQE pinned); the caller's plan
        // then sees nothing but the checkpointed result.
        scores = if (i % 4 == 0 || i == iters) truncateLineage(next) else next
      }
      scores.select($"item", $"score".as("pr_score"))
        .orderBy($"pr_score".desc, $"item")
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(aqeKey, prevAqe)
      edges.unpersist()
      deg.unpersist()
    }
  }

  def pagerankItems(spark: SparkSession, dir: String): DataFrame =
    pagerankTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** Fixed-iteration Katz centrality (Katz 1953) in the
    * [[pagerankTransform]] exact-integer discipline — the
    * α-attenuated PATH-COUNT centrality next to PageRank's random
    * walk (PageRank splits a node's mass across its edges, Katz
    * credits EVERY walk reaching you: a node tied to three hubs
    * outranks one tied to three leaves even at equal degree):
    * {{{ x'(v) = scale + (Σ_{u∈Γ(v)} x(u)) div 64 }}}
    * with truncating div (positive values — Spark `div` ≡ DuckDB
    * `//`). α = 1/64 converges UNCONDITIONALLY here: the edge list is
    * capped at `topEdges` = 800, and for any graph λ_max ≤ √(2m) =
    * √1600 = 40 < 64, so scores are bounded by scale/(1−λα) ≤
    * 2.7·scale — Long-safe at any corpus. 8 rounds ≈ attenuation
    * (40/64)⁸ < 3%, under ranking resolution.
    *
    * Scale shape per round: scores ⋈ edges on `src` (ids+scores
    * only), in-sum map-side-combinable on `dst` — the PageRank loop
    * minus the degree join (no normalization in Katz). */
  def katzTransform(pairs: DataFrame, iters: Int = 8, scale: Long = 1000000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // fact-scale pair materialization BEFORE the iteration conf scope
    // (the pagerankTransform 100×-timeout lesson)
    val p = truncateLineage(pairs)
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(shuffleKey, "8")
    spark.conf.set(aqeKey, "false")
    val edges = p.select($"item_a".as("src"), $"item_b".as("dst"))
      .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst")))
      .persist()
    val nodes = edges.select($"src".as("item")).distinct().persist()
    try {
      var scores = truncateLineage(nodes.select($"item", lit(scale).as("score")))
      for (i <- 1 to iters) {
        val contrib = scores
          .join(edges, $"item" === $"src")
          .select($"dst".as("item"), $"score".as("c"))
        val next = contrib.groupBy($"item")
          .agg(expr(s"$scale + sum(c) div 64").as("score"))
        scores = if (i % 4 == 0 || i == iters) truncateLineage(next) else next
      }
      scores.select($"item", $"score".as("katz_score"))
        .orderBy($"katz_score".desc, $"item")
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(aqeKey, prevAqe)
      edges.unpersist()
      nodes.unpersist()
    }
  }

  def katzItems(spark: SparkSession, dir: String): DataFrame =
    katzTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** Fixed-iteration PERSONALIZED PageRank (Haveliwala 2002; the
    * random-surfer teleports to a SEED SET, not uniformly) in the
    * [[pagerankTransform]] exact-integer discipline — the
    * recommendation / local-relevance face of the centrality family:
    * global PageRank answers "what is important anywhere", PPR
    * answers "what is important NEAR these items" (here the seed set
    * `item % seedMod == 0`, standing in for a user's recent items or
    * a curated topic set). One round is
    * {{{ score'(v) = (v∈S ? (15·scale) div 100 : 0)
    *               + (85 · Σ_{u∈Γ(v)} score(u) div deg(u)) div 100 }}}
    * with init score = scale on seeds only. The union-then-sum
    * formulation keeps seeds alive even when no neighbor feeds them
    * (a bare `GROUP BY dst` would silently drop a seed with no
    * in-mass that round); nodes never reached by seed mass simply
    * never appear — the output support IS the iters-hop
    * seed-reachable set, which is the semantics a recommender wants.
    *
    * Scale shape identical to [[pagerankTransform]] (scores ⋈ deg
    * co-partitioned, edge fan-out keyed on src, map-side-combinable
    * in-sum) plus one planning-scale union with the seed base table
    * per round. Mass bound: Σ scores ≤ |S|·scale/0.15, Long-safe at
    * scale 1e9 up to ~1e7 seeds.
    */
  def pprTransform(pairs: DataFrame, iters: Int = 10, scale: Long = 1000000000L,
                   seedMod: Long = 5L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = truncateLineage(pairs)
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(shuffleKey, "8")
    spark.conf.set(aqeKey, "false")
    val edges = p.select($"item_a".as("src"), $"item_b".as("dst"))
      .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst")))
      .persist()
    val deg = edges.groupBy($"src".as("item")).agg(count(lit(1)).as("deg")).persist()
    val seeds = deg.select($"item").filter($"item" % seedMod === 0L).persist()
    val base = 15L * scale / 100L
    try {
      var scores = truncateLineage(seeds.select($"item", lit(scale).as("score")))
      for (i <- 1 to iters) {
        val contrib = scores.join(deg, "item")
          .join(edges, $"item" === $"src")
          .select($"dst".as("item"), expr("score div deg").as("c"))
        val inMass = contrib.groupBy($"item")
          .agg(expr("(85 * sum(c)) div 100").as("s"))
        val next = seeds.select($"item", lit(base).as("s"))
          .unionByName(inMass)
          .groupBy($"item").agg(sum($"s").as("score"))
        scores = if (i % 4 == 0 || i == iters) truncateLineage(next) else next
      }
      scores.select($"item", $"score".as("ppr_score"))
        .orderBy($"ppr_score".desc, $"item")
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(aqeKey, prevAqe)
      edges.unpersist()
      deg.unpersist()
      seeds.unpersist()
    }
  }

  def pprItems(spark: SparkSession, dir: String): DataFrame =
    pprTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** Random-walk corpus over the co-engagement graph — the training-
    * data generator for every skip-gram graph embedding (DeepWalk,
    * Perozzi et al. 2014; node2vec at p=q=1): `walksPerNode` walks of
    * `walkLen` steps from every node. The walk is DERANDOMIZED the
    * way every exact-reproducible operator here is: step t of walk w
    * at node v moves to the neighbor at index
    * {{{ (w·1000003 + t·8191 + v·131) mod deg(v) }}}
    * over the (dst ASC) neighbor ordering — a fixed mixing hash in
    * portable integer arithmetic, so the corpus is a pure function of
    * the edge list, bit-equal in any engine (textbook RNG walks are
    * run-unstable and engine-specific, the `communities_lpa`
    * tie-break argument). walk_id = start·walksPerNode + replicate,
    * so the hash decorrelates replicates of the same start.
    *
    * Scale shape per step: walks ⋈ indexed edges is an equi-join on
    * (node = src, idx) — co-partitionable on the node id; the
    * neighbor index is a per-src window (each src sorts only its own
    * adjacency); output is |V|·walksPerNode·(walkLen+1) rows, linear
    * in graph size. Lineage truncated per step.
    */
  def randomWalksTransform(pairs: DataFrame, walksPerNode: Int = 2,
                           walkLen: Int = 5): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = truncateLineage(pairs)
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(shuffleKey, "8")
    spark.conf.set(aqeKey, "false")
    val edges = p.select($"item_a".as("src"), $"item_b".as("dst"))
      .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst")))
      .withColumn("idx",
        row_number().over(Window.partitionBy($"src").orderBy($"dst")).cast("long") - 1L)
      .withColumn("deg", count(lit(1)).over(Window.partitionBy($"src")).cast("long"))
      .persist()
    try {
      val reps = (0 until walksPerNode).map(r => lit(r.toLong))
      var cur = truncateLineage(edges.select($"src".as("node")).distinct()
        .select($"node", explode(array(reps: _*)).as("r"))
        .select(($"node" * walksPerNode + $"r").as("walk_id"), $"node"))
      val steps = scala.collection.mutable.ListBuffer(
        cur.select($"walk_id", lit(0L).as("step"), $"node"))
      for (t <- 1 to walkLen) {
        cur = truncateLineage(cur
          .join(edges, $"node" === $"src" &&
            edges("idx") === pmod($"walk_id" * 1000003L + lit(t.toLong) * 8191L + $"node" * 131L,
              edges("deg")))
          .select($"walk_id", $"dst".as("node")))
        steps += cur.select($"walk_id", lit(t.toLong).as("step"), $"node")
      }
      steps.reduce(_ unionByName _).orderBy($"walk_id", $"step")
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(aqeKey, prevAqe)
      edges.unpersist()
    }
  }

  def randomWalks(spark: SparkSession, dir: String): DataFrame =
    randomWalksTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** Harmonic (closeness-family) centrality from a SAMPLED source
    * set (Eppstein & Wang 2004's estimator; harmonic form per
    * Boldi & Vigna 2014 because it is defined on disconnected
    * graphs — an unreachable pair contributes 0, no ∞ special-case):
    * {{{ H(v) = Σ_{s∈S, d(s,v)>0} 1e6 div d(s,v) }}}
    * over hop distances from the seed set `item % srcMod == 0`,
    * truncated at `maxHops` (distances beyond the cap count as
    * unreachable — the standard bounded-BFS trade). `1e6 div d` keeps
    * the sum an exact order-independent integer, bit-equal in any
    * engine.
    *
    * Scale shape per BFS round: frontier ⋈ edges is an equi-join on
    * the node id; the first-arrival set difference (left_anti against
    * visited) is co-partitioned on (src, node); every round's state
    * is (seed × reached-node) pairs — |S|·|V| worst case, the
    * documented cost of sampled closeness (S is the knob). Lineage
    * truncated per round.
    *
    * Choosing `srcMod`: seeds are the ~1/srcMod slice of nodes with
    * id ≡ 0 (mod srcMod), so cost scales linearly in 1/srcMod while
    * the estimator's error shrinks as O(1/√|S|) (Eppstein & Wang).
    * The suite's sampling-adequacy gate (GraphSpec "sampled heads
    * stay inside the exact head") pins the practical contract: the
    * sampled top-5 must stay inside the exact top-10 and densifying
    * the sample must never lose head accuracy — if a target graph
    * fails that check at your chosen density, lower srcMod until it
    * holds.
    */
  def harmonicCentralityTransform(pairs: DataFrame, srcMod: Long = 3L,
                                  maxHops: Int = 8): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = truncateLineage(pairs)
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(shuffleKey, "8")
    spark.conf.set(aqeKey, "false")
    val edges = p.select($"item_a".as("src"), $"item_b".as("dst"))
      .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst")))
      .persist()
    try {
      val seeds = edges.select($"src".as("s")).distinct()
        .filter($"s" % srcMod === 0L)
      var visited = truncateLineage(seeds.select($"s", $"s".as("node"), lit(0L).as("d")))
      var frontier = visited.select($"s", $"node")
      var t = 1
      var drained = false
      while (t <= maxHops && !drained) {
        val next = truncateLineage(frontier
          .join(edges, $"node" === $"src")
          .select($"s", $"dst".as("node")).distinct()
          .join(visited.select($"s", $"node"), Seq("s", "node"), "left_anti"))
        if (next.isEmpty) drained = true
        else {
          visited = truncateLineage(
            visited.unionByName(next.select($"s", $"node", lit(t.toLong).as("d"))))
          frontier = next
          t += 1
        }
      }
      visited.filter($"d" > 0L)
        .groupBy($"node".as("item"))
        .agg(count(lit(1)).as("n_sources"),
          sum(expr("1000000 div d")).as("harmonic_1e6"))
        .orderBy($"harmonic_1e6".desc, $"item")
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(aqeKey, prevAqe)
      edges.unpersist()
    }
  }

  def harmonicCentrality(spark: SparkSession, dir: String): DataFrame =
    harmonicCentralityTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** Sampled betweenness centrality (Brandes 2001 dependency
    * accumulation; source-sampled per Brandes & Pich 2007) — the last
    * classic centrality next to PageRank/Katz/HITS/harmonic: how much
    * shortest-path TRAFFIC transits a node. Forward phase: BFS from
    * the seed set with shortest-path counts σ (σ sums over
    * equal-depth predecessors — map-side combinable). Backward phase,
    * depth by depth:
    * {{{ δ(v) += σ(v) · (SCALE + δ(w)) div σ(w)   for each DAG edge v→w }}}
    * in scaled integer arithmetic (SCALE = 1e9): truncating div makes
    * the accumulation deterministic and engine-free where float
    * Brandes depends on summation order. Betweenness(v) =
    * Σ_sources δ(v), endpoints excluded, reported at the 1e9 scale.
    *
    * Rows-only (the depth-peeled backward recurrence has no fixed
    * relational unrolling — depth is data-dependent); gated by
    * equality with an independent straight-Scala Brandes running the
    * identical integer recurrence, plus a hand-checked planted graph.
    *
    * Scale shape: both phases are per-depth equi-joins on (s, node)
    * / edge endpoints, co-partitionable; state is the |S|×|V|
    * shortest-path DAG (S is the sampling knob); lineage truncated
    * per depth.
    *
    * Choosing `srcMod`: same contract as
    * [[harmonicCentralityTransform]] — cost linear in 1/srcMod,
    * error O(1/√|S|) (Brandes & Pich 2007); the GraphSpec
    * sampling-adequacy gate anchors the sampled heads (srcMod 3 and
    * 2) against the exact srcMod=1 ranking — the check to re-run at
    * your density on a new graph shape. */
  def betweennessTransform(pairs: DataFrame, srcMod: Long = 3L,
                           maxHops: Int = 8, scale: Long = 1000000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = truncateLineage(pairs)
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(shuffleKey, "8")
    spark.conf.set(aqeKey, "false")
    val edges = p.select($"item_a".as("src"), $"item_b".as("dst"))
      .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst")))
      .persist()
    try {
      val seeds = edges.select($"src".as("s")).distinct()
        .filter($"s" % srcMod === 0L)
      // ---- forward: BFS with path counts ----
      var visited = truncateLineage(
        seeds.select($"s", $"s".as("node"), lit(0L).as("d"), lit(1L).as("sigma")))
      var frontier = visited
      var depth = 0
      var drained = false
      while (depth < maxHops && !drained) {
        val t = depth + 1
        val next = truncateLineage(frontier
          .join(edges, $"node" === $"src")
          .select($"s", $"dst".as("node"), $"sigma")
          .join(visited.select($"s", $"node"), Seq("s", "node"), "left_anti")
          .groupBy($"s", $"node")
          .agg(sum($"sigma").as("sigma"))
          .select($"s", $"node", lit(t.toLong).as("d"), $"sigma"))
        if (next.isEmpty) drained = true
        else {
          visited = truncateLineage(visited.unionByName(next))
          frontier = next
          depth = t
        }
      }
      // ---- backward: dependency accumulation, deepest level first ----
      val maxD = depth
      // delta table starts all-zero at the deepest level; each pass
      // computes delta for level t-1 from level t and accrues output
      var delta = truncateLineage(visited.filter($"d" === maxD.toLong)
        .select($"s", $"node", lit(0L).as("delta")))
      val contribs = scala.collection.mutable.ListBuffer.empty[DataFrame]
      for (t <- maxD to 1 by -1) {
        val w = visited.filter($"d" === t.toLong)
          .join(delta, Seq("s", "node"), "left")
          .na.fill(0L, Seq("delta"))
          .select($"s".as("ws"), $"node".as("w_node"),
            $"sigma".as("w_sigma"), $"delta".as("w_delta"))
        val v = visited.filter($"d" === (t - 1).toLong)
          .select($"s", $"node".as("v_node"), $"sigma".as("v_sigma"))
        val nextDelta = truncateLineage(v
          .join(edges, $"v_node" === $"src")
          .join(w, $"s" === $"ws" && $"dst" === $"w_node")
          .select($"s", $"v_node".as("node"),
            expr(s"(v_sigma * ($scale + w_delta)) div w_sigma").as("c"))
          .groupBy($"s", $"node")
          .agg(sum($"c").as("delta")))
        contribs += nextDelta
        delta = nextDelta
      }
      if (contribs.isEmpty)
        spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(
            "item BIGINT, betweenness_x9 BIGINT"))
      else contribs.reduce(_ unionByName _)
        .filter($"node" =!= $"s") // Brandes excludes the source itself
        .groupBy($"node".as("item"))
        .agg(sum($"delta").as("betweenness_x9"))
        .filter($"betweenness_x9" > 0L)
        .orderBy($"betweenness_x9".desc, $"item")
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(aqeKey, prevAqe)
      edges.unpersist()
    }
  }

  def betweennessItems(spark: SparkSession, dir: String): DataFrame =
    betweennessTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[harmonicCentralityTransform]] — BFS rounds
    * unrolled MATERIALIZED with EXCEPT as the first-arrival guard.
    * The oracle always unrolls the full `maxHops`; rounds past the
    * drain point add nothing (empty EXCEPT), matching the Spark
    * loop's early exit. */
  def harmonicCentralityOracleSql(srcMod: Long = 3L, maxHops: Int = 8): String = {
    val rounds = (1 to maxHops).map { t =>
      s"""n$t AS MATERIALIZED (
         |  SELECT s, node FROM (
         |    SELECT DISTINCT f.s, e.dst AS node
         |    FROM f${t - 1} f JOIN edges e ON e.src = f.node)
         |  EXCEPT SELECT s, node FROM b${t - 1}),
         |b$t AS MATERIALIZED (SELECT s, node, d FROM b${t - 1}
         |  UNION ALL SELECT s, node, CAST($t AS BIGINT) FROM n$t),
         |f$t AS (SELECT s, node FROM n$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |edges AS MATERIALIZED (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |seeds AS (SELECT DISTINCT src AS s FROM edges WHERE src % $srcMod = 0),
       |b0 AS MATERIALIZED (SELECT s, s AS node, CAST(0 AS BIGINT) AS d FROM seeds),
       |f0 AS (SELECT s, node FROM b0),
       |$rounds
       |SELECT node AS item, CAST(count(*) AS BIGINT) AS n_sources,
       |       CAST(sum(1000000 // d) AS BIGINT) AS harmonic_1e6
       |FROM b$maxHops WHERE d > 0
       |GROUP BY node ORDER BY harmonic_1e6 DESC, item""".stripMargin
  }

  /** DuckDB oracle for [[randomWalksTransform]] — identical neighbor
    * indexing and mixing hash, steps unrolled MATERIALIZED. */
  def randomWalksOracleSql(walksPerNode: Int = 2, walkLen: Int = 5): String = {
    val rounds = (1 to walkLen).map { t =>
      s"""w$t AS MATERIALIZED (SELECT p.walk_id, e.dst AS node
         |  FROM w${t - 1} p JOIN e
         |    ON e.src = p.node
         |   AND e.idx = (p.walk_id * 1000003 + $t * 8191 + p.node * 131) % e.deg)"""
        .stripMargin
    }.mkString(",\n")
    val unions = (0 to walkLen).map(t =>
      s"SELECT walk_id, CAST($t AS BIGINT) AS step, node FROM w$t").mkString("\nUNION ALL\n")
    s"""WITH $edgeCtes,
       |edges AS MATERIALIZED (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |e AS MATERIALIZED (SELECT src, dst,
       |       row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
       |       count(*) OVER (PARTITION BY src) AS deg
       |     FROM edges),
       |w0 AS MATERIALIZED (SELECT node * $walksPerNode + r AS walk_id, node
       |  FROM (SELECT DISTINCT src AS node FROM e)
       |  CROSS JOIN (SELECT unnest(range(0, $walksPerNode)) AS r)),
       |$rounds
       |SELECT walk_id, step, node FROM ($unions)
       |ORDER BY walk_id, step""".stripMargin
  }

  /** DuckDB oracle for [[pprTransform]] — the identical integer
    * rounds unrolled, with the seed-base union inside each round so
    * un-fed seeds survive. Every round (and the shared seeds/deg/
    * edges basis) is `AS MATERIALIZED`: the union-subquery reference
    * pattern triggers the same exponential plain-CTE inlining the
    * [[lpaOracleSql]] comment documents — the un-materialized form
    * ran minutes at sf0.01, materialized 0.08 s. */
  def pprOracleSql(iters: Int = 10, scale: Long = 1000000000L,
                   seedMod: Long = 5L): String = {
    val base = 15L * scale / 100L
    val rounds = (1 to iters).map { i =>
      s"""ppr$i AS MATERIALIZED (SELECT item, CAST(SUM(s) AS BIGINT) AS score FROM (
         |  SELECT item, CAST($base AS BIGINT) AS s FROM seeds
         |  UNION ALL
         |  SELECT e.dst AS item, (85 * SUM(p.score // d.deg)) // 100 AS s
         |  FROM ppr${i - 1} p
         |  JOIN deg d ON p.item = d.item
         |  JOIN edges e ON e.src = p.item
         |  GROUP BY e.dst) GROUP BY item)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |edges AS MATERIALIZED (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |deg AS MATERIALIZED (SELECT src AS item, count(*) AS deg FROM edges GROUP BY 1),
       |seeds AS MATERIALIZED (SELECT DISTINCT item FROM deg WHERE item % $seedMod = 0),
       |ppr0 AS (SELECT item, CAST($scale AS BIGINT) AS score FROM seeds),
       |$rounds
       |SELECT item, score AS ppr_score FROM ppr$iters
       |ORDER BY ppr_score DESC, item""".stripMargin
  }

  /** DuckDB oracle for [[katzTransform]] — the identical integer
    * rounds unrolled (the [[pagerankOracleSql]] pattern). */
  def katzOracleSql(iters: Int = 8, scale: Long = 1000000000L): String = {
    val rounds = (1 to iters).map { i =>
      s"""k$i AS (SELECT e.dst AS item,
         |  CAST($scale + SUM(p.score) // 64 AS BIGINT) AS score
         |  FROM k${i - 1} p
         |  JOIN edges e ON e.src = p.item
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |edges AS (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |k0 AS (SELECT DISTINCT src AS item, CAST($scale AS BIGINT) AS score FROM edges),
       |$rounds
       |SELECT item, score AS katz_score FROM k$iters
       |ORDER BY katz_score DESC, item""".stripMargin
  }

  /** Triangle participation counts with DEGREE-ORDERED orientation
    * (Suri & Vassilvitskii 2011, "Counting triangles and the curse of
    * the last reducer"): each undirected edge is directed from its
    * endpoint with the smaller `(deg, id)` key, so wedges pivot on
    * the triangle's lowest-degree vertex. A hub of degree d then
    * builds wedges only from its few OUT-edges (≤ its lower-degree
    * neighbors), not d² — the skew guard that keeps the wedge join
    * from melting the partition holding the most popular item. Each
    * triangle is emitted exactly once (its minimum-key vertex is the
    * unique pivot), then per-node counts come from a 3-way unpivot of
    * the triangle list.
    *
    * Scale shape: orientation is two broadcast-or-co-partitioned
    * joins against the (item, deg) table; the wedge self-join keys on
    * the pivot id; the closing-edge probe keys on `(src, dst)` — all
    * id-only rows, all map-side combinable into the final count.
    */
  def triangleTransform(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // materialize the edge list once — it is referenced by deg (twice
    // via the unpivot), the orientation join, both wedge sides, and
    // the closing-edge probe; without the cut the upstream
    // co-engagement aggregation would re-execute for each reference
    val e = truncateLineage(pairs.select($"item_a".as("a"), $"item_b".as("b")))
    val deg = e.select($"a".as("item")).unionByName(e.select($"b".as("item")))
      .groupBy($"item").agg(count(lit(1)).as("deg"))
    // orientation key (deg, id): lexicographic struct comparison
    val withDeg = e
      .join(deg.withColumnsRenamed(Map("item" -> "a", "deg" -> "deg_a")), "a")
      .join(deg.withColumnsRenamed(Map("item" -> "b", "deg" -> "deg_b")), "b")
    val keyA = struct($"deg_a".as("d"), $"a".as("i"))
    val keyB = struct($"deg_b".as("d"), $"b".as("i"))
    val aFirst = keyA < keyB
    val oriented = withDeg.select(
      when(aFirst, $"a").otherwise($"b").as("src"),
      when(aFirst, $"b").otherwise($"a").as("dst"),
      when(aFirst, keyB).otherwise(keyA).as("dst_key"))
    // wedges around the pivot, canonicalized so (w1, w2) is ordered by key;
    // the closing edge, if present, is oriented w1 -> w2 by construction
    val o1 = oriented.select($"src", $"dst".as("w1"), $"dst_key".as("k1"))
    val o2 = oriented.select($"src", $"dst".as("w2"), $"dst_key".as("k2"))
    val wedges = o1.join(o2, Seq("src")).filter($"k1" < $"k2")
    val closing = oriented.select($"src".as("w1"), $"dst".as("w2"))
    val tri = wedges.join(closing, Seq("w1", "w2")).select($"src".as("a"), $"w1".as("b"), $"w2".as("c"))
    tri.select($"a".as("item"))
      .unionByName(tri.select($"b".as("item")))
      .unionByName(tri.select($"c".as("item")))
      .groupBy($"item").agg(count(lit(1)).as("n_triangles"))
      .orderBy($"n_triangles".desc, $"item")
  }

  def triangleCount(spark: SparkSession, dir: String): DataFrame =
    triangleTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** Directed item-transition edge list for [[hitsScores]]: within
    * each user's timeline, an edge `prev_item → item` per successive
    * engagement with different items, aggregated to transition counts
    * and cut to the top-`topEdges` by `(n DESC, src, dst)` — the same
    * determinism/scale rationale as [[edgeTransform]], but DIRECTED
    * (temporal order carries the direction PageRank's co-engagement
    * graph deliberately discards).
    */
  def transitionEdges(events: DataFrame, topEdges: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .select($"user_id", $"ts", $"event_id",
        get_json_object($"props", "$.k").cast("long").as("item"))
      .withColumn("prev", lag($"item", 1).over(w))
      .filter($"prev".isNotNull && $"prev" =!= $"item")
      .groupBy($"prev".as("src"), $"item".as("dst"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"src", $"dst")
      .limit(topEdges)
      .select($"src", $"dst")
  }

  /** HITS hubs & authorities (Kleinberg 1999) in exact integer
    * arithmetic with MAX-normalization: per round,
    * {{{ h'(u) = Σ_{u→v} a(v);  h(u) = h'(u)·scale div max(h')
    *     a'(v) = Σ_{u→v} h(u);  a(v) = a'(v)·scale div max(a') }}}
    * — max-normalization (instead of the textbook L2) keeps every
    * step in order-independent Long arithmetic, so the result is
    * bit-reproducible and the DuckDB oracle unrolls the identical
    * recurrence. The link-analysis complement of [[pagerankTransform]]
    * on the DIRECTED graph: items that lead engagement sessions score
    * as hubs, items sessions converge on score as authorities.
    *
    * Overflow headroom: Σa ≤ outdeg·scale and the normalization
    * multiplies by scale before dividing, so scale = 10⁶ keeps
    * `outdeg·scale²` under Long.Max up to ~9·10⁶ out-degree.
    * Same iteration discipline as PageRank: edges/nodes persisted,
    * AQE + shuffle width pinned for the loop, lineage cut every
    * fourth round, nodes with no in/out edges keep score 0 via the
    * left join (they stay in the output — the hub-less authority and
    * authority-less hub are meaningful readings).
    */
  def hitsTransform(edges0: DataFrame, iters: Int = 5, scale: Long = 1000000L): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(shuffleKey, "8")
    spark.conf.set(aqeKey, "false")
    val edges = truncateLineage(edges0.select($"src", $"dst")).persist()
    val nodes = edges.select($"src".as("item"))
      .unionByName(edges.select($"dst".as("item"))).distinct().persist()
    try {
      var hub = truncateLineage(nodes.select($"item", lit(scale).as("s")))
      var auth = hub
      // Each half-step is materialized: `full` feeds BOTH the max
      // aggregate and the normalized projection (a diamond), so an
      // un-cut round would re-reference the prior round's subtree
      // ~4x — the exponential-plan trap star contraction hit, which
      // PageRank's single-reference rounds dodge. The eager cut per
      // half-step bounds the plan AND keeps execution in this scope.
      for (i <- 1 to iters) {
        def halfStep(score: DataFrame, joinOn: String, groupOn: String): DataFrame = {
          val raw = edges.join(score, edges(joinOn) === score("item"))
            .groupBy(col(groupOn).as("item")).agg(sum($"s").as("raw"))
          val full = truncateLineage(nodes.join(raw, Seq("item"), "left")
            .select($"item", coalesce($"raw", lit(0L)).as("raw")))
          // the normalizer is ONE value and the next round's plan needs
          // it — planning metadata, not data (the percentile_stats /
          // CC-probe pattern): collected from the checkpointed rows and
          // baked in as a literal, instead of a per-half-step broadcast
          // exchange + nested-loop join (14.5 s → ~7 s at sf0.1)
          val mx = math.max(full.agg(max($"raw")).collect()(0).getLong(0), 1L)
          full.select($"item", expr(s"(raw * $scale) div ${mx}L").as("s"))
        }
        hub = halfStep(auth, joinOn = "dst", groupOn = "src")
        auth = halfStep(hub, joinOn = "src", groupOn = "dst")
      }
      hub.withColumnRenamed("s", "hub")
        .join(auth.withColumnRenamed("s", "authority"), Seq("item"))
        .orderBy($"authority".desc, $"item")
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(aqeKey, prevAqe)
      edges.unpersist()
      nodes.unpersist()
    }
  }

  def hitsScores(spark: SparkSession, dir: String): DataFrame =
    hitsTransform(transitionEdges(Tables.events(spark, dir), topEdges = 1500))

  /** HITS oracle: identical integer recurrence unrolled to chained
    * CTEs (SQL-generation-time loop, like [[pagerankOracleSql]]) —
    * every multi-referenced CTE is `AS MATERIALIZED`, because DuckDB
    * inlines plain CTEs per reference and each round references the
    * prior one several times (max + projection): the inlined tree is
    * exponential in rounds, the materialized one linear. The Spark
    * side dodges the same trap with an eager cut per half-step. */
  def hitsOracleSql(iters: Int = 5, scale: Long = 1000000L, topEdges: Int = 1500): String = {
    val rounds = (1 to iters).map { i =>
      s"""hraw$i AS MATERIALIZED (SELECT n.item, coalesce(CAST(sum(a.s) AS BIGINT), 0) AS raw
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.src = n.item
         |  LEFT JOIN a${i - 1} a ON a.item = e.dst
         |  GROUP BY n.item),
         |hmax$i AS (SELECT greatest(max(raw), 1) AS mx FROM hraw$i),
         |h$i AS MATERIALIZED (SELECT item, CAST((raw * $scale) // mx AS BIGINT) AS s FROM hraw$i, hmax$i),
         |araw$i AS MATERIALIZED (SELECT n.item, coalesce(CAST(sum(h.s) AS BIGINT), 0) AS raw
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.item
         |  LEFT JOIN h$i h ON h.item = e.src
         |  GROUP BY n.item),
         |amax$i AS (SELECT greatest(max(raw), 1) AS mx FROM araw$i),
         |a$i AS MATERIALIZED (SELECT item, CAST((raw * $scale) // mx AS BIGINT) AS s FROM araw$i, amax$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
       |                   TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
       |            FROM events),
       |o AS (SELECT item, lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev),
       |t AS (SELECT prev AS src, item AS dst, count(*) AS n FROM o
       |      WHERE prev IS NOT NULL AND prev != item GROUP BY 1, 2),
       |edges AS MATERIALIZED (SELECT src, dst FROM t ORDER BY n DESC, src, dst LIMIT $topEdges),
       |nodes AS MATERIALIZED (SELECT src AS item FROM edges UNION SELECT dst FROM edges),
       |a0 AS MATERIALIZED (SELECT item, CAST($scale AS BIGINT) AS s FROM nodes),
       |$rounds
       |SELECT h$iters.item, h$iters.s AS hub, a$iters.s AS authority
       |FROM h$iters JOIN a$iters ON h$iters.item = a$iters.item
       |ORDER BY authority DESC, h$iters.item""".stripMargin
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with a
    * DETERMINISTIC vote: every node starts labeled with its own id;
    * each round every node adopts the label most frequent among its
    * neighbors, ties broken by MINIMUM label — so the whole run is a
    * pure function of the edge list (textbook LPA breaks ties
    * randomly and is run-to-run unstable; the min-label rule keeps
    * the result hash-comparable against an independent engine).
    * Fixed iteration count, like [[pagerankTransform]]: synchronous
    * LPA can 2-cycle on bipartite structures, and a fixed unrolled
    * recurrence is what the oracle can re-express — convergence
    * detection would add a per-round driver round-trip for nothing.
    *
    * Per round: one co-partitioned join (labels ⋈ edges on src), one
    * map-side-combinable vote count on (dst, label), one window
    * row_number over dst — all id-scale rows. Same iteration
    * discipline as PageRank: conf-scoped shuffle width + AQE,
    * lineage cut every fourth round (single-reference rounds — the
    * plan grows linearly), persisted edge list.
    *
    * Output: every node with its community label and the community
    * size — "which items cluster" (the leaderboard follow-up ask),
    * answered without a second pass.
    */
  def lpaTransform(pairs: DataFrame, iters: Int = 5): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevShuffle = spark.conf.get(shuffleKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(shuffleKey, "8")
    spark.conf.set(aqeKey, "false")
    val p = truncateLineage(pairs)
    val edges = p.select($"item_a".as("src"), $"item_b".as("dst"))
      .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst")))
      .persist()
    try {
      var labels = truncateLineage(
        edges.select($"src".as("item")).distinct().select($"item", $"item".as("label")))
      val byVotes = org.apache.spark.sql.expressions.Window
        .partitionBy($"item").orderBy($"n".desc, $"label")
      for (i <- 1 to iters) {
        val votes = edges.join(labels, edges("src") === labels("item"))
          .groupBy($"dst", $"label").agg(count(lit(1)).as("n"))
        val next = votes.select($"dst".as("item"), $"label", $"n")
          .withColumn("rk", row_number().over(byVotes))
          .filter($"rk" === 1)
          .select($"item", $"label")
        labels = if (i % 4 == 0 || i == iters) truncateLineage(next) else next
      }
      val sizes = labels.groupBy($"label").agg(count(lit(1)).as("community_size"))
      labels.join(sizes, "label")
        .select($"item", $"label".as("community"), $"community_size")
        .orderBy($"item")
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(aqeKey, prevAqe)
      edges.unpersist()
    }
  }

  def communitiesLpa(spark: SparkSession, dir: String): DataFrame =
    lpaTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** Newman modularity of the LPA partition — the single number that
    * says whether [[lpaTransform]]'s communities are real structure
    * or noise (Q ≈ 0 means the partition explains nothing beyond
    * degree; Q ≳ 0.3 is conventionally "has community structure").
    * Exact integer form: Q·(2m)² = 4·m·E_in − Σ_c K_c², where E_in =
    * within-community edges, K_c = total degree per community — every
    * term an integer on the capped graph (DECIMAL(38,0) carries the
    * K² sum; the single float is the final division).
    *
    * Shape: one LPA run (the communities_lpa cost), then degree /
    * per-community rollups and one labeled-edge pass — all id-scale;
    * the three one-row aggregates combine via broadcast. */
  def graphModularityTransform(pairs: DataFrame, iters: Int = 5): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = truncateLineage(pairs.select($"item_a", $"item_b"))
    val labels = lpaTransform(p, iters).select($"item", $"community")
    val deg = p.select($"item_a".as("item")).unionByName(p.select($"item_b".as("item")))
      .groupBy($"item").agg(count(lit(1)).as("k"))
    val k2 = deg.join(labels, Seq("item"))
      .groupBy($"community").agg(sum($"k").as("kc"))
      .agg(sum(expr("CAST(kc AS DECIMAL(38,0)) * kc")).as("sum_k2"),
        count(lit(1)).as("n_communities"))
    val ein = p
      .join(labels.select($"item".as("item_a"), $"community".as("ca")), Seq("item_a"))
      .join(labels.select($"item".as("item_b"), $"community".as("cb")), Seq("item_b"))
      .agg(sum(when($"ca" === $"cb", 1L).otherwise(0L)).as("e_in"),
        count(lit(1)).as("m"))
    ein.crossJoin(broadcast(k2))
      .select($"n_communities", $"m".as("n_edges"), $"e_in",
        expr("CAST(CAST(4 AS DECIMAL(38,0)) * m * e_in - sum_k2 AS BIGINT)").as("q_num"),
        expr("round(CAST(CAST(4 AS DECIMAL(38,0)) * m * e_in - sum_k2 AS DOUBLE) " +
          "/ (CAST(2 * m AS DOUBLE) * (2 * m)), 6)").as("modularity"))
  }

  def graphModularity(spark: SparkSession, dir: String): DataFrame =
    graphModularityTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[graphModularityTransform]] — the lpa rounds
    * of [[lpaOracleSql]] plus the exact-integer Q. */
  def graphModularityOracleSql(iters: Int = 5): String = {
    val rounds = (1 to iters).map { i =>
      s"""votes$i AS (SELECT e.dst AS item, l.label, count(*) AS n
         |  FROM edges e JOIN lab${i - 1} l ON l.item = e.src
         |  GROUP BY 1, 2),
         |lab$i AS MATERIALIZED (SELECT item, label FROM (
         |  SELECT item, label, row_number() OVER (PARTITION BY item ORDER BY n DESC, label) AS rk
         |  FROM votes$i) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |edges AS MATERIALIZED (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |lab0 AS MATERIALIZED (SELECT DISTINCT src AS item, src AS label FROM edges),
       |$rounds,
       |deg AS (SELECT item, count(*) AS k
       |        FROM (SELECT item_a AS item FROM pairs
       |              UNION ALL SELECT item_b FROM pairs) GROUP BY 1),
       |k2 AS (SELECT sum(CAST(kc AS HUGEINT) * kc) AS sum_k2,
       |              count(*) AS n_communities
       |       FROM (SELECT l.label, sum(d.k) AS kc
       |             FROM lab$iters l JOIN deg d ON d.item = l.item GROUP BY 1)),
       |ein AS (SELECT sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS e_in,
       |               count(*) AS m
       |        FROM pairs p JOIN lab$iters la ON la.item = p.item_a
       |                     JOIN lab$iters lb ON lb.item = p.item_b)
       |SELECT CAST(n_communities AS BIGINT) AS n_communities,
       |       CAST(m AS BIGINT) AS n_edges, CAST(e_in AS BIGINT) AS e_in,
       |       CAST(4 * CAST(m AS HUGEINT) * e_in - sum_k2 AS BIGINT) AS q_num,
       |       round(CAST(4 * CAST(m AS HUGEINT) * e_in - sum_k2 AS DOUBLE)
       |             / (CAST(2 * m AS DOUBLE) * (2 * m)), 6) AS modularity
       |FROM ein, k2""".stripMargin
  }

  /** k-core decomposition (Seidman 1983; distributed peeling as in
    * Montresor et al. 2013) of the co-engagement graph: each node's
    * core number = the largest k such that it survives in a subgraph
    * where every node has degree ≥ k. THE graph-robustness screen
    * next to [[degreeHistogramTransform]] (degree says how connected
    * a node is, core says how connected its NEIGHBORHOOD stays).
    *
    * Algorithm: the h-index LOCALITY iteration of Montresor et al.
    * 2013 (also Lü et al. 2016), not the k-by-k peel. Each node
    * holds a core estimate c(v), initialized to its degree; every
    * round re-estimates c'(v) = H({c(u) : u ∈ N(v)}) — the h-index
    * of its neighbors' estimates (the largest h such that ≥ h
    * neighbors claim ≥ h). Estimates decrease monotonically from the
    * degree upper bound and converge to the EXACT core numbers
    * (Montresor et al., Thm 1), so the output is deterministic with
    * no tie policy. Chosen over the peel for JOB COUNT: the peel
    * schedules one sequential Spark job per (k, wave) step — Σ_k
    * peel-depth jobs (~35 on the capped sf0.1 graph, 16–18 s of
    * almost pure scheduling) — while the locality iteration needs
    * one job per ROUND and converges in O(max peel depth at the
    * binding k) rounds (≤ 6 observed on the same graph). Per round:
    * one edges⋈estimates broadcast join, one map-side-combinable
    * groupBy(node) collecting the ≤ degree-capped neighbor-estimate
    * list, the h-index as a codegen'd zip_with/filter/size chain,
    * and one checkpointed (old ∪ new) frame whose cached partitions
    * answer BOTH the convergence probe (changed-row count, sub-ms)
    * and next round's input — no separate lineage-cut jobs. The
    * collect_list is bounded by the co-engagement degree cap, the
    * same bound every LSH-style kernel here rides. No SQL oracle
    * (the round count is data-dependent — not a fixed unrolled CTE
    * like LPA's); rows-only, property-specced against a
    * straight-Scala peeling reference on random graphs.
    */
  def kCoreTransform(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = truncateLineage(pairs)
    val edges = truncateLineage(
      p.select($"item_a".as("src"), $"item_b".as("dst"))
        .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst"))))
    // h-index of a DESC-sorted estimate list: #positions i (1-based)
    // with cs[i-1] ≥ i. Every node here has ≥ 1 edge, so cs is
    // never empty and sequence(1, size) is well-formed.
    def hIndex(cs: Column): Column =
      size(filter(
        zip_with(sort_array(cs, asc = false),
          sequence(lit(1L), size(cs).cast("long")),
          (c, i) => c >= i),
        x => x))
    var est = truncateLineage(
      edges.groupBy($"src".as("item")).agg(count(lit(1)).as("c")))
    var changed = 1L
    while (changed > 0) {
      val nb = edges.join(
        est.select($"item".as("dst"), $"c".as("cd")), Seq("dst"))
      val next = nb.groupBy($"src".as("item"))
        .agg(hIndex(collect_list($"cd")).cast("long").as("c_new"))
      // one materialization per round: (old, new) side by side — the
      // changed-count probe and next round's estimates both read the
      // cached partitions
      val joined = truncateLineage(
        est.join(next, Seq("item")).select($"item", $"c", $"c_new"))
      changed = joined.filter($"c_new" =!= $"c").count()
      est = joined.select($"item", $"c_new".as("c"))
    }
    est.select($"item", $"c".as("core")).orderBy($"item")
  }

  def kCoreItems(spark: SparkSession, dir: String): DataFrame =
    kCoreTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** Degree distribution of the co-engagement graph — the
    * structure-health report read BEFORE running any iterative
    * algorithm here (a power-law degree table says whether PageRank
    * iterations or the LSH-style guards are the binding cost): per
    * degree value, how many items have it.
    *
    * Shape: symmetric edge union → per-node degree count → per-degree
    * node count, both map-side combinable aggregates on planning-scale
    * edge rows; output is ≤ max-degree rows.
    */
  def degreeHistogramTransform(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(pairs.select(col("item_b").as("src"), col("item_a").as("dst")))
    edges.groupBy(col("src"))
      .agg(count(lit(1)).as("degree"))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("degree"))
  }

  def degreeHistogram(spark: SparkSession, dir: String): DataFrame =
    degreeHistogramTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[degreeHistogramTransform]] over the shared
    * edge basis. */
  def degreeHistogramOracleSql: String =
    s"""WITH $edgeCtes,
       |edges AS (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1)
       |SELECT degree, count(*) AS n_items FROM deg GROUP BY 1 ORDER BY degree""".stripMargin

  /** Power-law fit of the degree distribution — "is this a
    * scale-free graph and how heavy is the tail": OLS of log n(d) on
    * log d over [[degreeHistogramTransform]]'s histogram points, on
    * the 1e-6-quantized integer grid (the zipf_slope discipline —
    * exact integer sums, floats only in the final division). A slope
    * α in (−2, −3) is the classic scale-free band; flatter means
    * hub-dominated, steeper means near-regular.
    *
    * Shape: the histogram is degree-scale (≤ max-degree rows); the
    * regression is a one-row aggregate. */
  def degreePowerlawFitTransform(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val pts = degreeHistogramTransform(pairs)
      .select(expr("CAST(round(ln(degree) * 1000000) AS BIGINT)").as("x"),
        expr("CAST(round(ln(n_items) * 1000000) AS BIGINT)").as("y"))
    pts.agg(count(lit(1)).as("n_points"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .select($"n_points",
        expr("""round((n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
                      (n_points * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 4)""")
          .as("alpha"),
        expr("""round((CAST(sy AS DOUBLE) / n_points / 1e6) -
                      ((n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
                       (n_points * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)) *
                      (CAST(sx AS DOUBLE) / n_points / 1e6), 4)""")
          .as("log_c"))
  }

  def degreePowerlawFit(spark: SparkSession, dir: String): DataFrame =
    degreePowerlawFitTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[degreePowerlawFitTransform]] — the degree
    * histogram CTEs + the quantized OLS. */
  def degreePowerlawFitOracleSql: String =
    s"""WITH $edgeCtes,
       |edges AS (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1),
       |h AS (SELECT degree, count(*) AS n_items FROM deg GROUP BY 1),
       |p AS (SELECT CAST(round(ln(degree) * 1000000) AS BIGINT) AS x,
       |             CAST(round(ln(n_items) * 1000000) AS BIGINT) AS y
       |      FROM h)
       |SELECT count(*) AS n_points,
       |       round((count(*) * CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(y)) /
       |             (count(*) * CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(x)), 4) AS alpha,
       |       round((CAST(sum(y) AS DOUBLE) / count(*) / 1e6) -
       |             ((count(*) * CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(y)) /
       |              (count(*) * CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(x))) *
       |             (CAST(sum(x) AS DOUBLE) / count(*) / 1e6), 4) AS log_c
       |FROM p""".stripMargin

  /** Link prediction on the co-engagement graph: for every
    * NON-adjacent item pair, the Jaccard coefficient of their
    * neighbour sets — |Γa∩Γb| / |Γa∪Γb| (Liben-Nowell & Kleinberg
    * 2003's strongest simple baseline) — top-N predicted edges. The
    * "which items WILL co-engage next" read that completes the graph
    * family: PageRank ranks nodes, LPA groups them, this scores the
    * missing edges.
    *
    * Fully integer pipeline: common-neighbour counts from the wedge
    * join (both legs of the symmetric edge list joined on the
    * centre node — the SAME shape as [[triangleCountTransform]]'s
    * candidate join, bounded by Σdeg² wedges, never |V|²), degrees
    * as a planning-scale broadcast, existing edges removed by LEFT
    * ANTI on the canonical (a < b) pair, score = truncating
    * `n_common·10⁴ div (deg_a + deg_b − n_common)` so no float ever
    * ranks, and the top-N cut runs under the TOTAL order
    * (bp DESC, item_a, item_b).
    */
  def linkPredictionTransform(pairs: DataFrame, topN: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = truncateLineage(pairs)
    val edges = p.select($"item_a".as("src"), $"item_b".as("dst"))
      .unionByName(p.select($"item_b".as("src"), $"item_a".as("dst")))
    val deg = edges.groupBy($"src".as("item")).agg(count(lit(1)).as("deg"))
    val common = edges.select($"src".as("u"), $"dst".as("a"))
      .join(edges.select($"src".as("u2"), $"dst".as("b")),
        $"u" === $"u2" && $"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_common"))
    common
      .join(p.select($"item_a".as("a"), $"item_b".as("b")), Seq("a", "b"), "left_anti")
      .join(broadcast(deg.select($"item".as("a"), $"deg".as("deg_a"))), Seq("a"))
      .join(broadcast(deg.select($"item".as("b"), $"deg".as("deg_b"))), Seq("b"))
      .select($"a".as("item_a"), $"b".as("item_b"), $"n_common", $"deg_a", $"deg_b",
        expr("CAST(n_common * 10000 div (deg_a + deg_b - n_common) AS BIGINT)").as("jaccard_bp"))
      .orderBy($"jaccard_bp".desc, $"item_a", $"item_b")
      .limit(topN)
  }

  def linkPrediction(spark: SparkSession, dir: String): DataFrame =
    linkPredictionTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[linkPredictionTransform]] over the shared
    * edge basis — same integer score, same total-order cut. */
  def linkPredictionOracleSql(topN: Int = 50): String =
    s"""WITH $edgeCtes,
       |edges AS (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |deg AS (SELECT src AS item, count(*) AS deg FROM edges GROUP BY 1),
       |common AS (
       |  SELECT e1.dst AS a, e2.dst AS b, count(*) AS n_common
       |  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
       |  GROUP BY 1, 2),
       |nonadj AS (
       |  SELECT c.* FROM common c
       |  LEFT JOIN pairs p ON c.a = p.item_a AND c.b = p.item_b
       |  WHERE p.item_a IS NULL)
       |SELECT a AS item_a, b AS item_b, n_common, da.deg AS deg_a, db.deg AS deg_b,
       |       CAST(n_common * 10000 // (da.deg + db.deg - n_common) AS BIGINT) AS jaccard_bp
       |FROM nonadj JOIN deg da ON a = da.item JOIN deg db ON b = db.item
       |ORDER BY jaccard_bp DESC, item_a, item_b
       |LIMIT $topN""".stripMargin

  /** Shared edge-list CTE text for the DuckDB oracles — the SQL twin
    * of [[edgeTransform]] (same maxItems = 50, topEdges = 800, same
    * total order on the cut).
    */
  private val edgeCtes: String =
    """items AS (SELECT DISTINCT user_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item FROM events),
      |kept AS (SELECT i.* FROM items i
      |         JOIN (SELECT user_id, count(*) AS n_items FROM items GROUP BY 1) c
      |           ON i.user_id = c.user_id AND c.n_items <= 50),
      |cooc AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_users
      |         FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
      |         GROUP BY 1, 2),
      |pairs AS (SELECT item_a, item_b FROM cooc ORDER BY n_users DESC, item_a, item_b LIMIT 800)""".stripMargin

  /** PageRank oracle: the identical integer recurrence, unrolled to
    * `iters` chained CTEs (no recursive CTE needed — the iteration
    * count is fixed, so the loop unrolls at SQL-generation time).
    * `SUM` over BIGINT widens to HUGEINT in DuckDB; the explicit CAST
    * narrows each round back to BIGINT so pandas sees int64, matching
    * Spark's Long.
    */
  def pagerankOracleSql(iters: Int = 10, scale: Long = 1000000000L): String = {
    val base = 15L * scale / 100L
    val rounds = (1 to iters).map { i =>
      s"""pr$i AS (SELECT e.dst AS item,
         |  CAST($base + (85 * SUM(p.score // d.deg)) // 100 AS BIGINT) AS score
         |  FROM pr${i - 1} p
         |  JOIN deg d ON p.item = d.item
         |  JOIN edges e ON e.src = p.item
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |edges AS (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |deg AS (SELECT src AS item, count(*) AS deg FROM edges GROUP BY 1),
       |pr0 AS (SELECT item, CAST($scale AS BIGINT) AS score FROM deg),
       |$rounds
       |SELECT item, score AS pr_score FROM pr$iters ORDER BY pr_score DESC, item""".stripMargin
  }

  /** Triangle oracle: the NAIVE id-ordered triple join — per-node
    * triangle counts are algorithm-independent, so the oracle need
    * not (and deliberately does not) mirror the degree orientation;
    * it independently derives the same set.
    */
  def triangleOracleSql(): String =
    s"""WITH $edgeCtes,
       |tri AS (SELECT e1.item_a AS a, e1.item_b AS b, e2.item_b AS c
       |        FROM pairs e1
       |        JOIN pairs e2 ON e2.item_a = e1.item_a AND e2.item_b > e1.item_b
       |        JOIN pairs e3 ON e3.item_a = e1.item_b AND e3.item_b = e2.item_b)
       |SELECT item, count(*) AS n_triangles
       |FROM (SELECT a AS item FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
       |GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin

  /** LPA oracle: the identical deterministic recurrence unrolled to
    * chained CTEs (the [[hitsOracleSql]] pattern) — every label table
    * is `AS MATERIALIZED` because each round's vote join references
    * the prior round, and DuckDB inlines plain CTEs per reference. */
  def lpaOracleSql(iters: Int = 5): String = {
    val rounds = (1 to iters).map { i =>
      s"""votes$i AS (SELECT e.dst AS item, l.label, count(*) AS n
         |  FROM edges e JOIN lab${i - 1} l ON l.item = e.src
         |  GROUP BY 1, 2),
         |lab$i AS MATERIALIZED (SELECT item, label FROM (
         |  SELECT item, label, row_number() OVER (PARTITION BY item ORDER BY n DESC, label) AS rk
         |  FROM votes$i) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |edges AS MATERIALIZED (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |lab0 AS MATERIALIZED (SELECT DISTINCT src AS item, src AS label FROM edges),
       |$rounds,
       |sizes AS (SELECT label, count(*) AS community_size FROM lab$iters GROUP BY 1)
       |SELECT l.item, l.label AS community, s.community_size
       |FROM lab$iters l JOIN sizes s ON l.label = s.label
       |ORDER BY l.item""".stripMargin
  }

  /** Hop distance to the nearest hub: multi-source BFS from the
    * top-`nSeeds` highest-degree items (deterministic seed set under
    * the total order `deg DESC, item`), bounded at `maxDepth` hops —
    * the "how far is the catalog from its hubs" centrality read that
    * complements PageRank's global ranking (an item 4 hops from every
    * hub is isolated no matter its score). Items unreached within
    * `maxDepth` are reported with distance NULL (visible, not
    * silently dropped).
    *
    * The depth bound is FIXED, so the BFS unrolls to `maxDepth`
    * frontier joins at plan-build time — no driver-side convergence
    * probing (unlike [[kCoreTransform]]'s data-dependent peel): each
    * round is one co-partitioned join frontier×edges + one distinct +
    * one anti-join against the labeled set, id-only rows on the
    * capped planning-scale graph. On an uncapped warehouse graph the
    * same unrolled shape holds — frontier rows are (item, dist)
    * pairs, each round one shuffle on item id.
    */
  def bfsDistancesTransform(pairs: DataFrame, nSeeds: Int = 5, maxDepth: Int = 4): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val e = truncateLineage(pairs.select($"item_a".as("a"), $"item_b".as("b")))
    val edges = e.select($"a".as("src"), $"b".as("dst"))
      .unionByName(e.select($"b".as("src"), $"a".as("dst")))
    val deg = edges.groupBy($"src".as("item")).agg(count(lit(1)).as("deg"))
    val seeds = deg.orderBy($"deg".desc, $"item").limit(nSeeds)
      .select($"item", lit(0L).as("dist"))
    var labeled = truncateLineage(seeds)
    var frontier = labeled
    for (k <- 1 to maxDepth) {
      val next = frontier.join(edges, frontier("item") === edges("src"))
        .select($"dst".as("item")).distinct()
        .join(labeled, Seq("item"), "left_anti")
        .select($"item", lit(k.toLong).as("dist"))
      frontier = truncateLineage(next)
      labeled = truncateLineage(labeled.unionByName(frontier))
    }
    deg.select($"item")
      .join(labeled, Seq("item"), "left")
      .select($"item", $"dist")
      .orderBy($"item")
  }

  def bfsDistances(spark: SparkSession, dir: String): DataFrame =
    bfsDistancesTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[bfsDistancesTransform]]: reach sets unrolled
    * per depth over the shared edge basis, distance = min depth of
    * first appearance. */
  def bfsDistancesOracleSql(nSeeds: Int = 5, maxDepth: Int = 4): String = {
    val rounds = (1 to maxDepth).map { k =>
      s"""r$k AS (SELECT item FROM r${k - 1}
         |  UNION SELECT e.dst FROM edges e JOIN r${k - 1} r ON e.src = r.item)""".stripMargin
    }.mkString(",\n")
    val levels = (0 to maxDepth)
      .map(k => s"SELECT item, CAST($k AS BIGINT) AS k FROM r$k")
      .mkString(" UNION ALL ")
    s"""WITH $edgeCtes,
       |edges AS MATERIALIZED (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |deg AS (SELECT src AS item, count(*) AS deg FROM edges GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT item FROM deg ORDER BY deg DESC, item LIMIT $nSeeds),
       |$rounds,
       |lv AS ($levels),
       |d AS (SELECT item, min(k) AS dist FROM lv GROUP BY 1)
       |SELECT deg.item, d.dist
       |FROM deg LEFT JOIN d ON deg.item = d.item
       |ORDER BY deg.item""".stripMargin
  }

  /** Local clustering coefficient per item — "do my neighbours know
    * each other": cc = triangles_at(v) / C(deg(v), 2), reported as
    * exact truncating basis points so no float ever leaves the plan
    * (the B9d/link_prediction discipline). The node-local face of
    * [[triangleTransform]]'s raw counts — a hub with many triangles
    * but TINY cc is a broker between communities; cc near 10⁴ marks a
    * clique member. Degree-1 items have no possible wedge and report
    * 0 bp.
    *
    * Shape: the per-node triangle counts come from the shared
    * skew-guarded oriented wedge join; degrees from the same edge
    * list; one id-scale join puts them together — nothing beyond
    * [[triangleTransform]]'s cost.
    */
  def clusteringCoefficientTransform(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val e = truncateLineage(pairs.select($"item_a".as("a"), $"item_b".as("b")))
    val deg = e.select($"a".as("item")).unionByName(e.select($"b".as("item")))
      .groupBy($"item").agg(count(lit(1)).as("deg"))
    val tri = triangleTransform(e.select($"a".as("item_a"), $"b".as("item_b")))
    deg.join(tri, Seq("item"), "left")
      .select($"item", $"deg",
        coalesce($"n_triangles", lit(0L)).as("n_triangles"))
      .withColumn("cc_bp",
        when($"deg" < 2, lit(0L))
          .otherwise(expr("n_triangles * 2 * 10000 div (deg * (deg - 1))")))
      .orderBy($"item")
  }

  def clusteringCoefficient(spark: SparkSession, dir: String): DataFrame =
    clusteringCoefficientTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[clusteringCoefficientTransform]]: the naive
    * id-ordered triple join (algorithm-independent triangle truth)
    * joined to degrees, same truncating basis points. */
  def clusteringCoefficientOracleSql: String =
    s"""WITH $edgeCtes,
       |edges AS (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |deg AS (SELECT src AS item, count(*) AS deg FROM edges GROUP BY 1),
       |tri AS (SELECT e1.item_a AS a, e1.item_b AS b, e2.item_b AS c
       |        FROM pairs e1
       |        JOIN pairs e2 ON e2.item_a = e1.item_a AND e2.item_b > e1.item_b
       |        JOIN pairs e3 ON e3.item_a = e1.item_b AND e3.item_b = e2.item_b),
       |tc AS (SELECT item, count(*) AS n_triangles
       |       FROM (SELECT a AS item FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
       |       GROUP BY 1)
       |SELECT d.item, d.deg, CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
       |       CASE WHEN d.deg < 2 THEN 0
       |            ELSE coalesce(tc.n_triangles, 0) * 2 * 10000 // (d.deg * (d.deg - 1)) END AS cc_bp
       |FROM deg d LEFT JOIN tc ON d.item = tc.item
       |ORDER BY d.item""".stripMargin

  /** Degree assortativity (Newman 2002) — ONE number: do hubs link
    * to hubs (r > 0, social-network shape) or to leaves (r < 0,
    * hub-and-spoke)? It decides whether the hub guards in B9/B9e
    * bind: a disassortative graph concentrates wedges on few pivots.
    * Pearson r of (deg(u), deg(v)) over the SYMMETRIC directed edge
    * list — the standard undirected formulation; sufficient sums are
    * exact Decimal(38,0) (deg² × edges passes a Long at warehouse
    * scale), one final float.
    *
    * Shape: degrees from one aggregate, attached to both endpoints
    * by co-partitioned id joins, collapsed map-side to a single
    * sufficient-stat row.
    */
  def degreeAssortativityTransform(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val e = truncateLineage(pairs.select($"item_a".as("a"), $"item_b".as("b")))
    val edges = e.select($"a".as("src"), $"b".as("dst"))
      .unionByName(e.select($"b".as("src"), $"a".as("dst")))
    val deg = edges.groupBy($"src".as("item")).agg(count(lit(1)).as("deg"))
    val dec = "decimal(38,0)"
    edges
      .join(deg.select($"item".as("src"), $"deg".as("dx")), Seq("src"))
      .join(deg.select($"item".as("dst"), $"deg".as("dy")), Seq("dst"))
      .agg(count(lit(1)).as("n_edges"),
        sum($"dx".cast(dec)).as("sx"), sum($"dy".cast(dec)).as("sy"),
        sum($"dx".cast(dec) * $"dy").as("sxy"),
        sum($"dx".cast(dec) * $"dx").as("sxx"),
        sum($"dy".cast(dec) * $"dy").as("syy"))
      .select($"n_edges",
        round((($"n_edges" * $"sxy" - $"sx" * $"sy").cast("double")) /
          sqrt(expr(s"CAST(nullif(n_edges * sxx - sx * sx, CAST(0 AS $dec)) AS DOUBLE)") *
               expr(s"CAST(nullif(n_edges * syy - sy * sy, CAST(0 AS $dec)) AS DOUBLE)")), 6)
          .as("assortativity"))
  }

  def degreeAssortativity(spark: SparkSession, dir: String): DataFrame =
    degreeAssortativityTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[degreeAssortativityTransform]]. */
  def degreeAssortativityOracleSql: String =
    s"""WITH $edgeCtes,
       |edges AS (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |deg AS (SELECT src AS item, count(*) AS deg FROM edges GROUP BY 1),
       |j AS (SELECT CAST(a.deg AS HUGEINT) AS dx, CAST(b.deg AS HUGEINT) AS dy
       |      FROM edges e JOIN deg a ON e.src = a.item JOIN deg b ON e.dst = b.item)
       |SELECT count(*) AS n_edges,
       |       round(CAST(count(*) * sum(dx * dy) - sum(dx) * sum(dy) AS DOUBLE) /
       |             sqrt(CAST(nullif(count(*) * sum(dx * dx) - sum(dx) * sum(dx), 0) AS DOUBLE) *
       |                  CAST(nullif(count(*) * sum(dy * dy) - sum(dy) * sum(dy), 0) AS DOUBLE)), 6) AS assortativity
       |FROM j""".stripMargin

  /** Connected components of the co-engagement graph with component
    * sizes — the fragmentation read BEFORE any community algorithm
    * (LPA inside one giant component answers a different question
    * than ten disconnected catalogs): min-label propagation to a
    * convergence checksum (the [[kCoreTransform]] planning-scale
    * driver-probe discipline; rounds bounded by component diameter —
    * the star-contraction O(log²) variant lives in
    * [[Dedup.dedupClustersStar]] for adversarial shapes), lineage
    * truncated per round.
    */
  def graphComponentsTransform(pairs: DataFrame, maxIters: Int = 30): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val e = truncateLineage(pairs.select($"item_a".as("a"), $"item_b".as("b")))
    val edges = e.select($"a".as("src"), $"b".as("dst"))
      .unionByName(e.select($"b".as("src"), $"a".as("dst")))
    var labels = truncateLineage(
      edges.select($"src".as("item")).distinct().select($"item", $"item".as("lbl")))
    def checksum(l: DataFrame): Long = {
      val r = l.agg(expr("bit_xor(xxhash64(item, lbl))")).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var sig = checksum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = truncateLineage(
        edges.join(labels.withColumnRenamed("item", "src"), Seq("src"))
          .groupBy($"dst".as("item")).agg(min($"lbl").as("nbr"))
          .join(labels, Seq("item"))
          .select($"item", least($"lbl", $"nbr").as("lbl")))
      val nextSig = checksum(next)
      labels = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    val sizes = labels.groupBy($"lbl").agg(count(lit(1)).as("component_size"))
    labels.join(sizes, Seq("lbl"))
      .select($"item", $"lbl".as("component"), $"component_size")
      .orderBy($"item")
  }

  def graphComponents(spark: SparkSession, dir: String): DataFrame =
    graphComponentsTransform(edgeTransform(Tables.events(spark, dir), maxItems = 50, topEdges = 800))

  /** DuckDB oracle for [[graphComponentsTransform]]: recursive-CTE
    * reachability closure, component = min reachable id. */
  def graphComponentsOracleSql: String =
    s"""WITH RECURSIVE $edgeCtes,
       |edges AS (SELECT item_a AS src, item_b AS dst FROM pairs
       |          UNION ALL SELECT item_b, item_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS item FROM edges),
       |reach(a, b) AS (
       |  SELECT item, item FROM nodes
       |  UNION
       |  SELECT reach.a, e.dst FROM reach JOIN edges e ON reach.b = e.src),
       |lbl AS (SELECT a AS item, min(b) AS component FROM reach GROUP BY a),
       |sz AS (SELECT component, count(*) AS component_size FROM lbl GROUP BY 1)
       |SELECT l.item, l.component, s.component_size
       |FROM lbl l JOIN sz s ON l.component = s.component
       |ORDER BY l.item""".stripMargin

  /** Strongly connected components of the DIRECTED item-transition
    * graph — the navigation-loop structure the undirected components
    * (#B9i) cannot see: item A linking to B means users go A → B,
    * and an SCC is a set of items users can CYCLE through (a
    * browse/return loop); items outside every cycle are pure
    * feeders/sinks. Nodes are `props.k` items, edges the DISTINCT
    * consecutive (item → next item) transitions per user in
    * (ts, event_id) order (#B2's ordering discipline at item grain).
    *
    * Algorithm: iterative min-label FORWARD/BACKWARD coloring with
    * peeling (the distributed SCC shape of Orzan 2004's coloring /
    * the FW-BW family, Slota et al. 2014 — no sequential Tarjan
    * stack): per round, F(v) = min id that can reach v and
    * B(v) = min id v can reach, both by fixpoint min-propagation
    * over the edge list; every v with F(v) = B(v) = m is in SCC(m)
    * (mutual reachability through m), and the round peels at least
    * SCC(min remaining id) — assigned SCCs are cycle-closed, so
    * edges touching them can be dropped for the next round.
    *
    * Scale: the fact-scale work is ONE window pass (partitioned by
    * user) + a distinct on (item, next) — everything after runs on
    * the |items|-node edge list; each propagation step is an
    * equi-join + min-aggregate with per-round lineage truncation
    * ([[truncateLineage]]). Rounds are bounded and convergence is
    * surfaced, not assumed. */
  def sccItemsTransform(events: DataFrame, maxRounds: Int = 10,
                        maxIters: Int = 60): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val seq = events
      .select($"user_id", $"ts", $"event_id",
        get_json_object($"props", "$.k").cast("long").as("item"))
      .filter($"item".isNotNull)
    val nodes = seq.select($"item").distinct()
    val edges = seq.withColumn("nxt", lead($"item", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"item".as("a"), $"nxt".as("b"))
      .distinct()
    sccFromEdges(spark, nodes, edges, maxRounds, maxIters)
  }

  /** The coloring/peeling core over an explicit (nodes, edges) pair —
    * split out so the streaming twin (whose edge SET is maintained
    * incrementally) reports through the identical derivation. */
  private[graft] def sccFromEdges(spark: SparkSession, nodesIn: DataFrame,
                                  edgesIn: DataFrame, maxRounds: Int = 10,
                                  maxIters: Int = 60): DataFrame = {
    import spark.implicits._
    val nodes = truncateLineage(nodesIn)
    var edges = truncateLineage(edgesIn)
    var assigned = nodes.select($"item", $"item".as("scc_rep")).filter(lit(false))
    var un = nodes
    var round = 0
    var remaining = un.count()
    while (round < maxRounds && remaining > 0) {
      var lbl = truncateLineage(
        un.select($"item".as("node"), $"item".as("fmin"), $"item".as("bmin")))
      var converged = false
      var iter = 0
      while (!converged && iter < maxIters) {
        // F flows WITH the edge (a's reacher-min reaches b);
        // B flows AGAINST it (whatever b reaches, a reaches too)
        val fIn = edges.join(lbl.select($"node".as("a"), $"fmin".as("fa")), Seq("a"))
          .groupBy($"b".as("fn")).agg(min($"fa").as("fin"))
        val bIn = edges.join(lbl.select($"node".as("b"), $"bmin".as("bb")), Seq("b"))
          .groupBy($"a".as("bn")).agg(min($"bb").as("bin"))
        val next = truncateLineage(
          lbl.join(fIn, lbl("node") === fIn("fn"), "left")
            .join(bIn, lbl("node") === bIn("bn"), "left")
            .select($"node",
              $"fmin".as("f_old"), $"bmin".as("b_old"),
              least($"fmin", coalesce($"fin", $"fmin")).as("fmin"),
              least($"bmin", coalesce($"bin", $"bmin")).as("bmin")))
        val chg = next.agg(sum(when($"fmin" =!= $"f_old" || $"bmin" =!= $"b_old", 1L)
          .otherwise(0L))).collect()(0).getLong(0)
        lbl = next.select($"node", $"fmin", $"bmin")
        converged = chg == 0
        iter += 1
      }
      if (!converged)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"sccItems round $round did NOT converge within $maxIters propagation steps")
      val newAssigned = truncateLineage(
        lbl.filter($"fmin" === $"bmin").select($"node".as("item"), $"fmin".as("scc_rep")))
      assigned = truncateLineage(assigned.unionByName(newAssigned))
      un = truncateLineage(un.join(newAssigned.select($"item"), Seq("item"), "left_anti"))
      edges = truncateLineage(
        edges.join(un.select($"item".as("a")), Seq("a"), "left_semi")
          .join(un.select($"item".as("b")), Seq("b"), "left_semi")
          .select($"a", $"b"))
      remaining = un.count()
      round += 1
    }
    if (remaining > 0) {
      // every round assigns at least SCC(min remaining id), so this
      // needs > maxRounds peel levels — surface it rather than emit a
      // wrong labeling silently
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"sccItems left $remaining nodes unassigned after $maxRounds rounds; " +
          "falling back to singleton labels for the leftovers")
      assigned = assigned.unionByName(un.select($"item", $"item".as("scc_rep")))
    }
    val sizes = assigned.groupBy($"scc_rep").agg(count(lit(1)).as("scc_size"))
    assigned.join(sizes, Seq("scc_rep"))
      .select($"item", $"scc_rep", $"scc_size")
      .orderBy($"item")
  }

  def sccItems(spark: SparkSession, dir: String): DataFrame =
    sccItemsTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[sccItemsTransform]]: directed reachability
    * closure; SCC representative = min over the MUTUAL-reach set
    * (r1.a→r1.b and back), which includes the node itself. */
  def sccItemsOracleSql: String =
    s"""WITH RECURSIVE
       |ev AS (SELECT user_id, ts, event_id,
       |              TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
       |       FROM events),
       |sq AS (SELECT item, lead(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
       |       FROM ev WHERE item IS NOT NULL),
       |e AS (SELECT DISTINCT item AS a, nxt AS b FROM sq WHERE nxt IS NOT NULL),
       |n AS (SELECT DISTINCT item FROM ev WHERE item IS NOT NULL),
       |reach(a, b) AS (
       |  SELECT item, item FROM n
       |  UNION
       |  SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a),
       |m AS (SELECT r1.a AS item, min(r1.b) AS scc_rep
       |      FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
       |      GROUP BY r1.a),
       |sz AS (SELECT scc_rep, count(*) AS scc_size FROM m GROUP BY scc_rep)
       |SELECT m.item, m.scc_rep, sz.scc_size
       |FROM m JOIN sz USING (scc_rep) ORDER BY m.item""".stripMargin
}
