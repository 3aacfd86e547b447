package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Planted-graph semantics for the graph-analytics family: the
  * integer-PageRank recurrence is checked against hand-computed exact
  * values (one round on a star — any div/rounding drift would show),
  * triangle counting against graphs whose triangle sets are
  * enumerable by eye, and both against the degenerate empty graph.
  */
class GraphSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def pairs(es: (Long, Long)*): DataFrame =
    es.toSeq.toDF("item_a", "item_b")

  test("pagerank: one exact integer round on a star graph") {
    // star: center 1, leaves 2..5. deg(1)=4, deg(leaf)=1, scale=1e9.
    // score'(1)    = 15e7 + 85 * (4 * 1e9 div 1) div 100 = 3_550_000_000
    // score'(leaf) = 15e7 + 85 * (1e9 div 4)     div 100 =   362_500_000
    val out = Graph.pagerankTransform(pairs((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)), iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.head == (1L, 3550000000L))
    assert(out.tail.toSet == Set(2L, 3L, 4L, 5L).map(i => (i, 362500000L)))
  }

  test("pagerank: center dominates after many rounds, ties ordered by item") {
    val out = Graph.pagerankTransform(pairs((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.head._1 == 1L && out.head._2 > out(1)._2)
    // leaves are symmetric: identical scores, then sorted by item id
    assert(out.tail.map(_._2).distinct.size == 1)
    assert(out.tail.map(_._1) == Seq(2L, 3L, 4L, 5L))
  }

  test("ppr: exact integer rounds on a star seeded at the center") {
    // star: center 5 (the only item % 5 == 0 → the only seed),
    // leaves 1..4. deg(5)=4, deg(leaf)=1, scale=1e9, base=15e7.
    // Round 1: seed base only feeds 5; mass 1e9 div 4 = 25e7 flows
    //          to each leaf → leaf = 85·25e7 div 100 = 212_500_000,
    //          center = 150_000_000 (bare base — no in-mass).
    val es = pairs((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L))
    val one = Graph.pprTransform(es, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one(5L) == 150000000L)
    assert(Seq(1L, 2L, 3L, 4L).forall(one(_) == 212500000L))
    // Round 2: leaves return 4·212_500_000 → center = 15e7 +
    //          85·85e7 div 100 = 872_500_000; leaves get
    //          85·(15e7 div 4) div 100 = 31_875_000 (no seed base).
    val two = Graph.pprTransform(es, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(two(5L) == 872500000L)
    assert(Seq(1L, 2L, 3L, 4L).forall(two(_) == 31875000L))
  }

  test("ppr: no seeds in the graph gives an empty result, no failure") {
    val out = Graph.pprTransform(pairs((1L, 2L), (2L, 3L)), iters = 3)
    assert(out.collect().isEmpty)
  }

  test("random_walks: equals a straight-Scala replay of the mixing-hash recurrence") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val adj = (es ++ es.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (s, xs) => (s, xs.map(_._2).sorted.toVector) }
    val expect = (for {
      v <- adj.keys.toSeq.sorted
      r <- 0 until 2
    } yield {
      val w = v * 2 + r
      var node = v
      (0L, node) +: (1 to 5).map { t =>
        val nbrs = adj(node)
        node = nbrs(((w * 1000003L + t * 8191L + node * 131L) % nbrs.length).toInt)
        (t.toLong, node)
      }
    }.map { case (s, n) => (v * 2 + r, s, n) }).flatten.sortBy(x => (x._1, x._2))
    val got = Graph.randomWalksTransform(pairs(es: _*))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(got == expect)
    // every consecutive hop is a real edge
    val edgeSet = (es ++ es.map(e => (e._2, e._1))).toSet
    got.groupBy(_._1).values.foreach { walk =>
      val nodes = walk.sortBy(_._2).map(_._3)
      nodes.zip(nodes.tail).foreach(h => assert(edgeSet(h)))
    }
  }

  test("harmonic centrality: hand distances on a path, seeds at both ends") {
    // path 0-1-2-3, seeds = items % 3 == 0 → {0, 3}.
    // H(1) = 1e6/1 + 1e6 div 2 = 1_500_000 (sources 0 at d=1, 3 at d=2)
    // H(2) symmetric; H(0) = H(3) = 1e6 div 3 = 333_333 (far end only).
    val out = Graph.harmonicCentralityTransform(pairs((0L, 1L), (1L, 2L), (2L, 3L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m = out.map(x => x._1 -> (x._2, x._3)).toMap
    assert(m(1L) == (2L, 1500000L) && m(2L) == (2L, 1500000L))
    assert(m(0L) == (1L, 333333L) && m(3L) == (1L, 333333L))
    // ordered by score desc, item asc
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 0L, 3L))
  }

  test("harmonic centrality: no seeds reachable gives empty output, no failure") {
    // items {1, 2} — neither ≡ 0 (mod 3) → empty seed set
    assert(Graph.harmonicCentralityTransform(pairs((1L, 2L))).collect().isEmpty)
  }

  /** Independent straight-Scala Brandes with the identical scaled-
    * integer dependency recurrence (per-edge truncating div, then
    * sum — matching the distributed grouping exactly). */
  private def refBetweenness(es: Seq[(Long, Long)], srcMod: Long = 3L,
                             maxHops: Int = 8,
                             scale: Long = 1000000000L): Map[Long, Long] = {
    val adj = (es ++ es.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (s, xs) => (s, xs.map(_._2).sorted.toVector) }
    val acc = scala.collection.mutable.Map.empty[Long, Long]
    for (s <- adj.keys.toSeq.sorted if s % srcMod == 0) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Vector(s)
      var d = 0
      while (frontier.nonEmpty && d < maxHops) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
        for (v <- frontier; w <- adj(v)) {
          if (!dist.contains(w)) next(w) = next.getOrElse(w, 0L) + sigma(v)
        }
        d += 1
        next.foreach { case (w, sg) => dist(w) = d; sigma(w) = sg }
        frontier = next.keys.toVector
      }
      val maxD = if (dist.isEmpty) 0 else dist.values.max
      val delta = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (t <- maxD to 1 by -1) {
        for (v <- dist.keys if dist(v) == t - 1; w <- adj(v) if dist.get(w).contains(t))
          delta(v) = delta(v) + sigma(v) * (scale + delta(w)) / sigma(w)
      }
      for ((v, dl) <- delta if v != s) acc(v) = acc.getOrElse(v, 0L) + dl
    }
    acc.filter(_._2 > 0L).toMap
  }

  test("betweenness: path graph hand values — interior nodes carry all traffic") {
    // path 0-1-2-3, seeds {0, 3}: from each end the two interior
    // nodes accumulate delta 2e9 and 1e9 → both total 3e9; endpoints
    // are sources/leaves and drop out.
    val out = Graph.betweennessTransform(pairs((0L, 1L), (1L, 2L), (2L, 3L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 3000000000L), (2L, 3000000000L)))
  }

  test("betweenness equals the straight-Scala Brandes reference on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 3
      val es = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      val expect = refBetweenness(es)
      val got = Graph.betweennessTransform(pairs(es: _*))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expect, s"trial $trial: got=$got expect=$expect")
    }
  }

  test("sampled centralities: sampled heads stay inside the exact head, denser never worse") {
    // Sampling-adequacy pin (round-11 verdict task 5): the gates
    // above prove the sampled recurrences are computed EXACTLY; this
    // pins what the sampling knob COSTS. Two assertions per
    // centrality on three random graphs:
    //  (1) the sampled top-5 keeps ≥3 members inside the EXACT
    //      (srcMod=1, every node a source) top-10 — the estimate's
    //      head is a subset-with-noise of the true head, not a
    //      different ranking (observed 4-5 of 5 on these graphs;
    //      3 is the alarm floor);
    //  (2) doubling the seed density (srcMod 3 → 2) never captures
    //      FEWER true-head members — the knob buys accuracy
    //      monotonically, which is the property a user tunes against.
    // (Head overlap BETWEEN two sparse samples was measured too and
    // is NOT stable on 30-node graphs — two ~10-seed estimates can
    // legitimately disagree at the head while both track the exact
    // ranking; anchoring on exact is the well-posed form.)
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 24 + trial * 4
      val es = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextDouble() < 0.18
      } yield (a, b)).toSeq
      def top(df: DataFrame, k: Int): Set[Long] =
        df.collect().take(k).map(_.getLong(0)).toSet
      def check(name: String, fn: Long => DataFrame): Unit = {
        val exact10 = top(fn(1L), 10)
        val in3 = (top(fn(3L), 5) & exact10).size
        val in2 = (top(fn(2L), 5) & exact10).size
        assert(in3 >= 3, s"trial $trial $name: srcMod3 head holds only $in3 of exact top-10")
        assert(in2 >= 3, s"trial $trial $name: srcMod2 head holds only $in2 of exact top-10")
        assert(in2 >= in3, s"trial $trial $name: densifying LOST head accuracy ($in3 -> $in2)")
      }
      check("betweenness", m => Graph.betweennessTransform(pairs(es: _*), srcMod = m))
      check("harmonic", m => Graph.harmonicCentralityTransform(pairs(es: _*), srcMod = m))
    }
  }

  test("katz: one exact integer round on a star; hub-adjacency ranking after eight") {
    // star 1-{2,3,4} plus disjoint edge 5-6, scale=1e9, alpha=1/64.
    // Round 1: x(1) = 1e9 + 3e9 div 64 = 1_046_875_000
    //          x(leaf) = x(5) = x(6) = 1e9 + 1e9 div 64 = 1_015_625_000
    val es = pairs((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
    val one = Graph.katzTransform(es, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(one.head == (1L, 1046875000L))
    assert(one.tail.toSet ==
      Set(2L, 3L, 4L, 5L, 6L).map(i => (i, 1015625000L)))
    // 8 rounds: center > its leaves (they absorb the hub's score) >
    // the isolated pair (which only sees its equal partner); scores
    // bounded by the documented scale/(1-lambda*alpha) ceiling
    val out = Graph.katzTransform(es)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byI = out.toMap
    assert(out.head._1 == 1L)
    assert(byI(2L) == byI(3L) && byI(3L) == byI(4L))
    assert(byI(5L) == byI(6L) && byI(2L) > byI(5L))
    assert(out.forall(_._2 < 2700000000L))
  }

  test("triangle: K4 minus an edge, plus a pendant vertex") {
    // K4 on 1..4 without (3,4): triangles (1,2,3) and (1,2,4);
    // pendant 5 hangs off 4 and joins no triangle -> absent from output
    val out = Graph.triangleTransform(
        pairs((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (4L, 5L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("triangle: complete K4 gives every node C(3,2) = 3 triangles") {
    val out = Graph.triangleTransform(
        pairs((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("empty graph: both operators return empty, no failure") {
    val empty = pairs()
    assert(Graph.pagerankTransform(empty, iters = 2).collect().isEmpty)
    assert(Graph.triangleTransform(empty).collect().isEmpty)
  }

  test("hits: hub/authority separation on a planted directed graph") {
    import org.apache.spark.sql.functions.col
    // 1 -> {2,3}, 4 -> 2: node 1 is the stronger hub; 2 the stronger
    // authority (two in-edges vs one); pure-source nodes get authority
    // 0 and pure-sink nodes hub 0
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L)).toDF("src", "dst")
    val out = Graph.hitsTransform(edges, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byItem = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byItem(1L)._1 == 1000000L)                  // top hub, max-normalized
    assert(byItem(2L)._2 == 1000000L)                  // top authority
    assert(byItem(1L)._2 == 0L && byItem(4L)._2 == 0L) // sources: no authority
    assert(byItem(2L)._1 == 0L && byItem(3L)._1 == 0L) // sinks: no hub score
    assert(byItem(1L)._1 > byItem(4L)._1)
  }

  test("hits equals an independent reference implementation on random digraphs") {
    val rnd = new scala.util.Random(7L)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(7)
      val es = (for (a <- 0 until n; b <- 0 until n if a != b && rnd.nextDouble() < 0.3)
        yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        val iters = 1 + rnd.nextInt(4)
        val scale = 1000000L
        val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
        val outAdj = es.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val inAdj = es.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
        var h = nodes.map(_ -> scale).toMap
        var a = h
        for (_ <- 1 to iters) {
          val hraw = nodes.map(v => v -> outAdj.getOrElse(v, Nil).map(a).sum).toMap
          val hmx = math.max(hraw.values.max, 1L)
          h = hraw.view.mapValues(r => r * scale / hmx).toMap
          val araw = nodes.map(v => v -> inAdj.getOrElse(v, Nil).map(h).sum).toMap
          val amx = math.max(araw.values.max, 1L)
          a = araw.view.mapValues(r => r * scale / amx).toMap
        }
        val want = nodes.map(v => (v, h(v), a(v)))
          .sortBy { case (id, _, auth) => (-auth, id) }
        val got = Graph.hitsTransform(es.toDF("src", "dst"), iters = iters)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got == want, s"trial $trial n=$n iters=$iters edges=$es")
      }
    }
  }

  test("pagerank equals an independent reference implementation on random graphs") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(8)
      val es = (for (a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.4)
        yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        val iters = 1 + rnd.nextInt(4)
        val scale = 1000000000L
        // reference: the same integer recurrence, straight Scala
        val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val deg = adj.view.mapValues(_.size.toLong).toMap
        var score = adj.keys.map(_ -> scale).toMap
        val base = 15L * scale / 100L
        for (_ <- 1 to iters)
          score = adj.keys.map { v =>
            v -> (base + 85L * adj(v).map(u => score(u) / deg(u)).sum / 100L)
          }.toMap
        val want = score.toSeq.sortBy { case (id, s) => (-s, id) }
        val got = Graph.pagerankTransform(pairs(es: _*), iters = iters)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got == want, s"trial $trial n=$n iters=$iters edges=$es")
      }
    }
  }

  test("LPA labels equal the straight-Scala recurrence on random graphs") {
    val rnd = new scala.util.Random(1234L)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(10)
      val iters = 1 + rnd.nextInt(5)
      val es = (for (a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.4)
        yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        // reference: same deterministic vote (count desc, min label)
        val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        var lab = adj.keys.map(v => v -> v).toMap
        for (_ <- 1 to iters)
          lab = adj.keys.map { v =>
            val votes = adj(v).groupBy(lab).view.mapValues(_.size).toSeq
            v -> votes.minBy { case (l, c) => (-c, l) }._1
          }.toMap
        val sizes = lab.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val want = lab.toSeq.sorted.map { case (v, l) => (v, l, sizes(l)) }
        val got = Graph.lpaTransform(pairs(es: _*), iters = iters)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got == want, s"trial $trial n=$n iters=$iters edges=$es")
      }
    }
  }

  test("triangle counts equal a brute-force triple loop on random graphs") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(10)
      val es = (for (a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.45)
        yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        val edgeSet = es.toSet
        val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for (a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n)
          if (edgeSet((a.toLong, b.toLong)) && edgeSet((a.toLong, c.toLong))
              && edgeSet((b.toLong, c.toLong))) {
            counts(a.toLong) += 1; counts(b.toLong) += 1; counts(c.toLong) += 1
          }
        val want = counts.toSeq.sortBy { case (id, t) => (-t, id) }
        val got = Graph.triangleTransform(pairs(es: _*))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got == want, s"trial $trial n=$n edges=$es")
      }
    }
  }

  test("link prediction equals a straight-Scala neighbour-jaccard on random graphs") {
    val rnd = new scala.util.Random(99L)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(10)
      val es = (for (a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.4)
        yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        val edgeSet = es.toSet
        val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val nodes = adj.keys.toSeq.sorted
        val want = (for {
          a <- nodes; b <- nodes
          if a < b && !edgeSet((a, b))
          common = (adj(a) & adj(b)).size.toLong
          if common > 0
        } yield (a, b, common, adj(a).size.toLong, adj(b).size.toLong,
            common * 10000L / (adj(a).size + adj(b).size - common)))
          .sortBy { case (a, b, _, _, _, bp) => (-bp, a, b) }.take(50)
        val got = Graph.linkPredictionTransform(pairs(es: _*))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
        assert(got == want, s"trial $trial n=$n edges=$es")
      }
    }
  }

  test("degree histogram: star plus an isolated edge") {
    // star center 1 -> degree 4; leaves degree 1; edge (6,7) two more
    // degree-1 nodes: histogram = {1: 6, 4: 1}
    val out = Graph.degreeHistogramTransform(
        pairs((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 6L), (4L, 1L)))
  }

  /** Straight-Scala peeling reference for k-core. */
  private def refCores(es: Seq[(Long, Long)]): Map[Long, Long] = {
    import scala.collection.mutable
    val adj = mutable.Map[Long, mutable.Set[Long]]()
    es.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set()) += b
      adj.getOrElseUpdate(b, mutable.Set()) += a
    }
    val core = mutable.Map[Long, Long]()
    var k = 1L
    while (adj.nonEmpty) {
      var changed = true
      while (changed) {
        val victims = adj.filter(_._2.size < k).keys.toList
        if (victims.isEmpty) changed = false
        else victims.foreach { v =>
          core(v) = k - 1; adj -= v; adj.values.foreach(_ -= v)
        }
      }
      k += 1
    }
    core.toMap
  }

  test("k-core: K4 plus a pendant — clique cores 3, pendant core 1") {
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
    val out = Graph.kCoreTransform(pairs(es: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 1L)))
  }

  test("k-core equals the straight-Scala peeling reference on random graphs") {
    val rnd = new scala.util.Random(77L)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(10)
      val es = (for (a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.45)
        yield (a.toLong, b.toLong)).toSeq
      if (es.nonEmpty) {
        val want = refCores(es).toSeq.sorted
        val got = Graph.kCoreTransform(pairs(es: _*))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got == want, s"trial $trial n=$n edges=$es")
      }
    }
  }

  test("degree assortativity: a star is perfectly disassortative, a cycle degenerate") {
    // star 1-{2,3,4}: directed x=[3,3,3,1,1,1], y mirrored -> r = -1
    val star = Graph.degreeAssortativityTransform(pairs((1L,2L),(1L,3L),(1L,4L))).collect()
    assert(star(0).getLong(0) == 6L)
    assert(star(0).getDouble(1) == -1.0)
    // 3-cycle: every degree 2 -> zero variance -> null, not NaN
    val cyc = Graph.degreeAssortativityTransform(pairs((1L,2L),(2L,3L),(1L,3L))).collect()
    assert(cyc(0).isNullAt(1))
  }

  test("scc_items: planted directed graph with two cycles and a feeder chain") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // one user walks: 1 2 3 1 (cycle {1,2,3}) then 4 5 4 (cycle {4,5})
    // then 6 7 (feeder chain: singletons). Edges: 1→2,2→3,3→1,
    // 1→4(bridge),4→5,5→4,4→6(bridge),6→7.
    val walk = Seq(1L, 2L, 3L, 1L, 4L, 5L, 4L, 6L, 7L)
    val events = walk.zipWithIndex.map { case (item, i) =>
      (1L, f"2024-01-01 00:00:${i}%02d", i.toLong, s"""{"k": $item}""")
    }.toDF("user_id", "ts_s", "event_id", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Graph.sccItemsTransform(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(out == Seq((1L,1L,3L),(2L,1L,3L),(3L,1L,3L),(4L,4L,2L),(5L,4L,2L),
      (6L,6L,1L),(7L,7L,1L)))
  }

  test("scc_items on testdata equals a straight-Scala Tarjan") {
    val ev = graft.sources.Tables.events(spark, sf)
    val out = Graph.sccItemsTransform(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // rebuild the edge list exactly as the operator does
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
      .withColumn("nxt", lead(col("item"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("item"), col("nxt")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (edges.flatMap(e => Seq(e._1, e._2)) ++ out.keys).distinct.sorted
    // iterative Tarjan (explicit stack)
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toList }
    val idx = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStk = scala.collection.mutable.Set.empty[Long]
    val stk = scala.collection.mutable.Stack.empty[Long]
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    def strongconnect(v0: Long): Unit = {
      case class Frame(v: Long, var rest: List[Long])
      val call = scala.collection.mutable.Stack(Frame(v0, adj.getOrElse(v0, Nil)))
      idx(v0) = counter; low(v0) = counter; counter += 1; stk.push(v0); onStk += v0
      while (call.nonEmpty) {
        val f = call.top
        f.rest match {
          case wn :: tl =>
            f.rest = tl
            if (!idx.contains(wn)) {
              idx(wn) = counter; low(wn) = counter; counter += 1; stk.push(wn); onStk += wn
              call.push(Frame(wn, adj.getOrElse(wn, Nil)))
            } else if (onStk(wn)) low(f.v) = math.min(low(f.v), idx(wn))
          case Nil =>
            call.pop()
            if (call.nonEmpty) low(call.top.v) = math.min(low(call.top.v), low(f.v))
            if (low(f.v) == idx(f.v)) {
              val members = scala.collection.mutable.ListBuffer.empty[Long]
              var cont = true
              while (cont) { val x = stk.pop(); onStk -= x; members += x; cont = x != f.v }
              val rep = members.min
              members.foreach(m => comp(m) = rep)
            }
        }
      }
    }
    nodes.foreach(v => if (!idx.contains(v)) strongconnect(v))
    assert(out.keySet == nodes.toSet)
    nodes.foreach(v => assert(out(v) == comp(v), s"item $v: spark ${out(v)} tarjan ${comp(v)}"))
  }
}
