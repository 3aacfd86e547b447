package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.avg
import org.scalatest.funsuite.AnyFunSuite

/** Edge-semantics pins for the hypothesis-test layer ([[operators
  * .Stats]]) and the round-8 corpus additions: hand-computed KS /
  * U / χ² values on frames small enough to verify on paper, planted
  * URL-filter slices, and Heaps-fit sanity on the real corpus. The
  * DuckDB oracle gate checks sf0.01 equality; these pin the DESIGNED
  * math. */
class StatsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  override def afterAll(): Unit = GraftCaches.clearAll()

  import TestSession._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")

  test("ks_doclen_sources: hand-computed D on two tiny sources") {
    import spark.implicits._
    // a: lengths {1, 3}; b: lengths {2, 2} — F̂ diverges most at len 2:
    // F_a(2) = 1/2, F_b(2) = 1 → D = 1/2, d_num = |1·2 − 2·2| = 2
    val docs = Seq(
      (1L, "x", "en", "a", 1L), (2L, "xyz", "en", "a", 3L),
      (3L, "xy", "en", "b", 2L), (4L, "xy", "en", "b", 2L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.Stats.ksDoclenSourcesTransform(docs).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("d_num") == 2L)
    assert(math.abs(r(0).getAs[Double]("ks") - 0.5) < 1e-9)
  }

  test("wasserstein_doclen: hand transport plan on two tiny sources") {
    import spark.implicits._
    // a: lengths {1, 3}; b: lengths {2, 2}. Optimal 1-D transport
    // moves 1→2 and 3→2, cost (1 + 1)/2 = 1.0 characters. Support
    // walk: gaps 1→2 and 2→3 each contribute |cum_a·n_b − cum_b·n_a|
    // = 2 → num 4, W1 = 4/(2·2) = 1.0.
    val docs = Seq(
      (1L, "x", "en", "a", 1L), (2L, "xyz", "en", "a", 3L),
      (3L, "xy", "en", "b", 2L), (4L, "xy", "en", "b", 2L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.Stats.wassersteinDoclenTransform(docs).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("w1_chars") == 1.0)
  }

  test("wasserstein_doclen: identical distributions give W1 = 0; KS agrees on the pair set") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa", "en", "a", 2L), (2L, "bbbb", "en", "a", 4L),
      (3L, "cc", "en", "b", 2L), (4L, "dddd", "en", "b", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.Stats.wassersteinDoclenTransform(docs).collect()
    assert(r.length == 1 && r(0).getAs[Double]("w1_chars") == 0.0)
  }

  test("psi_value_drift: planted full bucket shift reads 2·(2/3)·ln5; no-shift type reads 0") {
    import spark.implicits._
    // cutoff = min(ts)+15d = Jan 16. Type "shift": baseline all in
    // bucket 0 (value 1.00), current all in bucket 1 (value 10.00) —
    // K=2, n=4 each side; both smoothed terms are (2/3)·ln5 =
    // 1.072958608 (9dp) → psi = 2.145917. Type "same": identical
    // bucket mix both periods → every term 0.
    def ev(day: Int, typ: String, v: Double) =
      (1L, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), typ, v)
    val rows = Seq.fill(4)(ev(2, "shift", 1.00)) ++ Seq.fill(4)(ev(20, "shift", 10.00)) ++
      Seq(ev(1, "same", 1.00), ev(2, "same", 10.00), ev(20, "same", 1.00), ev(21, "same", 10.00))
    val df = rows.toDF("user_id", "ts", "event_type", "value")
    val cutoff = operators.Experiments.preCutoff(df)
    val r = operators.Stats.psiFromGrid(operators.Stats.psiGrid(df, cutoff))
      .collect().map(x => x.getAs[String]("event_type") ->
        (x.getAs[Double]("psi"), x.getAs[Boolean]("drift_flag"))).toMap
    assert(r("shift") == (2.145917, true), s"got ${r("shift")}")
    assert(r("same") == (0.0, false))
  }

  test("ks_doclen_sources: identical distributions give D = 0, full pair triangle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa", "en", "a", 2L), (2L, "bb", "en", "b", 2L),
      (3L, "cc", "en", "c", 2L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.Stats.ksDoclenSourcesTransform(docs).collect()
    assert(r.length == 3) // C(3,2) pairs, zero-distance included
    assert(r.forall(_.getAs[Long]("d_num") == 0L))
  }

  test("mann_whitney_u: tie-averaged ranks exact on a 2x2 frame; AUC bounds corpus-wide") {
    import spark.implicits._
    // a: {1.00, 2.00}; b: {2.00, 3.00}. Direct count of (a, b) pairs
    // with a > b: none; ties (2.00, 2.00): one, at ½ → U_a = 0.5,
    // 2U_a = 1, AUC = 0.5/4 = 0.125. Via ranks: pooled 1(a) 2(a) 2(b)
    // 3(b), tie-averaged R_a = 1 + 2.5 = 3.5, 2U_a = 2R_a − n_a(n_a+1)
    // = 7 − 6 = 1 — the identity the operator computes.
    val ev = Seq(
      (1L, ts(0), 1L, "a", 1.0, "{}"), (2L, ts(0), 1L, "a", 2.0, "{}"),
      (3L, ts(0), 2L, "b", 2.0, "{}"), (4L, ts(0), 2L, "b", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.mannWhitneyUTransform(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("u2_a") == 1L)
    assert(math.abs(r(0).getAs[Double]("auc") - 0.125) < 1e-9)
    // corpus-wide: AUC ∈ [0,1] and U identity 0 ≤ 2U_a ≤ 2·n_a·n_b
    val sf = "/root/testdata/sf0.001"
    val all = SparkEntry.queries("mann_whitney_u")(spark, sf).collect()
    assert(all.nonEmpty)
    all.foreach { row =>
      val (na, nb) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
      val u2 = row.getAs[Long]("u2_a")
      assert(u2 >= 0L && u2 <= 2L * na * nb)
      val auc = row.getAs[Double]("auc")
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }

  test("chi2_type_dow: independent 2x2 has zero contribution; cells partition N") {
    import spark.implicits._
    // perfectly independent: each (type, dow) cell = 1 — expected = 1
    val ev = Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"), (2L, ts(1), 1L, "a", 0.0, "{}"),
      (3L, ts(0), 2L, "b", 0.0, "{}"), (4L, ts(1), 2L, "b", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.chi2TypeDowTransform(ev).collect()
    assert(r.length == 4)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("expected") - 1.0) < 1e-9)
      assert(row.getAs[Double]("contrib") == 0.0)
    }
    val sf = "/root/testdata/sf0.001"
    val all = SparkEntry.queries("chi2_type_dow")(spark, sf).collect()
    val total = all.map(_.getAs[Long]("n")).sum
    val nEvents = sources.Tables.events(spark, sf).count()
    assert(total == nEvents, "cells must partition the fact table")
    assert(all.forall(_.getAs[Double]("contrib") >= 0.0))
  }

  test("cramers_v_source_lang: perfect association gives V = 1, independence V = 0") {
    import spark.implicits._
    val perfect = Seq(
      (1L, "x", "en", "a", 1L), (2L, "x", "en", "a", 1L),
      (3L, "x", "de", "b", 1L), (4L, "x", "de", "b", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val v1 = operators.Stats.cramersVSourceLangTransform(perfect).collect()(0)
    assert(math.abs(v1.getAs[Double]("cramers_v") - 1.0) < 1e-6)
    val indep = Seq(
      (1L, "x", "en", "a", 1L), (2L, "x", "de", "a", 1L),
      (3L, "x", "en", "b", 1L), (4L, "x", "de", "b", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val v0 = operators.Stats.cramersVSourceLangTransform(indep).collect()(0)
    assert(v0.getAs[Double]("cramers_v") == 0.0)
  }

  test("heaps_law_fit: beta in (0,1) on the real corpus, n_points = |docs|") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("heaps_law_fit")(spark, sf).collect()(0)
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(r.getAs[Long]("n_points") == nDocs)
    val beta = r.getAs[Double]("heaps_beta")
    // sublinear vocab growth: 0 < β < 1 for any natural-ish corpus
    assert(beta > 0.0 && beta < 1.0, s"heaps beta $beta outside (0,1)")
  }

  test("vocab_coverage_curve: power-of-two grid, monotone, ends at 1.0") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("vocab_coverage_curve")(spark, sf).collect()
    assert(rows.length >= 2)
    val sizes = rows.map(_.getAs[Long]("vocab_size"))
    // every point but the full-V endpoint is a power of two
    sizes.dropRight(1).foreach(n => assert((n & (n - 1)) == 0L, s"$n not a power of two"))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage must be monotone")
    assert(math.abs(cov.last - 1.0) < 1e-9, "full vocabulary covers everything")
  }

  test("embedding_pca_power: recovers a planted principal axis; unit loading norm") {
    import spark.implicits._
    // 12 vectors hugging dim 1 (amplitude 3-14 ·0.1), tiny dim-2 noise:
    // the principal direction must load ~entirely on dim 1
    val emb = (1 to 12).map { i =>
      (i.toLong, Array(0.1f * (i + 2), if (i % 2 == 0) 0.01f else -0.01f, 0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val r = operators.VectorOps.embeddingPcaPowerTransform(emb).collect()
    assert(r.length == 3)
    val byDim = r.map(x => x.getAs[Long]("dim") -> x).toMap
    assert(math.abs(byDim(1L).getAs[Double]("loading")) > 0.999)
    assert(math.abs(byDim(2L).getAs[Double]("loading")) < 0.05)
    // sign canonicalization: first nonzero component positive
    assert(byDim(1L).getAs[Long]("v6") > 0L)
    val share = r.head.getAs[Double]("var_share")
    assert(share > 0.99 && share <= 1.0, s"planted 1-D cloud must explain ~all: $share")
    // real corpus: unit-norm loadings, bounded share
    val rows = SparkEntry.queries("embedding_pca_power")(spark, "/root/testdata/sf0.001").collect()
    val norm = math.sqrt(rows.map(x => math.pow(x.getAs[Double]("loading"), 2)).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loading norm $norm")
    val s2 = rows.head.getAs[Double]("var_share")
    assert(s2 > 0.0 && s2 <= 1.0)
  }

  test("session_duration: single-event sessions land in bucket 0 with closed bounds") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def t(m: Long) = new java.sql.Timestamp(base + m * 60000L)
    // u1: one 40-min session (2400 s → bucket 11); u2: single event (0 s → bucket 0)
    val ev = Seq(
      (1L, t(0), 1L, "view", 0.0, "{}"), (2L, t(20), 1L, "view", 0.0, "{}"),
      (3L, t(40), 1L, "view", 0.0, "{}"), (4L, t(0), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Retention.sessionDurationTransform(ev).collect()
    val byB = r.map(x => x.getAs[Long]("bucket") -> x).toMap
    assert(byB.keySet == Set(0L, 11L))
    assert(byB(0L).getAs[Long]("n_sessions") == 1L)
    assert(byB(0L).getAs[Long]("dur_lo_s") == 0L && byB(0L).getAs[Long]("dur_hi_s") == 0L)
    assert(byB(11L).getAs[Long]("n_sessions") == 1L) // 2400 s ∈ [2047, 4094]
  }

  test("holt_linear_trend: hand-computed level/trend on a 3-day series") {
    import spark.implicits._
    // daily cents 4, 8, 4 (value 0.04/0.08/0.04):
    // l0=4 b0=0 | l1=.5·8+.5·4=6, b1=.5·(6−4)=1 | l2=.5·4+.5·7=5.5,
    // b2=.5·(5.5−6)+.5·1=0.25 → forecast day2 = 5.75
    val ev = Seq(
      (1L, ts(0), 1L, "a", 0.04, "{}"),
      (2L, ts(1), 1L, "a", 0.08, "{}"),
      (3L, ts(2), 1L, "a", 0.04, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Timeseries.holtLinearTrendTransform(ev).collect()
    assert(r.length == 3)
    assert(r(0).getAs[Double]("level") == 4.0 && r(0).getAs[Double]("trend") == 0.0)
    assert(r(1).getAs[Double]("level") == 6.0 && r(1).getAs[Double]("trend") == 1.0)
    assert(r(2).getAs[Double]("level") == 5.5 && r(2).getAs[Double]("trend") == 0.25)
    assert(r(2).getAs[Double]("forecast") == 5.75)
  }

  test("streaming faces equal their batch twins (coverage, chi2, ks)") {
    val sf = "/root/testdata/sf0.001"
    for ((sName, bName) <- Seq(
        "stream_vocab_coverage" -> "vocab_coverage_curve",
        "stream_chi2_type_dow" -> "chi2_type_dow",
        "stream_ks_doclen" -> "ks_doclen_sources",
        "stream_holt" -> "holt_linear_trend",
        "stream_cramers_v" -> "cramers_v_source_lang",
        "stream_mann_whitney" -> "mann_whitney_u",
        "stream_neyman" -> "neyman_allocation",
        "stream_fano" -> "fano_factor_daily",
        "stream_spearman" -> "spearman_daily_pairs",
        "stream_runs_test" -> "runs_test_daily",
        "stream_benford" -> "benford_first_digit",
        "stream_kendall" -> "kendall_tau_daily",
        "stream_ljung_box" -> "ljung_box_daily",
        "stream_markov" -> "markov_stationary",
        "stream_dow_residual" -> "dow_residual_outliers",
        "stream_mutual_info" -> "mutual_info_type_dow",
        "stream_absorption" -> "absorption_steps",
        "stream_jarque_bera" -> "jarque_bera_daily",
        "stream_theil_sen" -> "theil_sen_trend",
        "stream_anova" -> "anova_f_cents",
        "stream_seasonal_strength" -> "seasonal_strength",
        "stream_bot_screen" -> "bot_burst_screen",
        "stream_funnel_excluding" -> "funnel_excluding",
        "stream_pagerank" -> "pagerank_items",
        "stream_katz" -> "katz_centrality",
        "stream_flesch" -> "flesch_reading_ease",
        "stream_wilcoxon" -> "wilcoxon_signed_rank",
        "stream_capture_recapture" -> "capture_recapture",
        "stream_user_type_entropy" -> "user_type_entropy",
        "stream_sessions_per_user" -> "sessions_per_user",
        "stream_tumble_jsonl" -> "tumble_window_agg",
        "stream_ccf" -> "cross_correlation_daily",
        "stream_session_affinity" -> "session_type_affinity",
        "stream_pacf" -> "pacf_daily",
        "stream_first_passage" -> "first_passage_matrix")) {
      val s = SparkEntry.queries(sName)(spark, sf).collect().map(_.toString).sorted
      val b = SparkEntry.queries(bName)(spark, sf).collect().map(_.toString).sorted
      assert(s.sameElements(b), s"$sName diverged from $bName")
    }
  }

  test("graph_modularity: two disjoint triangles score exactly Q = 1/2") {
    import spark.implicits._
    // m = 6, E_in = 6, K_c = 6 each → Q·(2m)² = 4·6·6 − 2·36 = 72; Q = 0.5
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("item_a", "item_b")
    val r = operators.Graph.graphModularityTransform(pairs).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_communities") == 2L)
    assert(r(0).getAs[Long]("n_edges") == 6L && r(0).getAs[Long]("e_in") == 6L)
    assert(r(0).getAs[Long]("q_num") == 72L)
    assert(r(0).getAs[Double]("modularity") == 0.5)
  }

  test("neyman_allocation: a zero-variance stratum gets zero budget") {
    import spark.implicits._
    // source a: all docs length 5 (sigma = 0); source b: lengths vary
    val docs = Seq(
      (1L, "aaaaa", "en", "a", 5L), (2L, "bbbbb", "en", "a", 5L),
      (3L, "cc", "en", "b", 2L), (4L, "dddddddd", "en", "b", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.Stats.neymanAllocationTransform(docs).collect()
    val byS = r.map(x => x.getAs[String]("source") -> x).toMap
    assert(byS("a").getAs[Long]("w") == 0L && byS("a").getAs[Long]("alloc") == 0L)
    // b: n=2, sum=10, sum2=68 -> n*s2 - s1^2 = 136-100 = 36 -> w = 6, all budget
    assert(byS("b").getAs[Long]("w") == 6L && byS("b").getAs[Long]("alloc") == 1000L)
  }

  test("fano_factor_daily: constant daily traffic scores exactly 0") {
    import spark.implicits._
    val ev = (0 until 4).map { d =>
      (d.toLong, ts(d), 1L, "a", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.fanoFactorDailyTransform(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_days") == 4L && r(0).getAs[Long]("n_events") == 4L)
    assert(r(0).getAs[Double]("fano") == 0.0)
  }

  test("type_reach_ci: universal type spans CI to ~1, interval brackets the rate") {
    import spark.implicits._
    // type a touches both users (reach 1.0), type b one of two (0.5)
    val ev = Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"), (2L, ts(0), 2L, "a", 0.0, "{}"),
      (3L, ts(0), 1L, "b", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.typeReachCiTransform(ev).collect()
    val byT = r.map(x => x.getAs[String]("event_type") -> x).toMap
    assert(byT("a").getAs[Double]("reach") == 1.0)
    assert(byT("a").getAs[Double]("wilson_hi") == 1.0) // k = n pins hi at 1
    r.foreach { row =>
      val (lo, hi, p) = (row.getAs[Double]("wilson_lo"),
        row.getAs[Double]("wilson_hi"), row.getAs[Double]("reach"))
      assert(lo >= 0.0 && hi <= 1.0 && lo <= p && p <= hi)
    }
  }

  test("degree_powerlaw_fit: a flat histogram fits slope 0") {
    import spark.implicits._
    // path graph 1-2-3: degrees 1,2,1 -> histogram {1:2, 2:1}... use a
    // star + ring mix? simplest exactness pin: two points (1,2),(2,1)
    // give a finite negative alpha; assert the fit runs and is finite
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("item_a", "item_b")
    val r = operators.Graph.degreePowerlawFitTransform(pairs).collect()(0)
    assert(r.getAs[Long]("n_points") == 2L)
    // points: (ln1, ln2), (ln2, ln1) -> slope exactly -1
    assert(r.getAs[Double]("alpha") == -1.0)
  }

  test("spearman_daily_pairs: monotone coupling scores exactly +/-1") {
    import spark.implicits._
    // daily counts over 3 days — a: 1,2,3; b: 1,4,9 (nonlinear but
    // monotone with a); c: 3,2,1 (anti-monotone)
    def burst(tp: String, day: Int, k: Int, base: Long) =
      (0 until k).map(i => (base + i, ts(day), 1L, tp, 0.0, "{}"))
    val ev = (burst("a", 0, 1, 100) ++ burst("a", 1, 2, 200) ++ burst("a", 2, 3, 300) ++
      burst("b", 0, 1, 400) ++ burst("b", 1, 4, 500) ++ burst("b", 2, 9, 600) ++
      burst("c", 0, 3, 700) ++ burst("c", 1, 2, 800) ++ burst("c", 2, 1, 900))
      .map { case (e, t, u, tp, v, p) => (e.toLong, t, u, tp, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.spearmanDailyPairsTransform(ev).collect()
    val byP = r.map(x => (x.getString(0), x.getString(1)) -> x.getAs[Double]("spearman_rho")).toMap
    assert(byP(("a", "b")) == 1.0)
    assert(byP(("a", "c")) == -1.0 && byP(("b", "c")) == -1.0)
  }

  test("benford_first_digit: digits in 1-9, shares sum to 1") {
    val rows = SparkEntry.queries("benford_first_digit")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1L && d <= 9L)
    }
    val total = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(total - 1.0) < 1e-4)
    val bTotal = rows.map(_.getAs[Double]("benford_share")).sum
    assert(bTotal <= 1.0 + 1e-9) // full 1..9 set sums to exactly 1
  }

  test("transition_entropy: a deterministic chain has zero entropy") {
    import spark.implicits._
    // one user, strict a->b->a->b: prev=a always goes to b and vice versa
    val ev = (0 until 6).map { i =>
      (i.toLong, new Timestamp(ts(0).getTime + i * 1000L), 1L,
        if (i % 2 == 0) "a" else "b", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.transitionEntropyTransform(ev).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Long]("n_branches") == 1L)
      assert(row.getAs[Double]("entropy_bits") == 0.0)
    }
  }

  test("runs_test_daily: strict alternation = max runs, monotone ramp = one run") {
    import spark.implicits._
    def burst(tp: String, day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, ts(day), 1L, tp, 0.0, "{}"))
    // alt: 1,3,1,3,1 -> signs +,-,+,- -> 4 runs; ramp: 1,2,3,4,5 -> ++++ -> 1 run
    val ev = (burst("alt", 0, 1, 0) ++ burst("alt", 1, 3, 100) ++ burst("alt", 2, 1, 200) ++
      burst("alt", 3, 3, 300) ++ burst("alt", 4, 1, 400) ++
      burst("ramp", 0, 1, 500) ++ burst("ramp", 1, 2, 600) ++ burst("ramp", 2, 3, 700) ++
      burst("ramp", 3, 4, 800) ++ burst("ramp", 4, 5, 900))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.runsTestDailyTransform(ev).collect()
    val byT = r.map(x => x.getString(0) -> x).toMap
    assert(byT("alt").getAs[Long]("runs") == 4L)
    assert(byT("ramp").getAs[Long]("runs") == 1L)
    assert(byT("ramp").getAs[Long]("n_up") == 4L && byT("ramp").getAs[Long]("n_down") == 0L)
  }

  test("props_key_census: every key of a planted payload is counted") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(0), 1L, "a", 0.0, """{"k": 1, "x": "y"}"""),
      (2L, ts(0), 1L, "a", 0.0, """{"k": 2}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.propsKeyCensusTransform(ev).collect()
    val byK = r.map(x => x.getString(0) -> x.getAs[Long]("n_events")).toMap
    assert(byK == Map("k" -> 2L, "x" -> 1L))
  }

  test("kendall_tau_daily: monotone coupling scores +/-1, all-tie series guard to NULL") {
    import spark.implicits._
    def burst(tp: String, day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, ts(day), 1L, tp, 0.0, "{}"))
    // a: 1,2,3; b: 1,4,9 (monotone with a -> +1); c: 3,2,1 (anti -> -1)
    val ev = (burst("a", 0, 1, 0) ++ burst("a", 1, 2, 100) ++ burst("a", 2, 3, 200) ++
      burst("b", 0, 1, 300) ++ burst("b", 1, 4, 400) ++ burst("b", 2, 9, 500) ++
      burst("c", 0, 3, 600) ++ burst("c", 1, 2, 700) ++ burst("c", 2, 1, 800))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.kendallTauDailyTransform(ev).collect()
    val byP = r.map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(byP(("a", "b")).getAs[Double]("kendall_tau_b") == 1.0)
    assert(byP(("a", "c")).getAs[Double]("kendall_tau_b") == -1.0)
    // constant series: every day pair ties on it -> n0 = n1 -> NULL
    val flat = (burst("a", 0, 1, 0) ++ burst("a", 1, 2, 100) ++
      burst("f", 0, 2, 900) ++ burst("f", 1, 2, 950))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rf = operators.Stats.kendallTauDailyTransform(flat).collect()
    assert(rf.length == 1 && rf(0).isNullAt(rf(0).fieldIndex("kendall_tau_b")))
  }

  test("ljung_box_daily: Q >= 0 and grows with the autocorrelated series") {
    val rows = SparkEntry.queries("ljung_box_daily")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("ljung_box_q") >= 0.0)
      assert(r.getAs[Long]("k_lags") <= 7L)
    }
  }

  test("jarque_bera_daily: hand-computed moments on a 1,2,3 series; constant series guards to NULL") {
    import spark.implicits._
    def burst(tp: String, day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, ts(day), 1L, tp, 0.0, "{}"))
    // counts 1,2,3: S1=6 S2=14 S3=36 S4=98 → M2=6, M3=0, M4=54
    // skew = 0, kurt = 54/36 = 1.5, JB = 3/6·((1.5−3)²/4) = 0.28125
    val ev = (burst("a", 0, 1, 0) ++ burst("a", 1, 2, 100) ++ burst("a", 2, 3, 200) ++
      burst("f", 0, 2, 300) ++ burst("f", 1, 2, 400) ++ burst("f", 2, 2, 500))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Timeseries.jarqueBeraDailyTransform(ev).collect()
    val byT = r.map(x => x.getString(0) -> x).toMap
    assert(byT("a").getAs[Long]("n_days") == 3L)
    assert(byT("a").getAs[Double]("skewness") == 0.0)
    assert(byT("a").getAs[Double]("kurtosis") == 1.5)
    assert(byT("a").getAs[Double]("jb_stat") == 0.28125)
    // constant 2,2,2: M2 = 0 → all three stats NULL, not ±inf
    assert(byT("f").isNullAt(byT("f").fieldIndex("skewness")))
    assert(byT("f").isNullAt(byT("f").fieldIndex("jb_stat")))
  }

  test("theil_sen_trend: monotone ramps recover their slope exactly") {
    import spark.implicits._
    def burst(tp: String, day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, ts(day), 1L, tp, 0.0, "{}"))
    // up: 1,2,3 → all three pairwise slopes = 1; down: 3,2,1 → −1
    val ev = (burst("up", 0, 1, 0) ++ burst("up", 1, 2, 100) ++ burst("up", 2, 3, 200) ++
      burst("down", 0, 3, 300) ++ burst("down", 1, 2, 400) ++ burst("down", 2, 1, 500))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Timeseries.theilSenTrendTransform(ev).collect()
    val byT = r.map(x => x.getString(0) -> x).toMap
    assert(byT("up").getAs[Long]("n_pairs") == 3L)
    assert(byT("up").getAs[Double]("ts_slope") == 1.0)
    assert(byT("down").getAs[Double]("ts_slope") == -1.0)
  }

  test("anova_f_cents: hand-computed F on two separated groups; zero-SSW guards to NULL") {
    import spark.implicits._
    // a: 1,3 cents; b: 5,7 cents → SSB = 16, SSW = 4, F = 8, η² = 0.8
    val ev = Seq(
      (1L, ts(0), 1L, "a", 0.01, "{}"), (2L, ts(0), 1L, "a", 0.03, "{}"),
      (3L, ts(0), 1L, "b", 0.05, "{}"), (4L, ts(0), 1L, "b", 0.07, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.anovaFCentsTransform(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("k") == 2L && r(0).getAs[Long]("n_events") == 4L)
    assert(r(0).getAs[Double]("f_stat") == 8.0)
    assert(r(0).getAs[Double]("eta_sq") == 0.8)
    // constant within groups: SSW = 0 → F is NULL (not inf), η² = 1
    val ev0 = Seq(
      (1L, ts(0), 1L, "a", 1.00, "{}"), (2L, ts(0), 1L, "a", 1.00, "{}"),
      (3L, ts(0), 1L, "b", 3.00, "{}"), (4L, ts(0), 1L, "b", 3.00, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r0 = operators.Stats.anovaFCentsTransform(ev0).collect()
    assert(r0(0).isNullAt(r0(0).fieldIndex("f_stat")))
    assert(r0(0).getAs[Double]("eta_sq") == 1.0)
  }

  test("seasonal_strength: dow-determined series scores exactly 1, constant series guards to NULL") {
    import spark.implicits._
    def burst(tp: String, day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, ts(day), 1L, tp, 0.0, "{}"))
    // 2024-01-01 is a Monday (dow 1); 14 days = each dow exactly twice.
    // "w": Mondays get 5 events, every other day 1 -> within-dow
    // variance 0 -> strength exactly 1.0, peak_dow = 1
    val w = (0 until 14).flatMap(d => burst("w", d, if (d % 7 == 0) 5 else 1, d * 10))
    // "f": constant 2/day -> SST = 0 -> NULL; peak tie -> smallest dow
    val f = (0 until 14).flatMap(d => burst("f", d, 2, 1000 + d * 10))
    val ev = (w ++ f).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.seasonalStrengthTransform(ev).collect()
    val byT = r.map(x => x.getString(0) -> x).toMap
    assert(byT("w").getAs[Long]("n_days") == 14L)
    assert(byT("w").getAs[Long]("peak_dow") == 1L)
    assert(byT("w").getAs[Double]("seasonal_strength") == 1.0)
    assert(byT("f").isNullAt(byT("f").fieldIndex("seasonal_strength")))
    assert(byT("f").getAs[Long]("peak_dow") == 0L)
  }

  test("burstiness_index: hand-computed gaps; a metronome scores exactly -1") {
    import spark.implicits._
    // one user: gaps 1s, 2s -> S1=3e6 S2=5e12 -> B = (1e6-3e6)/(1e6+3e6) = -0.5
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "a", 0.0, "{}"),
      (2L, "2024-01-01 00:00:01", 1L, "a", 0.0, "{}"),
      (3L, "2024-01-01 00:00:03", 1L, "a", 0.0, "{}"),
      // metronome: equal gaps -> sigma 0 -> B = -1 exactly
      (4L, "2024-01-01 00:00:00", 1L, "m", 0.0, "{}"),
      (5L, "2024-01-01 00:00:10", 1L, "m", 0.0, "{}"),
      (6L, "2024-01-01 00:00:20", 1L, "m", 0.0, "{}"))
      .map { case (id, t, u, tp, v, p) => (id, java.sql.Timestamp.valueOf(t), u, tp, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Behavior.burstinessIndexTransform(ev).collect()
    val byT = r.map(x => x.getString(0) -> x).toMap
    assert(byT("a").getAs[Long]("n_gaps") == 2L)
    assert(byT("a").getAs[Double]("mean_gap_s") == 1.5)
    assert(byT("a").getAs[Double]("burstiness") == -0.5)
    assert(byT("m").getAs[Double]("burstiness") == -1.0)
  }

  test("first_passage_matrix: target diagonal is zero and the purchase slice equals absorption_steps") {
    val sf = "/root/testdata/sf0.001"
    val m = SparkEntry.queries("first_passage_matrix")(spark, sf).collect()
    assert(m.nonEmpty)
    m.filter(r => r.getString(0) == r.getString(1))
      .foreach(r => assert(r.getAs[Double]("expected_steps") == 0.0))
    val slice = m.filter(_.getString(0) == "purchase")
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).sortBy(_._1).toSeq
    val single = SparkEntry.queries("absorption_steps")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(slice == single)
  }

  test("pacf_daily: lag-1 PACF equals lag-1 ACF identically; constant series guards to NULL") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val acf1 = SparkEntry.queries("acf_daily")(spark, sf).collect()
      .filter(_.getLong(1) == 1L)
      .map(r => r.getString(0) -> (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    val pacf = SparkEntry.queries("pacf_daily")(spark, sf).collect()
    val pacf1 = pacf.filter(_.getLong(1) == 1L)
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(pacf1 == acf1 && pacf1.nonEmpty)
    assert(pacf.forall(_.getLong(1) <= 7L))
    // constant series: the ACF nulls poison every Durbin-Levinson level
    def burst(tp: String, day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, ts(day), 1L, tp, 0.0, "{}"))
    val flat = (0 until 10).flatMap(d => burst("f", d, 2, d * 10))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rf = operators.Timeseries.pacfDailyTransform(flat).collect()
    assert(rf.length == 7 && rf.forall(_.isNullAt(2)))
  }

  test("cross_correlation_daily: a one-day-shifted copy peaks at exactly +1 lag; constant series guard to NULL") {
    import spark.implicits._
    def burst(tp: String, day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, ts(day), 1L, tp, 0.0, "{}"))
    // b is a one-day-delayed copy of a -> ccf(a, b) = 1.0 exactly at
    // lag +1 (sums 4*30-100 over sqrt(20)*sqrt(20)); f is constant
    val ev = (burst("a", 0, 1, 0) ++ burst("a", 1, 2, 100) ++
      burst("a", 2, 3, 200) ++ burst("a", 3, 4, 300) ++
      burst("b", 1, 1, 400) ++ burst("b", 2, 2, 500) ++
      burst("b", 3, 3, 600) ++ burst("b", 4, 4, 700) ++
      (0 to 4).flatMap(d => burst("f", d, 2, 800 + d * 10)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Timeseries.crossCorrelationDailyTransform(ev).collect()
    val byK = r.map(x => (x.getString(0), x.getString(1), x.getLong(2)) -> x).toMap
    assert(byK(("a", "b", 1L)).getAs[Double]("ccf") == 1.0)
    // the peak is unique: lag 0 correlates the misaligned copies
    assert(byK(("a", "b", 0L)).getAs[Double]("ccf") < 1.0)
    // lags with zero day-overlap emit NO row on this 5-day spine
    // (|lag| > 4 has no (t, t+k) pair) — not a null row
    assert(!byK.contains(("a", "f", -7L)) && !byK.contains(("a", "f", 7L)))
    // every OVERLAPPING lag against the constant type is NULL, not inf
    (-4L to 4L).foreach { k =>
      val row = byK(("a", "f", k))
      assert(row.isNullAt(row.fieldIndex("ccf")))
    }
  }

  test("wilcoxon_signed_rank: hand-ranked ties and the exact tie-corrected variance") {
    import spark.implicits._
    def burst(tp: String, day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, ts(day), 1L, tp, 0.0, "{}"))
    // a: 3,1,4,5; b: 1,2,2,2 -> d = 2,-1,2,3; |d| ranks (avg): 1->1,
    // 2->2.5 (x2), 3->4; W2+ = 5+5+8 = 18, E2 = 10, tsum = 6,
    // var12 = 2*4*5*9 - 6 = 354 -> z = 8/sqrt(29.5)
    val ev = (burst("a", 0, 3, 0) ++ burst("a", 1, 1, 100) ++
      burst("a", 2, 4, 200) ++ burst("a", 3, 5, 300) ++
      burst("b", 0, 1, 400) ++ burst("b", 1, 2, 500) ++
      burst("b", 2, 2, 600) ++ burst("b", 3, 2, 700))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.wilcoxonSignedRankTransform(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_nonzero") == 4L)
    assert(r(0).getAs[Long]("w2_plus") == 18L)
    val expected = BigDecimal(8.0 / math.sqrt(354.0 / 12.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getAs[Double]("wilcoxon_z") == expected)
  }

  test("capture_recapture: hand-placed spans across the calendar midpoint") {
    import spark.implicits._
    // 4 days: half = 2 -> A = days 0-1, B = days 2-3.
    // u1 spans both, u2 A only, u3 day1->day2 both, u4 B only:
    // n1 = 3, n2 = 3, m = 2 -> chapman = 16/3 - 1, lincoln = 4.5
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"), (2L, ts(3), 1L, "view", 0.0, "{}"),
      (3L, ts(0), 2L, "view", 0.0, "{}"),
      (4L, ts(1), 3L, "view", 0.0, "{}"), (5L, ts(2), 3L, "view", 0.0, "{}"),
      (6L, ts(3), 4L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Retention.captureRecaptureTransform(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_users_true") == 4L)
    assert(r(0).getAs[Long]("n_first_half") == 3L)
    assert(r(0).getAs[Long]("n_second_half") == 3L)
    assert(r(0).getAs[Long]("n_both") == 2L)
    assert(r(0).getAs[Double]("chapman_estimate") == 4.333333)
    assert(r(0).getAs[Double]("lincoln_estimate") == 4.5)
  }

  test("markov_stationary: a two-state doubly-stochastic chain settles at 50/50") {
    import spark.implicits._
    // a->b and b->a only: the stationary distribution is uniform
    val ev = (0 until 8).map { i =>
      (i.toLong, new Timestamp(ts(0).getTime + i * 1000L), 1L,
        if (i % 2 == 0) "a" else "b", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.markovStationaryTransform(ev).collect()
    assert(r.length == 2)
    r.foreach(row => assert(row.getAs[Double]("stationary_p") == 0.5))
    // corpus: probabilities sum to ~1
    val all = SparkEntry.queries("markov_stationary")(spark, "/root/testdata/sf0.001").collect()
    val s = all.map(_.getAs[Double]("stationary_p")).sum
    assert(math.abs(s - 1.0) < 1e-4)
  }

  test("dow_residual_outliers: a planted spike on one weekday flags, its peers do not") {
    import spark.implicits._
    // 12 quiet same-weekday baselines + one 40-event spike. The
    // population sigma INCLUDES the spike, so a single outlier can
    // only reach z > 3 with K >= ~11 history points (max z =
    // (K-1)/sqrt(K)) — by design: thin histories never flag.
    def dts(day: Int) = new Timestamp(ts(0).getTime + day * 86400000L)
    def burst(day: Int, k: Int, base: Int) =
      (0 until k).map(i => ((base + i).toLong, dts(day), 1L, "a", 0.0, "{}"))
    val ev = ((0 until 12).flatMap(wk => burst(wk * 7, 2, wk * 100)) ++
      burst(84, 40, 5000)).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.dowResidualOutliersTransform(ev).collect()
    val sameDow = r.filter(x => {
      val d = x.getAs[Timestamp]("day").getTime - ts(0).getTime
      d % (7L * 86400000L) == 0
    })
    assert(sameDow.length == 13)
    val flagged = r.filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged.length == 1 && flagged(0).getAs[Long]("n") == 40L)
  }

  test("mutual_info_type_dow: independence gives 0 bits, perfect coupling log2(k)") {
    import spark.implicits._
    // perfect: type a only on day0(dow), b only on day1 -> MI = 1 bit
    val perfect = Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"), (2L, ts(0), 2L, "a", 0.0, "{}"),
      (3L, ts(1), 1L, "b", 0.0, "{}"), (4L, ts(1), 2L, "b", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val mi1 = operators.Stats.mutualInfoTypeDowTransform(perfect).collect()(0)
    assert(mi1.getAs[Double]("mi_bits") == 1.0)
    // independent: both types on both days equally -> 0 bits
    val indep = Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"), (2L, ts(1), 1L, "a", 0.0, "{}"),
      (3L, ts(0), 2L, "b", 0.0, "{}"), (4L, ts(1), 2L, "b", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val mi0 = operators.Stats.mutualInfoTypeDowTransform(indep).collect()(0)
    assert(mi0.getAs[Double]("mi_bits") == 0.0)
  }

  test("absorption_steps: a deterministic a->b->purchase chain counts exact steps") {
    import spark.implicits._
    // one user repeating a,b,purchase: from b the next is ALWAYS
    // purchase (1 step); from a always b (2); purchase -> a -> ... (3)
    // after enough users the chain is deterministic a->b->p->a
    val ev = (0 until 9).map { i =>
      (i.toLong, new Timestamp(ts(0).getTime + i * 1000L), 1L,
        Seq("a", "b", "purchase")(i % 3), 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Stats.absorptionStepsTransform(ev).collect()
    val byT = r.map(x => x.getString(0) -> x.getAs[Double]("expected_steps")).toMap
    assert(byT("purchase") == 0.0)
    assert(byT("b") == 1.0)
    assert(byT("a") == 2.0)
  }

  test("sessions_per_user: planted 1-session and 3-session users bucket correctly") {
    import spark.implicits._
    val base = ts(0).getTime
    def ev(id: Long, u: Long, minute: Long) =
      (id, new Timestamp(base + minute * 60000L), u, "view", 0.0, "{}")
    // u1: single burst (1 session -> bucket 0); u2: three bursts 2h apart
    // (3 sessions -> bucket 1 [2,3])
    val df = Seq(ev(1, 1, 0), ev(2, 1, 5),
      ev(3, 2, 0), ev(4, 2, 120), ev(5, 2, 240))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Retention.sessionsPerUserTransform(df).collect()
    val byB = r.map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("n_users")).toMap
    assert(byB == Map(0L -> 1L, 1L -> 1L))
  }

  test("url_filter: every planted slice fires its own rule") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("url_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (bl, spam, dig, keep) = (r.getAs[Boolean]("blocked_domain"),
        r.getAs[Boolean]("spam_path"), r.getAs[Boolean]("digit_heavy"),
        r.getAs[Boolean]("keep"))
      (id % 8) match {
        case 0 | 1 => assert(bl && !keep, s"doc $id should be domain-blocked")
        case 2     => assert(spam && !bl && !keep, s"doc $id should be spam-path")
        case 3     => assert(dig && !bl && !spam && !keep, s"doc $id should be digit-heavy")
        case _     => assert(keep && !bl && !spam && !dig, s"doc $id should be kept")
      }
    }
  }

  test("kruskal_wallis: hand-computed H on separated groups, exact ranks") {
    import spark.implicits._
    // A: cents {1, 2}; B: cents {3, 4} — pooled ranks 1..4, R_A = 3,
    // R_B = 7; H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4; no ties → C = 1
    val events = Seq(("A", 0.01), ("A", 0.02), ("B", 0.03), ("B", 0.04))
      .toDF("event_type", "value")
    val r = operators.Stats.kruskalWallisTransform(events).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_events") == 4L)
    assert(r(0).getAs[Double]("h") == 2.4)
    assert(r(0).getAs[Double]("h_tie") == 2.4)
  }

  test("kruskal_wallis: all-tied values give H = 0 through the tie path") {
    import spark.implicits._
    val events = Seq(("A", 0.05), ("A", 0.05), ("B", 0.05), ("B", 0.05))
      .toDF("event_type", "value")
    val r = operators.Stats.kruskalWallisTransform(events).collect()
    // every value ties: H = 0 and the correction denominator C = 0 →
    // h_tie must be null, not an Inf/NaN
    assert(r(0).getAs[Double]("h") == 0.0)
    assert(r(0).isNullAt(r(0).fieldIndex("h_tie")))
  }

  test("levene_brown_forsythe: identical |dev-from-median| profiles give W = 0") {
    import spark.implicits._
    // A: {1, 5} low-median 5 → z = {4, 0}; B: {2, 6} low-median 6 →
    // z = {4, 0}: same z distribution in both groups → W = 0
    val events = Seq(("A", 0.01), ("A", 0.05), ("B", 0.02), ("B", 0.06))
      .toDF("event_type", "value")
    val r = operators.Stats.leveneBrownForsytheTransform(events).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("w_stat") == 0.0)
  }

  test("friedman_daily: perfectly consistent daily ordering gives W = 1") {
    import spark.implicits._
    // 3 days, 2 types, A above B every day: per-day ranks fixed →
    // num4 = (12−9)² + (6−9)² = 18, 4A − 4C = 60 − 54 = 6,
    // χ² = 1·18/6 = 3, W = 3/(3·1) = 1
    val rows =
      (1 to 5).map(i => (ts(0), "A")) ++ Seq((ts(0), "B")) ++
      (1 to 4).map(i => (ts(1), "A")) ++ Seq((ts(1), "B"), (ts(1), "B")) ++
      (1 to 3).map(i => (ts(2), "A")) ++ Seq((ts(2), "B"))
    val events = rows.toDF("ts", "event_type")
    val r = operators.Stats.friedmanDailyTransform(events).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_days") == 3L)
    assert(r(0).getAs[Long]("k") == 2L)
    assert(r(0).getAs[Double]("chi2_f") == 3.0)
    assert(r(0).getAs[Double]("kendalls_w") == 1.0)
  }

  test("page_hinkley_daily: a level jump shows as PH mass on the jump day") {
    import spark.implicits._
    // daily means 100,100,100,1100 cents: running means 100,100,100,350;
    // deviations 0,0,0,750 → m = 0,0,0,750, min m = 0 → PH = 750 on day 4
    val events = Seq((ts(0), "v", 1.0), (ts(1), "v", 1.0),
      (ts(2), "v", 1.0), (ts(3), "v", 11.0)).toDF("ts", "event_type", "value")
    val r = operators.Stats.pageHinkleyDailyTransform(events).collect()
      .map(x => (x.getTimestamp(1).toString.take(10), x.getDouble(2))).toSeq
    assert(r == Seq(("2024-01-01", 0.0), ("2024-01-02", 0.0),
      ("2024-01-03", 0.0), ("2024-01-04", 750.0)))
  }

  test("grubbs_daily: hand-computed G with the exact integer argmax") {
    import spark.implicits._
    // daily sums 100,100,100,1100: mean 350, s = 500, max dev 750 →
    // G = 1.5 on the spike day
    val events = Seq((ts(0), "v", 1.0), (ts(1), "v", 1.0),
      (ts(2), "v", 1.0), (ts(3), "v", 11.0)).toDF("ts", "event_type", "value")
    val r = operators.Stats.grubbsDailyTransform(events).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_days") == 4L)
    assert(r(0).getTimestamp(2).toString.take(10) == "2024-01-04")
    assert(r(0).getAs[Long]("cents_star") == 1100L)
    assert(r(0).getAs[Double]("g") == 1.5)
  }

  test("bootstrap_mean_ci: deterministic replicates, Poisson mass near 1 per row") {
    import spark.implicits._
    val events = (1L to 400L).map(i => (i, 0.5 + (i % 7) * 0.01))
      .toDF("event_id", "value")
    val a = operators.Sampling.bootstrapReport(
      operators.Sampling.bootstrapPartial(events, 32)).collect()
    val b = operators.Sampling.bootstrapReport(
      operators.Sampling.bootstrapPartial(events, 32)).collect()
    assert(a.length == 32)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "must be deterministic")
    // each replicate draws Poisson(1) weights over 400 rows: n_eff
    // concentrates near 400 (s.d. 20) — a loose 5σ envelope
    a.foreach { r =>
      val n = r.getAs[Long]("n_eff")
      assert(n > 300 && n < 500, s"replicate ${r.getLong(0)} n_eff=$n")
    }
  }

  test("bootstrap_mean_ci: replicate spread is a real sampling distribution (~ s/sqrt(n))") {
    import spark.implicits._
    // The round-9 advisor found the pre-fix LCG drew near-identical
    // uniforms for every replicate (b only shifted u by ≤2e-4), so
    // the replicate means collapsed to ~1e-6 spread — 100× below the
    // true bootstrap SE. Pin the order of magnitude: for x with
    // sample s.d. s over n rows, the Poisson-bootstrap replicate
    // means must spread like s/√n (within a 3× envelope either way).
    val n = 400
    val vals = (1L to n.toLong).map(i => 0.5 + (i % 7) * 0.01)
    val events = (1L to n.toLong).zip(vals).toDF("event_id", "value")
    val means = operators.Sampling.bootstrapReport(
      operators.Sampling.bootstrapPartial(events, 32)).collect()
      .map(_.getAs[Double]("mean_value"))
    val mu = means.sum / means.length
    val sd = math.sqrt(means.map(m => (m - mu) * (m - mu)).sum / (means.length - 1))
    val s = {
      val vm = vals.sum / n
      math.sqrt(vals.map(v => (v - vm) * (v - vm)).sum / (n - 1))
    }
    val se = s / math.sqrt(n.toDouble)
    assert(sd > se / 3.0 && sd < se * 3.0,
      s"replicate s.d. $sd vs expected SE $se — replicates are " +
        "correlated (too small) or broken (too large)")
  }

  test("cms_top_items: estimate is never below truth and collision-free here") {
    import spark.implicits._
    // 3 hot items (120/80/60 of 300) + 40 singleton ids: d=4 × w=512
    // rows make a collision across ALL 4 rows for a 43-key domain
    // essentially impossible, so the min-estimate equals the truth;
    // the one-sided bound est ≥ exact is the CMS guarantee itself
    val ids = Seq.fill(120)(7L) ++ Seq.fill(80)(13L) ++ Seq.fill(60)(29L) ++
      (1000L until 1040L)
    val events = ids.zipWithIndex
      .map { case (k, i) => (i.toLong, s"""{"k": $k}""") }
      .toDF("event_id", "props")
    val items = events.select(
      org.apache.spark.sql.functions.get_json_object(
        org.apache.spark.sql.functions.col("props"), "$.k").cast("long").as("item"))
    val out = operators.Sketches.cmsTopFromState(
      operators.Sketches.cmsCountersTransform(items), items).collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(7L -> 120L, 13L -> 80L, 29L -> 60L),
      s"heavy hitters with exact-equal estimates, got $got")
    assert(out.forall(_.getAs[Long]("n_total") == 300L))
  }

  test("nb_lang_classifier: separable two-language corpus gives a diagonal confusion matrix") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat", "en", "a", 7L), (2L, "the dog", "en", "a", 7L),
      (3L, "le chat", "fr", "a", 7L), (4L, "le chien", "fr", "a", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.CorpusQa.nbLangClassifierTransform(docs).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq(("en", "en", 2L), ("fr", "fr", 2L)))
  }

  test("pivot_type_dow oracle parity shape: counts land in the right dow column") {
    import spark.implicits._
    // 2024-01-01 is a Monday -> dow 1; 2024-01-07 a Sunday -> dow 0
    val events = Seq((ts(0), "v"), (ts(0), "v"), (ts(6), "v"))
      .toDF("ts", "event_type")
    val out = events
      .select($"event_type",
        (org.apache.spark.sql.functions.dayofweek($"ts") - 1).cast("long").as("dow"))
      .groupBy($"event_type").pivot("dow", (0L to 6L).map(java.lang.Long.valueOf))
      .count().na.fill(0L).collect()
    assert(out(0).getLong(1) == 1L, "Sunday count in dow_0")
    assert(out(0).getLong(2) == 2L, "Monday count in dow_1")
  }

  test("heavy_changers: hand-computed share deltas, exact integer ordering") {
    import spark.implicits._
    // first half: item 7 x3, item 8 x1; second half: item 7 x1, item 8 x3
    // N1 = N2 = 4 -> deltas -0.5 / +0.5, equal |score| -> item 7 first
    val rows =
      Seq.fill(3)((ts(0), """{"k": 7}""")) ++ Seq((ts(0), """{"k": 8}""")) ++
      Seq((ts(19), """{"k": 7}""")) ++ Seq.fill(3)((ts(19), """{"k": 8}"""))
    val events = rows.toDF("ts", "props")
    val out = operators.Timeseries.heavyChangersTransform(events).collect()
      .map(r => (r.getLong(0), r.getDouble(5))).toSeq
    assert(out == Seq((7L, -0.5), (8L, 0.5)))
  }

  test("markov_attribution: hand-computed removal effects on a two-journey chain") {
    import spark.implicits._
    // u1: view -> click -> purchase (converts); u2: view -> error (does not)
    // chain: START->view x2, view->click, click->CONV, view->error, error->NULL
    // p(START) = 1/2; removing click or view kills all conversion (RE = 1),
    // removing error changes nothing (RE = 0); shares 0.5 / 0 / 0.5;
    // signup never appears -> RE = 0, share 0
    val events = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 0.0),
      (1L, 2L, "2024-01-01 10:01:00", "click", 0.0),
      (1L, 3L, "2024-01-01 10:02:00", "purchase", 5.0),
      (2L, 4L, "2024-01-01 11:00:00", "view", 0.0),
      (2L, 5L, "2024-01-01 11:01:00", "error", 0.0)
    ).toDF("user_id", "event_id", "tss", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("tss"))).drop("tss")
    val r = operators.MultiTouch.markovAttributionTransform(events).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4))).toSeq
    assert(r == Seq(
      ("click", 500000L, 0L, 1.0, 0.5),
      ("error", 500000L, 500000L, 0.0, 0.0),
      ("signup", 500000L, 500000L, 0.0, 0.0),
      ("view", 500000L, 0L, 1.0, 0.5)))
  }

  test("jackknife_ratio: hand-computed LOO ratios on a two-day series") {
    import spark.implicits._
    // days: (100c, 1 event), (300c, 1 event) -> LOO ratios 300 and 100,
    // mean 200, SSE 20000, SE = sqrt(1/2 * 20000) = 100; ratio = 200
    val events = Seq((ts(0), "v", 1.0), (ts(1), "v", 3.0))
      .toDF("ts", "event_type", "value")
    val r = operators.Stats.jackknifeRatioTransform(events).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_days") == 2L)
    assert(r(0).getAs[Double]("ratio_cents") == 200.0)
    assert(r(0).getAs[Double]("jack_se") == 100.0)
  }

  test("ab_cuped: a perfectly linear covariate removes ALL variance and equalizes arms") {
    import spark.implicits._
    // y = 3x exactly → θ = 3, ρ² = 1, and every arm's adjusted mean
    // collapses to 3·mean_x_pooled = 3·(10+20+30+40)/4 = 75.
    val users = Seq(
      (0L, 10L, 30L), (2L, 30L, 90L),   // arm 0
      (1L, 20L, 60L), (3L, 40L, 120L)   // arm 1
    ).toDF("user_id", "pre_cents", "post_cents")
    val r = operators.Experiments.cupedFromUsers(users).collect()
    assert(r.map(_.getAs[Long]("arm")).toSeq == Seq(0L, 1L))
    r.foreach { row =>
      assert(row.getAs[Double]("theta") == 3.0)
      assert(row.getAs[Double]("var_reduction") == 1.0)
      assert(row.getAs[Double]("cuped_mean_cents") == 75.0)
    }
    // raw means differ (60 vs 90); CUPED sees through the covariate
    assert(r.map(_.getAs[Double]("mean_post_cents")).toSeq == Seq(60.0, 90.0))
  }

  test("ab_cuped: zero covariate variance yields NULL adjustment, raw means survive") {
    import spark.implicits._
    val users = Seq((0L, 5L, 10L), (1L, 5L, 30L)).toDF("user_id", "pre_cents", "post_cents")
    val r = operators.Experiments.cupedFromUsers(users).collect()
    assert(r.forall(_.isNullAt(r(0).fieldIndex("theta"))))
    assert(r.map(_.getAs[Double]("mean_post_cents")).toSeq == Seq(10.0, 30.0))
  }

  test("conformal_interval: hand-computed rank on a planted grid") {
    import spark.implicits._
    // train (even ids): values all 10.00 → center 1000 cents.
    // calibration (odd ids): 9 values at distances 0..8 (cents 1000..1008)
    // → n_cal = 9, k = ⌈10·0.9⌉ = 9 → half-width = 8.
    val train = (0 until 4).map(i => (2L * i, ts(1), 1L, "t", 10.00, "{}"))
    val cal = (0 until 9).map(i => (2L * i + 1, ts(2), 1L, "t", 10.00 + i / 100.0, "{}"))
    val events = (train ++ cal)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Experiments.conformalFromGrid(
      operators.Experiments.conformalGrid(events)).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("center_cents") == 1000L)
    assert(r(0).getAs[Long]("n_cal") == 9L)
    assert(r(0).getAs[Long]("half_width_cents") == 8L)
    assert(r(0).getAs[Long]("lo_cents") == 992L && r(0).getAs[Long]("hi_cents") == 1008L)
  }

  test("conformal_interval: k > n_cal surfaces NULL bounds, never a clamp") {
    import spark.implicits._
    // n_cal = 2 → k = ⌈3·0.9⌉ = 3 > 2 → unbounded interval.
    val events = Seq(
      (0L, ts(1), 1L, "t", 10.0, "{}"), (2L, ts(1), 1L, "t", 10.0, "{}"),
      (1L, ts(2), 1L, "t", 10.5, "{}"), (3L, ts(2), 1L, "t", 11.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Experiments.conformalFromGrid(
      operators.Experiments.conformalGrid(events)).collect()
    assert(r.length == 1)
    assert(r(0).isNullAt(r(0).fieldIndex("half_width_cents")))
    assert(r(0).isNullAt(r(0).fieldIndex("lo_cents")))
  }

  test("hill_tail_index: exact decade ladder gives hill = ln(10)·(0+1+2)/2/... by hand") {
    import spark.implicits._
    // cents {1000, 100, 10}, k = 3: qln = {6907755, 4605170, 2302585};
    // hill_raw = (13815510 − 3·2302585)/2/1e6 = 3.4538775 → 3.4539;
    // α = 1/3.4538775 = 0.28953 → 0.2895.
    val users = Seq((1L, 1000L), (2L, 100L), (3L, 10L)).toDF("user_id", "cents")
    val r = operators.Stats.hillFromUsers(users, k = 3).collect()
    assert(r(0).getAs[Long]("n_tail") == 3L)
    assert(r(0).getAs[Long]("xk_cents") == 10L)
    assert(r(0).getAs[Double]("hill") == 3.4539)
    assert(r(0).getAs[Double]("alpha") == 0.2895)
  }

  test("ab_cuped pre-period: fixed min(ts)+15d cutoff survives a two-month corpus") {
    import spark.implicits._
    // Two months of events for one user: the corpus starts Jan 1, so
    // the pre-period is [Jan 1, Jan 16). A Feb 10 event has
    // dayofmonth = 10 <= 15 — the old calendar-resetting boundary
    // would misfile it as "pre"; the fixed cutoff keeps it in post.
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.00), // pre (corpus start)
      (1L, Timestamp.valueOf("2024-01-15 23:00:00"), 2.00), // pre (< Jan 16 00:00)
      (1L, Timestamp.valueOf("2024-01-16 00:00:00"), 4.00), // post (boundary is exclusive)
      (1L, Timestamp.valueOf("2024-02-10 00:00:00"), 8.00)  // post — the regression case
    ).toDF("user_id", "ts", "value")
    val cutoff = operators.Experiments.preCutoff(ev)
    assert(cutoff == Timestamp.valueOf("2024-01-16 00:00:00"))
    val r = operators.Experiments.userPrePost(ev, cutoff).collect()(0)
    assert(r.getAs[Long]("pre_cents") == 300L)
    assert(r.getAs[Long]("post_cents") == 1200L)
  }

  test("ab_srm_check: balanced census passes, a 9:1 skew raises the loud alarm") {
    import spark.implicits._
    val balanced = (0L until 10L).toDF("user_id")
    val b = operators.Experiments.srmFromUsers(balanced).collect()(0)
    assert(b.getAs[Double]("chi2") == 0.0 && !b.getAs[Boolean]("srm_flag"))
    // 18 even ids vs 2 odd: χ² = (18−2)²/20 = 12.8 > 10.83 → flag
    val skewed = ((0L until 36L by 2L) ++ Seq(1L, 3L)).toDF("user_id")
    val s = operators.Experiments.srmFromUsers(skewed).collect()(0)
    assert(s.getAs[Double]("chi2") == 12.8 && s.getAs[Boolean]("srm_flag"))
  }

  test("k_anonymity grid: negative values (refunds) bucket by FLOOR, matching DuckDB //") {
    import spark.implicits._
    // value −15.00 → cents −1500 → floor(−1.5) = bucket −2 (truncating
    // div would say −1, diverging from the DuckDB oracle's `// 1000`);
    // value −20.00 → cents −2000 → exactly −2 (multiple boundary).
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "refund", -15.00),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), "refund", -20.00),
      (3L, Timestamp.valueOf("2024-01-01 00:00:00"), "buy", 15.00)
    ).toDF("user_id", "ts", "event_type", "value")
    val buckets = operators.Experiments.anonymityGrid(ev)
      .select("user_id", "cents_bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(1L) == -2L)
    assert(buckets(2L) == -2L)
    assert(buckets(3L) == 1L)
  }

  test("qte_deciles: a planted constant location shift shows at every decile") {
    import spark.implicits._
    // arm 0: cents 1..10 once each; arm 1: the same + 5 — every
    // decile's order statistic differs by exactly 5.
    val grid = ((1L to 10L).map(c => (0L, c, 1L)) ++ (1L to 10L).map(c => (1L, c + 5L, 1L)))
      .toDF("arm", "cents", "cnt")
    val r = operators.Experiments.qteFromGrid(grid).collect()
    assert(r.map(_.getAs[Long]("q")).toSeq == (10L to 90L by 10L).toSeq)
    assert(r.forall(_.getAs[Long]("qte_cents") == 5L))
    // and the k-th order statistic itself is the hand value ⌈qn/100⌉
    assert(r.map(_.getAs[Long]("arm0_cents")).toSeq == (1L to 9L).toSeq)
  }

  /** Independent straight-Scala learn_bpe (Sennrich 2016): same
    * counting (every adjacent index), same total order, same greedy
    * non-overlapping re-segmentation. */
  private def refBpe(words: Seq[(String, Long)],
                     rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var seg: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector :+ "_", c) }
    val out = scala.collection.mutable.ListBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- seg; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
        out += ((r.toLong, a, b, a + b, n))
        seg = seg.map { case (s, c) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { buf += a + b; i += 2 }
            else { buf += s(i); i += 1 }
          }
          (buf.result(), c)
        }
        r += 1
      }
    }
    out.toSeq
  }

  test("bpe_train: hand-traced planted dictionary, three rounds") {
    import spark.implicits._
    // {"aaab"×3, "ab"×2}: r1 (a,a)=6; r2 tie (a,b)=(b,_)=5 → lexicographic
    // (a,b); r3 after re-segmentation (ab,_)=5.
    val vocab = Seq(("aaab", 3L), ("ab", 2L)).toDF("word", "cnt")
    val got = operators.TextOps.bpeTrainFromVocab(vocab, rounds = 3)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4))).toSeq
    assert(got == Seq((1L, "a", "a", "aa", 6L), (2L, "a", "b", "ab", 5L), (3L, "ab", "_", "ab_", 5L)))
  }

  test("bpe_train equals the independent straight-Scala learn_bpe on real data") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = operators.TextOps.wordFreqTransform(docs)
    val expect = refBpe(
      vocab.collect().map(x => (x.getString(0), x.getLong(1))).toSeq, rounds = 8)
    val got = operators.TextOps.bpeTrainFromVocab(vocab, rounds = 8)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4))).toSeq
    assert(got == expect)
  }

  test("stratified_ate: planted constant within-stratum effect, weights sum to 1") {
    import spark.implicits._
    // 20 users; pre = user_id so strata are clean rank deciles of 2;
    // post = 100 for arm 0 (even ids), 150 for arm 1 → every stratum
    // with both arms shows diff = 50, and Σ weight = 1.
    val users = (0L until 20L).map(u => (u, u, if (u % 2 == 1) 150L else 100L))
      .toDF("user_id", "pre_cents", "post_cents")
    val r = operators.Experiments.stratifiedAteFromUsers(users).collect()
    assert(math.abs(r.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
    r.foreach { row =>
      if (row.getAs[Long]("n1") > 0 && row.getAs[Long]("n0") > 0)
        assert(row.getAs[Double]("diff_cents") == 50.0)
    }
    // adjacent-rank strata of 2 pair one even with one odd id each
    assert(r.length == 10 && r.forall(x => x.getAs[Long]("n_d") == 2L))
  }

  test("ab_peeking_curve: identical arms give z = 0 at every look, info_frac reaches 1") {
    import spark.implicits._
    val events = Seq(
      (0L, ts(1), 0L, "t", 0.10, "{}"), (1L, ts(1), 1L, "t", 0.10, "{}"),
      (2L, ts(1), 2L, "t", 0.20, "{}"), (3L, ts(1), 3L, "t", 0.20, "{}"),
      (4L, ts(2), 4L, "t", 0.30, "{}"), (5L, ts(2), 5L, "t", 0.30, "{}"),
      (6L, ts(2), 6L, "t", 0.40, "{}"), (7L, ts(2), 7L, "t", 0.40, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Experiments.peekingFromGrid(
      operators.Experiments.peekingGrid(events)).collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Double]("z_welch") == 0.0))
    assert(r.map(_.getAs[Double]("info_frac")).toSeq == Seq(0.5, 1.0))
  }

  test("offpolicy_eval: boosting the high-reward action raises V_IPS above V_logging") {
    import spark.implicits._
    // two actions: purchase pays 100, view pays 10; logging plays
    // each half the time → V_log = 55. Target boosts purchase to
    // prob 1/2... equal here (T=2 → pi1 uniform = logging) — so use
    // shares 3:1 against purchase: pi0(purchase)=1/4, w(purchase) =
    // 0.5/0.25 = 2, w(view) = 0.5/0.75 = 2/3.
    // V_log = (1·100 + 3·10)/4 = 32.5
    // V_IPS = (100·2 + 30·2/3)/4 = 220/4 = 55.0
    // SNIPS: Σw = 1·2 + 3·2/3 = 4 → V_SNIPS = 220/4 = 55.0
    // ESS = 4²/(1·4 + 3·4/9) = 16/5.333333 = 3.0
    val grid = Seq(("purchase", 100L, 1L), ("view", 10L, 3L)).toDF("event_type", "cents", "c")
    val r = operators.Experiments.offpolicyFromGrid(grid).collect()(0)
    assert(r.getAs[Double]("v_logging") == 32.5)
    assert(r.getAs[Double]("v_ips") == 55.0)
    assert(r.getAs[Double]("v_snips") == 55.0)
    assert(r.getAs[Double]("ess") == 3.0)
  }

  test("k_anonymity_check: a planted lonely cell fails both gates") {
    import spark.implicits._
    // cell A: 6 records from 3 users → k and l both pass.
    // cell B: 2 records from 1 user → fails both.
    val events = (
      (0 until 6).map(i => (i.toLong, ts(1), (i % 3).toLong, "a", 5.00, "{}")) ++
      Seq((10L, ts(1), 9L, "b", 50.00, "{}"), (11L, ts(1), 9L, "b", 50.00, "{}"))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Experiments.kAnonymityFromGrid(
      operators.Experiments.anonymityGrid(events)).collect()
    val byType = r.map(x => x.getAs[String]("event_type") -> x).toMap
    assert(byType("a").getAs[Long]("n_records") == 6L)
    assert(byType("a").getAs[Long]("n_users") == 3L)
    assert(byType("a").getAs[Boolean]("k_anon_5") && byType("a").getAs[Boolean]("l_div_3"))
    assert(byType("b").getAs[Long]("n_records") == 2L)
    assert(byType("b").getAs[Long]("n_users") == 1L)
    assert(!byType("b").getAs[Boolean]("k_anon_5") && !byType("b").getAs[Boolean]("l_div_3"))
  }

  test("bpe_fertility_by_source: hand-traced bills under the trained merges") {
    import spark.implicits._
    // pooled dict {"aaab": 3 (src A), "ab": 2 (src B)}, rounds = 3
    // (the bpe_train hand-trace): final segs "aaab" → [aa, ab_] wait —
    // r3 merges (ab,_): "aaab" → [aa, ab, _] → [aa, ab_] = 2 tokens;
    // "ab" → [ab, _] → [ab_] = 1 token.
    // src A: 3 words, 12 chars, 6 tokens → fertility 2.0, cpt 2.0;
    // src B: 2 words, 4 chars, 2 tokens → fertility 1.0, cpt 2.0.
    val grid = Seq(("A", "aaab", 3L), ("B", "ab", 2L)).toDF("source", "word", "c")
    val r = operators.TextOps.bpeFertilityFromGrid(grid, rounds = 3)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5))).toSeq
    assert(r == Seq(("A", 3L, 12L, 6L, 2.0, 2.0), ("B", 2L, 4L, 2L, 1.0, 2.0)))
  }

  test("dsir_importance: disjoint-vocabulary corpus separates target from off-target") {
    import spark.implicits._
    // en docs speak only {alpha beta}, zh docs only {gamma delta}:
    // every en feature bucket is target-heavy, every zh bucket has
    // ct = 0 → en weights must be strictly positive, zh strictly
    // negative (ln p_t < ln p_r on every zh bucket).
    val docs = Seq(
      (1L, "alpha beta alpha", "en", "a", 16L),
      (2L, "beta alpha beta", "en", "a", 15L),
      (3L, "gamma delta gamma", "zh", "b", 17L),
      (4L, "delta gamma delta", "zh", "b", 17L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.CorpusQa.dsirFromDocBuckets(
      operators.CorpusQa.dsirDocBuckets(docs))
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Double]("log_weight"))).toMap
    assert(r(1L) > 0 && r(2L) > 0, s"target docs must score positive: $r")
    assert(r(3L) < 0 && r(4L) < 0, s"off-target docs must score negative: $r")
  }

  test("dsir_importance on testdata: target-language mean weight dominates") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val w = operators.CorpusQa.dsirFromDocBuckets(operators.CorpusQa.dsirDocBuckets(docs))
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy(($"lang" === "en").as("is_target"))
      .agg(avg($"log_weight").as("m"))
      .collect().map(x => (x.getAs[Boolean]("is_target"), x.getAs[Double]("m"))).toMap
    assert(w(true) > w(false),
      s"en docs should out-score the rest under an en-target DSIR: $w")
  }

  test("hill_tail_index: boundary ties contribute zero — value-multiset determined") {
    import spark.implicits._
    // top-3 of {100, 10, 10, 10}: ties at the k-th value add 0 terms.
    val users = Seq((1L, 100L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("user_id", "cents")
    val r = operators.Stats.hillFromUsers(users, k = 3).collect()
    // hill_raw = (qln(100) − qln(10))/2/1e6 = 2302585/2e6 = 1.1512925
    assert(r(0).getAs[Double]("hill") == 1.1513)
  }
}
