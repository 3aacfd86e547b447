package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-semantics pins for the round-8 additions: censoring in the
  * KM estimator, incremental-SCD2 ≡ rebuild at arbitrary cut points,
  * cross-batch boundary pairs in the transitions stream, planted-
  * graph BFS/clustering-coefficient truth, the zero-variance ACF
  * guard, and winsorized-mean outlier immunity. The DuckDB oracle
  * gate checks sf0.01 equality; these pin the DESIGNED edge behavior
  * on frames small enough to verify by hand. */
class TimeseriesCorpusSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  override def afterAll(): Unit = GraftCaches.clearAll()

  import TestSession._

  private def ts(day: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")

  test("survival_km: censored users stay in the risk set, product-limit exact") {
    import spark.implicits._
    // 3 viewers on day 0; u1 converts day 2, u2 day 5, u3 never
    // (censored at the horizon = corpus max day = day 5)
    val events = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(0), 2L, "view", 0.0, "{}"),
      (3L, ts(0), 3L, "view", 0.0, "{}"),
      (4L, ts(2), 1L, "purchase", 0.0, "{}"),
      (5L, ts(5), 2L, "purchase", 0.0, "{}"),
      (6L, ts(5), 3L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val km = operators.Timeseries.survivalKmTransform(events).collect()
    assert(km.map(_.getLong(0)).toSeq == Seq(2L, 5L))
    val byDur = km.map(r => r.getLong(0) -> r).toMap
    // t=2: 3 at risk, 1 event -> S = 2/3; t=5: 2 at risk, 1 event -> S = 1/3
    assert(byDur(2L).getLong(1) == 3L && byDur(2L).getLong(2) == 1L)
    assert(math.abs(byDur(2L).getDouble(3) - 0.666667) < 1e-6)
    assert(byDur(5L).getLong(1) == 2L && byDur(5L).getLong(2) == 1L)
    assert(math.abs(byDur(5L).getDouble(3) - 0.333333) < 1e-6)
  }

  test("scd2_apply_batch equals the full rebuild at ANY time cut") {
    val events = graft.sources.Tables.events(spark, sf)
      .withColumn("us", unix_micros(col("ts")))
    val full = operators.Engagement.cdcScd2Transform(events)
      .collect().map(_.toString).sorted
    // contract: batch = all events at-or-after the cut TIME (any cut)
    for (frac <- Seq(0.1, 0.5, 0.9)) {
      val cut = events.stat.approxQuantile("us", Array(frac), 0.0)(0).toLong
      val applied = operators.Engagement.scd2ApplyTransform(
        operators.Engagement.cdcScd2Transform(events.filter(col("us") < cut)),
        events.filter(col("us") >= cut))
        .collect().map(_.toString).sorted
      assert(applied.sameElements(full), s"scd2 apply diverged from rebuild at frac=$frac")
    }
  }

  test("stream_transitions: cross-batch boundary pairs are reconstructed") {
    val streamed = streaming.TransitionStream.streamTransitions(spark, sf)
      .collect().map(_.toString).sorted
    val batch = SparkEntry.queries("event_transitions")(spark, sf)
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  test("TransitionState replay guard: re-merged batch changes nothing") {
    import spark.implicits._
    val work = GraftCaches.trackTempDir("graft_trans_spec_")
    val st = new streaming.TransitionState(s"$work/state")
    val b = Seq(
      (1L, ts(0, 1), 7L, "view", 0.0, "{}"),
      (2L, ts(0, 2), 7L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    st.merge(b, 0L)
    val once = st.report(spark).collect().map(_.toString).sorted
    st.merge(b, 0L) // replayed batch id — must be a no-op
    val twice = st.report(spark).collect().map(_.toString).sorted
    assert(once.sameElements(twice))
    assert(once.length == 1) // view -> click
  }

  test("bfs_distances: planted path graph, bounded depth, NULL beyond it") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("item_a", "item_b")
    // top-degree seed under (deg DESC, item) is item 2 (deg 2, lowest id)
    val d = operators.Graph.bfsDistancesTransform(path, nSeeds = 1, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(d(2L).contains(0L) && d(1L).contains(1L) && d(3L).contains(1L) && d(4L).contains(2L))
    assert(d(5L).isEmpty, "3 hops from the seed must be NULL at maxDepth=2")
  }

  test("clustering_coefficient: triangle members 10000 bp, broker lower, pendant 0") {
    import spark.implicits._
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("item_a", "item_b")
    val cc = operators.Graph.clusteringCoefficientTransform(g)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(cc(1L) == 10000L && cc(2L) == 10000L)
    assert(cc(3L) == 3333L) // deg 3, 1 triangle: 2*10^4/6
    assert(cc(4L) == 0L)    // degree-1 pendant
  }

  test("acf_daily: constant daily series yields NULL acf, not NaN") {
    import spark.implicits._
    val events = (0 until 5).map(d =>
      (d.toLong, ts(d), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val acf = operators.Timeseries.acfDailyTransform(events, maxLag = 2).collect()
    assert(acf.nonEmpty && acf.forall(_.isNullAt(3)))
  }

  test("winsorized_stats: one absurd outlier cannot move the winsorized mean") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i.toLong, ts(0, i % 24), i.toLong, "view", 1.0, "{}")) :+
      (101L, ts(1), 101L, "view", 1.0e7, "{}") // a mis-keyed 10^9-cent event
    val w = operators.Behavior.winsorizedStatsTransform(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect()
    assert(w.length == 1)
    val r = w(0)
    assert(r.getLong(2) == 100L && r.getLong(3) == 100L) // q05 = q95 = 100 cents
    assert(math.abs(r.getDouble(4) - 100.0) < 1e-9, "winsorized mean must ignore the outlier")
  }

  test("rolling_corr_daily: identical series correlate at exactly 1") {
    import spark.implicits._
    // value 0.01 -> each day's cents equals its event count, x == y
    val events = (0 until 8).flatMap(d => (0 until (d % 3 + 1)).map(i =>
      ((d * 10 + i).toLong, ts(d, i + 1), i.toLong, "view", 0.01, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Timeseries.rollingCorrDailyTransform(events).collect()
    // first window has one day (zero variance -> NULL); later full
    // windows see x == y with variance -> exactly 1.0
    assert(out.head.isNullAt(4))
    assert(out.drop(2).forall(r => math.abs(r.getDouble(4) - 1.0) < 1e-12))
  }

  test("stream_acf / stream_rolling_corr / stream_survival equal their batch twins") {
    for ((sName, bName) <- Seq(
        "stream_acf" -> "acf_daily",
        "stream_rolling_corr" -> "rolling_corr_daily",
        "stream_survival" -> "survival_km")) {
      val s = SparkEntry.queries(sName)(spark, sf).collect().map(_.toString).sorted
      val b = SparkEntry.queries(bName)(spark, sf).collect().map(_.toString).sorted
      assert(s.sameElements(b), s"$sName diverged from $bName")
    }
  }

  test("SurvivalState: view and purchase split across batches still pair up") {
    import spark.implicits._
    val work = GraftCaches.trackTempDir("graft_surv_spec_")
    val st = new streaming.SurvivalState(s"$work/state")
    def b(rows: Seq[(Long, Timestamp, Long, String)]) =
      rows.map { case (e, t, u, ty) => (e, t, u, ty, 0.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    st.merge(b(Seq((1L, ts(0), 1L, "view"), (2L, ts(0), 2L, "view"))), 0L)
    st.merge(b(Seq((3L, ts(3), 1L, "purchase"), (4L, ts(6), 2L, "click"))), 1L)
    val km = st.report(spark).collect()
    // u1 converts at 3; u2 censored at horizon(6) - 0 = 6
    assert(km.length == 1 && km(0).getLong(0) == 3L)
    assert(km(0).getLong(1) == 2L) // both at risk at t=3
    assert(math.abs(km(0).getDouble(3) - 0.5) < 1e-9)
  }

  test("embedding_outliers: a planted far vector ranks first in its label") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.1f, 0.1f), 0),
      (2L, Array(0.1f, 0.1f), 0),
      (3L, Array(0.9f, 0.9f), 0), // the planted outlier
      (4L, Array(0.5f, 0.5f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = operators.VectorOps.embeddingOutliersTransform(vecs, topK = 2).collect()
    val top0 = out.filter(_.getLong(0) == 0L).minBy(_.getLong(1))
    assert(top0.getLong(2) == 3L, "farthest-from-centroid vec must rank 1")
    // the singleton label sits exactly on its centroid
    val solo = out.filter(_.getLong(0) == 1L)
    assert(solo.length == 1 && math.abs(solo(0).getDouble(3)) < 1e-9)
  }

  test("url_canonicalize: all four surface variants collapse to one page") {
    import spark.implicits._
    val docs = (0L until 8L).map(i => (i, s"doc$i", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.CorpusQa.urlCanonicalizeTransform(docs).collect()
    assert(out.forall(_.getLong(4) == 4L), "every group holds its 4 variants")
    assert(out.count(_.getBoolean(5)) == 2, "one representative per logical page")
    val canon0 = out.filter(_.getLong(0) < 4).map(_.getString(2)).distinct
    assert(canon0.toSeq == Seq("example.com/p0?a=1&b=2"))
  }

  test("stream_scd2 equals the full-log batch rebuild") {
    val s = streaming.CdcCompact.streamScd2(spark, sf).collect().map(_.toString).sorted
    val b = SparkEntry.queries("cdc_scd2")(spark, sf).collect().map(_.toString).sorted
    assert(s.sameElements(b))
  }

  test("degree_assortativity: a star graph is perfectly disassortative") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("item_a", "item_b")
    val r = operators.Graph.degreeAssortativityTransform(star).collect()(0)
    assert(r.getLong(0) == 8L) // 4 undirected edges, symmetric
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-9)
  }

  test("graph_components: two planted components with correct sizes") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("item_a", "item_b")
    val out = operators.Graph.graphComponentsTransform(g)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 3L) && out(2L) == (1L, 3L) && out(3L) == (1L, 3L))
    assert(out(10L) == (10L, 2L) && out(11L) == (10L, 2L))
  }

  test("stream_user_lifecycle / stream_dau_wau_mau equal their batch twins") {
    for ((sName, bName) <- Seq(
        "stream_user_lifecycle" -> "user_lifecycle",
        "stream_dau_wau_mau" -> "dau_wau_mau")) {
      val s = SparkEntry.queries(sName)(spark, sf).collect().map(_.toString).sorted
      val b = SparkEntry.queries(bName)(spark, sf).collect().map(_.toString).sorted
      assert(s.sameElements(b), s"$sName diverged from $bName")
    }
  }

  test("time_weighted_value: a value held 10x longer weighs 10x") {
    import spark.implicits._
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:10"), 1L, "view", 100.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 00:00:11"), 1L, "view", 7.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Timeseries.timeWeightedValueTransform(events).collect()
    assert(out.length == 1 && out(0).getLong(1) == 2L)
    // (100c*10s + 10000c*1s) / 11s = 1000c exactly
    assert(math.abs(out(0).getDouble(2) - 1000.0) < 1e-9)
  }

  test("user_revenue_percentile: exact basis points on a 4-user ladder") {
    import spark.implicits._
    val events = (1 to 4).map(u =>
      (u.toLong, ts(0, u), u.toLong, "purchase", u.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Behavior.userRevenuePercentileTransform(events)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (2500L, 1000L) && out(2L) == (5000L, 3000L))
    assert(out(3L) == (7500L, 6000L) && out(4L) == (10000L, 10000L))
  }

  test("stream_winsorized / stream_time_weighted equal their batch twins") {
    for ((sName, bName) <- Seq(
        "stream_winsorized" -> "winsorized_stats",
        "stream_time_weighted" -> "time_weighted_value")) {
      val s = SparkEntry.queries(sName)(spark, sf).collect().map(_.toString).sorted
      val b = SparkEntry.queries(bName)(spark, sf).collect().map(_.toString).sorted
      assert(s.sameElements(b), s"$sName diverged from $bName")
    }
  }

  test("TwaState: an interval spanning the batch boundary lands on the earlier day") {
    import spark.implicits._
    val work = GraftCaches.trackTempDir("graft_twa_spec_")
    val st = new streaming.TwaState(s"$work/state")
    def b(rows: Seq[(Long, Timestamp, Long, Double)]) =
      rows.map { case (e, t, u, v) => (e, t, u, "view", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // batch 0 ends day 0 with value 2.00 held OPEN; batch 1 opens day 1
    st.merge(b(Seq((1L, Timestamp.valueOf("2024-01-01 23:59:50"), 1L, 2.0))), 0L)
    st.merge(b(Seq((2L, Timestamp.valueOf("2024-01-02 00:00:10"), 1L, 9.0)),
               ), 1L)
    val out = st.report(spark).collect()
    // one interval: 20 s at 200 cents, accrued to day 0 (the earlier event's day)
    assert(out.length == 1)
    assert(out(0).getAs[java.sql.Timestamp]("day").toString.startsWith("2024-01-01"))
    assert(math.abs(out(0).getDouble(2) - 200.0) < 1e-9)
  }

  test("boilerplate_score: a planted shared template scores high, unique text low") {
    import spark.implicits._
    val tmpl = "subscribe to our newsletter for updates today"
    val docs = Seq(
      (0L, s"alpha beta gamma delta epsilon $tmpl", "en", "src0", 1L),
      (1L, s"one two three four five $tmpl", "en", "src0", 1L),
      (2L, s"red green blue yellow purple $tmpl", "en", "src0", 1L),
      (3L, "totally unique words nobody else repeats anywhere here", "en", "src0", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.CorpusQa.boilerplateScoreTransform(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(0L) > 0L && out(1L) > 0L && out(2L) > 0L,
      "template 5-grams shared by 3 docs must score > 0 bp")
    assert(out(3L) == 0L, "unique doc must score 0 bp")
  }

  test("ma_crossover: a planted revenue surge fires a golden cross") {
    import spark.implicits._
    // day offsets past Jan 31 need epoch math, not a formatted literal
    val jan1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = (0 until 35).map { d =>
      val v = if (d < 30) 1.0 else 100.0
      (d.toLong, new Timestamp(jan1 + d * 86400000L), 1L, "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Timeseries.maCrossoverTransform(events).collect()
    assert(out.length == 35 - 27) // full windows only
    val crosses = out.filter(!_.isNullAt(4)).map(r => r.getString(4))
    assert(crosses.contains("golden"), "the surge day must label a golden cross")
    // flat history: equal means -> sig 0, no cross before the surge
    assert(out.takeWhile(_.getLong(3) == 0L).forall(_.isNullAt(4)))
  }

  test("hard_negatives: the nearest SAME-label vector is never returned") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),  // query
      (1L, Array(1.0f, 0.0f), 0),  // identical but same label -> excluded
      (2L, Array(0.7f, 0.7f), 1)   // different label -> the hard negative
    ).toDF("vec_id", "embedding", "label")
    val out = operators.VectorOps.hardNegativesTransform(vecs, k = 1, nQueries = 1).collect()
    assert(out.length == 1 && out(0).getLong(3) == 2L)
  }

  test("asof_join_tolerance equals asof_join within tolerance, NULL beyond") {
    val tol = SparkEntry.queries("asof_join_tolerance")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    val base = SparkEntry.queries("asof_join")(spark, sf).collect()
    base.foreach { b =>
      val t = tol(b.getLong(0))
      val withinTol = !b.isNullAt(4) && {
        val gapDays = java.time.temporal.ChronoUnit.DAYS.between(
          b.getTimestamp(4).toLocalDateTime.toLocalDate,
          b.getTimestamp(1).toLocalDateTime.toLocalDate)
        gapDays <= 7
      }
      if (withinTol) assert(t.getLong(3) == b.getLong(3), s"event ${b.getLong(0)} should keep its match")
      else assert(t.isNullAt(3), s"event ${b.getLong(0)} beyond tolerance must be NULL")
    }
  }

  test("dataset_card: one exact-integer header row") {
    val r = SparkEntry.queries("dataset_card")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) > 0 && row.getLong(6) <= row.getLong(7))
    assert(row.getLong(9) >= 0 && row.getLong(9) <= 10000)
  }

  test("stream_dataset_card / stream_ma_crossover equal their batch twins") {
    for ((sName, bName) <- Seq(
        "stream_dataset_card" -> "dataset_card",
        "stream_ma_crossover" -> "ma_crossover")) {
      val s = SparkEntry.queries(sName)(spark, sf).collect().map(_.toString).sorted
      val b = SparkEntry.queries(bName)(spark, sf).collect().map(_.toString).sorted
      assert(s.sameElements(b), s"$sName diverged from $bName")
    }
  }

  test("type_mix_drift: a planted composition flip registers, steady mix near zero") {
    import spark.implicits._
    val jan1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // days 0-9: 1 view + 1 click per day; day 10: clicks only
    val steady = (0 until 10).flatMap(d => Seq(
      (d * 2L, new Timestamp(jan1 + d * 86400000L), 1L, "view", 0.0, "{}"),
      (d * 2 + 1L, new Timestamp(jan1 + d * 86400000L), 2L, "click", 0.0, "{}")))
    val flip = Seq((100L, new Timestamp(jan1 + 10 * 86400000L), 1L, "click", 0.0, "{}"),
      (101L, new Timestamp(jan1 + 10 * 86400000L), 2L, "click", 0.0, "{}"))
    val events = (steady ++ flip)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Timeseries.typeMixDriftTransform(events)
      .collect().map(r => r.getAs[Timestamp]("day").getTime -> r.getDouble(3)).toMap
    val steadyDay = jan1 + 5 * 86400000L
    val flipDay = jan1 + 10 * 86400000L
    assert(math.abs(out(steadyDay)) < 1e-9, "identical mix must drift 0")
    assert(math.abs(out(flipDay) - 0.5) < 1e-9, "50/50 -> 0/100 is TV 0.5")
  }

  test("item_adoption: an item with all engagement on launch day scores 10000 bp") {
    import spark.implicits._
    val jan1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = Seq(
      (1L, new Timestamp(jan1), 1L, "view", 0.0, """{"k": 7}"""),
      (2L, new Timestamp(jan1), 2L, "view", 0.0, """{"k": 7}"""),
      (3L, new Timestamp(jan1), 1L, "view", 0.0, """{"k": 9}"""),
      (4L, new Timestamp(jan1 + 20 * 86400000L), 2L, "view", 0.0, """{"k": 9}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Behavior.itemAdoptionTransform(events)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(7L) == 10000L)
    assert(out(9L) == 5000L) // 1 of 2 events in the first 3 days
  }

  test("script_detect: planted scripts dominate, ASCII docs stay latin") {
    val out = SparkEntry.queries("script_detect")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    out.foreach { case (id, script) =>
      val expected = (id % 5) match {
        case 1 => "cyrillic"; case 2 => "cjk"; case 3 => "arabic"; case _ => "latin"
      }
      assert(script == expected, s"doc $id: got $script, expected $expected")
    }
  }

  test("stream_type_mix_drift / stream_item_adoption equal their batch twins") {
    for ((sName, bName) <- Seq(
        "stream_type_mix_drift" -> "type_mix_drift",
        "stream_item_adoption" -> "item_adoption")) {
      val s = SparkEntry.queries(sName)(spark, sf).collect().map(_.toString).sorted
      val b = SparkEntry.queries(bName)(spark, sf).collect().map(_.toString).sorted
      assert(s.sameElements(b), s"$sName diverged from $bName")
    }
  }

  test("ItemDayCountState: a late back-dating batch re-dates the launch") {
    import spark.implicits._
    val jan1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val work = GraftCaches.trackTempDir("graft_adopt_spec_")
    val st = new streaming.ItemDayCountState(s"$work/state")
    def b(rows: Seq[(Long, Long)]) = // (event_id, day offset)
      rows.map { case (e, d) =>
        (e, new Timestamp(jan1 + d * 86400000L), 1L, "view", 0.0, """{"k": 5}""") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    st.merge(b(Seq((1L, 10L), (2L, 10L))), 0L) // first seen day 10
    val before = st.report(spark).collect()(0)
    assert(before.getLong(4) == 10000L)
    st.merge(b(Seq((3L, 0L))), 1L) // LATE batch: the real launch was day 0
    val after = st.report(spark).collect()(0)
    // first_day re-dates to day 0; the day-10 events leave the early window
    assert(after.getAs[Timestamp]("first_day").getTime == jan1)
    assert(after.getLong(4) == 3333L, "1 of 3 events inside the re-dated early window")
  }

  test("embedding_covariance: full upper triangle, PSD diagonal") {
    val cov = SparkEntry.queries("embedding_covariance")(spark, sf).collect()
    val dims = cov.map(_.getLong(0)).max
    assert(cov.length == (dims * (dims + 1) / 2).toInt)
    assert(cov.filter(r => r.getLong(0) == r.getLong(1))
      .forall(_.getDouble(3) >= 0.0), "variances (diagonal) must be non-negative")
  }
}
