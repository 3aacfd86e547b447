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

  test("embedding_covariance: full upper triangle, PSD diagonal") {
    val cov = SparkEntry.queries("embedding_covariance")(spark, sf).collect()
    val dims = cov.map(_.getLong(0)).max
    assert(cov.length == (dims * (dims + 1) / 2).toInt)
    assert(cov.filter(r => r.getLong(0) == r.getLong(1))
      .forall(_.getDouble(3) >= 0.0), "variances (diagonal) must be non-negative")
  }
}
