package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-touch attribution models — linear, position-based
  * (U-shaped) and time-decay — completing the attribution family
  * begun by [[Behavior.attributionTransform]] (last-touch) and
  * [[Behavior.firstTouchTransform]] (first-touch). The reference
  * routes the enriched engagement stream to its analytics sink
  * exactly so marketing can answer "which touch gets the credit"
  * (`src/process.py:43-76`); last/first-touch are the degenerate
  * single-winner models, these three split the credit.
  *
  * Scale shape: linear and position need only per-type touch COUNTS
  * and the first/last touch inside the lookback, so both run as ONE
  * moving-RANGE window pass per user partition — no
  * touches×conversions join, constant state per row. Time-decay is
  * the one model whose credit depends on every touch's individual
  * age, so it uses a bounded interval join (the
  * [[graft.streaming.EngagementStream]] interval-join shape):
  * fan-out is capped by touches-per-user-per-lookback, and the
  * join is co-partitioned on `user_id`. A dyadic carry-forward trick
  * (sum of `2^(t/halflife)` in the window, cancelled at the
  * conversion) would avoid the join but overflows IEEE doubles once
  * the corpus spans ~2800 half-lives, so the bounded join is the
  * shape that survives an unbounded time axis — the same
  * finite-range discipline as the exact-decimal EWMA numerator
  * ([[Behavior]] `ewmaFromDaily`).
  *
  * All three emit the same shape as last/first-touch:
  * `(touch_type, n_conversions, attributed_value)` where
  * `n_conversions` counts conversions crediting that type (a
  * conversion with both view and click touches counts under both)
  * and credits sum to the conversion's full `value`.
  */
object MultiTouch {

  private val lookbackUs = 7L * 86400 * 1000000L

  /** Linear attribution: every touch (view/click) inside the
    * lookback shares the conversion's value equally. Only the
    * per-type counts matter, so one RANGE-frame window pass carrying
    * `n_views`/`n_clicks` replaces the naive credit join.
    */
  def linearTransform(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-lookbackUs, -1L)
    events.select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("n_views", count(when(col("event_type") === "view", 1)).over(w))
      .withColumn("n_clicks", count(when(col("event_type") === "click", 1)).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("n_touch", col("n_views") + col("n_clicks"))
      .select(explode(expr(
        """CASE WHEN n_touch = 0
          |     THEN array(named_struct('touch_type', 'none', 'credit', value))
          |     ELSE filter(array(
          |            named_struct('touch_type', 'view',  'credit', value * n_views  / n_touch),
          |            named_struct('touch_type', 'click', 'credit', value * n_clicks / n_touch)),
          |          s -> CASE s.touch_type WHEN 'view' THEN n_views ELSE n_clicks END > 0)
          |END""".stripMargin)).as("cr"))
      .groupBy(col("cr.touch_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
           round(sum(col("cr.credit")), 2).as("attributed_value"))
      .orderBy(col("touch_type"))
  }

  def attributionLinear(spark: SparkSession, dir: String): DataFrame =
    linearTransform(Tables.events(spark, dir))

  /** Oracle for [[linearTransform]]: identical window counts, the
    * credit fan-out written as UNION ALL instead of explode. */
  val linearOracleSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      |c AS (SELECT *,
      |             count(CASE WHEN event_type = 'view'  THEN 1 END) OVER w AS n_views,
      |             count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_clicks
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                   RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
      |p AS (SELECT value, n_views, n_clicks, n_views + n_clicks AS n_touch
      |      FROM c WHERE event_type = 'purchase'),
      |cr AS (SELECT 'none' AS touch_type, value AS credit FROM p WHERE n_touch = 0
      |       UNION ALL SELECT 'view',  value * n_views  / n_touch FROM p WHERE n_views  > 0
      |       UNION ALL SELECT 'click', value * n_clicks / n_touch FROM p WHERE n_clicks > 0)
      |SELECT touch_type, count(*) AS n_conversions, round(sum(credit), 2) AS attributed_value
      |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin

  /** Position-based (U-shaped) attribution: 40% to the first touch,
    * 40% to the last, the middle 20% split equally over interior
    * touches; degenerate cases n=1 → 100%, n=2 → 50/50. First/last
    * are `min/max(struct(ts, event_id, type))` over the same RANGE
    * frame as [[linearTransform]] — still one window pass, still no
    * credit join; interior counts derive from the per-type counts
    * minus the endpoint indicator.
    */
  def positionTransform(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-lookbackUs, -1L)
    val touch = when(col("event_type").isin("view", "click"),
      struct(col("ts"), col("event_id"), col("event_type")))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("n_views", count(when(col("event_type") === "view", 1)).over(w))
      .withColumn("n_clicks", count(when(col("event_type") === "click", 1)).over(w))
      .withColumn("f", min(touch).over(w))
      .withColumn("l", max(touch).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("n_touch", col("n_views") + col("n_clicks"))
      .withColumn("sv", positionShare("view"))
      .withColumn("sc", positionShare("click"))
      .select(explode(expr(
        """CASE WHEN n_touch = 0
          |     THEN array(named_struct('touch_type', 'none', 'credit', value))
          |     ELSE filter(array(
          |            named_struct('touch_type', 'view',  'credit', value * sv),
          |            named_struct('touch_type', 'click', 'credit', value * sc)),
          |          s -> CASE s.touch_type WHEN 'view' THEN sv ELSE sc END > 0)
          |END""".stripMargin)).as("cr"))
      .groupBy(col("cr.touch_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
           round(sum(col("cr.credit")), 2).as("attributed_value"))
      .orderBy(col("touch_type"))
  }

  /** The U-shape share of `t` given window columns
    * `n_views/n_clicks/n_touch/f/l` — written once, instantiated per
    * type, and kept textually identical to the oracle's formula so
    * both engines run the same IEEE arithmetic. */
  private def positionShare(t: String) = expr(
    s"""CASE WHEN n_touch = 1 THEN CASE WHEN f.event_type = '$t' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
       |     WHEN n_touch = 2 THEN CAST(0.5 AS DOUBLE) * CASE WHEN f.event_type = '$t' THEN 1 ELSE 0 END
       |                         + CAST(0.5 AS DOUBLE) * CASE WHEN l.event_type = '$t' THEN 1 ELSE 0 END
       |     ELSE CAST(0.4 AS DOUBLE) * CASE WHEN f.event_type = '$t' THEN 1 ELSE 0 END
       |        + CAST(0.4 AS DOUBLE) * CASE WHEN l.event_type = '$t' THEN 1 ELSE 0 END
       |        + CAST(0.2 AS DOUBLE) * (CASE '$t' WHEN 'view' THEN n_views ELSE n_clicks END
       |                 - CASE WHEN f.event_type = '$t' THEN 1 ELSE 0 END
       |                 - CASE WHEN l.event_type = '$t' THEN 1 ELSE 0 END) / (n_touch - 2)
       |END""".stripMargin)

  def attributionPosition(spark: SparkSession, dir: String): DataFrame =
    positionTransform(Tables.events(spark, dir))

  /** Oracle for [[positionTransform]]: same window pass, same share
    * formula, UNION ALL credit fan-out. */
  val positionOracleSql: String = {
    def share(t: String) =
      s"""CASE WHEN n_touch = 1 THEN CASE WHEN f.event_type = '$t' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
         |            WHEN n_touch = 2 THEN CAST(0.5 AS DOUBLE) * CASE WHEN f.event_type = '$t' THEN 1 ELSE 0 END
         |                                + CAST(0.5 AS DOUBLE) * CASE WHEN l.event_type = '$t' THEN 1 ELSE 0 END
         |            ELSE CAST(0.4 AS DOUBLE) * CASE WHEN f.event_type = '$t' THEN 1 ELSE 0 END
         |               + CAST(0.4 AS DOUBLE) * CASE WHEN l.event_type = '$t' THEN 1 ELSE 0 END
         |               + CAST(0.2 AS DOUBLE) * (CASE '$t' WHEN 'view' THEN n_views ELSE n_clicks END
         |                        - CASE WHEN f.event_type = '$t' THEN 1 ELSE 0 END
         |                        - CASE WHEN l.event_type = '$t' THEN 1 ELSE 0 END) / (n_touch - 2)
         |       END""".stripMargin
    s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value FROM events),
       |c AS (SELECT *,
       |             count(CASE WHEN event_type = 'view'  THEN 1 END) OVER w AS n_views,
       |             count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_clicks,
       |             min(CASE WHEN event_type IN ('view','click')
       |                      THEN {'ts': ts, 'eid': event_id, 'event_type': event_type} END) OVER w AS f,
       |             max(CASE WHEN event_type IN ('view','click')
       |                      THEN {'ts': ts, 'eid': event_id, 'event_type': event_type} END) OVER w AS l
       |      FROM e
       |      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |                   RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
       |p AS (SELECT value, n_views, n_clicks, n_views + n_clicks AS n_touch, f, l,
       |             ${share("view")} AS sv,
       |             ${share("click")} AS sc
       |      FROM c WHERE event_type = 'purchase'),
       |cr AS (SELECT 'none' AS touch_type, value AS credit FROM p WHERE n_touch = 0
       |       UNION ALL SELECT 'view',  value * sv FROM p WHERE sv > 0
       |       UNION ALL SELECT 'click', value * sc FROM p WHERE sc > 0)
       |SELECT touch_type, count(*) AS n_conversions, round(sum(credit), 2) AS attributed_value
       |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Time-decay attribution: each touch is weighted
    * `0.5^(age / half-life)` against the conversion it precedes, so
    * each touch's individual age matters and the credit genuinely
    * needs the (conversion, touch) pairs. Implemented as the bounded
    * interval join (fan-out ≤ touches-per-user-per-lookback,
    * co-partitioned on `user_id`, left join keeps no-touch
    * conversions) followed by a per-conversion weight aggregate —
    * the per-conversion table is conversions-sized, not pair-sized,
    * before anything global happens.
    */
  def timeDecayTransform(events: DataFrame, halfLifeDays: Double = 1.0): DataFrame = {
    val e = events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    val conv = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"), col("value"))
    val touch = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_uid"), col("ts").as("t_ts"), col("event_type").as("t_type"))
    conv.join(touch,
        col("user_id") === col("t_uid") && col("t_ts") < col("c_ts") &&
          col("t_ts") >= col("c_ts") - expr("INTERVAL 7 DAYS"), "left")
      .withColumn("w", pow(lit(0.5),
        (unix_micros(col("c_ts")) - unix_micros(col("t_ts"))).cast("double") /
          (halfLifeDays * 86400e6)))
      .groupBy(col("c_id"))
      .agg(first(col("value")).as("value"),
           sum(when(col("t_type") === "view", col("w"))).as("wv"),
           sum(when(col("t_type") === "click", col("w"))).as("wc"))
      .withColumn("wt", coalesce(col("wv"), lit(0.0)) + coalesce(col("wc"), lit(0.0)))
      .select(explode(expr(
        """CASE WHEN wt = 0
          |     THEN array(named_struct('touch_type', 'none', 'credit', value))
          |     ELSE filter(array(
          |            named_struct('touch_type', 'view',  'credit', value * coalesce(wv, 0.0) / wt),
          |            named_struct('touch_type', 'click', 'credit', value * coalesce(wc, 0.0) / wt)),
          |          s -> coalesce(CASE s.touch_type WHEN 'view' THEN wv ELSE wc END, 0.0) > 0)
          |END""".stripMargin)).as("cr"))
      .groupBy(col("cr.touch_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
           round(sum(col("cr.credit")), 2).as("attributed_value"))
      .orderBy(col("touch_type"))
  }

  def attributionTimeDecay(spark: SparkSession, dir: String): DataFrame =
    timeDecayTransform(Tables.events(spark, dir))

  /** Oracle for [[timeDecayTransform]]: the same bounded interval
    * join and weight formula. */
  val timeDecayOracleSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value FROM events),
      |conv AS (SELECT user_id, ts AS c_ts, event_id AS c_id, value FROM e WHERE event_type = 'purchase'),
      |touch AS (SELECT user_id AS t_uid, ts AS t_ts, event_type AS t_type FROM e
      |          WHERE event_type IN ('view','click')),
      |j AS (SELECT c.c_id, c.value, t.t_type,
      |             pow(0.5, CAST(epoch_us(c.c_ts) - epoch_us(t.t_ts) AS DOUBLE) / 86400000000.0) AS w
      |      FROM conv c LEFT JOIN touch t
      |        ON t.t_uid = c.user_id AND t.t_ts < c.c_ts AND t.t_ts >= c.c_ts - INTERVAL 7 DAY),
      |g AS (SELECT c_id, any_value(value) AS value,
      |             sum(CASE WHEN t_type = 'view'  THEN w END) AS wv,
      |             sum(CASE WHEN t_type = 'click' THEN w END) AS wc,
      |             coalesce(sum(CASE WHEN t_type = 'view'  THEN w END), 0.0)
      |             + coalesce(sum(CASE WHEN t_type = 'click' THEN w END), 0.0) AS wt
      |      FROM j GROUP BY c_id),
      |cr AS (SELECT 'none' AS touch_type, value AS credit FROM g WHERE wt = 0
      |       UNION ALL SELECT 'view',  value * wv / wt FROM g WHERE wv > 0
      |       UNION ALL SELECT 'click', value * wc / wt FROM g WHERE wc > 0)
      |SELECT touch_type, count(*) AS n_conversions, round(sum(credit), 2) AS attributed_value
      |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin

  /** Markov-chain (removal-effect) attribution — the data-driven
    * member of the attribution family (Anderl et al. 2014; the
    * heuristic models above assign credit by POSITION, this one by
    * COUNTERFACTUAL: how much conversion probability disappears if a
    * channel is deleted from the journey graph). The standard gold
    * standard in marketing analytics.
    *
    * Model: one journey per user, truncated at the FIRST purchase
    * (absorbing CONV) — non-converters end in absorbing NULL; START
    * precedes the first touch. Transition counts form the chain;
    * conversion probability p(START) comes from a fixed-K absorbing
    * value iteration in EXACT scaled integers (v ∈ [0, 10⁶],
    * truncating division — bit-identical in both engines, the
    * [[Stats.absorptionFromCounts]] discipline). Channel c's removal
    * redirects every transition INTO c to NULL (rows out of c drop —
    * unreachable), p recomputes, and
    * removal_effect(c) = 1 − p₋c/p, share(c) = (p − p₋c)/Σ(p − p₋u)
    * with the share an exact-integer ratio divided ONCE.
    *
    * Shape: one lag-window pass to the |types|²-cell transition
    * grid; the value iterations are driver folds over that
    * planning-scale matrix (the LPA/absorption discipline), one per
    * channel + one full — ≤ 6 folds of a ≤ 7×7 matrix. Channels are
    * static (the corpus's four non-purchase kinds) because the
    * unrolled oracle must be static SQL. */
  def markovAttributionTransform(events: DataFrame,
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      iters: Int = 25): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val seq0 = events.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("rn", row_number().over(w))
    val pcut = seq0.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"rn").as("prn"))
    val j = seq0.join(pcut, Seq("user_id"), "left")
      .filter($"prn".isNull || $"rn" <= $"prn")
      .select($"user_id", $"rn",
        when($"event_type" === "purchase", lit("CONV"))
          .otherwise($"event_type").as("st"))
    val wj = Window.partitionBy($"user_id").orderBy($"rn")
    val trans = j
      .withColumn("prev", coalesce(lag($"st", 1).over(wj), lit("START")))
      .select($"prev", $"st".as("curr"))
    val terminal = j
      .withColumn("mx", max($"rn").over(Window.partitionBy($"user_id")))
      .filter($"rn" === $"mx" && $"st" =!= "CONV")
      .select($"st".as("prev"), lit("NULL").as("curr"))
    markovFromCounts(
      trans.unionByName(terminal)
        .groupBy($"prev", $"curr").agg(count(lit(1)).as("n")),
      channels, iters)
  }

  /** The removal-effect derivation from an already-aggregated (prev,
    * curr, n) transition table (terminal NULL rows included) — split
    * out so the STREAMING twin reads it over
    * [[graft.streaming.MarkovAttrState]]'s additive counts + frontier. */
  private[graft] def markovFromCounts(countsDf: DataFrame,
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      iters: Int = 25): DataFrame = {
    val spark = countsDf.sparkSession
    import spark.implicits._
    val counts = countsDf.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    // driver fold: absorbing value iteration over the count matrix
    def convProb(cells: Seq[(String, String, Long)]): BigInt = {
      val types = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
      val idx = types.zipWithIndex.toMap
      val d = types.length
      val c = Array.ofDim[Long](d, d)
      cells.foreach { case (a, b, n) => c(idx(a))(idx(b)) = n }
      val rs = Array.tabulate(d)(i => c(i).sum)
      val conv = idx.get("CONV")
      var v = Array.tabulate(d)(i => if (conv.contains(i)) BigInt(1000000) else BigInt(0))
      for (_ <- 1 to iters) {
        val next = Array.tabulate(d) { i =>
          if (conv.contains(i)) BigInt(1000000)
          else if (rs(i) == 0) BigInt(0)
          else (0 until d).iterator.filter(jx => c(i)(jx) != 0)
            .map(jx => v(jx) * c(i)(jx) / rs(i)).sum
        }
        v = next
      }
      idx.get("START").map(v).getOrElse(BigInt(0))
    }
    def removed(ch: String): Seq[(String, String, Long)] =
      counts.toSeq.filter(_._1 != ch)
        .map { case (a, b, n) => (a, if (b == ch) "NULL" else b, n) }
        .groupBy(t => (t._1, t._2)).map { case ((a, b), xs) => (a, b, xs.map(_._3).sum) }
        .toSeq
    val pFull = convProb(counts.toSeq)
    val pRem = channels.map(ch => ch -> convProb(removed(ch)))
    val sumDrop = pRem.map { case (_, p) => pFull - p }.sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    pRem.map { case (ch, p) =>
      val re = if (pFull > 0) Some(r6(1.0 - p.toDouble / pFull.toDouble)) else None
      val sh = if (sumDrop > 0) Some(r6((pFull - p).toDouble / sumDrop.toDouble)) else None
      (ch, pFull.toLong, p.toLong, re, sh)
    }.toDF("channel", "p_full6", "p_removed6", "removal_effect", "share")
      .orderBy($"channel")
  }

  def markovAttribution(spark: SparkSession, dir: String): DataFrame =
    markovAttributionTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[markovAttributionTransform]] — the identical
    * integer value iteration unrolled per variant (full + one per
    * removed channel), [[Stats.absorptionStepsOracleSql]]'s style. */
  def markovAttributionOracleSql(
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      iters: Int = 25): String = {
    def chain(tag: String): String = {
      val iter = (k: Int) =>
        s"""v${tag}_$k AS MATERIALIZED (
           |  SELECT t.st,
           |         CASE WHEN t.st = 'CONV' THEN CAST(1000000 AS HUGEINT)
           |              WHEN coalesce(c.rs, 0) = 0 THEN CAST(0 AS HUGEINT)
           |              ELSE coalesce((SELECT sum(p.v * c2.n // c2.rs)
           |                             FROM cells_$tag c2 JOIN v${tag}_${k - 1} p ON p.st = c2.curr
           |                             WHERE c2.prev = t.st), 0)
           |         END AS v
           |  FROM tys_$tag t
           |  LEFT JOIN (SELECT DISTINCT prev, rs FROM cells_$tag) c ON c.prev = t.st)""".stripMargin
      s"""cells_$tag AS MATERIALIZED (
         |  SELECT prev, curr, CAST(n AS HUGEINT) AS n,
         |         CAST(sum(n) OVER (PARTITION BY prev) AS HUGEINT) AS rs
         |  FROM cnt_$tag),
         |tys_$tag AS MATERIALIZED (SELECT DISTINCT t AS st FROM (
         |  SELECT prev AS t FROM cnt_$tag UNION SELECT curr FROM cnt_$tag)),
         |v${tag}_0 AS MATERIALIZED (
         |  SELECT st, CASE WHEN st = 'CONV' THEN CAST(1000000 AS HUGEINT)
         |                  ELSE CAST(0 AS HUGEINT) END AS v FROM tys_$tag),
         |${(1 to iters).map(iter).mkString(",\n")},
         |p_$tag AS MATERIALIZED (
         |  SELECT coalesce((SELECT v FROM v${tag}_$iters WHERE st = 'START'), 0) AS p)""".stripMargin
    }
    val removalCnts = channels.map { ch =>
      s"""cnt_$ch AS MATERIALIZED (
         |  SELECT prev, CASE WHEN curr = '$ch' THEN 'NULL' ELSE curr END AS curr,
         |         sum(n) AS n
         |  FROM cnt_full WHERE prev <> '$ch' GROUP BY 1, 2)""".stripMargin
    }
    val chains = chain("full") +: channels.map(chain)
    val drops = channels.map(ch => s"(SELECT p FROM p_full) - (SELECT p FROM p_$ch)")
      .mkString(" + ")
    val rows = channels.map { ch =>
      s"""SELECT '$ch' AS channel,
         |       CAST((SELECT p FROM p_full) AS BIGINT) AS p_full6,
         |       CAST((SELECT p FROM p_$ch) AS BIGINT) AS p_removed6,
         |       CASE WHEN (SELECT p FROM p_full) > 0 THEN
         |         round(1.0 - CAST((SELECT p FROM p_$ch) AS DOUBLE)
         |               / CAST((SELECT p FROM p_full) AS DOUBLE), 6) END AS removal_effect,
         |       CASE WHEN ($drops) > 0 THEN
         |         round(CAST((SELECT p FROM p_full) - (SELECT p FROM p_$ch) AS DOUBLE)
         |               / CAST($drops AS DOUBLE), 6) END AS share""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH seq0 AS (
       |  SELECT user_id, event_type,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
       |  FROM events),
       |pcut AS (SELECT user_id, min(rn) AS prn FROM seq0
       |         WHERE event_type = 'purchase' GROUP BY 1),
       |j AS MATERIALIZED (
       |  SELECT s.user_id, s.rn,
       |         CASE WHEN s.event_type = 'purchase' THEN 'CONV' ELSE s.event_type END AS st
       |  FROM seq0 s LEFT JOIN pcut p ON p.user_id = s.user_id
       |  WHERE p.prn IS NULL OR s.rn <= p.prn),
       |trans AS (
       |  SELECT coalesce(lag(st) OVER (PARTITION BY user_id ORDER BY rn), 'START') AS prev,
       |         st AS curr
       |  FROM j),
       |term AS (
       |  SELECT st AS prev, 'NULL' AS curr
       |  FROM (SELECT st, rn, max(rn) OVER (PARTITION BY user_id) AS mx FROM j)
       |  WHERE rn = mx AND st <> 'CONV'),
       |cnt_full AS MATERIALIZED (
       |  SELECT prev, curr, count(*) AS n FROM (
       |    SELECT * FROM trans UNION ALL SELECT * FROM term)
       |  GROUP BY 1, 2),
       |${removalCnts.mkString(",\n")},
       |${chains.mkString(",\n")}
       |$rows
       |ORDER BY channel""".stripMargin
  }
}
