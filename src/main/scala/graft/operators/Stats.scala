package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distribution-comparison statistics over the engagement fact and
  * the document corpus — the hypothesis-test layer that sits on the
  * same exact-sufficient-statistics discipline as
  * [[Behavior.abWelchTtestTransform]] (reference scope: the
  * engagement pipeline's per-type aggregates, `process.py`'s windowed
  * stats, extended to the comparison tests an experimentation stack
  * runs downstream of them). Every statistic here reduces the fact
  * table to a bounded grid (value support, contingency cells, length
  * support) in ONE map-side-combinable shuffle, does exact integer /
  * decimal arithmetic on the grid, and divides into floats once per
  * output row — so Spark and DuckDB agree bit-for-bit without any
  * float-sum ordering assumption.
  */
object Stats {

  /** Two-sample Kolmogorov–Smirnov distance between every pair of
    * sources on document length — the distribution-drift test behind
    * "did provider X start sending truncated pages": D = max over
    * the pooled length support of |F̂_a − F̂_b|, computed EXACTLY as
    * max |cum_a·n_b − cum_b·n_a| (an integer) divided once at the
    * end. Ties and unequal supports are handled by evaluating on the
    * union support with per-source cumulative counts.
    *
    * Shape: fact collapses to (source, len) counts in one shuffle
    * (support is bounded by max doc length, not |docs|); the
    * cumulative curves are per-source windows over that grid; the
    * pairing is a |sources|²-wide equi-join ON THE GRID. Nothing
    * fact-scale ever joins. The integer numerator holds in a Long to
    * ~3e9 docs per source (cum·n < 9.2e18); past that, swap the two
    * products to DECIMAL(38,0) — the comparison itself is unchanged.
    */
  def ksDoclenSourcesTransform(docs: DataFrame): DataFrame =
    ksFromCounts(docs
      .select(col("source"), length(col("text")).cast("long").as("len"))
      .groupBy(col("source"), col("len")).agg(count(lit(1)).as("c")))

  /** The KS derivation from an already-aggregated (source, len, c)
    * grid — split out so the STREAMING twin reads it over
    * [[graft.streaming.SourceLenState]]'s additive state (length
    * counts add across micro-batches; the ECDF comparison is a
    * whole-grid read). */
  private[graft] def ksFromCounts(counts0: DataFrame): DataFrame = {
    val spark = counts0.sparkSession
    import spark.implicits._
    val counts = counts0
    val ns = counts.groupBy($"source").agg(sum($"c").as("n"))
    // union support × sources, zero-filled, then per-source ECDF counts
    val grid = counts.select($"len").distinct()
    val cum = ns.select($"source").crossJoin(grid)
      .join(counts, Seq("source", "len"), "left")
      .select($"source", $"len", coalesce($"c", lit(0L)).as("c"))
      .withColumn("cum", sum($"c").over(
        Window.partitionBy($"source").orderBy($"len")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(ns, Seq("source"))
    val a = cum.select($"source".as("source_a"), $"len",
      $"cum".as("cum_a"), $"n".as("n_a"))
    val b = cum.select($"source".as("source_b"), $"len",
      $"cum".as("cum_b"), $"n".as("n_b"))
    a.join(b, Seq("len")).filter($"source_a" < $"source_b")
      .groupBy($"source_a", $"source_b", $"n_a", $"n_b")
      .agg(max(abs($"cum_a" * $"n_b" - $"cum_b" * $"n_a")).as("d_num"))
      .select($"source_a", $"source_b", $"n_a", $"n_b", $"d_num",
        round($"d_num" / ($"n_a" * $"n_b").cast("double"), 6).as("ks"))
      .orderBy($"source_a", $"source_b")
  }

  def ksDoclenSources(spark: SparkSession, dir: String): DataFrame =
    ksDoclenSourcesTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[ksDoclenSourcesTransform]]. */
  val ksDoclenSourcesOracleSql: String =
    """WITH c AS (SELECT source, CAST(length(text) AS BIGINT) AS len, count(*) AS c
      |           FROM documents GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
      |grid AS (SELECT DISTINCT len FROM c),
      |cum0 AS (SELECT s.source, g.len, coalesce(c.c, 0) AS c
      |         FROM ns s CROSS JOIN grid g
      |         LEFT JOIN c ON c.source = s.source AND c.len = g.len),
      |cum AS (SELECT source, len,
      |               sum(c) OVER (PARTITION BY source ORDER BY len
      |                            ROWS UNBOUNDED PRECEDING) AS cum
      |        FROM cum0),
      |j AS (SELECT a.source AS source_a, b.source AS source_b,
      |             na.n AS n_a, nb.n AS n_b,
      |             abs(a.cum * nb.n - b.cum * na.n) AS d
      |      FROM cum a JOIN cum b ON a.len = b.len AND a.source < b.source
      |      JOIN ns na ON na.source = a.source
      |      JOIN ns nb ON nb.source = b.source)
      |SELECT source_a, source_b, n_a, n_b, CAST(max(d) AS BIGINT) AS d_num,
      |       round(CAST(max(d) AS DOUBLE) / (n_a * n_b), 6) AS ks
      |FROM j GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin

  /** Wasserstein-1 (earth-mover's) distance between per-source
    * document-length distributions — the INTEGRAL companion of the
    * KS test on the same ECDFs (KS reports the worst single gap; W1
    * reports how much mass must MOVE how far, in characters — the
    * drift magnitude a corpus-mixing decision actually spends
    * against). For 1-D empirical distributions
    * {{{ W1 = ∫ |F_a(x) − F_b(x)| dx
    *        = Σ_i |F_a(x_i) − F_b(x_i)| · (x_{i+1} − x_i) }}}
    * over the sorted union support (Vallender 1974 — the exact
    * closed form; no transport LP needed in 1-D). Cross-multiplied
    * to exact integers: |cum_a·n_b − cum_b·n_a|·gap summed as
    * DECIMAL(38,0) (order-free, bit-equal in any engine), ONE float
    * division at the end — the [[ksFromCounts]] discipline.
    *
    * Scale shape: identical to KS — the state is the additive
    * (source, len) count grid (length-bounded, never |docs|); the
    * support walk is a len-keyed aggregate (planning-scale), the
    * per-source ECDF a source-partitioned window, the pair fan a
    * len-keyed equi-join collapsing to |sources|²/2 rows. The gap
    * column rides an UNPARTITIONED lead() whose input is the
    * len-keyed aggregate — support-scale by construction, the
    * plan-audit gate's sanctioned shape. */
  private[graft] def w1FromCounts(counts0: DataFrame): DataFrame = {
    val spark = counts0.sparkSession
    import spark.implicits._
    val counts = counts0
    val ns = counts.groupBy($"source").agg(sum($"c").as("n"))
    // union support with the step to the NEXT support point; the
    // maximum length drops out (both ECDFs are 1 there — zero term)
    val support = counts.groupBy($"len").agg(count(lit(1)).as("nsrc"))
      .select($"len")
      .withColumn("gap", lead($"len", 1).over(Window.orderBy($"len")) - $"len")
      .filter($"gap".isNotNull)
    val cum = ns.select($"source").crossJoin(support)
      .join(counts, Seq("source", "len"), "left")
      .select($"source", $"len", $"gap", coalesce($"c", lit(0L)).as("c"))
      .withColumn("cum", sum($"c").over(
        Window.partitionBy($"source").orderBy($"len")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(ns, Seq("source"))
    val a = cum.select($"source".as("source_a"), $"len", $"gap",
      $"cum".as("cum_a"), $"n".as("n_a"))
    val b = cum.select($"source".as("source_b"), $"len",
      $"cum".as("cum_b"), $"n".as("n_b"))
    a.join(b, Seq("len")).filter($"source_a" < $"source_b")
      .groupBy($"source_a", $"source_b", $"n_a", $"n_b")
      .agg(sum(expr(
        """abs(CAST(cum_a AS DECIMAL(38,0)) * n_b
          | - CAST(cum_b AS DECIMAL(38,0)) * n_a) * gap""".stripMargin)).as("num"))
      .select($"source_a", $"source_b", $"n_a", $"n_b",
        round($"num".cast("double") / ($"n_a" * $"n_b").cast("double"), 6).as("w1_chars"))
      .orderBy($"source_a", $"source_b")
  }

  def wassersteinDoclenTransform(docs: DataFrame): DataFrame =
    w1FromCounts(docs
      .select(col("source"), length(col("text")).cast("long").as("len"))
      .groupBy(col("source"), col("len")).agg(count(lit(1)).as("c")))

  def wassersteinDoclen(spark: SparkSession, dir: String): DataFrame =
    wassersteinDoclenTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[wassersteinDoclenTransform]] — identical
    * union-support walk, HUGEINT cross-multiplication, one final
    * division. */
  val wassersteinDoclenOracleSql: String =
    """WITH c AS (SELECT source, CAST(length(text) AS BIGINT) AS len, count(*) AS c
      |           FROM documents GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
      |sup AS (SELECT len, lead(len) OVER (ORDER BY len) - len AS gap
      |        FROM (SELECT DISTINCT len FROM c) QUALIFY gap IS NOT NULL),
      |cum0 AS (SELECT s.source, g.len, g.gap, coalesce(c.c, 0) AS c
      |         FROM ns s CROSS JOIN sup g
      |         LEFT JOIN c ON c.source = s.source AND c.len = g.len),
      |cum AS (SELECT source, len, gap,
      |               sum(c) OVER (PARTITION BY source ORDER BY len
      |                            ROWS UNBOUNDED PRECEDING) AS cum
      |        FROM cum0),
      |j AS (SELECT a.source AS source_a, b.source AS source_b,
      |             na.n AS n_a, nb.n AS n_b,
      |             abs(CAST(a.cum AS HUGEINT) * nb.n
      |               - CAST(b.cum AS HUGEINT) * na.n) * a.gap AS d
      |      FROM cum a JOIN cum b ON a.len = b.len AND a.source < b.source
      |      JOIN ns na ON na.source = a.source
      |      JOIN ns nb ON nb.source = b.source)
      |SELECT source_a, source_b, n_a, n_b,
      |       round(CAST(sum(d) AS DOUBLE) / (n_a * n_b), 6) AS w1_chars
      |FROM j GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin

  /** Chi-square independence cells for event type × day-of-week —
    * "is the traffic mix the same every weekday": per cell the
    * observed count, the expected count under independence, and the
    * cell's χ² contribution (O−E)²/E computed as the exact rational
    * (O·N − R·C)² / (N·R·C) with a DECIMAL(38,0) numerator (O·N is
    * ~1e14 at 10M events and squares past a Long) and ONE float
    * division per cell — no float sum anywhere, so no ordering
    * dependence. The statistic is the (exact-decimal) sum of the
    * per-cell column if a single number is wanted; the cells are the
    * actionable view.
    *
    * Shape: fact → ≤ |types|·7 cells in one map-side-combinable
    * shuffle; row/column totals are broadcast-scale aggregates of
    * the cells. Output ≤ |types|·7 rows at any scale. */
  def chi2TypeDowTransform(events: DataFrame): DataFrame =
    // Spark dayofweek: 1=Sunday; −1 aligns with DuckDB's dow (0=Sunday)
    chi2FromObs(events
      .select(col("event_type"), (dayofweek(col("ts")) - 1).cast("long").as("dow"))
      .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("n")))

  /** The χ² cell derivation from an already-aggregated (event_type,
    * dow, n) table — split out so the STREAMING twin reads it over
    * [[graft.streaming.TypeDailyCountState]]'s (type, day) grid
    * (dow is a pure function of the day, so the daily state is a
    * sufficient statistic; THIRD face of that one state after
    * ACF and mix-drift). */
  private[graft] def chi2FromObs(obs0: DataFrame): DataFrame = {
    val spark = obs0.sparkSession
    import spark.implicits._
    val obs = obs0
    val rows = obs.groupBy($"event_type").agg(sum($"n").as("r"))
    val cols = obs.groupBy($"dow").agg(sum($"n").as("c"))
    val total = obs.agg(sum($"n").as("t"))
    // zero-fill the full type×dow grid: an EMPTY cell still contributes
    // (0−E)²/E = R·C/N — dropping it silently understates χ²
    val cells = rows.select($"event_type").crossJoin(cols.select($"dow"))
      .join(obs, Seq("event_type", "dow"), "left")
      .select($"event_type", $"dow", coalesce($"n", lit(0L)).as("n"))
    cells.join(rows, Seq("event_type")).join(cols, Seq("dow"))
      .crossJoin(broadcast(total))
      .select($"event_type", $"dow", $"n",
        round($"r" * $"c" / $"t".cast("double"), 6).as("expected"),
        round(
          expr("CAST(CAST(n AS DECIMAL(38,0)) * t - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)")
            * expr("CAST(CAST(n AS DECIMAL(38,0)) * t - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)")
            / (expr("CAST(t AS DOUBLE)") * $"r" * $"c"), 6).as("contrib"))
      .orderBy($"event_type", $"dow")
  }

  def chi2TypeDow(spark: SparkSession, dir: String): DataFrame =
    chi2TypeDowTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[chi2TypeDowTransform]]. */
  val chi2TypeDowOracleSql: String =
    """WITH obs AS (SELECT event_type,
      |                    CAST(date_part('dow', CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
      |                    count(*) AS n
      |             FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, sum(n) AS r FROM obs GROUP BY 1),
      |c AS (SELECT dow, sum(n) AS c FROM obs GROUP BY 1),
      |t AS (SELECT sum(n) AS t FROM obs),
      |cells AS (SELECT r.event_type, c.dow, coalesce(obs.n, 0) AS n
      |          FROM r CROSS JOIN c
      |          LEFT JOIN obs ON obs.event_type = r.event_type AND obs.dow = c.dow)
      |SELECT cells.event_type, cells.dow, CAST(cells.n AS BIGINT) AS n,
      |       round(r.r * c.c / CAST(t.t AS DOUBLE), 6) AS expected,
      |       round(CAST(CAST(cells.n AS HUGEINT) * t.t - CAST(r.r AS HUGEINT) * c.c AS DOUBLE)
      |             * CAST(CAST(cells.n AS HUGEINT) * t.t - CAST(r.r AS HUGEINT) * c.c AS DOUBLE)
      |             / (CAST(t.t AS DOUBLE) * r.r * c.c), 6) AS contrib
      |FROM cells JOIN r ON r.event_type = cells.event_type
      |           JOIN c ON c.dow = cells.dow CROSS JOIN t
      |ORDER BY 1, 2""".stripMargin

  /** Mann–Whitney U (rank-sum) between every pair of event types on
    * the per-event value — the non-parametric sibling of
    * [[Behavior.abWelchTtestTransform]] for when the value
    * distribution is skewed past a t-test's reach. Computed exactly
    * on the integer-cents value support: with average ranks for
    * ties, 2·R_a = Σ_v c_a(v)·(2·below(v) + tie(v) + 1) is an exact
    * integer on the pooled support grid, and 2·U_a = 2·R_a −
    * n_a(n_a+1) (the rank-sum identity; the complement 2·n_a·n_b −
    * 2·U_a is U_b). The only float is the AUC = U_a/(n_a·n_b) — the
    * probability a random `a` value exceeds a random `b`, ties at ½.
    *
    * Shape: fact → (type, cents) counts in one shuffle — support is
    * bounded by the cent range, not |events|; the pair grid unions
    * each type's support into the pooled ECDF under a per-pair
    * window (pair-partitioned, support-scale). The integer 2·R_a
    * holds in a Long to ~2e9 events per pair; past that the sum
    * should be carried as DECIMAL(38,0) — AUC is unchanged. */
  def mannWhitneyUTransform(events: DataFrame): DataFrame =
    mwFromCounts(events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("c")))

  /** The U derivation from an already-aggregated (event_type, cents,
    * c) support grid — split out so the STREAMING twin reads it over
    * [[graft.streaming.TypeCentsState]]'s additive state (rank sums
    * are whole-pool reads; the value counts merge across batches). */
  private[graft] def mwFromCounts(cnts0: DataFrame): DataFrame = {
    val spark = cnts0.sparkSession
    import spark.implicits._
    val cnts = cnts0
    val ns = cnts.groupBy($"event_type").agg(sum($"c").as("n"))
    val types = ns.select($"event_type".as("tb"))
    // pooled support per (a, b) pair via a zero-filled union (avoids a
    // per-pair full-outer join): each side contributes its own counts
    val pa = cnts.crossJoin(broadcast(types)).filter($"event_type" < $"tb")
      .select($"event_type".as("ta"), $"tb", $"cents", $"c".as("ca"), lit(0L).as("cb"))
    val pb = cnts.crossJoin(broadcast(types.select($"tb".as("ta"))))
      .filter($"ta" < $"event_type")
      .select($"ta", $"event_type".as("tb"), $"cents", lit(0L).as("ca"), $"c".as("cb"))
    val pooled = pa.unionByName(pb)
      .groupBy($"ta", $"tb", $"cents")
      .agg(sum($"ca").as("ca"), sum($"cb").as("cb"))
    val w = Window.partitionBy($"ta", $"tb").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = pooled
      .withColumn("below", sum($"ca" + $"cb").over(w) - ($"ca" + $"cb"))
    val r2 = ranked.groupBy($"ta", $"tb")
      .agg(sum($"ca" * (lit(2L) * $"below" + $"ca" + $"cb" + 1L)).as("r2_a"))
    r2.join(ns.select($"event_type".as("ta"), $"n".as("n_a")), Seq("ta"))
      .join(ns.select($"event_type".as("tb"), $"n".as("n_b")), Seq("tb"))
      .select($"ta".as("type_a"), $"tb".as("type_b"), $"n_a", $"n_b",
        ($"r2_a" - $"n_a" * ($"n_a" + 1L)).as("u2_a"))
      .withColumn("auc", round($"u2_a" / (lit(2.0) * $"n_a" * $"n_b"), 6))
      .orderBy($"type_a", $"type_b")
  }

  def mannWhitneyU(spark: SparkSession, dir: String): DataFrame =
    mannWhitneyUTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[mannWhitneyUTransform]]. */
  val mannWhitneyUOracleSql: String =
    """WITH cnt AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |                    count(*) AS c
      |             FROM events GROUP BY 1, 2),
      |ns AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
      |pooled AS (
      |  SELECT ta, tb, cents, sum(ca) AS ca, sum(cb) AS cb FROM (
      |    SELECT a.event_type AS ta, t.event_type AS tb, a.cents, a.c AS ca, 0 AS cb
      |    FROM cnt a JOIN ns t ON a.event_type < t.event_type
      |    UNION ALL
      |    SELECT t.event_type, b.event_type, b.cents, 0, b.c
      |    FROM cnt b JOIN ns t ON t.event_type < b.event_type)
      |  GROUP BY 1, 2, 3),
      |ranked AS (SELECT ta, tb, cents, ca, cb,
      |                  sum(ca + cb) OVER (PARTITION BY ta, tb ORDER BY cents
      |                                     ROWS UNBOUNDED PRECEDING) - (ca + cb) AS below
      |           FROM pooled),
      |r2 AS (SELECT ta, tb, sum(ca * (2 * below + ca + cb + 1)) AS r2_a
      |       FROM ranked GROUP BY 1, 2)
      |SELECT r2.ta AS type_a, r2.tb AS type_b, na.n AS n_a, nb.n AS n_b,
      |       CAST(r2.r2_a - na.n * (na.n + 1) AS BIGINT) AS u2_a,
      |       round(CAST(r2.r2_a - na.n * (na.n + 1) AS DOUBLE)
      |             / (2.0 * na.n * nb.n), 6) AS auc
      |FROM r2 JOIN ns na ON na.event_type = r2.ta
      |        JOIN ns nb ON nb.event_type = r2.tb
      |ORDER BY 1, 2""".stripMargin

  /** Cramér's V for source × lang over the corpus — "how much does
    * knowing the provider tell you about the language" as a single
    * [0,1] association number, the corpus-governance view of
    * [[chi2TypeDowTransform]]'s machinery. Per-cell χ² contributions
    * are exact rationals divided into floats ONCE and rounded to the
    * 1e-6 grid; the statistic sums those already-quantized decimals
    * EXACTLY (DECIMAL(20,6) addition is order-free), so the engines
    * agree without a float-sum order assumption. V = sqrt(χ² / (N ·
    * min(r−1, c−1))).
    *
    * Shape: corpus → |sources|·|langs| cells in one shuffle; the
    * rest is cell-grid arithmetic and a one-row output. */
  def cramersVSourceLangTransform(docs: DataFrame): DataFrame =
    cramersFromObs(docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n")))

  /** The V derivation from an already-aggregated (source, lang, n)
    * table — split out so the STREAMING twin reads it over
    * [[graft.streaming.DatasetCardState]]'s (lang, source) grid
    * (n_docs is one of the card's additive sums; a per-batch V
    * cannot merge, the contingency counts can). */
  private[graft] def cramersFromObs(obs0: DataFrame): DataFrame = {
    val spark = obs0.sparkSession
    import spark.implicits._
    val obs = obs0
    val rows = obs.groupBy($"source").agg(sum($"n").as("r"))
    val cols = obs.groupBy($"lang").agg(sum($"n").as("c"))
    val total = obs.agg(sum($"n").as("t"),
      count_distinct($"source").as("nr"), count_distinct($"lang").as("nc"))
    // zero-fill: empty cells carry R·C/N of χ² (see chi2TypeDow)
    val cells = rows.select($"source").crossJoin(cols.select($"lang"))
      .join(obs, Seq("source", "lang"), "left")
      .select($"source", $"lang", coalesce($"n", lit(0L)).as("n"))
    cells.join(rows, Seq("source")).join(cols, Seq("lang"))
      .crossJoin(broadcast(total))
      .select($"t", $"nr", $"nc",
        round(
          expr("CAST(CAST(n AS DECIMAL(38,0)) * t - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)")
            * expr("CAST(CAST(n AS DECIMAL(38,0)) * t - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)")
            / (expr("CAST(t AS DOUBLE)") * $"r" * $"c"), 6)
          .cast("decimal(20,6)").as("contrib"))
      .groupBy($"t", $"nr", $"nc")
      .agg(sum($"contrib").as("chi2d"))
      .select($"t".as("n_docs"), $"nr".as("n_sources"), $"nc".as("n_langs"),
        $"chi2d".cast("double").as("chi2"),
        round(sqrt($"chi2d".cast("double") /
          ($"t" * least($"nr" - 1L, $"nc" - 1L)).cast("double")), 6).as("cramers_v"))
  }

  def cramersVSourceLang(spark: SparkSession, dir: String): DataFrame =
    cramersVSourceLangTransform(Tables.documents(spark, dir))

  /** Neyman allocation of a sampling budget across sources — the
    * variance-optimal stratified design ([[Sampling
    * .stratifiedSample]] splits proportionally; Neyman gives a
    * high-variance stratum MORE than its share, minimizing the
    * estimator variance of mean doc length at fixed budget):
    * allocation_h ∝ N_h·σ_h, realized exactly as w_h =
    * ⌊√(N_h·Σx² − (Σx)²)⌋ (= N·σ as an integer sqrt of the exact
    * variance numerator — IEEE sqrt of an exact integer then floor,
    * identical in both engines, the corpus_mix_temperature
    * discipline) and alloc_h = k·w_h div Σw (truncating div —
    * allocations sum to ≤ k, monotone in k).
    *
    * Shape: one map-side-combinable shuffle to |sources| sufficient
    * rows; the Σw denominator is a one-row broadcast. */
  def neymanAllocationTransform(docs: DataFrame, budget: Long = 1000L): DataFrame =
    neymanFromCounts(docs
      .select(col("source"), length(col("text")).cast("long").as("len"))
      .groupBy(col("source"), col("len")).agg(count(lit(1)).as("c")), budget)

  /** The allocation derivation from the SAME (source, len, c) grid
    * [[ksFromCounts]] reads — so the streaming twin shares
    * [[graft.streaming.SourceLenState]] (one length-grid state, two
    * design faces: drift test and sampling design). */
  private[graft] def neymanFromCounts(counts: DataFrame, budget: Long = 1000L): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val stats = counts
      .groupBy($"source")
      .agg(sum($"c").as("n_docs"), sum($"len" * $"c").as("s1"),
        sum(expr("CAST(len AS DECIMAL(38,0)) * len * c")).as("s2"))
      .select($"source", $"n_docs",
        expr("CAST(floor(sqrt(CAST(n_docs * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE))) AS BIGINT)")
          .as("w"))
    stats.crossJoin(broadcast(stats.agg(sum($"w").as("tw"))))
      .select($"source", $"n_docs", $"w",
        expr(s"CAST($budget * w div tw AS BIGINT)").as("alloc"),
        round($"w" / $"n_docs".cast("double"), 6).as("sd_len"))
      .orderBy($"source")
  }

  def neymanAllocation(spark: SparkSession, dir: String): DataFrame =
    neymanAllocationTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[neymanAllocationTransform]] (budget=1000). */
  val neymanAllocationOracleSql: String =
    """WITH s AS (SELECT source, count(*) AS n_docs,
      |                  CAST(sum(length(text)) AS BIGINT) AS s1,
      |                  sum(CAST(length(text) AS HUGEINT) * length(text)) AS s2
      |           FROM documents GROUP BY 1),
      |w AS (SELECT source, n_docs,
      |             CAST(floor(sqrt(CAST(n_docs * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))) AS BIGINT) AS w
      |      FROM s),
      |t AS (SELECT sum(w) AS tw FROM w)
      |SELECT source, n_docs, w,
      |       CAST(1000 * w // tw AS BIGINT) AS alloc,
      |       round(CAST(w AS DOUBLE) / n_docs, 6) AS sd_len
      |FROM w, t ORDER BY source""".stripMargin

  /** Fano factor (variance-to-mean ratio) of the daily event count
    * per type — the burstiness dial next to the ACF and changepoint
    * reads: Poisson traffic sits at 1, campaign/batch-driven spikes
    * push it up, rate-limited flows push it below. Computed over the
    * ZERO-FILLED day spine (a silent day is data, not absence) as
    * the exact rational (D·Σn² − (Σn)²)/(D·Σn) with a DECIMAL(38,0)
    * numerator and ONE float division per type.
    *
    * Shape: fact → |types|×|days| daily counts (map-side
    * combinable), spine from a one-row bounds broadcast, |types|
    * rows out. */
  def fanoFactorDailyTransform(events: DataFrame): DataFrame =
    fanoFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  /** The Fano derivation from an already-aggregated (event_type,
    * day, n) table — the SAME grid shape [[graft.streaming
    * .TypeDailyCountState]] keeps, making this its FOURTH read-time
    * face (ACF, mix-drift, χ², burstiness — one additive state). */
  private[graft] def fanoFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", coalesce($"n", lit(0L)).as("n"))
    grid.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"n").as("n_events"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("s2"))
      .select($"event_type", $"n_days", $"n_events",
        expr("round(CAST(n_days * s2 - CAST(n_events AS DECIMAL(38,0)) * n_events AS DOUBLE) " +
          "/ (CAST(n_days AS DOUBLE) * n_events), 6)").as("fano"))
      .orderBy($"event_type")
  }

  def fanoFactorDaily(spark: SparkSession, dir: String): DataFrame =
    fanoFactorDailyTransform(Tables.events(spark, dir))

  /** Per-type user reach with a Wilson 95% confidence interval —
    * "how much of the user base does each event type touch, and how
    * sure are we": k = distinct users emitting the type, n = all
    * distinct users; the Wilson score interval (the
    * recommended-over-Wald small-n interval) is a single fixed float
    * expression over the two exact integers, written with IDENTICAL
    * operation order in both engines (z² = 3.8416 as a shared
    * literal), so the doubles agree bit-for-bit before the one
    * rounding.
    *
    * Shape: two distinct-count aggregates (map-side partial
    * distinct), |types| rows out. */
  def typeReachCiTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val reach = events.select($"event_type", $"user_id").distinct()
      .groupBy($"event_type").agg(count(lit(1)).as("k"))
    val total = events.agg(count_distinct($"user_id").as("n"))
    reach.crossJoin(broadcast(total))
      .select($"event_type", $"n".as("n_users"), $"k".as("reach_users"),
        expr("round(CAST(k AS DOUBLE) / n, 6)").as("reach"),
        expr(s"round(((CAST(k AS DOUBLE) / n + 3.8416 / (2 * n)) - 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n + 3.8416 / (4.0 * n * n))) / (1 + 3.8416 / n), 6)")
          .as("wilson_lo"),
        expr(s"round(((CAST(k AS DOUBLE) / n + 3.8416 / (2 * n)) + 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n + 3.8416 / (4.0 * n * n))) / (1 + 3.8416 / n), 6)")
          .as("wilson_hi"))
      .orderBy($"event_type")
  }

  def typeReachCi(spark: SparkSession, dir: String): DataFrame =
    typeReachCiTransform(Tables.events(spark, dir))

  /** Spearman rank correlation between every pair of event types on
    * their DAILY-count series — the monotone-association sibling of
    * `rolling_corr_daily`'s Pearson (a nonlinear but monotone
    * coupling scores 1 here and < 1 there; rank space also defuses
    * spike outliers). Tie-averaged ranks on the zero-filled day
    * spine, carried 2×-scaled so they stay EXACT integers (rank2 =
    * 2·rank + ties − 1); ρ is then Pearson over the integer rank
    * pairs — exact sufficient sums, ONE float division per pair.
    *
    * Shape: fact → |types|×|days| grid; ranks are per-type windows
    * over the grid; the pairing joins grid rows ON day (grid-scale);
    * ≤ |types|² rows out. */
  def spearmanDailyPairsTransform(events: DataFrame): DataFrame =
    spearmanFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  /** The ρ derivation from an already-aggregated (event_type, day,
    * n) table — the FIFTH face of [[graft.streaming
    * .TypeDailyCountState]]'s grid (ACF, mix-drift, χ², Fano,
    * Spearman). */
  private[graft] def spearmanFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"n", lit(0L)).as("n"))
    val wRank = Window.partitionBy($"event_type").orderBy($"n")
    val wTie = Window.partitionBy($"event_type", $"n")
    val ranked = grid
      .withColumn("rk", rank().over(wRank).cast("long"))
      .withColumn("ties", count(lit(1)).over(wTie))
      .select($"event_type", $"day", (lit(2L) * $"rk" + $"ties" - 1L).as("r2"))
    val a = ranked.select($"event_type".as("type_a"), $"day", $"r2".as("ra"))
    val b = ranked.select($"event_type".as("type_b"), $"day", $"r2".as("rb"))
    a.join(b, Seq("day")).filter($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_days"),
        sum($"ra").as("sa"), sum($"rb").as("sb"),
        sum(expr("CAST(ra AS DECIMAL(38,0)) * rb")).as("sab"),
        sum(expr("CAST(ra AS DECIMAL(38,0)) * ra")).as("saa"),
        sum(expr("CAST(rb AS DECIMAL(38,0)) * rb")).as("sbb"))
      .select($"type_a", $"type_b", $"n_days",
        expr("""round((n_days * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb) /
                      (sqrt(n_days * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa) *
                       sqrt(n_days * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb)), 6)""")
          .as("spearman_rho"))
      .orderBy($"type_a", $"type_b")
  }

  def spearmanDailyPairs(spark: SparkSession, dir: String): DataFrame =
    spearmanDailyPairsTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[spearmanDailyPairsTransform]]. */
  val spearmanDailyPairsOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type, s.day, coalesce(d.n, 0) AS n
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |r AS (SELECT event_type, day,
      |             2 * rank() OVER (PARTITION BY event_type ORDER BY n)
      |               + count(*) OVER (PARTITION BY event_type, n) - 1 AS r2
      |      FROM g),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |             count(*) AS n_days,
      |             CAST(sum(a.r2) AS BIGINT) AS sa, CAST(sum(b.r2) AS BIGINT) AS sb,
      |             sum(CAST(a.r2 AS HUGEINT) * b.r2) AS sab,
      |             sum(CAST(a.r2 AS HUGEINT) * a.r2) AS saa,
      |             sum(CAST(b.r2 AS HUGEINT) * b.r2) AS sbb
      |      FROM r a JOIN r b ON a.day = b.day AND a.event_type < b.event_type
      |      GROUP BY 1, 2)
      |SELECT type_a, type_b, n_days,
      |       round((n_days * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb) /
      |             (sqrt(n_days * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa) *
      |              sqrt(n_days * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb)), 6) AS spearman_rho
      |FROM p ORDER BY 1, 2""".stripMargin

  /** Benford first-digit screen on the revenue cents — the
    * fraud/synthetic-data smell test (organically-spread magnitudes
    * follow log10(1+1/d); flat or spiked first digits mean
    * generated, capped, or price-pointed values): observed share per
    * leading digit against the Benford expectation, both as single
    * floats over exact integers (the expected share is the IEEE
    * log10 of small integer ratios — identical in both engines).
    *
    * Shape: one map-side-combinable shuffle to ≤ 9 rows; the digit
    * is integer math (cents div 10^⌊log10 cents⌋), no strings. */
  def benfordFirstDigitTransform(events: DataFrame): DataFrame =
    benfordFromCents(events
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("cents")).agg(count(lit(1)).as("c")))

  /** The digit rollup from an already-aggregated (cents, c) value
    * grid — the SAME support [[graft.streaming.TypeCentsState]]
    * keeps (summed over types), making the streaming Benford screen
    * its second face. */
  private[graft] def benfordFromCents(cents0: DataFrame): DataFrame = {
    val spark = cents0.sparkSession
    import spark.implicits._
    val digits = cents0
      .filter($"cents" > 0L)
      .select(expr("cents div CAST(pow(10, CAST(floor(log10(cents)) AS BIGINT)) AS BIGINT)")
        .as("digit"), $"c")
      .groupBy($"digit").agg(sum($"c").as("n"))
    digits.crossJoin(broadcast(digits.agg(sum($"n").as("t"))))
      .select($"digit", $"n",
        expr("round(CAST(n AS DOUBLE) / t, 6)").as("share"),
        expr("round(log10(1 + 1.0 / digit), 6)").as("benford_share"))
      .orderBy($"digit")
  }

  def benfordFirstDigit(spark: SparkSession, dir: String): DataFrame =
    benfordFirstDigitTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[benfordFirstDigitTransform]]. */
  val benfordFirstDigitOracleSql: String =
    """WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
      |           FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0),
      |d AS (SELECT cents // CAST(pow(10, CAST(floor(log10(cents)) AS BIGINT)) AS BIGINT) AS digit
      |      FROM c),
      |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      |t AS (SELECT sum(n) AS t FROM g)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |       round(CAST(n AS DOUBLE) / t, 6) AS share,
      |       round(log10(1 + 1.0 / digit), 6) AS benford_share
      |FROM g, t ORDER BY digit""".stripMargin

  /** Per-state entropy of the event-type transition matrix — "how
    * predictable is the next action given the current one" (a
    * near-zero row is a funnel rail; log2|types| is pure noise):
    * H(next|prev) per prev from the SAME (prev, curr, n) counts
    * `event_transitions` reports, H = log2(N) − (Σ n·log2 n)/N with
    * the Σ carried as per-term 1e-6-rounded DECIMAL(20,6) (exact
    * order-free addition — the cramers_v discipline, no float-sum
    * order anywhere).
    *
    * Shape: one user_id window pass for the pairs (the
    * transitions shuffle), then |types|²-cell arithmetic. */
  def transitionEntropyTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = events.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("curr_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .select($"prev_type", $"n",
        expr("CAST(round(n * log2(n), 6) AS DECIMAL(20,6))").as("nlogn"))
      .groupBy($"prev_type")
      .agg(sum($"n").as("n_out"), count(lit(1)).as("n_branches"),
        sum($"nlogn").as("snl"))
      .select($"prev_type", $"n_out", $"n_branches",
        expr("round(log2(n_out) - CAST(snl AS DOUBLE) / n_out + 0.0, 6)")
          .as("entropy_bits"))
      .orderBy($"prev_type")
  }

  def transitionEntropy(spark: SparkSession, dir: String): DataFrame =
    transitionEntropyTransform(Tables.events(spark, dir))

  /** Wald–Wolfowitz runs test on the daily up/down moves per type —
    * "is the day-over-day direction random or regime-like" (too FEW
    * runs = trending/sticky regimes, too MANY = oscillation;
    * complements the ACF's linear view with a distribution-free
    * one): day-over-day deltas on the zero-filled spine, zero deltas
    * dropped (the standard treatment), R = 1 + #sign-changes, and
    * the z statistic from the exact (n₊, n₋, R) integers in one
    * fixed float expression.
    *
    * Shape: per-type windows over the |types|×|days| grid; |types|
    * rows out. */
  def runsTestDailyTransform(events: DataFrame): DataFrame =
    runsFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  /** The runs derivation from the (event_type, day, n) grid — the
    * SIXTH face of [[graft.streaming.TypeDailyCountState]]. */
  private[graft] def runsFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"n", lit(0L)).as("n"))
    val wd = Window.partitionBy($"event_type").orderBy($"day")
    val signs = grid
      .withColumn("delta", $"n" - lag($"n", 1).over(wd))
      .filter($"delta".isNotNull && $"delta" =!= 0L)
      .select($"event_type", $"day", signum($"delta").cast("long").as("s"))
    val ws = Window.partitionBy($"event_type").orderBy($"day")
    signs
      .withColumn("chg", when(lag($"s", 1).over(ws).isNull, 1L)
        .when(lag($"s", 1).over(ws) =!= $"s", 1L).otherwise(0L))
      .groupBy($"event_type")
      .agg(sum(when($"s" === 1L, 1L).otherwise(0L)).as("n_up"),
        sum(when($"s" === -1L, 1L).otherwise(0L)).as("n_down"),
        sum($"chg").as("runs"))
      .select($"event_type", $"n_up", $"n_down", $"runs",
        // one-sided or too-short sign sequences have zero run
        // variance — z is undefined, and the integer guard excludes
        // them IDENTICALLY in both engines (ANSI Spark would raise
        // DIVIDE_BY_ZERO, DuckDB's IEEE mode would emit inf/NaN)
        expr("""CASE WHEN n_up > 0 AND n_down > 0
                       AND 2 * n_up * n_down - n_up - n_down > 0
                     THEN round((runs - (2.0 * n_up * n_down / (n_up + n_down) + 1)) /
                          sqrt(2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down) /
                               ((CAST(n_up + n_down AS DOUBLE) * (n_up + n_down)) * (n_up + n_down - 1))), 6)
                     ELSE NULL END""")
          .as("z"))
      .orderBy($"event_type")
  }

  def runsTestDaily(spark: SparkSession, dir: String): DataFrame =
    runsTestDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[runsTestDailyTransform]]. */
  val runsTestDailyOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type, s.day, coalesce(d.n, 0) AS n
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |del AS (SELECT event_type, day,
      |               n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
      |        FROM g),
      |sg AS (SELECT event_type, day, CAST(sign(delta) AS BIGINT) AS s
      |       FROM del WHERE delta IS NOT NULL AND delta <> 0),
      |ch AS (SELECT event_type, s,
      |              CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day) IS NULL THEN 1
      |                   WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day) <> s THEN 1
      |                   ELSE 0 END AS chg
      |       FROM sg),
      |agg AS (SELECT event_type,
      |               sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n_up,
      |               sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n_down,
      |               sum(chg) AS runs
      |        FROM ch GROUP BY 1)
      |SELECT event_type, CAST(n_up AS BIGINT) AS n_up,
      |       CAST(n_down AS BIGINT) AS n_down, CAST(runs AS BIGINT) AS runs,
      |       CASE WHEN n_up > 0 AND n_down > 0
      |              AND 2 * n_up * n_down - n_up - n_down > 0
      |            THEN round((runs - (2.0 * n_up * n_down / (n_up + n_down) + 1)) /
      |                 sqrt(2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down) /
      |                      ((CAST(n_up + n_down AS DOUBLE) * (n_up + n_down)) * (n_up + n_down - 1))), 6)
      |            ELSE NULL END AS z
      |FROM agg ORDER BY 1""".stripMargin

  /** Kendall τ-b between every pair of event types on their daily
    * series — the concordance view that completes the association
    * triple (Pearson `rolling_corr_daily` for linearity, Spearman
    * for monotone rank, Kendall for pairwise-order agreement; τ-b's
    * tie correction matters on zero-heavy spines): over all day
    * pairs d < e, C−D = Σ sign((a_d−a_e)(b_d−b_e)), with n₁/n₂ the
    * tied-pair counts and τ_b = (C−D)/√((n₀−n₁)(n₀−n₂)) — every
    * count an exact integer, ONE float expression per type pair.
    *
    * Shape: the day-pair fan-out is an equi-join on the type pair
    * with a day< filter — |days|²/2 rows per pair, grid- not
    * fact-scale (bounded by the day span, documented); output ≤
    * |types|² rows. */
  def kendallTauDailyTransform(events: DataFrame): DataFrame =
    kendallFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  /** The τ-b derivation from the (event_type, day, n) grid — the
    * SEVENTH face of [[graft.streaming.TypeDailyCountState]]. */
  private[graft] def kendallFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"n", lit(0L)).as("n"))
    val a = grid.select($"event_type".as("type_a"), $"day", $"n".as("na"))
    val b = grid.select($"event_type".as("type_b"), $"day", $"n".as("nb"))
    val p = a.join(b, Seq("day")).filter($"type_a" < $"type_b")
    val x = p.select($"type_a", $"type_b", $"day".as("d1"),
      $"na".as("na1"), $"nb".as("nb1"))
    val y = p.select($"type_a", $"type_b", $"day".as("d2"),
      $"na".as("na2"), $"nb".as("nb2"))
    x.join(y, Seq("type_a", "type_b")).filter($"d1" < $"d2")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n0"),
        sum(signum(($"na1" - $"na2") * ($"nb1" - $"nb2")).cast("long")).as("cd"),
        sum(when($"na1" === $"na2", 1L).otherwise(0L)).as("n1"),
        sum(when($"nb1" === $"nb2", 1L).otherwise(0L)).as("n2"))
      .select($"type_a", $"type_b", $"n0", $"cd", $"n1", $"n2",
        expr("""CASE WHEN n0 > n1 AND n0 > n2
                     THEN round(cd / (sqrt(CAST(n0 - n1 AS DOUBLE)) * sqrt(CAST(n0 - n2 AS DOUBLE))), 6)
                     ELSE NULL END""").as("kendall_tau_b"))
      .orderBy($"type_a", $"type_b")
  }

  def kendallTauDaily(spark: SparkSession, dir: String): DataFrame =
    kendallTauDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[kendallTauDailyTransform]]. */
  val kendallTauDailyOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type, s.day, coalesce(d.n, 0) AS n
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
      |             a.n AS na, b.n AS nb
      |      FROM g a JOIN g b ON a.day = b.day AND a.event_type < b.event_type),
      |pp AS (SELECT x.type_a, x.type_b,
      |              count(*) AS n0,
      |              CAST(sum(sign((x.na - y.na) * (x.nb - y.nb))) AS BIGINT) AS cd,
      |              sum(CASE WHEN x.na = y.na THEN 1 ELSE 0 END) AS n1,
      |              sum(CASE WHEN x.nb = y.nb THEN 1 ELSE 0 END) AS n2
      |       FROM p x JOIN p y ON x.type_a = y.type_a AND x.type_b = y.type_b
      |                        AND x.day < y.day
      |       GROUP BY 1, 2)
      |SELECT type_a, type_b, CAST(n0 AS BIGINT) AS n0, cd,
      |       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       CASE WHEN n0 > n1 AND n0 > n2
      |            THEN round(cd / (sqrt(CAST(n0 - n1 AS DOUBLE)) * sqrt(CAST(n0 - n2 AS DOUBLE))), 6)
      |            ELSE NULL END AS kendall_tau_b
      |FROM pp ORDER BY 1, 2""".stripMargin

  /** Stationary distribution of the event-type transition chain —
    * "where does a user's session settle" (the long-run share of
    * each action if behavior kept its current dynamics; compare
    * against today's raw mix to see where the flow is HEADING):
    * fixed-point of π·P computed by 12 EXACT-INTEGER power steps on
    * the (prev, curr, n) transition counts — π carried ×1e9, each
    * step π′_j = Σ_i (π_i·c_ij div rs_i) with per-term truncating
    * div (identical in BigInt and HUGEINT, the pca_power
    * discipline), normalized ONCE into floats at output. The
    * |types|² matrix is planning-scale, so the fold runs on the
    * driver; the distributed pass is the transition count itself.
    */
  def markovStationaryTransform(events: DataFrame, iters: Int = 12): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val counts = events.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("curr_type"))
      .agg(count(lit(1)).as("n"))
    markovFromCounts(counts, iters)
  }

  /** The stationary fold from the (prev, curr, n) counts — shared
    * with the streaming twin over [[graft.streaming
    * .TransitionState]]'s additive pair state (second face next to
    * the transition report). */
  private[graft] def markovFromCounts(counts: DataFrame, iters: Int = 12): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    // planning-scale: |types|² cells
    val cells = counts.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val idx = types.zipWithIndex.toMap
    val d = types.length
    val c = Array.ofDim[Long](d, d)
    cells.foreach { case (i, j, n) => c(idx(i))(idx(j)) = n }
    val rs = Array.tabulate(d)(i => c(i).sum)
    var pi = Array.fill(d)(BigInt(1000000000L) / d)
    for (_ <- 1 to iters) {
      val next = Array.fill(d)(BigInt(0))
      for (i <- 0 until d if rs(i) > 0; j <- 0 until d if c(i)(j) != 0)
        next(j) += pi(i) * c(i)(j) / rs(i)
      pi = next
    }
    val tot = pi.sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    types.indices.map { i =>
      (types(i), pi(i).toLong, r6(pi(i).toDouble / tot.toDouble))
    }.toDF("event_type", "pi9", "stationary_p")
      .orderBy($"event_type")
  }

  def markovStationary(spark: SparkSession, dir: String): DataFrame =
    markovStationaryTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[markovStationaryTransform]] — the identical
    * integer power steps unrolled as MATERIALIZED CTEs (plain CTEs
    * would re-expand the chain per reference). */
  def markovStationaryOracleSql(iters: Int = 12): String = {
    val iter = (k: Int) =>
      s"""p$k AS MATERIALIZED (
         |  SELECT c.curr AS event_type,
         |         sum(p.pi * c.n // c.rs) AS pi
         |  FROM p${k - 1} p JOIN cells c ON c.prev = p.event_type
         |  GROUP BY 1)""".stripMargin
    s"""WITH pr AS (
       |  SELECT user_id, event_type, ts, event_id,
       |         lag(event_type) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
       |  FROM events),
       |cnt AS MATERIALIZED (SELECT prev_type AS prev, event_type AS curr, count(*) AS n
       |       FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |cells AS MATERIALIZED (
       |  SELECT prev, curr, CAST(n AS HUGEINT) AS n,
       |         CAST(sum(n) OVER (PARTITION BY prev) AS HUGEINT) AS rs
       |  FROM cnt),
       |tys AS MATERIALIZED (SELECT DISTINCT t AS event_type FROM (
       |  SELECT prev AS t FROM cnt UNION SELECT curr FROM cnt)),
       |p0 AS MATERIALIZED (
       |  SELECT event_type,
       |         CAST(1000000000 AS HUGEINT) // (SELECT count(*) FROM tys) AS pi
       |  FROM tys),
       |${(1 to iters).map(iter).mkString(",\n")},
       |tot AS (SELECT sum(pi) AS tot FROM p$iters)
       |SELECT t.event_type, CAST(coalesce(p.pi, 0) AS BIGINT) AS pi9,
       |       round(CAST(coalesce(p.pi, 0) AS DOUBLE) / tot.tot, 6) AS stationary_p
       |FROM tys t LEFT JOIN p$iters p ON p.event_type = t.event_type
       |CROSS JOIN tot ORDER BY t.event_type""".stripMargin
  }

  /** Mutual information between event type and day-of-week — the
    * information-theoretic companion of [[chi2TypeDowTransform]]
    * (χ² asks "is there dependence", MI says HOW MANY BITS the
    * weekday tells you about the action mix): I = Σ p_ij·log2(n_ij·N
    * /(r_i·c_j)) over the observed cells (empty cells contribute 0
    * exactly, so no zero-fill is needed here), each term ONE float
    * on four exact integers rounded to the 1e-9 grid and summed
    * EXACTLY as DECIMAL(24,9) — the order-free discipline.
    */
  def mutualInfoTypeDowTransform(events: DataFrame): DataFrame =
    miFromObs(events
      .select(col("event_type"), (dayofweek(col("ts")) - 1).cast("long").as("dow"))
      .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("n")))

  /** The MI rollup from the (event_type, dow, n) cells — the TENTH
    * face of [[graft.streaming.TypeDailyCountState]] (dow derives
    * from the day, as in [[chi2FromObs]]). */
  private[graft] def miFromObs(obs: DataFrame): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    val rows = obs.groupBy($"event_type").agg(sum($"n").as("r"))
    val cols = obs.groupBy($"dow").agg(sum($"n").as("c"))
    val total = obs.agg(sum($"n").as("t"))
    obs.join(rows, Seq("event_type")).join(cols, Seq("dow"))
      .crossJoin(broadcast(total))
      .select(
        $"t",
        expr("""CAST(round((CAST(n AS DOUBLE) / t) *
                           log2(CAST(n AS DOUBLE) * t / (CAST(r AS DOUBLE) * c)), 9)
                     AS DECIMAL(24,9))""").as("term"))
      .groupBy($"t")
      .agg(sum($"term").as("mi"))
      .select($"t".as("n_events"),
        expr("round(CAST(mi AS DOUBLE) + 0.0, 6)").as("mi_bits"))
  }

  def mutualInfoTypeDow(spark: SparkSession, dir: String): DataFrame =
    mutualInfoTypeDowTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[mutualInfoTypeDowTransform]]. */
  val mutualInfoTypeDowOracleSql: String =
    """WITH obs AS (SELECT event_type,
      |                    CAST(date_part('dow', CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
      |                    count(*) AS n
      |             FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, sum(n) AS r FROM obs GROUP BY 1),
      |c AS (SELECT dow, sum(n) AS c FROM obs GROUP BY 1),
      |t AS (SELECT sum(n) AS t FROM obs),
      |terms AS (
      |  SELECT t.t,
      |         CAST(round((CAST(obs.n AS DOUBLE) / t.t) *
      |                    log2(CAST(obs.n AS DOUBLE) * t.t / (CAST(r.r AS DOUBLE) * c.c)), 9)
      |              AS DECIMAL(24,9)) AS term
      |  FROM obs JOIN r ON r.event_type = obs.event_type
      |           JOIN c ON c.dow = obs.dow CROSS JOIN t)
      |SELECT CAST(t AS BIGINT) AS n_events,
      |       round(CAST(sum(term) AS DOUBLE) + 0.0, 6) AS mi_bits
      |FROM terms GROUP BY t""".stripMargin

  /** The additive (event_type, is_base, bucket) count grid both PSI
    * faces derive from — period membership is a pure function of the
    * event's own timestamp against the FIXED `cutoff` (the
    * [[Experiments.userPrePost]] additivity discipline), the bucket
    * an exact FLOOR division of cents by 1000 (the pmod shift — the
    * [[Experiments.anonymityGrid]] refund-safe form). */
  private[graft] def psiGrid(events: DataFrame,
                             cutoff: java.sql.Timestamp): DataFrame =
    events.select(col("event_type"),
      (col("ts") < lit(cutoff)).as("is_base"),
      expr("""(CAST(round(value * 100) AS BIGINT)
             | - pmod(CAST(round(value * 100) AS BIGINT), 1000)) div 1000"""
        .stripMargin).as("bucket"))
      .groupBy(col("event_type"), col("is_base"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Population Stability Index per event type — the ML-monitoring
    * industry's standard drift alarm (Karakoulas 2004; the credit-
    * scoring heritage metric every feature-store monitor reimplements):
    * the baseline window's value distribution vs the current
    * window's, over 10-unit value buckets,
    * {{{ PSI = Σ_i (p_cur,i − p_base,i) · ln(p_cur,i / p_base,i) }}}
    * — a symmetrized KL whose conventional alarm thresholds (0.1
    * "shifting", 0.2 "significant") make it the drift gate next to
    * [[ksDoclenSourcesTransform]]'s hypothesis test and
    * `source_drift_tv`'s exact distance. Add-one smoothing over the
    * type's union bucket support keeps every log finite (p =
    * (c+1)/(n+K), K = support size) — deterministic and mirrored in
    * the oracle, unlike the drop-empty-cells convention that makes
    * PSI incomparable across windows. Each term is ONE float on
    * exact integers rounded to the 1e-9 grid and summed EXACTLY as
    * DECIMAL(24,9) — the [[miFromObs]] order-free discipline.
    *
    * Scale shape: everything on the grid — map-side-combinable
    * counts to |types|×2×|buckets| rows; the derivation joins at
    * bucket-support scale, never |events|. */
  private[graft] def psiFromGrid(grid: DataFrame): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val cells = grid.groupBy($"event_type", $"bucket")
      .agg(sum(when($"is_base", $"c").otherwise(0L)).as("cb"),
        sum(when(!$"is_base", $"c").otherwise(0L)).as("cc"))
    val tot = cells.groupBy($"event_type")
      .agg(sum($"cb").as("n_base"), sum($"cc").as("n_cur"),
        count(lit(1)).as("k"))
    cells.join(tot, Seq("event_type"))
      .select($"event_type", $"n_base", $"n_cur",
        expr("""CAST(round((CAST(cc + 1 AS DOUBLE) / (n_cur + k)
               |            - CAST(cb + 1 AS DOUBLE) / (n_base + k)) *
               |           ln((CAST(cc + 1 AS DOUBLE) / (n_cur + k))
               |              / (CAST(cb + 1 AS DOUBLE) / (n_base + k))), 9)
               |     AS DECIMAL(24,9))""".stripMargin).as("term"))
      .groupBy($"event_type", $"n_base", $"n_cur")
      .agg(sum($"term").as("psi0"))
      .select($"event_type", $"n_base", $"n_cur",
        expr("round(CAST(psi0 AS DOUBLE) + 0.0, 6)").as("psi"))
      .withColumn("drift_flag", $"psi" > 0.2)
      .orderBy($"event_type")
  }

  def psiValueDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    psiFromGrid(psiGrid(ev, Experiments.preCutoff(ev)))
  }

  /** DuckDB oracle for [[psiValueDrift]] — identical cutoff
    * (min(ts)+15d), floor bucketing, smoothing, and term/sum
    * discipline. */
  val psiValueDriftOracleSql: String =
    """WITH cut AS (SELECT min(CAST(ts AS TIMESTAMP)) + INTERVAL 15 DAY AS c FROM events),
      |cells AS (SELECT event_type,
      |                 CAST(round(value * 100) AS BIGINT) // 1000 AS bucket,
      |                 CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < (SELECT c FROM cut)
      |                          THEN 1 ELSE 0 END) AS BIGINT) AS cb,
      |                 CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) >= (SELECT c FROM cut)
      |                          THEN 1 ELSE 0 END) AS BIGINT) AS cc
      |          FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(sum(cb) AS BIGINT) AS n_base,
      |               CAST(sum(cc) AS BIGINT) AS n_cur,
      |               CAST(count(*) AS BIGINT) AS k
      |        FROM cells GROUP BY 1),
      |terms AS (SELECT c.event_type, t.n_base, t.n_cur,
      |                 CAST(round((CAST(c.cc + 1 AS DOUBLE) / (t.n_cur + t.k)
      |                             - CAST(c.cb + 1 AS DOUBLE) / (t.n_base + t.k)) *
      |                            ln((CAST(c.cc + 1 AS DOUBLE) / (t.n_cur + t.k))
      |                               / (CAST(c.cb + 1 AS DOUBLE) / (t.n_base + t.k))), 9)
      |                      AS DECIMAL(24,9)) AS term
      |          FROM cells c JOIN tot t USING (event_type))
      |SELECT event_type, n_base, n_cur,
      |       round(CAST(sum(term) AS DOUBLE) + 0.0, 6) AS psi,
      |       round(CAST(sum(term) AS DOUBLE) + 0.0, 6) > 0.2 AS drift_flag
      |FROM terms GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  /** Expected transitions to reach `purchase` from every state of
    * the empirical event-type chain — funnel depth READ OFF THE
    * DYNAMICS instead of counted per user (a state may reach
    * purchase rarely but fast, or often but slowly — this separates
    * them): 20 fixed value-iteration steps of E′_i = 1 + Σ_j
    * P_ij·E_j with the target absorbing at 0, in EXACT ×1e6
    * integers with per-term truncating div (BigInt ≡ HUGEINT, the
    * markov_stationary discipline). The iteration converges from
    * below, so a state near 20·1e6 reads as "does not reach the
    * target within the horizon" — visible, not an error.
    */
  def absorptionStepsTransform(events: DataFrame, target: String = "purchase",
                               iters: Int = 20): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val counts = events.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("curr_type"))
      .agg(count(lit(1)).as("n"))
    absorptionFromCounts(counts, target, iters)
  }

  /** First-passage MATRIX: [[absorptionStepsTransform]] for EVERY
    * target type at once — the full "how far is each state from each
    * destination" read of the chain (one column of it is the funnel
    * depth to purchase; the whole matrix exposes asymmetries like
    * "error is near signup but signup is far from error"): one
    * transition-count aggregation, then |types| value-iteration folds
    * over the SAME planning-scale matrix via the shared
    * [[absorptionFromCounts]] (the counts are localCheckpoint-ed once
    * so the lag-window aggregation never re-executes per target).
    * Targets are the corpus's five event kinds — static because the
    * unrolled oracle must be static SQL, same contract as the
    * single-target operator's default. */
  def firstPassageMatrixTransform(events: DataFrame,
      targets: Seq[String] = Seq("click", "error", "purchase", "signup", "view"),
      iters: Int = 20): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val counts = events.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("curr_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    targets.map { t =>
      absorptionFromCounts(counts, t, iters).select(lit(t).as("target"),
        col("event_type"), col("e6"), col("expected_steps"))
    }.reduce(_ unionByName _)
      .orderBy($"target", $"event_type")
  }

  def firstPassageMatrix(spark: SparkSession, dir: String): DataFrame =
    firstPassageMatrixTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[firstPassageMatrixTransform]] — one unrolled
    * [[absorptionStepsOracleSql]] block per target, unioned. */
  def firstPassageMatrixOracleSql(
      targets: Seq[String] = Seq("click", "error", "purchase", "signup", "view"),
      iters: Int = 20): String =
    targets.map { t =>
      s"SELECT '$t' AS target, * FROM (\n${absorptionStepsOracleSql(t, iters)}\n)"
    }.mkString("", "\nUNION ALL\n", "\nORDER BY target, event_type")

  /** The value-iteration fold from the (prev, curr, n) counts —
    * shared with the streaming twin over [[graft.streaming
    * .TransitionState]] (third face next to the transition report
    * and the stationary fold). */
  private[graft] def absorptionFromCounts(counts: DataFrame, target: String = "purchase",
                                          iters: Int = 20): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val cells = counts.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    val idx = types.zipWithIndex.toMap
    val d = types.length
    val c = Array.ofDim[Long](d, d)
    cells.foreach { case (i, j, n) => c(idx(i))(idx(j)) = n }
    val rs = Array.tabulate(d)(i => c(i).sum)
    val tgt = idx.get(target)
    var e = Array.fill(d)(BigInt(0))
    for (_ <- 1 to iters) {
      val next = Array.tabulate(d) { i =>
        if (tgt.contains(i)) BigInt(0)
        else BigInt(1000000) + (0 until d).iterator
          .filter(j => c(i)(j) != 0 && rs(i) > 0)
          .map(j => e(j) * c(i)(j) / rs(i)).sum
      }
      e = next
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    types.indices.map { i =>
      (types(i), e(i).toLong, r6(e(i).toDouble / 1e6))
    }.toDF("event_type", "e6", "expected_steps")
      .orderBy($"event_type")
  }

  def absorptionSteps(spark: SparkSession, dir: String): DataFrame =
    absorptionStepsTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[absorptionStepsTransform]] (target =
    * 'purchase', 20 unrolled MATERIALIZED integer steps). */
  def absorptionStepsOracleSql(target: String = "purchase", iters: Int = 20): String = {
    val iter = (k: Int) =>
      s"""e$k AS MATERIALIZED (
         |  SELECT t.event_type,
         |         CASE WHEN t.event_type = '$target' THEN CAST(0 AS HUGEINT)
         |              ELSE CAST(1000000 AS HUGEINT) +
         |                   coalesce((SELECT sum(p.v * c.n // c.rs)
         |                             FROM cells c JOIN e${k - 1} p ON p.event_type = c.curr
         |                             WHERE c.prev = t.event_type), 0)
         |         END AS v
         |  FROM tys t)""".stripMargin
    s"""WITH pr AS (
       |  SELECT user_id, event_type, ts, event_id,
       |         lag(event_type) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
       |  FROM events),
       |cnt AS MATERIALIZED (SELECT prev_type AS prev, event_type AS curr, count(*) AS n
       |       FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |cells AS MATERIALIZED (
       |  SELECT prev, curr, CAST(n AS HUGEINT) AS n,
       |         CAST(sum(n) OVER (PARTITION BY prev) AS HUGEINT) AS rs
       |  FROM cnt),
       |tys AS MATERIALIZED (SELECT DISTINCT t AS event_type FROM (
       |  SELECT prev AS t FROM cnt UNION SELECT curr FROM cnt)),
       |e0 AS MATERIALIZED (SELECT event_type, CAST(0 AS HUGEINT) AS v FROM tys),
       |${(1 to iters).map(iter).mkString(",\n")}
       |SELECT event_type, CAST(v AS BIGINT) AS e6,
       |       round(CAST(v AS DOUBLE) / 1e6, 6) AS expected_steps
       |FROM e$iters ORDER BY event_type""".stripMargin
  }

  /** Day-of-week residual outlier screen per type — "was TUESDAY
    * abnormal for a Tuesday" (a raw z-score flags every weekend on a
    * weekday-heavy product; comparing each day against ITS OWN
    * weekday's history removes the seasonal term first): per (type,
    * dow) the day-count mean/variance as exact rationals, and the
    * 3σ test cross-multiplied to a PURE INTEGER comparison
    * (K·n − S)² > 9·(K·Σn² − S²) — no float ever decides a flag;
    * the reported expectation is the single rounded float.
    *
    * Shape: |types|×|days| grid → per-(type, dow) sufficient sums
    * broadcast back onto the grid; grid-scale throughout. */
  def dowResidualOutliersTransform(events: DataFrame): DataFrame =
    dowResidualFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  /** The residual screen from the (event_type, day, n) grid — the
    * NINTH face of [[graft.streaming.TypeDailyCountState]]. */
  private[graft] def dowResidualFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"n", lit(0L)).as("n"))
      .withColumn("dow", (dayofweek($"day") - 1).cast("long"))
    val stats = grid.groupBy($"event_type", $"dow")
      .agg(count(lit(1)).as("k"), sum($"n").as("s"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("s2"))
    grid.join(broadcast(stats), Seq("event_type", "dow"))
      .select($"event_type", $"day", $"n",
        expr("round(CAST(s AS DOUBLE) / k, 6)").as("expected"),
        expr("""CASE WHEN k > 1 THEN
                  CAST(k * n - s AS DECIMAL(38,0)) * CAST(k * n - s AS DECIMAL(38,0))
                    > 9 * (k * s2 - CAST(s AS DECIMAL(38,0)) * s)
                ELSE false END""").as("is_outlier"))
      .orderBy($"event_type", $"day")
  }

  /** Seasonality STRENGTH per type — one number for what
    * [[dowResidualFromDaily]] reads day-by-day and
    * `seasonality_profile` lists per weekday: how much of the daily
    * variance the weekday EXPLAINS. F_s = SSB/SST of the dow-means
    * model over the zero-filled grid (the Hyndman seasonal-strength
    * measure with the weekday means as the seasonal component —
    * identically the ANOVA η² of dow on daily counts, so 0 = no
    * weekly rhythm, 1 = the weekday determines the count exactly).
    * Plus the peak weekday by EXACT rational mean comparison
    * (mean×1e6 truncating div — no float argmax).
    *
    * [[anovaFromMoments]]' order-free discipline: per-dow float
    * terms on exact integers, 1e-9 grid, DECIMAL(38,9) sums;
    * constant series (SST = 0) report null. THIRTEENTH face of the
    * streaming count state. */
  private[graft] def seasonalStrengthFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", (dayofweek($"day") - 1).cast("long").as("dow"),
        coalesce($"n", lit(0L)).as("n"))
    grid.groupBy($"event_type", $"dow")
      .agg(count(lit(1)).as("k"), sum($"n").as("s1"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("s2"))
      .select($"event_type", $"dow", $"k", $"s1", $"s2",
        expr("CAST(round(CAST(s1 AS DOUBLE) * s1 / k, 9) AS DECIMAL(38,9))").as("tb"),
        expr("s1 * 1000000 div k").as("mean_micro"))
      .groupBy($"event_type")
      .agg(sum($"k").as("n_days"), sum($"s1").as("s1"), sum($"s2").as("s2"),
        sum($"tb").as("stb"),
        max(struct($"mean_micro", (-$"dow").as("neg_dow"))).as("pk"))
      .select($"event_type", $"n_days", (-$"pk.neg_dow").as("peak_dow"),
        expr("CAST(stb AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days").as("ssb"),
        expr("CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days").as("sst"))
      .select($"event_type", $"n_days", $"peak_dow",
        expr("CASE WHEN sst > 0 THEN round(ssb / sst, 6) END").as("seasonal_strength"))
      .orderBy($"event_type")
  }

  def seasonalStrengthTransform(events: DataFrame): DataFrame =
    seasonalStrengthFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  def seasonalStrength(spark: SparkSession, dir: String): DataFrame =
    seasonalStrengthTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[seasonalStrengthTransform]]. */
  val seasonalStrengthOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type,
      |             CAST(date_part('dow', s.day) AS BIGINT) AS dow,
      |             CAST(coalesce(d.n, 0) AS BIGINT) AS n
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |m AS (SELECT event_type, dow, count(*) AS k, sum(n) AS s1,
      |             sum(CAST(n AS HUGEINT) * n) AS s2,
      |             CAST(round(CAST(sum(n) AS DOUBLE) * sum(n) / count(*), 9) AS DECIMAL(38,9)) AS tb,
      |             CAST(sum(n) AS HUGEINT) * 1000000 // count(*) AS mean_micro
      |      FROM g GROUP BY 1, 2),
      |a AS (SELECT event_type, CAST(sum(k) AS BIGINT) AS n_days,
      |             CAST(sum(s1) AS BIGINT) AS s1,
      |             sum(s2) AS s2, sum(tb) AS stb,
      |             first(dow ORDER BY mean_micro DESC, dow) AS peak_dow
      |      FROM m GROUP BY 1),
      |f AS (SELECT event_type, n_days, peak_dow,
      |             CAST(stb AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days AS ssb,
      |             CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days AS sst
      |      FROM a)
      |SELECT event_type, n_days, peak_dow,
      |       CASE WHEN sst > 0 THEN round(ssb / sst, 6) END AS seasonal_strength
      |FROM f ORDER BY 1""".stripMargin

  /** Wilcoxon signed-rank z between every type pair's daily series —
    * the PAIRED member of the hypothesis-test family (Mann–Whitney
    * compares two unpaired samples; here the days pair naturally, so
    * the test asks "is type A above type B on the SAME days", immune
    * to day-level shocks both types share): per day d = n_a − n_b,
    * zeros dropped (standard), |d| ranked with average ranks via the
    * doubled-rank trick (r2 = 2·rank + ties − 1, exact integers —
    * [[spearmanFromDaily]]'s discipline), W2⁺ = Σ_{d>0} r2 exact,
    * E[W2⁺] = n(n+1)/2, Var(W2⁺)·12 = 2n(n+1)(2n+1) − Σ(t³−t) (tie
    * correction exact — t³−t is divisible by 6), z = one final float.
    * All-tie pairs never zero the variance (3n(n+1)² > 0); n = 0
    * pairs report null.
    *
    * Shape: grid |types|×|days| map-side, day-equi-join pair fan-out
    * (the Spearman plan), rank windows per pair — calendar-bounded. */
  def wilcoxonSignedRankTransform(events: DataFrame): DataFrame =
    wilcoxonFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n")))

  /** The signed-rank derivation from the (event_type, day, n) grid —
    * the FOURTEENTH face of the streaming count state. */
  private[graft] def wilcoxonFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = daily.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"n", lit(0L)).as("n"))
    val a = grid.select($"event_type".as("type_a"), $"day", $"n".as("na"))
    val b = grid.select($"event_type".as("type_b"), $"day", $"n".as("nb"))
    val diffs = a.join(b, Seq("day")).filter($"type_a" < $"type_b")
      .select($"type_a", $"type_b", ($"na" - $"nb").as("d"),
        abs($"na" - $"nb").as("ad"))
      .filter($"d" =!= 0L)
    val wRank = Window.partitionBy($"type_a", $"type_b").orderBy($"ad")
    val wTie = Window.partitionBy($"type_a", $"type_b", $"ad")
    val ranked = diffs
      .withColumn("rk", rank().over(wRank).cast("long"))
      .withColumn("ties", count(lit(1)).over(wTie))
      .select($"type_a", $"type_b", $"d", $"ad",
        (lit(2L) * $"rk" + $"ties" - 1L).as("r2"))
    val ties = diffs.groupBy($"type_a", $"type_b", $"ad")
      .agg(count(lit(1)).as("t"))
      .groupBy($"type_a", $"type_b")
      .agg(sum(expr("t * t * t - t")).as("tsum"))
    ranked.groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_nonzero"),
        sum(when($"d" > 0, $"r2").otherwise(0L)).as("w2_plus"))
      .join(ties, Seq("type_a", "type_b"))
      .select($"type_a", $"type_b", $"n_nonzero", $"w2_plus",
        expr("""CASE WHEN n_nonzero > 0 THEN
               |  round((w2_plus - n_nonzero * (n_nonzero + 1) / 2) /
               |        sqrt((2 * n_nonzero * (n_nonzero + 1) * (2 * n_nonzero + 1) - tsum) / 12.0), 6)
               |END""".stripMargin).as("wilcoxon_z"))
      .orderBy($"type_a", $"type_b")
  }

  def wilcoxonSignedRank(spark: SparkSession, dir: String): DataFrame =
    wilcoxonSignedRankTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[wilcoxonSignedRankTransform]]. */
  val wilcoxonSignedRankOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type, s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |df AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |              a.n - b.n AS d, abs(a.n - b.n) AS ad
      |       FROM g a JOIN g b ON a.day = b.day AND a.event_type < b.event_type
      |       WHERE a.n != b.n),
      |r AS (SELECT type_a, type_b, d,
      |             2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY ad)
      |               + count(*) OVER (PARTITION BY type_a, type_b, ad) - 1 AS r2
      |      FROM df),
      |ts AS (SELECT type_a, type_b, CAST(sum(t * t * t - t) AS BIGINT) AS tsum
      |       FROM (SELECT type_a, type_b, ad, count(*) AS t FROM df GROUP BY 1, 2, 3)
      |       GROUP BY 1, 2),
      |w AS (SELECT type_a, type_b, count(*) AS n_nonzero,
      |             CAST(sum(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2_plus
      |      FROM r GROUP BY 1, 2)
      |SELECT w.type_a, w.type_b, w.n_nonzero, w.w2_plus,
      |       CASE WHEN n_nonzero > 0 THEN
      |         round((w2_plus - n_nonzero * (n_nonzero + 1) / 2) /
      |               sqrt((2 * n_nonzero * (n_nonzero + 1) * (2 * n_nonzero + 1) - tsum) / 12.0), 6)
      |       END AS wilcoxon_z
      |FROM w JOIN ts ON w.type_a = ts.type_a AND w.type_b = ts.type_b
      |ORDER BY 1, 2""".stripMargin

  def dowResidualOutliers(spark: SparkSession, dir: String): DataFrame =
    dowResidualOutliersTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[dowResidualOutliersTransform]]. */
  val dowResidualOutliersOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type, s.day, coalesce(d.n, 0) AS n,
      |             CAST(date_part('dow', s.day) AS BIGINT) AS dow
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day),
      |st AS (SELECT event_type, dow, count(*) AS k, sum(n) AS s,
      |              sum(CAST(n AS HUGEINT) * n) AS s2
      |       FROM g GROUP BY 1, 2)
      |SELECT g.event_type, g.day, CAST(g.n AS BIGINT) AS n,
      |       round(CAST(st.s AS DOUBLE) / st.k, 6) AS expected,
      |       CASE WHEN st.k > 1 THEN
      |         CAST(st.k * g.n - st.s AS HUGEINT) * CAST(st.k * g.n - st.s AS HUGEINT)
      |           > 9 * (st.k * st.s2 - CAST(st.s AS HUGEINT) * st.s)
      |       ELSE false END AS is_outlier
      |FROM g JOIN st ON st.event_type = g.event_type AND st.dow = g.dow
      |ORDER BY g.event_type, g.day""".stripMargin

  /** JSON property-key census over the event payloads — the
    * data-contract drift detector (a key vanishing or a new one
    * ramping is a producer deploy you want to SEE): every key's
    * event count and share, via the engines' native JSON key
    * enumeration (`json_object_keys` / `json_keys` — no schema
    * assumption about the values at all).
    *
    * Shape: per-row explode collapses map-side to the key-vocabulary
    * grid; one broadcast total. */
  def propsKeyCensusTransform(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keys = events
      .select(explode(expr("json_object_keys(props)")).as("key"))
      .groupBy($"key").agg(count(lit(1)).as("n_events"))
    keys.crossJoin(broadcast(events.agg(count(lit(1)).as("t"))))
      .select($"key", $"n_events",
        expr("round(CAST(n_events AS DOUBLE) / t, 6)").as("share"))
      .orderBy($"key")
  }

  def propsKeyCensus(spark: SparkSession, dir: String): DataFrame =
    propsKeyCensusTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[propsKeyCensusTransform]]. */
  val propsKeyCensusOracleSql: String =
    """WITH k AS (SELECT u.k AS key, count(*) AS n_events
      |           FROM events, unnest(json_keys(props)) AS u(k)
      |           GROUP BY 1),
      |t AS (SELECT count(*) AS t FROM events)
      |SELECT key, n_events,
      |       round(CAST(n_events AS DOUBLE) / t, 6) AS share
      |FROM k, t ORDER BY key""".stripMargin

  /** DuckDB oracle for [[transitionEntropyTransform]]. */
  val transitionEntropyOracleSql: String =
    """WITH p AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
      |  FROM events),
      |c AS (SELECT prev_type, event_type AS curr_type, count(*) AS n
      |      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |s AS (SELECT prev_type, sum(n) AS n_out, count(*) AS n_branches,
      |             sum(CAST(round(n * log2(n), 6) AS DECIMAL(20,6))) AS snl
      |      FROM c GROUP BY 1)
      |SELECT prev_type, CAST(n_out AS BIGINT) AS n_out,
      |       CAST(n_branches AS BIGINT) AS n_branches,
      |       round(log2(n_out) - CAST(snl AS DOUBLE) / n_out + 0.0, 6) AS entropy_bits
      |FROM s ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[typeReachCiTransform]] — the identical
    * Wilson expression, same literals, same order. */
  val typeReachCiOracleSql: String =
    """WITH r AS (SELECT event_type, count(*) AS k
      |           FROM (SELECT DISTINCT event_type, user_id FROM events) GROUP BY 1),
      |t AS (SELECT count(DISTINCT user_id) AS n FROM events)
      |SELECT event_type, CAST(n AS BIGINT) AS n_users, CAST(k AS BIGINT) AS reach_users,
      |       round(CAST(k AS DOUBLE) / n, 6) AS reach,
      |       round(((CAST(k AS DOUBLE) / n + 3.8416 / (2 * n)) - 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n + 3.8416 / (4.0 * n * n))) / (1 + 3.8416 / n), 6) AS wilson_lo,
      |       round(((CAST(k AS DOUBLE) / n + 3.8416 / (2 * n)) + 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n + 3.8416 / (4.0 * n * n))) / (1 + 3.8416 / n), 6) AS wilson_hi
      |FROM r, t ORDER BY event_type""".stripMargin

  /** DuckDB oracle for [[fanoFactorDailyTransform]]. */
  val fanoFactorDailyOracleSql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      |          FROM (SELECT min(day) AS lo, max(day) AS hi FROM d)),
      |g AS (SELECT t.event_type, coalesce(d.n, 0) AS n
      |      FROM (SELECT DISTINCT event_type FROM d) t
      |      CROSS JOIN spine s
      |      LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day)
      |SELECT event_type, count(*) AS n_days, CAST(sum(n) AS BIGINT) AS n_events,
      |       round(CAST(count(*) * sum(CAST(n AS HUGEINT) * n)
      |                  - CAST(sum(n) AS HUGEINT) * sum(n) AS DOUBLE)
      |             / (CAST(count(*) AS DOUBLE) * sum(n)), 6) AS fano
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[cramersVSourceLangTransform]]. */
  val cramersVSourceLangOracleSql: String =
    """WITH obs AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
      |r AS (SELECT source, sum(n) AS r FROM obs GROUP BY 1),
      |c AS (SELECT lang, sum(n) AS c FROM obs GROUP BY 1),
      |t AS (SELECT sum(n) AS t, count(DISTINCT source) AS nr,
      |             count(DISTINCT lang) AS nc
      |      FROM obs),
      |cells AS (SELECT r.source, c.lang, coalesce(obs.n, 0) AS n
      |          FROM r CROSS JOIN c
      |          LEFT JOIN obs ON obs.source = r.source AND obs.lang = c.lang),
      |contrib AS (
      |  SELECT t.t, t.nr, t.nc,
      |         CAST(round(CAST(CAST(cells.n AS HUGEINT) * t.t - CAST(r.r AS HUGEINT) * c.c AS DOUBLE)
      |                    * CAST(CAST(cells.n AS HUGEINT) * t.t - CAST(r.r AS HUGEINT) * c.c AS DOUBLE)
      |                    / (CAST(t.t AS DOUBLE) * r.r * c.c), 6) AS DECIMAL(20,6)) AS contrib
      |  FROM cells JOIN r ON r.source = cells.source
      |             JOIN c ON c.lang = cells.lang CROSS JOIN t)
      |SELECT CAST(t AS BIGINT) AS n_docs, CAST(nr AS BIGINT) AS n_sources,
      |       CAST(nc AS BIGINT) AS n_langs,
      |       CAST(sum(contrib) AS DOUBLE) AS chi2,
      |       round(sqrt(CAST(sum(contrib) AS DOUBLE)
      |                  / (t * least(nr - 1, nc - 1))), 6) AS cramers_v
      |FROM contrib GROUP BY t, nr, nc""".stripMargin

  /** One-way ANOVA F over the event-value cents across event types —
    * the OMNIBUS companion of [[Behavior.abWelchTtestTransform]]'s
    * pairwise t's (the pairwise table answers "which two differ",
    * the F answers "does type explain value AT ALL" in one number,
    * plus η² = SSB/SST as the effect size): per-type exact integer
    * moments (n, Σc, Σc²), then SSB = Σ_g S1_g²/n_g − S1²/N and
    * SSW = Σ_g (S2_g − S1_g²/n_g), F = (SSB/(k−1))/(SSW/(N−k)).
    *
    * Order-free discipline: each per-group float term is rounded to
    * the 1e-9 grid and summed as DECIMAL(38,9) (S1² ≈ 4·10¹⁸ at
    * sf0.1 needs the 29 integer digits), so the cross-group sum is
    * exact and shuffle-order-independent; F and η² are then single
    * floats over those fixed decimals. Degenerate inputs (k ≤ 1 or
    * SSW ≤ 0) report null, not an engine-dependent inf.
    *
    * Shape: one map-side-combinable shuffle to |types| rows, then a
    * one-row rollup — scan-bound at any scale. */
  def anovaFCentsTransform(events: DataFrame): DataFrame =
    anovaFromMoments(events
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sumsq_c")))

  /** The F rollup from per-type exact moments (event_type, n, sum_c,
    * sumsq_c) — the SECOND face of [[graft.streaming.MomentsState]]
    * (the per-type mean/sd report is the first): the ANOVA needs
    * nothing beyond the same additive state. */
  private[graft] def anovaFromMoments(mom: DataFrame): DataFrame = {
    val spark = mom.sparkSession
    import spark.implicits._
    mom.select($"n", $"sum_c", $"sumsq_c",
        expr("CAST(round(CAST(sum_c AS DOUBLE) * sum_c / n, 9) AS DECIMAL(38,9))").as("tb"),
        expr("CAST(round(CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * sum_c / n, 9) AS DECIMAL(38,9))").as("tw"))
      .agg(count(lit(1)).as("k"), sum($"n").as("n_events"),
        sum($"sum_c").as("s1"), sum($"tb").as("stb"), sum($"tw").as("ssw"))
      .select($"k", $"n_events",
        expr("CAST(stb AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_events").as("ssb"),
        expr("CAST(ssw AS DOUBLE)").as("ssw"))
      .select($"k", $"n_events",
        expr("""CASE WHEN k > 1 AND n_events > k AND ssw > 0 THEN
               |  round((ssb / (k - 1)) / (ssw / (n_events - k)), 6)
               |END""".stripMargin).as("f_stat"),
        expr("""CASE WHEN ssb + ssw > 0 THEN round(ssb / (ssb + ssw), 6) END""")
          .as("eta_sq"))
  }

  def anovaFCents(spark: SparkSession, dir: String): DataFrame =
    anovaFCentsTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[anovaFCentsTransform]] — identical term
    * shapes, identical 1e-9 grid, identical guards. */
  val anovaFCentsOracleSql: String =
    """WITH m AS (SELECT event_type, count(*) AS n,
      |                  sum(CAST(round(value * 100) AS BIGINT)) AS sum_c,
      |                  sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
      |                      * CAST(round(value * 100) AS BIGINT)) AS sumsq_c
      |           FROM events GROUP BY 1),
      |t AS (SELECT event_type, n, sum_c,
      |             CAST(round(CAST(sum_c AS DOUBLE) * sum_c / n, 9) AS DECIMAL(38,9)) AS tb,
      |             CAST(round(CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * sum_c / n, 9) AS DECIMAL(38,9)) AS tw
      |      FROM m),
      |a AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_events,
      |             CAST(sum(sum_c) AS BIGINT) AS s1,
      |             sum(tb) AS stb, sum(tw) AS ssw
      |      FROM t),
      |f AS (SELECT k, n_events,
      |             CAST(stb AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_events AS ssb,
      |             CAST(ssw AS DOUBLE) AS ssw
      |      FROM a)
      |SELECT k, n_events,
      |       CASE WHEN k > 1 AND n_events > k AND ssw > 0 THEN
      |         round((ssb / (k - 1)) / (ssw / (n_events - k)), 6)
      |       END AS f_stat,
      |       CASE WHEN ssb + ssw > 0 THEN round(ssb / (ssb + ssw), 6) END AS eta_sq
      |FROM f""".stripMargin

  /** Kruskal–Wallis H across event types on the value cents — the
    * k-group omnibus member of the rank family ([[mannWhitneyU]] is
    * its two-group pairwise sibling exactly as [[anovaFCents]] sits
    * over the Welch t's): does event type shift the value
    * DISTRIBUTION at all, with no normality assumption.
    *
    * Exact-rank discipline as in [[mwFromCounts]]: from the (type,
    * cents) support grid, 2·avgrank(v) = 2·below(v) + tie(v) + 1 is
    * an exact integer on the pooled support, so 2·R_g is an exact
    * DECIMAL(38,0); H = [12/(N(N+1))]·Σ R_g²/n_g − 3(N+1) with the
    * per-group R² term rounded to the 1e-9 grid and summed as
    * DECIMAL(38,9) (the [[anovaFromMoments]] order-free float
    * discipline). Tie correction C = 1 − Σ(t³−t)/(N³−N) as exact
    * DECIMAL(38,0) ratios; ε² = (H−k+1)/(N−k) is the effect size.
    *
    * Shape: fact → support grid in one map-side-combinable shuffle
    * (cents-bounded, never |events|); the pooled-rank window runs
    * over the tie aggregate (planning-scale, gate-compliant); output
    * is one row. */
  private[graft] def kwFromCounts(cnts: DataFrame): DataFrame = {
    val spark = cnts.sparkSession
    import spark.implicits._
    val ties = cnts.groupBy($"cents").agg(sum($"c").as("t"))
    val w = Window.orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = ties.withColumn("below", sum($"t").over(w) - $"t")
    val perType = cnts.join(ranked, Seq("cents"))
      .groupBy($"event_type")
      .agg(sum($"c").as("n"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * (2 * below + t + 1)")).as("r2"))
      .select($"n",
        expr("CAST(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / (4.0 * n), 9) AS DECIMAL(38,9))")
          .as("term"))
      .agg(count(lit(1)).as("k"), sum($"n").as("n_events"), sum($"term").as("sterm"))
    val tcorr = ties
      .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t")).as("t3"))
    perType.join(tcorr)
      .select($"k", $"n_events",
        expr("""12.0 * CAST(sterm AS DOUBLE) / (CAST(n_events AS DOUBLE) * (n_events + 1))
               |  - 3.0 * (n_events + 1)""".stripMargin).as("h0"),
        expr("""1.0 - CAST(t3 AS DOUBLE)
               |  / (CAST(n_events AS DOUBLE) * n_events * n_events - n_events)""".stripMargin)
          .as("cc"))
      .select($"k", $"n_events",
        expr("CASE WHEN k > 1 AND n_events > k THEN round(h0, 6) END").as("h"),
        expr("CASE WHEN k > 1 AND n_events > k AND cc > 0 THEN round(h0 / cc, 6) END")
          .as("h_tie"),
        expr("""CASE WHEN k > 1 AND n_events > k THEN
               |  round((h0 - k + 1) / (n_events - k), 6) END""".stripMargin).as("eps_sq"))
  }

  def kruskalWallisTransform(events: DataFrame): DataFrame =
    kwFromCounts(events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("c")))

  def kruskalWallis(spark: SparkSession, dir: String): DataFrame =
    kruskalWallisTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[kruskalWallisTransform]] — identical rank
    * integers, identical 1e-9 term grid, identical guards. */
  val kruskalWallisOracleSql: String =
    """WITH cnt AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |                    count(*) AS c
      |             FROM events GROUP BY 1, 2),
      |ties AS (SELECT cents, sum(c) AS t FROM cnt GROUP BY 1),
      |ranked AS (SELECT cents, t,
      |                  sum(t) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - t AS below
      |           FROM ties),
      |per AS (SELECT cnt.event_type, sum(cnt.c) AS n,
      |               sum(CAST(cnt.c AS HUGEINT) * (2 * ranked.below + ranked.t + 1)) AS r2
      |        FROM cnt JOIN ranked ON ranked.cents = cnt.cents
      |        GROUP BY 1),
      |agg AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_events,
      |               sum(CAST(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / (4.0 * n), 9)
      |                   AS DECIMAL(38,9))) AS sterm
      |        FROM per),
      |tc AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS t3 FROM ties),
      |h AS (SELECT k, n_events,
      |             12.0 * CAST(sterm AS DOUBLE) / (CAST(n_events AS DOUBLE) * (n_events + 1))
      |               - 3.0 * (n_events + 1) AS h0,
      |             1.0 - CAST(t3 AS DOUBLE)
      |               / (CAST(n_events AS DOUBLE) * n_events * n_events - n_events) AS cc
      |      FROM agg, tc)
      |SELECT k, n_events,
      |       CASE WHEN k > 1 AND n_events > k THEN round(h0, 6) END AS h,
      |       CASE WHEN k > 1 AND n_events > k AND cc > 0 THEN round(h0 / cc, 6) END AS h_tie,
      |       CASE WHEN k > 1 AND n_events > k THEN
      |         round((h0 - k + 1) / (n_events - k), 6) END AS eps_sq
      |FROM h""".stripMargin

  /** Brown–Forsythe (median-centered Levene) test for variance
    * homogeneity across event types — the PRECONDITION screen for
    * [[anovaFCents]] (the F test assumes equal variances; this is
    * the standard robust check, and it IS a one-way ANOVA on the
    * absolute median deviations z = |x − med_g|).
    *
    * med_g is the LOW-median convention made explicit so both
    * engines agree with no interpolation ambiguity: the smallest
    * cents value whose within-type cumulative count reaches
    * ceil((n+1)/2). z moments are exact integers off the support
    * grid (Σc·|v−med|, Σc·(v−med)²), and the W statistic reuses
    * [[anovaFromMoments]] verbatim — shared-code parity with the
    * ANOVA face. Shape: one shuffle to the cents grid, per-type
    * median via the grid window, one-row output. */
  private[graft] def leveneFromCounts(cnts: DataFrame): DataFrame = {
    val spark = cnts.sparkSession
    import spark.implicits._
    val wct = Window.partitionBy($"event_type").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = cnts
      .withColumn("cum", sum($"c").over(wct))
      .withColumn("n", sum($"c").over(Window.partitionBy($"event_type")))
    val med = withCum.filter(lit(2) * $"cum" >= $"n" + 1)
      .groupBy($"event_type").agg(min($"cents").as("med"))
    val zmom = cnts.join(med, Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("support"), sum($"c").as("n"),
        sum(expr("c * abs(cents - med)")).as("sum_c"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * (cents - med) * (cents - med)")).as("sumsq_c"))
      .select($"event_type", $"n", $"sum_c", $"sumsq_c")
    anovaFromMoments(zmom)
      .select($"k", $"n_events", $"f_stat".as("w_stat"), $"eta_sq")
  }

  def leveneBrownForsytheTransform(events: DataFrame): DataFrame =
    leveneFromCounts(events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("c")))

  def leveneBrownForsythe(spark: SparkSession, dir: String): DataFrame =
    leveneBrownForsytheTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[leveneBrownForsytheTransform]] — the same
    * explicit low-median, the same z moments, the same anova body. */
  val leveneBrownForsytheOracleSql: String =
    """WITH cnt AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |                    count(*) AS c
      |             FROM events GROUP BY 1, 2),
      |cum AS (SELECT event_type, cents, c,
      |               sum(c) OVER (PARTITION BY event_type ORDER BY cents
      |                            ROWS UNBOUNDED PRECEDING) AS cum,
      |               sum(c) OVER (PARTITION BY event_type) AS n
      |        FROM cnt),
      |med AS (SELECT event_type, min(cents) AS med FROM cum
      |        WHERE 2 * cum >= n + 1 GROUP BY 1),
      |m AS (SELECT cnt.event_type, sum(cnt.c) AS n,
      |             sum(cnt.c * abs(cnt.cents - med.med)) AS sum_c,
      |             sum(CAST(cnt.c AS HUGEINT) * (cnt.cents - med.med)
      |                 * (cnt.cents - med.med)) AS sumsq_c
      |      FROM cnt JOIN med ON med.event_type = cnt.event_type
      |      GROUP BY 1),
      |t AS (SELECT event_type, n, sum_c,
      |             CAST(round(CAST(sum_c AS DOUBLE) * sum_c / n, 9) AS DECIMAL(38,9)) AS tb,
      |             CAST(round(CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * sum_c / n, 9) AS DECIMAL(38,9)) AS tw
      |      FROM m),
      |a AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_events,
      |             CAST(sum(sum_c) AS BIGINT) AS s1,
      |             sum(tb) AS stb, sum(tw) AS ssw
      |      FROM t),
      |f AS (SELECT k, n_events,
      |             CAST(stb AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_events AS ssb,
      |             CAST(ssw AS DOUBLE) AS ssw
      |      FROM a)
      |SELECT k, n_events,
      |       CASE WHEN k > 1 AND n_events > k AND ssw > 0 THEN
      |         round((ssb / (k - 1)) / (ssw / (n_events - k)), 6)
      |       END AS w_stat,
      |       CASE WHEN ssb + ssw > 0 THEN round(ssb / (ssb + ssw), 6) END AS eta_sq
      |FROM f""".stripMargin

  /** Friedman test over the day × event-type activity grid — "do the
    * types keep the same activity ORDERING day after day": blocks =
    * calendar days, treatments = event types, measurement = the
    * day's event count (zero-filled — a silent type ranks last, it
    * does not vanish). Within each day the k counts get tie-averaged
    * ranks (2·r integers via the below/tie construction); the
    * tie-robust statistic is the Iman–Davenport form χ² = (k−1)·
    * Σ_j(R_j − n(k+1)/2)² / (A − C) with A = Σr², C = nk(k+1)²/4 —
    * scaled by 4 throughout so every term is an exact integer until
    * the single final division. Kendall's W = χ²/(n(k−1)) is the
    * agreement effect size.
    *
    * Shape: fact → (day, type) counts in one shuffle; the zero-fill
    * is a broadcast cross of two tiny dimension aggregates; ranks
    * are windows over per-day tie aggregates. Everything after the
    * first aggregate is grid-scale. */
  /** Friedman from the (day, event_type, x) daily-count grid — a
    * face over the same additive state the streaming daily-count
    * twin keeps. */
  private[graft] def friedmanFromDailyCounts(obs: DataFrame): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    // calendar spine from a ONE-ROW bounds aggregate (the ewmaFromDaily
    // pattern): the types×days zero-fill grid materializes through a
    // generator + equi-join — never a nested-loop join over a keyed
    // aggregate (plan-audit gate); an all-silent calendar day ranks
    // fully tied, which the spine represents and observed-days-only
    // would skip
    val bounds = obs.agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = obs.select($"event_type").distinct()
      .crossJoin(broadcast(bounds)) // 1-row build side
      .select($"event_type", explode(expr("sequence(lo, hi, INTERVAL 1 DAY)")).as("day"))
      .join(obs, Seq("day", "event_type"), "left")
      .select($"day", $"event_type", coalesce($"x", lit(0L)).as("x"))
    val ties = grid.groupBy($"day", $"x").agg(count(lit(1)).as("t"))
    val wd = Window.partitionBy($"day").orderBy($"x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = ties.withColumn("below", sum($"t").over(wd) - $"t")
      .select($"day", $"x", (lit(2L) * $"below" + $"t" + 1L).as("ar2"))
    val withRank = grid.join(ranked, Seq("day", "x"))
    val perType = withRank.groupBy($"event_type")
      .agg(sum($"ar2").as("r2"), count(lit(1)).as("n_days"))
    val a4 = withRank.agg(sum($"ar2" * $"ar2").as("a4"))
    val dims = perType.agg(count(lit(1)).as("k"), max($"n_days").as("nd"))
    // χ² = (k−1)·Σ_j(2R_j − n(k+1))² / (4A − 4C): the ×4 scaling
    // keeps numerator and denominator exact integers (4A = Σ ar2²,
    // 4C = n·k·(k+1)²) until the one final division
    val num = perType.join(dims) // 1-row build side
      .select((($"r2" - $"nd" * ($"k" + 1L))
        * ($"r2" - $"nd" * ($"k" + 1L))).as("d2"), $"k", $"nd")
      .groupBy($"k", $"nd").agg(sum($"d2").as("num4"))
      .select($"k", $"nd".as("n_days"), $"num4")
    num.join(a4) // 1-row build side
      .select($"n_days", $"k",
        ($"a4" - $"n_days" * $"k" * ($"k" + 1L) * ($"k" + 1L)).as("den4"), $"num4")
      .select($"n_days", $"k",
        expr("""CASE WHEN k > 1 AND den4 > 0 THEN
               |  round((k - 1) * CAST(num4 AS DOUBLE) / den4, 6) END""".stripMargin)
          .as("chi2_f"),
        expr("""CASE WHEN k > 1 AND den4 > 0 THEN
               |  round((k - 1) * CAST(num4 AS DOUBLE) / den4 / (n_days * (k - 1)), 6)
               |END""".stripMargin).as("kendalls_w"))
  }

  /** DuckDB oracle for [[friedmanDailyTransform]] — identical grid,
    * identical ×4 integer scaling. */
  val friedmanDailyOracleSql: String =
    """WITH obs AS (SELECT date_trunc('day', ts) AS day, event_type, count(*) AS x
      |             FROM events GROUP BY 1, 2),
      |spine AS (SELECT unnest(generate_series((SELECT min(day) FROM obs),
      |                                        (SELECT max(day) FROM obs),
      |                                        INTERVAL 1 DAY)) AS day),
      |grid AS (SELECT d.day, t.event_type, coalesce(obs.x, 0) AS x
      |         FROM spine d
      |         CROSS JOIN (SELECT DISTINCT event_type FROM obs) t
      |         LEFT JOIN obs ON obs.day = d.day AND obs.event_type = t.event_type),
      |ties AS (SELECT day, x, count(*) AS t FROM grid GROUP BY 1, 2),
      |ranked AS (SELECT day, x,
      |                  2 * (sum(t) OVER (PARTITION BY day ORDER BY x
      |                                    ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS ar2
      |           FROM ties),
      |wr AS (SELECT grid.day, grid.event_type, ranked.ar2
      |       FROM grid JOIN ranked ON ranked.day = grid.day AND ranked.x = grid.x),
      |per AS (SELECT event_type, sum(ar2) AS r2, count(*) AS n_days FROM wr GROUP BY 1),
      |a4 AS (SELECT sum(ar2 * ar2) AS a4 FROM wr),
      |dims AS (SELECT count(*) AS k, max(n_days) AS n_days FROM per),
      |num AS (SELECT dims.k, dims.n_days,
      |               sum((per.r2 - per.n_days * (dims.k + 1))
      |                   * (per.r2 - per.n_days * (dims.k + 1))) AS num4
      |        FROM per, dims GROUP BY 1, 2)
      |SELECT CAST(num.n_days AS BIGINT) AS n_days, CAST(num.k AS BIGINT) AS k,
      |       CASE WHEN num.k > 1 AND a4.a4 - num.n_days * num.k * (num.k + 1) * (num.k + 1) > 0 THEN
      |         round((num.k - 1) * CAST(num.num4 AS DOUBLE)
      |               / (a4.a4 - num.n_days * num.k * (num.k + 1) * (num.k + 1)), 6) END AS chi2_f,
      |       CASE WHEN num.k > 1 AND a4.a4 - num.n_days * num.k * (num.k + 1) * (num.k + 1) > 0 THEN
      |         round((num.k - 1) * CAST(num.num4 AS DOUBLE)
      |               / (a4.a4 - num.n_days * num.k * (num.k + 1) * (num.k + 1))
      |               / (num.n_days * (num.k - 1)), 6) END AS kendalls_w
      |FROM num, a4""".stripMargin

  def friedmanDailyTransform(events: DataFrame): DataFrame =
    friedmanFromDailyCounts(events
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("x")))

  def friedmanDaily(spark: SparkSession, dir: String): DataFrame =
    friedmanDailyTransform(Tables.events(spark, dir))

  /** Page–Hinkley drift statistic over each type's daily-mean value
    * series — the SEQUENTIAL changepoint monitor next to
    * [[Timeseries]]' retrospective CUSUM face: PH_t = m_t − min_{i≤t}
    * m_i with m_t = Σ_{i≤t}(x_i − x̄_i), x̄_i the running mean at i.
    * A sustained upward mean shift makes PH grow linearly after the
    * change; the alarm threshold λ is the consumer's (the statistic
    * is reported per day, not thresholded here).
    *
    * Float discipline: the series is |days| rows per type (grid-
    * scale after one fact shuffle); the running mean / cumulative
    * sum / cumulative min all run in day order inside per-type
    * windows, so both engines execute the identical IEEE op
    * sequence and round once at 1e-6. */
  /** The PH derivation from an already-aggregated (event_type, day,
    * cents, n) grid — split out so the STREAMING twin reads it over
    * [[graft.streaming.DailyTypeCentsState]]'s additive state (the
    * running-mean recursion is NOT mergeable across out-of-order
    * batches; the daily (Σcents, n) grid is). */
  private[graft] def pageHinkleyFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0.select($"event_type", $"day",
      (expr("CAST(cents AS DOUBLE)") / $"n").as("x"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = daily.withColumn("d", $"x" - avg($"x").over(w))
    val m = dev.withColumn("m", sum($"d").over(w))
    m.withColumn("ph", round($"m" - min($"m").over(w), 6))
      .select($"event_type", $"day", $"ph")
      .orderBy($"event_type", $"day")
  }

  def pageHinkleyDailyTransform(events: DataFrame): DataFrame =
    pageHinkleyFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("cents"), count(lit(1)).as("n")))

  def pageHinkleyDaily(spark: SparkSession, dir: String): DataFrame =
    pageHinkleyDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[pageHinkleyDailyTransform]]. */
  val pageHinkleyDailyOracleSql: String =
    """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
      |                      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      |                        / count(*) AS x
      |               FROM events GROUP BY 1, 2),
      |dev AS (SELECT event_type, day, x,
      |               x - avg(x) OVER (PARTITION BY event_type ORDER BY day
      |                                ROWS UNBOUNDED PRECEDING) AS d
      |        FROM daily),
      |m AS (SELECT event_type, day,
      |             sum(d) OVER (PARTITION BY event_type ORDER BY day
      |                          ROWS UNBOUNDED PRECEDING) AS m
      |      FROM dev)
      |SELECT event_type, CAST(day AS TIMESTAMP) AS day,
      |       round(m - min(m) OVER (PARTITION BY event_type ORDER BY day
      |                              ROWS UNBOUNDED PRECEDING), 6) AS ph
      |FROM m ORDER BY 1, 2""".stripMargin

  /** Grubbs outlier statistic per type over the daily revenue-cents
    * sums — "is the most extreme day a statistical outlier": G =
    * max|x_d − x̄| / s. The argmax is EXACT integer arithmetic
    * (maximize |n·x_d − S1|, all Longs; ties broken by earliest
    * day), so the reported day is order-independent; only G itself
    * is a float, computed once from exact moments and rounded.
    *
    * Shape: fact → (type, day) sums in one shuffle; per-type moments
    * and the max are grid-scale aggregates. */
  /** Grubbs from the (event_type, day, cents) daily grid — the
    * THIRD face of [[graft.streaming.DailyTypeCentsState]] (EWMA and
    * Holt are the smoother faces; this is the outlier screen over
    * the same additive sums). */
  private[graft] def grubbsFromDaily(daily0: DataFrame): DataFrame = {
    val spark = daily0.sparkSession
    import spark.implicits._
    val daily = daily0.select($"event_type", $"day", $"cents".as("x"))
    val mom = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("s1"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"))
    val star = daily.join(mom, Seq("event_type"))
      .select($"event_type", $"day", $"x", $"n", $"s1", $"s2",
        abs($"n" * $"x" - $"s1").as("adev"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"adev".desc, $"day")))
      .filter($"rn" === 1)
    star.select($"event_type", $"n".as("n_days"), $"day".as("day_star"),
        $"x".as("cents_star"),
        expr("""CASE WHEN n > 2 AND CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n > 0 THEN
               |  round((CAST(adev AS DOUBLE) / n)
               |        / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)), 6)
               |END""".stripMargin).as("g"))
      .orderBy($"event_type")
  }

  def grubbsDailyTransform(events: DataFrame): DataFrame =
    grubbsFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day")).agg(sum(col("c")).as("cents")))

  def grubbsDaily(spark: SparkSession, dir: String): DataFrame =
    grubbsDailyTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[grubbsDailyTransform]]. */
  val grubbsDailyOracleSql: String =
    """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
      |                      sum(CAST(round(value * 100) AS BIGINT)) AS x
      |               FROM events GROUP BY 1, 2),
      |mom AS (SELECT event_type, count(*) AS n, sum(x) AS s1,
      |               sum(CAST(x AS HUGEINT) * x) AS s2
      |        FROM daily GROUP BY 1),
      |star AS (SELECT daily.event_type, daily.day, daily.x, mom.n, mom.s1, mom.s2,
      |                abs(mom.n * daily.x - mom.s1) AS adev,
      |                row_number() OVER (PARTITION BY daily.event_type
      |                                   ORDER BY abs(mom.n * daily.x - mom.s1) DESC,
      |                                            daily.day) AS rn
      |         FROM daily JOIN mom ON mom.event_type = daily.event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(day AS TIMESTAMP) AS day_star,
      |       CAST(x AS BIGINT) AS cents_star,
      |       CASE WHEN n > 2 AND CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n > 0 THEN
      |         round((CAST(adev AS DOUBLE) / n)
      |               / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)), 6)
      |       END AS g
      |FROM star WHERE rn = 1 ORDER BY 1""".stripMargin

  /** Jackknife standard error of the per-type RATIO estimator
    * (cents per event) over days — the leave-one-out companion of
    * [[Sampling.bootstrapMeanCi]] and the textbook case where a
    * resampling SE genuinely differs from a plug-in formula: the
    * ratio Σcents/Σn is nonlinear in the per-day pairs, so its
    * uncertainty has no exact closed form and the delta method /
    * jackknife is the standard read (Efron & Tibshirani ch. 11,
    * "ratio estimation"). Days are the natural resampling unit — a
    * leave-one-EVENT-out jackknife would be data-scale; the day
    * blocks are calendar-bounded and respect within-day correlation.
    *
    * SE_jack = √((n−1)/n · Σ(r_i − r̄)²), r_i the leave-day-i-out
    * ratio. Float discipline: each r_i and r_i² is quantized to the
    * 1e-9 grid and summed as DECIMAL (order-free), so both engines
    * agree exactly; the SSE and the final √ are single float steps.
    * Shape: one shuffle to the daily grid; everything after is
    * grid-scale. */
  private[graft] def jackknifeRatioFromDaily(daily: DataFrame): DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    val tot = daily.groupBy($"event_type")
      .agg(sum($"cents").as("sc"), sum($"n").as("sn"), count(lit(1)).as("nd"))
    daily.join(tot, Seq("event_type"))
      .filter($"sn" - $"n" > 0 && $"nd" > 1)
      .select($"event_type", $"sc", $"sn", $"nd",
        (expr("CAST(sc - cents AS DOUBLE)") / ($"sn" - $"n")).as("r"))
      .select($"event_type", $"sc", $"sn", $"nd",
        expr("CAST(round(r, 9) AS DECIMAL(38,9))").as("rq"),
        expr("CAST(round(r * r, 9) AS DECIMAL(38,9))").as("rq2"))
      .groupBy($"event_type")
      .agg(max($"sc").as("sc"), max($"sn").as("sn"), max($"nd").as("nd"),
        sum($"rq").as("sr"), sum($"rq2").as("sr2"))
      .select($"event_type", $"nd".as("n_days"),
        expr("round(CAST(sc AS DOUBLE) / sn, 6)").as("ratio_cents"),
        expr("""round(sqrt((nd - 1.0) / nd *
               |  greatest(CAST(sr2 AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nd, 0.0)),
               |  6)""".stripMargin).as("jack_se"))
      .orderBy($"event_type")
  }

  def jackknifeRatioTransform(events: DataFrame): DataFrame =
    jackknifeRatioFromDaily(events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("cents"), count(lit(1)).as("n")))

  def jackknifeRatio(spark: SparkSession, dir: String): DataFrame =
    jackknifeRatioTransform(Tables.events(spark, dir))

  /** DuckDB oracle for [[jackknifeRatioTransform]] — identical LOO
    * ratios, identical 1e-9 quantization. */
  val jackknifeRatioOracleSql: String =
    """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
      |                      sum(CAST(round(value * 100) AS BIGINT)) AS cents,
      |                      count(*) AS n
      |               FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, sum(cents) AS sc, sum(n) AS sn, count(*) AS nd
      |        FROM daily GROUP BY 1),
      |loo AS (SELECT d.event_type, t.sc, t.sn, t.nd,
      |               CAST(t.sc - d.cents AS DOUBLE) / (t.sn - d.n) AS r
      |        FROM daily d JOIN tot t ON t.event_type = d.event_type
      |        WHERE t.sn - d.n > 0 AND t.nd > 1),
      |q AS (SELECT event_type, sc, sn, nd,
      |             CAST(round(r, 9) AS DECIMAL(38,9)) AS rq,
      |             CAST(round(r * r, 9) AS DECIMAL(38,9)) AS rq2
      |      FROM loo),
      |a AS (SELECT event_type, max(sc) AS sc, max(sn) AS sn, max(nd) AS nd,
      |             sum(rq) AS sr, sum(rq2) AS sr2
      |      FROM q GROUP BY 1)
      |SELECT event_type, CAST(nd AS BIGINT) AS n_days,
      |       round(CAST(sc AS DOUBLE) / sn, 6) AS ratio_cents,
      |       round(sqrt((nd - 1.0) / nd *
      |             greatest(CAST(sr2 AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nd, 0.0)),
      |             6) AS jack_se
      |FROM a ORDER BY 1""".stripMargin

  /** Hill tail-index estimator (Hill 1975) over per-user revenue —
    * the PARAMETRIC heavy-tail readout next to
    * [[Behavior.paretoUsersTransform]]'s empirical concentration
    * curve and [[Graph.degreePowerlawFitTransform]]'s rank
    * regression: for the top-k order statistics x₍₁₎ ≥ … ≥ x₍ₖ₎,
    * {{{ hill = (1/(k−1)) · Σᵢ (ln x₍ᵢ₎ − ln x₍ₖ₎),  α̂ = 1/hill }}}
    * α̂ ≤ 2 means infinite variance — the "one whale user is half of
    * revenue" regime where every mean-based KPI needs the robust
    * twins. Tie-robust: rows at the boundary value contribute 0 to
    * the sum, so the estimate depends only on the top-k VALUE
    * multiset.
    *
    * Exactness discipline: each ln is quantized to the 1e-6 grid
    * BEFORE summation (the `zipf_slope` pattern), so the sufficient
    * statistic is an order-independent integer sum; floats appear
    * only in the final two divisions (4dp).
    *
    * Scale shape: the per-user rollup is map-side combinable; the
    * top-k cut is a bounded TakeOrdered (per-partition heaps, never a
    * global sort); the estimator is a one-row aggregate over k rows.
    */
  private[graft] def hillFromUsers(users: DataFrame, k: Int = 100): DataFrame = {
    val spark = users.sparkSession
    import spark.implicits._
    users.filter($"cents" > 0L)
      .orderBy($"cents".desc, $"user_id")
      .limit(k)
      .agg(count(lit(1)).as("n_tail"),
        min($"cents").as("xk_cents"),
        sum(expr("CAST(round(ln(cents) * 1000000) AS BIGINT)")).as("sq"))
      .withColumn("hill_raw",
        expr("""(CAST(sq AS DOUBLE) - n_tail * CAST(round(ln(xk_cents) * 1000000) AS BIGINT))
               |/ (n_tail - 1) / 1e6""".stripMargin))
      .select($"n_tail", $"xk_cents",
        round($"hill_raw", 4).as("hill"),
        round(expr("1.0 / nullif(hill_raw, 0.0)"), 4).as("alpha"))
  }

  def hillTailIndex(spark: SparkSession, dir: String): DataFrame =
    hillFromUsers(Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(expr("sum(CAST(round(value * 100) AS BIGINT))").as("cents")))

  /** DuckDB oracle for [[hillTailIndex]] — identical top-k cut,
    * identical 1e-6 log grid and final-division parenthesization. */
  val hillOracleSql: String =
    """WITH u AS (SELECT user_id,
      |                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |           FROM events GROUP BY 1),
      |t AS (SELECT cents, user_id FROM u WHERE cents > 0
      |      ORDER BY cents DESC, user_id LIMIT 100),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n_tail,
      |             CAST(min(cents) AS BIGINT) AS xk_cents,
      |             CAST(sum(CAST(round(ln(cents) * 1000000) AS BIGINT)) AS BIGINT) AS sq
      |      FROM t),
      |h AS (SELECT *, (CAST(sq AS DOUBLE) - n_tail * CAST(round(ln(xk_cents) * 1000000) AS BIGINT))
      |               / (n_tail - 1) / 1e6 AS hill_raw FROM a)
      |SELECT n_tail, xk_cents, round(hill_raw, 4) AS hill,
      |       round(1.0 / nullif(hill_raw, 0.0), 4) AS alpha
      |FROM h""".stripMargin
}
