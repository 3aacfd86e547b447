package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ordered-sequence pattern aggregates over the engagement stream —
  * the ClickHouse `sequenceCount` / `windowFunnel(strict_order)`
  * analogs a reference-pipeline analyst runs against the events sink
  * (`src/process.py:43-76`). [[Engagement]]'s funnel operators answer
  * "did the user EVER progress view→click→purchase" with chained
  * conditional-min aggregations; these two answer the questions that
  * genuinely depend on the full ordered history — "how many
  * non-overlapping complete sequences" and "how deep does the funnel
  * go when any interleaved event breaks the attempt" — which no
  * fixed-depth window/agg composition expresses.
  *
  * Shape: per-user codes (1 byte of information per event) are
  * sorted and folded through an integer-packed DFA in ONE
  * `aggregate()` higher-order call — a per-row array op after one
  * user_id shuffle, no UDF, no driver loop. The packed state (count
  * and stage in one BIGINT) is exactly mirrorable in DuckDB's
  * `reduce()` (seeded via `list_prepend`), so the oracle runs the
  * very same fold. Per-user state while folding is the code array
  * (~8 B × history length) — the same bounded-history assumption as
  * [[Behavior.topPathsTransform]]'s prefix collect; the fold output
  * is one BIGINT per user and the final histogram is |distinct
  * outcome| rows.
  */
object Sequences {

  /** Non-overlapping occurrences of view→click→purchase per user
    * (arbitrary events may interleave), histogrammed:
    * `(n_sequences, n_users)`. DFA packing: `acc = count*4 + stage`,
    * stage ∈ {0,1,2}; completing a sequence adds `+2` (stage 2 → 0,
    * count+1). Unrecognized/irrelevant codes hit `ELSE acc`.
    */
  def sequenceCountTransform(events: DataFrame): DataFrame =
    codedEvents(events)
      .groupBy(col("user_id"))
      .agg(expr(
        """aggregate(
          |  transform(array_sort(collect_list(struct(ts, event_id, code))), s -> s.code),
          |  0L,
          |  (acc, x) -> CASE WHEN acc % 4 = 0 AND x = 1 THEN acc + 1
          |                   WHEN acc % 4 = 1 AND x = 2 THEN acc + 1
          |                   WHEN acc % 4 = 2 AND x = 3 THEN acc + 2
          |                   ELSE acc END) div 4""".stripMargin).as("n_sequences"))
      .groupBy(col("n_sequences")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_sequences"))

  def sequenceCount(spark: SparkSession, dir: String): DataFrame =
    sequenceCountTransform(Tables.events(spark, dir))

  /** Strict-order funnel depth per user, histogrammed:
    * `(depth, n_users)`, depth ∈ {0..3}. Any event that is not the
    * next expected stage kills the current attempt (a `view` always
    * restarts one). DFA packing: `acc = best*8 + current`.
    */
  def funnelStrictTransform(events: DataFrame): DataFrame =
    codedEvents(events)
      .groupBy(col("user_id"))
      .agg(expr(
        """aggregate(
          |  transform(array_sort(collect_list(struct(ts, event_id, code))), s -> s.code),
          |  0L,
          |  (acc, x) -> greatest(acc div 8,
          |                CASE WHEN acc % 8 < 3 AND x = acc % 8 + 1 THEN acc % 8 + 1
          |                     WHEN x = 1 THEN 1 ELSE 0 END) * 8
          |              + CASE WHEN acc % 8 < 3 AND x = acc % 8 + 1 THEN acc % 8 + 1
          |                     WHEN x = 1 THEN 1 ELSE 0 END) div 8""".stripMargin).as("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))

  def funnelStrictOrder(spark: SparkSession, dir: String): DataFrame =
    funnelStrictTransform(Tables.events(spark, dir))

  /** Stage coding shared by both DFAs (and spelled identically in
    * the oracles): view=1, click=2, purchase=3, anything else 0. */
  private def codedEvents(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("ts"), col("event_id"),
      expr("CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END AS BIGINT)").as("code"))

  /** The oracles run the SAME fold as a recursive-CTE recurrence
    * (one step per event rank, every user advancing in lockstep)
    * rather than DuckDB's `reduce()`: DuckDB 1.0.0's vectorized
    * lambda fold returns a WRONG accumulator for some rows once many
    * variable-length lists are batched (verified: `list(code ORDER
    * BY ts, event_id)` is correctly ordered and a by-hand fold of
    * that very list disagrees with `reduce` over it — filter to the
    * one user and the same query flips to the correct answer). The
    * CTE fold is engine-portable and was cross-checked element-wise
    * against an out-of-band fold for every user. */
  private def foldOracle(step: String, shift: Int, outCol: String): String =
    s"""WITH RECURSIVE e AS (
       |  SELECT user_id,
       |         CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
       |              WHEN 'purchase' THEN 3 ELSE 0 END AS BIGINT) AS code,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
       |  FROM events),
       |n AS (SELECT user_id, max(rn) AS m FROM e GROUP BY user_id),
       |f (user_id, rn, acc) AS (
       |  SELECT user_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM n
       |  UNION ALL
       |  SELECT f.user_id, e.rn, $step
       |  FROM f JOIN e ON e.user_id = f.user_id AND e.rn = f.rn + 1),
       |u AS (SELECT f.user_id, f.acc // $shift AS $outCol
       |      FROM f JOIN n ON f.user_id = n.user_id AND f.rn = n.m)
       |SELECT $outCol, CAST(count(*) AS BIGINT) AS n_users
       |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  val sequenceCountOracleSql: String = foldOracle(
    """CASE WHEN f.acc % 4 = 0 AND e.code = 1 THEN f.acc + 1
      |       WHEN f.acc % 4 = 1 AND e.code = 2 THEN f.acc + 1
      |       WHEN f.acc % 4 = 2 AND e.code = 3 THEN f.acc + 2
      |       ELSE f.acc END""".stripMargin, 4, "n_sequences")

  val funnelStrictOracleSql: String = foldOracle(
    """greatest(f.acc // 8,
      |           CASE WHEN f.acc % 8 < 3 AND e.code = f.acc % 8 + 1 THEN f.acc % 8 + 1
      |                WHEN e.code = 1 THEN 1 ELSE 0 END) * 8
      |       + CASE WHEN f.acc % 8 < 3 AND e.code = f.acc % 8 + 1 THEN f.acc % 8 + 1
      |              WHEN e.code = 1 THEN 1 ELSE 0 END""".stripMargin, 8, "depth")
}
