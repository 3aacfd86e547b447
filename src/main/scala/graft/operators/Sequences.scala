package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      .agg((aggregate(sortedCodes, lit(0L), seqDfaStep) / 4).cast("long").as("n_sequences"))
      .groupBy(col("n_sequences")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_sequences"))

  /** The sequence-count DFA step (`acc = count*4 + stage`) as a
    * Column lambda — one definition shared by the batch fold, the
    * incremental [[graft.streaming.SequenceCountStream]] state merge,
    * and (textually) the recursive-CTE oracle. */
  private[graft] def seqDfaStep(acc: Column, x: Column): Column =
    when(acc % 4 === 0 && x === 1, acc + 1)
      .when(acc % 4 === 1 && x === 2, acc + 1)
      .when(acc % 4 === 2 && x === 3, acc + 2)
      .otherwise(acc)

  /** Per-user codes of the batch, time-sorted (`(ts, event_id)`
    * struct sort — collect_list order is not a contract). */
  private def sortedCodes: Column =
    transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("code")))),
      s => s.getField("code"))

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
      .agg((aggregate(sortedCodes, lit(0L), strictDfaStep) / 8).cast("long").as("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))

  /** The strict-order DFA step (`acc = best*8 + current`). */
  private[graft] def strictDfaStep(acc: Column, x: Column): Column = {
    val cur = when(acc % 8 < 3 && x === acc % 8 + 1, acc % 8 + 1)
      .when(x === 1, lit(1L)).otherwise(lit(0L))
    greatest((acc / 8).cast("long"), cur) * 8 + cur
  }

  def funnelStrictOrder(spark: SparkSession, dir: String): DataFrame =
    funnelStrictTransform(Tables.events(spark, dir))

  /** Any-order funnel — the unordered complement of the strict/
    * ordered members: a user "completes" once all three stage types
    * have EVER occurred, regardless of order, and the report groups
    * completers by which stage arrived first:
    * `(first_type, n_users, avg_span_sec)` where span = first-to-last
    * first-occurrence. Pure conditional-min aggregation — constant
    * state per user, no ordered history, no collect, one user_id
    * shuffle (the [[Engagement]] `funnel_conversion` discipline);
    * span sums are exact BIGINT seconds so only the final avg
    * divides. */
  def funnelAnyOrderTransform(events: DataFrame): DataFrame = {
    def firstOf(t: String) = min(when(col("event_type") === t, col("ts")))
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(firstOf("view").as("fv"), firstOf("click").as("fc"),
           firstOf("purchase").as("fp"),
           min(when(col("event_type").isin("view", "click", "purchase"),
             struct(col("ts"), col("event_id"), col("event_type")))).as("first"))
      .filter(col("fv").isNotNull && col("fc").isNotNull && col("fp").isNotNull)
      .select(col("first.event_type").as("first_type"),
        ((unix_micros(greatest(col("fv"), col("fc"), col("fp")))
          - unix_micros(least(col("fv"), col("fc"), col("fp")))) / lit(1000000L))
          .cast("long").as("span_sec"))
      .groupBy(col("first_type"))
      .agg(count(lit(1)).as("n_users"),
           round(sum(col("span_sec")).cast("double") / count(lit(1)), 2).as("avg_span_sec"))
      .orderBy(col("first_type"))
  }

  def funnelAnyOrder(spark: SparkSession, dir: String): DataFrame =
    funnelAnyOrderTransform(Tables.events(spark, dir))

  /** Oracle for [[funnelAnyOrderTransform]]. */
  val funnelAnyOrderOracleSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
      |u AS (SELECT user_id,
      |             min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
      |             min(CASE WHEN event_type = 'click' THEN ts END) AS fc,
      |             min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
      |             min(CASE WHEN event_type IN ('view','click','purchase')
      |                      THEN {'ts': ts, 'eid': event_id, 'event_type': event_type} END) AS first
      |      FROM e GROUP BY user_id),
      |c AS (SELECT first.event_type AS first_type,
      |             CAST((epoch_us(greatest(fv, fc, fp)) - epoch_us(least(fv, fc, fp))) // 1000000 AS BIGINT) AS span_sec
      |      FROM u WHERE fv IS NOT NULL AND fc IS NOT NULL AND fp IS NOT NULL)
      |SELECT first_type, CAST(count(*) AS BIGINT) AS n_users,
      |       round(CAST(sum(span_sec) AS DOUBLE) / count(*), 2) AS avg_span_sec
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Stage coding shared by both DFAs (and spelled identically in
    * the oracles): view=1, click=2, purchase=3, anything else 0. */
  private[graft] def codedEvents(events: DataFrame): DataFrame =
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
