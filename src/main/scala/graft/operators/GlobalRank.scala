package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global order statistics — the round-10 replacement for
  * the last single-task sorts (round-9 verdict task 1): a global
  * `row_number` / running-sum over a DATA-SCALE table (per-user, per-
  * doc aggregates — |users| or |docs| rows) must not funnel through
  * one `WindowExec` task, which is exactly what
  * `Window.orderBy(...)` with an empty partition spec plans.
  *
  * The pattern here is the range-partitioned rank with per-slice
  * offsets (the sibling of the `percentileStats` slice-locate pass,
  * `Olap.scala` §19, generalized from "locate K ranks" to "rank every
  * row"):
  *
  *  1. `repartitionByRange(P, sortKey…)` splits the rows into P
  *     ORDERED slices (Spark's own `RangePartitioner` sampling; the
  *     sort key must be a total order — callers include the entity id
  *     tie-break, so slice boundaries cannot split a tie run).
  *  2. Each slice ranks/cumsums LOCALLY — a `Window.partitionBy(pid)`
  *     that runs P-way parallel with |rows|/P per task.
  *  3. The per-slice (count, sum…) table is P rows — PLANNING
  *     metadata, the same scale as the RangePartitioner's sampled
  *     bounds — and its exclusive prefix sums are the slice offsets;
  *     `local rank + offset = exact global rank`, `local cumsum +
  *     offset = exact global cumsum`.
  *
  * The offsets stay in the plan (a P-row aggregate keyed by the
  * slice id, prefix-summed by a window over those P rows, broadcast
  * back) rather than being collected. The ranged input is PERSISTED
  * (MEMORY_AND_DISK, [[graft.GraftCaches]]-registered): the offsets
  * subtree and the ranked subtree canonicalize differently through
  * the nondeterministic `spark_partition_id` projection, so
  * `ReuseExchange`/AQE stage reuse does NOT dedup them (verified at
  * runtime round 10) — without the persist each call recomputes its
  * whole upstream (a fact-table aggregate) once per subtree. The
  * broadcast-side job materializes the cache; the probe side reads
  * it. At 100 TB this stages the |users|/|docs|-row table once (the
  * same cost class as Dedup.sigTable's persisted signature stage).
  *
  * Scale: at 100 TB the per-user table is ~10⁹ rows; with P = 32
  * (local harness) … P = shuffle-partition count (cluster), each task
  * sorts |rows|/P — the plan-audit gate (`PlanAuditSpec`) now REJECTS
  * any unpartitioned window whose aggregate below is keyed on a
  * data-scale entity, so this helper is the only sanctioned way to
  * globally order such tables.
  */
object GlobalRank {

  // Ranged-input persist memo, keyed SEMANTICALLY (canonicalized
  // analyzed plan of the input + the call's parameters) so repeated
  // calls over the same input share ONE persisted table instead of
  // pinning a fresh MEMORY_AND_DISK copy per call (round-10 advice:
  // instance-keyed lookups never hit, so rfmFromUsers pinned three
  // user-scale tables per invocation). Lifecycle contract: entries
  // are released only by GraftCaches.clearAll() — the bench calls it
  // between queries, Verify between dumps, specs in afterAll; any
  // OTHER caller of withGlobalOrder must run under the same scope.
  private val partedCache =
    graft.GraftCaches.memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), DataFrame](_.unpersist())

  /** Appends to `df`:
    *  - `grk`      — 1-based global row_number under `sortCols`
    *  - `n_total`  — total row count
    *  - for each name `s` in `sums`: `cum_s` (inclusive global
    *    running sum of column `s` under `sortCols`) and `total_s`
    *    (its grand total).
    *
    * `sortCols` MUST be a total order over the rows (include the
    * entity-id tie-break) — equal keys falling on a slice boundary
    * would otherwise make the global order partition-dependent.
    */
  def withGlobalOrder(df: DataFrame, sortCols: Seq[Column],
                      sums: Seq[String] = Nil, numParts: Int = 32): DataFrame = {
    val parted0 = df.repartitionByRange(numParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
    // Key on the INPUT's canonicalized plan OBJECT (case-class
    // equality — includes a LocalRelation's rows, which its toString
    // elides; keying on the string collided every same-schema planted
    // spec input) + the ordering parameters. parted0's own plan is
    // not usable as a key: its nondeterministic spark_partition_id
    // projection canonicalizes uniquely per call.
    val key = (df.queryExecution.analyzed.canonicalized,
      sortCols.mkString(",") + "|" + sums.mkString(",") + "|" + numParts)
    val parted = partedCache.getOrElseUpdate(key)(
      parted0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // P-row slice-stat table: planning metadata, like the
    // RangePartitioner's sampled bounds.
    val statAggs = count(lit(1)).cast("long").as("__cnt") +:
      sums.map(s => sum(col(s)).as(s"__s_$s"))
    val perSlice = parted.groupBy(col("__pid")).agg(statAggs.head, statAggs.tail: _*)

    // Exclusive prefix over the P slices = each slice's offset. The
    // windows here run over ≤ P rows keyed by the slice id — the
    // planning-scale shape the plan audit's data-scale-key rule
    // explicitly permits.
    val wBefore = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(lit(0))
    val offsets = sums.foldLeft(
      perSlice
        .withColumn("__cnt_before", coalesce(sum(col("__cnt")).over(wBefore), lit(0L)))
        .withColumn("__n_total", sum(col("__cnt")).over(wAll))
    ) { (acc, s) =>
      acc
        .withColumn(s"__before_$s", coalesce(sum(col(s"__s_$s")).over(wBefore), lit(0L)))
        .withColumn(s"__total_$s", sum(col(s"__s_$s")).over(wAll))
    }.drop("__cnt" +: sums.map(s => s"__s_$s"): _*)

    // Local rank within each ordered slice + broadcast offsets.
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val wLocalCum = wLocal.rowsBetween(Window.unboundedPreceding, 0)
    val ranked = sums.foldLeft(
      parted.join(broadcast(offsets), Seq("__pid"))
        .withColumn("grk", col("__cnt_before") + row_number().over(wLocal).cast("long"))
        .withColumn("n_total", col("__n_total"))
    ) { (acc, s) =>
      acc
        .withColumn(s"cum_$s", col(s"__before_$s") + sum(col(s)).over(wLocalCum))
        .withColumn(s"total_$s", col(s"__total_$s"))
    }
    ranked.drop("__pid" +: "__cnt_before" +: "__n_total" +:
      sums.flatMap(s => Seq(s"__before_$s", s"__total_$s")): _*)
  }
}
