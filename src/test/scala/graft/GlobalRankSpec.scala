package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.GlobalRank.withGlobalOrder]] must agree with
  * the single-partition window it replaces, bit for bit — on ties,
  * on skew, on sums — while planning NO unpartitioned WindowExec
  * over the data. */
class GlobalRankSpec extends AnyFunSuite {
  import TestSession._

  test("withGlobalOrder equals the single-task global window (rank, cumsum, totals)") {
    import spark.implicits._
    // skewed, tied sort key: 1000 rows, v = id % 7 (heavy tie runs
    // crossing any slice boundary), id the total-order tie-break
    val df = (1L to 1000L).map(i => (i, i % 7, i * 3 % 101)).toDF("id", "v", "x")

    val got = operators.GlobalRank.withGlobalOrder(
        df, Seq($"v".desc, $"id"), Seq("x"), numParts = 8)
      .select($"id", $"grk", $"n_total", $"cum_x", $"total_x")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val w = Window.orderBy($"v".desc, $"id")
    val whole = Window.partitionBy(lit(0))
    val want = df
      .withColumn("grk", row_number().over(w).cast("long"))
      .withColumn("n_total", count(lit(1)).over(whole))
      .withColumn("cum_x", sum($"x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total_x", sum($"x").over(whole))
      .select($"id", $"grk", $"n_total", $"cum_x", $"total_x")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    assert(got.toSeq == want.toSeq)
  }

  test("withGlobalOrder plans every data WindowExec partitioned (only the P-row offset windows are global)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val df = (1L to 100L).map(i => (i, i % 5)).toDF("id", "v")
    val plan = operators.GlobalRank.withGlobalOrder(df, Seq($"v", $"id"), Seq("v"))
      .queryExecution.sparkPlan
    val unpart = plan.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    // the only unpartitioned windows are the slice-offset prefix sums,
    // whose input is the P-row per-slice aggregate keyed by __pid
    unpart.foreach { w =>
      val agg = w.child.collectWithSubqueries { case a: BaseAggregateExec => a }.head
      assert(agg.groupingExpressions.map(_.name) == Seq("__pid"),
        s"offset window must sit on the per-slice aggregate:\n${w.treeString}")
    }
    // and the data-scale rank window IS partitioned (by __pid)
    val part = plan.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.nonEmpty => w
    }
    assert(part.nonEmpty)
  }
}
