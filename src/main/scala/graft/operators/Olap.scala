package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftCaches
import graft.sources.Tables

/** The analytic (ClickHouse-sink) surface: what a user of the
  * reference pipeline runs against the columnar store downstream.
  *
  * All queries are declarative DataFrame plans — filters/projections
  * push into the parquet scan, dims broadcast, facts shuffle only on
  * their aggregation/join keys, partial aggregation is automatic.
  */
object Olap {

  /** Multi-aggregate scan (TPC-H Q1 shape): predicate pushed to
    * parquet, hash aggregate with map-side combine, tiny result. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count("*").as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** 3-way join + agg + top-N (TPC-H Q3 shape). Customer dim is
    * broadcast; orders⋈lineitem shuffles on the order key; the top-N
    * is TakeOrderedAndProject (no global sort). */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(l, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"revenue", $"o_orderdate", $"o_orderpriority")
  }

  /** 5-table star join (TPC-H Q5 shape): region→nation→customer all
    * broadcast, single shuffle join of the two facts. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = Tables.region(spark, dir).filter($"r_name" === "EUROPE")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val dim = c.join(broadcast(n.join(broadcast(r), $"n_regionkey" === $"r_regionkey")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    o.join(broadcast(dim), $"o_custkey" === $"c_custkey")
      .join(l, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Analytic window functions: per-customer order sequence with
    * running spend. One shuffle on the partition key, in-partition
    * sort — the canonical windowed-analytics shape. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_spend",
        round(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .orderBy($"o_custkey", $"rn")
  }

  /** Exact per-day distinct users. Exact distinct is the
    * shuffle-heavy variant (expand + two-phase agg); the sketch
    * version below is the 100 TB default. */
  def distinctDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(countDistinct($"user_id").as("n_users"), count("*").as("n_events"))
      .orderBy($"day")
  }

  /** HyperLogLog++ sketch distinct — mergeable, constant memory,
    * no second shuffle. rows-only oracle (approximate by design).
    * Default rsd (0.05): tightening to 0.01 grows the register file
    * ~25× and made the sketch path bench slower than exact distinct —
    * the opposite of the trade it exists to make. */
  def approxDistinctDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(approx_count_distinct($"user_id").as("approx_users"))
      .orderBy($"day")
  }

  /** ROLLUP multi-level aggregate (grand total + per-flag + per
    * flag/status), one pass via Expand. */
  def rollupSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_extendedprice"), 2).as("sum_price"), count("*").as("n"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** CUBE multi-level aggregation — all four grouping combinations
    * (flag×status, per-flag, per-status, grand total) in one pass via
    * Expand, completing the grouping-family next to [[rollupSales]].
    * `grouping_id` disambiguates a real NULL key from a rolled-up
    * level (and gives the oracle a deterministic sort). */
  def cubeSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_extendedprice"), 2).as("sum_price"), count("*").as("n"),
        grouping_id().as("gid"))
      .select($"l_returnflag", $"l_linestatus", $"gid", $"sum_price", $"n")
      .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** GROUPING SETS with an EXPLICIT set list — the general form
    * [[rollupSales]]/[[cubeSales]] are shorthands of: exactly the
    * requested levels ((flag, status), (flag), ()) and nothing else
    * (no per-status level — the one CUBE would add). Same single
    * Expand pass + one hash aggregate with map-side partials; row
    * fan-out is |sets|, not 2^keys. */
  def groupingSetsSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"), Seq.empty),
        $"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_extendedprice"), 2).as("sum_price"), count("*").as("n"),
        grouping_id().as("gid"))
      .select($"l_returnflag", $"l_linestatus", $"gid", $"sum_price", $"n")
      .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Left-semi + left-anti joins (EXISTS / NOT EXISTS): customers
    * with at least one order but none above the price cap. */
  def semiAntiCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_custkey", $"o_totalprice")
    val big = o.filter($"o_totalprice" > 450000).select($"o_custkey")
    Tables.customer(spark, dir)
      .join(o.select($"o_custkey"), $"c_custkey" === $"o_custkey", "left_semi")
      .join(big, $"c_custkey" === big("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Approximate percentiles per group via `approx_percentile` —
    * Spark's mergeable Greenwald-Khanna sketch. One map-side-partial
    * aggregation pass, constant memory per group, no sort anywhere:
    * the 100 TB default for quantiles, exactly as
    * [[approxDistinctDaily]] is for count-distinct (rows-only oracle,
    * approximate by design; [[percentileStats]] is the exact
    * variant). */
  def percentileStatsApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)), 2).as("median_price"),
        round(percentile_approx($"l_extendedprice", lit(0.95), lit(10000)), 2).as("p95_price"),
        round(min($"l_extendedprice"), 2).as("min_price"),
        round(max($"l_extendedprice"), 2).as("max_price"))
      .orderBy($"l_returnflag")
  }

  /** EXACT interpolated percentiles per group (quantile_cont:
    * v = v_lo + (v_hi - v_lo)·frac at pos = (n-1)·q), computed
    * scale-safely by range-partitioned rank over LOG-SPACED value
    * slices:
    *
    *   1. every row maps to slice floor(ln(v)·`logScale`) — monotone
    *      in v and needing NO min/max pre-pass (this is what keeps the
    *      whole query one job: an earlier cut used uniform min/max
    *      slices, and the extra aggregation pass + eager
    *      materializations tripled the stage count for zero data
    *      locality benefit);
    *   2. ONE aggregation pass counts each (group, slice) and carries
    *      per-slice min/max; group totals, the target ranks
    *      pos = (cnt-1)·q, and cumulative rank offsets all derive
    *      from that TINY (groups × slices) table, locating the one
    *      slice that contains each target rank;
    *   3. a second scan sorts ONLY the located slices (row_number per
    *      (group, slice), a few thousand rows each), and
    *      offset + local rank = exact global rank.
    *
    * Nothing ever sorts a whole group: the round-2 formulation's
    * `row_number() OVER (PARTITION BY l_returnflag)` put one task per
    * group — parallelism 3 at ANY cluster size, 33 TB through a
    * single sort at the target scale. Here the counting pass is an
    * ordinary map-side-partial aggregate and the final sort touches
    * ~|targets| · n/slices rows across (group × slice) tasks.
    * Non-positive values collapse into one underflow slice (ordered
    * below all log slices — correctness never depends on slice
    * granularity, only the located-slice sort size does; pathological
    * single-value groups degrade to sorting that one slice, never to
    * wrong results).
    */
  def percentileStats(spark: SparkSession, dir: String,
                      quantiles: Seq[(String, Double)] = Seq("median_price" -> 0.5, "p95_price" -> 0.95),
                      logScale: Int = 64): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_returnflag", $"l_extendedprice")
    val bkted = li.withColumn("bkt",
      when($"l_extendedprice" > 0, floor(log($"l_extendedprice") * logScale))
        .otherwise(lit(Int.MinValue.toLong)).cast("long"))

    // ONE full-table aggregation pass: slice counts + slice min/max
    val sliceCounts = bkted.groupBy($"l_returnflag", $"bkt")
      .agg(count("*").as("bc"), min($"l_extendedprice").as("smin"), max($"l_extendedprice").as("smax"))

    // The (groups × occupied-slices) count table is PLANNING
    // METADATA, not data — a few hundred rows here, groups × ≤ a few
    // hundred occupied slices in general. It comes to the driver the
    // same way Spark's own RangePartitioner collects its sampled
    // bounds: locating which slice holds each target rank is a
    // driver-side decision (plain cumulative sums), and pushing it
    // through 5 more tiny shuffle/window stages just multiplies
    // per-stage latency. (The driver table grows with group count —
    // percentile REPORTS are few-group by nature; a billion-group
    // edge case would move this arithmetic back into the plan.)
    val slices = sliceCounts.collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)) // (flag, bkt, count, smin, smax)
    }
    // per group: totals + cumulative offsets in slice order
    case class Loc(flag: String, qname: String, which: String, frac: Double,
                   rk: Long, bkt: Long, cumBefore: Long)
    val located: Seq[Loc] = slices.groupBy(_._1).toSeq.flatMap { case (flag, ss) =>
      val ordered = ss.sortBy(_._2)
      val cnt = ordered.map(_._3).sum
      val cum = ordered.scanLeft(0L)(_ + _._3) // cum(i) = rows before slice i
      quantiles.flatMap { case (name, qv) =>
        val pos = (cnt - 1) * qv
        val frac = pos - math.floor(pos)
        Seq(("lo", math.floor(pos).toLong + 1), ("hi", math.ceil(pos).toLong + 1))
          .map { case (which, rk) =>
            val i = ordered.indices.find(i => rk > cum(i) && rk <= cum(i) + ordered(i)._3).get
            Loc(flag, name, which, frac, rk, ordered(i)._2, cum(i))
          }
      }
    }
    val groupStats = slices.groupBy(_._1).map { case (flag, ss) =>
      (flag, ss.map(_._4).min, ss.map(_._5).max)
    }.toSeq

    // second scan: sort ONLY the located slices; offset + local rank
    // = exact global rank
    val needed = located.map(l => (l.flag, l.bkt, l.cumBefore)).distinct
      .toDF("l_returnflag", "bkt", "cum_before")
    val wSlice = Window.partitionBy($"l_returnflag", $"bkt").orderBy($"l_extendedprice")
    val ranked = bkted.join(broadcast(needed), Seq("l_returnflag", "bkt"))
      .withColumn("grk", $"cum_before" + row_number().over(wSlice))
    val locSel = located.map(l => (l.flag, l.qname, l.which, l.frac, l.rk))
      .toDF("t_flag", "qname", "which", "frac", "rk")
    val hits = ranked.join(broadcast(locSel),
        $"l_returnflag" === $"t_flag" && $"grk" === $"rk")
      .select($"l_returnflag", $"qname", $"which", $"l_extendedprice")

    // assemble the (groups × 5)-cell report from the ≤ groups ×
    // quantiles × 2 hit values — driver arithmetic again (the
    // interpolation v_lo + (v_hi - v_lo)·frac over a dozen doubles);
    // pushing it through two more groupBy/join/sort stages only adds
    // latency. The result is rebuilt as a DataFrame for the driver
    // contract.
    val hv = hits.collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getDouble(3))).toMap
    val fracs = located.map(l => ((l.flag, l.qname), l.frac)).toMap
    def round2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    // schema follows the `quantiles` parameter — one column per
    // requested quantile, so callers aren't pinned to exactly two
    val rows = groupStats.sortBy(_._1).map { case (flag, vmin, vmax) =>
      val q = quantiles.map { case (name, _) =>
        val lo = hv((flag, name, "lo")); val hi = hv((flag, name, "hi"))
        round2(lo + (hi - lo) * fracs((flag, name)))
      }
      org.apache.spark.sql.Row.fromSeq(flag +: q :+ round2(vmin) :+ round2(vmax))
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("l_returnflag", org.apache.spark.sql.types.StringType) +:
        quantiles.map { case (name, _) =>
          org.apache.spark.sql.types.StructField(name, org.apache.spark.sql.types.DoubleType) } :+
        org.apache.spark.sql.types.StructField("min_price", org.apache.spark.sql.types.DoubleType) :+
        org.apache.spark.sql.types.StructField("max_price", org.apache.spark.sql.types.DoubleType))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Range (interval) join without an equi-key, done the scale-safe
    * way: for each event, aggregate every OTHER event (any user)
    * within ±5 minutes — co-occurrence density, the interval-join
    * shape behind burst detection and attribution windows.
    *
    * A naive plan is a broadcast-nested-loop over every event pair —
    * quadratic, the classic range-join trap. Bucketization
    * manufactures the missing equi-key: both sides are keyed by the
    * 5-minute epoch bucket (bucket width = window half-width), the
    * probe side fans out to the 3 buckets its window can touch, the
    * join is a plain hash equi-join on the bucket, and the exact
    * interval predicate filters inside. Each qualifying pair meets in
    * exactly one bucket (the build row's own), so no dedup is needed.
    * Shuffle volume is 3·|probe| + |build|, never |probe|·|build| —
    * the expansion-join shape, expressed declaratively.
    */
  def rangeJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucketSecs = 300L
    val ev = Tables.events(spark, dir)
    val probe = ev
      .select($"event_id", $"ts",
        (unix_timestamp($"ts") / bucketSecs).cast("long").as("b0"))
      .select($"event_id", $"ts", explode(sequence($"b0" - 1, $"b0" + 1)).as("bucket"))
    val build = ev
      .select($"event_id".as("f_id"), $"ts".as("f_ts"), $"value".as("f_value"),
        (unix_timestamp($"ts") / bucketSecs).cast("long").as("bucket"))
    probe.join(build,
        probe("bucket") === build("bucket")
          && $"f_id" =!= $"event_id"
          && $"f_ts" >= $"ts" - expr(s"INTERVAL $bucketSecs SECONDS")
          && $"f_ts" <= $"ts" + expr(s"INTERVAL $bucketSecs SECONDS"),
        "left")
      .groupBy($"event_id")
      .agg(count($"f_id").as("n_nearby"),
        round(coalesce(sum($"f_value"), lit(0.0)), 2).as("nearby_value"))
      .orderBy($"event_id")
  }

  /** Skew-aware salted join. events.user_id is zipfian-ish; on a
    * plain shuffle join the hot keys pin single reducers. Salting
    * replicates the dim S ways and splits each hot fact key across S
    * reducers — same result as the plain join (the oracle), but the
    * shuffle is balanced. (AQE skew-join handles this adaptively; the
    * salt is the explicit, planner-independent version.) */
  def skewSaltedJoin(spark: SparkSession, dir: String, salt: Int = 8): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .withColumn("salt", pmod($"event_id", lit(salt)).cast("int"))
    val c = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
      .withColumn("salt", explode(array((0 until salt).map(lit): _*)))
    e.join(c, e("user_id") === c("c_custkey") && e("salt") === c("salt"))
      .groupBy($"c_mktsegment")
      .agg(count("*").as("n"), round(sum($"value"), 2).as("total"))
      .orderBy($"c_mktsegment")
  }

  /** Heavy hitters: the k most frequent user_ids via Spark's
    * `approx_top_k` (DataSketches frequent-items) — the third
    * mergeable sketch next to HLL count-distinct (#16) and GK
    * quantiles (#19a), and the 100 TB path for "top talkers" over a
    * skewed key: constant-size sketch state per partition, one
    * tiny merge, no full groupBy-count over every key.
    *
    * With `maxTracked` ≥ the true distinct count the sketch's counts
    * are EXACT (the spec pins that per item); what stays approximate
    * is only which of the tied boundary items are reported, hence
    * rows-only. The `counts_exact` output column reports whether that
    * guarantee held (HLL distinct estimate ≤ maxTracked, computed in
    * the same pass) so large-scale callers can SEE when the sketch
    * has degraded to approximate counts. Output is re-sorted
    * (freq desc, user_id) so the result is deterministic for the
    * driver's hash. */
  def approxTopItems(spark: SparkSession, dir: String, k: Int = 10,
                     maxTracked: Int = 10000): DataFrame = {
    import spark.implicits._
    // Spark's approx_top_k is the DataSketches frequent-items
    // ItemsSketch; its PUBLISHED a-priori guarantee is
    // |reported − true| ≤ ε(maxMapSize) · n  with ε = 3.5/maxMapSize
    // and maxMapSize = ApproxTopK.calMaxMapSize(maxTracked) — both
    // public statics, so the bound below is the library's own number,
    // not a re-derivation. While distinct items fit the sketch map no
    // eviction ever happens and the counts are exact (bound 0).
    val eps = org.apache.datasketches.frequencies.ItemsSketch.getEpsilon(
      org.apache.spark.sql.catalyst.expressions.aggregate.ApproxTopK.calMaxMapSize(maxTracked))
    Tables.events(spark, dir)
      // an HLL distinct estimate and the total row count ride the SAME
      // aggregate pass (merged into the one scan) so the output can
      // SAY whether the exactness guarantee held AND how far off a
      // degraded count can be: approx_top_k counts are exact only
      // while distinct items ≤ maxTracked — beyond that the sketch
      // silently degrades to approximate counts under exact-looking
      // ranks, and `freq_err_bound` is the guaranteed ± cap.
      .agg(expr(s"approx_top_k(user_id, $k, $maxTracked)").as("top"),
        approx_count_distinct($"user_id").as("est_distinct"),
        count(lit(1)).as("total_n"))
      // rank without a WindowExec (the rankTopN pattern): sort the
      // ≤k-entry array in place, positions become ranks
      .select(sort_array(expr(
        "transform(top, t -> struct(-t.count AS neg, t.item AS user_id, t.count AS freq))"))
        .as("arr"), $"est_distinct", $"total_n")
      .select(posexplode($"arr").as(Seq("pos", "r")), $"est_distinct", $"total_n")
      .select(($"pos" + 1).cast("long").as("rank"),
        $"r.user_id".as("user_id"), $"r.freq".as("freq"),
        // HLL's ~2% relative error can't mask a real overflow for
        // long: warn-worthy overflows are 'distinct >> maxTracked'
        ($"est_distinct" <= lit(maxTracked.toLong)).as("counts_exact"),
        when($"est_distinct" <= lit(maxTracked.toLong), lit(0L))
          .otherwise(ceil(lit(eps) * $"total_n").cast("long")).as("freq_err_bound"))
      .orderBy($"rank")
  }

  /** PIVOT: per-month revenue re-shaped to one column per
    * (returnflag, linestatus) pair — the wide-table export every
    * BI/ClickHouse consumer asks for.
    *
    * The pivot values are declared EXPLICITLY: `pivot(col)` without
    * values runs a collect-distinct job first and inlines the result
    * into the plan — fine ad hoc, but at 100 TB that is an extra full
    * scan (and an unbounded-width plan if the column is dirty).
    * With declared values the whole pivot compiles to one pass of
    * conditional aggregates — same single-shuffle shape as any
    * groupBy, just wider rows out. */
  def pivotSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val statuses = Seq("AF", "AO", "NF", "NO", "RF", "RO")
    Tables.lineitem(spark, dir)
      .withColumn("mon", date_format($"l_shipdate", "yyyy-MM"))
      .withColumn("fs", concat($"l_returnflag", $"l_linestatus"))
      .withColumn("cents", round($"l_extendedprice" * (lit(1) - $"l_discount") * 100).cast("long"))
      .groupBy($"mon")
      .pivot("fs", statuses)
      .agg(coalesce(sum($"cents"), lit(0L)))
      .select($"mon" +: statuses.map(s =>
        (col(s).cast("double") / 100.0).as(s"rev_$s")): _*)
      .orderBy($"mon")
  }

  /** DuckDB oracle for [[pivotSales]]: the same pivot as explicit
    * conditional aggregation (what the Spark plan compiles to). */
  def pivotSalesOracleSql: String = {
    val cols = Seq("AF", "AO", "NF", "NO", "RF", "RO").map { s =>
      s"""coalesce(sum(CASE WHEN l_returnflag || l_linestatus = '$s' THEN cents END), 0) / 100.0 AS rev_$s"""
    }.mkString(",\n       |       ")
    s"""SELECT strftime(l_shipdate, '%Y-%m') AS mon,
       |       $cols
       |FROM (SELECT *, CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
       |      FROM lineitem)
       |GROUP BY mon ORDER BY mon""".stripMargin
  }

  /** Bloom-pruned fact×dim join — the runtime-filter technique for a
    * selective dim that is TOO BIG TO BROADCAST at scale: aggregate
    * the filtered dim's join keys into a bloom sketch (a few MB even
    * for 10⁸ keys, vs GBs for a broadcast hash table), broadcast the
    * sketch as a literal, and filter the fact MAP-SIDE before its
    * shuffle. With a selective dim predicate the fact-side shuffle
    * shrinks by roughly the dim's selectivity — at 100 TB that is the
    * difference between shuffling 100 TB and shuffling 15 TB. False
    * positives only cost wasted shuffle rows; the join itself removes
    * them, so the RESULT is exactly the plain join (the oracle is the
    * plain join SQL).
    *
    * Uses Spark's own BloomFilterAggregate / BloomFilterMightContain
    * expressions (what InjectRuntimeFilter plans when it fires) keyed
    * on xxhash64, surfaced as graft functions — here applied
    * EXPLICITLY so the pruning is guaranteed, not heuristic. The one
    * driver round-trip (collecting the sketch) replaces a broadcast
    * exchange of the whole dim. The sketch enters the plan as a
    * LITERAL, i.e. it rides in every task binary for the probe
    * stage — size `estKeys` to the filtered dim (default 100k ≈ 90 KB
    * at 3% fpp); Spark caps its own runtime blooms at 8 MB for the
    * same reason, and an oversized estimate only wastes bytes while
    * an undersized one only raises fpp (extra shuffled rows, never
    * wrong results). */
  def bloomFilteredJoin(spark: SparkSession, dir: String,
                        cutoff: String = "1997-01-01",
                        estKeys: Long = 100000L): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit(cutoff).cast("timestamp"))
      .select($"o_orderkey", $"o_orderstatus")
    val sketch = o.agg(
      call_function("graft_bloom_agg", xxhash64($"o_orderkey"), lit(estKeys)).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val l = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .filter(call_function("graft_bloom_might_contain", lit(sketch), xxhash64($"l_orderkey")))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"o_orderstatus")
  }

  /** DuckDB oracle for [[bloomFilteredJoin]] — the PLAIN join: bloom
    * pruning is result-invisible by construction. */
  def bloomFilteredJoinOracleSql(cutoff: String = "1997-01-01"): String =
    s"""SELECT o_orderstatus, count(*) AS n_items,
       |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE o_orderdate >= TIMESTAMP '$cutoff 00:00:00'
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Bucketed tables backing [[bucketedJoin]], written once per
    * (session, dir, buckets) — the prep stage that at warehouse scale
    * already happened at ingest (fact and dim land bucketed on the
    * join key). Registered in the session catalog; clearAll drops
    * them (the data dirs are tracked temp dirs). */
  private val bucketedTablesCache =
    GraftCaches.memo[(SparkSession, String, Int), (SparkSession, Seq[String])] {
      case (s, tables) => tables.foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    }

  /** The bare co-located join of [[bucketedJoin]], pre-aggregation —
    * the spec asserts this plans ZERO Exchange nodes. */
  def bucketedJoinBase(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    import spark.implicits._
    val suffix = s"${(dir.hashCode & Int.MaxValue)}_$buckets"
    val (evT, custT) = (s"graft_ev_bkt_$suffix", s"graft_cust_bkt_$suffix")
    bucketedTablesCache.getOrElseUpdate((spark, dir, buckets)) {
      val base = GraftCaches.trackTempDir("graft_bucketed_")
      Tables.events(spark, dir).select($"user_id", $"value")
        .write.mode("overwrite").bucketBy(buckets, "user_id").sortBy("user_id")
        .option("path", s"$base/events").saveAsTable(evT)
      Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment")
        .write.mode("overwrite").bucketBy(buckets, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer").saveAsTable(custT)
      (spark, Seq(evT, custT))
    }
    // MERGE hint pins SortMergeJoin (a broadcast join would also skip
    // the shuffle but demonstrates nothing about co-location); both
    // scans expose their bucket hash partitioning, which satisfies the
    // join's distribution requirement with NO Exchange on either side.
    spark.table(evT).hint("merge")
      .join(spark.table(custT), $"user_id" === $"c_custkey")
  }

  /** Bucketed co-located fact×dim join — the zero-shuffle join path
    * (SURVEY §4's co-location claim as a first-class query): both
    * sides pre-written `bucketBy` on the join key with equal bucket
    * counts, so the join consumes the ON-DISK hash partitioning and
    * plans no Exchange on either input. At 100 TB this is the
    * difference between re-shuffling the fact table for every join
    * and reading it join-ready — the bucketed layout is amortized
    * across every query that joins on the key. Result is the plain
    * join aggregate (bucketing is result-invisible; oracle = the
    * plain-join SQL, shared with skew_salted_join). */
  def bucketedJoin(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    import spark.implicits._
    bucketedJoinBase(spark, dir, buckets)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .orderBy($"c_mktsegment")
  }

  /** Z-order (Morton-curve) layout audit: scale two scan-predicate
    * columns (`l_partkey`, `l_suppkey`) to 16 bits by min/max
    * normalization, interleave them with the codegen'd
    * [[graft.functions.ZOrder2D]] expression, and range-partition the
    * curve into 16 equal Z-slices ("files"), reporting each slice's
    * row count and per-dimension min/max — exactly the parquet footer
    * stats a scan would prune on.
    *
    * Why it matters at 100 TB: a layout `repartitionByRange(zval)`
    * write makes EVERY slice bounded in BOTH dimensions (top-2 bits
    * of each fixed per slice → each dimension spans ≤ 1/4 of its
    * range), so point/range predicates on either column skip ~3/4 of
    * files; a single-column sort leaves the second column full-range
    * in every file. This entry computes the per-slice stats rather
    * than writing files — value-range bucketing on the Z-value, no
    * global sort, one narrow aggregate. All-integer arithmetic
    * (`div`), so the DuckDB oracle (unrolled bit-interleave) matches
    * exactly.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val li = Tables.lineitem(spark, dir).select($"l_partkey".as("x"), $"l_suppkey".as("y"))
    val r = li.agg(min($"x").as("xmin"), max($"x").as("xmax"),
                   min($"y").as("ymin"), max($"y").as("ymax"))
    li.crossJoin(broadcast(r))
      .withColumn("xs", when($"xmax" > $"xmin",
        expr("((x - xmin) * 65535) div (xmax - xmin)")).otherwise(lit(0L)))
      .withColumn("ys", when($"ymax" > $"ymin",
        expr("((y - ymin) * 65535) div (ymax - ymin)")).otherwise(lit(0L)))
      .withColumn("z", call_function("graft_zorder", $"xs", $"ys"))
      .withColumn("bucket", shiftright($"z", 28))
      .groupBy($"bucket")
      .agg(count("*").as("n"),
           min($"x").as("min_x"), max($"x").as("max_x"),
           min($"y").as("min_y"), max($"y").as("max_y"))
      .orderBy($"bucket")
  }

  /** The interleave unrolled to pure SQL bit arithmetic — DuckDB has
    * no Morton intrinsic, so the oracle sums the 32 shifted bit
    * terms; identical integer math to [[graft.functions.ZOrderKernel]]. */
  def zorderOracleSql: String = {
    val terms = (0 until 16).flatMap { b =>
      Seq(s"(((xs >> $b) & 1) << ${2 * b})", s"(((ys >> $b) & 1) << ${2 * b + 1})")
    }.mkString(" + ")
    s"""WITH r AS (SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
       |                  min(l_suppkey) AS ymin, max(l_suppkey) AS ymax FROM lineitem),
       |s AS (SELECT l_partkey AS x, l_suppkey AS y,
       |             CASE WHEN r.xmax > r.xmin THEN ((l_partkey - r.xmin) * 65535) // (r.xmax - r.xmin) ELSE 0 END AS xs,
       |             CASE WHEN r.ymax > r.ymin THEN ((l_suppkey - r.ymin) * 65535) // (r.ymax - r.ymin) ELSE 0 END AS ys
       |      FROM lineitem CROSS JOIN r),
       |z AS (SELECT x, y, ($terms) >> 28 AS bucket FROM s)
       |SELECT bucket, count(*) AS n, min(x) AS min_x, max(x) AS max_x,
       |       min(y) AS min_y, max(y) AS max_y
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** Equal-width histogram of `value` per event type (the
    * distribution panel behind every metrics dashboard): bin `i`
    * covers `[lo + i·w, lo + (i+1)·w)` with `w = (hi−lo)/bins` from
    * that type's own min/max, the top edge closed so `hi` lands in
    * the last bin.
    *
    * Two passes, zero wide shuffles of the fact: pass 1 is a
    * |types|-row min/max aggregate (map-side combined), broadcast
    * back; pass 2 computes the bin number inside the scan and
    * aggregates to ≤ |types|·bins rows. The degenerate hi == lo type
    * collapses to bin 0 instead of dividing by zero (ANSI mode
    * would throw; a histogram must survive constant columns).
    */
  def histogramValue(spark: SparkSession, dir: String, bins: Int = 10): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_type", $"value")
    val ranges = ev.groupBy($"event_type").agg(min($"value").as("lo"), max($"value").as("hi"))
    ev.join(broadcast(ranges), Seq("event_type"))
      .withColumn("bin",
        when($"hi" > $"lo",
          least(floor(($"value" - $"lo") / (($"hi" - $"lo") / lit(bins))), lit(bins - 1).cast("double")))
          .otherwise(lit(0.0)).cast("long"))
      .groupBy($"event_type", $"bin")
      .agg(count("*").as("n"),
           round(min($"value"), 2).as("bin_min"),
           round(max($"value"), 2).as("bin_max"))
      .orderBy($"event_type", $"bin")
  }

  /** Gap-filled hourly time series with forward fill (the ClickHouse
    * `ORDER BY ... WITH FILL` / time-series-interpolation surface):
    * per (event_type, hour) integer-cents revenue, densified onto the
    * complete hour grid, empty cells flagged `is_gap` and carrying
    * the last observed value forward (`filled_cents` stays null
    * before the first observation — a leading gap has nothing to
    * carry).
    *
    * Scale shape: the fact table is touched exactly once, by a
    * map-side-combined (type, hour) aggregate that reduces it to
    * |types|·|hours| rows. Everything after runs on that tiny series:
    * the hour grid comes from a 1-row min/max aggregate exploded via
    * `sequence()` (never a scan of the fact), the grid join is
    * broadcast, and the forward-fill window sorts |hours| rows per
    * type. At 100 TB the fact aggregate is the only real stage; a
    * year of hourly cells × 1000 types is still < 10M grid rows. */
  def timeseriesFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", date_trunc("hour", $"ts").as("hour_start"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val series = ev.groupBy($"event_type", $"hour_start")
      .agg(sum($"cents").as("cents"), count(lit(1)).as("n"))
    val hours = ev.agg(min($"hour_start").as("lo"), max($"hour_start").as("hi"))
      .select(explode(sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("hour_start"))
    val grid = series.select($"event_type").distinct().crossJoin(hours)
    grid.join(series, Seq("event_type", "hour_start"), "left")
      .select($"event_type", $"hour_start",
        coalesce($"n", lit(0L)).as("n"),
        $"n".isNull.as("is_gap"),
        last($"cents", ignoreNulls = true).over(
          Window.partitionBy($"event_type").orderBy($"hour_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled_cents"))
      .orderBy($"event_type", $"hour_start")
  }

  /** DuckDB oracle for [[timeseriesFill]] — same grid, same
    * forward-fill via `IGNORE NULLS`. */
  val timeseriesFillOracleSql: String =
    """WITH ev AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
      |                   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |s AS (SELECT event_type, hour_start, CAST(sum(cents) AS BIGINT) AS cents, count(*) AS n FROM ev GROUP BY 1, 2),
      |b AS (SELECT min(hour_start) AS lo, max(hour_start) AS hi FROM ev),
      |h AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM b),
      |g AS (SELECT event_type, hour_start FROM (SELECT DISTINCT event_type FROM ev) CROSS JOIN h)
      |SELECT g.event_type, g.hour_start, COALESCE(s.n, 0) AS n, s.n IS NULL AS is_gap,
      |       last_value(s.cents IGNORE NULLS) OVER (
      |         PARTITION BY g.event_type ORDER BY g.hour_start
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
      |FROM g LEFT JOIN s ON g.event_type = s.event_type AND g.hour_start = s.hour_start
      |ORDER BY 1, 2""".stripMargin

  /** Re-aggregatable distinct-count sketches (the ClickHouse
    * `AggregatingMergeTree` / `uniqState`→`uniqMerge` pattern): one
    * HLL sketch of `user_id` per (week, day) — the shape a
    * materialized daily rollup would persist — then the weekly
    * distinct-user estimate computed by MERGING the daily sketches
    * (`hll_union_agg`), never re-touching the fact table.
    *
    * This is the capability that makes pre-aggregation work for
    * non-additive metrics at 100 TB: daily partials are a few KB
    * each, re-aggregate associatively to any coarser grain, and the
    * fact is scanned once ever. Approximate-by-design (rows-only in
    * CORRECTNESS): DuckDB has no datasketches-compatible HLL, so the
    * ±5%-of-exact and merge-vs-direct-equality guarantees are
    * spec-asserted instead. */
  def hllSketchDaily(spark: SparkSession, dir: String, lgConfigK: Int = 14): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select(date_trunc("week", $"ts").as("week"), date_trunc("day", $"ts").as("day"), $"user_id")
      .groupBy($"week", $"day")
      .agg(hll_sketch_agg($"user_id", lit(lgConfigK)).as("sk"))
    daily.groupBy($"week")
      .agg(count(lit(1)).as("n_days"),
           hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est_users"))
      .orderBy($"week")
  }

  /** Mergeable KLL quantile sketches — the quantile analog of
    * [[hllSketchDaily]]'s HLL trade: per (week, day) a few-KB
    * [[graft.functions.KllSketchAgg]] sketch of event value, daily
    * sketches UNIONED to weekly p50/p95/p99 estimates. Exact weekly
    * percentiles over an unbounded value stream need the ordered data
    * (the #19 slice-rank machinery); the sketch re-rollup is one
    * binary-column merge with a proven ~1.65% normalized-rank error
    * at k = 200 (KLL, Karnin–Lall–Liberty 2016) — the storage/error
    * trade a 100 TB rollup pipeline actually takes. Randomized
    * compaction → approximate by construction → rows-only at the
    * gate; the spec asserts the exact rank of every estimate. The
    * exact twin is `percentile_bands_daily` / `rolling_p95_value`. */
  def kllQuantilesDaily(spark: SparkSession, dir: String, k: Int = 200): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val daily = Tables.events(spark, dir)
      .select(date_trunc("week", $"ts").as("week"), date_trunc("day", $"ts").as("day"), $"value")
      .groupBy($"week", $"day")
      .agg(call_function("graft_kll_agg", $"value", lit(k)).as("sk"))
    kllWeeklyReport(daily, k)
  }

  /** Weekly union + quantile read over (week, day, sk) daily
    * sketches — shared with the streaming twin (parity by shared
    * code; estimates differ only within KLL's randomized-compaction
    * error, which the spec bounds). */
  private[graft] def kllWeeklyReport(daily: DataFrame, k: Int): DataFrame =
    daily.groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"),
        call_function("graft_kll_merge", col("sk"), lit(k)).as("wk"))
      .select(col("week"), col("n_days"),
        round(call_function("graft_kll_quantile", col("wk"), lit(0.5)), 4).as("p50"),
        round(call_function("graft_kll_quantile", col("wk"), lit(0.95)), 4).as("p95"),
        round(call_function("graft_kll_quantile", col("wk"), lit(0.99)), 4).as("p99"))
      .orderBy(col("week"))

  /** TPC-H Q17 shape ("small-quantity-order revenue"): average yearly
    * revenue lost if orders below 20% of a part's average quantity
    * were not filled — the classic correlated-aggregate-subquery
    * pattern, decorrelated into a per-part aggregate joined back.
    *
    * Exact arithmetic end-to-end: quantities and prices scale to
    * integer cents, and the `qty < 0.2·avg(qty)` predicate
    * cross-multiplies to `5·qty_c·cnt < sum_c` — no float division
    * anywhere until the one-row final report.
    *
    * Scale shape: the brand filter prunes `part` to ~1/25 and
    * broadcasts; lineitem sees ONE shuffle on l_partkey that serves
    * both the per-part aggregate and the join-back (self-join on the
    * same key co-partitions). The subquery never runs per row — it is
    * a decorrelated aggregate, which is exactly what Catalyst would
    * rewrite a correlated `WHERE l_quantity < (SELECT 0.2*avg ...)`
    * into, stated explicitly.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String, brand: String = "Brand#4"): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir).filter($"p_brand" === brand).select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey",
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"))
    val perPart = li.groupBy($"l_partkey".as("pk"))
      .agg(sum($"qty_c").as("sum_c"), count(lit(1)).as("cnt"))
    li.join(perPart, $"l_partkey" === $"pk")
      .filter($"qty_c" * lit(5L) * $"cnt" < $"sum_c")
      .agg(count(lit(1)).as("n_small"),
           sum($"price_c").as("revenue_cents"))
      .select($"n_small", coalesce($"revenue_cents", lit(0L)).as("revenue_cents"),
        round(coalesce($"revenue_cents", lit(0L)) / lit(700.0), 2).as("avg_yearly"))
  }

  /** Open-orders-over-time: how many orders are in flight each day,
    * where an order is open from `o_orderdate` until its last
    * lineitem ships. The classic interval-concurrency question,
    * answered with a boundary sweep instead of an interval×days
    * explode: +1 at each start, −1 the day after each end, deltas
    * aggregated PER DAY map-side (the fact collapses to ≤ |days|·2
    * delta rows before anything global happens), then one running
    * sum over the tiny date axis. The axis is generated from a
    * one-row min/max aggregate — planning-scale, like
    * [[timeseriesFill]]'s grid — and the cumulative window runs over
    * |days| rows under a constant partition key.
    *
    * Orders with no lineitems have no ship date and are excluded by
    * the inner join (mirrored in the oracle).
    */
  def openOrdersDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val iv = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", date_trunc("day", $"o_orderdate").as("s"))
      .agg(date_trunc("day", max($"l_shipdate")).as("e"))
    val deltas = iv.select($"s".as("day"), lit(1L).as("delta"))
      .unionByName(iv.select(($"e" + expr("INTERVAL 1 DAY")).as("day"), lit(-1L).as("delta")))
      .groupBy($"day").agg(sum($"delta").as("delta"))
    val axis = iv.agg(min($"s").as("lo"), max($"e").as("hi"))
      .select(explode(sequence($"lo", $"hi", expr("INTERVAL 1 DAY"))).as("day"))
    axis.join(deltas, Seq("day"), "left")
      .select($"day",
        sum(coalesce($"delta", lit(0L))).over(
          Window.partitionBy(lit(0)).orderBy($"day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("n_open"))
      .orderBy($"day")
  }

  /** Trailing-7-day distinct users per day — the hard sliding metric:
    * COUNT(DISTINCT) does not decompose over a moving window, so the
    * scalable shape is NOT a window function. The fact first
    * collapses to distinct (day, user) pairs (map-side combinable),
    * each pair then fans out to the ≤ 7 window-end days it can serve
    * (the same bounded-offset explode as the HOP-window oracle), and
    * one distinct-count per target day finishes it. Shuffle volume is
    * 7·|day×user| id-rows — never raw events, never per-day state.
    * Days before the axis start are clipped; the first 6 days carry
    * partial windows by definition.
    */
  def rollingDistinctUsers(spark: SparkSession, dir: String, windowDays: Int = 7): DataFrame = {
    import spark.implicits._
    val d = Tables.events(spark, dir)
      .select(date_trunc("day", $"ts").as("day"), $"user_id")
      .distinct()
    val bounds = d.agg(min($"day").as("lo"), max($"day").as("hi"))
    d.crossJoin(broadcast(bounds))
      .select(explode(expr(s"transform(sequence(0, ${windowDays - 1}), i -> timestampadd(DAY, i, day))")).as("day"),
        $"user_id", $"lo", $"hi")
      .filter($"day" >= $"lo" && $"day" <= $"hi")
      .groupBy($"day")
      .agg(count_distinct($"user_id").as("n_users_7d"))
      .orderBy($"day")
  }

  /** Trailing-7-day p95 of event value per day — the sliding QUANTILE
    * next to [[rollingDistinctUsers]]' sliding distinct: neither
    * decomposes over a moving window, so the scalable shape is the
    * same bounded fan-out (each (day, value) row serves ≤ 7 window-end
    * days) followed by a per-day rank selection. The p95 is DISCRETE
    * (the k-th smallest element, k = ⌈95·n/100⌉ computed in pure
    * integer arithmetic — `ceil(0.95·n)` in floats is off by one
    * whenever 0.95·n rounds up past an integer, e.g. n = 20) over
    * exact integer cents, so both engines select the identical
    * element. Shuffle volume is 7·|rows| (day, cents) pairs; at
    * 100 TB the same shape runs on a pre-aggregated (day, cents,
    * count) histogram — value distributions compress by orders of
    * magnitude — or swaps in the GK sketch ([[percentileStatsApprox]])
    * when ±ε is acceptable. First 6 days carry partial windows by
    * definition.
    */
  def rollingP95Value(spark: SparkSession, dir: String, windowDays: Int = 7): DataFrame = {
    import spark.implicits._
    val d = Tables.events(spark, dir)
      .select(date_trunc("day", $"ts").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val bounds = d.agg(min($"day").as("lo"), max($"day").as("hi"))
    val fan = d.crossJoin(broadcast(bounds))
      .select(explode(expr(s"transform(sequence(0, ${windowDays - 1}), i -> timestampadd(DAY, i, day))")).as("day"),
        $"cents", $"lo", $"hi")
      .filter($"day" >= $"lo" && $"day" <= $"hi")
      .select($"day", $"cents")
    val byDay = Window.partitionBy($"day")
    fan
      .withColumn("rn", row_number().over(byDay.orderBy($"cents")))
      .withColumn("n", count(lit(1)).over(byDay))
      .filter($"rn" === expr("(n * 95 + 99) div 100"))
      .select($"day", $"n", round($"cents" / 100.0, 2).as("p95"))
      .orderBy($"day")
  }

  /** Column profiling (the Deequ/dbt-style data-quality stage): one
    * scan of the fact computing per-column row count, null count, and
    * EXACT distinct cardinality, unpivoted to one row per column.
    * Multiple exact COUNT(DISTINCT)s compile to a single Expand +
    * partial aggregate — one shuffle total, no per-column scans. At
    * 100 TB the same shape swaps `count_distinct` for
    * `approx_count_distinct` per column (one pass, no Expand blowup);
    * exact is kept here because the oracle can check it.
    */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate")
    val li = Tables.lineitem(spark, dir)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        count_distinct(col(c)).as(s"${c}_distinct")))
    val one = li.agg(aggs.head, aggs.tail: _*)
    val stack = cols.map(c => s"'$c', ${c}_nulls, ${c}_distinct").mkString(", ")
    one.select($"n_rows",
        expr(s"stack(${cols.length}, $stack) AS (column_name, n_null, n_distinct)"))
      .select($"column_name", $"n_rows", $"n_null", $"n_distinct")
      .orderBy($"column_name")
  }

  /** TPC-H Q4 shape ("order priority checking"): orders per priority
    * having AT LEAST ONE late lineitem — the canonical EXISTS
    * pattern, planned as a LEFT-SEMI join so the orders side is never
    * expanded (an order with five late lines counts once, with no
    * post-join distinct). This corpus carries no commit/receipt
    * dates, so "late" is `l_shipdate > o_orderdate + 60 days`; the
    * semi-join shape — the thing Q4 exists to exercise — is
    * unchanged. The join condition references both sides (ship vs
    * order date), so it rides the equi-join on orderkey as a
    * residual filter: one shuffle pair, no pre-aggregation needed,
    * and the priority rollup runs on the surviving order rows
    * (map-side combinable, |priorities| groups).
    */
  def q4OrderPriority(spark: SparkSession, dir: String, lateDays: Int = 60): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        $"l_orderkey" === $"o_orderkey"
          && $"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q7 shape ("volume shipping"): bilateral trade revenue
    * between two nations by ship year. The two small dim chains
    * (supplier→nation, customer→nation) collapse to broadcast maps
    * BEFORE touching the fact — each is filtered to the two nations
    * first, so the broadcast carries only participating keys and the
    * fact rows for every other nation pair are dropped at the
    * map-side join, never shuffled. lineitem ⋈ orders stays the one
    * big⋈big join, on the orderkey both sides key by. Revenue in
    * exact integer cents.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String,
                       nationA: String = "NATION_18",
                       nationB: String = "NATION_19"): DataFrame = {
    import spark.implicits._
    val ns = Seq(nationA, nationB)
    val suppNation = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).filter($"n_name".isin(ns: _*)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val custNation = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir).filter($"n_name".isin(ns: _*)),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val rev = expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(custNation), $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .select($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"), rev.as("cents"))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(round(sum($"cents") / 100.0, 2).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q18 shape ("large volume customers"): orders whose total
    * quantity clears a threshold, with their customer. The HAVING
    * subquery becomes a pre-aggregation of the fact to per-order
    * quantity (map-side combinable, one shuffle on the orderkey the
    * join needs anyway), the threshold filter then shrinks it to a
    * handful of hot orders BEFORE the joins — orders joins a
    * planning-scale table, and the customer dim broadcasts. Quantity
    * summed in exact integer hundredths.
    */
  def q18LargeOrders(spark: SparkSession, dir: String, minQty: Long = 150L): DataFrame = {
    import spark.implicits._
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_c"))
      .filter($"qty_c" > minQty * 100L)
    Tables.orders(spark, dir)
      .join(bigOrders, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        date_trunc("day", $"o_orderdate").as("o_day"),
        round($"o_totalprice", 2).as("o_totalprice"),
        ($"qty_c" / lit(100.0)).as("total_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** TPC-H Q8 shape ("national market share"): a nation's share of
    * regional revenue per order year. Exercises the multi-dim join
    * pyramid — lineitem ⋈ orders (the only big⋈big join, on the
    * orderkey both sides already key by) with customer → nation →
    * region collapsed into ONE broadcast map before touching the
    * fact; revenue in exact integer cents so the share division is
    * the only float, performed on two exact Longs per year row.
    */
  def q8MarketShare(spark: SparkSession, dir: String,
                    region: String = "ASIA", nation: String = "NATION_2"): DataFrame = {
    import spark.implicits._
    val dims = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, dir), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === region)
      .select($"c_custkey", $"n_name")
    val rev = expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(dims), $"o_custkey" === $"c_custkey")
      .select(year($"o_orderdate").cast("long").as("o_year"), rev.as("cents"), $"n_name")
      .groupBy($"o_year")
      .agg(sum(when($"n_name" === nation, $"cents").otherwise(0L)).as("nation_cents"),
           sum($"cents").as("region_cents"))
      .withColumn("mkt_share", round($"nation_cents" / $"region_cents", 4))
      .orderBy($"o_year")
  }

  /** Incremental materialized-view maintenance (the
    * AggregatingMergeTree / incremental-ETL shape): a daily rollup
    * "materialized" from the base portion of the feed is brought up
    * to date by MERGING the late-arriving delta's partial aggregate —
    * the base data is NEVER re-read, because SUM/COUNT are
    * self-maintainable (full-outer coalesce-add, the batch twin of
    * [[graft.streaming.MomentsState]]'s streaming MERGE). Non-
    * self-maintainable metrics (distinct counts) would instead
    * recompute only the delta's affected days or merge sketches
    * ([[hllSketchDaily]] is that path).
    *
    * The split is simulated by event time: base = all but the last
    * `deltaDays` days, delta = the tail. The oracle is the full
    * recompute over everything — equality proves the merge is exact
    * (integer cents, so addition cannot drift).
    */
  def incrementalRollup(spark: SparkSession, dir: String, deltaDays: Int = 2): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(date_trunc("day", $"ts").as("day"), $"event_type",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val cutoff = ev.agg(max($"day").as("mx"))
      .select(expr(s"timestampadd(DAY, ${-deltaDays + 1}, mx)").as("cut"))
    val tagged = ev.crossJoin(broadcast(cutoff))
    def rollup(df: DataFrame): DataFrame =
      df.groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
    val base = rollup(tagged.filter($"day" < $"cut"))     // the "materialized" view
    val delta = rollup(tagged.filter($"day" >= $"cut"))   // late-arriving partitions
    base.join(delta.withColumnsRenamed(Map("n" -> "dn", "cents" -> "dcents")),
        Seq("day", "event_type"), "full_outer")
      .select($"day", $"event_type",
        (coalesce($"n", lit(0L)) + coalesce($"dn", lit(0L))).as("n"),
        (coalesce($"cents", lit(0L)) + coalesce($"dcents", lit(0L))).as("cents"))
      .orderBy($"day", $"event_type")
  }

  /** TPC-H Q19 shape ("discounted revenue", adapted to this part
    * schema): revenue from lineitems matching an OR-of-ANDs over
    * joined dimension and fact attributes — the classic test that
    * DISJUNCTIVE predicates still prune: Catalyst extracts the
    * common `p_brand IN (...)` + covering size/quantity bounds and
    * pushes them into both scans, while the residual OR evaluates
    * post-join. Exact integer cents; the brand-filtered part side
    * broadcasts.
    */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_brand", $"p_size")
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity",
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").as("rev_c"))
    val cond =
      ($"p_brand" === "Brand#1" && $"p_size".between(1, 10) && $"l_quantity".between(1, 20)) ||
      ($"p_brand" === "Brand#2" && $"p_size".between(5, 20) && $"l_quantity".between(5, 30)) ||
      ($"p_brand" === "Brand#3" && $"p_size".between(10, 40) && $"l_quantity".between(10, 40))
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .filter(cond)
      .agg(count(lit(1)).as("n_rows"),
           coalesce(sum($"rev_c"), lit(0L)).as("revenue_cents"))
  }

  /** DuckDB oracle for [[q19DiscountedRevenue]]. */
  val q19OracleSql: String =
    """SELECT count(*) AS n_rows,
      |       coalesce(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT), 0) AS revenue_cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 5 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 10 AND 40)""".stripMargin

  /** TPC-H Q6 ("forecasting revenue change"): the pure scan-pushdown
    * benchmark — a conjunctive filter over one fact table and a
    * single global sum, no joins at all. Every predicate (ship year,
    * discount band, quantity cap) reaches the parquet scan as a
    * pushed filter, the aggregate is map-side combinable to ONE row
    * per partition, and the only shuffle is the |partitions|-row
    * final combine. The discount band compares in exact integer
    * hundredths (`round(l_discount*100) BETWEEN 5 AND 7`) so the
    * float column never faces an equality test.
    */
  def q6RevenueDelta(spark: SparkSession, dir: String, shipYear: Int = 1997): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter(year($"l_shipdate") === shipYear
        && expr("CAST(round(l_discount * 100) AS BIGINT)").between(5L, 7L)
        && $"l_quantity" < 24.0)
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(expr("CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)")), lit(0L))
          .as("revenue_cents"))
  }

  /** DuckDB oracle for [[q6RevenueDelta]]. */
  def q6OracleSql(shipYear: Int = 1997): String =
    s"""SELECT count(*) AS n_rows,
       |       coalesce(CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT), 0) AS revenue_cents
       |FROM lineitem
       |WHERE year(l_shipdate) = $shipYear
       |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
       |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10 ("returned item reporting"): the customers who
    * returned the most revenue in a quarter. orders is filtered to
    * the quarter BEFORE the big⋈big join with lineitem (the date
    * predicate prunes at the orders scan, so the shuffle carries one
    * quarter, not seven years), the returnflag filter prunes the
    * lineitem side at its scan, and the customer→nation chain
    * collapses to one broadcast applied AFTER the per-customer
    * aggregate — the join that attaches names touches |customers with
    * returns| rows, not |lineitems|. Revenue in exact integer cents;
    * top-20 ordered (revenue desc, custkey) for determinism.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String,
                       qStart: String = "1997-10-01", qEnd: String = "1998-01-01"): DataFrame = {
    import spark.implicits._
    val ords = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit(qStart).cast("timestamp")
        && $"o_orderdate" < lit(qEnd).cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val returned = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").as("rev_c"))
    val perCust = returned.join(ords, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey").agg(sum($"rev_c").as("rev_c"))
    val custDim = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
    perCust.join(broadcast(custDim), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", round($"c_acctbal", 2).as("c_acctbal"), $"n_name",
        round($"rev_c" / 100.0, 2).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** DuckDB oracle for [[q10ReturnedItems]]. */
  def q10OracleSql(qStart: String = "1997-10-01", qEnd: String = "1998-01-01"): String =
    s"""WITH per_cust AS (
       |  SELECT o_custkey, sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag = 'R'
       |    AND o_orderdate >= TIMESTAMP '$qStart' AND o_orderdate < TIMESTAMP '$qEnd'
       |  GROUP BY o_custkey)
       |SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
       |       round(rev_c / 100.0, 2) AS revenue
       |FROM per_cust
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q13 ("customer distribution"): the histogram of
    * orders-per-customer INCLUDING the zero-order customers — the
    * query that exists to exercise an outer join that must not drop
    * unmatched build rows. The fact pre-aggregates to per-customer
    * counts first (map-side combinable, one shuffle on the custkey
    * the join needs anyway), customer LEFT-joins that planning-scale
    * table, and the final histogram groups |customers| id-rows into
    * |distinct counts| buckets. This corpus has no order comment
    * column, so the excluded class is an order-status (TPC-H excludes
    * a comment pattern); the outer-join-then-histogram shape — the
    * point of Q13 — is unchanged.
    */
  def q13OrderDistribution(spark: SparkSession, dir: String,
                           excludeStatus: String = "P"): DataFrame = {
    import spark.implicits._
    val perCust = Tables.orders(spark, dir)
      .filter($"o_orderstatus" =!= excludeStatus)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_ord"))
    Tables.customer(spark, dir)
      .join(perCust, $"c_custkey" === $"o_custkey", "left")
      .select(coalesce($"n_ord", lit(0L)).as("c_count"))
      .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** DuckDB oracle for [[q13OrderDistribution]]. */
  def q13OracleSql(excludeStatus: String = "P"): String =
    s"""WITH per_cust AS (
       |  SELECT c_custkey, count(o_orderkey) AS c_count
       |  FROM customer LEFT JOIN orders
       |    ON c_custkey = o_custkey AND o_orderstatus <> '$excludeStatus'
       |  GROUP BY c_custkey)
       |SELECT c_count, count(*) AS custdist
       |FROM per_cust GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14 ("promotion effect"): the share of one month's revenue
    * that came from promo-class parts. The month filter prunes the
    * lineitem scan, part broadcasts, and the share is ONE conditional
    * aggregate over the joined rows (no second pass) — numerator and
    * denominator both exact integer cents, the percentage the only
    * float, computed once on two Longs.
    */
  def q14PromoEffect(spark: SparkSession, dir: String,
                     mStart: String = "1997-09-01", mEnd: String = "1997-10-01"): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit(mStart).cast("timestamp")
        && $"l_shipdate" < lit(mEnd).cast("timestamp"))
      .select($"l_partkey",
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").as("rev_c"))
    li.join(broadcast(Tables.part(spark, dir).select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .agg(sum(when($"p_type" === "PROMO", $"rev_c").otherwise(0L)).as("promo_cents"),
           sum($"rev_c").as("total_cents"))
      .select($"promo_cents", $"total_cents",
        round(lit(100.0) * $"promo_cents" / $"total_cents", 4).as("promo_share"))
  }

  /** DuckDB oracle for [[q14PromoEffect]]. */
  def q14OracleSql(mStart: String = "1997-09-01", mEnd: String = "1997-10-01"): String =
    s"""WITH j AS (
       |  SELECT p_type, CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_c
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '$mStart' AND l_shipdate < TIMESTAMP '$mEnd')
       |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT) AS promo_cents,
       |       CAST(sum(rev_c) AS BIGINT) AS total_cents,
       |       round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) / sum(rev_c), 4) AS promo_share
       |FROM j""".stripMargin

  /** TPC-H Q15 ("top supplier"): the supplier(s) with the maximum
    * quarterly revenue — the argmax-with-ties shape (TPC-H specifies
    * a view + `= (SELECT max ...)`, NOT a LIMIT 1, precisely so ties
    * all surface). Per-supplier revenue is one map-side-combinable
    * aggregate; the max is a ONE-ROW broadcast (the repo's standard
    * one-row stats crossJoin) compared in exact integer cents, so
    * tie detection is exact — no float epsilon; the supplier dim
    * broadcasts onto the surviving row(s).
    */
  def q15TopSupplier(spark: SparkSession, dir: String,
                     qStart: String = "1997-01-01", qEnd: String = "1997-04-01"): DataFrame = {
    import spark.implicits._
    val perSupp = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit(qStart).cast("timestamp")
        && $"l_shipdate" < lit(qEnd).cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")).as("rev_c"))
    perSupp
      .crossJoin(broadcast(perSupp.agg(max($"rev_c").as("max_c"))))
      .filter($"rev_c" === $"max_c")
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", round($"rev_c" / 100.0, 2).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** DuckDB oracle for [[q15TopSupplier]]. */
  def q15OracleSql(qStart: String = "1997-01-01", qEnd: String = "1997-04-01"): String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_c
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$qStart' AND l_shipdate < TIMESTAMP '$qEnd'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, round(rev_c / 100.0, 2) AS total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rev_c = (SELECT max(rev_c) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q22 shape ("global sales opportunity"): customers with an
    * above-average account balance who have gone DORMANT — no order
    * since `since` — rolled up by geography. Exercises the
    * scalar-subquery + anti-join pair: the positive-balance average
    * arrives as a ONE-ROW broadcast of (sum_cents, n) and the
    * comparison cross-multiplies to pure integers
    * (`bal_c * n > sum_c` ⇔ bal > avg — no division, no float),
    * then a LEFT ANTI join against the DISTINCT recent-order
    * custkeys (date filter pushed to the orders scan, distinct
    * first, so the anti probe carries id-rows) keeps the dormant.
    * Two corpus adaptations, shape unchanged: the anti-join class is
    * "no order after a cutoff" rather than TPC-H's "no order ever"
    * (this datagen gives every customer orders, so the literal Q22
    * predicate is vacuous here), and the grouping geography is the
    * nation dim rather than the phone-prefix country code (no phone
    * column).
    */
  def q22DormantCustomers(spark: SparkSession, dir: String,
                          since: String = "2000-01-01"): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey",
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
    val avgStats = cust.filter($"bal_c" > 0L)
      .agg(sum($"bal_c").as("sum_c"), count(lit(1)).as("n_pos"))
    val dormant = cust
      .crossJoin(broadcast(avgStats))
      .filter($"bal_c" * $"n_pos" > $"sum_c")
      .join(Tables.orders(spark, dir)
          .filter($"o_orderdate" >= lit(since).cast("timestamp"))
          .select($"o_custkey").distinct(),
        $"c_custkey" === $"o_custkey", "left_anti")
    dormant
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("numcust"), round(sum($"bal_c") / 100.0, 2).as("totacctbal"))
      .orderBy($"n_name")
  }

  /** DuckDB oracle for [[q22DormantCustomers]]. */
  def q22OracleSql(since: String = "2000-01-01"): String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
       |  FROM customer),
       |avg_stats AS (
       |  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS n_pos
       |  FROM cust WHERE bal_c > 0)
       |SELECT n_name, count(*) AS numcust, round(sum(bal_c) / 100.0, 2) AS totacctbal
       |FROM cust, avg_stats
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE bal_c * n_pos > sum_c
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderdate >= TIMESTAMP '$since')
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Equi-DEPTH histogram of event value — the quantile-bucket
    * companion to [[histogramValue]]'s equi-WIDTH bins: each bucket
    * holds ~n/B rows, so the bounds themselves are the distribution
    * read (a long-tailed value column makes equi-width bins empty at
    * the top and useless at the bottom; equi-depth adapts). The
    * assignment is pure rank arithmetic on the DISTINCT-cents grid:
    * bucket(v) = ((cum(v)−1)·B) div n + 1 with cum the inclusive
    * cumulative row count — [[Behavior]]'s rfm quartile formula
    * generalized to B buckets, integer-exact, no float thresholds,
    * and all rows of one value land in one bucket (no value ever
    * splits).
    *
    * Shape: values collapse map-side to the |distinct cents| grid
    * (one shuffle); the cumsum window runs over that grid (value
    * cardinality, not row count — the documented planning-scale
    * class); n arrives as a one-row broadcast; output is exactly
    * ≤ B rows.
    */
  def histogramEquidepth(spark: SparkSession, dir: String, buckets: Int = 10): DataFrame =
    histogramEquidepthTransform(Tables.events(spark, dir), buckets)

  def histogramEquidepthTransform(events: DataFrame, buckets: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val g = events
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy($"c").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(0)).orderBy($"c")
    val cumed = g.withColumn("cum", sum($"cnt").over(w))
    cumed
      .crossJoin(broadcast(g.agg(sum($"cnt").as("n"))))
      .select($"c", $"cnt", expr(s"((cum - 1) * $buckets) div n + 1").as("bucket"))
      .groupBy($"bucket")
      .agg(min($"c").as("lo_cents"), max($"c").as("hi_cents"), sum($"cnt").as("n_rows"))
      .orderBy($"bucket")
  }

  /** DuckDB oracle for [[histogramEquidepth]]. */
  def histogramEquidepthOracleSql(buckets: Int = 10): String =
    s"""WITH g AS (SELECT CAST(round(value * 100) AS BIGINT) AS c, count(*) AS cnt FROM events GROUP BY 1),
       |cumed AS (SELECT c, cnt, CAST(sum(cnt) OVER (ORDER BY c) AS BIGINT) AS cum FROM g),
       |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g)
       |SELECT ((cum - 1) * $buckets) // n + 1 AS bucket,
       |       min(c) AS lo_cents, max(c) AS hi_cents, CAST(sum(cnt) AS BIGINT) AS n_rows
       |FROM cumed, t GROUP BY 1 ORDER BY 1""".stripMargin

  /** Year-over-year monthly revenue — the LAG-12 window shape every
    * revenue dashboard runs: monthly exact-cents totals, the
    * same-month-last-year value by calendar join (a LAG(12) over a
    * month axis silently lies when a month is missing; an explicit
    * join on month−12 cannot), growth as the single float on two
    * exact Longs, NULL (not 0) when no prior year exists.
    *
    * Shape: fact → |months| rows in one map-side-combinable shuffle;
    * the self-join on the shifted month key is planning-scale.
    */
  def yoyRevenue(spark: SparkSession, dir: String): DataFrame =
    yoyRevenueTransform(Tables.orders(spark, dir))

  def yoyRevenueTransform(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val monthly = orders
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_cents"))
    monthly
      .join(monthly.select(add_months($"month", 12).cast("timestamp").as("month"),
          $"rev_cents".as("prev_rev_cents")),
        Seq("month"), "left")
      .select($"month", $"rev_cents", $"prev_rev_cents",
        round(lit(100.0) * ($"rev_cents" - $"prev_rev_cents") / $"prev_rev_cents", 4).as("yoy_pct"))
      .orderBy($"month")
  }

  /** DuckDB oracle for [[yoyRevenue]]. */
  val yoyRevenueOracleSql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1)
      |SELECT a.month, a.rev_cents, b.rev_cents AS prev_rev_cents,
      |       round(100.0 * (a.rev_cents - b.rev_cents) / b.rev_cents, 4) AS yoy_pct
      |FROM m a LEFT JOIN m b ON a.month = b.month + INTERVAL 12 MONTH
      |ORDER BY a.month""".stripMargin

  /** Wide→long reshape (the inverse of [[pivotSales]]'s PIVOT —
    * Spark's `unpivot`/MELT): per-returnflag exact-cents metrics
    * unpivoted to (flag, metric, value) rows. One aggregate then a
    * zero-shuffle row expansion (unpivot is a generator projection,
    * ×|metrics| rows map-side).
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wide = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        expr("CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)").as("sum_qty_c"),
        expr("CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)").as("sum_price_c"),
        count(lit(1)).as("n_rows"))
    wide.unpivot(Array($"l_returnflag"),
        Array($"sum_qty_c", $"sum_price_c", $"n_rows"), "metric", "value")
      .orderBy($"l_returnflag", $"metric")
  }

  /** DuckDB oracle for [[unpivotMetrics]]. */
  val unpivotMetricsOracleSql: String =
    """WITH w AS (SELECT l_returnflag,
      |                  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |                  count(*) AS n_rows
      |           FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty_c' AS metric, sum_qty_c AS value FROM w
      |UNION ALL SELECT l_returnflag, 'sum_price_c', sum_price_c FROM w
      |UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w
      |ORDER BY 1, 2""".stripMargin

  /** DuckDB oracle for [[incrementalRollup]] — the full recompute the
    * merge must equal. */
  val incrementalRollupOracleSql: String =
    """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** DuckDB oracle for [[rollingDistinctUsers]]. */
  val rollingDistinctOracleSql: String =
    """WITH d AS (SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id FROM events),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
      |x AS (SELECT day + i * INTERVAL 1 DAY AS day, user_id
      |      FROM d CROSS JOIN (SELECT unnest(range(0, 7)) AS i))
      |SELECT x.day, count(DISTINCT x.user_id) AS n_users_7d
      |FROM x, b WHERE x.day >= b.lo AND x.day <= b.hi
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[profileColumns]]. */
  val profileColumnsOracleSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |       CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |       count(DISTINCT $c) AS n_distinct FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY 1")
  }

  /** DuckDB oracle for [[q8MarketShare]]. */
  def q8OracleSql(region: String = "ASIA", nation: String = "NATION_2"): String =
    s"""SELECT year(o_orderdate) AS o_year,
       |       CAST(sum(CASE WHEN n_name = '$nation'
       |                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
       |                     ELSE 0 END) AS BIGINT) AS nation_cents,
       |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS region_cents,
       |       round(CAST(sum(CASE WHEN n_name = '$nation'
       |                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
       |                     ELSE 0 END) AS BIGINT)
       |             / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT), 4) AS mkt_share
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey AND r_name = '$region'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[q17SmallQuantity]] — same decorrelated
    * integer-exact formulation. */
  def q17OracleSql(brand: String = "Brand#4"): String =
    s"""WITH li AS (SELECT l_partkey,
       |                  CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
       |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
       |           FROM lineitem JOIN part ON l_partkey = p_partkey AND p_brand = '$brand'),
       |pp AS (SELECT l_partkey AS pk, CAST(sum(qty_c) AS BIGINT) AS sum_c, count(*) AS cnt
       |       FROM li GROUP BY 1)
       |SELECT count(*) AS n_small,
       |       coalesce(CAST(sum(price_c) AS BIGINT), 0) AS revenue_cents,
       |       round(coalesce(CAST(sum(price_c) AS BIGINT), 0) / 700.0, 2) AS avg_yearly
       |FROM li JOIN pp ON l_partkey = pk
       |WHERE qty_c * 5 * cnt < sum_c""".stripMargin

  /** DuckDB oracle for [[openOrdersDaily]] — same boundary sweep. */
  val openOrdersOracleSql: String =
    """WITH iv AS (SELECT o_orderkey, date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS s,
      |                   date_trunc('day', max(CAST(l_shipdate AS TIMESTAMP))) AS e
      |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1, 2),
      |d AS (SELECT s AS day, 1 AS delta FROM iv
      |      UNION ALL SELECT e + INTERVAL 1 DAY, -1 FROM iv),
      |dd AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM d GROUP BY 1),
      |b AS (SELECT min(s) AS lo, max(e) AS hi FROM iv),
      |axis AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b)
      |SELECT axis.day,
      |       CAST(sum(coalesce(dd.delta, 0)) OVER (ORDER BY axis.day
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_open
      |FROM axis LEFT JOIN dd ON axis.day = dd.day
      |ORDER BY 1""".stripMargin

  /** PIVOT: the day-of-week activity matrix as one row per event
    * type with seven count columns — the wide-format report a BI
    * layer reads directly (the `grouping sets`/`cube` family's
    * sibling: those go long, this goes wide). Uses Spark's native
    * `pivot()` with the column values PINNED (passing the value list
    * skips the extra distinct-scan job and fixes the output schema
    * at plan time — the scale-correct form; an unpinned pivot runs a
    * collect first). One map-side-combinable shuffle; 7·|types|
    * cells. */
  /** The wide pivot off a (event_type, dow, n) long grid — shared
    * with the STREAMING face, which derives the grid from its daily
    * rollup state (dow is a pure function of the day). */
  private[graft] def pivotFromTypeDow(obs: DataFrame): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupBy($"event_type")
      .pivot("dow", (0L to 6L).map(java.lang.Long.valueOf))
      .sum("n")
      .na.fill(0L)
      .toDF("event_type", "dow_0", "dow_1", "dow_2", "dow_3", "dow_4", "dow_5", "dow_6")
      .orderBy($"event_type")
  }

  def pivotTypeDow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pivotFromTypeDow(Tables.events(spark, dir)
      .select($"event_type", (dayofweek($"ts") - 1).cast("long").as("dow"))
      .groupBy($"event_type", $"dow").agg(count(lit(1)).as("n")))
  }

  /** DuckDB oracle for [[pivotTypeDow]] — the pivot as CASE sums. */
  val pivotTypeDowOracleSql: String = {
    val cols = (0 to 6).map(d =>
      s"CAST(sum(CASE WHEN date_part('dow', CAST(ts AS TIMESTAMP)) = $d THEN 1 ELSE 0 END) AS BIGINT) AS dow_$d")
      .mkString(",\n       |       ")
    s"""SELECT event_type,
       |       $cols
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
