package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * scale-safely by range-partitioned rank:
    *
    *   1. one aggregation pass → per-group count/min/max and the
    *      target ranks;
    *   2. every value is assigned to one of `buckets` value-range
    *      slices; a second aggregation pass counts each slice, and a
    *      window over the TINY (groups × buckets) count table turns
    *      slice counts into global rank offsets — locating the one
    *      slice that contains each target rank;
    *   3. only the located slices (≈ n/buckets rows each) are sorted
    *      (row_number per (group, slice)), and offset + local rank =
    *      exact global rank.
    *
    * Nothing ever sorts a whole group: the previous formulation's
    * `row_number() OVER (PARTITION BY l_returnflag)` put one task per
    * group — parallelism 3 at ANY cluster size, 33 TB through a
    * single sort at the target scale. Here parallelism is
    * groups × buckets for the counting pass and the final sort
    * touches ~|targets| · n/buckets rows. (At warehouse scale the
    * slice boundaries would come from a range sampler à la
    * RangePartitioner rather than uniform min/max splits, which
    * degrade only under extreme in-group value skew — the located
    * slice then holds more rows, never wrong results.)
    */
  def percentileStats(spark: SparkSession, dir: String,
                      quantiles: Seq[(String, Double)] = Seq("median_price" -> 0.5, "p95_price" -> 0.95),
                      buckets: Int = 256): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_returnflag", $"l_extendedprice")

    // pass 1: group sizes + min/max → target ranks pos = (cnt-1)*q
    val stats = li.groupBy($"l_returnflag").agg(count("*").as("cnt"),
      min($"l_extendedprice").as("vmin"), max($"l_extendedprice").as("vmax"))

    // tiny (group × quantile × {lo,hi}) rank-target table
    val qStructs = quantiles.map { case (name, qv) =>
      struct(lit(name).as("qname"), lit(qv).as("qv"))
    }
    val targets = stats
      .select($"l_returnflag", $"cnt", explode(array(qStructs: _*)).as("q"))
      .select($"l_returnflag", $"q.qname".as("qname"),
        (($"cnt" - 1) * $"q.qv").as("pos"))
      .select($"l_returnflag", $"qname", ($"pos" - floor($"pos")).as("frac"),
        explode(array(
          struct(lit("lo").as("which"), (floor($"pos").cast("long") + 1).as("rk")),
          struct(lit("hi").as("which"), (ceil($"pos").cast("long") + 1).as("rk")))).as("r"))
      .select($"l_returnflag", $"qname", $"frac", $"r.which".as("which"), $"r.rk".as("rk"))

    // pass 2: uniform value-range slice per row; count each slice
    val bucketed = li.join(broadcast(stats.select($"l_returnflag", $"vmin", $"vmax")), Seq("l_returnflag"))
      .withColumn("bkt", when($"vmax" > $"vmin",
          least(lit(buckets - 1),
            floor(($"l_extendedprice" - $"vmin") / ($"vmax" - $"vmin") * buckets).cast("int")))
        .otherwise(lit(0)))
      .select($"l_returnflag", $"bkt", $"l_extendedprice")
    val sliceCounts = bucketed.groupBy($"l_returnflag", $"bkt").agg(count("*").as("bc"))
    // rank offsets over the tiny slice-count table (≤ groups × buckets rows)
    val wcum = Window.partitionBy($"l_returnflag").orderBy($"bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliceCounts.withColumn("cum_before", coalesce(sum($"bc").over(wcum), lit(0L)))

    // locate each target rank's slice: cum_before < rk <= cum_before + bc
    val located = targets.join(offsets, Seq("l_returnflag"))
      .filter($"rk" > $"cum_before" && $"rk" <= $"cum_before" + $"bc")
      .select($"l_returnflag", $"qname", $"which", $"frac", $"rk", $"bkt", $"cum_before")

    // pass 3: sort ONLY the located slices; offset + local rank = global rank
    val needed = located.select($"l_returnflag", $"bkt", $"cum_before")
      .dropDuplicates("l_returnflag", "bkt")
    val wSlice = Window.partitionBy($"l_returnflag", $"bkt").orderBy($"l_extendedprice")
    val ranked = bucketed.join(broadcast(needed), Seq("l_returnflag", "bkt"))
      .withColumn("grk", $"cum_before" + row_number().over(wSlice))
    // renamed join key: `located` also feeds `needed` above, so both
    // join sides share lineage — a bare column reference would be
    // ambiguous under self-join resolution
    val locSel = located.select($"l_returnflag".as("t_flag"), $"qname", $"which", $"frac", $"rk")
    val hits = ranked.join(broadcast(locSel),
        $"l_returnflag" === $"t_flag" && $"grk" === $"rk")
      .select($"l_returnflag", $"qname", $"which", $"frac", $"l_extendedprice")

    // assemble: vlo + (vhi - vlo) * frac per quantile, plus min/max
    val aggCols = quantiles.flatMap { case (name, _) =>
      Seq(
        min(when($"qname" === name && $"which" === "lo", $"l_extendedprice")).as(s"${name}_vlo"),
        min(when($"qname" === name && $"which" === "hi", $"l_extendedprice")).as(s"${name}_vhi"),
        min(when($"qname" === name, $"frac")).as(s"${name}_f"))
    }
    val picked = hits.groupBy($"l_returnflag").agg(aggCols.head, aggCols.tail: _*)
    val interpolated = quantiles.foldLeft(picked) { case (df, (name, _)) =>
      df.withColumn(name, round(
        col(s"${name}_vlo") + (col(s"${name}_vhi") - col(s"${name}_vlo")) * col(s"${name}_f"), 2))
    }
    interpolated
      .join(broadcast(stats.select($"l_returnflag",
        round($"vmin", 2).as("min_price"), round($"vmax", 2).as("max_price"))), Seq("l_returnflag"))
      .select($"l_returnflag", $"median_price", $"p95_price", $"min_price", $"max_price")
      .orderBy($"l_returnflag")
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
}
