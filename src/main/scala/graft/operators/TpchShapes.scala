package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The seven remaining TPC-H query *shapes* (Q2, Q9, Q11, Q12, Q16,
  * Q20, Q21), completing the 22-query family on this corpus.
  *
  * None of these can be literal TPC-H: the datagen has no `partsupp`
  * table (so Q2/Q9/Q11/Q16/Q20's supply-cost / availability columns
  * don't exist) and no `l_commitdate`/`l_receiptdate`/`l_shipmode`
  * (so Q12/Q21's lateness predicates don't exist). Each query below
  * keeps the *plan shape* the TPC-H query exists to exercise —
  * correlated-min argmin join-back (Q2), multi-dim star join with a
  * big⋈big fact self-extension (Q9), scalar-subquery share threshold
  * (Q11), conditional two-way counts over a big join (Q12),
  * anti-join + count-distinct rollup (Q16), fair-share dominance
  * semi-join (Q20), exists/not-exists sole-failure attribution (Q21)
  * — re-derived from the columns that do exist, with every
  * comparison in exact integer arithmetic (cents / cross-multiplied
  * shares), so Spark and DuckDB agree bit-for-bit.
  *
  * Scale notes common to all seven: dims (part/supplier/nation/
  * region, ≤ thousands of rows at any SF) always broadcast; the only
  * big⋈big shuffles are lineitem⋈orders on l_orderkey (Q9/Q12/Q21 —
  * unavoidable, both sides hash-partition on the join key once) and
  * every aggregate is map-side combinable before its one shuffle.
  */
object TpchShapes {

  private def cents(col: String): org.apache.spark.sql.Column =
    expr(s"CAST(round($col * 100) AS BIGINT)")

  // ---------------------------------------------------------------- Q2

  /** TPC-H Q2 shape ("minimum cost supplier"): for every part of a
    * given type, the supplier(s) in a given region offering it at
    * the lowest observed price — the correlated-scalar-min +
    * argmin-with-ties join-back. With no `partsupp.ps_supplycost`,
    * the offer price is derived from the fact itself: a supplier's
    * offer for a part = MIN line price (exact cents) over their
    * lineitem rows for that part. Offers aggregate map-side to
    * (part, supp) grain — one shuffle on the composite key; the
    * region/type eligibility joins are all broadcasts; the per-part
    * min re-aggregates the (small) offer table and joins back on
    * exact cents equality so ties all surface (TPC-H mandates
    * `= (SELECT min ...)`, not LIMIT 1, for exactly this reason).
    * Output capped at 100 rows under a total order (acctbal desc,
    * then name/part/supp) so the cap is deterministic.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String,
                        region: String = "ASIA", pType: String = "LARGE"): DataFrame = {
    import spark.implicits._
    val offers = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min(cents("l_extendedprice")).as("offer_c"))
    val suppGeo = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir).filter($"r_name" === region)),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val eligible = offers
      .join(broadcast(Tables.part(spark, dir)
          .filter($"p_type" === pType).select($"p_partkey", $"p_name")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(suppGeo), $"l_suppkey" === $"s_suppkey")
    val mins = eligible.groupBy($"p_partkey".as("pk")).agg(min($"offer_c").as("min_c"))
    eligible
      .join(mins, $"p_partkey" === $"pk" && $"offer_c" === $"min_c")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
        round($"offer_c" / 100.0, 2).as("min_cost"))
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  /** DuckDB oracle for [[q2MinCostSupplier]]. */
  def q2OracleSql(region: String = "ASIA", pType: String = "LARGE"): String =
    s"""WITH offers AS (
       |  SELECT l_partkey, l_suppkey,
       |         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS offer_c
       |  FROM lineitem GROUP BY 1, 2),
       |eligible AS (
       |  SELECT o.*, s_name, s_acctbal, n_name, p_name
       |  FROM offers o
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey AND r_name = '$region'
       |  JOIN part ON l_partkey = p_partkey AND p_type = '$pType')
       |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_name,
       |       round(offer_c / 100.0, 2) AS min_cost
       |FROM eligible e
       |WHERE offer_c = (SELECT min(offer_c) FROM eligible e2 WHERE e2.l_partkey = e.l_partkey)
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- Q9

  /** TPC-H Q9 shape ("product type profit"): profit by supplier
    * nation × order year for parts matching a name pattern — the
    * widest star join in the family (fact ⋈ part ⋈ supplier ⋈
    * nation ⋈ orders). With no `ps_supplycost`, profit = revenue
    * (price·(1−discount), exact cents). Join discipline: the part
    * name filter broadcasts FIRST so the fact shrinks before the one
    * big⋈big shuffle (lineitem⋈orders on orderkey — only the year
    * survives from orders); supplier→nation attach as broadcasts on
    * the pruned rows. The (nation, year) aggregate is map-side
    * combinable to ≤ |nations|·|years| rows.
    */
  def q9ProductProfit(spark: SparkSession, dir: String,
                      namePat: String = "%widget%"): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter($"p_name".like(namePat)).select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_suppkey",
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").as("profit_c"))
    li.join(Tables.orders(spark, dir)
          .select($"o_orderkey", year($"o_orderdate").cast("long").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), $"o_year")
      .agg(sum($"profit_c").as("profit_cents"))
      .select($"nation", $"o_year", $"profit_cents",
        round($"profit_cents" / 100.0, 2).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** DuckDB oracle for [[q9ProductProfit]]. */
  def q9OracleSql(namePat: String = "%widget%"): String =
    s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS profit_cents,
       |       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0, 2) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_name LIKE '$namePat'
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  // --------------------------------------------------------------- Q11

  /** TPC-H Q11 shape ("important stock"): parts whose traded value
    * through one nation's suppliers exceeds a fraction of that
    * nation's total — the scalar-subquery-threshold shape. Value is
    * derived from lineitem (no `ps_availqty·ps_supplycost`): per-part
    * exact-cents revenue through the nation's suppliers. The nation
    * filter broadcasts onto the fact scan; the per-part aggregate is
    * one map-side-combinable shuffle; the total arrives as a ONE-ROW
    * broadcast and the threshold comparison cross-multiplies to pure
    * integers (`val_c · 10000 > bp · total_c` ⇔ share > bp/10⁴ —
    * no division, no float), the repo's standard scalar-subquery
    * discipline.
    */
  def q11ImportantParts(spark: SparkSession, dir: String,
                        nationName: String = "NATION_3", thresholdBp: Int = 10): DataFrame = {
    import spark.implicits._
    val suppIn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter($"n_name" === nationName)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val perPart = Tables.lineitem(spark, dir)
      .join(broadcast(suppIn), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum(cents("l_extendedprice")).as("value_cents"))
    perPart
      .crossJoin(broadcast(perPart.agg(sum($"value_cents").as("total_c"))))
      .filter($"value_cents" * 10000L > lit(thresholdBp.toLong) * $"total_c")
      .select($"l_partkey", $"value_cents", round($"value_cents" / 100.0, 2).as("value"))
      .orderBy($"value_cents".desc, $"l_partkey")
  }

  /** DuckDB oracle for [[q11ImportantParts]]. */
  def q11OracleSql(nationName: String = "NATION_3", thresholdBp: Int = 10): String =
    s"""WITH v AS (
       |  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey AND n_name = '$nationName'
       |  GROUP BY 1)
       |SELECT l_partkey, value_cents, round(value_cents / 100.0, 2) AS value
       |FROM v
       |WHERE value_cents * 10000 > $thresholdBp * (SELECT CAST(sum(value_cents) AS BIGINT) FROM v)
       |ORDER BY value_cents DESC, l_partkey""".stripMargin

  // --------------------------------------------------------------- Q12

  /** TPC-H Q12 shape ("shipping modes and order priority"): priority
    * mix per shipping-speed class over the full orders⋈lineitem
    * join — the conditional-two-way-count shape. With no
    * `l_shipmode`/`l_receiptdate`, the class is derived: ship lag =
    * exact calendar days from order date to ship date (both columns
    * are midnight-aligned, so Spark `datediff` and DuckDB
    * `date_diff('day', …)` agree; the datagen emits negative lags
    * too — they land in FAST, documented). One big⋈big shuffle on
    * orderkey carrying only (priority, lag); the 3-row aggregate is
    * map-side combinable.
    */
  def q12ShipLag(spark: SparkSession, dir: String,
                 fastDays: Int = 30, normalDays: Int = 90): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select(
        when(datediff($"l_shipdate", $"o_orderdate") <= fastDays, "FAST")
          .when(datediff($"l_shipdate", $"o_orderdate") <= normalDays, "NORMAL")
          .otherwise("SLOW").as("speed_class"),
        $"o_orderpriority")
      .groupBy($"speed_class")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy($"speed_class")
  }

  /** DuckDB oracle for [[q12ShipLag]]. */
  def q12OracleSql(fastDays: Int = 30, normalDays: Int = 90): String =
    s"""SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= $fastDays THEN 'FAST'
       |            WHEN date_diff('day', o_orderdate, l_shipdate) <= $normalDays THEN 'NORMAL'
       |            ELSE 'SLOW' END AS speed_class,
       |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- Q16

  /** TPC-H Q16 shape ("parts/supplier relationship"): how many
    * qualified suppliers can deliver each (brand, type, size) part
    * class — the anti-join + count-distinct rollup. The part⋈supplier
    * bridge is derived from lineitem (no `partsupp`): DISTINCT
    * (partkey, suppkey) pairs — collapsed map-side BEFORE any join so
    * the bridge carries id-pairs, never fact rows. The supplier
    * blacklist (TPC-H's "complaints" filter; here: negative account
    * balance) is a broadcast LEFT ANTI; part attributes attach by
    * broadcast; the rollup is a two-phase countDistinct on
    * (brand, type, size) — partial de-dup map-side.
    */
  def q16PartsSuppliers(spark: SparkSession, dir: String,
                        exclBrand: String = "Brand#1", exclType: String = "PROMO",
                        sizes: Seq[Int] = Seq(3, 9, 14, 19, 23, 36, 45, 49)): DataFrame = {
    import spark.implicits._
    val bridge = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    val blacklist = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0.0).select($"s_suppkey")
    bridge
      .join(broadcast(blacklist), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(Tables.part(spark, dir)
          .filter($"p_brand" =!= exclBrand && $"p_type" =!= exclType
            && $"p_size".isin(sizes.map(Integer.valueOf): _*))
          .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** DuckDB oracle for [[q16PartsSuppliers]]. */
  def q16OracleSql(exclBrand: String = "Brand#1", exclType: String = "PROMO",
                   sizes: Seq[Int] = Seq(3, 9, 14, 19, 23, 36, 45, 49)): String =
    s"""SELECT p_brand, p_type, p_size,
       |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> '$exclBrand' AND p_type <> '$exclType'
       |  AND p_size IN (${sizes.mkString(", ")})
       |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --------------------------------------------------------------- Q20

  /** TPC-H Q20 shape ("potential part promotion"): suppliers holding
    * an OUTSIZED share of some part's supply — the
    * threshold-against-part-total semi-join. With no
    * `ps_availqty > ½·sum(qty)` (and this datagen spreading quantity
    * near-uniformly: the max observed single-supplier share is ~23%,
    * so TPC-H's literal 50% bar selects nothing at any SF), the bar
    * is FAIR-SHARE-relative: a supplier dominates a part when their
    * shipped quantity exceeds 2× the part's per-supplier mean —
    * cross-multiplied to exact integers
    * (`qty_c · n_supp > 2 · total_c`), scale-free by construction.
    * Per-(part, supp) quantities aggregate map-side on the composite
    * key (one shuffle); part totals re-aggregate that small table;
    * the name-pattern filter broadcasts onto the first aggregate's
    * input; output = per-supplier count of dominated parts.
    */
  def q20DominantSupplier(spark: SparkSession, dir: String,
                          namePat: String = "small%", factor: Int = 2): DataFrame = {
    import spark.implicits._
    val pq = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter($"p_name".like(namePat)).select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(cents("l_quantity")).as("qty_c"))
    val tot = pq.groupBy($"l_partkey".as("pk"))
      .agg(sum($"qty_c").as("total_c"), count(lit(1)).as("n_supp"))
    pq.join(tot, $"l_partkey" === $"pk")
      .filter($"qty_c" * $"n_supp" > lit(factor.toLong) * $"total_c")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_dominated"))
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"n_dominated")
      .orderBy($"n_dominated".desc, $"s_suppkey")
  }

  /** DuckDB oracle for [[q20DominantSupplier]]. */
  def q20OracleSql(namePat: String = "small%", factor: Int = 2): String =
    s"""WITH pq AS (
       |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
       |  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_name LIKE '$namePat'
       |  GROUP BY 1, 2),
       |tot AS (SELECT l_partkey AS pk, CAST(sum(qty_c) AS BIGINT) AS total_c, count(*) AS n_supp
       |        FROM pq GROUP BY 1)
       |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dominated
       |FROM pq JOIN tot ON l_partkey = pk
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE qty_c * n_supp > $factor * total_c
       |GROUP BY 1, 2
       |ORDER BY n_dominated DESC, s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q21

  /** TPC-H Q21 shape ("suppliers who kept orders waiting"): on
    * finished multi-supplier orders, the supplier who was the SOLE
    * late shipper — the exists/not-exists pair (another supplier on
    * the order exists; another LATE supplier does not). With no
    * `l_receiptdate > l_commitdate`, late = ship lag > `lateDays`
    * calendar days after the order date. Instead of two correlated
    * self-joins of the fact, lateness reduces to per-order COUNTS:
    * (order, supp) grain with a MAX(late) flag — map-side
    * combinable, one shuffle on the composite key — then per-order
    * (n suppliers, n late suppliers) — a re-aggregate of the small
    * table; "kept the order waiting" ⇔ late ∧ n_supp > 1 ∧
    * n_late = 1, evaluated row-local after one broadcast-back of the
    * per-order stats (the per-order table is orders-scale; at 100 TB
    * it joins back by sort-merge on ok instead — same plan shape,
    * documented). Final per-supplier count is a ≤|supplier| rollup.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String,
                         lateDays: Int = 90, status: String = "F"): DataFrame = {
    import spark.implicits._
    val perOrderSupp = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter($"o_orderstatus" === status)
          .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey".as("ok"), $"l_suppkey".as("sk"))
      .agg(max(when(datediff($"l_shipdate", $"o_orderdate") > lateDays, 1L).otherwise(0L))
        .as("late"))
    val perOrder = perOrderSupp.groupBy($"ok".as("ok2"))
      .agg(count(lit(1)).as("n_supp"), sum($"late").as("n_late"))
    perOrderSupp
      .join(perOrder, $"ok" === $"ok2")
      .filter($"late" === 1L && $"n_supp" > 1L && $"n_late" === 1L)
      .groupBy($"sk")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")),
        $"sk" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_suppkey")
      .limit(100)
  }

  /** DuckDB oracle for [[q21WaitingSupplier]]. */
  def q21OracleSql(lateDays: Int = 90, status: String = "F"): String =
    s"""WITH ls AS (
       |  SELECT l_orderkey AS ok, l_suppkey AS sk,
       |         max(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > $lateDays THEN 1 ELSE 0 END) AS late
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = '$status'
       |  GROUP BY 1, 2),
       |po AS (SELECT ok, count(*) AS n_supp, sum(late) AS n_late FROM ls GROUP BY 1)
       |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
       |FROM ls JOIN po USING (ok)
       |JOIN supplier ON sk = s_suppkey
       |WHERE late = 1 AND n_supp > 1 AND n_late = 1
       |GROUP BY 1, 2
       |ORDER BY numwait DESC, s_suppkey
       |LIMIT 100""".stripMargin
}
