package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Interval-union analytics — the gaps-and-islands shape every
  * warehouse eventually needs ("how many distinct busy windows, and
  * how much wall-clock do they cover once overlaps merge"), here over
  * each supplier's shipment fulfillment windows. The reference's
  * session close (`src/process.py:27-41`) is the gap-split member of
  * this family; this is the overlap-merge member, which no
  * gap-threshold sessionization expresses.
  *
  * Scale shape: ONE shuffle on the grouping key; island detection is
  * a running `max(end)` over the ordered partition (carry-forward
  * window, no self-join against all earlier intervals — the naive
  * quadratic); the island id is a running sum over the same
  * partitioning, so both windows share one sort. All arithmetic is
  * integer epoch-days — exact in both engines.
  */
object Intervals {

  /** Per supplier: merge overlapping-or-touching fulfillment windows
    * `[ship_day, ship_day + quantity)` (the deterministic width
    * stands in for a fulfillment-duration column the synthetic
    * schema lacks) → `(n_intervals, covered_days)`. */
  def intervalCoalesceTransform(lineitem: DataFrame): DataFrame = {
    val iv = lineitem.select(
      col("l_suppkey"),
      datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long").as("s"),
      (datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long")
        + col("l_quantity").cast("long")).as("e"),
      col("l_orderkey"), col("l_linenumber"))
    val ord = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("s"), col("e"), col("l_orderkey"), col("l_linenumber"))
    val prevMax = max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1))
    iv.withColumn("new_island",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island"))
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("l_suppkey"), col("island"))
      .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_intervals"),
           sum(col("is_e") - col("is_s")).as("covered_days"))
      .orderBy(col("l_suppkey"))
  }

  def intervalCoalesce(spark: SparkSession, dir: String): DataFrame =
    intervalCoalesceTransform(Tables.lineitem(spark, dir))

  /** Oracle for [[intervalCoalesceTransform]] — same total order,
    * same running-max island detection. */
  val intervalCoalesceOracleSql: String =
    """WITH iv AS (
      |  SELECT l_suppkey,
      |         CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS s,
      |         CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) + CAST(l_quantity AS BIGINT) AS BIGINT) AS e,
      |         l_orderkey, l_linenumber
      |  FROM lineitem),
      |m AS (SELECT *,
      |             max(e) OVER (PARTITION BY l_suppkey
      |                          ORDER BY s, e, l_orderkey, l_linenumber
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |      FROM iv),
      |i AS (SELECT *,
      |             CAST(sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
      |                  OVER (PARTITION BY l_suppkey
      |                        ORDER BY s, e, l_orderkey, l_linenumber
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
      |      FROM m),
      |g AS (SELECT l_suppkey, island, min(s) AS is_s, max(e) AS is_e
      |      FROM i GROUP BY 1, 2)
      |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_intervals,
      |       CAST(sum(is_e - is_s) AS BIGINT) AS covered_days
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
}
