package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Count–Min sketch (Cormode & Muthukrishnan 2005) over the item
  * stream — the bounded-memory frequency surface every streaming
  * counter service keeps when exact per-key counts stop fitting:
  * d=4 hash rows × w=512 counters, point estimate = min over rows,
  * with the classic one-sided guarantee est ∈ [n_i, n_i + εN],
  * ε = e/w, failure δ = e^−d.
  *
  * Everything is DETERMINISTIC and SQL-reproducible — the hash rows
  * are fixed universal-family parameters h_j(i) = ((i mod p)·a_j +
  * b_j) mod p mod w with p = 2³¹−1 (the mod-p reduction first keeps
  * the product inside a Long at any item-id scale), so the DuckDB
  * oracle rebuilds the IDENTICAL sketch and the correctness gate is
  * exact, not approximate: the ±εN slack is the SPEC's property
  * (est ≥ exact, est ≤ exact + εN on random data), never the
  * compare's.
  *
  * Shape: one scan fans each fact row to d (row, bucket) pairs
  * inside codegen (generator, no join) and map-side-combines to the
  * d·w counter grid — the sketch build is scan-bound at any scale.
  * The query face estimates the domain's heavy hitters: the
  * candidate dictionary is the distinct item set (domain-bounded,
  * vocab-like — a sketch answers point queries, it cannot enumerate
  * keys), each candidate reads its d counters through a broadcast
  * join against the 2048-row grid, and survivors clear the
  * integer-exact share threshold 200·est ≥ N (est ≥ 0.5% of N, N
  * read exactly off hash row 0's counter sum).
  */
object Sketches {

  /** Fixed universal-hash parameters (a_j, b_j) for the d=4 rows. */
  private val hashRows = Seq((98491L, 7L), (24593L, 131L), (49157L, 2311L), (196613L, 17L))
  private val p = 2147483647L
  private val width = 512

  /** Row-j bucket: x = (i·a_j + b_j) mod p, bucket = x² mod p mod w.
    * The SQUARING is load-bearing: for small ids the affine product
    * never wraps p, so ((i·a+b) mod p) mod w degenerates to the
    * linear (i·a+b) mod w and any two ids differing by a multiple of
    * w collide in EVERY row (caught by the collision spec). x² with
    * x < 2³¹ wraps p thousands of times (and stays < 2⁶² — Long-safe
    * in both engines), breaking the shared linear structure per row. */
  private def bucketExpr(itemCol: String, a: Long, b: Long): String = {
    val x = s"((($itemCol % $p) * $a + $b) % $p)"
    s"(($x * $x) % $p) % $width"
  }

  /** The d×w counter grid from an `item` column — the additive state
    * the streaming face merges across micro-batches. */
  private[graft] def cmsCountersTransform(items: DataFrame): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val fan = array(hashRows.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j.toLong).as("j"), expr(bucketExpr("item", a, b)).as("bucket"))
    }: _*)
    items.filter($"item".isNotNull)
      .select(explode(fan).as("h"))
      .groupBy($"h.j".as("j"), $"h.bucket".as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Heavy-hitter estimates off an already-built counter grid plus a
    * candidate item dictionary — split out so the STREAMING twin
    * reads it over [[graft.streaming.CmsState]]'s additive state. */
  private[graft] def cmsTopFromState(counters: DataFrame, items: DataFrame): DataFrame = {
    val spark = counters.sparkSession
    import spark.implicits._
    val fan = array(hashRows.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j.toLong).as("j"), expr(bucketExpr("item", a, b)).as("bucket"))
    }: _*)
    val est = items.filter($"item".isNotNull).distinct()
      .select($"item", explode(fan).as("h"))
      .select($"item", $"h.j".as("j"), $"h.bucket".as("bucket"))
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy($"item").agg(min($"c").as("cms_est"))
    val total = counters.filter($"j" === 0L).agg(sum($"c").as("n_total"))
    est.join(broadcast(total)) // 1-row build side
      .filter(lit(200L) * $"cms_est" >= $"n_total")
      .select($"item", $"cms_est", $"n_total")
      .orderBy($"cms_est".desc, $"item")
  }

  /** Queries entry: build the sketch over the event item stream and
    * report the ≥0.5%-share heavy hitters with their estimates. */
  def cmsTopItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"))
    cmsTopFromState(cmsCountersTransform(items), items)
  }

  /** DuckDB oracle — rebuilds the identical sketch (same hash
    * parameters via a CASE ladder over the row index). */
  val cmsTopItemsOracleSql: String = {
    val aCase = "CASE t.j WHEN 0 THEN 98491 WHEN 1 THEN 24593 WHEN 2 THEN 49157 ELSE 196613 END"
    val bCase = "CASE t.j WHEN 0 THEN 7 WHEN 1 THEN 131 WHEN 2 THEN 2311 ELSE 17 END"
    s"""WITH items AS (SELECT TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
       |               FROM events),
       |fan AS (SELECT t.j,
       |               ((((item % $p) * ($aCase) + ($bCase)) % $p)
       |                * (((item % $p) * ($aCase) + ($bCase)) % $p) % $p) % $width AS bucket
       |        FROM items CROSS JOIN range(0, 4) t(j) WHERE item IS NOT NULL),
       |counters AS (SELECT j, bucket, count(*) AS c FROM fan GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT item FROM items WHERE item IS NOT NULL),
       |est AS (SELECT cand.item, min(counters.c) AS cms_est
       |        FROM cand CROSS JOIN range(0, 4) t(j)
       |        JOIN counters ON counters.j = t.j
       |         AND counters.bucket =
       |           ((((cand.item % $p) * ($aCase) + ($bCase)) % $p)
       |            * (((cand.item % $p) * ($aCase) + ($bCase)) % $p) % $p) % $width
       |        GROUP BY 1),
       |total AS (SELECT sum(c) AS n_total FROM counters WHERE j = 0)
       |SELECT est.item, CAST(est.cms_est AS BIGINT) AS cms_est,
       |       CAST(total.n_total AS BIGINT) AS n_total
       |FROM est, total WHERE 200 * est.cms_est >= total.n_total
       |ORDER BY est.cms_est DESC, est.item""".stripMargin
  }
}
