package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format coverage: prove the engine round-trips its tables
  * through the interchange formats a deployment actually ingests —
  * JSON-lines (the reference's Kafka payload format), CSV (the
  * warehouse-export lingua franca), and ORC (the other columnar
  * format next to parquet). Each entry WRITES the parquet table out
  * in the format under test, reads it back with an explicit schema
  * (schema inference is a production anti-pattern — one all-null file
  * flips a column type), and aggregates the read-back rows; the
  * DuckDB oracle computes the identical aggregate over the ORIGINAL
  * parquet, so equality proves the encode/decode is lossless —
  * including JSON string escaping (the docs corpus carries quotes
  * and the events props are JSON-in-JSON) and µs timestamp fidelity
  * (every events row has sub-second precision; the JSON/CSV
  * timestampFormat is pinned to micros because Spark's default
  * truncates to millis — a real, silent-by-default loss).
  *
  * Content integrity rides on an md5-prefix checksum — Spark
  * `conv(substr(md5(x),1,8),16,10)` ≡ DuckDB
  * `CAST('0x' || substr(md5(x),1,8) AS BIGINT)` — summed per group:
  * any reordered, dropped, or mangled string moves the sum.
  *
  * Scale shape: the write is one pass out, the read one pass back;
  * both partition like any file scan. The checksum agg is map-side
  * combinable to |groups| rows. */
object Formats {

  private val tsMicros = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def md5Prefix(c: String): String =
    s"CAST(conv(substr(md5($c), 1, 8), 16, 10) AS BIGINT)"

  /** JSONL roundtrip of the documents corpus (quote/newline escaping
    * is the hazard), checked per source. */
  def jsonlDocsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_jsonl_")
    Tables.documents(spark, dir).write.mode("overwrite").json(s"$work/docs")
    val back = spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .json(s"$work/docs")
    back.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_len"),
        sum(col("n_chars")).as("sum_chars"),
        sum(expr(md5Prefix("text"))).as("text_checksum"))
      .orderBy(col("source"))
  }

  /** CSV roundtrip of lineitem (quoting, numeric formatting, and the
    * timestamp column are the hazards), checked per return flag. */
  def csvLineitemRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_csv_")
    // parquet ships l_shipdate as TIMESTAMP_NTZ (isAdjustedToUTC =
    // false); cast to session-UTC TimestampType FIRST so the pinned
    // timestampFormat governs the write — NTZ columns follow the
    // separate timestampNTZFormat default and would round-trip
    // through a format the reader below doesn't expect
    Tables.lineitem(spark, dir)
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
      .write.mode("overwrite")
      .option("header", "true").option("timestampFormat", tsMicros)
      .csv(s"$work/lineitem")
    val back = spark.read
      .schema("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, " +
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, " +
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, " +
        "l_linestatus STRING, l_shipdate TIMESTAMP")
      .option("header", "true").option("timestampFormat", tsMicros)
      .csv(s"$work/lineitem")
    back.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy(col("l_returnflag"))
  }

  /** ORC roundtrip of the events feed (µs timestamps and the
    * JSON-in-string props column), checked per type per day. */
  def orcEventsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.GraftCaches.trackTempDir("graft_orc_")
    Tables.events(spark, dir).write.mode("overwrite").orc(s"$work/events")
    val back = spark.read.orc(s"$work/events")
    back.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // sub-second micros only: exactly the component a lossy
        // format truncates, and overflow-safe to ~9e12 rows (a full
        // unix_micros sum blows past Long at ~5e3 rows)
        sum(unix_micros(col("ts")) % 1000000L).as("submicro_sum"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        sum(expr(md5Prefix("props"))).as("props_checksum"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .orderBy(col("event_type"))
  }

  /** DuckDB oracles — the identical aggregates over the ORIGINAL
    * parquet: equality ⟺ the roundtrip lost nothing. */
  val jsonlDocsRoundtripOracleSql: String =
    """SELECT source, count(*) AS n_docs,
      |       CAST(sum(length(text)) AS BIGINT) AS sum_len,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)) AS BIGINT) AS text_checksum
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  val csvLineitemRoundtripOracleSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |       sum(l_quantity) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_price,
      |       min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val orcEventsRoundtripOracleSql: String =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(epoch_us(CAST(ts AS TIMESTAMP)) % 1000000) AS BIGINT) AS submicro_sum,
      |       min(CAST(ts AS TIMESTAMP)) AS min_ts, max(CAST(ts AS TIMESTAMP)) AS max_ts,
      |       CAST(sum(CAST('0x' || substr(md5(props), 1, 8) AS BIGINT)) AS BIGINT) AS props_checksum,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
}
