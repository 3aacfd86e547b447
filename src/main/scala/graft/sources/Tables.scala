package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the graft test corpus (TPC-H-ish star schema plus an
  * `events` stream table and LLM-pipeline `documents`/`embeddings`).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets full
  * pushdown/pruning; parquet is self-describing so there is no schema
  * inference cost. Callers should `.select` only what they need —
  * the scan then prunes columns at the reader level.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` has shipped in more than one parquet encoding across
    * testdata generations: TIMESTAMP(NANOS) (which Spark's reader
    * rejects unless read as raw int64 via the legacy nanosAsLong
    * flag), TIMESTAMP(MICROS) not adjusted to UTC (read as
    * TIMESTAMP_NTZ), or a plain UTC-adjusted timestamp. [[normalizeTs]]
    * folds all of them to the session `TimestampType` at microsecond
    * precision — the same truncation DuckDB applies casting
    * TIMESTAMP_NS to TIMESTAMP, and value-preserving for NTZ because
    * every graft session pins `spark.sql.session.timeZone=UTC`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(apply(s, d, "events"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  /** Schema-adaptive timestamp normalization (see [[events]]). Works
    * on batch and streaming frames alike — the dispatch is on the
    * analyzed schema, not the data. */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` div 1000")))
      case TimestampType => df
      case _ => // TIMESTAMP_NTZ (and anything else castable)
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
    }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** JDBC dimension loader — the analog of the reference's Postgres
    * lookup dim (`process.py:145-160`, a JDBC catalog table joined
    * against the changelog stream). Any dim the RDBMS holds loads
    * through here and drops into [[graft.operators.Engagement
    * .enrichTransform]] unchanged; Spark's JDBC source pushes filters
    * and prunes columns at the database, and a small dim arrives in
    * one round trip and broadcasts like the parquet one.
    *
    * `partitionOn` (column, lower, upper, n) splits the read into n
    * range-parallel queries — how a LARGE dim (or fact) table comes
    * over JDBC without serializing through one connection. */
  def dimJdbc(s: SparkSession, url: String, table: String,
              props: java.util.Properties = new java.util.Properties(),
              partitionOn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val r = s.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withParts = partitionOn.fold(r) { case (colName, lo, hi, n) =>
      r.option("partitionColumn", colName)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
    }
    props.stringPropertyNames().forEach(k => withParts.option(k, props.getProperty(k)))
    withParts.load()
  }
}
