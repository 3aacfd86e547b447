package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Structured Streaming source/sink plumbing for the engagement
  * pipeline.
  *
  * The reference ingests an upsert-kafka changelog
  * (`/root/reference/src/ingest.py:35-52`); in this sandbox the
  * stream is replayed from the same parquet files the batch operators
  * read (`readStream` file source), which upgrades the reference's
  * processing-time semantics to deterministic event time. The Kafka
  * surface is kept as config builders in [[KafkaConfig]] (the
  * connector jars are absent here).
  *
  * Everything runs with `Trigger.AvailableNow` — process all
  * available input as a sequence of micro-batches, then stop — so
  * tests and the driver's correctness gate are deterministic while
  * the exact same code runs unbounded in production.
  */
object StreamSources {

  private val nameCtr = new AtomicInteger(0)

  /** The events table as an unbounded stream. Same schema-adaptive ts
    * normalization as [[graft.sources.Tables.events]]; the schema is
    * taken from a metadata-only batch read (file-source streams
    * require an explicit schema). `maxFilesPerTrigger` bounds each
    * micro-batch so multi-file inputs exercise real incremental
    * processing. */
  def events(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 0): DataFrame =
    eventsFrom(spark, s"$dir/events.parquet", maxFilesPerTrigger)

  /** Same as [[events]] but over an arbitrary events-shaped parquet
    * path (used by specs/queries that stage multi-file or
    * sentinel-augmented inputs). `extraCols` carries staged
    * changelog columns (e.g. the CDC `op` row-kind) through the
    * projection. */
  def eventsFrom(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 0,
                 extraCols: Seq[String] = Nil): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    var reader = spark.readStream.schema(schema)
    if (maxFilesPerTrigger > 0)
      reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    // For a non-glob path the file source injects basePath = the path
    // itself, which partition discovery rejects when it is a single
    // FILE. Turning the last character into a trivial one-char glob
    // ([x]) keeps the match identical while routing around that
    // injection.
    val streamPath =
      if (new java.io.File(path).isFile) s"${path.init}[${path.last}]" else path
    graft.sources.Tables.normalizeTs(reader.parquet(streamPath))
      .select((Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        ++ extraCols).map(col): _*)
  }

  /** The events table as a JSON-LINES file stream — the OTHER wire
    * format a deployment tails (the reference's Kafka payloads are
    * JSON lines; this is the same decode path minus the broker). The
    * table is staged once per temp dir with a µs-pinned
    * timestampFormat (Spark's default truncates to millis — the
    * [[graft.sources.Formats]] hazard) and read back through
    * `readStream.json` with an explicit schema — schema inference on
    * a stream is not even allowed, which is the production-correct
    * default. */
  def eventsJsonl(spark: SparkSession, dir: String, nFiles: Int = 4,
                  maxFilesPerTrigger: Int = 1): DataFrame = {
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val work = graft.GraftCaches.trackTempDir("graft_jsonlsrc_")
    graft.sources.Tables.events(spark, dir).repartition(nFiles)
      .write.mode("overwrite").option("timestampFormat", tsFmt)
      .json(s"$work/events")
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("timestampFormat", tsFmt)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(s"$work/events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  /** The documents table as an unbounded stream (no timestamp
    * normalization needed — the table has no nanos column); same
    * schema-from-batch-read and single-file-glob routing as
    * [[eventsFrom]]. */
  def documents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    var reader = spark.readStream.schema(schema)
    if (maxFilesPerTrigger > 0)
      reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    val streamPath =
      if (new java.io.File(path).isFile) s"${path.init}[${path.last}]" else path
    reader.parquet(streamPath)
  }

  /** Any parquet table as an unbounded stream (no normalization) —
    * same schema-from-batch-read and single-file-glob routing as
    * [[eventsFrom]]; used for staged embeddings replays. */
  def parquetStream(spark: SparkSession, path: String,
                    maxFilesPerTrigger: Int = 0): DataFrame = {
    val schema = spark.read.parquet(path).schema
    var reader = spark.readStream.schema(schema)
    if (maxFilesPerTrigger > 0)
      reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    val streamPath =
      if (new java.io.File(path).isFile) s"${path.init}[${path.last}]" else path
    reader.parquet(streamPath)
  }

  /** Shuffle/state partition count captured by a starting streaming
    * query. The replayed micro-batches here are small, and every
    * stateful operator creates one state store (plus per-batch commit
    * files) PER partition — at the session default of 32 that is pure
    * task/commit overhead. Scoped down around query start and
    * restored after; a deployment sizes this to its cluster (the
    * value is baked into a real checkpoint). */
  private def withStreamPartitions[A](df: DataFrame)(f: => A): A = {
    val spark = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    try f finally spark.conf.set(key, prev)
  }

  /** Drive a streaming DataFrame to completion (AvailableNow) into an
    * in-process memory sink and return the materialized result. The
    * memory sink holds only the (small) query result, never the
    * input. */
  def runToMemory(df: DataFrame, mode: OutputMode): DataFrame =
    runToMemoryWithProgress(df, mode)._1

  /** [[runToMemory]] plus the terminated query's progress history —
    * lets specs assert state-store behavior (rows kept/evicted, late
    * rows dropped) from `stateOperators` metrics. */
  def runToMemoryWithProgress(df: DataFrame, mode: OutputMode)
      : (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) =
    withStreamPartitions(df) {
      val name = s"graft_stream_${nameCtr.incrementAndGet()}"
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (df.sparkSession.table(name), q.recentProgress.toSeq)
    }

  /** Drive a stream through `foreachBatch` to completion. */
  def runForeachBatch(df: DataFrame, f: (Dataset[Row], Long) => Unit): Unit =
    withStreamPartitions(df) {
      val q = df.writeStream
        .foreachBatch(f)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
}
