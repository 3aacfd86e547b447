package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Engagement
import graft.sources.Tables

/** JDBC write sink — the deployable-warehouse half of the reference's
  * multi-sink fan-out that IS reachable in this sandbox. The
  * reference's ClickHouse sink (`/root/reference/src/process.py:43-75`)
  * POSTs each record batch as JSONEachRow into a table keyed by
  * event id; here the same contract — "each micro-batch lands exactly
  * once in an external RDBMS, and a replayed batch must not double
  * apply" — is expressed as a staging-table MERGE through Spark's JDBC
  * writer, driven per micro-batch from `foreachBatch`.
  *
  * Why staging + MERGE and not a plain `mode("append")`:
  * `foreachBatch` guarantees at-least-once — after a crash the last
  * un-committed batch is REPLAYED, so an append sink double-counts
  * exactly the rows a verdict would care about. The upsert path is
  * idempotent by construction: replaying batch N re-stages the same
  * rows and the MERGE updates them to the values they already have.
  * (Same recovery contract as [[EngagementStream.LeaderboardState]],
  * but enforced by the database's keyed MERGE instead of a batch-id
  * high-water mark — this is the shape that works when the sink is
  * shared with writers outside this job.)
  *
  * 100 TB shape: the staging write is the only data-volume path and it
  * is executor-parallel (`numPartitions` JDBC connections, batched
  * inserts); the MERGE is one set-based statement executed inside the
  * database, where a warehouse-grade target (ClickHouse
  * ReplacingMergeTree, Postgres `INSERT .. ON CONFLICT`) does keyed
  * upserts at bulk-load speed. Derby (on Spark's classpath) plays the
  * external RDBMS here exactly as in [[Tables.dimJdbc]]'s read spec.
  */
object JdbcSink {

  /** Quote an identifier the way Spark's JDBC dialect writes it
    * (double-quoted, case preserved). */
  private def q(id: String): String = "\"" + id + "\""

  private def withConn[A](url: String)(f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, table, null)
    try rs.next() finally rs.close()
  }

  /** Idempotently upsert one micro-batch into `table` keyed by
    * `keyCols`:
    *
    *  1. stage the batch via the parallel Spark JDBC writer
    *     (overwrite: a replayed batch re-stages cleanly),
    *  2. first batch: create the target from the staging schema
    *     (`WITH NO DATA`) + an index on the key (MERGE probes it
    *     per staged row),
    *  3. one atomic `MERGE INTO target USING stage ON keys` —
    *     matched rows update, new rows insert.
    *
    * Crash anywhere: re-running the batch reproduces the same target
    * state (stage overwrite + keyed MERGE are both idempotent) —
    * asserted by the replay spec in StreamingSpec.
    */
  def upsertBatch(batch: DataFrame, url: String, table: String,
                  keyCols: Seq[String], numPartitions: Int = 4): Unit = {
    val stage = s"${table}_stage"
    val cols = batch.schema.fieldNames.toSeq
    batch.coalesce(numPartitions).write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", q(stage))
      .option("batchsize", "10000")
      .option("truncate", "true")
      .mode("overwrite")
      .save()
    withConn(url) { conn =>
      val st = conn.createStatement()
      if (!tableExists(conn, table)) {
        st.execute(s"CREATE TABLE ${q(table)} AS SELECT * FROM ${q(stage)} WITH NO DATA")
        st.execute(s"CREATE INDEX ${q(table + "_key_idx")} ON ${q(table)} " +
          keyCols.map(q).mkString("(", ", ", ")"))
      }
      val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val nonKey = cols.filterNot(keyCols.contains)
      val setClause = nonKey.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val insertCols = cols.map(q).mkString(", ")
      val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
      val matched =
        if (nonKey.isEmpty) "" else s" WHEN MATCHED THEN UPDATE SET $setClause"
      st.execute(
        s"MERGE INTO ${q(table)} t USING ${q(stage)} s ON $on" + matched +
          s" WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)")
      st.close()
    }
  }

  /** Drop an in-memory Derby database (frees its heap). Derby signals
    * a successful drop with SQLException 08006 — swallowed. */
  def dropInMemoryDb(name: String): Unit =
    try {
      java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$name;drop=true")
      ()
    } catch { case _: java.sql.SQLException => () }

  private val dbCtr = new AtomicInteger(0)

  /** SURVEY §2 #10e: [[EngagementStream.streamRouter]] with the
    * warehouse sink deployed for real — the events stream runs through
    * `foreachBatch`, each micro-batch is route-tagged and MERGEd into
    * a JDBC table keyed by `event_id`, and the per-route counts are
    * read BACK through [[Tables.dimJdbc]] and aggregated by the same
    * Spark code path as `event_router` (so fp-sum semantics match the
    * shared oracle). The final collect is route-cardinality (4 rows) —
    * planning-scale — taken so the in-memory Derby db can be dropped
    * before returning; the result ships as a local DataFrame. */
  def streamRouterJdbc(spark: SparkSession, dir: String): DataFrame = {
    val db = s"graft_router_${dbCtr.incrementAndGet()}"
    val url = s"jdbc:derby:memory:$db;create=true"
    val events = StreamSources.events(spark, dir)
    StreamSources.runForeachBatch(events, (batch, _) => {
      val routed = batch.withColumn("route", Engagement.routeExpr(col("event_type")))
      upsertBatch(routed, url, "events_routed", Seq("event_id"))
    })
    val agg = Tables.dimJdbc(spark, url, q("events_routed"))
      .groupBy(col("route"))
      .agg(count("*").as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("route"))
    val rows = agg.collect()
    val out = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), agg.schema)
    dropInMemoryDb(db)
    out
  }
}
