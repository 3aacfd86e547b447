package graft.streaming

import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Engagement

/** HTTP external sink — the reference's third fan-out destination
  * (`/root/reference/src/process.py:93-110` HttpSink → the 17-line
  * echo server in `mock_external.py`) expressed as a PHYSICAL
  * route: events actually leave the JVM over a loopback socket, are
  * consumed by an external-process stand-in, and the per-route
  * counts the correctness gate checks are read back FROM the
  * consumer — closing the one reference sink that previously never
  * crossed a socket (round-9 verdict task 4; the JDBC MERGE sink
  * [[JdbcSink.streamRouterJdbc]] covers the warehouse analog).
  *
  * Delivery contract: `foreachBatch` is at-least-once — a crashed
  * micro-batch is REPLAYED, so the consumer must dedup on a stable
  * key exactly like the JDBC sink's keyed MERGE. The payload
  * therefore carries `event_id`, and [[CountingHttpServer]] applies
  * `putIfAbsent` per event — re-POSTing a batch changes nothing
  * (asserted by the replay spec in StreamingSpec).
  *
  * 100 TB shape: the ONLY data-volume path is the executor-side
  * `foreachPartition` POST loop — each partition ships its rows in
  * bounded-size batched requests (no driver hop, no shuffle beyond
  * the route tag projection), which is exactly how a fleet of
  * executors would feed a real HTTP ingest tier; endpoint fan-in is
  * the external service's own scaling problem (the reference's mock
  * makes the same assumption). The driver-side map in the mock
  * server is the CONSUMER's storage — the verification double for
  * the external system that owns the data in deployment — not a
  * Spark operator; its size is the mock's test scale, and the final
  * read-back re-aggregates through the same Spark expression tree as
  * `event_router` so fp-sum semantics match the shared oracle. */
object HttpSink {

  /** In-process stand-in for the reference's `mock_external.py`:
    * a JDK loopback HttpServer accepting `POST /ingest` with
    * tab-separated JSON-free lines `event_id \t route \t
    * doubleToLongBits(value)` (bit-exact round trip — no float
    * formatting drift between writer and reader). Dedups by
    * event_id; counts requests and lines for the delivery spec. */
  final class CountingHttpServer {
    private val received = new ConcurrentHashMap[Long, (String, Double)]()
    val postCount = new AtomicLong(0)
    val lineCount = new AtomicLong(0)

    // Parallel handler pool (partitions POST concurrently). Daemon
    // threads + explicit shutdown in stop(): HttpServer.stop() does
    // NOT shut down a user-supplied executor, and a non-daemon pool
    // would pin the JVM open after main returns.
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => { val t = new Thread(r, "graft-http-sink"); t.setDaemon(true); t })

    private val server = {
      val s = com.sun.net.httpserver.HttpServer.create(
        new InetSocketAddress("127.0.0.1", 0), 0)
      s.setExecutor(pool)
      s.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        var n = 0L
        body.linesIterator.filter(_.nonEmpty).foreach { line =>
          val Array(id, route, bits) = line.split('\t')
          received.putIfAbsent(id.toLong,
            (route, java.lang.Double.longBitsToDouble(bits.toLong)))
          n += 1
        }
        postCount.incrementAndGet()
        lineCount.addAndGet(n)
        val resp = s"ok:$n".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      })
      s.start()
      s
    }

    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/ingest"

    /** What the consumer accepted, as (event_id, route, value). */
    def delivered: Seq[(Long, String, Double)] = {
      import scala.jdk.CollectionConverters._
      received.asScala.iterator.map { case (id, (r, v)) => (id, r, v) }.toSeq
    }

    def deliveredCount: Long = received.size().toLong

    def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }
  }

  /** Executor-side delivery of one partition: rows ship in batched
    * POSTs of ≤ `chunk` lines (bounds request size independently of
    * partition size). Static so the closure serializes cleanly to
    * executors; a failed POST throws → the task retries → the
    * consumer's event_id dedup absorbs the replay. */
  private[graft] def postPartition(url: String, rows: Iterator[Row],
                                       chunk: Int = 10000): Unit =
    rows.grouped(chunk).foreach { group =>
      val body = group.iterator.map { r =>
        s"${r.getLong(0)}\t${r.getString(1)}\t${java.lang.Double.doubleToLongBits(r.getDouble(2))}"
      }.mkString("\n")
      val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.getBytes(StandardCharsets.UTF_8).length)
      val out = conn.getOutputStream
      try { out.write(body.getBytes(StandardCharsets.UTF_8)); out.flush() }
      finally out.close()
      val rc = conn.getResponseCode
      // Drain the right stream for the status: getInputStream throws
      // IOException for >=400 responses, which would preempt the
      // descriptive error below (the task still failed + retried, but
      // with the JDK's message instead of ours).
      val drain = if (rc >= 400) conn.getErrorStream else conn.getInputStream
      if (drain != null) try drain.readAllBytes() finally drain.close()
      conn.disconnect()
      if (rc != 200) sys.error(s"http sink POST failed: $rc")
    }

  /** POST one (already route-tagged) micro-batch to the endpoint,
    * partition-parallel. */
  private[graft] def postRouted(routed: DataFrame, url: String): Unit =
    routed.select(col("event_id"), col("route"), col("value"))
      .foreachPartition((it: Iterator[Row]) => postPartition(url, it))

  /** SURVEY §2 #10d'': [[EngagementStream.streamRouter]]'s
    * external-API face — the events stream runs through
    * `foreachBatch`, each micro-batch is route-tagged and POSTed over
    * a real socket to the loopback consumer, and the per-route counts
    * are aggregated from what the CONSUMER accepted, through the same
    * Spark expression tree as `event_router` (shared oracle).
    *
    * LOCAL-MODE-ONLY as registered: the mock consumer binds
    * 127.0.0.1 in the driver JVM and the read-back comes from its
    * in-process map, so executors must share the driver host. That is
    * the TEST harness for the sink protocol, mirroring the
    * reference's own mock_external.py. In deployment the endpoint is
    * a routable URL owned by the external service and the read-back
    * is that service's query API — only [[postPartition]] /
    * [[postRouted]] (the executor-side delivery path, which has no
    * driver affinity) ship as-is. */
  def streamRouterHttp(spark: SparkSession, dir: String): DataFrame = {
    val server = new CountingHttpServer()
    try {
      val events = StreamSources.events(spark, dir)
      StreamSources.runForeachBatch(events, (batch, _) => {
        val routed = batch.withColumn("route", Engagement.routeExpr(col("event_type")))
        postRouted(routed, server.url)
      })
      import spark.implicits._
      server.delivered.toDF("event_id", "route", "value")
        .groupBy(col("route"))
        .agg(count("*").as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("route"))
    } finally server.stop()
  }
}
