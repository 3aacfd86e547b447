package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the scale-curve validation
  * (round-5 verdict task 2): clones the driver's sf0.1
  * events/documents/embeddings tables `copies`× into a larger slice
  * with the SAME per-key densities, so measured runtimes isolate the
  * data-volume axis.
  *
  * `runMain graft.ScaleGen <srcDir> <outDir> [copies=10]`
  *
  * Copy 0 is the identity (ids, text, vectors unchanged — so
  * fixed-query-set operators like the ANN family keep their query
  * rows); copies 1..n-1 are disjoint:
  *  - events: event_id/user_id shifted per copy (disjoint users keep
  *    sessions-per-user and events-per-session constant — growth adds
  *    users, the realistic axis); item ids in `props` shifted per
  *    copy so the item graph grows in nodes, not edge weight; `ts`
  *    kept — 10× traffic in the same window, so window/session state
  *    sizes scale with input as they would in production.
  *  - documents: doc_id shifted; every token suffixed `_c<copy>` so
  *    copies are token-disjoint — posting lists and block structure
  *    per copy match the original (near-dup work scales linearly
  *    with the corpus instead of manufacturing cross-copy duplicate
  *    pairs that no real 10× corpus would contain); `source` is KEPT
  *    (blocks genuinely grow 10× — the hazard the prefix filter is
  *    there to absorb).
  *  - embeddings: vec_id shifted; vector rotated by `copy` positions
  *    (norm-preserving, deterministic, directionally distinct).
  *
  * events.ts is written back as raw int64 nanos — the same physical
  * shape the driver's tables use, so [[graft.sources.Tables.events]]
  * and the streaming readers treat the scaled slice identically.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale10"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._

    val shift = 10000000L // id namespace per copy, far above any base id
    def withCopies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(copies).select($"id".cast("long").as("copy")))

    // events: ts passes through in the source file's own encoding
    // (int64 nanos or timestamp) — readers normalize via Tables.normalizeTs
    val ev = spark.read.parquet(s"$src/events.parquet")
    withCopies(ev).select(
      ($"event_id" + $"copy" * shift).as("event_id"),
      $"ts",
      ($"user_id" + $"copy" * shift).as("user_id"),
      $"event_type", $"value",
      concat(lit("{\"k\": "),
        (get_json_object($"props", "$.k").cast("long") + $"copy" * 1000L).cast("string"),
        lit("}")).as("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    withCopies(docs).select(
      ($"doc_id" + $"copy" * shift).as("doc_id"),
      when($"copy" === 0, $"text").otherwise(
        array_join(transform(split($"text", " "),
          t => concat(t, lit("_c"), $"copy".cast("string"))), " ")).as("text"),
      $"lang", $"source")
      .withColumn("n_chars", length($"text"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    withCopies(emb).select(
      ($"vec_id" + $"copy" * shift).as("vec_id"),
      when($"copy" === 0, $"embedding").otherwise(concat(
        slice($"embedding", ($"copy" % size($"embedding")) + 1,
          size($"embedding") - ($"copy" % size($"embedding"))),
        slice($"embedding", lit(1), $"copy" % size($"embedding")))).as("embedding"),
      $"label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // lineitem (round-8: the interval-coalesce fact): keys shifted per
    // copy — disjoint suppliers/orders keep per-supplier interval
    // density constant, so growth adds suppliers (the realistic axis);
    // dates/quantities kept so island structure per supplier matches
    // the original.
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    withCopies(li).select(
      ($"l_orderkey" + $"copy" * shift).as("l_orderkey"),
      ($"l_partkey" + $"copy" * shift).as("l_partkey"),
      ($"l_suppkey" + $"copy" * shift).as("l_suppkey"),
      $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount",
      $"l_tax", $"l_returnflag", $"l_linestatus", $"l_shipdate")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // orders (round-8: the as-of-join dimension): o_custkey shifted by
    // the SAME per-copy offset as events.user_id, so every cloned
    // user keeps an order timeline with the original's density.
    val ord = spark.read.parquet(s"$src/orders.parquet")
    withCopies(ord).select(
      ($"o_orderkey" + $"copy" * shift).as("o_orderkey"),
      ($"o_custkey" + $"copy" * shift).as("o_custkey"),
      $"o_orderstatus", $"o_totalprice", $"o_orderdate", $"o_orderpriority")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    Seq("events", "documents", "embeddings", "lineitem", "orders").foreach { t =>
      println(s"$t: " + spark.read.parquet(s"$out/$t.parquet").count())
    }
    spark.stop()
  }
}
