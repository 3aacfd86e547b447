package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  val sf: String = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", cores = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class BatchOperatorsSpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("cdc_latest_by_key keeps exactly one row per user") {
    val df = SparkEntry.queries("cdc_latest_by_key")(spark, sf)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("session windows are well-formed") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("session_window_agg")(spark, sf)
    assert(df.filter(col("s_end") <= col("s_start")).count() == 0)
    assert(df.filter(col("n_events") <= 0).count() == 0)
  }

  test("leaderboard is ranked and ordered") {
    val rows = SparkEntry.queries("leaderboard_topn")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("hop windows double-count each event across 2 windows") {
    import org.apache.spark.sql.functions.sum
    val hop = SparkEntry.queries("hop_window_agg")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(hop == 2 * n)
  }

  test("salted join matches plain join") {
    val salted = SparkEntry.queries("skew_salted_join")(spark, sf).collect()
    val e = graft.sources.Tables.events(spark, sf)
    val c = graft.sources.Tables.customer(spark, sf)
    val plain = e.join(c, e("user_id") === c("c_custkey"))
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    salted.foreach { r => assert(plain(r.getString(0)) == r.getLong(1)) }
  }
}
