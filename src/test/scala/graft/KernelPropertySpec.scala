package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Randomized-property checks for the hand-written kernels: the
  * bounded top-k heap and the sorted-merge intersect must agree with
  * their obvious specification on ARBITRARY inputs, not just the
  * synthetic corpus — these are the pieces of imperative logic a
  * fuzzer can meaningfully attack (everything else is declarative
  * Catalyst). Seeded RNG → deterministic CI. */
class KernelPropertySpec extends AnyFunSuite {

  private def entries(rnd: Random, n: Int): List[(Double, Long)] =
    List.fill(n)((math.floor(rnd.nextDouble() * 200 - 100) / 2, // ties likely
      rnd.nextInt(50).toLong))

  test("TopKBuffer equals sort-and-take for arbitrary inserts and merges") {
    val rnd = new Random(20260812L)
    (1 to 300).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val xs = entries(rnd, rnd.nextInt(40))
      val ys = entries(rnd, rnd.nextInt(40))
      val a = new graft.functions.TopKBuffer(k)
      xs.foreach { case (s, id) => a.insert(s, id) }
      val b = new graft.functions.TopKBuffer(k)
      ys.foreach { case (s, id) => b.insert(s, id) }
      a.mergeFrom(b)
      val want = (xs ++ ys)
        .sortWith((p, q) => if (p._1 != q._1) p._1 > q._1 else p._2 < q._2)
        .take(k)
      assert(a.sortedBestFirst.toList == want, s"k=$k xs=$xs ys=$ys")
      // and eval stays repeatable (the window-frame contract)
      assert(a.sortedBestFirst.toList == want)
    }
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val rnd = new Random(42L)
    val agg = graft.functions.BoundedTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0d),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 8)
    (1 to 200).foreach { _ =>
      val buf = new graft.functions.TopKBuffer(8)
      entries(rnd, rnd.nextInt(30)).foreach { case (s, id) => buf.insert(s, id) }
      val back = agg.deserialize(agg.serialize(buf))
      assert(back.sortedBestFirst.toList == buf.sortedBestFirst.toList)
    }
  }

  test("sorted-merge intersect equals set intersection for arbitrary token sets") {
    import TestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new Random(7L)
    // one Spark job over many generated cases (per-case jobs would
    // dominate the suite's runtime)
    val cases = List.fill(200) {
      def side() = List.fill(rnd.nextInt(25))(s"t${rnd.nextInt(40)}").distinct.sorted
      (side(), side())
    }
    val got = cases.toDF("a", "b")
      .select(call_function("graft_sorted_intersect_size", col("a"), col("b")))
      .collect().map(_.get(0).asInstanceOf[Number].intValue).toList
    val want = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got == want)
  }
}
