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

  /** Reference Levenshtein for the property check below. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("edit-distance join finds every randomly edited pair (pigeonhole soundness)") {
    // The PassJoin segment arithmetic (variable-length boundaries,
    // shifted windows, tiny bucket) is exactly the kind of fiddly
    // index math an off-by-one silently breaks: fuzz it. Each planted
    // pair is a random-length base string plus a partner mutated by
    // <= k random edits; every pair whose PREFIX distance is <= k
    // must appear in the output (supersets are fine - other random
    // pairs may genuinely be close).
    val spark = TestSession.spark
    import spark.implicits._
    val rnd = new Random(20260813L)
    val k = 3
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val planted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, String)]
    for (i <- 0 until 60) {
      val len = 1 + rnd.nextInt(80)
      val base = String.valueOf(Array.fill(len)(('a' + rnd.nextInt(26)).toChar))
      val nEdits = rnd.nextInt(k + 1)
      var part = base
      for (_ <- 0 until nEdits if part.nonEmpty) rnd.nextInt(3) match {
        case 0 => val p = rnd.nextInt(part.length) // substitute
          part = part.updated(p, ('a' + rnd.nextInt(26)).toChar)
        case 1 => val p = rnd.nextInt(part.length + 1) // insert
          part = part.substring(0, p) + ('a' + rnd.nextInt(26)).toChar + part.substring(p)
        case 2 => val p = rnd.nextInt(part.length) // delete
          part = part.substring(0, p) + part.substring(p + 1)
      }
      val (idA, idB) = (2L * i, 2L * i + 1)
      docs += ((idA, base)); docs += ((idB, part))
      planted += ((idA, idB, base, part))
    }
    val out = graft.operators.TextOps
      .editDistanceTransform(docs.toSeq.toDF("doc_id", "text"), k = k, prefixLen = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    planted.foreach { case (idA, idB, base, part) =>
      val d = lev(base.take(64), part.take(64))
      if (d <= k)
        assert(out.contains((idA, idB)),
          s"missed pair ($idA,$idB) dist=$d base='$base' part='$part'")
    }
  }
}
