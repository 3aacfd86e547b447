package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-input behavior of the native expressions — empty arrays,
  * zero vectors, empty strings. The synthetic corpus never produces
  * these, so pin them here: a 100 TB crawl WILL contain empty and
  * degenerate documents, and the dedup/similarity pipeline must
  * degrade deterministically, not throw. */
class ExpressionEdgeSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  // zero leaked persisted blocks / temp dirs after `sbt test`
  override def afterAll(): Unit = GraftCaches.clearAll()

  import TestSession._

  test("screenBatch degrades deterministically on empty and degenerate batches") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dedup.screenBatch(spark, sf, empty).count() == 0)
    // empty text, single word, and whitespace-only docs must all get
    // verdicts (a 100 TB crawl WILL contain them), never throw
    val degenerate = Seq((900001L, ""), (900002L, "word"), (900003L, "   "))
      .toDF("doc_id", "text")
    val v = graft.operators.Dedup.screenBatch(spark, sf, degenerate)
      .orderBy(col("doc_id")).collect()
    assert(v.length == 3)
    assert(v.forall(r => Set("exact_dup", "near_dup", "unique")(r.getString(1))))
  }

  private def one(sqlText: String): Row = {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(sqlText).collect()(0)
  }

  test("cosine: zero vectors and empty arrays give 0.0, not NaN") {
    val r = one(
      """SELECT
        |  graft_cosine(array(cast(0.0 AS float), cast(0.0 AS float)),
        |               array(cast(1.0 AS float), cast(2.0 AS float))) AS zero_vec,
        |  graft_cosine(cast(array() AS array<float>), cast(array() AS array<float>)) AS empty,
        |  graft_cosine(array(cast(3.0 AS float)),
        |               array(cast(3.0 AS float), cast(9.0 AS float))) AS truncated
        |""".stripMargin)
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0) // shorter length wins: dot over dim 1
  }

  test("simhash: empty token array is the all-zero fingerprint") {
    val r = one("SELECT graft_simhash64(cast(array() AS array<string>)) AS s")
    assert(r.getLong(0) == 0L)
  }

  test("minhash: empty token array yields the identity signature (all Long.Max)") {
    val r = one("SELECT graft_minhash(cast(array() AS array<string>), 4) AS sig")
    assert(r.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
  }

  test("sorted intersect: empty, disjoint, and identical inputs") {
    val r = one(
      """SELECT
        |  graft_sorted_intersect_size(cast(array() AS array<string>), array('a')) AS e,
        |  graft_sorted_intersect_size(array('a', 'b'), array('c', 'd')) AS d,
        |  graft_sorted_intersect_size(array('a', 'b', 'c'), array('a', 'b', 'c')) AS i
        |""".stripMargin)
    assert(r.getInt(0) == 0 && r.getInt(1) == 0 && r.getInt(2) == 3)
  }

  test("doc fingerprint: empty array and empty-string tokens are defined") {
    val r = one(
      """SELECT
        |  graft_doc_fingerprint(cast(array() AS array<string>)) AS empty_arr,
        |  graft_doc_fingerprint(array('', '')) AS empty_toks
        |""".stripMargin)
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 0L) // zero chars, cp(first)=cp(last)=0
  }

  test("hyperplane signature: zero vector maps to the deterministic all-ones bucket") {
    val r = one(
      """SELECT graft_hyperplane_sig(array(cast(0.0 AS float), cast(0.0 AS float)), 42, 8) AS b""")
    assert(r.getInt(0) == 255) // dot == 0 ⇒ bit set, for every plane
  }

  test("ivf: zero vector assigns to cell 0 and probes cells in index order") {
    val r = one(
      """SELECT graft_ivf_assign(array(cast(0.0 AS float)), 7, 16) AS cell,
        |       graft_ivf_probe(array(cast(0.0 AS float)), 7, 16, 4) AS probes""".stripMargin)
    assert(r.getInt(0) == 0)
    assert(r.getSeq[Int](1) == Seq(0, 1, 2, 3))
  }

  test("graft_topk works in a window frame (eval called repeatedly on a live buffer)") {
    // the destructive-eval regression class: in a running window frame
    // Spark's AggregateProcessor calls eval() on the SAME buffer once
    // per row — a heap-draining eval returns the right answer for the
    // first row and empty arrays for every later one
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 2.0),
        ("b", 4L, 5.0), ("b", 5L, 4.0))
      .toDF("g", "id", "score").createOrReplaceTempView("topk_window_in")
    val rows = spark.sql(
      """SELECT g, id,
        |       graft_topk(score, id, 2) OVER (PARTITION BY g ORDER BY id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |FROM topk_window_in ORDER BY g, id""".stripMargin).collect()
    val running = rows.map(r => (r.getString(0), r.getLong(1),
      r.getSeq[Row](2).map(x => (x.getDouble(0), x.getLong(1))).toList))
    assert(running.toList == List(
      ("a", 1L, List((1.0, 1L))),
      ("a", 2L, List((3.0, 2L), (1.0, 1L))),
      ("a", 3L, List((3.0, 2L), (2.0, 3L))),
      ("b", 4L, List((5.0, 4L))),
      ("b", 5L, List((5.0, 4L), (4.0, 5L)))))
  }

  test("interpreted eval matches codegen for a non-trivial input") {
    // same expressions evaluated through a projection (codegen) and
    // via expression.eval (interpreted) must agree bit-for-bit
    import graft.functions._
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks = new GenericArrayData(
      Array[Any](UTF8String.fromString("alpha"), UTF8String.fromString("beta")))
    val interpSim = SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(
      toks, ArrayType(StringType))).eval(null).asInstanceOf[Long]
    val codegenSim = one("SELECT graft_simhash64(array('alpha', 'beta')) AS s").getLong(0)
    assert(interpSim == codegenSim)

    val interpFp = DocFingerprint(org.apache.spark.sql.catalyst.expressions.Literal(
      toks, ArrayType(StringType))).eval(null).asInstanceOf[Long]
    val codegenFp = one("SELECT graft_doc_fingerprint(array('alpha', 'beta')) AS s").getLong(0)
    assert(interpFp == codegenFp)
  }

  test("zorder: bit interleave is exact and masks out-of-range inputs") {
    val r = one(
      "SELECT graft_zorder(0L, 0L) AS a, graft_zorder(1L, 0L) AS b, " +
      "graft_zorder(0L, 1L) AS c, graft_zorder(65535L, 65535L) AS d, " +
      "graft_zorder(65536L, 0L) AS e, graft_zorder(3L, 5L) AS f")
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 1L)  // x takes the even bits
    assert(r.getLong(2) == 2L)  // y takes the odd bits
    assert(r.getLong(3) == 0xFFFFFFFFL)
    assert(r.getLong(4) == 0L)  // bit 16 masked: inputs are pre-scaled
    // x=0b011, y=0b101 -> z = y2x2 y1x1 y0x0 = 0b100111 = 39
    assert(r.getLong(5) == 39L)
    // kernel matches the expression (codegen) path
    assert(graft.functions.ZOrderKernel.interleave(3L, 5L) == 39L)
  }

  test("normalize_text: NFC composition, casefold, whitespace collapse, idempotence") {
    // U+0065 U+0301 (e + combining acute) must compose to U+00E9 then
    // casefold with the precomposed form; whitespace runs collapse;
    // ends trim
    val r = one(
      "SELECT graft_normalize_text('  Café  \t BAR\n') AS a, " +
      "graft_normalize_text('') AS b, " +
      "graft_normalize_text('   ') AS c, " +
      "graft_normalize_text('Café bar') AS d") // decomposed e + U+0301
    assert(r.getString(0) == "café bar")
    assert(r.getString(1) == "")
    assert(r.getString(2) == "")
    // precomposed and combining-mark spellings land on the SAME key
    assert(r.getString(3) == r.getString(0))
    // idempotent: re-normalizing clean text is a no-op
    val again = one("SELECT graft_normalize_text('café bar') AS x").getString(0)
    assert(again == r.getString(0))
    // interpreted eval agrees with codegen
    import graft.functions.NormalizeText
    import org.apache.spark.unsafe.types.UTF8String
    val interp = NormalizeText(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString("  Café  \t BAR\n"), StringType))
      .eval(null).asInstanceOf[UTF8String].toString
    assert(interp == r.getString(0))
  }
}
