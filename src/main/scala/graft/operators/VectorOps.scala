package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Embedding similarity operators over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * The cosine kernel is a native Catalyst expression
  * ([[graft.functions.CosineSimilarity]]) with codegen — the O(n·m)
  * comparison loops run unboxed inside whole-stage codegen.
  *
  * Scale story: the exact variants are the correctness baseline
  * (quadratic, usable to ~10⁵ vectors per block); the LSH variant is
  * the 100 TB path — random-hyperplane bucketing turns the cross
  * join into per-bucket joins, trading recall for a ~bucket-count
  * speedup, and re-ranking candidates exactly.
  */
object VectorOps {

  private def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Exact embedding near-duplicate pairs: all (a, b) with
    * cosine >= threshold. */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val a = e.alias("a")
    val b = e.alias("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.embedding"), col("b.embedding")))
      .filter($"cos" >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round($"cos", 4).as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** Brute-force cosine top-k neighbors for a query set — the exact
    * ANN baseline. Broadcast the (small) query side; the corpus
    * streams through codegen'd cosine + per-query top-k. */
  def annTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val corpus = e.filter($"vec_id" >= nQueries)
    corpus.join(broadcast(queries))
      .withColumn("cos", cosine($"q_emb", $"embedding"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Deterministic pseudo-random unit-free hyperplanes: plane p,
    * dim d → a fixed hash-derived value in [-1, 1). */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(42)
    Array.fill(nPlanes, dim)(rng.nextDouble() * 2 - 1)
  }

  /** LSH-bucketed approximate top-k: random-hyperplane signature →
    * bucket join → exact re-rank within candidates. The scale path:
    * each query compares against its bucket's corpus slice only.
    * Approximate by construction (rows-only oracle); recall measured
    * in the spec against annTopK. */
  def annLshTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
                 nPlanes: Int = 8): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val dim = e.select(size($"embedding")).first().getInt(0)
    val hp = planes(nPlanes, dim)

    // signature bit p = sign(dot(embedding, plane_p)); bucket = bits as int
    val sigBits = (0 until nPlanes).map { p =>
      val dot = (0 until dim).map { d =>
        element_at($"embedding", d + 1) * lit(hp(p)(d))
      }.reduce(_ + _)
      when(dot >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

    val bucketed = e.withColumn("bucket", sigBits)
    val queries = bucketed.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"), $"bucket")
    val corpus = bucketed.filter($"vec_id" >= nQueries)
    corpus.join(broadcast(queries), Seq("bucket"))
      .withColumn("cos", cosine($"q_emb", $"embedding"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }
}
