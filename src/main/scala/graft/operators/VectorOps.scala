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

  /** IVF-style approximate top-k: corpus vectors are assigned to
    * their nearest coarse centroid cell ([[graft.functions.IvfAssign]],
    * hash-derived training-free centroids — swap in k-means cells in
    * production, the plumbing is identical); each query probes its
    * `nProbe` nearest cells ([[graft.functions.IvfProbe]]) and
    * re-ranks exactly within them. The complementary ANN shape to
    * [[annLshTopK]]: cells partition the corpus (1 row per vector —
    * no explode), probes fan out only on the tiny broadcast query
    * side. Approximate (rows-only oracle); recall vs [[annTopK]]
    * measured in the spec. */
  def annIvfTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
                 nCells: Int = 16, nProbe: Int = 4, seed: Long = 7L): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val corpus = e.filter($"vec_id" >= nQueries)
      .withColumn("cell", call_function("graft_ivf_assign", $"embedding", lit(seed), lit(nCells)))
    val queries = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        explode(call_function("graft_ivf_probe", $"embedding", lit(seed), lit(nCells), lit(nProbe)))
          .as("cell"))
    corpus.join(broadcast(queries), Seq("cell"))
      .select($"query_id", $"vec_id", cosine($"q_emb", $"embedding").as("cos"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** LSH-bucketed approximate top-k: random-hyperplane signatures
    * ([[graft.functions.HyperplaneSignature]], codegen'd, planes
    * derived from the seed — no materialized plane matrix, no
    * driver-side action, constant plan size at any embedding dim) →
    * bucket join → exact re-rank within candidates.
    *
    * Standard OR-amplified construction: `nTables` independent hash
    * tables (seeds seed..seed+nTables-1); a corpus vector is a
    * candidate if it shares a bucket with the query in ANY table.
    * Each query additionally probes the nPlanes buckets at Hamming
    * distance 1 per table (multi-probe). All fan-out lives on the
    * tiny broadcast query side plus a narrow corpus explode — the
    * corpus is never shuffled; only (query_id, vec_id, cos)
    * candidate triples go through the dedup + top-k exchange.
    * Approximate by construction (rows-only oracle); recall measured
    * in the spec against annTopK. */
  def annLshTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
                 nPlanes: Int = 8, nTables: Int = 4, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    def sig(t: Int): Column =
      call_function("graft_hyperplane_sig", $"embedding", lit(seed + t), lit(nPlanes))
    val withBuckets = e.select($"vec_id" +: $"embedding" +:
      (0 until nTables).map(t => sig(t).as(s"b$t")): _*)

    val corpus = withBuckets.filter($"vec_id" >= nQueries)
      .select($"vec_id", $"embedding", explode(array(
        (0 until nTables).map(t => struct(lit(t).as("tbl"), col(s"b$t").as("bucket"))): _*)).as("tb"))
      .select($"vec_id", $"embedding", $"tb.tbl".as("tbl"), $"tb.bucket".as("bucket"))

    val probes = for (t <- 0 until nTables; j <- 0 to nPlanes) yield {
      val b = if (j == 0) col(s"b$t") else col(s"b$t").bitwiseXOR(lit(1 << (j - 1)))
      struct(lit(t).as("tbl"), b.as("bucket"))
    }
    val queries = withBuckets.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        explode(array(probes: _*)).as("tb"))
      .select($"query_id", $"q_emb", $"tb.tbl".as("tbl"), $"tb.bucket".as("bucket"))

    corpus.join(broadcast(queries), Seq("tbl", "bucket"))
      .select($"query_id", $"vec_id",
        cosine($"q_emb", $"embedding").as("cos"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", round($"cos", 4).as("cosine"))
      .orderBy($"query_id", $"rank")
  }
}
