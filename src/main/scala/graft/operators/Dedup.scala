package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Near-duplicate detection at scale: MinHash+LSH and SimHash.
  *
  * Both operators follow the same scale-safe shape: per-document
  * fingerprints are computed map-side (one scan, codegen'd array
  * expressions), candidate generation is a shuffle on short bucket
  * keys (never the text), and only candidate pairs are verified
  * exactly. Nothing here is O(n²) in the corpus — that's the whole
  * point versus TextOps.wordJaccardPairs (the exact, blocked
  * baseline).
  */
object Dedup {

  /** 3-word shingles of the document, as an array<string> column. */
  private val shingleExpr =
    """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
      |  i -> concat_ws(' ', slice(split(text, ' '), i, 3)))""".stripMargin

  /** MinHash + banded LSH near-dup pairs (Broder 1997).
    *
    * sig[p] = min over shingles s of xxhash64(s, p), p = 0..63;
    * 16 bands x 4 rows: docs sharing any band hash become candidate
    * pairs; candidates are confirmed with exact shingle-set Jaccard.
    * P(candidate | j) = 1 - (1 - j^4)^16 — steep around j ~ 0.55.
    */
  def minHashLsh(spark: SparkSession, dir: String, threshold: Double = 0.5,
                 bands: Int = 16, rows: Int = 4): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", expr(shingleExpr).as("shingles"))
      .withColumn("sig", expr(
        s"transform(sequence(0, ${bands * rows - 1}), p -> array_min(transform(shingles, s -> xxhash64(s, p))))"))

    val banded = docs
      .select($"doc_id", $"shingles", posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $rows + 1, $rows)))")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    val a = banded.select($"doc_id".as("id_a"), $"shingles".as("sh_a"), $"band", $"band_hash")
    val b = banded.select($"doc_id".as("id_b"), $"shingles".as("sh_b"), $"band", $"band_hash")
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"sh_a", $"sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("da", array_distinct($"sh_a"))
      .withColumn("db", array_distinct($"sh_b"))
      .withColumn("inter", size(array_intersect($"da", $"db")))
      .withColumn("jaccard",
        round($"inter".cast("double") / (size($"da") + size($"db") - $"inter"), 4))
      .filter($"jaccard" >= threshold)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** SimHash near-dup candidates (Charikar 2002 / Manku et al. 2007).
    *
    * 64-bit SimHash over tokens via the native expression; the
    * fingerprint is split into 4 16-bit chunks — two docs within
    * Hamming distance 3 must agree on at least one chunk (pigeonhole),
    * so an equi-join per chunk finds all of them without a cross
    * join. Pairs are then filtered by exact Hamming distance.
    */
  def simHashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val chunks = 4
    val docs = Tables.documents(spark, dir)
      .select($"doc_id",
        call_function("graft_simhash64", split($"text", " ")).as("sim"))

    val chunked = docs.select($"doc_id", $"sim",
        posexplode(expr(s"transform(sequence(0, ${chunks - 1}), c -> (sim >> (c * 16)) & 65535)")))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")

    val a = chunked.select($"doc_id".as("id_a"), $"sim".as("sim_a"), $"chunk", $"chunk_val")
    val b = chunked.select($"doc_id".as("id_b"), $"sim".as("sim_b"), $"chunk", $"chunk_val")
    a.join(b, Seq("chunk", "chunk_val"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"sim_a", $"sim_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count($"sim_a".bitwiseXOR($"sim_b")).cast("long"))
      .filter($"hamming" <= maxHamming)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }
}
