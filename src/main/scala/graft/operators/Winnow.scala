package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every k-gram, slide a
  * w-window over the hash sequence, keep each window's minimum —
  * the selection guarantees any shared run of ≥ w+k-1 tokens leaves
  * at least one shared fingerprint, at an expected density of
  * 2/(w+1). The local-match complement of [[Dedup]]'s whole-doc
  * MinHash (which bounds global Jaccard but can miss a single
  * copied passage) and of [[TextOps.docFingerprint]]'s rolling hash
  * (which fingerprints without the selection guarantee).
  *
  * Scale shape: gram/hash/window-min selection is all per-row array
  * arithmetic (zero shuffle); the pair stage explodes only the
  * SELECTED fingerprints (~2/(w+1) of grams), drops any fingerprint
  * seen in more than `maxDf` docs before the self-join — so the
  * per-fingerprint fan-out is capped at C(maxDf, 2) regardless of
  * corpus skew (the too-common-fingerprint drop MOSS itself applies)
  * — and joins on the fingerprint value, never all-pairs. Hashing is
  * the repo-standard md5-prefix integer, mirrored exactly in DuckDB.
  */
object Winnow {

  /** Per-doc selected fingerprints `(doc_id, fp)`, built as THREE
    * staged projections (hash array → selection array → explode):
    * each stage materializes its column once per row — inlining
    * `hashes` into the five places the selection expression reads it
    * would re-run the md5 gram scan per reference (the
    * normalizedEmbedding codegen lesson; first cut of this operator
    * paid 192 s at sf0.1 for exactly that, vs ~1 s of actual work). */
  private def hashTable(documents: DataFrame, k: Int): DataFrame = {
    val toks = split(col("text"), " ")
    // guard: Spark's sequence(1, 0) DESCENDS ([1,0]) instead of
    // returning empty like DuckDB's range — short docs must
    // short-circuit before the sequence is built
    val hashes = when(size(toks) < k, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => conv(substring(md5(array_join(slice(toks, i, lit(k)), " ")), 1, 8), 16, 10)
          .cast("long")))
    documents.select(col("doc_id"), hashes.as("h"))
  }

  private def selectFingerprints(hashed: DataFrame, w: Int): DataFrame = {
    val sel: Column =
      when(size(col("h")) === 0, array().cast("array<bigint>"))
        .when(size(col("h")) < w, array(array_min(col("h"))))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(col("h")) - (w - 1)),
          j => array_min(slice(col("h"), j, lit(w))))))
    hashed.select(col("doc_id"), sel.as("sel"))
      .select(col("doc_id"), explode(col("sel")).as("fp"))
  }

  private def fingerprintsOf(documents: DataFrame, k: Int, w: Int): DataFrame =
    selectFingerprints(hashTable(documents, k), w)

  /** Pair stage over a fingerprint table that feeds BOTH the df
    * filter and both sides of the self-join — callers persist it. */
  private def pairsFromFp(fp: DataFrame, maxDf: Int, minShared: Int): DataFrame = {
    val rare = fp.join(
      fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select(col("fp")),
      Seq("fp"))
    rare.select(col("fp"), col("doc_id").as("doc_a"))
      .join(rare.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Shared-fingerprint pairs `(doc_a, doc_b, n_shared)` with
    * `n_shared ≥ minShared`, winnowed at (k, w). Un-memoized
    * transform face for spec-level planted inputs. */
  def winnowPairsTransform(documents: DataFrame, k: Int = 3, w: Int = 4,
                           maxDf: Int = 50, minShared: Int = 2): DataFrame =
    pairsFromFp(fingerprintsOf(documents, k, w), maxDf, minShared)

  /** The corpus fingerprint table, memoized + persisted per
    * (session, dir, k, w) — it feeds three plan branches (df filter
    * + both self-join sides); recomputing the md5 gram scan per
    * branch tripled the query. Freed via
    * [[graft.GraftCaches.clearAll]] like every shared table. */
  private val fpCache =
    graft.GraftCaches.memo[(SparkSession, String, Int, Int), DataFrame](_.unpersist())

  def winnowPairs(spark: SparkSession, dir: String, k: Int = 3, w: Int = 4): DataFrame = {
    val fp = fpCache.getOrElseUpdate((spark, dir, k, w)) {
      // Materialize the hash arrays BEFORE the window-min selection:
      // an unmaterialized hash column gets column-pruned out of its
      // own stage and re-inlined into the selection, where every
      // w-window slice re-runs the md5 gram scan — first cut paid
      // ~100 s at sf0.1 in that stage vs 0.8 s over a persisted
      // array (probe numbers in the round-8 log). The intermediate
      // is dropped once the fingerprint table is materialized.
      val h = hashTable(Tables.documents(spark, dir), k).persist()
      h.count()
      val f = selectFingerprints(h, w)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count()
      h.unpersist()
      f
    }
    pairsFromFp(fp, maxDf = 50, minShared = 2)
  }

  /** Oracle for [[winnowPairsTransform]] — same grams, same
    * md5-prefix hash, same window minima, same df cap. */
  val winnowPairsOracleSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (SELECT doc_id,
      |             list_transform(range(1, greatest(len(toks) - 1, 1)),
      |               i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 8))::UBIGINT::BIGINT) AS h
      |      FROM t),
      |s AS (SELECT doc_id,
      |             CASE WHEN len(h) = 0 THEN []
      |                  WHEN len(h) < 4 THEN [list_min(h)]
      |                  ELSE list_distinct(list_transform(range(1, len(h) - 2),
      |                         j -> list_min(list_slice(h, j, j + 3)))) END AS sel
      |      FROM g),
      |fp AS (SELECT doc_id, unnest(sel) AS fp FROM s),
      |rare AS (SELECT fp.doc_id, fp.fp FROM fp
      |         JOIN (SELECT fp, count(*) AS df FROM fp GROUP BY 1 HAVING count(*) <= 50) d
      |           USING (fp))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
      |FROM rare a JOIN rare b USING (fp)
      |WHERE a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY 1, 2""".stripMargin
}
