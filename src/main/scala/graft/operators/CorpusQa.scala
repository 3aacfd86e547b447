package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-composition QA — the three reads a training-data curator
  * runs AFTER the per-doc filters ([[TextOps.textQuality]],
  * [[TextOps.gopherQualityGates]]) and the dedup chain ([[Dedup]])
  * have produced verdicts: "how much code leaked into my prose
  * corpus" (code/prose split — a code block in a language-modeling
  * prose slice poisons tokenizer statistics and vice versa), "how
  * many tokens does each language really cost me" (tokenizer
  * fertility — the budget number behind per-language sampling
  * weights), and "what does my duplicate mass look like structurally"
  * (cluster-size histogram — a few giant clusters and many pairs need
  * DIFFERENT dedup strategies).
  */
object CorpusQa {

  /** Code-vs-prose detection per document: integer structural
    * signals — brace/semicolon counts, code-keyword hits, a
    * symbol-density share in basis points — folded into a
    * deterministic integer verdict (≥ 2 braces-or-semicolons AND ≥ 1
    * keyword, or symbol density ≥ 1500 bp). The corpus ships no code,
    * so one doc in four is AUGMENTED with a deterministic code
    * fragment keyed on doc_id (the [[TextOps.textRedact]] planting
    * pattern), mirrored exactly in the oracle — the detector's
    * positive and negative paths are both exercised and
    * oracle-checked.
    *
    * All regexes are shared-dialect (character classes and `\b`
    * word-boundaries only — identical semantics in Java regex and
    * RE2). Pure per-row map + one map-side-combinable rollup at the
    * end: scan-speed at any corpus scale.
    */
  def codeProseStatsTransform(docs: DataFrame): DataFrame = {
    // regexes go through the DSL as Scala strings, NOT through
    // expr(...) SQL literals — Spark's SQL parser eats '\b' as a
    // BACKSPACE escape (measured: every planted doc scored 0
    // keywords), while lit() passes the pattern to the regex engine
    // verbatim
    val kwRe = "\\b(for|while|return|def|int|void|var)\\b"
    val symRe = "[^a-zA-Z0-9 \\n]"
    docs
      .select(col("doc_id"), col("source"),
        col("text").as("t0"))
      .withColumn("text",
        when(col("doc_id") % 4 === 0,
          concat(col("t0"), lit("\nfor (int i = 0; i < n; i++) { total += a[i]; }\nreturn total;")))
        .when(col("doc_id") % 8 === 1,
          concat(col("t0"), lit("\ndef scale(x):\n    return x * 2")))
        .otherwise(col("t0")))
      .select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit("[{}]"), lit(0))).cast("long").as("n_braces"),
        size(regexp_extract_all(col("text"), lit(";"), lit(0))).cast("long").as("n_semicolons"),
        size(regexp_extract_all(col("text"), lit(kwRe), lit(0))).cast("long").as("n_keywords"),
        size(regexp_extract_all(col("text"), lit(symRe), lit(0))).cast("long").as("n_symbols"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("symbol_bp", expr("n_symbols * 10000 div n_chars"))
      .drop("n_symbols", "n_chars")
      .withColumn("is_code",
        (col("n_braces") + col("n_semicolons") >= 2 && col("n_keywords") >= 1) ||
          col("symbol_bp") >= 1500)
      .orderBy(col("doc_id"))
  }

  def codeProseStats(spark: SparkSession, dir: String): DataFrame =
    codeProseStatsTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[codeProseStatsTransform]] — identical
    * planting, identical regexes (RE2 and Java agree on every
    * construct used), identical integer verdict. */
  val codeProseStatsOracleSql: String =
    """WITH aug AS (
      |  SELECT doc_id, source,
      |         CASE WHEN doc_id % 4 = 0
      |                THEN text || chr(10) || 'for (int i = 0; i < n; i++) { total += a[i]; }' || chr(10) || 'return total;'
      |              WHEN doc_id % 8 = 1
      |                THEN text || chr(10) || 'def scale(x):' || chr(10) || '    return x * 2'
      |              ELSE text END AS text
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |         CAST(len(regexp_extract_all(text, '[{}]')) AS BIGINT) AS n_braces,
      |         CAST(len(regexp_extract_all(text, ';')) AS BIGINT) AS n_semicolons,
      |         CAST(len(regexp_extract_all(text, '\b(for|while|return|def|int|void|var)\b')) AS BIGINT) AS n_keywords,
      |         CAST(len(regexp_extract_all(text, e'[^a-zA-Z0-9 \\n]')) AS BIGINT) * 10000 // len(text) AS symbol_bp
      |  FROM aug)
      |SELECT doc_id, source, n_braces, n_semicolons, n_keywords, symbol_bp,
      |       ((n_braces + n_semicolons >= 2 AND n_keywords >= 1) OR symbol_bp >= 1500) AS is_code
      |FROM c ORDER BY doc_id""".stripMargin

  /** Tokenizer fertility per language — BPE-ish tokens per whitespace
    * word and characters per token, the two numbers that decide
    * per-language sampling weights when the training budget is in
    * TOKENS (a language whose words explode 3× under the tokenizer
    * eats 3× budget per word; α-sampling over raw doc counts would
    * silently overweight it). Same two tokenizations as
    * [[TextOps.tokenCount]], aggregated to |langs| rows.
    *
    * Exact integer sufficient statistics (token/word/char sums),
    * float only in the two final ratios — the fertility table is
    * bit-stable across engines and corpus growth. One
    * map-side-combinable shuffle on lang.
    */
  def tokenizerFertilityTransform(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("ws"),
        expr("CAST(size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)) AS BIGINT)").as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"), col("n_chars"),
        round(col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("bpe_tokens").cast("double"), 6)
          .as("chars_per_token"))
      .orderBy(col("lang"))

  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    tokenizerFertilityTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[tokenizerFertilityTransform]]. */
  val tokenizerFertilityOracleSql: String =
    """WITH t AS (
      |  SELECT lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
      |         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe,
      |         CAST(len(text) AS BIGINT) AS chars
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(ws) AS BIGINT) AS ws_tokens, CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
      |       CAST(sum(chars) AS BIGINT) AS n_chars,
      |       round(CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6) AS fertility,
      |       round(CAST(sum(chars) AS DOUBLE) / CAST(sum(bpe) AS DOUBLE), 6) AS chars_per_token
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** Duplicate-cluster structure histogram — per cluster SIZE, how
    * many clusters and how much duplicate mass (docs minus the one
    * kept representative each). A corpus whose dup mass sits in two
    * giant clusters wants targeted boilerplate removal; one whose
    * mass is thousands of pairs wants the generic MinHash chain —
    * this is the read that tells them apart, and the denominator
    * behind "dedup will shrink the corpus by X %".
    *
    * Reuses [[Dedup.dedupClusters]]' memoized connected-components
    * labels (the corpus_filter sharing pattern — no second LSH/CC
    * run in the same session); the histogram itself is two
    * planning-scale aggregates over the |docs|-row label table.
    */
  def dedupClusterSizesTransform(clusters: DataFrame): DataFrame =
    clusters
      .groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("dup_docs"))
      .orderBy(col("cluster_size"))

  def dedupClusterSizes(spark: SparkSession, dir: String): DataFrame =
    dedupClusterSizesTransform(Dedup.dedupClusters(spark, dir))

  /** DuckDB oracle for [[dedupClusterSizesTransform]]: the
    * dedup_clusters recursive-CTE components, aggregated to the size
    * histogram. */
  def dedupClusterSizesOracleSql(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE
       |d AS (SELECT doc_id,
       |             list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
       |               i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
       |      FROM documents),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |      FROM d a JOIN d b ON a.doc_id < b.doc_id
       |      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $threshold),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a),
       |lbl AS (SELECT a AS doc_id, min(b) AS cluster_rep FROM reach GROUP BY a),
       |cs AS (SELECT cluster_rep, count(*) AS cluster_size FROM lbl GROUP BY 1)
       |SELECT cluster_size, count(*) AS n_clusters,
       |       cluster_size * count(*) AS n_docs,
       |       (cluster_size - 1) * count(*) AS dup_docs
       |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin
}
