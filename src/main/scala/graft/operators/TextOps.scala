package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftCaches
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table. Everything is built from codegen'd built-in
  * expressions (split / higher-order array functions / regexp) — no
  * UDFs — so each op is a single scan-and-project with whole-stage
  * codegen, embarrassingly parallel at any scale.
  */
object TextOps {

  /** Exact dedup: group by content hash, keep the lowest doc_id.
    * One shuffle on the 128-bit hash — the canonical first dedup
    * pass at 100 TB (hash is computed map-side, only (hash, id)
    * shuffles, never the text). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("content_hash"))
      .agg(min($"doc_id").as("keep_id"), count("*").as("n_copies"))
      .orderBy($"content_hash")
  }

  /** The self-join-feeding prefix index, memoized per (session, dir,
    * threshold) and freed via [[graft.GraftCaches.clearAll]]. */
  private val jaccardPrefixCache =
    GraftCaches.memo[(SparkSession, String, Double), DataFrame] { p => p.unpersist(); () }

  /** ONE persisted table (round-6; previously the word-set table was
    * a second persist with a second eager count, the two filling
    * sequentially — the index build dominated fresh-JVM cost): the
    * SLIM prefix index (doc_id, source, nw, tok, rk). Persisted
    * because it feeds BOTH sides of the self-join — without persist,
    * Catalyst plans the scan→split→docFreq→window subtree once per
    * side (the round-1 lesson: self-joins do not share non-identical
    * exchanges). The word-set table is NOT worth materializing: it is
    * a single scan→split projection, embarrassingly parallel, and the
    * verification joins re-derive it from parquet for less than one
    * cache fill costs. (The All-Pairs "carry the vector in the index"
    * variant was also measured: shuffling the word arrays through
    * both sides of the source/tok self-join cost ~3 s more at sf0.1
    * than re-scanning — rejected.)
    *
    * Materialized eagerly: letting the join's two sides race to fill
    * the cache serializes on per-partition block locks — measured
    * 10-50s of flaky wait at sf0.1. At warehouse scale this is a
    * parquet stage, eager for the same reason. */
  private def jaccardPrefixIndex(spark: SparkSession, dir: String,
                                 threshold: Double): DataFrame =
    jaccardPrefixCache.getOrElseUpdate((spark, dir, threshold)) {
      import spark.implicits._
      val d = wordSets(spark, dir)

      // global ascending document frequency = the token rarity order
      val postings = d.select($"doc_id", $"source", $"nw", explode($"words").as("tok"))
      val docFreq = postings.groupBy($"tok").agg(count("*").as("df"))

      // prefix = the L rarest tokens per doc, L = nw - ceil(t·nw) + 1.
      // (Correctness needs only SOME global token order — rarity order
      // is the selectivity heuristic that matters on Zipfian corpora.)
      // `rk` — the token's 1-based position in the doc's rarity
      // order — is carried through for the PPJoin positional bound.
      val byRarity = Window.partitionBy($"doc_id").orderBy($"df", $"tok")
      val prefixes = postings.join(docFreq, "tok")
        .withColumn("rk", row_number().over(byRarity))
        .filter($"rk" <= $"nw" - ceil(lit(threshold) * $"nw") + 1)
        .select($"doc_id", $"source", $"nw", $"tok", $"rk")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prefixes.count()
      prefixes
    }

  /** The (doc_id, source, words, nw) projection — a lazy single
    * scan→split, cheap enough to recompute per consumer. */
  private def wordSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", array_sort(array_distinct(split($"text", " "))).as("words"))
      .withColumn("nw", size($"words"))
  }

  /** Exact word-set Jaccard similarity pairs, blocked by source —
    * the exactness oracle against which the MinHash-LSH path
    * (Dedup.minHashLsh) is measured.
    *
    * Exact set-similarity join via prefix filtering (AllPairs /
    * PPJoin family — Bayardo et al. 2007): identical output to the
    * naive blocked cross join, but candidates come from an inverted
    * index over each document's PREFIX — its `|A| - ceil(t·|A|) + 1`
    * rarest tokens under a global frequency order. Two documents
    * with J ≥ t must share a prefix token (pigeonhole), so the
    * quadratic block join shrinks to short rare-token posting-list
    * joins; survivors are verified with the allocation-free sorted
    * merge walk. This IS the production-exact path at scale — the
    * shuffles carry (doc_id, token) postings and id pairs, never
    * full documents. */
  def wordJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.75): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val prefixes = jaccardPrefixIndex(spark, dir, threshold)

    // candidates share a prefix token, subject to two lossless prunes:
    //  - size ratio: J <= |A|/|B| when |A| <= |B|, so require
    //    min(nw) >= t·max(nw);
    //  - PPJoin positional bound (Xiao et al. 2008): a shared token at
    //    rarity positions (i, j) caps the overlap at
    //    1 + min(|A|-i, |B|-j); a true pair needs overlap
    //    >= α = ceil(t/(1+t)·(|A|+|B|)), and its FIRST shared token
    //    (which prefix filtering guarantees sits inside both prefixes)
    //    always satisfies the bound — so keeping pairs where ANY
    //    shared prefix token passes never loses a true pair, while
    //    pruning the candidates whose shared tokens all sit too deep.
    //    (1e-9 slack keeps an FP-rounded α from exceeding the exact
    //    integer and over-pruning.)
    val alpha = ceil(lit(threshold) * (col("a.nw") + col("b.nw")) / lit(1.0 + threshold) - lit(1e-9))
    val candidates = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.source") === col("b.source") && col("a.tok") === col("b.tok")
          && col("a.doc_id") < col("b.doc_id")
          && least(col("a.nw"), col("b.nw")).cast("double")
             >= lit(threshold) * greatest(col("a.nw"), col("b.nw"))
          && lit(1) + least(col("a.nw") - col("a.rk"), col("b.nw") - col("b.rk")) >= alpha)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // exact verification on the surviving pairs only; the word sets
    // are re-derived lazily from parquet (see jaccardPrefixIndex —
    // cheaper than a second cache fill)
    val sets = wordSets(spark, dir).select($"doc_id", $"words", $"nw")
    candidates
      .join(sets.select($"doc_id".as("id_a"), $"words".as("wa"), $"nw".as("na")), Seq("id_a"))
      .join(sets.select($"doc_id".as("id_b"), $"words".as("wb"), $"nw".as("nb")), Seq("id_b"))
      .withColumn("inter", call_function("graft_sorted_intersect_size", $"wa", $"wb"))
      .withColumn("jaccard",
        round($"inter".cast("double") / ($"na" + $"nb" - $"inter"), 4))
      .filter($"jaccard" >= threshold)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** The naive blocked variant of [[wordJaccardPairs]]: a per-source
    * quadratic self-join with the allocation-free sorted-merge
    * intersect. Identical output (same oracle SQL). Kept as a
    * first-class entry so the bench records both shapes every round:
    * the quadratic join wins while blocks are small (pair count
    * ~(block/√2)², no index-build cost), the prefix-filtered join is
    * the production path once blocks outgrow it — candidates scale
    * with posting-list lengths, not block². */
  def wordJaccardNaive(spark: SparkSession, dir: String, threshold: Double = 0.75): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val d = Tables.documents(spark, dir)
      .select($"doc_id", $"source", array_sort(array_distinct(split($"text", " "))).as("words"))
      .withColumn("nw", size($"words"))
    d.as("a").join(d.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id")
          && least(col("a.nw"), col("b.nw")).cast("double")
             >= lit(threshold) * greatest(col("a.nw"), col("b.nw")))
      .withColumn("inter", call_function("graft_sorted_intersect_size", col("a.words"), col("b.words")))
      .withColumn("jaccard",
        round($"inter".cast("double") / (col("a.nw") + col("b.nw") - $"inter"), 4))
      .filter($"jaccard" >= threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Exact word-set CONTAINMENT pairs — C(A→B) = |A∩B| / |A| ≥ t,
    * the ASYMMETRIC cousin of [[wordJaccardPairs]] and the shape
    * that catches what Jaccard structurally cannot: a short document
    * quoted/embedded inside a much longer one (their Jaccard is tiny
    * because the union is B-sized, but A's containment is ~1) — the
    * sub-document duplication screen next to Dedup.dedupSubstring's
    * k-gram approach, on set semantics.
    *
    * Same prefix-filter machinery as Jaccard — and the SAME index:
    * containment ≥ t needs overlap ≥ ⌈t·|A|⌉, so by pigeonhole A's
    * `|A| − ⌈t·|A|⌉ + 1` rarest tokens (exactly
    * [[jaccardPrefixIndex]]'s prefix, memoized — shared with the
    * Jaccard entry in-session) must hit B. Asymmetry changes the
    * probe: A's PREFIX joins B's FULL posting list (B can match on
    * any token, so no prefix shortens the indexed side), directed
    * pairs both ways. The only extra prune is the lossless size
    * bound |B| ≥ t·|A| (overlap ≤ |B|), with a −1 slack so FP
    * rounding can only under-prune — verification decides
    * membership, on the UNROUNDED ratio in both engines (identical
    * IEEE division against the same constant; the rounded column is
    * display-only).
    *
    * Scale shape: candidates are Σ_{prefix tok} df(tok) posting-list
    * join rows — rare-token lists by construction of the rarity
    * order; shuffles carry (doc_id, token) postings and id pairs;
    * the verify join re-derives word sets from parquet (the
    * [[jaccardPrefixIndex]] measured trade-off).
    */
  def containmentPairs(spark: SparkSession, dir: String, threshold: Double = 0.75): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val prefixes = jaccardPrefixIndex(spark, dir, threshold)
    val postings = wordSets(spark, dir)
      .select($"doc_id", $"source", $"nw", explode($"words").as("tok"))
    val candidates = prefixes.as("a")
      .join(postings.as("b"),
        col("a.source") === col("b.source") && col("a.tok") === col("b.tok")
          && col("a.doc_id") =!= col("b.doc_id")
          && col("b.nw").cast("double") >= lit(threshold) * col("a.nw") - lit(1.0))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sets = wordSets(spark, dir).select($"doc_id", $"words", $"nw")
    candidates
      .join(sets.select($"doc_id".as("id_a"), $"words".as("wa"), $"nw".as("na")), Seq("id_a"))
      .join(sets.select($"doc_id".as("id_b"), $"words".as("wb")), Seq("id_b"))
      .withColumn("inter", call_function("graft_sorted_intersect_size", $"wa", $"wb"))
      .filter($"inter".cast("double") / $"na" >= threshold)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"),
        round($"inter".cast("double") / $"na", 4).as("containment"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** DuckDB oracle for [[containmentPairs]] — the naive blocked
    * directed join; filter on the same unrounded ratio. */
  def containmentOracleSql(threshold: Double = 0.75): String =
    s"""WITH d AS (SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS words FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) / len(a.words), 4) AS containment
       |FROM d a JOIN d b ON a.source = b.source AND a.doc_id != b.doc_id
       |WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) / len(a.words) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "data", "table", "query"),
    "es" -> Seq("el", "la", "los", "datos", "tabla"),
    "de" -> Seq("der", "die", "und", "daten"),
    "fr" -> Seq("le", "les", "et", "requete"))

  /** Language ID via marker-token frequency scoring (the word-level
    * n-gram heuristic): count occurrences of per-language marker
    * tokens, argmax with fixed precedence, 'und' when all zero. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdTransform(Tables.documents(spark, dir))

  def langIdTransform(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def score(lang: String): String = {
      val inList = langMarkers(lang).map(w => s"'$w'").mkString(", ")
      s"cast(size(filter(split(text, ' '), w -> w IN ($inList))) as bigint)"
    }
    docs
      .select($"doc_id",
        expr(score("en")).as("s_en"), expr(score("es")).as("s_es"),
        expr(score("de")).as("s_de"), expr(score("fr")).as("s_fr"))
      .withColumn("pred_lang",
        when($"s_en" === 0 && $"s_es" === 0 && $"s_de" === 0 && $"s_fr" === 0, "und")
          .when($"s_en" >= $"s_es" && $"s_en" >= $"s_de" && $"s_en" >= $"s_fr", "en")
          .when($"s_es" >= $"s_de" && $"s_es" >= $"s_fr", "es")
          .when($"s_de" >= $"s_fr", "de")
          .otherwise("fr"))
      .orderBy($"doc_id")
  }

  /** SQL fragments shared verbatim between the Spark plan and the
    * DuckDB oracle for language scoring. */
  def langIdOracleSql: String = {
    def score(lang: String): String = {
      val inList = langMarkers(lang).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($inList))) AS BIGINT)"
    }
    s"""WITH s AS (SELECT doc_id, ${score("en")} AS s_en, ${score("es")} AS s_es,
       |                  ${score("de")} AS s_de, ${score("fr")} AS s_fr
       |           FROM documents)
       |SELECT doc_id, s_en, s_es, s_de, s_fr,
       |       CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
       |            WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |            WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |            WHEN s_de >= s_fr THEN 'de'
       |            ELSE 'fr' END AS pred_lang
       |FROM s ORDER BY doc_id""".stripMargin
  }

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "in", "to", "is")

  /** Quality scoring: word count, average word length, stopword
    * ratio, composite [0,1] score — the standard cheap pre-filter
    * before expensive dedup/training stages.
    *
    * The composite is computed in EXACT integer arithmetic
    * (`quality = num / (1000·n_words)` with
    * `num = 5·min(nw,100)·nw + 300·(nw−ns) + 25·min(na, 8·nw)`,
    * truncated at 6 decimals via integer division) and only then
    * divided once in floating point. The float formulation's terms
    * are exact 5-decimal rationals, so `round(…, 4)` sat exactly ON
    * rounding boundaries and flipped on summation noise — 5 of 5000
    * docs at sf0.1 disagreed with the oracle purely from
    * engine-specific rounding of boundary doubles. Exact ints + one
    * IEEE division are bit-identical in any engine. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    textQualityTransform(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** Per-doc quality scoring over any (doc_id, text…) table — shared
    * by [[textQuality]], [[corpusFilter]] and the streaming corpus
    * gate (per-batch stateless verdicts). */
  def textQualityTransform(documents: DataFrame): DataFrame = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    documents
      .withColumn("n_words", expr("cast(size(split(text, ' ')) as bigint)"))
      .withColumn("n_stop", expr(s"cast(size(filter(split(text, ' '), w -> w IN ($stopList))) as bigint)"))
      .withColumn("n_alpha", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("num",
        lit(5L) * least(col("n_words"), lit(100L)) * col("n_words")
          + lit(300L) * (col("n_words") - col("n_stop"))
          + lit(25L) * least(col("n_alpha"), lit(8L) * col("n_words")))
      .select(col("doc_id"), col("n_words"),
        round(col("n_alpha").cast("double") / col("n_words"), 4).as("avg_word_len"),
        round(col("n_stop").cast("double") / col("n_words"), 4).as("stop_ratio"),
        (expr("(num * 1000) div n_words").cast("double") / 1000000.0).as("quality"))
  }

  def textQualityOracleSql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH q AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |         CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS BIGINT) AS n_stop,
       |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha
       |  FROM documents),
       |n AS (
       |  SELECT *, 5 * least(n_words, 100) * n_words
       |            + 300 * (n_words - n_stop)
       |            + 25 * least(n_alpha, 8 * n_words) AS num
       |  FROM q)
       |SELECT doc_id, n_words,
       |       round(CAST(n_alpha AS DOUBLE) / n_words, 4) AS avg_word_len,
       |       round(CAST(n_stop AS DOUBLE) / n_words, 4) AS stop_ratio,
       |       CAST((num * 1000) // n_words AS DOUBLE) / 1000000.0 AS quality
       |FROM n ORDER BY doc_id""".stripMargin
  }

  /** The end-to-end corpus keep/drop decision — what the cleaning
    * stages exist FOR: every document gets its predicted language
    * ([[langId]]), quality score ([[textQuality]]), near-dup verdict
    * ([[Dedup.dedupClusters]]'s cluster representative election), and
    * a final `kept` flag with the first failing reason. The three
    * inputs are one-row-per-doc tables joined on doc_id — each stage
    * stays independently testable, and the composition is two
    * co-partitioned joins, not a new pipeline.
    *
    * Filter policy (deliberately simple): language must be in
    * `langs`, quality ≥ `minQuality`, and the doc must be its
    * cluster's elected representative. Reasons report the FIRST
    * failing check in that order. */
  def corpusFilter(spark: SparkSession, dir: String, minQuality: Double = 0.5,
                   langs: Seq[String] = Seq("en")): DataFrame = {
    import spark.implicits._
    val lang = langId(spark, dir).select($"doc_id", $"pred_lang")
    val qual = textQuality(spark, dir).select($"doc_id", $"quality")
    val dedup = Dedup.dedupClusters(spark, dir).select($"doc_id", $"is_kept".as("dedup_kept"))
    corpusFilterVerdict(lang, qual, dedup, minQuality, langs)
  }

  /** The keep/drop composition over one-row-per-doc part tables —
    * shared by [[corpusFilter]] and the streaming corpus gate (whose
    * parts come out of merged micro-batch state): two co-partitioned
    * joins + the first-failing-reason verdict. */
  private[graft] def corpusFilterVerdict(lang: DataFrame, qual: DataFrame, dedup: DataFrame,
                                         minQuality: Double, langs: Seq[String]): DataFrame = {
    val langOk = col("pred_lang").isin(langs: _*)
    lang.join(qual, Seq("doc_id")).join(dedup, Seq("doc_id"))
      .withColumn("reason",
        when(!langOk, "lang")
          .when(col("quality") < minQuality, "quality")
          .when(!col("dedup_kept"), "duplicate")
          .otherwise("ok"))
      .withColumn("kept", col("reason") === "ok")
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("dedup_kept"),
        col("reason"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** Oracle for [[corpusFilter]]: the component oracles composed as
    * subqueries — language, quality, and the recursive-CTE
    * connected-components dedup, joined exactly as the Spark plan
    * joins the component DataFrames. */
  def corpusFilterOracleSql(minQuality: Double = 0.5): String =
    s"""SELECT l.doc_id, l.pred_lang, q.quality, d.is_kept AS dedup_kept,
       |       CASE WHEN l.pred_lang != 'en' THEN 'lang'
       |            WHEN q.quality < $minQuality THEN 'quality'
       |            WHEN NOT d.is_kept THEN 'duplicate'
       |            ELSE 'ok' END AS reason,
       |       (CASE WHEN l.pred_lang != 'en' THEN 'lang'
       |             WHEN q.quality < $minQuality THEN 'quality'
       |             WHEN NOT d.is_kept THEN 'duplicate'
       |             ELSE 'ok' END) = 'ok' AS kept
       |FROM ($langIdOracleSql) l
       |JOIN ($textQualityOracleSql) q ON l.doc_id = q.doc_id
       |JOIN (${Dedup.dedupClustersOracleSql()}) d ON l.doc_id = d.doc_id
       |ORDER BY l.doc_id""".stripMargin

  /** Corpus vocabulary profile — the Zipf/coverage table a tokenizer
    * or data-mix decision reads: per token its collection frequency
    * (cf), document frequency (df), frequency rank, and the
    * CUMULATIVE share of all token occurrences covered by ranks
    * 1..r ("the head h tokens cover X% of the stream" — the number
    * that sizes vocabularies and stop-lists). cf/df/cum are exact
    * integers; the share division is the only float, performed once
    * per vocab row on two exact Longs.
    *
    * Scale shape: one explode + one map-side-combinable (token)
    * aggregate collapses the corpus to VOCAB-sized rows before
    * anything global; the rank window and running sum then run over
    * the vocabulary, not the corpus — fine up to millions of tokens
    * on one partition (it is a final, post-aggregate sort; at
    * larger vocabularies the same two columns come from a
    * range-partitioned sort + per-partition offsets, the
    * [[Olap.percentileStats]] slice pattern).
    */
  def vocabStats(spark: SparkSession, dir: String): DataFrame =
    vocabStatsTransform(spark, Tables.documents(spark, dir))

  def vocabStatsTransform(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val toks = docs
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
    val vocab = toks.groupBy($"tok")
      .agg(count(lit(1)).as("cf"), count_distinct($"doc_id").as("df"))
    val byFreq = Window.orderBy($"cf".desc, $"tok")
    val cum = Window.orderBy($"cf".desc, $"tok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vocab
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .withColumn("cum_cf", sum($"cf").over(cum))
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("total"))))
      .select($"tok", $"cf", $"df", $"rank",
        round($"cum_cf" / $"total", 6).as("cum_share"))
      .orderBy($"rank")
  }

  /** Per-language character n-gram frequency profile — the training
    * table behind [[langId]]'s n-gram heuristic (which ships with a
    * hand-rolled profile; this operator DERIVES one from a labeled
    * corpus): top-`topK` character trigrams per language with counts,
    * dense rank, and integer basis-point share of the language's
    * gram stream.
    *
    * Shape: each doc explodes to |chars| gram rows that collapse
    * map-side into the (lang, gram) count table (gram-vocab scale —
    * ≤ |alphabet|³ per language, NOT corpus scale); the top-k window
    * partitions by lang, so every language sorts only its own vocab.
    * Short docs (< n chars) contribute nothing (the `CASE` guard —
    * Spark's `sequence(1, 0)` would otherwise count DOWN). Integer
    * share keeps the output float-free.
    */
  def charNgramProfileTransform(docs: DataFrame, n: Int = 3, topK: Int = 20): DataFrame = {
    val grams = docs
      .select(col("lang"), lower(col("text")).as("t"))
      .select(col("lang"), explode(expr(
        s"CASE WHEN char_length(t) >= $n THEN transform(sequence(1, char_length(t) - ${n - 1}), i -> substr(t, i, $n)) ELSE array() END")).as("gram"))
    val counts = grams.groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("cnt")).as("total"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("gram"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .join(totals, Seq("lang"))
      .select(col("lang"), col("gram"), col("cnt"), col("rank"),
        expr("cnt * 10000 div total").as("share_bp"))
      .orderBy(col("lang"), col("rank"))
  }

  def charNgramProfile(spark: SparkSession, dir: String): DataFrame =
    charNgramProfileTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[charNgramProfileTransform]] (n = 3,
    * topK = 20) — LATERAL unnest(range) spells the same gram
    * enumeration; `range(1, len−2+1)` is empty for short docs, so no
    * guard is needed on the SQL side.
    */
  val charNgramProfileOracleSql: String =
    """WITH d AS (SELECT lang, lower(text) AS t FROM documents),
      |g AS (SELECT lang, substr(t, CAST(i AS INT), 3) AS gram
      |      FROM d, LATERAL (SELECT unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS i) s),
      |c AS (SELECT lang, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
      |t AS (SELECT lang, sum(cnt) AS total FROM c GROUP BY 1),
      |r AS (SELECT lang, gram, cnt,
      |             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rank
      |      FROM c)
      |SELECT r.lang, r.gram, r.cnt, CAST(r.rank AS BIGINT) AS rank,
      |       CAST(r.cnt * 10000 // t.total AS BIGINT) AS share_bp
      |FROM r JOIN t USING (lang) WHERE r.rank <= 20
      |ORDER BY r.lang, r.rank""".stripMargin

  /** BPE-style merge-candidate table: adjacent whitespace-token pair
    * frequencies with rank and pointwise mutual information — the
    * first iteration of a BPE/WordPiece tokenizer trainer IS this
    * table ("which adjacent pair to merge next"), and the PMI column
    * separates collocations from merely-frequent pairs.
    *
    * PMI is self-contained on the pair distribution: with N total
    * pairs, n_a· the first-position marginal and n_·b the second,
    * pmi = ln(n·N / (n_a·· n_·b)) — marginals come from the SAME
    * pair table (no token/pair denominator mixing), all inputs exact
    * integers, the single `ln` per emitted row is the only float.
    *
    * Shape: docs explode to adjacent pairs (|tokens| rows) that
    * collapse map-side to the pair-vocab count table; marginals are
    * two more combinable aggregates of that table; the top-N cut is
    * a bounded TakeOrdered and the rank window runs over ≤ topN
    * rows. Nothing global ever sorts more than the vocab.
    */
  def bpeMergeCandidatesTransform(docs: DataFrame, topN: Int = 50): DataFrame = {
    val pairs = docs
      .select(split(col("text"), " ").as("ws"))
      .select(explode(expr(
        "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS a, ws[i] AS b)) ELSE array() END")).as("p"))
      .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
    val counts = pairs.groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("n"))
    val aMarg = counts.groupBy(col("tok_a")).agg(sum(col("n")).as("n_first"))
    val bMarg = counts.groupBy(col("tok_b")).agg(sum(col("n")).as("n_second"))
    val total = counts.agg(sum(col("n")).as("n_pairs"))
    val top = counts.orderBy(col("n").desc, col("tok_a"), col("tok_b")).limit(topN)
    val w = Window.partitionBy(lit(0)).orderBy(col("n").desc, col("tok_a"), col("tok_b"))
    top.join(aMarg, Seq("tok_a")).join(bMarg, Seq("tok_b"))
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("tok_a"), col("tok_b"), col("n"), col("rank"),
        round(log(col("n").cast("double") * col("n_pairs") / (col("n_first") * col("n_second"))), 6).as("pmi"))
      .orderBy(col("rank"))
  }

  def bpeMergeCandidates(spark: SparkSession, dir: String): DataFrame =
    bpeMergeCandidatesTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[bpeMergeCandidatesTransform]] (topN = 50) —
    * 1-based DuckDB list indexing vs Spark's 0-based is absorbed in
    * the lambda bounds; `ln` spelled explicitly (DuckDB `log` is
    * log₁₀). */
  val bpeMergeCandidatesOracleSql: String =
    """WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |p AS (SELECT unnest(list_transform(range(1, len(ws)), i -> struct_pack(a := ws[i], b := ws[i+1]))) AS s
      |      FROM d WHERE len(ws) >= 2),
      |c AS (SELECT s.a AS tok_a, s.b AS tok_b, count(*) AS n FROM p GROUP BY 1, 2),
      |am AS (SELECT tok_a, CAST(sum(n) AS BIGINT) AS n_first FROM c GROUP BY 1),
      |bm AS (SELECT tok_b, CAST(sum(n) AS BIGINT) AS n_second FROM c GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_pairs FROM c),
      |r AS (SELECT tok_a, tok_b, n,
      |             row_number() OVER (ORDER BY n DESC, tok_a, tok_b) AS rank
      |      FROM c)
      |SELECT r.tok_a, r.tok_b, r.n, CAST(r.rank AS BIGINT) AS rank,
      |       round(ln(CAST(r.n AS DOUBLE) * t.n_pairs / (am.n_first * bm.n_second)), 6) AS pmi
      |FROM r JOIN am USING (tok_a) JOIN bm USING (tok_b) CROSS JOIN t
      |WHERE r.rank <= 50 ORDER BY r.rank""".stripMargin

  /** Word-frequency dictionary — the vocab-scale sufficient state
    * BPE training (and any subword-tokenizer fit) runs on: the corpus
    * collapses map-side to (word, cnt), and nothing downstream ever
    * touches a document row again (Sennrich's learn_bpe operates on
    * exactly this dict). Additive — the streaming twin's state. */
  private[graft] def wordFreqTransform(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Iterative BPE merge training (Sennrich, Haddow & Birch, ACL 2016
    * `learn_bpe`) — the tokenizer-construction step
    * [[bpeMergeCandidatesTransform]] (one round, word-level) only
    * gestures at: true char-level BPE over the word-frequency dict,
    * `rounds` merge rules learned in order. Each round counts
    * adjacent symbol pairs weighted by word frequency (every adjacent
    * index counts — Sennrich's get_stats), picks the argmax under the
    * total order (count DESC, tok_a, tok_b), and re-segments every
    * word by the new rule greedily LEFT-TO-RIGHT, non-overlapping (a
    * fresh merge output cannot immediately re-merge within the same
    * round). Initial segmentation: characters + a '_' end-of-word
    * marker, so merges are word-boundary aware.
    *
    * Exactness: everything is integer counts and string equality —
    * no floats anywhere. The argmax is a 1-row planning-scale probe
    * per round (the [[Dedup]] convergence-probe pattern); the greedy
    * re-segmentation is a pure per-row fold (`aggregate` HOF) over
    * vocab-scale rows with per-round lineage truncation.
    *
    * NOT SQL-expressible: the greedy non-overlapping re-segmentation
    * is a sequential fold per word per round — no fixed unrolling
    * expresses it relationally. Driver check is rows-only; the
    * ScalaTest gate asserts equality with an independent straight-
    * Scala learn_bpe on real data plus a hand-traced planted corpus.
    *
    * Scale shape: rounds × (one map-side-combinable pair count over
    * |vocab| rows + one 1-row probe + one per-row fold). The corpus
    * appears once, in [[wordFreqTransform]]'s initial collapse. At
    * 100 TB the dict is still vocab-scale (tens of millions of rows)
    * and each round is seconds; real tokenizer fits run ~30k rounds —
    * the per-round cost here is round-count-linear with no
    * corpus-size term after the first aggregate. */
  private[graft] def bpeTrainFromVocab(vocab: DataFrame, rounds: Int = 8): DataFrame =
    bpeLoop(vocab, rounds)._1

  /** The shared learn-and-segment loop: returns (merge table, final
    * per-word segmentation) so the fertility face reuses the exact
    * training path. */
  private[graft] def bpeLoop(vocab: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val emptySyms = expr("CAST(array() AS ARRAY<STRING>)")
    var seg = vocab.select(col("word"), col("cnt"), expr(
      """concat(
        |  CASE WHEN length(word) = 0 THEN CAST(array() AS ARRAY<STRING>)
        |       ELSE transform(sequence(1, length(word)), i -> substring(word, i, 1)) END,
        |  array('_'))""".stripMargin).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = seg.select(col("cnt"), explode(expr(
        """CASE WHEN size(syms) >= 2
          |     THEN transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))
          |     ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, a + b, n))
        val pa = lit(a)
        val pb = lit(b)
        // greedy left-to-right fold: acc = done symbols, pend = the
        // one symbol still eligible to start a merge
        val folded = aggregate(
          col("syms"),
          struct(emptySyms.as("acc"), lit(null).cast("string").as("pend")),
          (st, x) => {
            val acc = st.getField("acc")
            val pend = st.getField("pend")
            when(pend.isNull, struct(acc.as("acc"), x.as("pend")))
              .when(pend === pa && x === pb,
                struct(concat(acc, array(concat(pa, pb))).as("acc"),
                  lit(null).cast("string").as("pend")))
              .otherwise(struct(concat(acc, array(pend)).as("acc"), x.as("pend")))
          },
          st => when(st.getField("pend").isNull, st.getField("acc"))
            .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
        seg = seg.select(col("word"), col("cnt"), folded.as("syms")).localCheckpoint()
        r += 1
      }
    }
    (merges.toSeq.toDF("round", "tok_a", "tok_b", "merged", "pair_count")
      .orderBy(col("round")), seg)
  }

  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrainFromVocab(wordFreqTransform(Tables.documents(spark, dir)))

  /** Per-source tokenizer cost under the TRAINED BPE — the budget
    * table a multi-source mix is priced with (the trained-tokenizer
    * companion to [[CorpusQa.tokenizerFertilityTransform]]'s fixed
    * regex proxy): merges learn on the pooled corpus dict
    * ([[bpeLoop]]), every distinct word segments once, and each
    * source's token bill is the (source, word, c) grid joined onto
    * the |vocab|-row segmentation — fertility (BPE tokens per word,
    * end-of-word marker included) and chars-per-token fall out as
    * final 4dp divisions over exact integer sums.
    *
    * Shape: corpus collapses map-side to the source×vocab grid; the
    * segmentation join is vocab-keyed (co-partitionable); the rollup
    * is |sources| rows. The dict is computed FROM the grid (sum over
    * sources), so the streaming twin keeps ONE additive state. */
  private[graft] def bpeFertilityFromGrid(grid: DataFrame, rounds: Int = 8): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val vocab = grid.groupBy($"word").agg(sum($"c").as("cnt"))
    val (_, seg) = bpeLoop(vocab, rounds)
    grid
      .join(seg.select($"word", size($"syms").cast("long").as("n_sym")), Seq("word"))
      .groupBy($"source")
      .agg(sum($"c").as("n_words"),
        sum($"c" * length($"word")).as("n_chars"),
        sum($"c" * $"n_sym").as("n_bpe_tokens"))
      .select($"source", $"n_words", $"n_chars", $"n_bpe_tokens",
        round(expr("CAST(n_bpe_tokens AS DOUBLE) / n_words"), 4).as("fertility"),
        round(expr("CAST(n_chars AS DOUBLE) / n_bpe_tokens"), 4).as("chars_per_token"))
      .orderBy($"source")
  }

  def bpeFertilityBySource(spark: SparkSession, dir: String): DataFrame =
    bpeFertilityFromGrid(Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c")))

  /** Corpus drift between sources — pairwise TOTAL-VARIATION distance
    * between per-source unigram distributions, the mixture-health
    * check run before re-weighting a training mix ([[graft.operators
    * .Sampling]]'s corpus_mix decides WITH it): TV(P,Q) =
    * ½·Σ|p_i − q_i|. KL/JS need float log-sums whose addition order
    * is engine-dependent; TV cross-multiplies to the EXACT integer
    * Σ|n_ai·N_b − n_bi·N_a| (order-independent Long sum, bit-equal
    * in any engine) with ONE float division at the end:
    * TV = Σ/(2·N_a·N_b). 0 = identical distributions, 1 = disjoint.
    *
    * Overflow headroom: n_ai·N_b ≤ per-source token counts squared —
    * Long-safe below ~3·10⁹ tokens per source; past that promote the
    * product to Decimal(38,0) ([[Behavior.metricCorrelationsTransform]]'s
    * documented swap).
    *
    * Shape: corpus → (source, tok) counts (map-side combinable, one
    * shuffle), zero-filled source×vocab grid (|sources| is a bounded
    * broadcast like B21's type list), tok-keyed self-join fans each
    * vocab row |sources|² ways, final abs-sum collapses to
    * |sources|²/2 rows.
    */
  def sourceDriftTvTransform(docs: DataFrame): DataFrame =
    sourceDriftFromCounts(docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n")))

  /** The TV derivation from an already-aggregated (source, tok, n)
    * count table — split out so the STREAMING twin
    * ([[graft.streaming.DriftStream]]) can maintain the counts as
    * additive state and derive the report through this identical
    * expression tree (the stream/batch-parity-by-construction
    * pattern of [[Behavior.modeFromDailyCounts]]). */
  def sourceDriftFromCounts(counts: DataFrame): DataFrame = {
    val toks = counts.select(col("tok")).distinct()
    val sources = counts.select(col("source")).distinct()
    val totals = counts.groupBy(col("source")).agg(sum(col("n")).as("total"))
    val grid = toks.crossJoin(broadcast(sources))
      .join(counts, Seq("source", "tok"), "left")
      .select(col("source"), col("tok"), coalesce(col("n"), lit(0L)).as("n"))
    val a = grid.select(col("tok"), col("source").as("source_a"), col("n").as("na"))
    val b = grid.select(col("tok"), col("source").as("source_b"), col("n").as("nb"))
    a.join(b, Seq("tok"))
      .filter(col("source_a") < col("source_b"))
      .join(broadcast(totals.select(col("source").as("source_a"), col("total").as("ta"))), Seq("source_a"))
      .join(broadcast(totals.select(col("source").as("source_b"), col("total").as("tb"))), Seq("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(abs(col("na") * col("tb") - col("nb") * col("ta"))).as("num"),
        max(col("ta")).as("ta"), max(col("tb")).as("tb"))
      .select(col("source_a"), col("source_b"),
        round(col("num") / (lit(2.0) * col("ta") * col("tb")), 6).as("tv_distance"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def sourceDriftTv(spark: SparkSession, dir: String): DataFrame =
    sourceDriftTvTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[sourceDriftTvTransform]]. */
  val sourceDriftTvOracleSql: String =
    """WITH c AS (
      |  SELECT source, u.tok AS tok, count(*) AS n
      |  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents), unnest(ws) AS u(tok)
      |  GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1),
      |grid AS (
      |  SELECT s.source, t.tok, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |  FROM (SELECT DISTINCT tok FROM c) t
      |  CROSS JOIN (SELECT DISTINCT source FROM c) s
      |  LEFT JOIN c ON c.source = s.source AND c.tok = t.tok),
      |p AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |         CAST(sum(abs(a.n * tb.total - b.n * ta.total)) AS BIGINT) AS num,
      |         max(ta.total) AS ta, max(tb.total) AS tb
      |  FROM grid a
      |  JOIN grid b ON a.tok = b.tok AND a.source < b.source
      |  JOIN tot ta ON ta.source = a.source
      |  JOIN tot tb ON tb.source = b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b, round(num / (2.0 * ta * tb), 6) AS tv_distance
      |FROM p ORDER BY source_a, source_b""".stripMargin

  /** Per-document sentence statistics: sentences split on `[.!?]+`
    * runs (trimmed, empties dropped), words per sentence on
    * whitespace runs — the doc-structure profile (avg/max sentence
    * length) a quality-filter cascade thresholds on next to
    * [[textQuality]]'s character-level ratios. Average is an exact
    * integer `n_words·100 div n_sentences`; a doc with no sentence
    * content (empty/whitespace text) reports 0 sentences and null
    * avg/max rather than dividing by zero.
    *
    * Shape: pure per-row lambda arithmetic (no explode — the
    * sentence arrays live and die inside one projection), so the
    * operator is a single codegen'd scan emitting 4 numbers per doc.
    */
  def sentenceStatsTransform(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      expr("filter(transform(split(text, '[.!?]+'), s -> trim(s)), s -> s != '')").as("sents"))
    .select(col("doc_id"),
      expr("CAST(size(sents) AS BIGINT)").as("n_sentences"),
      expr("CAST(aggregate(sents, 0L, (acc, s) -> acc + size(split(s, ' +'))) AS BIGINT)").as("n_words"),
      expr("CASE WHEN size(sents) > 0 THEN CAST(aggregate(sents, 0L, (acc, s) -> acc + size(split(s, ' +'))) * 100 div size(sents) AS BIGINT) END").as("avg_words_x100"),
      expr("CASE WHEN size(sents) > 0 THEN CAST(aggregate(sents, 0L, (acc, s) -> greatest(acc, CAST(size(split(s, ' +')) AS BIGINT))) AS BIGINT) END").as("max_sentence_words"))
    .orderBy(col("doc_id"))

  def sentenceStats(spark: SparkSession, dir: String): DataFrame =
    sentenceStatsTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[sentenceStatsTransform]]. */
  val sentenceStatsOracleSql: String =
    """WITH s AS (
      |  SELECT doc_id,
      |         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'), x -> trim(x)),
      |                     x -> x != '') AS sents
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, len(sents) AS n_sentences,
      |         list_transform(sents, x -> len(regexp_split_to_array(x, ' +'))) AS wc
      |  FROM s)
      |SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
      |       CAST(coalesce(list_sum(wc), 0) AS BIGINT) AS n_words,
      |       CASE WHEN n_sentences > 0
      |            THEN CAST(list_sum(wc) * 100 // n_sentences AS BIGINT) END AS avg_words_x100,
      |       CASE WHEN n_sentences > 0
      |            THEN CAST(list_max(wc) AS BIGINT) END AS max_sentence_words
      |FROM w ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace tokens plus a BPE-ish segmentation
    * (letter runs | digit runs | single punctuation). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("ws_tokens", expr("cast(size(split(text, ' ')) as bigint)"))
      .withColumn("bpe_tokens",
        expr("cast(size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)) as bigint)"))
      .select($"doc_id", $"ws_tokens", $"bpe_tokens",
        when($"bpe_tokens" > 0, round(length($"text").cast("double") / $"bpe_tokens", 4))
          .otherwise(lit(null)).as("chars_per_token"))
      .orderBy($"doc_id")
  }

  /** Position-weighted polynomial fingerprint over the token stream —
    * order-sensitive (unlike a bag-of-words hash), cheap, and
    * reproducible in any engine with list lambdas (the DuckDB oracle
    * uses exactly that formulation). Computed by the codegen'd
    * [[graft.functions.DocFingerprint]] expression — the
    * `aggregate(transform(...))` SQL equivalent runs interpreted and
    * ~5× slower. The heavier shingle-based fingerprints live in
    * Dedup (MinHash/SimHash). */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select($"doc_id",
        call_function("graft_doc_fingerprint", split($"text", " ")).as("fp"))
      .orderBy($"doc_id")
  }

  /** Canonical text form via the codegen'd
    * [[graft.functions.NormalizeText]] expression: NFC composition,
    * root-locale lowercase, whitespace-run collapse. The first stage
    * of every exact-dedup / tokenization pipeline — run it BEFORE
    * hashing ([[dedupExact]]) so byte-level variants of the same text
    * (combining marks, case, spacing) collapse to one key.
    *
    * Pure per-row map inside whole-stage codegen: no shuffle, no
    * regex at runtime, scan-speed at any scale. (The `orderBy` is
    * verify-harness determinism, not part of the operator.)
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select($"doc_id",
        call_function("graft_normalize_text", $"text").as("norm_text"))
      .withColumn("n_chars_norm", length($"norm_text").cast("long"))
      .orderBy($"doc_id")
  }

  /** DuckDB list_sum returns HUGEINT — cast to BIGINT so the oracle's
    * dtype matches Spark's int64 (the driver's hash covers dtypes). */
  def docFingerprintOracleSql: String =
    """SELECT doc_id,
      |       CAST(COALESCE(list_sum(list_transform(range(1, len(string_split(text, ' ')) + 1),
      |         i -> CAST(i AS BIGINT) * (length(string_split(text, ' ')[i]) * 131
      |              + ascii(substr(string_split(text, ' ')[i], 1, 1)) * 7
      |              + ascii(right(string_split(text, ' ')[i], 1))))), 0) % 1000000007 AS BIGINT) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Repetition metrics (the Gopher/C4 quality-filter family,
    * Rae et al. 2021 §A1.1): fraction of the doc covered by its most
    * frequent word and bigram, and the duplicate-trigram fraction —
    * the standard cheap detectors for boilerplate / degenerate /
    * template text before training.
    *
    * Scale shape: the top-frequency metrics explode to (doc_id, gram)
    * and aggregate twice keyed on doc_id — partial (map-side)
    * aggregation absorbs the ~n_words-× fan-out, and both stages plus
    * the final joins share one doc_id partitioning. The trigram
    * metric needs only distinct-vs-total, so it stays a pure per-row
    * array computation (zip_with slices → array_distinct) with no
    * shuffle at all. Fractions are truncated 4-decimal integer
    * ratios (`·10000 div n`, [[textQuality]]'s exact-arithmetic
    * pattern) so any engine reproduces them bit-identically. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    textRepetitionTransform(spark, Tables.documents(spark, dir))

  /** [[textRepetition]] as a transform on any (doc_id, text) frame —
    * lets the degenerate-input spec feed 1- and 2-word docs. Slice
    * lengths are clamped at 0 and the bigram/trigram ratios guarded
    * (null for too-short docs): a quality filter for degenerate text
    * must survive degenerate input — a 1-word doc used to make
    * `slice(..., size-2)` throw on its negative length, and a 2-word
    * doc divided by n_trigrams = 0 (ANSI DIVIDE_BY_ZERO). */
  def textRepetitionTransform(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val docs = documents.select($"doc_id", split($"text", " ").as("words"))

    def grams2(ws: org.apache.spark.sql.Column) =
      zip_with(slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
        slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))

    val uni = docs.select($"doc_id", explode($"words").as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("uni_max"), sum($"c").as("n_words"))
    // a 1-word doc has no bigram rows at all → LEFT join below keeps it
    val bi = docs.select($"doc_id", explode(grams2($"words")).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("bi_max"), sum($"c").as("n_bigrams"))
    val tri = docs.select($"doc_id",
      greatest(size($"words") - 2, lit(0)).cast("long").as("n_trigrams"),
      // zip_with pads the shorter side with nulls, so trim the
      // (n-1)-long bigram array to n-2 before zipping the 3rd words
      size(array_distinct(zip_with(
        slice(grams2($"words"), lit(1), greatest(size($"words") - 2, lit(0))),
        slice($"words", lit(3), greatest(size($"words") - 2, lit(0))),
        (ab, c) => concat_ws(" ", ab, c)))).cast("long").as("tri_distinct"))

    uni.join(bi, Seq("doc_id"), "left").join(tri, Seq("doc_id"))
      .select($"doc_id", $"n_words",
        (expr("uni_max * 10000 div n_words").cast("double") / 10000.0).as("top_word_frac"),
        when($"n_bigrams" > 0,
          expr("bi_max * 10000 div n_bigrams").cast("double") / 10000.0).as("top_bigram_frac"),
        when($"n_trigrams" > 0,
          expr("(n_trigrams - tri_distinct) * 10000 div n_trigrams").cast("double") / 10000.0)
          .as("dup_trigram_frac"))
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[textRepetition]]: same grams built by
    * zipping shifted list slices, same truncated integer ratios,
    * same short-doc guards (greatest-clamped slice ends — a negative
    * end would mean from-the-end in DuckDB, not empty — LEFT join
    * for bigram-less docs, CASE-guarded divisions). */
  def textRepetitionOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), g AS (
      |  SELECT doc_id, ws,
      |         list_transform(list_zip(ws[1:greatest(len(ws)-1,0)], ws[2:len(ws)]),
      |                        x -> x[1] || ' ' || x[2]) AS bgs,
      |         list_transform(list_zip(ws[1:greatest(len(ws)-2,0)], ws[2:greatest(len(ws)-1,0)], ws[3:len(ws)]),
      |                        x -> x[1] || ' ' || x[2] || ' ' || x[3]) AS tgs
      |  FROM d
      |), uni AS (
      |  SELECT doc_id, max(c) AS uni_max, CAST(sum(c) AS BIGINT) AS n_words
      |  FROM (SELECT doc_id, u.w AS w, count(*) AS c FROM g, unnest(ws) AS u(w) GROUP BY 1, 2) GROUP BY 1
      |), bi AS (
      |  SELECT doc_id, max(c) AS bi_max, CAST(sum(c) AS BIGINT) AS n_bigrams
      |  FROM (SELECT doc_id, u.bg AS bg, count(*) AS c FROM g, unnest(bgs) AS u(bg) GROUP BY 1, 2) GROUP BY 1
      |), tri AS (
      |  SELECT doc_id, CAST(len(tgs) AS BIGINT) AS n_trigrams,
      |         CAST(len(list_distinct(tgs)) AS BIGINT) AS tri_distinct FROM g
      |)
      |SELECT uni.doc_id AS doc_id, n_words,
      |       (uni_max * 10000 // n_words) / 10000.0 AS top_word_frac,
      |       CASE WHEN n_bigrams > 0 THEN (bi_max * 10000 // n_bigrams) / 10000.0 END AS top_bigram_frac,
      |       CASE WHEN n_trigrams > 0 THEN ((n_trigrams - tri_distinct) * 10000 // n_trigrams) / 10000.0 END AS dup_trigram_frac
      |FROM uni LEFT JOIN bi USING (doc_id) JOIN tri USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Corpus-frequency quality scoring (the CCNet-family LM filter,
    * exact-integer form): per document, how "ordinary" its tokens are
    * under the corpus's own unigram statistics — mean corpus
    * frequency of its tokens, fraction of rare tokens (corpus count ≤
    * `rareMax`), and out-of-vocabulary fraction against the corpus's
    * top-`vocabSize` tokens. The standard cheap proxy for "is this
    * text language-like or junk" when a real LM is not in the loop —
    * and unlike log-prob perplexity it is all BIGINT arithmetic, so
    * any engine reproduces it bit-identically (no FP summation order,
    * no ulp-sensitive log/floor).
    *
    * Scale shape: one explode → (tok) hash aggregate builds the
    * frequency table (map-side partials absorb the fan-out); the
    * top-V vocabulary is a rank over that (already aggregated, small)
    * table with a deterministic (count desc, token asc) tie-break;
    * postings re-join the frequency table on tok and aggregate back
    * on doc_id — two shuffles total, both on short keys, never text
    * beyond single tokens. */
  def tokenRarity(spark: SparkSession, dir: String, rareMax: Long = 2,
                  vocabSize: Int = 30): DataFrame = {
    import spark.implicits._
    val posts = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
    val freq = posts.groupBy($"tok").agg(count(lit(1)).as("cnt"))
    // membership-only top-V: orderBy+limit plans TakeOrderedAndProject
    // (per-partition top-V + tiny driver merge) — no global-window
    // single-task rank
    val vocab = freq.orderBy($"cnt".desc, $"tok").limit(vocabSize)
      .select($"tok", lit(1L).as("in_vocab"))
    posts.join(freq, Seq("tok")).join(vocab, Seq("tok"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum($"cnt").as("sum_freq"),
        sum(when($"cnt" <= rareMax, 1L).otherwise(0L)).as("n_rare"),
        sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
      .select($"doc_id", $"n_tokens",
        (expr("sum_freq * 100 div n_tokens").cast("double") / 100.0).as("mean_tok_freq"),
        (expr("n_rare * 10000 div n_tokens").cast("double") / 10000.0).as("rare_frac"),
        (expr("n_oov * 10000 div n_tokens").cast("double") / 10000.0).as("oov_frac"))
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[tokenRarity]] — same two aggregates, same
    * deterministic top-V rank, same truncated integer ratios. */
  def tokenRarityOracleSql(rareMax: Long = 2, vocabSize: Int = 30): String =
    s"""WITH posts AS (
       |  SELECT doc_id, u.tok AS tok
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), unnest(ws) AS u(tok)),
       |freq AS (SELECT tok, count(*) AS cnt FROM posts GROUP BY tok),
       |vocab AS (SELECT tok, 1 AS in_vocab
       |          FROM (SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rk FROM freq)
       |          WHERE rk <= $vocabSize),
       |agg AS (
       |  SELECT p.doc_id,
       |         CAST(count(*) AS BIGINT) AS n_tokens,
       |         CAST(sum(f.cnt) AS BIGINT) AS sum_freq,
       |         CAST(sum(CASE WHEN f.cnt <= $rareMax THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       |         CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM posts p JOIN freq f USING (tok) LEFT JOIN vocab v USING (tok)
       |  GROUP BY p.doc_id)
       |SELECT doc_id, n_tokens,
       |       (sum_freq * 100 // n_tokens) / 100.0 AS mean_tok_freq,
       |       (n_rare * 10000 // n_tokens) / 10000.0 AS rare_frac,
       |       (n_oov * 10000 // n_tokens) / 10000.0 AS oov_frac
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Bigram language-model quality score (the CCNet/Wenzek et al.
    * 2020 perplexity-filter shape with the corpus as its own LM):
    * per document, the mean add-one-smoothed bigram log-probability
    * `ln((c(w1 w2) + 1) / (c(w1) + V))` under corpus-global counts.
    * Low scores mark text whose word transitions are unlike the
    * corpus — the classic junk/boilerplate screen run next to
    * [[tokenRarity]]'s unigram filter (a real deployment swaps the
    * corpus counts for a KenLM table; the pipeline shape is
    * identical).
    *
    * Scale shape: one explode builds (w1, bigram) postings; unigram
    * and bigram count tables are hash aggregates over those postings
    * (map-side partials absorb the fan-out) and are vocab-bounded —
    * they are the "model", orders of magnitude smaller than the
    * corpus, so both broadcast back onto the postings and the only
    * wide shuffle is the final per-doc aggregate on doc_id. FP note:
    * the per-doc mean sums doubles, so the 4-decimal round absorbs
    * summation-order and libm-ulp drift (values are O(−10)).
    */
  def ngramLmScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
    // (doc, w1, bigram) postings: zip each word with its successor
    val posts = words.select($"doc_id",
        explode(zip_with($"ws", slice($"ws", lit(2), greatest(size($"ws") - 1, lit(0))),
          (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("bg")))).as("p"))
      .filter($"p.bg".contains(" ")) // zip_with pads the tail with null
      .select($"doc_id", $"p.w1".as("w1"), $"p.bg".as("bg"))
    val uni = posts.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val bi  = posts.groupBy($"bg").agg(count(lit(1)).as("c2"))
    val v   = uni.agg(count(lit(1)).as("vocab"))
    posts
      .join(broadcast(uni), Seq("w1"))
      .join(broadcast(bi), Seq("bg"))
      .crossJoin(broadcast(v))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(log(($"c2" + 1).cast("double") / ($"c1" + $"vocab"))), 4).as("lm_score"))
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[ngramLmScore]] — same postings, counts,
    * smoothing, and rounding. */
  def ngramLmScoreOracleSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |posts AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i + 1] AS bg
      |  FROM w, unnest(range(1, len(ws))) AS u(i)),
      |uni AS (SELECT w1, count(*) AS c1 FROM posts GROUP BY 1),
      |bi  AS (SELECT bg, count(*) AS c2 FROM posts GROUP BY 1),
      |v   AS (SELECT count(*) AS vocab FROM uni)
      |SELECT p.doc_id, count(*) AS n_bigrams,
      |       round(avg(ln((b.c2 + 1) / (u.c1 + v.vocab))), 4) AS lm_score
      |FROM posts p JOIN uni u USING (w1) JOIN bi b USING (bg) CROSS JOIN v
      |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin

  /** Word-distribution entropy per document:
    * `H = −Σ (c/n)·log2(c/n)` over the doc's own word counts — the
    * information-theoretic twin of [[textRepetition]]'s top-word
    * fraction (H → 0 for degenerate single-word spam, → log2(n) for
    * fully diverse text). A standard cheap screen between the
    * rule-based filters and a real LM.
    *
    * Scale shape: one explode → (doc, word) count aggregate with
    * map-side partials, then a per-doc aggregate — both shuffles on
    * doc_id (the second re-uses the first's partitioning). FP: ≤
    * vocab-size log terms per doc, round(4) absorbs summation order.
    */
  def wordEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    counts
      .withColumn("n", sum($"c").over(Window.partitionBy($"doc_id")))
      .groupBy($"doc_id")
      .agg(max($"n").as("n_words"),
           round(-sum(($"c" / $"n") * log2($"c" / $"n")), 4).as("entropy"))
      .orderBy($"doc_id")
  }

  /** TF-IDF keyword extraction, exact-integer form: the `topN`
    * highest-scoring terms per document where
    * `score = (tf · N · 10000) div df` — term frequency × inverse
    * document frequency with the usual log dropped in favor of a
    * truncated integer ratio, which preserves a deterministic
    * ranking (the log is monotone in N/df, so top-N by N/df equals
    * top-N by log(N/df)) while keeping every value BIGINT —
    * bit-identical in any engine, no FP summation or ulp-sensitive
    * log. Ties break by term asc.
    *
    * Scale shape: postings → (doc, term) tf aggregate (map-side
    * partials) → term-level df aggregate on the already-reduced
    * pairs → join back on term → per-doc top-N window. The window
    * partitions by doc_id — millions of balanced partitions, not the
    * few-groups trap. */
  def tfidfTopTerms(spark: SparkSession, dir: String, topN: Int = 3): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val tf = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .withColumn("score", expr(s"tf * ${nDocs}L * 10000 div df"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")).cast("long"))
      .filter($"rank" <= topN)
      .select($"doc_id", $"rank", $"term", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rank")
  }

  /** DuckDB oracle for [[tfidfTopTerms]] — same integer score, same
    * deterministic tie-break. */
  def tfidfTopTermsOracleSql(topN: Int = 3): String =
    s"""WITH tf AS (
       |  SELECT doc_id, u.term AS term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), unnest(ws) AS u(term)
       |  GROUP BY doc_id, u.term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |             CAST(tf.tf * n.n_docs * 10000 // df.df AS BIGINT) AS score
       |      FROM tf JOIN df USING (term) CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |      FROM s)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
       |FROM r WHERE rank <= $topN ORDER BY doc_id, rank""".stripMargin

  // Redaction classes: Java-regex and RE2 (DuckDB) compatible — ASCII
  // \b word boundaries, bounded repeats, no lookaround.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val ipRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII / pattern redaction — the standard scrubbing stage next to
    * lang_id/quality in a training pipeline: emails, phone numbers
    * and IPv4 addresses replaced by class tags, with per-class match
    * counts. One scan, all regexp work codegen'd per row, no shuffle
    * before the ordered output; the redacted text is reported as its
    * md5 (engines agree byte-for-byte or the hash snitches) so the
    * output stays compact at any scale.
    *
    * Counts are taken on the pre-redaction text per class; the
    * replacement applies email → phone → IP in that order. Both
    * choices are mirrored in the oracle (DuckDB needs the 'g' flag —
    * its regexp_replace is first-match-only by default, Spark's is
    * global). */
  def textRedactTransform(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select($"doc_id", $"text")
      .withColumn("n_emails", size(regexp_extract_all($"text", lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all($"text", lit(phoneRe), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all($"text", lit(ipRe), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace($"text",
          emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>"))
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ips",
        ($"n_emails" + $"n_phones" + $"n_ips").as("n_redactions"),
        md5($"redacted").as("redacted_hash"))
      .orderBy($"doc_id")
  }

  /** Queries entry for [[textRedactTransform]]. The synthetic corpus
    * is PII-free (no digits at all), which would make the oracle a
    * trivial all-zeros match — so the entry plants deterministic
    * doc_id-derived PII on 4 of every 5 documents BEFORE scrubbing,
    * with the identical construction in the DuckDB oracle. The
    * planted classes exercise every regex plus the multi-class and
    * untouched paths. */
  def textRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    textRedactTransform(spark,
      plantPii(Tables.documents(spark, dir)).select($"doc_id", $"text"))
  }

  /** Deterministic doc_id-derived PII planting, shared by
    * [[textRedact]] and [[piiDensity]] (Spark face) and mirrored
    * token-for-token by [[plantPiiSqlCase]] (DuckDB face). Replaces
    * `text` in place; every other column passes through. */
  private[graft] def plantPii(documents: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    documents.withColumn("text",
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact user"), id, lit("@example.com now")))
      .when(col("doc_id") % 5 === 1,
        concat(col("text"), lit(" call 555-"),
          lpad((col("doc_id") * 7 % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") * 13 % 10000).cast("string"), 4, "0")))
      .when(col("doc_id") % 5 === 2,
        concat(col("text"), lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") * 3 % 256).cast("string"),
          lit("."), (col("doc_id") * 5 % 256).cast("string")))
      .when(col("doc_id") % 5 === 3,
        concat(col("text"), lit(" ref user"), id, lit("@mail.test and 192.168."),
          (col("doc_id") % 256).cast("string"), lit("."), (col("doc_id") * 7 % 256).cast("string")))
      .otherwise(col("text")))
  }

  /** The `aug` CTE both PII oracles share: [[plantPii]] in SQL. */
  private[graft] def plantPiiSqlCase: String =
    """aug AS (
      |  SELECT doc_id, source,
      |         CASE doc_id % 5
      |           WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
      |           WHEN 1 THEN text || ' call 555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0')
      |                        || '-' || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
      |           WHEN 2 THEN text || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
      |                        || '.' || CAST(doc_id * 3 % 256 AS VARCHAR)
      |                        || '.' || CAST(doc_id * 5 % 256 AS VARCHAR)
      |           WHEN 3 THEN text || ' ref user' || CAST(doc_id AS VARCHAR) || '@mail.test and 192.168.'
      |                        || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id * 7 % 256 AS VARCHAR)
      |           ELSE text END AS text
      |  FROM documents)""".stripMargin

  /** Per-source PII density — the measurement face of [[textRedact]]:
    * before a source enters the training mix, how much PII does it
    * carry, and did the scrub have anything to do? Per source: doc
    * count, docs with ≥1 hit, per-class match counts and matches per
    * 10k scanned chars. Uses the SAME deterministic planting as
    * text_redact (the synthetic corpus is digit-free, so an unplanted
    * oracle would be trivially all-zero).
    *
    * Scale: one codegen'd regexp scan per doc (map-side, no text in
    * any shuffle) into a groupBy bounded by |sources| — partial
    * aggregation absorbs the fan-in, so the shuffle carries a few
    * rows per source per task at any corpus size. */
  def piiDensityCounts(documents: DataFrame): DataFrame =
    plantPii(documents)
      .select(col("source"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long").as("e"),
        size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).cast("long").as("p"),
        size(regexp_extract_all(col("text"), lit(ipRe), lit(0))).cast("long").as("i"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("e") + col("p") + col("i") > 0, 1L).otherwise(0L)).as("pii_docs"),
        sum(col("e")).as("n_emails"),
        sum(col("p")).as("n_phones"),
        sum(col("i")).as("n_ips"),
        sum(col("chars")).as("n_chars"))

  /** Report face over [[piiDensityCounts]]-shaped rows (shared with
    * the streaming twin, whose state merges the same partials). */
  def piiDensityFromCounts(counts: DataFrame): DataFrame =
    counts.select(col("source"), col("docs"), col("pii_docs"),
        col("n_emails"), col("n_phones"), col("n_ips"),
        round((col("n_emails") + col("n_phones") + col("n_ips")) * lit(10000.0)
          / col("n_chars"), 4).as("pii_per_10k"))
      .orderBy("source")

  def piiDensity(spark: SparkSession, dir: String): DataFrame =
    piiDensityFromCounts(piiDensityCounts(Tables.documents(spark, dir)))

  /** DuckDB oracle for [[piiDensity]]: identical planting and
    * per-source aggregation. */
  def piiDensityOracleSql: String =
    // fragment concatenated OUTSIDE the margin-stripped literal: its
    // own stripMargin already ran, and a second pass would eat one
    // pipe of any continuation line starting with `||`
    s"WITH $plantPiiSqlCase,\n" +
    s"""c AS (
       |  SELECT source,
       |         CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS e,
       |         CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS p,
       |         CAST(len(regexp_extract_all(text, '$ipRe')) AS BIGINT) AS i,
       |         CAST(len(text) AS BIGINT) AS chars
       |  FROM aug),
       |g AS (
       |  SELECT source, count(*) AS docs,
       |         CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
       |         CAST(sum(e) AS BIGINT) AS n_emails, CAST(sum(p) AS BIGINT) AS n_phones,
       |         CAST(sum(i) AS BIGINT) AS n_ips, CAST(sum(chars) AS BIGINT) AS n_chars
       |  FROM c GROUP BY source)
       |SELECT source, docs, pii_docs, n_emails, n_phones, n_ips,
       |       round((n_emails + n_phones + n_ips) * 10000.0 / n_chars, 4) AS pii_per_10k
       |FROM g ORDER BY source""".stripMargin

  /** DuckDB oracle for [[textRedact]]: identical PII planting,
    * counting and replacement sequence ('g' = global replace). */
  def textRedactOracleSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |         CASE doc_id % 5
       |           WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       |           WHEN 1 THEN text || ' call 555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0')
       |                        || '-' || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
       |           WHEN 2 THEN text || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
       |                        || '.' || CAST(doc_id * 3 % 256 AS VARCHAR)
       |                        || '.' || CAST(doc_id * 5 % 256 AS VARCHAR)
       |           WHEN 3 THEN text || ' ref user' || CAST(doc_id AS VARCHAR) || '@mail.test and 192.168.'
       |                        || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id * 7 % 256 AS VARCHAR)
       |           ELSE text END AS text
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
       |         CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phones,
       |         CAST(len(regexp_extract_all(text, '$ipRe')) AS BIGINT) AS n_ips,
       |         md5(regexp_replace(regexp_replace(regexp_replace(text,
       |           '$emailRe', '<EMAIL>', 'g'), '$phoneRe', '<PHONE>', 'g'), '$ipRe', '<IP>', 'g')) AS redacted_hash
       |  FROM aug)
       |SELECT doc_id, n_emails, n_phones, n_ips,
       |       n_emails + n_phones + n_ips AS n_redactions, redacted_hash
       |FROM c ORDER BY doc_id""".stripMargin

  /** Multimodal column plumbing: an opaque binary payload plus typed
    * metadata derived deterministically from the bytes. The decode
    * stub itself (Multimodal.decodeStub) is a mapPartitions op; this
    * is the oracle-checkable schema/metadata path. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("blob", encode($"text", "UTF-8"))
      .withColumn("n_bytes", length($"blob").cast("long"))
      .select($"doc_id", $"n_bytes",
        ($"n_bytes" % 640 + 1).as("width"),
        (($"n_bytes" * 7) % 480 + 1).as("height"),
        when($"n_bytes" % 3 === 0, "png")
          .when($"n_bytes" % 3 === 1, "jpeg")
          .otherwise("webp").as("format"))
      .orderBy($"doc_id")
  }

  /** Edit-distance similarity join (the fuzzy-matching operator
    * class): all document pairs whose `prefixLen`-char prefixes are
    * within Levenshtein distance `k`, found WITHOUT an all-pairs
    * scan, via PARTITION-BASED signatures (PassJoin, Li et al. 2011).
    *
    * Why not q-grams: the classic q-gram count/prefix filters
    * (Gravano et al. 2001; Ed-Join) bound distinct-gram overlap by
    * `max(|G|) − k·q`, but candidate volume scales with Σ df² over
    * posting lists — and this corpus has only ~377 distinct trigrams
    * (tiny synthetic vocabulary), so even the rarest grams are
    * common: measured 5.2M candidates for 247 true pairs at sf0.1
    * (and the naive full-postings variant ran 99 s). Pigeonhole
    * segments are the selective signature here: 17.9k distinct
    * 16-char segments → ~2k candidates for the same 247 pairs.
    *
    * Filter chain, every step sound (no true pair can escape):
    *  1. length filter — one edit changes length by ≤ 1, so
    *     `|len(a) − len(b)| ≤ k`;
    *  2. SEGMENT filter (pigeonhole): split each full prefix into
    *     `k+1` fixed 16-char segments; ≤ k edits cannot touch all
    *     k+1 segments, so some segment of `a` survives verbatim in
    *     `b`, displaced by at most the net indel offset — i.e. it
    *     equals one of b's substrings at the same segment slot
    *     shifted by d ∈ [−k, k]. Candidates = join of a's (slot,
    *     segment) against b's (slot, shifted-window) postings:
    *     k+1 signatures and (k+1)(2k+1) windows per doc, all exact
    *     16-char matches;
    *  3. docs whose prefix is shorter than `prefixLen` (no fixed
    *     segmentation) go to bounded side buckets: all-pairs among
    *     the shorts, and shorts × full docs when the length filter
    *     allows (len ≥ prefixLen − k). 2.5% of this corpus; a
    *     production corpus buckets shorts by length class and
    *     applies the same segmentation per class;
    *  4. exact verification with the codegen'd `levenshtein` on the
    *     distinct surviving candidates only.
    *
    * Scale shape: the shuffles carry (slot, 16-char segment, id)
    * postings and (id, id) candidates; prefixes rejoin only for
    * verification, co-partitioned on doc_id. Everything is a hash
    * join on short fixed keys — no sort, no window, no quadratic
    * except the declared bounded buckets. The oracle is the
    * independent length-filtered all-pairs scan (ground truth, not
    * a mirror).
    */
  def editDistancePairs(spark: SparkSession, dir: String, k: Int = 3,
                        prefixLen: Int = 64): DataFrame =
    editDistanceTransform(Tables.documents(spark, dir), k, prefixLen)

  /** The transform behind [[editDistancePairs]] — input needs
    * `(doc_id, text)`; separated so specs can plant exact-distance,
    * boundary, and tiny-string scenarios.
    *
    * Variable-length segmentation: doc of length l gets k+1 segments
    * with boundaries `start_j = 1 + ⌊j·l/(k+1)⌋` (PassJoin's even
    * partition — lengths differ by ≤ 1 and adapt to l). The window
    * side generates, for every partner length l' ∈ [l−k, l+k] and
    * every slot j, the substring at the PARTNER's boundary for l'
    * shifted by d ∈ [−k, k]; the join key `(l', slot, seg)` then
    * pairs a's slot-j segment with b's windows generated FOR
    * partner length len(a) — sound for any pair because ≤ k edits
    * leave some segment of `a` intact and displaced by ≤ k inside
    * `b`. Strings too short to segment (len < 2(k+1)) fall to a
    * bounded tiny bucket (all-pairs among docs of len < 2(k+1)+k).
    */
  def editDistanceTransform(input: DataFrame, k: Int = 3,
                            prefixLen: Int = 64): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    val nSeg = k + 1
    val tinyMax = 2 * nSeg // below this, segments degenerate -> bucket
    // materialized once: (id, prefix, len) feeds postings, the tiny
    // bucket, and both verification joins (diamond-reuse)
    val docs = input
      .select($"doc_id", substring($"text", 1, prefixLen).as("s"))
      .withColumn("len", length($"s"))
      .localCheckpoint()
    val segDocs = docs.filter($"len" >= tinyMax)

    // slot-j segment of a length-l string: [1 + (j*l) div n, ((j+1)*l) div n]
    def segStart(j: Int, l: String) = s"(1 + ($j * $l) div $nSeg)"
    def segLenOf(j: Int, l: String) = s"((($j + 1) * $l) div $nSeg - ($j * $l) div $nSeg)"

    val segCols = (0 until nSeg).map { j =>
      expr(s"struct($j AS slot, substring(s, ${segStart(j, "len")}, ${segLenOf(j, "len")}) AS seg)")
    }
    val segs = segDocs
      .select($"doc_id", $"len", explode(array(segCols: _*)).as("x"))
      .select($"len", $"x.slot".as("slot"), $"x.seg".as("seg"), $"doc_id".as("doc_a"))

    // windows keyed by the PARTNER length tl = len + dl: the partner's
    // slot-j segment bounds evaluated at tl, shifted by d, clamped to
    // this string's extent. Generated by ONE nested higher-order
    // expression, not (2k+1)²(k+1) literal columns — a first cut
    // emitted 196 CASE+substring+struct columns and the generated
    // projection blew past the codegen method budget (~12 s of the
    // 16 s total was just materializing windows); the HOF form loops
    // at runtime inside a single compact expression.
    val winExpr = {
      val tl = "(len + dl)"
      val st = s"(1 + (j * $tl) div $nSeg + d)"
      val sl = s"(((j + 1) * $tl) div $nSeg - (j * $tl) div $nSeg)"
      s"""filter(
         |  flatten(transform(sequence(-$k, $k), dl ->
         |    flatten(transform(sequence(0, ${nSeg - 1}), j ->
         |      transform(sequence(-$k, $k), d ->
         |        CASE WHEN $tl >= $tinyMax AND $st >= 1
         |                  AND $st + $sl - 1 <= len AND $sl >= 1
         |             THEN struct($tl AS tl, j AS slot, substring(s, $st, $sl) AS seg)
         |        END))))),
         |  x -> x IS NOT NULL)""".stripMargin
    }
    val wins = segDocs
      .select($"doc_id", explode(expr(winExpr)).as("x"))
      .select($"x.tl".as("len"), $"x.slot".as("slot"), $"x.seg".as("seg"), $"doc_id".as("doc_b"))

    val candSeg = segs.join(wins, Seq("len", "slot", "seg"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b")

    // tiny strings: all-pairs among docs short enough to matter
    // (len < tinyMax + k can pair with a tiny one under the length
    // filter) — bounded by the tiny-doc count by construction
    val small = docs.filter($"len" < tinyMax + k)
    val candTiny = small.filter($"len" < tinyMax)
      .select($"doc_id".as("id_t"), $"len".as("len_t"))
      .crossJoin(small.select($"doc_id".as("id_o"), $"len".as("len_o")))
      .filter($"id_t" =!= $"id_o" && abs($"len_t" - $"len_o") <= k)
      .select(least($"id_t", $"id_o").as("doc_a"), greatest($"id_t", $"id_o").as("doc_b"))

    candSeg.unionByName(candTiny).distinct()
      .join(docs.select($"doc_id".as("doc_a"), $"s".as("s_a"), $"len".as("len_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"s".as("s_b"), $"len".as("len_b")), "doc_b")
      .filter(abs($"len_a" - $"len_b") <= k)
      .withColumn("dist", levenshtein($"s_a", $"s_b").cast("long"))
      .filter($"dist" <= k)
      .select($"doc_a", $"doc_b", $"dist")
      .orderBy($"doc_a", $"doc_b")
  }

  /** BM25-shaped keyword search: top-`topN` documents for a fixed
    * query term set, scored with the BM25 tf-saturation formula
    * (Robertson/Spärck Jones; k1 = 1.2, b = 0.75) in EXACT scaled
    * integer arithmetic. As with [[tfidfTopTerms]], the logarithmic
    * idf is replaced by its linear surrogate `(N − df)/df` — monotone
    * in df, so per-term orderings are preserved — because exact
    * integers make the ranking bit-reproducible across engines where
    * last-ulp `ln` differences could flip near-ties. The length
    * normalization keeps avgdl as the exact rational
    * `total_words / n_docs` (never a float): `b·dl/avgdl` becomes
    * `(b₁₀₀·dl·n_docs) div total_words`.
    *
    * Scale shape: the postings table filters to the query terms
    * BEFORE aggregating (predicate pushdown into the explode), so
    * the per-term tf aggregate touches only matching rows; corpus
    * stats (N, total_words) are a one-row aggregate broadcast back;
    * final top-N is a bounded TakeOrdered. An inverted-index
    * deployment would serve the same plan from a pre-built postings
    * parquet keyed by term.
    */
  def bm25TopK(spark: SparkSession, dir: String,
               queryTerms: Seq[String] = Seq("data", "query", "table"),
               topN: Int = 20): DataFrame = {
    import spark.implicits._
    val k1_100 = 120L // k1 = 1.2 scaled by 100
    val b_100 = 75L   // b = 0.75 scaled by 100
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("words"))
      .withColumn("dl", size($"words").cast("long"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_words"))
    val terms = queryTerms.map(t => lit(t))
    val tf = docs.select($"doc_id", $"dl", explode($"words").as("term"))
      .filter($"term".isin(queryTerms: _*))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("norm_100",
        lit(100L) - lit(b_100) + expr(s"($b_100 * dl * n_docs) div total_words"))
      .withColumn("denom", $"tf" * 100L + expr(s"($k1_100 * norm_100) div 100"))
      .withColumn("tfc_10000", expr(s"(tf * ${k1_100 + 100} * 10000) div denom"))
      .withColumn("idf_10000", expr("((n_docs - df) * 10000) div df"))
      .withColumn("term_score", expr("(idf_10000 * tfc_10000) div 10000"))
      .groupBy($"doc_id")
      .agg(sum($"term_score").as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy($"score".desc, $"doc_id")
      .limit(topN)
  }

  /** DuckDB oracle for [[bm25TopK]] — same integer recurrence. */
  def bm25OracleSql(queryTerms: Seq[String] = Seq("data", "query", "table"),
                    topN: Int = 20): String = {
    val termList = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |docs AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM d),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_words FROM docs),
       |tf AS (SELECT doc_id, dl, u.term AS term, CAST(count(*) AS BIGINT) AS tf
       |       FROM docs, unnest(ws) AS u(term)
       |       WHERE u.term IN ($termList)
       |       GROUP BY doc_id, dl, u.term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |s AS (SELECT tf.doc_id,
       |             (100 - 75 + (75 * tf.dl * st.n_docs) // st.total_words) AS norm_100,
       |             tf.tf * 100 + (120 * (100 - 75 + (75 * tf.dl * st.n_docs) // st.total_words)) // 100 AS denom,
       |             tf.tf, df.df, st.n_docs
       |      FROM tf JOIN df USING (term) CROSS JOIN stats st),
       |t AS (SELECT doc_id,
       |             ((((n_docs - df) * 10000) // df) * ((tf * 220 * 10000) // denom)) // 10000 AS term_score
       |      FROM s)
       |SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score, count(*) AS n_terms_hit
       |FROM t GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT $topN""".stripMargin
  }

  /** DuckDB oracle for [[editDistancePairs]] — the independent
    * all-pairs ground truth (length-filtered for cost only). */
  def editDistanceOracleSql(k: Int = 3, prefixLen: Int = 64): String =
    s"""WITH s AS (SELECT doc_id, substr(text, 1, $prefixLen) AS s FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE abs(length(a.s) - length(b.s)) <= $k
       |  AND levenshtein(a.s, b.s) <= $k
       |ORDER BY 1, 2""".stripMargin

  /** Zipf-law fit of the corpus token-frequency curve — the one-row
    * health metric a corpus audit reads before training (natural text
    * sits near slope −1; scraped boilerplate and synthetic spam bend
    * it): OLS slope/intercept of ln(freq) on ln(rank) over the top
    * `topN` terms of [[vocabStatsTransform]]'s vocabulary (same
    * whitespace tokenization). Each log is quantized to an exact
    * 1e-6-grid BIGINT BEFORE summation so the sufficient statistics
    * Σx, Σy, Σxy, Σx² are exact integers in any summation order
    * (the `metric_correlations` discipline — float only in the final
    * slope/intercept division).
    *
    * Shape: token counts collapse map-side to vocab scale; the
    * top-N cut is one global window over vocab (not corpus) rows;
    * the regression is a single one-row aggregate.
    */
  def zipfSlopeTransform(spark: SparkSession, docs: DataFrame, topN: Int = 1000): DataFrame =
    zipfFromVocab(docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cf")), topN)

  /** The regression derivation from an already-aggregated (tok, cf)
    * vocabulary — split out so the STREAMING twin
    * ([[graft.streaming.ZipfStream]]) can maintain the vocabulary as
    * additive state (vocab-scale, the tokenizer-training state any
    * corpus-stats stream keeps) and derive the fit through this
    * identical tree. */
  def zipfFromVocab(vocab: DataFrame, topN: Int = 1000): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val byFreq = Window.orderBy($"cf".desc, $"tok")
    val pts = vocab
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .filter($"rank" <= topN)
      .select(expr("CAST(round(ln(rank) * 1000000) AS BIGINT)").as("x"),
        expr("CAST(round(ln(cf) * 1000000) AS BIGINT)").as("y"))
    pts.agg(count(lit(1)).as("n_terms"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .select($"n_terms",
        expr("""round((n_terms * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
                      (n_terms * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 4)""")
          .as("zipf_slope"),
        expr("""round((CAST(sy AS DOUBLE) / n_terms / 1e6) -
                      ((n_terms * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
                       (n_terms * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)) *
                      (CAST(sx AS DOUBLE) / n_terms / 1e6), 4)""")
          .as("zipf_intercept"))
  }

  def zipfSlope(spark: SparkSession, dir: String): DataFrame =
    zipfSlopeTransform(spark, Tables.documents(spark, dir))

  /** DuckDB oracle for [[zipfSlopeTransform]] (topN = 1000). */
  val zipfSlopeOracleSql: String =
    """WITH v AS (SELECT u.tok AS tok, count(*) AS cf
      |           FROM documents, unnest(string_split(text, ' ')) AS u(tok)
      |           GROUP BY 1),
      |r AS (SELECT cf, CAST(row_number() OVER (ORDER BY cf DESC, tok) AS BIGINT) AS rank FROM v),
      |p AS (SELECT CAST(round(ln(rank) * 1000000) AS BIGINT) AS x,
      |             CAST(round(ln(cf) * 1000000) AS BIGINT) AS y
      |      FROM r WHERE rank <= 1000)
      |SELECT count(*) AS n_terms,
      |       round((count(*) * CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(y)) /
      |             (count(*) * CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(x)), 4) AS zipf_slope,
      |       round((CAST(sum(y) AS DOUBLE) / count(*) / 1e6) -
      |             ((count(*) * CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(y)) /
      |              (count(*) * CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(x))) *
      |             (CAST(sum(x) AS DOUBLE) / count(*) / 1e6), 4) AS zipf_intercept
      |FROM p""".stripMargin

  /** Token-stream coverage at power-of-two vocabulary cuts — "how big
    * a tokenizer vocab buys how much of the corpus": for each N ∈
    * {1, 2, 4, …} (and the full vocabulary as the last point), the
    * fraction of the token stream covered by the top-N
    * tokens-by-frequency. The curve is [[vocabStats]]' cumulative
    * share READ AT the power-of-two grid — the table a vocab-size
    * decision actually consults (the knee is where the curve flattens).
    *
    * Shape: one map-side-combinable token rollup to vocab scale; the
    * rank/cumsum windows run over the vocab aggregate (plan-audit
    * bounded); the power-of-two filter is a bit test `rank & (rank−1)
    * = 0` — exact in both engines. ≤ ~⌈log₂ V⌉+1 rows out. */
  def vocabCoverageCurveTransform(docs: DataFrame): DataFrame =
    coverageFromVocab(docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cf")))

  /** The curve derivation from an already-aggregated (tok, cf)
    * vocabulary — split out so the STREAMING twin reads it over
    * [[graft.streaming.VocabState]]'s additive state (the zipf_slope
    * sharing pattern: one vocab state, two read-time faces). */
  private[graft] def coverageFromVocab(vocab: DataFrame): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val byFreq = Window.orderBy($"cf".desc, $"tok")
    val cum = byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vocab
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .withColumn("cum_cf", sum($"cf").over(cum))
      .withColumn("v", count(lit(1)).over(Window.partitionBy()))
      .filter(expr("(rank & (rank - 1)) = 0 OR rank = v"))
      .crossJoin(broadcast(vocab.agg(sum($"cf").as("total"))))
      .select($"rank".as("vocab_size"), $"cum_cf".as("tokens_covered"),
        round($"cum_cf" / $"total".cast("double"), 6).as("coverage"))
      .orderBy($"vocab_size")
  }

  def vocabCoverageCurve(spark: SparkSession, dir: String): DataFrame =
    vocabCoverageCurveTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[vocabCoverageCurveTransform]]. */
  val vocabCoverageCurveOracleSql: String =
    """WITH v AS (SELECT u.tok AS tok, count(*) AS cf
      |           FROM documents, unnest(string_split(text, ' ')) AS u(tok)
      |           GROUP BY 1),
      |r AS (SELECT cf, CAST(row_number() OVER (ORDER BY cf DESC, tok) AS BIGINT) AS rank,
      |             sum(cf) OVER (ORDER BY cf DESC, tok ROWS UNBOUNDED PRECEDING) AS cum_cf,
      |             count(*) OVER () AS v
      |      FROM v),
      |t AS (SELECT sum(cf) AS total FROM v)
      |SELECT rank AS vocab_size, CAST(cum_cf AS BIGINT) AS tokens_covered,
      |       round(CAST(cum_cf AS DOUBLE) / total, 6) AS coverage
      |FROM r, t WHERE (rank & (rank - 1)) = 0 OR rank = v
      |ORDER BY 1""".stripMargin

  /** Exact-duplicate rate per source — the per-provider contamination
    * scoreboard that decides which feeds get renegotiated (the
    * corpus-wide pass is [[dedupExact]]; this splits the damage by
    * `source`): docs, distinct contents by 128-bit hash, duplicate
    * surplus, and the rate. Only (hash, source) ever shuffles — the
    * hash is computed map-side next to the scan, the text stays put.
    */
  def dupRateBySourceTransform(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"source", md5($"text").as("h"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct($"h").as("n_distinct"))
      .select($"source", $"n_docs", $"n_distinct",
        ($"n_docs" - $"n_distinct").as("n_dup_surplus"),
        round(($"n_docs" - $"n_distinct") / $"n_docs".cast("double"), 6).as("dup_rate"))
      .orderBy($"source")
  }

  def dupRateBySource(spark: SparkSession, dir: String): DataFrame =
    dupRateBySourceTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[dupRateBySourceTransform]]. */
  val dupRateBySourceOracleSql: String =
    """SELECT source, count(*) AS n_docs,
      |       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
      |       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_surplus,
      |       round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6) AS dup_rate
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-document n-gram novelty against everything that came before
    * it — the ordered-ingest freshness score a crawl-dedup pipeline
    * tracks next to full near-dup ([[graft.operators.Dedup]]): a
    * doc's DISTINCT word trigram is "novel" iff no lower-doc_id
    * document contains it (first-seen-wins on the stable ingest
    * order). Output per doc: distinct trigrams, novel count, and the
    * novelty ratio (NULL for docs under 3 words — no grams exist, and
    * 0/0 must not read as "not novel").
    *
    * Shape: explode → DISTINCT (doc, gram) → gram-keyed min-doc
    * aggregate (map-side combinable) → one join back on gram — all
    * gram-vocabulary scale after the distinct; nothing is ever
    * quadratic in docs (the all-pairs face of this question is
    * `containment_pairs`).
    */
  def ngramNoveltyTransform(docs: DataFrame, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", explode(expr(
        s"""CASE WHEN size(w) >= $n
           |THEN transform(sequence(0, size(w) - $n),
           |               i -> concat_ws(' ', slice(w, i + 1, $n)))
           |ELSE array() END""".stripMargin)).as("gram"))
      .distinct()
    val firstSeen = grams.groupBy($"gram").agg(min($"doc_id").as("first_doc"))
    val scored = grams.join(firstSeen, Seq("gram"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
    docs.select($"doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_novel", lit(0L)).as("n_novel"),
        round($"n_novel" / $"n_grams".cast("double"), 6).as("novelty"))
      .orderBy($"doc_id")
  }

  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    ngramNoveltyTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[ngramNoveltyTransform]] (n = 3). */
  val ngramNoveltyOracleSql: String =
    """WITH g AS (
      |  SELECT DISTINCT doc_id,
      |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |       unnest(range(1, len(ws) - 1)) AS t(i)),
      |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1),
      |s AS (SELECT g.doc_id, count(*) AS n_grams,
      |             sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
      |      FROM g JOIN f USING (gram) GROUP BY 1)
      |SELECT d.doc_id,
      |       CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
      |       CAST(coalesce(s.n_novel, 0) AS BIGINT) AS n_novel,
      |       round(CAST(s.n_novel AS DOUBLE) / s.n_grams, 6) AS novelty
      |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Language-mix profile per source — the homogeneity scoreboard a
    * multilingual corpus curator reads next to [[dupRateBySource]]:
    * per source its doc count, distinct LABELED languages, the
    * dominant language with its share, and the Shannon entropy
    * (bits) of the language distribution (0 = monolingual). Counts
    * are exact integers; the entropy/share floats derive from exact
    * (count, total) pairs in a fixed expression shape.
    *
    * Shape: docs collapse map-side to the |sources|×|langs| count
    * grid; windows and the final aggregate run at grid scale.
    */
  def sourceLangEntropyTransform(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy($"source", $"lang").agg(count(lit(1)).as("c"))
    val bySrc = Window.partitionBy($"source")
    counts
      .withColumn("n", sum($"c").over(bySrc))
      .withColumn("maxc", max($"c").over(bySrc))
      .withColumn("domlang", min(when($"c" === $"maxc", $"lang")).over(bySrc))
      .groupBy($"source")
      .agg(max($"n").as("n_docs"),
        count(lit(1)).as("n_langs"),
        max($"domlang").as("dominant_lang"),
        round(max($"maxc") / max($"n").cast("double"), 6).as("dominant_share"),
        // + 0.0 folds IEEE -0.0 (a monolingual source: -(1)·log2(1))
        // to +0.0 so the two engines hash identically
        round(sum(expr("-(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)")) + lit(0.0), 6)
          .as("lang_entropy_bits"))
      .orderBy($"source")
  }

  def sourceLangEntropy(spark: SparkSession, dir: String): DataFrame =
    sourceLangEntropyTransform(Tables.documents(spark, dir))

  /** Top collocations by pointwise mutual information over the
    * frequent vocabulary — the phrase-mining/compound-detection pass
    * (tokenizer merge candidates from CO-OCCURRENCE where
    * [[bpeMergeCandidatesTransform]] ranks ADJACENCY): document-level
    * co-occurrence of the top-`topTerms` terms, PMI =
    * log2(n_ab·N / (df_a·df_b)) as the single float on four exact
    * integers (identical expression → identical doubles → identical
    * ordering in both engines; ties break lexicographically), pairs
    * under `minPairDocs` docs suppressed (PMI of rare pairs is
    * noise), top `topN` reported.
    *
    * Shape: the distinct (doc, term) basis filters against the
    * BROADCAST top-vocabulary before any pairing, so the self-join
    * fans out ≤ C(topTerms, 2) per doc and aggregates map-side to a
    * ≤ topTerms² pair table — corpus-size-independent intermediate,
    * never all-pairs over the raw vocabulary.
    */
  def termPmiTransform(docs: DataFrame, topTerms: Int = 100,
                       minPairDocs: Int = 5, topN: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dt = docs.select($"doc_id", explode(array_distinct(split($"text", " "))).as("tok"))
    val dfs = dt.groupBy($"tok").agg(count(lit(1)).as("df"))
    val byDf = Window.orderBy($"df".desc, $"tok")
    val top = dfs.withColumn("r", row_number().over(byDf))
      .filter($"r" <= topTerms).select($"tok", $"df")
    val dtop = dt.join(broadcast(top), Seq("tok"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val pairs = dtop.as("a").join(dtop.as("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.tok" < $"b.tok")
      .groupBy($"a.tok".as("tok_a"), $"b.tok".as("tok_b"))
      .agg(count(lit(1)).as("n_ab"),
        first($"a.df").as("df_a"), first($"b.df").as("df_b"))
      .filter($"n_ab" >= minPairDocs)
      .crossJoin(broadcast(nDocs))
    val byPmi = Window.orderBy(
      expr("CAST(n_ab AS DOUBLE) * n_docs / (CAST(df_a AS DOUBLE) * df_b)").desc,
      $"tok_a", $"tok_b")
    pairs.withColumn("rank", row_number().over(byPmi).cast("long"))
      .filter($"rank" <= topN)
      .select($"rank", $"tok_a", $"tok_b", $"n_ab", $"df_a", $"df_b",
        expr("round(log2(CAST(n_ab AS DOUBLE) * n_docs / (CAST(df_a AS DOUBLE) * df_b)), 4)")
          .as("pmi"))
      .orderBy($"rank")
  }

  def termPmiTop(spark: SparkSession, dir: String): DataFrame =
    termPmiTransform(Tables.documents(spark, dir))

  /** Document-length histogram in power-of-two token buckets — the
    * corpus shape profile that drives chunking/packing decisions
    * (`pack_sequences` bin size, truncation cutoffs) and spots
    * boilerplate spikes: per bucket `⌊log₂(n_words+1)⌋` (exact at
    * every power-of-two boundary — the [[graft.operators.Behavior]]
    * interevent discipline) its doc count, total tokens, and closed
    * integer bounds. ≤ ~30 rows at any corpus size; one
    * map-side-combinable aggregate, no shuffle of text.
    */
  def doclenHistogramTransform(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(size(split($"text", " ")).cast("long").as("nw"))
      .select(expr("CAST(floor(log2(nw + 1)) AS BIGINT)").as("bucket"), $"nw")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"nw").as("total_words"))
      .select($"bucket",
        expr("CAST(pow(2, bucket) AS BIGINT) - 1").as("words_lo"),
        expr("CAST(pow(2, bucket + 1) AS BIGINT) - 2").as("words_hi"),
        $"n_docs", $"total_words")
      .orderBy($"bucket")
  }

  def doclenHistogram(spark: SparkSession, dir: String): DataFrame =
    doclenHistogramTransform(Tables.documents(spark, dir))

  /** Per-source coverage of a fixed top-`vocabSize` vocabulary — the
    * OOV-rate scoreboard a tokenizer/data-mix decision reads against
    * each feed ([[vocabStatsTransform]] gives the global cumulative
    * curve; this is its per-source projection): per source its token
    * stream size, tokens covered by the GLOBAL top-N vocabulary, and
    * the coverage ratio (the one float, on two exact Longs).
    *
    * Shape: (source, tok) counts collapse map-side; the global vocab
    * cut is a window over vocab-scale rows that then BROADCASTS into
    * a semi-join-shaped aggregate — the corpus never shuffles twice.
    */
  def vocabCoverageBySourceTransform(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select($"source", explode(split($"text", " ")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("cf"))
    val byFreq = Window.orderBy($"gcf".desc, $"tok")
    val vocab = toks.groupBy($"tok").agg(sum($"cf").as("gcf"))
      .withColumn("r", row_number().over(byFreq))
      .filter($"r" <= vocabSize).select($"tok")
    toks.join(broadcast(vocab.withColumn("in_vocab", lit(1L))), Seq("tok"), "left")
      .groupBy($"source")
      .agg(sum($"cf").as("total_tokens"),
        sum(when($"in_vocab".isNotNull, $"cf").otherwise(0L)).as("covered_tokens"))
      .select($"source", $"total_tokens", $"covered_tokens",
        round($"covered_tokens" / $"total_tokens".cast("double"), 6).as("coverage"))
      .orderBy($"source")
  }

  def vocabCoverageBySource(spark: SparkSession, dir: String): DataFrame =
    vocabCoverageBySourceTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[vocabCoverageBySourceTransform]]
    * (vocabSize = 1000). */
  val vocabCoverageOracleSql: String =
    """WITH t AS (SELECT source, u.tok AS tok, count(*) AS cf
      |           FROM documents, unnest(string_split(text, ' ')) AS u(tok)
      |           GROUP BY 1, 2),
      |v AS (SELECT tok FROM (
      |        SELECT tok, row_number() OVER (ORDER BY sum(cf) DESC, tok) AS r
      |        FROM t GROUP BY tok)
      |      WHERE r <= 1000)
      |SELECT t.source, CAST(sum(t.cf) AS BIGINT) AS total_tokens,
      |       CAST(sum(CASE WHEN v.tok IS NOT NULL THEN t.cf ELSE 0 END) AS BIGINT) AS covered_tokens,
      |       round(CAST(sum(CASE WHEN v.tok IS NOT NULL THEN t.cf ELSE 0 END) AS DOUBLE) / sum(t.cf), 6) AS coverage
      |FROM t LEFT JOIN v ON t.tok = v.tok
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Cross-source exact-duplicate matrix — WHERE duplicated content
    * travels ([[dupRateBySource]] says how much each feed self-dups;
    * this says which feeds copy each other — the provenance signal
    * behind licensing and crawl-overlap decisions): for every source
    * pair, the number of distinct contents (128-bit hash) present in
    * BOTH — zero-filled over the full source-pair triangle, so a
    * clean corpus reads as explicit zeros, not an empty report. Only
    * (hash, source) pairs shuffle; the pair fan-out is bounded by
    * |sources|² per hash after the distinct.
    */
  def crossSourceDupsTransform(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hs = docs.select(md5($"text").as("h"), $"source").distinct()
    val shared = hs.as("a").join(hs.as("b"),
        $"a.h" === $"b.h" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("n"))
    val srcs = docs.select($"source").distinct()
    srcs.as("x").join(srcs.as("y"), $"x.source" < $"y.source")
      .select($"x.source".as("source_a"), $"y.source".as("source_b"))
      .join(shared, Seq("source_a", "source_b"), "left")
      .select($"source_a", $"source_b",
        coalesce($"n", lit(0L)).as("n_shared_contents"))
      .orderBy($"source_a", $"source_b")
  }

  def crossSourceDups(spark: SparkSession, dir: String): DataFrame =
    crossSourceDupsTransform(Tables.documents(spark, dir))

  /** Confusion matrix of the [[langId]] heuristic against the
    * corpus's LABELED language — the eval table that decides whether
    * the n-gram marker lists are good enough to gate a feed: per
    * (true lang, predicted lang) its doc count and integer
    * basis-point share of the true language's docs (diagonal =
    * per-class recall in bp). The predictor and the oracle share the
    * marker lists verbatim, so this measures the HEURISTIC, not an
    * implementation skew.
    *
    * Shape: the langId scan collapses map-side to the ≤ |langs|²
    * confusion grid; one broadcast-back of per-lang totals.
    */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame =
    langidConfusionTransform(Tables.documents(spark, dir))

  def langidConfusionTransform(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pred = langIdTransform(docs).select($"doc_id", $"pred_lang")
    val cells = docs.select($"doc_id", $"lang")
      .join(pred, Seq("doc_id"))
      .groupBy($"lang", $"pred_lang").agg(count(lit(1)).as("n"))
    cells
      .withColumn("total", sum($"n").over(Window.partitionBy($"lang")))
      .select($"lang", $"pred_lang", $"n",
        expr("n * 10000 div total").as("share_bp"))
      .orderBy($"lang", $"pred_lang")
  }

  /** DuckDB oracle for [[langidConfusion]] — the langId oracle as a
    * subquery, joined to the labels exactly as the Spark plan joins
    * the component frames. */
  def langidConfusionOracleSql: String =
    s"""WITH p AS (SELECT doc_id, pred_lang FROM ($langIdOracleSql)),
       |c AS (SELECT d.lang, p.pred_lang, count(*) AS n
       |      FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2),
       |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1)
       |SELECT c.lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
       |       c.n * 10000 // t.total AS share_bp
       |FROM c JOIN t USING (lang)
       |ORDER BY 1, 2""".stripMargin

  /** DuckDB oracle for [[crossSourceDupsTransform]]. */
  val crossSourceDupsOracleSql: String =
    """WITH hs AS (SELECT DISTINCT md5(text) AS h, source FROM documents),
      |sh AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n
      |       FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      |       GROUP BY 1, 2),
      |s AS (SELECT DISTINCT source FROM documents)
      |SELECT x.source AS source_a, y.source AS source_b,
      |       CAST(coalesce(sh.n, 0) AS BIGINT) AS n_shared_contents
      |FROM s x JOIN s y ON x.source < y.source
      |LEFT JOIN sh ON sh.source_a = x.source AND sh.source_b = y.source
      |ORDER BY 1, 2""".stripMargin

  /** DuckDB oracle for [[doclenHistogramTransform]]. */
  val doclenHistogramOracleSql: String =
    """WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nw FROM documents),
      |b AS (SELECT CAST(floor(log2(nw + 1)) AS BIGINT) AS bucket, nw FROM d)
      |SELECT bucket,
      |       CAST(pow(2, bucket) AS BIGINT) - 1 AS words_lo,
      |       CAST(pow(2, bucket + 1) AS BIGINT) - 2 AS words_hi,
      |       count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS total_words
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[termPmiTransform]] (topTerms = 100,
    * minPairDocs = 5, topN = 50). */
  val termPmiOracleSql: String =
    """WITH dt AS (SELECT DISTINCT doc_id, u.tok AS tok
      |            FROM documents, unnest(string_split(text, ' ')) AS u(tok)),
      |dfs AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
      |top AS (SELECT tok, df FROM (SELECT *, row_number() OVER (ORDER BY df DESC, tok) AS r FROM dfs)
      |        WHERE r <= 100),
      |dtop AS (SELECT dt.doc_id, dt.tok, top.df FROM dt JOIN top USING (tok)),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |p AS (SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab,
      |             min(a.df) AS df_a, min(b.df) AS df_b
      |      FROM dtop a JOIN dtop b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |      GROUP BY 1, 2 HAVING count(*) >= 5),
      |r AS (SELECT p.*, n.n_docs,
      |             row_number() OVER (ORDER BY CAST(n_ab AS DOUBLE) * n.n_docs / (CAST(df_a AS DOUBLE) * df_b) DESC,
      |                                tok_a, tok_b) AS rank
      |      FROM p, n)
      |SELECT CAST(rank AS BIGINT) AS rank, tok_a, tok_b,
      |       CAST(n_ab AS BIGINT) AS n_ab, CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
      |       round(log2(CAST(n_ab AS DOUBLE) * n_docs / (CAST(df_a AS DOUBLE) * df_b)), 4) AS pmi
      |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin

  /** DuckDB oracle for [[sourceLangEntropyTransform]]. */
  val sourceLangEntropyOracleSql: String =
    """WITH c AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
      |w AS (SELECT source, lang, c,
      |             CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n,
      |             CAST(max(c) OVER (PARTITION BY source) AS BIGINT) AS maxc
      |      FROM c),
      |d AS (SELECT source, min(CASE WHEN c = maxc THEN lang END) AS domlang FROM w GROUP BY 1)
      |SELECT w.source, max(w.n) AS n_docs, count(*) AS n_langs,
      |       max(d.domlang) AS dominant_lang,
      |       round(CAST(max(w.maxc) AS DOUBLE) / max(w.n), 6) AS dominant_share,
      |       round(sum(-(CAST(w.c AS DOUBLE) / w.n) * log2(CAST(w.c AS DOUBLE) / w.n)) + 0.0, 6) AS lang_entropy_bits
      |FROM w JOIN d USING (source)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Gopher-style hard quality GATES (Rae et al. 2021 §A1.1), the
    * boolean-rule complement of [[textQuality]]'s composite score:
    * each doc passes/fails four independent rules — word count,
    * mean word length band, type-token ratio, max single-word
    * fraction — and the per-source report counts survivors per rule
    * and overall (the filter-funnel a corpus curator reads before
    * choosing thresholds). Thresholds are corpus-calibrated so every
    * gate actually discriminates here (sf0.01: words 10–99, mwl
    * 3.7–5.3, ttr .28–1.0, rep .05–.30).
    *
    * Every rule is an INTEGER cross-multiplication
    * (`10·n_alpha ≥ 42·n_words`, not `mean ≥ 4.2`) so both engines
    * compare exactly — no float boundary can flip a count. All four
    * features are per-row array ops (the repetition max is
    * `transform(distinct, w → count)`, O(distinct·words) per row,
    * zero shuffle — vs [[textRepetition]]'s corpus-wide explode);
    * the only exchange is the |sources|-row count aggregate. */
  def gopherGates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("ws", split($"text", " "))
      .withColumn("n_words", size($"ws").cast("long"))
      .withColumn("n_alpha", length(regexp_replace($"text", " ", "")).cast("long"))
      .withColumn("n_distinct", size(array_distinct($"ws")).cast("long"))
      .withColumn("max_cnt", array_max(transform(array_distinct($"ws"),
        w => size(filter($"ws", x => x === w)))).cast("long"))
      .select($"source",
        ($"n_words" >= 30).as("g_wc"),
        ($"n_alpha" * 10 >= $"n_words" * 42 && $"n_alpha" <= $"n_words" * 10).as("g_mwl"),
        ($"n_distinct" * 10 >= $"n_words" * 4).as("g_ttr"),
        ($"max_cnt" * 10 <= $"n_words").as("g_rep"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"g_wc", 1L).otherwise(0L)).as("n_pass_wc"),
        sum(when($"g_mwl", 1L).otherwise(0L)).as("n_pass_mwl"),
        sum(when($"g_ttr", 1L).otherwise(0L)).as("n_pass_ttr"),
        sum(when($"g_rep", 1L).otherwise(0L)).as("n_pass_rep"),
        sum(when($"g_wc" && $"g_mwl" && $"g_ttr" && $"g_rep", 1L).otherwise(0L)).as("n_pass_all"))
      .orderBy($"source")
  }

  /** Oracle for [[gopherGates]] — identical integer-exact rules. */
  val gopherGatesOracleSql: String =
    """WITH s AS (
      |  SELECT source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |         CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
      |              w -> len(list_filter(string_split(text, ' '), x -> x = w)))) AS BIGINT) AS max_cnt
      |  FROM documents),
      |g AS (SELECT source,
      |             n_words >= 30 AS g_wc,
      |             n_alpha * 10 >= n_words * 42 AND n_alpha <= n_words * 10 AS g_mwl,
      |             n_distinct * 10 >= n_words * 4 AS g_ttr,
      |             max_cnt * 10 <= n_words AS g_rep
      |      FROM s)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN g_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_wc,
      |       CAST(sum(CASE WHEN g_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_mwl,
      |       CAST(sum(CASE WHEN g_ttr THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_ttr,
      |       CAST(sum(CASE WHEN g_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_rep,
      |       CAST(sum(CASE WHEN g_wc AND g_mwl AND g_ttr AND g_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** Flesch reading-ease per source — the READABILITY axis of the
    * corpus-mix dashboard (quality gates ask "is it junk", this asks
    * "what register is it": a source drifting from 70 to 40 switched
    * from conversational to academic text even if every gate still
    * passes): FRE = 206.835 − 1.015·(words/sentence) −
    * 84.6·(syllables/word), with syllables counted by the standard
    * vowel-group heuristic (runs of [aeiouy] per word, floor 1 —
    * ±1 syllable on silent-e words, systematic and engine-identical,
    * fine for a corpus-level register signal).
    *
    * Tokenization shared with the neighbors: sentences =
    * `[.!?]+` splits trimmed non-empty ([[sentenceStatsTransform]]),
    * words = lowercase letter runs. All three counts are exact
    * integers summed per source; the two ratios and FRE are single
    * floats at output. Shape: per-doc counts map-side, ONE
    * map-side-combinable shuffle to |sources| rows. */
  def fleschReadingEaseTransform(docs: DataFrame): DataFrame =
    fleschFromSums(fleschDocCounts(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sent")).as("n_sentences"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_syll")).as("n_syllables")))

  /** Per-doc exact counts — the additive half the streaming face
    * sums into its per-source state. */
  private[graft] def fleschDocCounts(docs: DataFrame): DataFrame = docs
    .select(col("source"),
      expr("CAST(size(filter(transform(split(text, '[.!?]+'), s -> trim(s)), s -> s != '')) AS BIGINT)")
        .as("n_sent"),
      expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("words"))
    .select(col("source"), col("n_sent"),
      expr("CAST(size(words) AS BIGINT)").as("n_words"),
      expr("CAST(aggregate(words, 0L, (acc, w) -> acc + greatest(1L, CAST(size(regexp_extract_all(w, '[aeiouy]+', 0)) AS BIGINT))) AS BIGINT)")
        .as("n_syll"))

  /** The FRE read from the per-source exact sums. */
  private[graft] def fleschFromSums(sums: DataFrame): DataFrame = sums
    .select(col("source"), col("n_docs"), col("n_sentences"), col("n_words"),
      col("n_syllables"),
      expr("""CASE WHEN n_sentences > 0 AND n_words > 0 THEN
             |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             |                - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
             |END""".stripMargin).as("fre"))
    .orderBy(col("source"))

  def fleschReadingEase(spark: SparkSession, dir: String): DataFrame =
    fleschReadingEaseTransform(Tables.documents(spark, dir))

  /** DuckDB oracle for [[fleschReadingEaseTransform]]. */
  val fleschReadingEaseOracleSql: String =
    """WITH d AS (
      |  SELECT source,
      |         len(list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'), x -> trim(x)),
      |                         x -> x != '')) AS n_sent,
      |         regexp_extract_all(lower(text), '[a-z]+') AS words
      |  FROM documents),
      |c AS (
      |  SELECT source, n_sent, len(words) AS n_words,
      |         coalesce(list_sum(list_transform(words,
      |           w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0) AS n_syll
      |  FROM d),
      |a AS (SELECT source, count(*) AS n_docs, sum(n_sent) AS n_sentences,
      |             sum(n_words) AS n_words, sum(n_syll) AS n_syllables
      |      FROM c GROUP BY 1)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |       CAST(n_sentences AS BIGINT) AS n_sentences,
      |       CAST(n_words AS BIGINT) AS n_words,
      |       CAST(n_syllables AS BIGINT) AS n_syllables,
      |       CASE WHEN n_sentences > 0 AND n_words > 0 THEN
      |         round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |                       - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
      |       END AS fre
      |FROM a ORDER BY 1""".stripMargin
}