package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-assembly operators: the deterministic selection / split /
  * packing layer of a training-data pipeline, downstream of the
  * cleaning and dedup passes.
  *
  * Everything here keys off ONE salted content-free hash
  * ([[splitHash]]): a 32-bit value derived from `md5(doc_id:salt)`.
  * Determinism is the point — re-running the pipeline on a grown
  * corpus must keep every previously-assigned document in the same
  * split/sample/bucket (no `rand()`, no sampling that depends on
  * partition layout or row order), and the hash is cheap enough to
  * recompute map-side anywhere it is needed. All four operators are
  * single-scan, shuffle-free or narrow-shuffle plans.
  */
object Sampling {

  /** Deterministic uniform hash in [0, 2^32): first 8 hex chars of
    * `md5(doc_id ++ ":" ++ salt)`. md5 is bit-identical across
    * engines, which is what makes the DuckDB oracles exact. */
  def splitHash(docId: Column, salt: String): Column =
    conv(substring(md5(concat(docId.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long")

  /** Deterministic train/val/test assignment: `h mod 100` buckets the
    * corpus into testPct / valPct / rest. Stable under corpus growth
    * (a document's split never changes when new documents arrive),
    * content-free (near-duplicate texts land in independent splits —
    * leakage control belongs to the dedup pass, not the splitter),
    * and embarrassingly parallel: one scan, no shuffle before the
    * ordered output. */
  def trainTestSplit(spark: SparkSession, dir: String,
                     valPct: Int = 5, testPct: Int = 5,
                     salt: String = "graft"): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        (splitHash($"doc_id", salt) % 100).as("h"))
      .withColumn("split",
        when($"h" < testPct, "test")
          .when($"h" < testPct + valPct, "val")
          .otherwise("train"))
      .select($"doc_id", $"source", $"split")
      .orderBy($"doc_id")
  }

  /** Per-source stratified sampling with deterministic membership:
    * keep a document iff `h / 2^32 < rate(source)`. The rate here is
    * derived from the source name (source `srcN` keeps (N+1)/21 of
    * its documents) so the operator is parameter-free for the
    * harness; production passes an explicit rate table and joins or
    * maps it the same way. Exactly-reproducible sampling at any
    * scale: one scan, the filter runs map-side, and membership never
    * depends on what else is in the corpus. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       salt: String = "graft"): DataFrame = {
    import spark.implicits._
    val rate = (substring($"source", 4, 10).cast("int") + 1).cast("double") / lit(21.0)
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        (splitHash($"doc_id", salt).cast("double") / lit(4294967296.0)).as("u"))
      .filter($"u" < rate)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** Weight-proportional Bernoulli sampling with EXACT integer
    * membership — the data-mixing selector between
    * [[stratifiedSample]]'s fixed per-source rates and
    * [[corpusMix]]'s proportion targets: each document is kept with
    * probability `targetK · w / Σw` (expected sample size `targetK`,
    * inclusion proportional to weight — here doc length, the usual
    * token-budget weighting; production swaps in any quality score).
    *
    * Membership is the pure integer comparison
    * {{{ h · Σw < targetK · w · 2³² }}}
    * with `h` = [[splitHash]] ∈ [0, 2³²) — no floats, no `pow`, so
    * the sample is bit-identical in any engine (the DuckDB oracle
    * runs the same multiplication) and stable per document under
    * corpus growth EXCEPT through the global Σw term, which is the
    * point of weighted sampling (rates renormalize as the corpus
    * grows; a grown corpus dilutes every inclusion probability).
    *
    * Scale shape: Σw is a one-row global aggregate broadcast into the
    * filter (the one-row-stats-broadcast pattern the plan audit
    * allows); membership then runs map-side on the scan. Long
    * headroom: h·Σw < 2³²·Σw — overflow-safe up to Σw ≈ 2⁶² ⁻ ³²
    * ≈ 10⁹ total weight units; a 100 TB corpus promotes the product
    * to DECIMAL(38,0) (one cast in both engines).
    */
  def weightedSample(spark: SparkSession, dir: String,
                     targetK: Int = 500, salt: String = "graft"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", greatest($"n_chars", lit(1L)).as("weight"))
    val total = docs.agg(sum($"weight").as("total"))
    docs.crossJoin(total)
      .filter(splitHash($"doc_id", salt) * $"total"
        < lit(targetK.toLong) * $"weight" * lit(4294967296L))
      .select($"doc_id", $"source", $"weight")
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[weightedSample]] — the identical integer
    * comparison (UBIGINT hash, BIGINT products). */
  def weightedSampleOracleSql(targetK: Int = 500, salt: String = "graft"): String =
    s"""WITH d AS (SELECT doc_id, source,
       |                  CAST(greatest(n_chars, 1) AS BIGINT) AS weight,
       |                  CAST(('0x' || substr(md5(doc_id || ':$salt'), 1, 8))::UBIGINT AS BIGINT) AS h
       |           FROM documents),
       |t AS (SELECT CAST(sum(weight) AS BIGINT) AS total FROM d)
       |SELECT doc_id, source, weight
       |FROM d, t
       |WHERE h * total < $targetK * weight * 4294967296
       |ORDER BY doc_id""".stripMargin

  /** Concat-then-chunk sequence packing: assign every document a
    * position in a fixed-size token stream, the way LLM pretraining
    * shards pack documents into context windows.
    *
    * Documents are hashed into `nBuckets` independent streams
    * (bucket = parallelism unit — at warehouse scale this is
    * thousands, one per writer task); within a bucket the
    * deterministic doc_id order fixes the layout, a window cumsum
    * over BPE-ish token counts yields each document's start offset,
    * and chunk ids are `offset / windowTokens`. The only shuffle is
    * the per-bucket repartition+sort that any sharded writer needs;
    * token counting runs map-side (same codegen'd regexp as
    * [[TextOps.tokenCount]]).
    *
    * Output: one row per document with its bucket, token count,
    * start offset, and the first/last window chunk it lands in
    * (`n_chunks` = how many windows the document spans — the
    * packing efficiency signal). */
  def packSequences(spark: SparkSession, dir: String,
                    windowTokens: Int = 2048, nBuckets: Int = 16,
                    salt: String = "graft"): DataFrame = {
    import spark.implicits._
    val toks = size(regexp_extract_all($"text", lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
      .cast("long")
    val w = Window.partitionBy($"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select($"doc_id",
        (splitHash($"doc_id", salt) % nBuckets).as("bucket"),
        toks.as("n_tokens"))
      .withColumn("start_offset", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("chunk_first", ($"start_offset" / windowTokens).cast("long"))
      .withColumn("chunk_last",
        (($"start_offset" + greatest($"n_tokens", lit(1L)) - 1) / windowTokens).cast("long"))
      .withColumn("n_chunks", $"chunk_last" - $"chunk_first" + 1)
      .select($"doc_id", $"bucket", $"n_tokens", $"start_offset",
        $"chunk_first", $"chunk_last", $"n_chunks")
      .orderBy($"doc_id")
  }

  /** Overlapping token-window chunking — the embedding/RAG prep stage
    * next to [[packSequences]]'s pretraining layout: each document
    * splits into windows of `window` tokens advancing by `stride`
    * (overlap = window − stride keeps context across cuts), the last
    * chunk clamped to the doc end, short docs yielding exactly one
    * chunk. Chunk text is reported as md5 (byte-exact across
    * engines, compact output).
    *
    * Pure per-row arithmetic: chunk count and spans derive from
    * size(words) alone, the explode emits output-sized rows, and
    * nothing shuffles before the ordered output — embarrassingly
    * parallel at any corpus size. */
  def docChunking(spark: SparkSession, dir: String,
                  window: Int = 64, stride: Int = 48): DataFrame = {
    import spark.implicits._
    require(stride > 0 && stride <= window, "need 0 < stride <= window")
    Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("words"))
      .withColumn("n_tokens", size($"words").cast("long"))
      // 1 chunk when n <= window, else 1 + ceil((n - window) / stride)
      .withColumn("n_chunks",
        expr(s"(greatest(n_tokens - $window, 0) + ${stride - 1}) div $stride") + 1)
      .select($"doc_id", $"words", $"n_tokens", $"n_chunks",
        explode(sequence(lit(0L), $"n_chunks" - 1)).as("chunk_id"))
      .withColumn("c_start", $"chunk_id" * stride + 1)
      .withColumn("c_end", least($"c_start" + lit(window.toLong - 1), $"n_tokens"))
      .select($"doc_id", $"chunk_id", $"n_tokens", $"n_chunks", $"c_start", $"c_end",
        ($"c_end" - $"c_start" + 1).as("chunk_tokens"),
        md5(concat_ws(" ", slice($"words", $"c_start".cast("int"),
          ($"c_end" - $"c_start" + 1).cast("int")))).as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** DuckDB oracle for [[docChunking]] — same chunk arithmetic, same
    * md5 over the sliced tokens. */
  def docChunkingOracleSql(window: Int = 64, stride: Int = 48): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |t AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens,
       |             CAST((greatest(len(ws) - $window, 0) + ${stride - 1}) // $stride + 1 AS BIGINT) AS n_chunks
       |      FROM d),
       |c AS (SELECT doc_id, ws, n_tokens, n_chunks, CAST(u.ci AS BIGINT) AS chunk_id
       |      FROM t, unnest(range(0, n_chunks)) AS u(ci))
       |SELECT doc_id, chunk_id, n_tokens, n_chunks,
       |       chunk_id * $stride + 1 AS c_start,
       |       least(chunk_id * $stride + $window, n_tokens) AS c_end,
       |       least(chunk_id * $stride + $window, n_tokens) - chunk_id * $stride AS chunk_tokens,
       |       md5(array_to_string(ws[(chunk_id * $stride + 1):least(chunk_id * $stride + $window, n_tokens)], ' ')) AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** Benchmark-contamination scan: flag corpus documents sharing any
    * word n-gram with a held-out evaluation set.
    *
    * The eval set here is the deterministic `h mod 100 < evalPct`
    * slice of the corpus (standing in for an external benchmark
    * file); its distinct n-grams form the SMALL side and broadcast.
    * Corpus documents explode to (doc_id, ngram) map-side and
    * hash-join the broadcast set — the corpus itself never shuffles,
    * so the scan is the same shape at 100 TB (the eval-gram set of
    * any real benchmark suite is a few million strings — broadcast
    * territory). Output: contaminated documents with the count of
    * distinct shared n-grams. */
  def ngramContamination(spark: SparkSession, dir: String,
                         n: Int = 8, evalPct: Int = 10,
                         salt: String = "graft"): DataFrame = {
    import spark.implicits._
    // distinct word n-grams of the `text` column (docs shorter than n
    // words contribute their whole text as one gram)
    val grams: Column = expr(
      s"""array_distinct(transform(
         |  sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)),
         |  i -> array_join(slice(split(text, ' '), i, $n), ' ')))""".stripMargin)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", (splitHash($"doc_id", salt) % 100).as("h"))
    val evalGrams = docs.filter($"h" < evalPct)
      .select(explode(grams).as("gram"))
      .distinct()
    val corpusGrams = docs.filter($"h" >= evalPct)
      .select($"doc_id", explode(grams).as("gram"))
    corpusGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy($"doc_id").agg(countDistinct($"gram").as("n_shared_ngrams"))
      .orderBy($"doc_id")
  }

  /** The removal half of [[ngramContamination]] (the
    * [[Dedup.dedupSubstringRemove]] pattern applied to eval
    * decontamination): EVERY corpus document with its shared-eval-gram
    * count and the keep/drop verdict under a zero-tolerance threshold
    * — the stage that actually produces the decontaminated training
    * corpus rather than just the contamination report. Same broadcast
    * eval-gram set, same single corpus scan; the report join is a
    * LEFT join so clean documents (the vast majority) surface with
    * count 0 rather than being absent.
    */
  def decontaminate(spark: SparkSession, dir: String,
                    n: Int = 8, evalPct: Int = 10,
                    salt: String = "graft", maxShared: Long = 0L): DataFrame = {
    import spark.implicits._
    val grams: Column = expr(
      s"""array_distinct(transform(
         |  sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)),
         |  i -> array_join(slice(split(text, ' '), i, $n), ' ')))""".stripMargin)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", (splitHash($"doc_id", salt) % 100).as("h"))
    val evalGrams = docs.filter($"h" < evalPct)
      .select(explode(grams).as("gram"))
      .distinct()
    val corpus = docs.filter($"h" >= evalPct)
    val shared = corpus.select($"doc_id", explode(grams).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy($"doc_id").agg(countDistinct($"gram").as("n_shared_ngrams"))
    corpus.select($"doc_id")
      .join(shared, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_shared_ngrams", lit(0L)).as("n_shared_ngrams"))
      .withColumn("kept", $"n_shared_ngrams" <= maxShared)
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[decontaminate]]. */
  def decontaminateOracleSql(maxShared: Long = 0L): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
       |                  ('0x' || substr(md5(doc_id || ':graft'), 1, 8))::UBIGINT % 100 AS hv
       |           FROM documents),
       |g AS (SELECT doc_id, hv,
       |             list_distinct(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
       |               i -> array_to_string(w[i:i+7], ' '))) AS grams
       |      FROM d),
       |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE hv < 10),
       |cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE hv >= 10),
       |sh AS (SELECT cg.doc_id, CAST(count(DISTINCT cg.gram) AS BIGINT) AS n_shared_ngrams
       |       FROM cg JOIN eg ON cg.gram = eg.gram GROUP BY 1)
       |SELECT c.doc_id, coalesce(sh.n_shared_ngrams, 0) AS n_shared_ngrams,
       |       coalesce(sh.n_shared_ngrams, 0) <= $maxShared AS kept
       |FROM (SELECT doc_id FROM g WHERE hv >= 10) c
       |LEFT JOIN sh ON c.doc_id = sh.doc_id
       |ORDER BY c.doc_id""".stripMargin

  /** Weighted source mixing to a target budget (the Pile / Dolma
    * "mixture" stage): the corpus is downsampled to `budgetNum /
    * budgetDen` of its size, with each source's share of the budget
    * proportional to its mixture weight, and membership decided by
    * the same deterministic [[splitHash]] as every other selection
    * stage. Unlike [[stratifiedSample]] (fixed per-source rates,
    * parameter-only), the rates here are DERIVED FROM DATA: a
    * |sources|-row count aggregate feeds the per-source target
    * `target_s = (N·num div den) · w_s div Σw`, then broadcasts back
    * onto the scan. The keep test is pure 64-bit integer arithmetic
    * — `h·n_s < target_s·2^32` ⇔ `h/2^32 < target_s/n_s` — so the
    * DuckDB oracle is bit-exact with zero FP-rate comparisons.
    * (Bounds: h < 2^32 and target_s ≤ n_s keep both products under
    * Long.Max up to ~2·10^9 docs per source; beyond that, widen to
    * DECIMAL.) Weights are demo-derived from the source name
    * (`srcN` → N mod 3 + 1); production joins a real weight table
    * through the identical plan. A source whose target exceeds its
    * size keeps everything (rate caps at 1 by construction since
    * Σ target_s ≤ budget < N only redistributes via the div floor).
    *
    * Scale shape: one tiny aggregate + broadcast back + one
    * map-side filter — the fact table never shuffles. */
  def corpusMix(spark: SparkSession, dir: String,
                budgetNum: Int = 2, budgetDen: Int = 5,
                salt: String = "graft-mix"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val counts = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_s"))
      .withColumn("w", expr("CAST(substring(source, 4) AS BIGINT) % 3 + 1"))
    val totals = counts.agg(sum($"n_s").as("n_tot"), sum($"w").as("w_tot"))
    val rates = counts.crossJoin(totals)
      .select($"source", $"n_s",
        expr(s"((n_tot * $budgetNum div $budgetDen) * w) div w_tot").as("target_s"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(splitHash($"doc_id", salt) * $"n_s" < $"target_s" * lit(4294967296L))
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[corpusMix]] — same counts, same integer
    * targets, same md5-derived hash test. */
  def corpusMixOracleSql(budgetNum: Int = 2, budgetDen: Int = 5,
                         salt: String = "graft-mix"): String =
    s"""WITH d AS (SELECT doc_id, source FROM documents),
       |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s,
       |             CAST(substring(source, 4) AS BIGINT) % 3 + 1 AS w
       |      FROM d GROUP BY 1),
       |t AS (SELECT sum(n_s) AS n_tot, sum(w) AS w_tot FROM c),
       |r AS (SELECT source, n_s,
       |             ((n_tot * $budgetNum // $budgetDen) * w) // w_tot AS target_s
       |      FROM c CROSS JOIN t),
       |h AS (SELECT doc_id, d.source, n_s, target_s,
       |             CAST(('0x' || substr(md5(doc_id || ':$salt'), 1, 8))::UBIGINT AS BIGINT) AS hv
       |      FROM d JOIN r ON d.source = r.source)
       |SELECT doc_id, source FROM h
       |WHERE hv * n_s < target_s * 4294967296
       |ORDER BY doc_id""".stripMargin

  /** Temperature-scaled source mixing (Conneau & Lample 2019's
    * multilingual α-sampling, α = 1/2): where [[corpusMix]] takes
    * mixture weights as GIVEN, here the weight IS the source's size
    * raised to α — `w_s ∝ √n_s` — which upsamples small sources and
    * tempers head sources, the standard fix for a skewed multilingual
    * or multi-domain corpus. Weights stay integer-exact:
    * `w_s = ⌊√(n_s·10⁶)⌋` (IEEE sqrt of an exact int is correctly
    * rounded, so the floor is the true integer square root in both
    * engines); the target/keep machinery is [[corpusMix]]'s 64-bit
    * integer test verbatim. Same scale shape: |sources|-row
    * aggregate, broadcast back, map-side filter — the fact never
    * shuffles. */
  def corpusMixTemperature(spark: SparkSession, dir: String,
                           budgetNum: Int = 2, budgetDen: Int = 5,
                           salt: String = "graft-mix-temp"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val counts = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_s"))
      .withColumn("w", expr("CAST(floor(sqrt(CAST(n_s AS DOUBLE) * 1000000)) AS BIGINT)"))
    val totals = counts.agg(sum($"n_s").as("n_tot"), sum($"w").as("w_tot"))
    val rates = counts.crossJoin(totals)
      .select($"source", $"n_s",
        expr(s"((n_tot * $budgetNum div $budgetDen) * w) div w_tot").as("target_s"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(splitHash($"doc_id", salt) * $"n_s" < $"target_s" * lit(4294967296L))
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[corpusMixTemperature]]. */
  def corpusMixTemperatureOracleSql(budgetNum: Int = 2, budgetDen: Int = 5,
                                    salt: String = "graft-mix-temp"): String =
    s"""WITH d AS (SELECT doc_id, source FROM documents),
       |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s,
       |             CAST(floor(sqrt(CAST(count(*) AS DOUBLE) * 1000000)) AS BIGINT) AS w
       |      FROM d GROUP BY 1),
       |t AS (SELECT sum(n_s) AS n_tot, sum(w) AS w_tot FROM c),
       |r AS (SELECT source, n_s,
       |             ((n_tot * $budgetNum // $budgetDen) * w) // w_tot AS target_s
       |      FROM c CROSS JOIN t),
       |h AS (SELECT doc_id, d.source, n_s, target_s,
       |             CAST(('0x' || substr(md5(doc_id || ':$salt'), 1, 8))::UBIGINT AS BIGINT) AS hv
       |      FROM d JOIN r ON d.source = r.source)
       |SELECT doc_id, source FROM h
       |WHERE hv * n_s < target_s * 4294967296
       |ORDER BY doc_id""".stripMargin

  /** Per-domain frequency cap (the RefinedWeb/CCNet domain-balancing
    * stage): no source may contribute more than `capPct` percent of
    * the corpus — a handful of giant crawl domains otherwise dominate
    * the training mixture. Sources under the cap keep everything;
    * over-cap sources keep exactly `cap = floor(N·capPct/100)`
    * documents, chosen by the same deterministic [[splitHash]]
    * permutation every other selection stage uses (a uniformly random
    * but reproducible within-domain sample, NOT a prefix — prefix
    * truncation would bias toward crawl order).
    *
    * Differs from its two neighbours by where the budget comes from:
    * [[sampleKPerGroup]] takes a fixed per-group k (parameter),
    * [[corpusMix]] derives per-source Bernoulli rates from weights;
    * the cap here is an exact COUNT derived from the global corpus
    * size, so the output is an exact guarantee ("≤ cap docs per
    * domain"), not an expectation.
    *
    * Scale shape: one |sources|-free one-row count broadcast back,
    * then one shuffle on `source` for the per-domain rank window —
    * partitionBy(source), never a global window. The hot-domain skew
    * case (one domain = half the corpus) is exactly what AQE skew
    * splitting plus the documented rank alternatives absorb: when
    * `cap ≪ n_s` swap the full sort for the bounded-heap `graft_topk`
    * aggregate over `h`; when `cap` is large, locate the h-threshold
    * via a sampled quantile (#19 slice-locate) and filter map-side —
    * same result, no full per-domain sort. */
  def domainFrequencyCap(spark: SparkSession, dir: String, capPct: Int = 3,
                         salt: String = "graft-domcap"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", splitHash($"doc_id", salt).as("h"))
    val cap = docs.agg(expr(s"CAST(count(1) * $capPct div 100 AS BIGINT)").as("cap"))
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(cap))
      .select($"doc_id", $"source", ($"rk" <= $"cap").as("kept"))
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[domainFrequencyCap]] — same md5 permutation,
    * same integer cap. */
  def domainFrequencyCapOracleSql(capPct: Int = 3,
                                  salt: String = "graft-domcap"): String =
    s"""WITH d AS (SELECT doc_id, source,
       |                  CAST(('0x' || substr(md5(doc_id || ':$salt'), 1, 8))::UBIGINT AS BIGINT) AS h
       |           FROM documents),
       |c AS (SELECT CAST(count(*) * $capPct // 100 AS BIGINT) AS cap FROM d),
       |r AS (SELECT doc_id, source,
       |             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
       |      FROM d)
       |SELECT doc_id, source, rk <= (SELECT cap FROM c) AS kept
       |FROM r ORDER BY doc_id""".stripMargin

  /** Fuzzy (MinHash) decontamination — [[decontaminate]]'s exact
    * 8-gram test misses eval items that were lightly paraphrased or
    * truncated into the corpus; this variant flags any corpus
    * document whose 3-shingle Jaccard with ANY eval item reaches
    * `threshold`, found through the SAME banded-LSH screening core as
    * [[Dedup.dedupIncremental]] (corpus side × eval side, never
    * corpus × corpus: candidates carry (id, band, band_hash) only,
    * survivors verify with exact shingle Jaccard, so the output
    * equals the all-pairs oracle by the 32×2-band recall argument).
    * The eval set is the same deterministic `h mod 100 < evalPct`
    * slice [[decontaminate]] uses, so the two reports compose.
    *
    * Output is the corpus-production report: every training document
    * with its verdict (`exact_contaminated` — byte-identical to an
    * eval item; `fuzzy_contaminated` — best eval match ≥ threshold;
    * `clean`), the matched eval doc, the Jaccard, and the keep flag.
    *
    * 100 TB shape: the eval side is the tiny one (a benchmark suite,
    * a few 10⁵ items) — its signature/band table broadcasts into the
    * band join, and the training corpus streams through map-side
    * banding exactly once. */
  def decontaminateFuzzy(spark: SparkSession, dir: String,
                         threshold: Double = 0.5, evalPct: Int = 10,
                         salt: String = "graft"): DataFrame = {
    import spark.implicits._
    val hv = splitHash($"doc_id", salt) % 100
    val corpus = Tables.documents(spark, dir)
      .filter(hv >= evalPct).select($"doc_id", $"text")
    Dedup.screenBatch(spark, dir, corpus, threshold,
        batchPct = 100 - evalPct, salt = salt)
      .select($"doc_id",
        when($"verdict" === "exact_dup", "exact_contaminated")
          .when($"verdict" === "near_dup", "fuzzy_contaminated")
          .otherwise("clean").as("verdict"),
        $"dup_of".as("matched_eval"), $"jaccard")
      .withColumn("kept", $"verdict" === "clean")
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[decontaminateFuzzy]] — all-pairs
    * corpus × eval shingle Jaccard plus the md5 exact layer (the
    * [[Dedup.dedupIncrementalOracleSql]] shape with the eval slice as
    * the match-against side and contamination verdict names). */
  def decontaminateFuzzyOracleSql(threshold: Double = 0.5,
                                  evalPct: Int = 10): String =
    s"""WITH h AS (SELECT doc_id, text, md5(text) AS ch,
       |                  ('0x' || substr(md5(doc_id || ':graft'), 1, 8))::UBIGINT % 100 AS hv
       |           FROM documents),
       |ex AS (SELECT b.doc_id, min(c.doc_id) AS exact_of
       |       FROM h b JOIN h c ON b.ch = c.ch AND b.hv >= $evalPct AND c.hv < $evalPct
       |       GROUP BY b.doc_id),
       |sh AS (SELECT doc_id, hv,
       |              list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
       |                i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
       |       FROM h),
       |near AS (SELECT bb.doc_id, cc.doc_id AS c_id,
       |                round(CAST(len(list_intersect(bb.s, cc.s)) AS DOUBLE)
       |                      / (len(bb.s) + len(cc.s) - len(list_intersect(bb.s, cc.s))), 4) AS j
       |         FROM sh bb JOIN sh cc ON bb.hv >= $evalPct AND cc.hv < $evalPct),
       |nbest AS (SELECT doc_id, c_id AS near_of, j,
       |                 row_number() OVER (PARTITION BY doc_id ORDER BY j DESC, c_id) AS rk
       |          FROM near WHERE j >= $threshold)
       |SELECT h.doc_id,
       |       CASE WHEN ex.exact_of IS NOT NULL THEN 'exact_contaminated'
       |            WHEN nb.near_of IS NOT NULL THEN 'fuzzy_contaminated'
       |            ELSE 'clean' END AS verdict,
       |       COALESCE(ex.exact_of, nb.near_of) AS matched_eval,
       |       CASE WHEN ex.exact_of IS NULL THEN nb.j END AS jaccard,
       |       ex.exact_of IS NULL AND nb.near_of IS NULL AS kept
       |FROM h LEFT JOIN ex ON h.doc_id = ex.doc_id
       |       LEFT JOIN (SELECT * FROM nbest WHERE rk = 1) nb ON h.doc_id = nb.doc_id
       |WHERE h.hv >= $evalPct
       |ORDER BY h.doc_id""".stripMargin

  /** Exactly-k-per-group deterministic sampling (eval-set
    * construction: "pick k examples from every source"): rank each
    * group's rows by the same [[splitHash]] order every other
    * selection stage uses — a uniformly random but reproducible
    * permutation — and keep the first `k`. Complements
    * [[stratifiedSample]] (per-group RATES, binomial sizes) with
    * exact per-group COUNTS.
    *
    * One shuffle on the group key for the rank window; partitions
    * are balanced per group and each emits ≤ k rows. A group with
    * < k rows keeps all of them. At extreme per-group cardinality
    * the window sort is replaced by the bounded-heap `graft_topk`
    * aggregate ([[graft.functions.TopKAggregate]]) over the hash —
    * same result, ≤k-entry buffers through the shuffle.
    */
  def sampleKPerGroup(spark: SparkSession, dir: String, k: Int = 25,
                      salt: String = "graft-evalk"): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"h", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", splitHash($"doc_id", salt).as("h"))
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter($"pick" <= k)
      .select($"source", $"pick", $"doc_id")
      .orderBy($"source", $"pick")
  }

  /** DuckDB oracle for [[sampleKPerGroup]] — same md5 permutation. */
  def sampleKPerGroupOracleSql(k: Int = 25, salt: String = "graft-evalk"): String =
    s"""WITH h AS (SELECT doc_id, source,
       |                  CAST(('0x' || substr(md5(doc_id || ':$salt'), 1, 8))::UBIGINT AS BIGINT) AS h
       |           FROM documents),
       |r AS (SELECT source, doc_id,
       |             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS pick
       |      FROM h)
       |SELECT source, CAST(pick AS BIGINT) AS pick, doc_id
       |FROM r WHERE pick <= $k ORDER BY source, pick""".stripMargin

  /** Poisson bootstrap of the mean event value — THE warehouse-scale
    * bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
    * Data Streams", Google TR 2012; Kleiner et al.'s BLB is the
    * other lineage): classical resampling needs B full passes over a
    * shuffled copy each; the Poisson approximation draws each row's
    * replicate multiplicity w ~ Poisson(1) INDEPENDENTLY, so all B
    * replicates compute in ONE scan as a generator fan-out followed
    * by a map-side-combinable aggregate — no resample materialized,
    * no shuffle beyond B·|types| partials.
    *
    * Determinism (the [[splitHash]] doctrine — no rand()): the
    * uniform for (row, replicate) is x² mod p on
    * x = ((event_id mod p)·1103515245 + b·1013904223 + 12345) mod p
    * with p = 2³¹−1 — the same square-mix universal-family idiom as
    * [[graft.functions.Sketches]]; the event_id is first reduced
    * mod p so the product stays far inside a Long at ANY event_id
    * scale, and the quadratic mix makes the b term propagate through
    * the whole 31-bit state (a bare additive b·const shifts u by
    * ≤2e-4 across 32 replicates, which correlates the replicates
    * near-perfectly and collapses the bootstrap SE ~100×; the
    * square restores per-replicate independence) — and the Poisson
    * draw
    * inverts the CDF through a fixed 9-step ladder (P(w>8) < 1.1e-6;
    * the tail mass is assigned to w=8, a documented truncation both
    * engines share). Output = B rows (replicate, n_eff,
    * mean_value): the replicate spread IS the sampling distribution
    * of the mean; quantiles of 32 rows are the consumer's read. */
  /** Per-replicate partial sums (b, n_eff, sum_c) from a batch of
    * events — the ADDITIVE kernel (the weight of a row is a pure
    * function of (event_id, b), so partials over any batch split sum
    * to the full-scan result; the streaming twin's state is exactly
    * these 32 rows). */
  private[graft] def bootstrapPartial(events: DataFrame, b: Int): DataFrame = {
    // CAST(b AS BIGINT): b is the exploded sequence INT here; a bare
    // b * 1013904223 would be int×int and wrap at b ≥ 3
    val x = "(((event_id % 2147483647) * 1103515245 + CAST(b AS BIGINT) * 1013904223 + 12345) % 2147483647)"
    val u = s"CAST(($x * $x) % 2147483647 AS DOUBLE) / 2147483647.0"
    val ladder =
      s"""CASE WHEN $u < 0.3678794412 THEN 0 WHEN $u < 0.7357588823 THEN 1
         |     WHEN $u < 0.9196986029 THEN 2 WHEN $u < 0.9810118431 THEN 3
         |     WHEN $u < 0.9963401532 THEN 4 WHEN $u < 0.9994058152 THEN 5
         |     WHEN $u < 0.9999167589 THEN 6 WHEN $u < 0.9999897508 THEN 7
         |     ELSE 8 END""".stripMargin
    events
      .select(col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .select(col("event_id"), col("cents"),
        explode(sequence(lit(1), lit(b))).as("b"))
      .select(col("b").cast("long").as("b"), expr(ladder).cast("long").as("w"), col("cents"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("cents")).as("sum_c"))
  }

  /** The report off the (b, n_eff, sum_c) replicate table. */
  private[graft] def bootstrapReport(state: DataFrame): DataFrame =
    state
      .select(col("b").as("replicate"), col("n_eff"),
        expr("CASE WHEN n_eff > 0 THEN round(CAST(sum_c AS DOUBLE) / n_eff / 100.0, 6) END")
          .as("mean_value"))
      .orderBy(col("replicate"))

  def bootstrapMeanCi(spark: SparkSession, dir: String, b: Int = 32): DataFrame =
    bootstrapReport(bootstrapPartial(Tables.events(spark, dir), b))

  /** DuckDB oracle for [[bootstrapMeanCi]] — same LCG, same ladder. */
  def bootstrapMeanCiOracleSql(b: Int = 32): String = {
    val x = "(((event_id % 2147483647) * 1103515245 + t.b * 1013904223 + 12345) % 2147483647)"
    val u = s"CAST(($x * $x) % 2147483647 AS DOUBLE) / 2147483647.0"
    s"""WITH fan AS (
       |  SELECT t.b,
       |         CASE WHEN $u < 0.3678794412 THEN 0 WHEN $u < 0.7357588823 THEN 1
       |              WHEN $u < 0.9196986029 THEN 2 WHEN $u < 0.9810118431 THEN 3
       |              WHEN $u < 0.9963401532 THEN 4 WHEN $u < 0.9994058152 THEN 5
       |              WHEN $u < 0.9999167589 THEN 6 WHEN $u < 0.9999897508 THEN 7
       |              ELSE 8 END AS w,
       |         CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events CROSS JOIN range(1, ${b + 1}) t(b))
       |SELECT CAST(b AS BIGINT) AS replicate, CAST(sum(w) AS BIGINT) AS n_eff,
       |       CASE WHEN sum(w) > 0 THEN
       |         round(CAST(sum(w * cents) AS DOUBLE) / sum(w) / 100.0, 6) END AS mean_value
       |FROM fan GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
