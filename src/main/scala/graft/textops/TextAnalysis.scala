package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis operators for training-data pipelines: language ID,
 * quality scoring, token counting, fingerprinting. All pure column
 * expressions — whole-stage-codegen'd, embarrassingly parallel, zero
 * shuffles (per-row transforms only).
 */
object TextAnalysis {

  /** Per-language function-word dictionaries for the n-gram/stopword
    * language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "las", "que", "por", "con"),
    "zh" -> Seq())

  private def words(textCol: Column): Column = split(lower(textCol), " +")

  /** Count of tokens belonging to a dictionary (duplicates counted). */
  private def hits(ws: Column, dict: Seq[String]): Column =
    if (dict.isEmpty) lit(0) else size(filter(ws, w => w.isin(dict: _*)))

  /**
   * Language-ID: CJK codepoint share decides zh; otherwise argmax of
   * stopword-hit counts with deterministic tie order (en > de > fr > es),
   * falling back to "und" (undetermined) when nothing matches.
   */
  def langId(textCol: Column): Column = {
    val ws = words(textCol)
    val cjk = length(regexp_replace(textCol, "[^\\x{4E00}-\\x{9FFF}]", ""))
    val en = hits(ws, stopwords("en")); val de = hits(ws, stopwords("de"))
    val fr = hits(ws, stopwords("fr")); val es = hits(ws, stopwords("es"))
    val best = greatest(en, de, fr, es)
    when(cjk * 5 > length(textCol), lit("zh"))
      .when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(de === best, lit("de"))
      .when(fr === best, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Whitespace token count. */
  def tokenCountWs(textCol: Column): Column = size(words(textCol))

  /** BPE-ish token count: alpha runs, digit runs, and single non-alnum
    * glyphs each count as one token (a common pre-tokenizer shape). */
  def tokenCountBpe(textCol: Column): Column =
    size(regexp_extract_all(lower(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Quality features + a composite score in [0,1]:
    * penalizes very short docs, high punctuation share, low stopword share.
    * Deterministic closed-form (no model), 6-dp rounded. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nWords = size(ws)
    val nChars = length(col(textCol))
    val nPunct = nChars - length(regexp_replace(col(textCol), "[^a-zA-Z0-9 ]", ""))
    val swHits = hits(ws, stopwords("en"))
    val meanWordLen = round((nChars - nWords + 1).cast("double") / nWords, 6)
    val punctRatio = round(nPunct.cast("double") / nChars, 6)
    val swRatio = round(swHits.cast("double") / nWords, 6)
    val lenScore = least(nWords.cast("double") / 100.0, lit(1.0))
    val score = round(
      lenScore * 0.4 + (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.3 +
        least(swRatio * 4.0, lit(1.0)) * 0.3, 6)
    df.select(col(idCol), nWords.as("n_words"), nChars.as("n_chars_calc"),
      meanWordLen.as("mean_word_len"), punctRatio.as("punct_ratio"),
      swRatio.as("stopword_ratio"), score.as("quality_score"))
  }

  /**
   * Per-document word-entropy — the CCNet-family "gibberish vs natural
   * text" quality signal: H = ln(n) − (1/n)·Σ_w c_w·ln(c_w) over the
   * doc's word multiset (0 for empty/single-word docs, maximal ln(n)
   * when all words are distinct). Engine-portable by the [[LanguageModel]]
   * trick: each per-word term `round(ln(c)·1e6)` is an exact BIGINT
   * micro-log-unit TIMES the exact integer c, so the per-doc sum is
   * order-independent integer arithmetic and the one float chain at the
   * end is bit-identical everywhere (a raw double Σ c·ln(c) would be
   * summation-order-dependent and hash-mismatch).
   *
   * Shape: one (doc, word) partial-count exchange + one doc-keyed agg —
   * both map-side combinable; no corpus-wide state.
   */
  def wordEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = filter(words(col(textCol)), w => length(w) > 0)
    val perWord = df.select(col(idCol), explode(ws).as("_w"))
      .groupBy(col(idCol), col("_w")).agg(count(lit(1)).as("_c"))
    perWord
      .select(col(idCol),
        col("_c"),
        (round(log(col("_c")) * 1e6, 0).cast("long") * col("_c")).as("_t"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_words"), sum(col("_t")).as("_s"))
      .select(col(idCol), col("n_words"),
        round(when(col("n_words") > 1,
            log(col("n_words")) - col("_s").cast("double") / 1e6 / col("n_words"))
          .otherwise(lit(0.0)), 6).as("entropy"))
  }

  /**
   * Gopher-style quality RULE BATTERY (Rae et al. 2021, §A1.1 "quality
   * filtering"): the fixed-threshold document gates — word-count bounds,
   * mean-word-length bounds, minimum share of words containing an
   * alphabetic character, minimum stopword evidence — evaluated per doc
   * with a per-rule verdict and the conjunction as `keep`. Pure per-row
   * column expressions (zero shuffle, codegen'd); pair with
   * [[repetitionStats]] thresholds for the repetition half of the paper's
   * battery. Emitting per-rule booleans (not just the verdict) is the
   * production posture: rejection-reason histograms are how threshold
   * drift gets audited at corpus scale.
   */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minAlphaRatio: Double = 0.8,
                  minStopwordHits: Int = 2): DataFrame = {
    val ws = words(col(textCol))
    val nWords = size(ws)
    val nChars = length(col(textCol))
    // same single-space-corpus estimator as qualityFeatures — total
    // non-separator chars / words
    val meanLen = round((nChars - nWords + 1).cast("double") / nWords, 6)
    val alphaRatio = round(
      size(filter(ws, w => w.rlike("[a-z]"))).cast("double") / nWords, 6)
    val sw = hits(ws, stopwords("en"))
    df.select(col(idCol),
        nWords.as("n_words"), meanLen.as("mean_word_len"),
        alphaRatio.as("alpha_word_ratio"), sw.as("stopword_hits"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_mean_len",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("ok_alpha", col("alpha_word_ratio") >= minAlphaRatio)
      .withColumn("ok_stopwords", col("stopword_hits") >= minStopwordHits)
      .withColumn("keep",
        col("ok_words") && col("ok_mean_len") && col("ok_alpha") &&
          col("ok_stopwords"))
  }

  /**
   * Intra-document repetition statistics (the Gopher-style repetition
   * filters, word-level): duplicate-word / duplicate-2-gram /
   * duplicate-3-gram fractions and the share of the single most frequent
   * word. Pure per-row column expressions — codegen'd, zero shuffle; the
   * caller thresholds (e.g. drop docs with dup_3gram_ratio > 0.2).
   * The top-word scan is O(distinct × words) per doc — bounded by doc
   * length, never by corpus size.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // native one-pass rep_stats: the HOF formulation below is value-identical
    // (spec-pinned) but pays a quadratic interpreted top-word scan plus
    // per-gram Catalyst array materializations — measured as the engine's
    // GC-noisiest query before the swap
    val st = org.apache.spark.sql.graftfns.TextExpressions.rep_stats(words(col(textCol)))
    df.select(col(idCol), st.as("_r"))
      .select(col(idCol),
        round(col("_r").getItem(0), 6).as("dup_word_ratio"),
        round(col("_r").getItem(1), 6).as("dup_2gram_ratio"),
        round(col("_r").getItem(2), 6).as("dup_3gram_ratio"),
        round(col("_r").getItem(3), 6).as("top_word_ratio"))
  }

  /** The composable higher-order-function formulation of
    * [[repetitionStats]] — kept as the parity oracle for the native
    * expression (same values, interpreted evaluation). */
  def repetitionStatsHof(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nW = size(ws)
    def grams(n: Int): Column = transform(
      sequence(lit(0), greatest(nW - n, lit(0))),
      i => array_join(slice(ws, i + 1, lit(n)), " "))
    def dupRatio(arr: Column): Column =
      round(lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr), 6)
    val topCnt = array_max(transform(array_distinct(ws),
      x => size(filter(ws, w => w === x))))
    df.select(col(idCol),
      dupRatio(ws).as("dup_word_ratio"),
      dupRatio(grams(2)).as("dup_2gram_ratio"),
      dupRatio(grams(3)).as("dup_3gram_ratio"),
      round(topCnt.cast("double") / nW, 6).as("top_word_ratio"))
  }

  /** Document fingerprints: full-content digest plus a winnowing-style
    * shingle fingerprint (min digest over word 5-grams) — robust to
    * reordering of surrounding content. md5 keeps it oracle-portable. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), " +", " "))
    // fp_min_shingle via the native one-pass expression — bit-identical
    // to array_min(transform(wordShingles(norm, 5), md5)) (spec-pinned;
    // the value is oracle-visible), minus one interpreted HOF call and
    // one materialized Catalyst string per gram
    df.select(col(idCol),
      md5(norm).as("fp_content"),
      org.apache.spark.sql.graftfns.TextExpressions
        .min_gram_md5(norm, 5).as("fp_min_shingle"))
  }

  /**
   * Per-group corpus telemetry — the pipeline-monitoring table every
   * crawl operation keeps per source/shard/snapshot: doc count, token
   * volume, EXACT distinct-token count, mean doc length (6dp). Exact
   * distinct is the oracle-checkable contract; at 10⁹-docs-per-group
   * scale swap the distinct leg for `approx_count_distinct` (HLL++, one
   * pass, no second shuffle) — the spec pins the approximation within
   * its error bound against this exact op on the same input.
   *
   * Plan: token volume and doc counts aggregate PER-DOC counts (no
   * explode — one cheap scan); only the distinct leg pays the
   * (group, word) explode, and Catalyst plans `countDistinct` as the
   * standard two-stage partial-distinct aggregate (map-side dedup
   * before the exchange).
   */
  /**
   * Per-group document-length distribution — the sequence-length planning
   * table (context-window budgeting, packing efficiency, truncation-loss
   * estimates all start from "how long are docs per source"): doc count,
   * min/max, and EXACT lower (type-1) p50/p90 token counts. Order
   * statistics are picked by integer rank floor((n−1)·q)+1 in the sorted
   * multiset — deterministic and engine-portable, unlike interpolated
   * `percentile`/`quantile_cont` whose interpolation conventions differ
   * across engines.
   *
   * Plan: one per-doc count projection (no explode), one group-keyed
   * rank window + conditional aggregate. Ties among equal counts make
   * row_number's choice arbitrary but the VALUE at any rank is a
   * property of the sorted multiset — still deterministic.
   */
  def lengthQuantiles(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val counted = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol), size(filter(ws, w => length(w) > 0)).cast("long").as("_c"))
    val byGroup = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val ranked = counted
      .withColumn("_rn", row_number().over(byGroup.orderBy(col("_c"))).cast("long"))
      .withColumn("_cnt", count(lit(1)).over(byGroup))
    def rankAt(q: Double) = (floor((col("_cnt") - 1) * q) + 1).cast("long")
    ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        min(col("_c")).as("min_tokens"),
        min(when(col("_rn") === rankAt(0.5), col("_c"))).as("p50_tokens"),
        min(when(col("_rn") === rankAt(0.9), col("_c"))).as("p90_tokens"),
        max(col("_c")).as("max_tokens"))
  }

  def corpusTelemetry(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nonNull = df.filter(col(groupCol).isNotNull)
    val volumes = nonNull
      .select(col(groupCol), size(filter(ws, w => length(w) > 0)).cast("long").as("_c"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum(col("_c")).cast("long").as("n_tokens"))
    val distincts = nonNull
      .select(col(groupCol), explode(filter(ws, w => length(w) > 0)).as("_w"))
      .groupBy(groupCol)
      .agg(countDistinct(col("_w")).as("n_distinct_tokens"))
    volumes.join(distincts, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        coalesce(col("n_distinct_tokens"), lit(0L)).as("n_distinct_tokens"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6).as("avg_doc_tokens"))
  }
}
