package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hashed-bigram language-model perplexity scoring — the CCNet-style
 * quality gate (Wenzek et al. 2020 score web documents with a KenLM
 * 5-gram model and keep the low-perplexity tail; Brown et al. 2020 use
 * the same shape for GPT-3's quality filtering). A full KenLM is a
 * single-machine artifact; the engine-native equivalent is a bigram
 * model over HASHED token buckets (the same trick [[Importance]] uses,
 * after Xie et al. 2023): collision-lossy but distribution-faithful,
 * portable (md5 buckets — the DuckDB oracle reproduces them bit-for-bit),
 * and with a model size fixed at B = 16^hexChars buckets regardless of
 * corpus size.
 *
 * Model: add-α smoothed bucket bigram conditional
 *
 *   P(w2 | w1) = (c2(b(w1 w2)) + α) / (c1(b(w1)) + α·B)
 *
 * Per document: avg_logp = (1/m) Σ ln P over its m consecutive token
 * pairs; ppl = exp(-avg_logp). Because ln P = ln(c2+α) − ln(c1+α·B)
 * splits into two single-bucket terms, the model collapses to TWO weight
 * tables of ≤ B rows (numerator keyed by bigram bucket, denominator by
 * unigram bucket). Weights are held as INTEGER MICRO-LOG-UNITS
 * (round(ln·10⁶) as long): the per-document sum is then exact integer
 * arithmetic — associative, so identical under ANY aggregation order or
 * partitioning, unlike a double fold whose 6th decimal can depend on
 * summation order (a real mismatch the sf0.01 oracle run caught).
 *
 * 100 TB shape: training is ONE tokenize pass whose tagged bigram +
 * unigram bucket streams share one partial-agg shuffle carrying ≤ 2B
 * rows after map-side combine; the two weight tables collect to the
 * driver (tiny by construction — the IVF-centroid rule); scoring is then
 * a ZERO-SHUFFLE pure projection (two map-literal lookups and a fold per
 * document), repartition/retry-invariant and whole-stage-codegen
 * friendly (built-in collection expressions only).
 *
 * No reference analog; part of the training-data operator family.
 */
object LanguageModel {

  private def words(textCol: Column): Column =
    filter(split(lower(textCol), " +"), w => length(w) > 0)

  private def bucket(s: Column, hexChars: Int): Column =
    substring(md5(s), 1, hexChars)

  /** Consecutive-pair column over the word array: array of "w1 w2"
    * strings (length = size(words) - 1; empty for 0/1-token docs — the
    * `greatest` guard keeps slice's length argument non-negative when
    * the word array is empty). */
  private def bigrams(ws: Column): Column = {
    val m = greatest(size(ws) - 1, lit(0))
    zip_with(slice(ws, lit(1), m), slice(ws, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Bigram-bucket counts over the corpus: (bucket, n). */
  def bigramBucketFreqs(docs: DataFrame, textCol: String,
                        hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 4, s"hexChars $hexChars")
    docs.select(explode(bigrams(words(col(textCol)))).as("_bg"))
      .groupBy(bucket(col("_bg"), hexChars).as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** round(x·10⁶) half-away-from-zero, matching SQL `round(x, 0)`. */
  private def micro(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** The two collected weight tables: (numerator ln(c2+α) by bigram
    * bucket, denominator ln(c1+α·B) by unigram bucket), both in integer
    * micro-log-units. Buckets with zero count are ABSENT; score-time
    * lookups default to the corresponding ln(α) / ln(α·B) smoothed-zero
    * constants. */
  def train(docs: DataFrame, textCol: String, hexChars: Int = 2,
            alpha: Double = 0.1): (Map[String, Long], Map[String, Long]) = {
    require(hexChars >= 1 && hexChars <= 4, s"hexChars $hexChars")
    val b = math.pow(16.0, hexChars)
    // ONE tokenize pass for both tables: the bigram (numerator) and
    // unigram (denominator) bucket streams explode as a tagged union and
    // share one partial-agg shuffle/collect — counts per (tag, bucket)
    // are identical to the separate bigramBucketFreqs/bucketFreqs jobs,
    // which previously re-scanned and re-tokenized the corpus each.
    val rows = docs.select(words(col(textCol)).as("_ws"))
      .select(explode(concat(
        transform(bigrams(col("_ws")), bg =>
          struct(lit("b").as("tag"), bucket(bg, hexChars).as("bucket"))),
        transform(col("_ws"), w =>
          struct(lit("u").as("tag"), bucket(w, hexChars).as("bucket"))))).as("_t"))
      .groupBy(col("_t.tag").as("tag"), col("_t.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val num = rows.iterator.filter(_.getString(0) == "b").map { r =>
      r.getString(1) -> micro(math.log(r.getLong(2).toDouble + alpha))
    }.toMap
    val den = rows.iterator.filter(_.getString(0) == "u").map { r =>
      r.getString(1) -> micro(math.log(r.getLong(2).toDouble + alpha * b))
    }.toMap
    (num, den)
  }

  /**
   * Score documents against collected weight tables: (id, n_bigrams,
   * avg_logp, ppl), both 6-dp; documents with fewer than 2 tokens carry
   * n_bigrams = 0 and NULL scores (no pairs to judge — the caller's
   * length filter owns them).
   */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                num: Map[String, Long], den: Map[String, Long],
                hexChars: Int = 2, alpha: Double = 0.1): DataFrame = {
    val b = math.pow(16.0, hexChars)
    def mapLit(m: Map[String, Long]): Column =
      if (m.isEmpty) map()
      else map(m.toSeq.sorted.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val numM = mapLit(num)
    val denM = mapLit(den)
    val pairLogp = (bg: Column) =>
      coalesce(element_at(numM, bucket(bg, hexChars)), lit(micro(math.log(alpha)))) -
        coalesce(element_at(denM,
          bucket(substring_index(bg, " ", 1), hexChars)),
          lit(micro(math.log(alpha * b))))
    // Alias-layered selects: the tokenize/bigram HOF chains are lambda
    // expressions, which Catalyst's subexpression elimination skips — in
    // the single-select form each of n_bigrams/avg_logp/ppl re-evaluated
    // the whole chain (measured ~6 evals/row). Multi-referenced non-cheap
    // aliases survive CollapseProject, so each layer computes once.
    // avg_logp stays UNROUNDED: it derives from exact integers through a
    // fixed IEEE op sequence, so it is bit-identical everywhere — while
    // its 6-dp rounding would sit exactly ON half-boundaries (total/1e6
    // has 6 decimals; /m lands on x.xxxxxx5 whenever m | 2·total) where
    // engines' rounding implementations legitimately disagree. ppl IS
    // rounded (6 dp): exp() is transcendental — never on a boundary —
    // and the round absorbs libm's last-ulp variation.
    docs.select(col(idCol), words(col(textCol)).as("_ws"))
      .select(col(idCol), bigrams(col("_ws")).as("_bgs"))
      .select(col(idCol), size(col("_bgs")).as("_m"),
        // exact long sum of micro-units — associative, order-independent
        aggregate(transform(col("_bgs"), pairLogp),
          lit(0L), (acc, x) => acc + x).as("_total"))
      .select(col(idCol), col("_m"),
        when(col("_m") > 0, col("_total").cast("double") / 1e6 / col("_m"))
          .as("_avg"))
      .select(col(idCol), col("_m").cast("long").as("n_bigrams"),
        col("_avg").as("avg_logp"), round(exp(-col("_avg")), 6).as("ppl"))
  }

  /** End-to-end: train the hashed-bigram model on the corpus itself and
    * score every document (self-perplexity — the repetitive/boilerplate
    * tail scores LOW ppl, gibberish scores HIGH; both tails are filter
    * targets). */
  def perplexityReport(docs: DataFrame, idCol: String, textCol: String,
                       hexChars: Int = 2, alpha: Double = 0.1): DataFrame = {
    val (num, den) = train(docs, textCol, hexChars, alpha)
    scoreDocs(docs, idCol, textCol, num, den, hexChars, alpha)
  }
}
