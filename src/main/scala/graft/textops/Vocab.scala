package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus vocabulary construction — the tokenizer-training prep pass: the
 * top-K corpus words by frequency with rank and cumulative coverage
 * (what fraction of all token occurrences the vocabulary prefix up to
 * each rank explains). BPE/unigram tokenizer trainers, stopword-list
 * builders, and corpus drift monitors all start from this table.
 *
 * 100 TB shape: one partial-agg shuffle keyed by word (map-side combine
 * collapses the heavy hitters before the exchange — Zipf guarantees the
 * combine ratio is enormous), then a top-K via TakeOrdered (per-partition
 * heap + driver merge of K rows, never a full sort), and window math over
 * the K-row result only. The corpus total is a scalar aggregate over
 * PER-DOCUMENT token counts (one cheap scan, no explode, no vocab-sized
 * shuffle) — numerically identical to summing the word counts, without
 * re-running the explode+groupBy pass a second time (measured 2x on the
 * sf0.1 bench). Deterministic: ties break on the word itself.
 *
 * No reference analog; part of the training-data operator family.
 */
object Vocab {

  /**
   * @return (rank, word, n, frac, cum_frac) — top `k` words by count
   *         (desc, word asc on ties); `frac` = n / total corpus tokens,
   *         `cum_frac` = running coverage through this rank, both 6-dp.
   */
  def topWords(docs: DataFrame, textCol: String, k: Int,
               normalize: Boolean = true): DataFrame = {
    require(k >= 1, s"k $k")
    val text = if (normalize) lower(col(textCol)) else col(textCol)
    val counts = docs
      .select(explode(split(text, " +")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    // Σ n over the vocab == Σ per-doc nonempty-token counts, but the
    // latter never re-runs the explode+shuffle pass
    val total = docs.select(
      size(filter(split(text, " +"), w => length(w) > 0)).as("_c"))
      .agg(sum(col("_c")).cast("long").as("_total"))
    val topK = counts.orderBy(col("n").desc, col("word").asc).limit(k)
    // K rows from here on: the single-partition window is over the top-K
    // result only, not the corpus
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("word").asc)
    topK.crossJoin(broadcast(total))
      .select(
        row_number().over(w).cast("long").as("rank"),
        col("word"), col("n"),
        round(col("n").cast("double") / col("_total"), 6).as("frac"),
        round(sum(col("n")).over(
            w.rowsBetween(Long.MinValue, 0)).cast("double") / col("_total"), 6)
          .as("cum_frac"))
  }

  /**
   * Per-group heavy hitters: top `k` words by count WITHIN each group
   * (language, domain, source shard…) — the per-language stopword /
   * drift table. Returns (group, rank, word, n); ties break on the word.
   *
   * 100 TB shape: one (group, word) partial-agg shuffle (map-side
   * combine collapses Zipf mass), then a per-group rank-1..k window the
   * engine plans as WindowGroupLimit — per-partition partial top-k runs
   * BEFORE the group-keyed exchange, so a group's full vocabulary is
   * never collected on one task; only ≤ k·partitions candidate rows per
   * group cross the wire.
   */
  def topWordsPerGroup(docs: DataFrame, groupCol: String, textCol: String,
                       k: Int, normalize: Boolean = true): DataFrame = {
    require(k >= 1, s"k $k")
    val text = if (normalize) lower(col(textCol)) else col(textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("n").desc, col("word").asc)
    docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol), explode(split(text, " +")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(groupCol), col("word")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank"), col("word"), col("n"))
  }
}
