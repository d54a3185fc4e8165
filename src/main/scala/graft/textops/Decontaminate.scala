package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — flag/remove training documents that share
 * word n-grams with an evaluation set (the GPT-3-style "13-gram overlap"
 * rule; `n` is a parameter because the right width is corpus-dependent).
 * Beyond the reference's own surface, like the rest of graft.textops:
 * a training-data pipeline MUST do this before shipping a corpus.
 *
 * Normalization: lowercase + whitespace collapse on both sides, then
 * distinct word n-grams per document, 64-bit hashed (the native
 * word_shingle_hashes expression — see `grams` below).
 *
 * 100 TB shape: eval sets are tiny by definition (MBs against a 100 TB
 * corpus), so the bench gram table gets an explicit `broadcast` hint —
 * the corpus-side plan is scan → generate (explode grams) → broadcast
 * hash join, with ZERO corpus shuffles: only matching grams survive to
 * the overlap aggregate, and at realistic contamination rates that is a
 * vanishing fraction of the corpus (the two distinct counts cost the agg
 * an Expand + two exchanges over MATCHES only — test-pinned that no
 * exchange sits below the join). The gram explosion never materializes:
 * Generate feeds the broadcast join inside one codegen pipeline. Set
 * `broadcastBench = false` only if the "benchmark" side is itself huge
 * (then AQE picks the join, and the corpus pays one exchange).
 */
object Decontaminate {

  // grams are 64-bit-hashed (the native fused shingle+hash projection, one
  // codegen'd byte pass) rather than materialized strings: the join key
  // shrinks to 8 bytes and the per-doc gram-distinct/overlap counts are
  // identical up to xxhash64 collisions (~n²/2⁶⁵ — the dedup family's
  // long-standing posture; the r5 interpreted string-HOF form measured 2x+
  // slower on the same fixture)
  private def grams(textCol: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.graftfns.TextExpressions.word_shingle_hashes(
      trim(regexp_replace(lower(textCol), " +", " ")), n)

  /**
   * Per-contaminated-doc overlap report: (id, n_hits = distinct shared
   * n-grams, n_bench = distinct benchmark docs matched). Clean documents
   * do not appear — at scale the report is small, the corpus never
   * shuffles.
   */
  def overlapReport(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchIdCol: String, benchTextCol: String,
                    n: Int = 13, broadcastBench: Boolean = true): DataFrame = {
    require(n >= 1, s"n $n")
    val benchGrams0 = bench
      .select(col(benchIdCol).as("_bench_id"),
        explode(grams(col(benchTextCol), n)).as("_g"))
      .distinct()
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    corpus
      .select(col(idCol), explode(grams(col(textCol), n)).as("_g"))
      .join(benchGrams, "_g")
      .groupBy(idCol)
      .agg(countDistinct(col("_g")).as("n_hits"),
        countDistinct(col("_bench_id")).as("n_bench"))
  }

  /**
   * Remove contaminated documents: corpus rows sharing at least
   * `minHits` distinct n-grams with the eval set are dropped (left-anti
   * against the tiny report — one small exchange on the report side
   * only; the corpus side joins broadcast).
   */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchIdCol: String, benchTextCol: String,
                    n: Int = 13, minHits: Long = 1L,
                    broadcastBench: Boolean = true): DataFrame = {
    val flagged = overlapReport(corpus, idCol, textCol,
      bench, benchIdCol, benchTextCol, n, broadcastBench)
      .filter(col("n_hits") >= minHits)
      .select(col(idCol))
    corpus.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
