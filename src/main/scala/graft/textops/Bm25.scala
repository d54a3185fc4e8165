package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BM25 ranked retrieval over the document corpus (Robertson & Zaragoza
 * 2009, "The Probabilistic Relevance Framework: BM25 and Beyond") — the
 * standard lexical scorer behind Lucene/Elasticsearch. In a training-data
 * pipeline this is the workhorse for targeted corpus queries: pull the
 * documents most relevant to a topic list, seed retrieval-augmented
 * curation, or audit what a crawl actually contains for a query.
 *
 *   score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))
 *   idf(t)      = ln( (N − df_t + 0.5) / (df_t + 0.5) + 1 )   (Lucene form, ≥ 0)
 *
 * 100 TB shape: the query is TINY (a handful of terms) — so everything
 * term-specific collects to the driver by construction:
 *  - df_t: one scan emitting only (doc, matched-term) pairs — the
 *    explode is FILTERED to query terms before the distinct/agg, so the
 *    shuffle carries matches only, never the corpus's tokens;
 *  - N and avgdl: one scalar aggregate over per-doc token counts;
 *  - scoring: a ZERO-SHUFFLE pure projection — per-term tf is a
 *    `size(filter(words, = term))` expression, the score a literal sum
 *    in FIXED term order (bit-reproducible across engines — the oracle
 *    writes the same sum in the same order);
 *  - top-K: TakeOrdered (per-partition heaps, no full sort).
 * Documents matching no query term are dropped before the take (their
 * score is exactly 0), so the heap sees candidates only.
 *
 * No reference analog; part of the training-data operator family.
 */
object Bm25 {

  private def words(textCol: Column): Column =
    filter(split(lower(textCol), " +"), w => length(w) > 0)

  /**
   * @param terms query terms (matched as whole lowercased tokens; ≤ ~32
   *              keeps the projection codegen-friendly).
   * @return (id, score, n_terms_matched) — top `k` by (score desc, id),
   *         score 6-dp, only documents matching ≥ 1 term.
   */
  def search(docs: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], k: Int,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k > 0, s"terms=$terms k=$k")
    val qTerms = terms.map(_.toLowerCase).distinct

    // corpus stats: N docs, average token length (one cheap scan)
    val stats = docs.agg(
      count(lit(1)).as("n"),
      avg(size(words(col(textCol)))).as("avgdl")).head
    val nDocs = stats.getLong(0)
    val avgdl = stats.getDouble(1)

    // per-term document frequency: explode FILTERED to the query terms,
    // so the exchange carries only matching (doc, term) pairs
    val dfRows = docs
      .select(col(idCol), explode(array_intersect(
        array_distinct(words(col(textCol))),
        array(qTerms.map(lit): _*))).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val idf: String => Double = t => {
      val dft = dfRows.getOrElse(t, 0L).toDouble
      math.log((nDocs - dft + 0.5) / (dft + 0.5) + 1.0)
    }

    val ws = words(col(textCol))
    val dl = size(ws).cast("double")
    val norm = lit(k1) * (lit(1 - b) + lit(b) * dl / lit(avgdl))
    def termScore(t: String): Column = {
      val tf = size(filter(ws, w => w === t)).cast("double")
      lit(idf(t)) * tf * lit(k1 + 1) / (tf + norm)
    }
    // fixed-order literal sum: the oracle writes the identical chain
    val score = qTerms.map(termScore).reduce(_ + _)
    val matched = qTerms.map(t =>
      when(array_contains(ws, t), 1).otherwise(0): Column).reduce(_ + _)

    docs.select(col(idCol), round(score, 6).as("score"),
        matched.cast("long").as("n_terms_matched"))
      .filter(col("n_terms_matched") > 0)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
