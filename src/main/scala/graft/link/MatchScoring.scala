package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fellegi–Sunter probabilistic record-linkage scoring (Fellegi & Sunter
 * 1969) — the decision layer on top of blocking: each candidate pair
 * carries a vector of per-field agreement booleans, and the match score
 * is the log-likelihood-ratio sum Σ ln(m/u) over agreeing fields +
 * Σ ln((1−m)/(1−u)) over disagreeing ones, where m = P(agree | match)
 * and u = P(agree | non-match). Pairs above an upper threshold auto-link,
 * below a lower one auto-reject, between them go to clerical review —
 * the classic ER triage the thresholds encode. The reference links
 * purely by LSH bucket co-membership (`LSH.scala`) with no per-pair
 * evidence weighing; this supplies it.
 *
 * 100 TB shape: a pure PROJECTION over the (already blocked, already
 * bounded) candidate-pair table — zero shuffle, codegen'd, linear in
 * pairs. The (m, u) parameters are per-field constants (estimated
 * offline or EM-fitted; fixed here), so the weight chain folds into
 * literal doubles at plan time, and the fixed left-to-right sum makes
 * the float result reproducible run-to-run and engine-to-engine.
 *
 * @param pairsWithAgreements candidate pairs carrying one boolean
 *                            agreement column per field
 * @param fields (agreementCol, m, u) per field, 0 < u < m < 1
 * @return input plus `score` (6-dp rounded log-likelihood ratio)
 */
object MatchScoring {

  def score(pairsWithAgreements: DataFrame,
            fields: Seq[(String, Double, Double)]): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    fields.foreach { case (f, m, u) =>
      require(u > 0 && m < 1 && u < m, s"field $f needs 0 < u < m < 1")
    }
    val total = fields.map { case (f, m, u) =>
      when(col(f), lit(math.log(m / u)))
        .otherwise(lit(math.log((1 - m) / (1 - u))))
    }.reduce(_ + _)
    pairsWithAgreements.withColumn("score", round(total, 6))
  }
}
