package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality / language filtering — the FineWeb-Edu /
 * fastText-classifier recipe: train a linear classifier over hashed
 * unigram features by batch gradient descent, then score the whole
 * corpus with the trained weights. The reference has no analog; this is
 * part of the training-data operator family (a crawl-scale pipeline
 * labels a small slice — here a weak label derived from a column — and
 * uses the model to filter the rest).
 *
 * Determinism contract (the whole trainer is oracle-replayable in SQL):
 * all cross-engine AGGREGATIONS are exact integer/decimal sums —
 * features are micro-tf `round(c/n*1e6)` BIGINTs, weights are micro
 * BIGINTs, per-doc margins are exact pico (1e-12) BIGINT dot products,
 * and gradients accumulate as DECIMAL(38,0) — so no result depends on
 * float addition order (repartition/retry-invariant by arithmetic, not
 * by luck). The only floating ops are per-scalar mul/div/round chains
 * written in the same order in both engines (IEEE-deterministic,
 * libm-free). Model: linear probability (squared loss) with DAMPED
 * Jacobi-preconditioned GD — plain GD stalls (tf features have ~1e-4
 * the bias feature's curvature), undamped Jacobi diverges (with ~k
 * correlated active buckets per doc the iteration matrix has spectral
 * radius ~k), so each bucket's step is the exact-diagonal Newton step
 * scaled by lr ≈ 1/k:
 *   w_b ← w_b − round(lr · Σ_d r_d·x_db / Σ_d x_db²)   per bucket,
 *   r_d = round((w·x_d − y_d)/1e-6)                    micro residual.
 *
 * 100 TB shape: one-time feature build = one (doc,bucket) partial-agg
 * shuffle + one per-doc array rollup; each GD iteration is a pure
 * projection (the dot product folds a ≤257-entry broadcast map literal
 * over the doc's feature array) plus ONE bucket-keyed partial-agg
 * shuffle whose exchange carries ≤ B+1 rows per map partition; the
 * weight table (≤ B+1 = 257 rows at the default 2 hex chars) is the
 * only driver collect — the same tiny-by-construction posture as IVF
 * centroids and DSIR weights. Scoring is a zero-shuffle projection.
 * The per-row fold is a higher-order function (interpreted, not
 * codegen'd) — the documented tradeoff vs. an N-row doc-keyed shuffle
 * per iteration, which would be strictly worse at cluster scale.
 */
object Classifier {

  /** Bias pseudo-bucket: constant feature x = 1.0 (1e6 micro). */
  val BiasBucket = "_bias"

  private def words(textCol: Column): Column =
    filter(split(lower(textCol), " +"), w => length(w) > 0)

  /**
   * Long-format micro-tf features: (id, bucket, x) with
   * x = round(c/n · 1e6) for each doc's hashed unigram bucket, plus a
   * constant `_bias` row per doc (x = 1e6). Buckets are md5-hex
   * prefixes (portable across engines; B = 16^hexChars).
   */
  def features(docs: DataFrame, idCol: String, textCol: String,
               hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 4, s"hexChars $hexChars")
    val n = docs.select(col(idCol), size(words(col(textCol))).cast("long").as("_n"))
    val tf = docs.select(col(idCol), explode(words(col(textCol))).as("_w"))
      .groupBy(col(idCol), substring(md5(col("_w")), 1, hexChars).as("bucket"))
      .agg(count(lit(1)).as("_c"))
      .join(n, Seq(idCol))
      .select(col(idCol), col("bucket"),
        round(col("_c").cast("double") / col("_n") * 1e6, 0).cast("long").as("x"))
      .filter(col("x") > 0) // zero-rounded features carry no signal and
                            // would put h=0 rows into the preconditioner
    tf.unionByName(
      docs.select(col(idCol), lit(BiasBucket).as("bucket"), lit(1000000L).as("x")))
  }

  /** Exact pico-unit margin z = Σ w(bucket)·x as a pure column fold over
    * the per-doc feature array (struct<bucket,x>), unseen buckets = 0. */
  private def marginPico(featsCol: Column, weights: Map[String, Long]): Column = {
    val m = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    aggregate(featsCol, lit(0L),
      (acc, f) => acc + coalesce(element_at(m, f.getField("bucket")), lit(0L)) * f.getField("x"))
  }

  /**
   * Train `iters` Jacobi-preconditioned GD steps from zero weights.
   * `labelExpr` is the weak 0/1 label column (e.g.
   * `col("lang") === "en"`). Returns the micro-unit weight map
   * (bucket → w·1e6), `_bias` included. The gradient Σr·x and the
   * preconditioner Σx² come out of the SAME bucket-keyed partial agg,
   * both as exact DECIMAL(38,0) sums.
   */
  def train(docs: DataFrame, idCol: String, textCol: String, labelExpr: Column,
            iters: Int = 8, lr: Double = 0.0625, hexChars: Int = 2): Map[String, Long] = {
    require(iters >= 1, s"iters $iters")
    val f = features(docs, idCol, textCol, hexChars)
    val lbl = docs.select(col(idCol),
      when(labelExpr, lit(1L)).otherwise(lit(0L)).as("_y"))
    // per-doc array form: one rollup shuffle, then every iteration is
    // projection + one bucket-keyed partial agg
    val perDoc = f.groupBy(col(idCol))
      .agg(collect_list(struct(col("bucket"), col("x"))).as("_feats"))
      .join(lbl, Seq(idCol))
      .persist()
    perDoc.count()
    var w = Map(BiasBucket -> 0L)
    for (_ <- 1 to iters) {
      val r = round((marginPico(col("_feats"), w) - col("_y") * lit(1000000000000L))
        .cast("double") / 1e6, 0).cast("long")
      val deltas = perDoc
        .select(r.as("_r"), explode(col("_feats")).as("_f"))
        .groupBy(col("_f.bucket").as("bucket"))
        .agg(sum((col("_r") * col("_f.x")).cast("decimal(38,0)")).as("_g"),
          sum((col("_f.x") * col("_f.x")).cast("decimal(38,0)")).as("_h"))
        .select(col("bucket"),
          round(lit(lr) * col("_g").cast("double") / col("_h").cast("double") * 1e6, 0)
            .cast("long").as("_d"))
        .collect()
      w = deltas.foldLeft(w) { case (acc, row) =>
        val b = row.getString(0); val d = row.getLong(1)
        acc.updated(b, acc.getOrElse(b, 0L) - d)
      }
    }
    perDoc.unpersist()
    w
  }

  /** Score the corpus with a trained weight map: (id, n_tokens, score,
    * pred) with score = round(z, 6) and pred = [z ≥ 0.5]. Zero-shuffle
    * after the feature rollup; with precomputed per-doc features this is
    * a pure projection. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: Map[String, Long], hexChars: Int = 2): DataFrame = {
    val f = features(docs, idCol, textCol, hexChars)
    val perDoc = f.groupBy(col(idCol))
      .agg(collect_list(struct(col("bucket"), col("x"))).as("_feats"))
    val z = marginPico(col("_feats"), weights)
    docs.select(col(idCol), size(words(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol))
      .select(col(idCol), col("n_tokens"),
        round(z.cast("double") / 1e12, 6).as("score"),
        when(z >= lit(500000000000L), lit(1)).otherwise(lit(0)).as("pred"))
  }

  /** End-to-end: train on the weak label, score every document. */
  def classifyReport(docs: DataFrame, idCol: String, textCol: String,
                     labelExpr: Column, iters: Int = 8, lr: Double = 0.0625,
                     hexChars: Int = 2): DataFrame =
    score(docs, idCol, textCol,
      train(docs, idCol, textCol, labelExpr, iters, lr, hexChars), hexChars)
}
