package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.VectorExpressions.bucket_dot

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
 * shuffle + one per-doc parallel-array rollup; each GD iteration is a
 * pure projection (the margin is the native codegen'd
 * [[org.apache.spark.sql.graftfns.VectorExpressions.BucketDot]] — one
 * O(1)-indexed fused loop per row against the broadcast dense weight
 * table; the map-literal `aggregate` fold it replaced was an
 * interpreted linear scan measured at 75 s/iteration on 1M docs) plus
 * ONE bucket-keyed partial-agg shuffle whose exchange carries ≤ B+1
 * rows per map partition; the weight table (≤ B+1 = 257 longs at the
 * default 2 hex chars) is the only driver collect — the same
 * tiny-by-construction posture as IVF centroids and DSIR weights.
 * Scoring is a zero-shuffle projection over the rolled-up features.
 */
object Classifier {

  /** Dense weight-table size: B hash buckets + 1 bias slot (index B). */
  def tableSize(hexChars: Int): Int = (1 << (4 * hexChars)) + 1

  private def words(textCol: Column): Column =
    filter(split(lower(textCol), " +"), w => length(w) > 0)

  /**
   * Long-format micro-tf features: (id, bucket, x) with
   * x = round(c/n · 1e6) for each doc's hashed unigram bucket, plus a
   * constant bias row per doc (bucket = B, x = 1e6). Buckets are md5-hex
   * prefixes read as integers 0..B-1 (the hex string itself stays the
   * oracle's join key — the int is a bijective recoding).
   */
  def features(docs: DataFrame, idCol: String, textCol: String,
               hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 4, s"hexChars $hexChars")
    val bias = tableSize(hexChars) - 1
    val n = docs.select(col(idCol), size(words(col(textCol))).cast("long").as("_n"))
    val tf = docs.select(col(idCol), explode(words(col(textCol))).as("_w"))
      .groupBy(col(idCol),
        conv(substring(md5(col("_w")), 1, hexChars), 16, 10).cast("int").as("bucket"))
      .agg(count(lit(1)).as("_c"))
      .join(n, Seq(idCol))
      .select(col(idCol), col("bucket"),
        round(col("_c").cast("double") / col("_n") * 1e6, 0).cast("long").as("x"))
      .filter(col("x") > 0) // zero-rounded features carry no signal and
                            // would put h=0 rows into the preconditioner
    tf.unionByName(
      docs.select(col(idCol), lit(bias).as("bucket"), lit(1000000L).as("x")))
  }

  /** Per-doc parallel-array rollup: (id, _bks array<int>, _xs array<long>).
    * The two collect_lists fill in the same row pass, so positions pair. */
  private def perDocFeatures(docs: DataFrame, idCol: String, textCol: String,
                             hexChars: Int): DataFrame =
    features(docs, idCol, textCol, hexChars)
      .groupBy(col(idCol))
      .agg(collect_list(col("bucket")).as("_bks"), collect_list(col("x")).as("_xs"))

  /**
   * Train `iters` damped Jacobi-preconditioned GD steps from zero
   * weights. `labelExpr` is the weak 0/1 label column (e.g. a
   * seed-keyword rule). Returns the dense micro-unit weight table
   * (index = bucket, last slot = bias). The gradient Σr·x and the
   * preconditioner Σx² come out of the SAME bucket-keyed partial agg,
   * both as exact DECIMAL(38,0) sums.
   */
  def train(docs: DataFrame, idCol: String, textCol: String, labelExpr: Column,
            iters: Int = 8, lr: Double = 0.0625, hexChars: Int = 2): Array[Long] = {
    val perDoc = labeledFeatures(docs, idCol, textCol, labelExpr, hexChars)
      .persist()
    val w = trainFromFeatures(perDoc, iters, lr, hexChars)
    perDoc.unpersist()
    w
  }

  /** (id, _bks, _xs, _y) — the per-doc feature rollup with the weak label
    * attached (inner join preserves every doc: the bias row guarantees a
    * feature row and the label projection covers all ids). */
  private def labeledFeatures(docs: DataFrame, idCol: String, textCol: String,
                              labelExpr: Column, hexChars: Int): DataFrame = {
    val lbl = docs.select(col(idCol),
      when(labelExpr, lit(1L)).otherwise(lit(0L)).as("_y"))
    perDocFeatures(docs, idCol, textCol, hexChars).join(lbl, Seq(idCol))
  }

  /** GD loop over an already-persisted labeled feature table. */
  private def trainFromFeatures(perDoc: DataFrame, iters: Int, lr: Double,
                                hexChars: Int): Array[Long] = {
    require(iters >= 1, s"iters $iters")
    perDoc.count()
    val w = Array.fill(tableSize(hexChars))(0L)
    for (_ <- 1 to iters) {
      val r = round((bucket_dot(col("_bks"), col("_xs"), w.toSeq) -
        col("_y") * lit(1000000000000L)).cast("double") / 1e6, 0).cast("long")
      val deltas = perDoc
        .select(r.as("_r"), explode(arrays_zip(col("_bks"), col("_xs"))).as("_f"))
        .groupBy(col("_f._bks").as("bucket"))
        .agg(sum((col("_r") * col("_f._xs")).cast("decimal(38,0)")).as("_g"),
          sum((col("_f._xs") * col("_f._xs")).cast("decimal(38,0)")).as("_h"))
        .select(col("bucket"),
          round(lit(lr) * col("_g").cast("double") / col("_h").cast("double") * 1e6, 0)
            .cast("long").as("_d"))
        .collect()
      deltas.foreach { row => w(row.getInt(0)) -= row.getLong(1) }
    }
    w
  }

  /** Score the corpus with a trained weight table: (id, n_tokens, score,
    * pred) with score = round(z, 6) and pred = [z ≥ 0.5]. Zero-shuffle
    * after the feature rollup; with precomputed per-doc features this is
    * a pure projection. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: Array[Long], hexChars: Int = 2): DataFrame =
    scoreFromFeatures(docs, idCol, textCol,
      perDocFeatures(docs, idCol, textCol, hexChars), weights, hexChars)

  private def scoreFromFeatures(docs: DataFrame, idCol: String, textCol: String,
                                perDoc: DataFrame, weights: Array[Long],
                                hexChars: Int): DataFrame = {
    require(weights.length == tableSize(hexChars),
      s"weight table has ${weights.length} slots, expected ${tableSize(hexChars)}")
    val z = bucket_dot(col("_bks"), col("_xs"), weights.toSeq)
    docs.select(col(idCol), size(words(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc.select(col(idCol), col("_bks"), col("_xs")), Seq(idCol))
      .select(col(idCol), col("n_tokens"),
        round(z.cast("double") / 1e12, 6).as("score"),
        when(z >= lit(500000000000L), lit(1)).otherwise(lit(0)).as("pred"))
  }

  /** End-to-end: train on the weak label, score every document. The
    * labeled per-doc feature rollup is built and persisted ONCE and feeds
    * both the GD loop and the scoring projection — the one-shot form
    * previously tokenized and aggregated the corpus twice (train's build
    * + score's rebuild). It stays persisted because the returned frame is
    * lazy and still reads it; at pipeline scale persist the features to
    * parquet instead and call [[score]] over them (scoring is a pure
    * projection there — see the scaladoc above). */
  def classifyReport(docs: DataFrame, idCol: String, textCol: String,
                     labelExpr: Column, iters: Int = 8, lr: Double = 0.0625,
                     hexChars: Int = 2): DataFrame = {
    val perDoc = labeledFeatures(docs, idCol, textCol, labelExpr, hexChars)
      .persist()
    val w = trainFromFeatures(perDoc, iters, lr, hexChars)
    scoreFromFeatures(docs, idCol, textCol, perDoc, w, hexChars)
  }
}
