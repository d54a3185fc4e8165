package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic cardinality sketches. Spark's own `approx_count_distinct`
 * (HyperLogLog++) is the right default at scale, but its register layout
 * is engine-private — no other system can reproduce the estimate, so it
 * can only ever get a weaker rows-only correctness check. The KMV
 * (k-minimum-values) sketch here (Bar-Yossef et al., "Counting distinct
 * elements in a data stream", RANDOM 2002) trades a little accuracy for
 * full engine portability: the k smallest md5-derived hash fractions are
 * a pure function of the value set, so DuckDB re-derives the EXACT
 * estimate and the driver gets a rows+schema+hash green instead of a
 * rows-only pass.
 */
object Sketches {

  /**
   * KMV distinct-count estimate per group.
   *
   * Hash: the first 8 hex chars of `md5(value)` read as a uint32 `v`,
   * mapped to the fraction `(v+1) / 2^32` in (0, 1] (the +1 dodges the
   * zero fraction a literal `00000000` prefix would produce). Estimator:
   * `(k-1) / frac_k` with `frac_k` the k-th smallest fraction; groups
   * with fewer than k distinct hashes report their exact count (the
   * sketch IS exact below its capacity). Two distinct values colliding
   * on the 32-bit prefix collapse — that is part of the sketch's error
   * budget and is reproduced identically by any re-implementation.
   *
   * Shape: one exchange for the (group, hash) dedup (partial-agg dedups
   * map-side first) + one for the per-group window, which Spark plans as
   * WindowGroupLimit — each map task forwards only its k smallest hashes,
   * so the second exchange carries O(k) rows per group per task, never
   * the corpus.
   *
   * @param values pre-projected (groupCols..., `value`) rows; duplicates
   *               are fine (dedup is the sketch's first step).
   * @return (groupCols..., n_tracked: long = min(distinct, k),
   *         distinct_est: double, 6 dp).
   */
  def kmvDistinct(values: DataFrame, groupCols: Seq[String],
                  valueCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val g = groupCols.map(col)
    val pref = conv(substring(md5(valueCol.cast("string")), 1, 8), 16, 10)
      .cast("long")
    val d = values.select(g :+ pref.as("_h"): _*).distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("_h"))
    d.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(g: _*)
      .agg(max(col("_rn")).cast("long").as("n_tracked"),
        max(when(col("_rn") === k, col("_h"))).as("_kth"))
      .select(g ++ Seq(col("n_tracked"),
        round(when(col("n_tracked") < k, col("n_tracked").cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) / (col("_kth") + 1)),
          6).as("distinct_est")): _*)
  }
}
