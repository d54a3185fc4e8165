package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Robust per-group outlier detection — the pipeline-monitoring gate that
 * catches corrupted ingest batches and metric regressions (Hampel
 * filter / robust z-score): a row is anomalous when its deviation from
 * the group MEDIAN exceeds `cutoff` × the group's MEDIAN ABSOLUTE
 * DEVIATION. Mean/stddev gates silently widen under the very outliers
 * they're meant to catch (a heavy tail inflates σ until nothing flags);
 * median/MAD have a 50% breakdown point, the standard robust choice.
 *
 * Determinism / engine portability: both medians are the EXACT type-1
 * lower order statistic at rank ⌊(n−1)·0.5⌋+1 in the sorted multiset —
 * the [[graft.textops.TextAnalysis.lengthQuantiles]] convention
 * (interpolated percentile conventions differ across engines; rank
 * selection does not). The float chain (dev = |v − med|, the
 * dev > cutoff·mad gate, z = dev/mad at 6dp) is a fixed IEEE sequence
 * over identical inputs, so it replays bit-identically in the oracle.
 *
 * 100 TB shape: one count partial agg, two group-keyed rank windows
 * (median of values, median of deviations), two broadcastable
 * |groups|-row joins, one pure-projection gate. The windows are the
 * cost: each is one exchange + per-group sort on the group key — at
 * extreme group cardinality skew swap the exact rank for
 * `approx_percentile` (documented, same output shape), exactly the
 * tx7 `approx_count_distinct` posture. MAD = 0 groups (a constant
 * majority) flag ANY nonzero deviation and report a null z.
 */
object Outliers {

  /** Rows whose |value − median| > cutoff · MAD within their group:
    * (idCol, groupCol, valueCol, med, mad, robust_z). Null values are
    * dropped; null group keys form their own group is NOT supported —
    * they are dropped too (no meaningful baseline). */
  def robustOutliers(df: DataFrame, idCol: String, groupCol: String,
                     valueCol: String, cutoff: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valueCol).cast("double").as("_v"))
    val n = v.groupBy(groupCol).agg(count(lit(1)).as("_n"))
    val byValue = Window.partitionBy(groupCol).orderBy(col("_v"))
    val med = v.withColumn("_rk", row_number().over(byValue))
      .join(n, Seq(groupCol))
      .filter(col("_rk") === floor((col("_n") - 1) * 0.5) + 1)
      .select(col(groupCol), col("_v").as("med"))
    val d = v.join(med, Seq(groupCol))
      .withColumn("_dev", abs(col("_v") - col("med")))
    val byDev = Window.partitionBy(groupCol).orderBy(col("_dev"))
    val mad = d.withColumn("_rk", row_number().over(byDev))
      .join(n, Seq(groupCol))
      .filter(col("_rk") === floor((col("_n") - 1) * 0.5) + 1)
      .select(col(groupCol), col("_dev").as("mad"))
    d.join(mad, Seq(groupCol))
      .filter(col("_dev") > lit(cutoff) * col("mad"))
      .select(col(idCol), col(groupCol), col("_v").as(valueCol),
        col("med"), col("mad"),
        when(col("mad") > 0, round(col("_dev") / col("mad"), 6)).as("robust_z"))
  }
}
