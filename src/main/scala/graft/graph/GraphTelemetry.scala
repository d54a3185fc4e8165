package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Degree-distribution telemetry for the constructed KG — the graph QA
 * counterpart of the corpus telemetry ([[graft.textops]] tx7): the
 * in/out/total degree histograms are the first thing to inspect after
 * construction (a hub explosion means canonicalization over-merged; a
 * flat distribution means extraction under-linked), and the shape
 * drives every downstream sizing choice (LSH caps, skew salting, AQE
 * hints).
 *
 * 100 TB shape: distinct edge dedup, two node-keyed partial-agg
 * degree counts, one degree-keyed partial-agg histogram roll-up — all
 * partial aggregates, output bounded by #distinct degrees (≤ max
 * degree, tiny), no windows, no driver collects. `frac` is the one
 * float, a fixed two-op chain over exact longs (6 dp), so the result
 * replays bit-identically in SQL.
 */
object GraphTelemetry {

  /**
   * Long-format degree histogram over the DISTINCT directed edge set:
   * one row per (kind, degree) with kind ∈ {in, out, total}, the node
   * count at that degree, and its fraction of all nodes of that kind's
   * universe (all nodes incident to any edge).
   *
   * @param edges DataFrame with `src`, `dst` string columns; nulls and
   *              duplicate edges dropped.
   */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("deg"))
    // total = in + out over the union of incident nodes (self-loops count
    // once on each side, the standard directed convention)
    val total = out.select(col("node"), col("deg"))
      .unionByName(in.select(col("node"), col("deg")))
      .groupBy("node").agg(sum(col("deg")).as("deg"))
    def hist(d: DataFrame, kind: String) = {
      val n = d.groupBy(col("deg").as("degree")).agg(count(lit(1)).as("n_nodes"))
      val tot = d.select(count(lit(1)).as("_t"))
      n.crossJoin(tot).select(lit(kind).as("kind"), col("degree"),
        col("n_nodes"),
        round(col("n_nodes").cast("double") / col("_t"), 6).as("frac"))
    }
    hist(out, "out").unionByName(hist(in, "in")).unionByName(hist(total, "total"))
  }
}
