package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot diff between two knowledge-graph triple sets — the maintenance
 * primitive for a KG that is rebuilt (or incrementally extended) as new
 * transcript batches land: which triples appeared, which disappeared,
 * which persist. Downstream consumers (belief revision kg19, serving
 * cards kg20, the Neo4j/RDF export sinks) want the DELTA, not a full
 * re-export, once the graph is 10^10 triples.
 *
 * Set semantics: inputs are treated as distinct triple sets (duplicate
 * rows within a snapshot collapse — a triple is either in a snapshot or
 * not).
 *
 * 100 TB shape: ONE shuffle — union the two snapshots with side flags and
 * aggregate max(flag) per (subj, pred, obj); the partial aggregate
 * collapses within-snapshot duplicates map-side, so the exchange carries
 * at most one row per (triple, side). No join, no window, no driver
 * action. (A full-outer join would shuffle both sides the same amount but
 * adds a second operator and null-handling; the flag-union is the
 * canonical diff shape.) The reference has no incremental posture at all
 * (one-shot `sbt run` per dataset, cf. its Main.scala flow); this is part
 * of the rebuild's resumable/incremental family (dd8, Incremental,
 * Checkpoint).
 *
 * @return (subj, pred, obj, status) with status in
 *         {added (new only), removed (old only), kept (both)}.
 */
object KGDelta {

  def diff(oldTriples: DataFrame, newTriples: DataFrame): DataFrame = {
    val o = oldTriples.select(col("subj"), col("pred"), col("obj"),
      lit(1).as("_o"), lit(0).as("_n"))
    val n = newTriples.select(col("subj"), col("pred"), col("obj"),
      lit(0).as("_o"), lit(1).as("_n"))
    o.unionByName(n)
      .groupBy("subj", "pred", "obj")
      .agg(max(col("_o")).as("_in_old"), max(col("_n")).as("_in_new"))
      .select(col("subj"), col("pred"), col("obj"),
        when(col("_in_old") === 1 && col("_in_new") === 1, "kept")
          .when(col("_in_new") === 1, "added")
          .otherwise("removed").as("status"))
  }
}
