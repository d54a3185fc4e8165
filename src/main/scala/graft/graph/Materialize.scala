package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph materialization: canonical triples → node and edge tables.
 *
 * Reference analog: `createEdgesFromRelationships` +
 * `integrateEdgesIntoPatterns` (cs562_sdpg `Clustering.scala:145-214`),
 * which looked node types up in a driver-broadcast HashMap and collected
 * edges to the driver. Here both tables are single `groupBy` passes over
 * the canonical triple stream — partial aggregation map-side, one shuffle
 * each, never a driver boundary.
 */
object Materialize {

  /** Node table: one row per canonical entity.
    * (canonical_id, label, canonical_form, uri, n_mentions, n_forms, degree) */
  def nodes(canonicalTriples: DataFrame, entities: DataFrame): DataFrame = {
    val degOut = canonicalTriples.groupBy(col("subj_id").as("canonical_id"))
      .agg(count(lit(1)).as("out_degree"))
    val degIn = canonicalTriples.groupBy(col("obj_id").as("canonical_id"))
      .agg(count(lit(1)).as("in_degree"))
    entities.groupBy(col("canonical_id"), col("mention_type").as("label"),
        col("canonical_form"), col("canonical_uri").as("uri"))
      .agg(sum("n_occurrences").as("n_mentions"),
        count(lit(1)).as("n_forms"))
      .join(degOut, Seq("canonical_id"), "left")
      .join(degIn, Seq("canonical_id"), "left")
      .withColumn("out_degree", coalesce(col("out_degree"), lit(0L)))
      .withColumn("in_degree", coalesce(col("in_degree"), lit(0L)))
  }

  /** Edge table: one row per (src, pred, dst) with support + provenance
    * span. */
  def edges(canonicalTriples: DataFrame): DataFrame = {
    canonicalTriples.groupBy(
        col("subj_id").as("src_id"), col("pred"), col("obj_id").as("dst_id"),
        col("subj").as("src"), col("obj").as("dst"),
        col("subj_type").as("src_label"), col("obj_type").as("dst_label"))
      .agg(count(lit(1)).as("n_support"),
        count_distinct(col("conv_id")).as("n_convs"),
        min(col("turn_idx")).as("first_turn"))
  }

  /** Distinct logical triple set (the deliverable compared against the
    * reference's emitted triples, BASELINE north_rule). */
  def tripleSet(canonicalTriples: DataFrame): DataFrame =
    canonicalTriples.select("subj", "pred", "obj").distinct()
}
