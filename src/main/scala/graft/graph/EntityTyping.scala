package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Entity-type induction by plurality vote over typed mention slots — the
 * typing stage between extraction and schema enforcement: every
 * extraction rule types the slots it fills (the subj of `works_at` is a
 * person, its obj an org — `Extraction.rules`), so each mention casts a
 * vote and an entity's type is the plurality winner. Disagreement is the
 * signal: an entity with purity < 1 is either a linking error (two
 * entities merged across types — the canonicalization alarm) or a
 * genuinely polysemous name ("Amazon" the org / the river). The
 * reference infers LABELS per cluster the same one-vote-per-row way in
 * its schema discovery (`Clustering.scala`, LSH-clustered label sets);
 * this is that idea applied at the entity grain.
 *
 * 100 TB shape: one (entity, type) partial-agg count, then ONE
 * entity-keyed partial aggregate where the winner is an arg-min
 * `min(struct(-votes, type))` — map-side combine reduces each entity to
 * one row before the shuffle, strictly cheaper than a window (the
 * [[ConflictResolution]] posture); ties break on the smaller type name
 * deterministically. Purity's float division is the only non-integer
 * step and runs once per entity.
 */
object EntityTyping {

  /** Per-entity: (entity, assigned_type, votes, n_mentions, purity).
    * Input needs one row per typed mention; null entities/types drop. */
  def plurality(mentions: DataFrame, entityCol: String, typeCol: String): DataFrame = {
    val v = mentions
      .filter(col(entityCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(col(entityCol).as("entity"), col(typeCol).as("etype"))
      .agg(count(lit(1)).as("votes"))
    v.groupBy("entity")
      .agg(min(struct((-col("votes")).as("nv"), col("etype").as("t"))).as("_b"),
        sum(col("votes")).as("n_mentions"))
      .select(col("entity"), col("_b.t").as("assigned_type"),
        (-col("_b.nv")).as("votes"), col("n_mentions"),
        round((-col("_b.nv")) / col("n_mentions"), 6).as("purity"))
  }
}
