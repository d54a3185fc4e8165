package graft.schemadisc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Schema-constraint validation of the constructed KG — the SHACL-style
 * closing of the discovery loop: [[SchemaDiscovery]] INDUCES the schema
 * (required predicates per label), this operator ENFORCES it against a
 * triple batch, reporting every typed entity that lacks a predicate its
 * label requires. On a clean self-describing batch the report is empty
 * by construction (required ⟺ every profiled entity has it); violations
 * appear exactly where they matter operationally — incremental batches
 * validated against the ACCUMULATED schema, under-extraction (a rule
 * stopped firing), or cross-type merges from canonicalization (the
 * merged entity inherits a label whose requirements it cannot meet).
 * The reference discovers patterns but never validates data against
 * them (`Clustering.scala` derives, nothing enforces); this is the
 * enforcement half a production KG pipeline runs on every increment.
 *
 * 100 TB shape: the schema table is #labels × #predicates rows
 * (broadcast by size), requirement expansion is a broadcast join on the
 * entity-type table, and the check is ONE left-anti join keyed on
 * (entity, predicate) against the distinct subject-predicate profile —
 * a single shuffle over the profile, no windows, no driver collects.
 */
object Validation {

  /**
   * Entities missing predicates their label requires.
   *
   * @param triples     the batch to validate: `subj`, `pred`, `obj`
   * @param entityTypes entity → label assignment: `entity`, label in
   *                    `assigned_type` (the [[graft.graph.EntityTyping]]
   *                    output shape)
   * @param schema      discovered node schema: `label`, `predicate`,
   *                    boolean `required` (the [[SchemaDiscovery]]
   *                    nodeSchema shape)
   * @return (entity, label, predicate) — one row per unmet requirement,
   *         i.e. the typed entity has NO (entity, predicate, _) triple.
   */
  def requiredViolations(triples: DataFrame, entityTypes: DataFrame,
                         schema: DataFrame): DataFrame = {
    val req = schema.filter(col("required"))
      .select(col("label"), col("predicate"))
    val expect = entityTypes
      .select(col("entity"), col("assigned_type").as("label"))
      .filter(col("entity").isNotNull && col("label").isNotNull)
      .join(req, Seq("label")) // broadcast: schema is labels x predicates
    val have = triples
      .filter(col("subj").isNotNull && col("pred").isNotNull)
      .select(col("subj").as("entity"), col("pred").as("predicate"))
    expect.join(have, Seq("entity", "predicate"), "left_anti")
      .select(col("entity"), col("label"), col("predicate"))
  }
}
