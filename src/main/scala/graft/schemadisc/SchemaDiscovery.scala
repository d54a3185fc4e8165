package graft.schemadisc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Schema discovery over canonical triples: node types with
 * required/optional predicate sets, and typed edges between node types.
 *
 * Reference analog — the heart of cs562_sdpg:
 *  - required properties: `sum(flag) == count(*)` per cluster
 *    (`Clustering.scala:108-134`), there evaluated per-row on the driver via
 *    `rdd.map`; here a pure post-aggregation column predicate (SURVEY §2.4 A2).
 *  - optional properties: appearance rate < 0.95 within a type
 *    (`src2/main/scala/Main.scala:268-295`), there a driver loop over a
 *    LinkedHashMap; here one `groupBy` pass (SURVEY §2.4 A10).
 *  - typed edges between inferred types with same-type self-edges dropped
 *    (`Clustering.scala:145-184`, drop rule at `:169`).
 */
object SchemaDiscovery {

  val OptionalThreshold = 0.95 // reference: Main.scala:268

  /**
   * Per node type: which outgoing predicates are required (every entity of
   * the type has one) vs optional (rate < 0.95).
   *
   * Input: canonical triples (subj_id, subj_type, pred, ...).
   * Output: (label, predicate, n_entities, n_with, rate, required, optional)
   */
  def nodeTypeSchema(canonicalTriples: DataFrame): DataFrame = {
    val entityCounts = canonicalTriples
      .groupBy(col("subj_type").as("label"))
      .agg(count_distinct(col("subj_id")).as("n_entities"))
    val predCounts = canonicalTriples
      .groupBy(col("subj_type").as("label"), col("pred").as("predicate"))
      .agg(count_distinct(col("subj_id")).as("n_with"))
    predCounts.join(broadcast(entityCounts), "label")
      .withColumn("rate", col("n_with").cast("double") / col("n_entities"))
      .withColumn("required", col("n_with") === col("n_entities"))
      .withColumn("optional", col("rate") < OptionalThreshold)
  }

  /**
   * Typed edge discovery: (src_label, predicate, dst_label) with support
   * counts; same-type self-edges dropped per the reference rule
   * (`Clustering.scala:169`) unless `keepSameType`.
   */
  def edgeTypes(canonicalTriples: DataFrame, keepSameType: Boolean = false): DataFrame = {
    val base = canonicalTriples
      .groupBy(col("subj_type").as("src_label"), col("pred").as("predicate"),
        col("obj_type").as("dst_label"))
      .agg(count(lit(1)).as("n_edges"),
        count_distinct(col("subj_id"), col("obj_id")).as("n_distinct_pairs"))
    if (keepSameType) base else base.filter(col("src_label") =!= col("dst_label"))
  }

  /**
   * Majority-vote type inference over value samples — the reference infers a
   * column's type from the majority runtime class of a 1000-row sample
   * (`src2/main/scala/Main.scala:299-318`, driver-side `take(1000)`). Here:
   * TABLESAMPLE-free distributed version — classify each value with a column
   * expression, `groupBy().count()`, window top-1.
   *
   * Input: any DataFrame and target (string-typed) columns.
   * Output: (column, inferred_type)
   */
  def inferColumnTypes(df: DataFrame, cols: Seq[String], sampleFraction: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fraction >= 1 means "classify everything" — skip the sampler so the
    // result is engine-portable (a seeded Bernoulli sample is deterministic
    // for Spark but not re-derivable by an external oracle)
    val sampled =
      if (sampleFraction >= 1.0) df
      else df.sample(withReplacement = false, sampleFraction, seed = 42L)
    val classified = cols.map { c =>
      // try_cast everywhere: ANSI mode (Spark 4 default) errors on invalid
      // plain casts
      sampled.filter(col(c).isNotNull).select(
        lit(c).as("column"),
        when(expr(s"try_cast(`$c` as long)").isNotNull && !col(c).contains("."), lit("LONG"))
          .when(expr(s"try_cast(`$c` as double)").isNotNull, lit("DOUBLE"))
          .when(lower(col(c)).isin("true", "false"), lit("BOOLEAN"))
          .when(expr(s"try_cast(`$c` as timestamp)").isNotNull, lit("TIMESTAMP"))
          .otherwise(lit("STRING")).as("vtype"))
    }.reduce(_ unionByName _)
    val counts = classified.groupBy("column", "vtype").count()
    val w = Window.partitionBy("column").orderBy(col("count").desc, col("vtype"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("column"), col("vtype").as("inferred_type"))
  }

  /**
   * Per-entity pattern strings — the reference's Pipeline-B pattern
   * representation and merge (`src2/main/scala/Main.scala:174-176`,
   * `normalizeAndMergePatterns`: union of '|'-split tokens, sorted,
   * re-joined), rebuilt as `array_sort ∘ collect_set` inside the
   * aggregation (SURVEY §2.9 M10) — no string round-trip until the final
   * render.
   *
   * Input: canonical triples; output (subj, pattern) where pattern is the
   * sorted '|'-joined set of outgoing predicates.
   */
  def entityPatterns(canonicalTriples: DataFrame): DataFrame =
    canonicalTriples.groupBy(col("subj"))
      .agg(concat_ws("|", array_sort(collect_set(col("pred")))).as("pattern"))

  /**
   * Generic property-bag discovery (the reference's Pipeline-A core, A1+A2):
   * given a table with an id column, a ground-truth-free cluster column and
   * nullable property columns, emit per-cluster required property sets in ONE
   * aggregation pass — `sum(present) == count(*)` as a column expression, no
   * driver loop.
   */
  def requiredProperties(df: DataFrame, clusterCol: String, propCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      propCols.map(c => sum(when(col(c).isNotNull, 1).otherwise(0)).as(s"_p_$c"))
    val agged = df.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
    val props = array(propCols.map(c =>
      struct(lit(c).as("property"),
        (col(s"_p_$c") === col("n")).as("required"),
        (col(s"_p_$c").cast("double") / col("n")).as("rate"))): _*)
    agged.select(col(clusterCol), col("n").as("cluster_size"), explode(props).as("p"))
      .select(col(clusterCol), col("cluster_size"),
        col("p.property"), col("p.required"), col("p.rate"))
      .filter(col("rate") > 0)
  }
}
