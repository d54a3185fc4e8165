package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic multi-turn transcript generator.
 *
 * Produces the engine's input contract table
 * `(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)`
 * plus closed-form golden outputs (triples / entity clusters / schema) so the
 * pipeline can be scored the way the reference scores itself against in-band
 * ground truth (reference: `_labels` ride-along, DataLoader.scala:29, and the
 * corrupted-dataset sweep, run_tale_ldbc.sh:16).
 *
 * Everything is derived from `xxhash64` of the row id + a fixed seed — fully
 * distributed (`spark.range`), partition-stable, no driver-side randomness
 * (the reference's unseeded `scala.util.Random`, Noise.scala:7, is a defect
 * we do not replicate).
 */
object TranscriptGen {

  val Seed = 42L

  // Entity dictionaries. Names are pairwise dissimilar (char-3-gram Jaccard
  // well below the linking threshold) so only deliberate alias variants of the
  // SAME entity are near-duplicates in MinHash space.
  val persons: Seq[String] = Seq(
    "Alice Johnson", "Bob Smith", "Carol Martinez", "David Lee",
    "Emma Wilson", "Frank Brown", "Grace Kim", "Henry Davis",
    "Isabel Garcia", "Jack Taylor", "Karen Moore", "Liam Anderson",
    "Maria Thomas", "Noah Jackson", "Olivia White", "Peter Harris",
    "Quinn Murphy", "Rachel Clark", "Samuel Lewis", "Tina Walker")
  val orgs: Seq[String] = Seq(
    "Acme Corp", "Globex Industries", "Initech Systems", "Umbrella Labs",
    "Stark Enterprises", "Wayne Holdings", "Cyberdyne Works", "Tyrell Group",
    "Wonka Factory", "Hooli Cloud", "Pied Piper", "Vandelay Imports")
  val cities: Seq[String] = Seq(
    "Springfield", "Riverton", "Lakewood", "Fairview", "Greenville",
    "Bristol Bay", "Madison Port", "Clayton Hills", "Ashford", "Brockton")
  val tools: Seq[String] = Seq("search", "calculator", "browser", "db_query")

  /** Predicates with their subject/object entity types; the extraction rules
    * in [[graft.extract.Extraction]] mirror these templates exactly. */
  val predicates: Seq[(String, String, String, String)] = Seq(
    // (pred, template-infix, subjType, objType)
    ("works_at", " works at ", "person", "org"),
    ("lives_in", " lives in ", "person", "city"),
    ("reports_to", " reports to ", "person", "person"),
    ("based_in", " is based in ", "org", "city"))

  private def pick(pool: Seq[String], h: org.apache.spark.sql.Column) =
    element_at(
      array(pool.map(lit): _*),
      (pmod(h, lit(pool.size)) + 1).cast("int"))

  // bounded non-negative hash: pmod keeps all downstream index arithmetic
  // far from Long overflow (ANSI mode errors on overflow, Spark 4 default)
  private def h(cols: org.apache.spark.sql.Column*) =
    pmod(xxhash64((lit(Seed) +: cols): _*), lit(1000000007L))

  /**
   * Apply a deterministic alias variant to an entity surface form.
   * Variant 0 (70%): canonical form. 1: lowercase. 2: doubled last char
   * (typo). 3: honorific/extra whitespace. All variants keep char-3-gram
   * Jaccard >= ~0.7 vs the canonical form after normalization, while distinct
   * entities stay far below — this is what drives the LSH-blocking +
   * canonicalization path (analog of the reference's noise sweep).
   */
  private def alias(base: org.apache.spark.sql.Column, hv: org.apache.spark.sql.Column) = {
    val v = pmod(hv, lit(10)) // 0..9
    when(v <= 6, base)
      .when(v === 7, lower(base))
      .when(v === 8, concat(base, substring(base, -1, 1))) // double last char
      .otherwise(concat(base, lit(" "), lit(""))) // trailing space
  }

  /** Number of turns per conversation: power-law-ish — a few hot
    * conversations get many turns to exercise skew handling. */
  private def turnsFor(convHash: org.apache.spark.sql.Column, avgTurns: Int) =
    when(pmod(convHash, lit(50)) === 0, lit(avgTurns * 20)) // 2% hot convs
      .otherwise(pmod(convHash, lit(avgTurns * 2)) + 1)

  /**
   * Generate the transcript table. `nConvs` conversations, ~`avgTurns` turns
   * each (power-law tail). Returns columns exactly per the input contract.
   */
  def transcripts(spark: SparkSession, nConvs: Long, avgTurns: Int = 8): DataFrame = {
    val convs = spark.range(nConvs).select(
      col("id").as("cid"),
      turnsFor(h(col("id"), lit(1)), avgTurns).as("n_turns"))
    // explode to turns without driver involvement
    val turns = convs
      .select(col("cid"), explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"))
    val hTmpl = h(col("cid"), col("turn_idx"), lit(2))
    val hSubj = h(col("cid"), col("turn_idx"), lit(3))
    val hObj  = h(col("cid"), col("turn_idx"), lit(4))
    val hAl1  = h(col("cid"), col("turn_idx"), lit(5))
    val hAl2  = h(col("cid"), col("turn_idx"), lit(6))
    val hRole = h(col("cid"), col("turn_idx"), lit(7))

    // template id 0..5: 0-3 = fact templates (one per predicate), 4 = chatter,
    // 5 = tool call
    val tmpl = pmod(hTmpl, lit(6))

    val subjPerson = alias(pick(persons, hSubj), hAl1)
    val objOrg     = alias(pick(orgs, hObj), hAl2)
    val objCity    = alias(pick(cities, hObj), hAl2)
    // distinct person for reports_to (offset avoids self-reporting)
    val objPerson  = alias(pick(persons, hSubj + pmod(hObj, lit(persons.size - 1)) + 1), hAl2)
    val subjOrg    = alias(pick(orgs, hSubj), hAl1)

    val text = when(tmpl === 0, concat(subjPerson, lit(" works at "), objOrg, lit(".")))
      .when(tmpl === 1, concat(subjPerson, lit(" lives in "), objCity, lit(".")))
      .when(tmpl === 2, concat(subjPerson, lit(" reports to "), objPerson, lit(".")))
      .when(tmpl === 3, concat(subjOrg, lit(" is based in "), objCity, lit(".")))
      .when(tmpl === 4, lit("Please summarize the previous discussion."))
      .otherwise(concat(lit("Found results for "), objOrg, lit(" in the index.")))

    val role = when(tmpl === 5, lit("tool"))
      .when(pmod(hRole, lit(2)) === 0, lit("user"))
      .otherwise(lit("assistant"))
    val tool = when(tmpl === 5, pick(tools, hRole)).otherwise(lit(null).cast("string"))

    turns.select(
      concat(lit("conv_"), lpad(col("cid").cast("string"), 8, "0")).as("conv_id"),
      col("turn_idx").cast("int").as("turn_idx"),
      role.as("role"),
      text.as("text"),
      tool.as("tool"),
      // strictly increasing within a conversation
      (lit(1704067200L) + col("cid") * 100000L + col("turn_idx") * 60L)
        .cast("timestamp").as("ts"))
  }

  /** Golden triples in canonical surface form — computable in closed form
    * because the generator knows which entity each mention refers to. */
  def goldenTriples(spark: SparkSession, nConvs: Long, avgTurns: Int = 8): DataFrame = {
    val convs = spark.range(nConvs).select(
      col("id").as("cid"),
      turnsFor(h(col("id"), lit(1)), avgTurns).as("n_turns"))
    val turns = convs
      .select(col("cid"), explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"))
    val hTmpl = h(col("cid"), col("turn_idx"), lit(2))
    val hSubj = h(col("cid"), col("turn_idx"), lit(3))
    val hObj  = h(col("cid"), col("turn_idx"), lit(4))
    val tmpl = pmod(hTmpl, lit(6))
    val subjPerson = pick(persons, hSubj)
    val objPerson  = pick(persons, hSubj + pmod(hObj, lit(persons.size - 1)) + 1)
    turns.select(
      concat(lit("conv_"), lpad(col("cid").cast("string"), 8, "0")).as("conv_id"),
      col("turn_idx").cast("int").as("turn_idx"),
      when(tmpl === 0, subjPerson).when(tmpl === 1, subjPerson)
        .when(tmpl === 2, subjPerson).when(tmpl === 3, pick(orgs, hSubj)).as("subj"),
      when(tmpl === 0, lit("works_at")).when(tmpl === 1, lit("lives_in"))
        .when(tmpl === 2, lit("reports_to")).when(tmpl === 3, lit("based_in")).as("pred"),
      when(tmpl === 0, pick(orgs, hObj)).when(tmpl === 1, pick(cities, hObj))
        .when(tmpl === 2, objPerson).when(tmpl === 3, pick(cities, hObj)).as("obj"))
      .filter(col("pred").isNotNull)
  }

  /** Write fixture + goldens as partitioned parquet (Iceberg-style layout:
    * hash-bucketed by conv_id so resume reads prune, SURVEY.md §7 stage 7). */
  def write(spark: SparkSession, dir: String, nConvs: Long, avgTurns: Int = 8): Unit = {
    transcripts(spark, nConvs, avgTurns)
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(16)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/transcripts")
    goldenTriples(spark, nConvs, avgTurns)
      .write.mode("overwrite").parquet(s"$dir/golden_triples")
  }
}
