package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.extract.Extraction
import graft.fixtures.TranscriptGen
import graft.pipeline.KGPipeline
import graft.schemadisc.SchemaDiscovery
import graft.sources.EventTranscripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md §2 (or a
  * training-data-pipeline extension); `oracleSql` gives the DuckDB-equivalent
  * SQL over the same parquet tables. Double aggregations go through
  * DECIMAL(18,2) before the final double cast so both engines aggregate
  * exactly (order-independent) — raw double sums are not associative.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full KG-construction pipeline on synthetic transcripts. */
  def entry(spark: SparkSession): DataFrame = {
    val tr = TranscriptGen.transcripts(spark, nConvs = 300)
    KGPipeline.run(spark, tr).tripleSet
  }

  private def eventsTranscripts(s: SparkSession, dir: String): DataFrame =
    EventTranscripts.fromEvents(tbl(s, dir, "events"))

  /** Exact decimal-backed double sum (associative on both engines). */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational operator coverage (SURVEY §2.2-2.8) ----

    // A1/A3: hash aggregation with multiple measures (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => tbl(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))),

    // J1/J4: two equi-joins, small dims broadcast (reference's manual
    // broadcast map, Clustering.scala:152-181, done declaratively)
    "q2_join_broadcast" -> ((s, dir) => tbl(s, dir, "orders")
      .join(broadcast(tbl(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("o_totalprice")).as("total_price"), count(lit(1)).as("n_orders"))),

    // W1/O1: top-1-per-group via row_number (ClusteringEvaluation.scala:17-22)
    "q3_window_top1" -> ((s, dir) => tbl(s, dir, "orders")
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("top_order"),
        col("o_totalprice").as("top_price"))),

    // J3 + anti-join (the FN-set computation the reference hand-rolls with
    // left_outer + coalesce, ClusteringEvaluation.scala:48-55)
    "q4_anti_join" -> ((s, dir) => tbl(s, dir, "customer")
      .join(tbl(s, dir, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers_no_orders"))),

    // P1+A2+A10: binary presence matrix -> required/optional property
    // discovery in one agg pass (Clustering.scala:89-134, Main.scala:268-295)
    "q5_required_props" -> ((s, dir) => {
      val bags = tbl(s, dir, "orders").select(
        col("o_orderstatus"),
        when(col("o_totalprice") > 100, lit("x")).as("p_high_value"),
        when(pmod(col("o_orderkey"), lit(10)) < 9, lit("y")).as("p_mostly"),
        lit("z").as("p_always"))
      SchemaDiscovery.requiredProperties(bags, "o_orderstatus",
        Seq("p_high_value", "p_mostly", "p_always"))
    }),

    // E1: union + value-dedup (idempotent resume merge, Main.scala:103-113)
    "q6_union_dedup" -> ((s, dir) => {
      val a = tbl(s, dir, "orders").select("o_custkey", "o_orderstatus")
      a.unionByName(a).distinct()
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_distinct"))
    }),

    // J2 shape + left-outer + coalesce(lit(0)) (F2)
    "q7_left_outer_coalesce" -> ((s, dir) => {
      val perCust = tbl(s, dir, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
      tbl(s, dir, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_mktsegment")
        .agg(sum(coalesce(col("cnt"), lit(0L))).as("total_orders"),
          count(lit(1)).as("n_customers"))
    }),

    // ---- KG pipeline (BASELINE north_rule), oracle-checkable slice ----

    // stable turn ordering (input contract invariant)
    "kg1_transcripts" -> ((s, dir) =>
      eventsTranscripts(s, dir).select("conv_id", "turn_idx", "role", "text", "tool")),

    // per-turn triple extraction (DataToPattern.scala:11-73 analog)
    "kg2_triples_raw" -> ((s, dir) =>
      Extraction.triplesRaw(eventsTranscripts(s, dir))
        .select(col("conv_id"), col("turn_idx"), col("subj_raw").as("subj"),
          col("pred"), col("obj_raw").as("obj"))),

    // mention table (distinct normalized mentions with occurrence counts)
    "kg3_mentions" -> ((s, dir) =>
      Extraction.mentions(Extraction.triplesRaw(eventsTranscripts(s, dir)))
        .select("mention_type", "norm", "n_occurrences")),

    // FULL pipeline end-to-end: extraction -> LSH blocking -> connected
    // components -> canonical triples. On clean templated input the linker
    // must produce the identity clustering (precision check), so the final
    // triple set is SQL-derivable.
    "kg4_triple_set" -> ((s, dir) => {
      val r = KGPipeline.run(s, eventsTranscripts(s, dir),
        KGPipeline.Config(jaccardThreshold = 0.95))
      r.tripleSet
    }),

    // schema discovery over canonical triples (required/optional predicates)
    "kg5_node_schema" -> ((s, dir) => {
      val r = KGPipeline.run(s, eventsTranscripts(s, dir),
        KGPipeline.Config(jaccardThreshold = 0.95))
      r.nodeSchema.select("label", "predicate", "n_with", "n_entities", "rate",
        "required", "optional")
    }),

    // typed edge discovery with same-type self-edges dropped
    // (Clustering.scala:169 rule)
    "kg6_edge_types" -> ((s, dir) => {
      val r = KGPipeline.run(s, eventsTranscripts(s, dir),
        KGPipeline.Config(jaccardThreshold = 0.95))
      r.edgeSchema.select("src_label", "predicate", "dst_label", "n_edges",
        "n_distinct_pairs")
    })
  )

  // DuckDB oracles. The KG oracles re-derive expected outputs directly from
  // the event columns (independent of the Spark mechanism), so they validate
  // extraction/linking semantics, not just regex parity.
  private val T = EventTranscripts.sqlCte

  private val triplesCte =
    s"""WITH transcripts AS ($T),
       |triples AS (
       |  SELECT conv_id, turn_idx,
       |    CASE WHEN text LIKE '% works at %' OR text LIKE '% lives in %' OR text LIKE '% reports to %'
       |         THEN regexp_extract(text, '^(.*) (?:works at|lives in|reports to|is based in) (.*)\\.$$', 1)
       |         WHEN text LIKE '% is based in %'
       |         THEN regexp_extract(text, '^(.*) is based in (.*)\\.$$', 1)
       |    END AS subj,
       |    CASE WHEN text LIKE '% works at %' THEN 'works_at'
       |         WHEN text LIKE '% lives in %' THEN 'lives_in'
       |         WHEN text LIKE '% reports to %' THEN 'reports_to'
       |         WHEN text LIKE '% is based in %' THEN 'based_in' END AS pred,
       |    regexp_extract(text, '^(.*) (?:works at|lives in|reports to|is based in) (.*)\\.$$', 2) AS obj,
       |    CASE WHEN text LIKE '% is based in %' THEN 'org' ELSE 'person' END AS subj_type,
       |    CASE WHEN text LIKE '% works at %' THEN 'org'
       |         WHEN text LIKE '% reports to %' THEN 'person' ELSE 'city' END AS obj_type
       |  FROM transcripts WHERE text NOT LIKE 'Please%')""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |COUNT(*) AS n_rows FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q2_join_broadcast" ->
      """SELECT n_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""".stripMargin,
    "q3_window_top1" ->
      """SELECT o_custkey, o_orderkey AS top_order, o_totalprice AS top_price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q4_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers_no_orders FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_totalprice > 300000)
        |GROUP BY 1""".stripMargin,
    "q5_required_props" ->
      """WITH bags AS (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_totalprice > 100 THEN 'x' END AS p_high_value,
        |    CASE WHEN o_orderkey % 10 < 9 THEN 'y' END AS p_mostly,
        |    'z' AS p_always
        |  FROM orders),
        |agg AS (
        |  SELECT o_orderstatus, COUNT(*) AS n,
        |    SUM(CASE WHEN p_high_value IS NOT NULL THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN p_mostly IS NOT NULL THEN 1 ELSE 0 END) AS c2,
        |    SUM(CASE WHEN p_always IS NOT NULL THEN 1 ELSE 0 END) AS c3
        |  FROM bags GROUP BY 1)
        |SELECT o_orderstatus, n AS cluster_size, 'p_high_value' AS property,
        |  c1 = n AS required, CAST(c1 AS DOUBLE) / n AS rate FROM agg WHERE c1 > 0
        |UNION ALL
        |SELECT o_orderstatus, n, 'p_mostly', c2 = n, CAST(c2 AS DOUBLE) / n FROM agg WHERE c2 > 0
        |UNION ALL
        |SELECT o_orderstatus, n, 'p_always', c3 = n, CAST(c3 AS DOUBLE) / n FROM agg WHERE c3 > 0""".stripMargin,
    "q6_union_dedup" ->
      """SELECT o_orderstatus, COUNT(*) AS n_distinct FROM (
        |  SELECT DISTINCT o_custkey, o_orderstatus FROM (
        |    SELECT o_custkey, o_orderstatus FROM orders
        |    UNION ALL SELECT o_custkey, o_orderstatus FROM orders))
        |GROUP BY 1""".stripMargin,
    "q7_left_outer_coalesce" ->
      """WITH per_cust AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1)
        |SELECT c_mktsegment, CAST(SUM(COALESCE(cnt, 0)) AS BIGINT) AS total_orders,
        |COUNT(*) AS n_customers
        |FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey GROUP BY 1""".stripMargin,
    "kg1_transcripts" ->
      s"WITH transcripts AS ($T) SELECT conv_id, turn_idx, role, text, tool FROM transcripts",
    "kg2_triples_raw" ->
      s"$triplesCte SELECT conv_id, turn_idx, subj, pred, obj FROM triples",
    "kg3_mentions" ->
      s"""$triplesCte,
         |slots AS (
         |  SELECT subj_type AS mention_type, subj AS raw FROM triples
         |  UNION ALL SELECT obj_type, obj FROM triples)
         |SELECT mention_type, raw AS norm, COUNT(*) AS n_occurrences
         |FROM slots GROUP BY 1, 2""".stripMargin,
    "kg4_triple_set" ->
      s"$triplesCte SELECT DISTINCT subj, pred, obj FROM triples",
    "kg5_node_schema" ->
      s"""$triplesCte,
         |ec AS (SELECT subj_type AS label, COUNT(DISTINCT subj) AS n_entities FROM triples GROUP BY 1),
         |pc AS (SELECT subj_type AS label, pred AS predicate, COUNT(DISTINCT subj) AS n_with FROM triples GROUP BY 1, 2)
         |SELECT pc.label, pc.predicate, pc.n_with, ec.n_entities,
         |  CAST(pc.n_with AS DOUBLE) / ec.n_entities AS rate,
         |  pc.n_with = ec.n_entities AS required,
         |  CAST(pc.n_with AS DOUBLE) / ec.n_entities < 0.95 AS "optional"
         |FROM pc JOIN ec ON pc.label = ec.label""".stripMargin,
    "kg6_edge_types" ->
      s"""$triplesCte
         |SELECT subj_type AS src_label, pred AS predicate, obj_type AS dst_label,
         |  COUNT(*) AS n_edges, COUNT(DISTINCT subj || '|' || obj) AS n_distinct_pairs
         |FROM triples WHERE subj_type <> obj_type GROUP BY 1, 2, 3""".stripMargin
  )
}
