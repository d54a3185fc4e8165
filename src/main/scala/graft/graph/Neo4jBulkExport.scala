package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Export the materialized graph in Neo4j bulk-import CSV layout — the
 * migration path back into the reference's world: cs562_sdpg READS a live
 * Neo4j (`DataLoader.scala:23,71`); a user switching to this engine runs
 * the pipeline on Spark and loads the result with
 * `neo4j-admin database import full --nodes=<dir>/nodes_header.csv,<dir>/nodes/part-.* \
 *    --relationships=<dir>/relationships_header.csv,<dir>/relationships/part-.*`
 *
 * Scale shape: data files are written DISTRIBUTED (one headerless CSV part
 * per task — bulk import accepts any number of data files per group; no
 * `coalesce(1)` bottleneck); the one-line header files are driver-side
 * 100-byte writes. Quoting is RFC 4180 (`escape = "` doubles embedded
 * quotes), which is what neo4j-admin parses — Spark's default
 * backslash-escape would corrupt values containing quotes.
 */
object Neo4jBulkExport {

  /** Relationship types: predicate upper-cased, non-alnum runs to `_`
    * (Neo4j type tokens; `works at` -> `WORKS_AT`). */
  private def relType(pred: org.apache.spark.sql.Column) =
    upper(regexp_replace(pred, "[^a-zA-Z0-9]+", "_"))

  /**
   * Write `nodes`/`edges` (shapes from [[Materialize.nodes]]/
   * [[Materialize.edges]]) under `dir`:
   * `nodes_header.csv` + `nodes/part-*`,
   * `relationships_header.csv` + `relationships/part-*`.
   */
  def write(nodes: DataFrame, edges: DataFrame, dir: String): Unit = {
    val n = nodes.select(
      col("canonical_id").cast("string").as("canonical_id:ID"),
      col("label").as(":LABEL"),
      col("canonical_form"),
      col("uri"),
      col("n_mentions").as("n_mentions:long"),
      col("out_degree").as("out_degree:long"),
      col("in_degree").as("in_degree:long"))
    val e = edges.select(
      col("src_id").cast("string").as(":START_ID"),
      col("dst_id").cast("string").as(":END_ID"),
      relType(col("pred")).as(":TYPE"),
      col("pred"),
      col("n_support").as("n_support:long"),
      col("n_convs").as("n_convs:long"),
      col("first_turn").as("first_turn:long"))
    writeGroup(n, dir, "nodes")
    writeGroup(e, dir, "relationships")
  }

  private def writeGroup(df: DataFrame, dir: String, group: String): Unit = {
    df.write.mode("overwrite")
      .option("header", "false")
      .option("escape", "\"")   // RFC 4180 doubled quotes, neo4j-admin's dialect
      // empty string and null BOTH serialize as a bare empty field —
      // intentional conflation matching neo4j-admin's "empty field = no
      // value" import semantics (it skips empty fields by default); the
      // round-trip reader accordingly reads both back as null
      .option("emptyValue", "")
      .csv(s"$dir/$group")
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir).isAbsolute match {
        case true => new java.net.URI(dir)
        case false => new java.io.File(dir).toURI
      }, spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/${group}_header.csv"), true)
    // header fields are CSV-quoted too: a property column named `a,b` or
    // `a"b` must not desync the column count at import or round-trip
    try out.write((df.columns.map(csvField).mkString(",") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** RFC 4180 field encoding (quote when the value contains , " or a
    * newline; double embedded quotes). */
  private[graph] def csvField(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** RFC 4180 parse of one header line into column names. */
  private[graph] def parseCsvLine(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQ = false
        } else cur.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.toString; cur.setLength(0)
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.toSeq
  }

  /** Read an exported group back (header file + headerless parts) — the
    * round-trip used by tests and by downstream Spark consumers. The header
    * line is parsed as CSV (not split on raw commas), so hostile column
    * names (comma/quote) round-trip. */
  def readGroup(spark: SparkSession, dir: String, group: String): DataFrame = {
    val header = parseCsvLine(
      spark.read.text(s"$dir/${group}_header.csv").head().getString(0))
    spark.read
      .option("header", "false")
      .option("escape", "\"")
      .csv(s"$dir/$group")
      .toDF(header: _*)
  }
}
