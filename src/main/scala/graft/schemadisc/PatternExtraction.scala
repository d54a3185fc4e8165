package graft.schemadisc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generalized pattern extraction over ARBITRARY schemaless input — "point
 * the engine at an unknown table" and get a `(label, propertySet, edgeSet)`
 * pattern per row plus a minted URI.
 *
 * Reference semantics (cs562_sdpg `src2/main/scala/DataToPattern.scala:11-79`,
 * which `collect()`s every row to the driver and walks it in Scala):
 *  - node label: the FIRST column whose NAME contains a dictionary label
 *    decides (first matching label in dictionary order); if no header
 *    matches, the first column (in order) whose VALUE contains a label
 *    decides; else `UnknownNodeLabel`;
 *  - the first column is the id; uri = `graft://<label>/<sha256(id)>`
 *    (reference mints `sdpg.gr/<label>/<sha256(id)>`);
 *  - properties: non-id columns whose name matches NO label and whose value
 *    is non-null (so optionality falls out of the per-row pattern census);
 *  - edges: non-id columns whose name contains a label, regardless of value.
 *
 * Rebuilt as pure Catalyst column expressions: header decisions are made
 * ONCE from the schema at plan time (they are per-table constants), value
 * scans compile to a coalesce over per-column `contains` whens inside one
 * whole-stage-codegen projection — no driver boundary, no row encoders.
 */
object PatternExtraction {

  /** The reference's label dictionary (`DataToPattern.scala:9`). */
  val defaultLabels: Seq[String] = Seq(
    "Person", "Place", "Event", "Organization", "Location",
    "Product", "Company", "City", "Country")

  val unknownLabel = "UnknownNodeLabel"

  private def nameMatches(field: String, labels: Seq[String]): Option[String] =
    labels.find(l => field.toLowerCase.contains(l.toLowerCase))

  /**
   * Per-row pattern extraction. Output:
   * (id: string, uri: string, label: string,
   *  properties: array<string> sorted, edges: array<string> sorted)
   */
  def rowPatterns(df: DataFrame, labels: Seq[String] = defaultLabels): DataFrame = {
    require(df.columns.nonEmpty, "input must have at least one column")
    val fields = df.columns.toSeq
    val idField = fields.head

    // header scan: first field (in column order) whose name contains any
    // label; that field's first dictionary-order label wins. Plan-time
    // constant for a fixed schema.
    val headerLabel: Option[String] =
      fields.flatMap(f => nameMatches(f, labels)).headOption

    val labelCol: Column = headerLabel match {
      case Some(l) => lit(l)
      case None =>
        // value scan: first field (column order) whose stringified value
        // contains any label; dictionary order within the field
        val perField = fields.map { f =>
          coalesce(labels.map(l =>
            when(lower(col(f).cast("string")).contains(l.toLowerCase), lit(l))): _*)
        }
        coalesce(perField :+ lit(unknownLabel): _*)
    }

    val edgeFields = fields.tail.filter(f => nameMatches(f, labels).isDefined)
    val propFields = fields.tail.filterNot(f => nameMatches(f, labels).isDefined)

    val propsCol =
      if (propFields.isEmpty) array().cast("array<string>")
      else array_sort(filter(
        array(propFields.map(f => when(col(f).isNotNull, lit(f))): _*),
        x => x.isNotNull))
    val edgesCol =
      if (edgeFields.isEmpty) array().cast("array<string>")
      else lit(edgeFields.sorted.toArray)

    val idStr = coalesce(col(idField).cast("string"), lit(""))
    df.select(
      idStr.as("id"),
      concat(lit("graft://"), labelCol, lit("/"), sha2(idStr, 256)).as("uri"),
      labelCol.as("label"),
      propsCol.as("properties"),
      edgesCol.as("edges"))
  }

  /** Distinct-pattern census over [[rowPatterns]] output, with the set
    * columns flattened to comma-joined strings (sortable, oracle-friendly).
    * The reference's pattern map keyed by Pattern(label, props, edges). */
  def census(patterns: DataFrame): DataFrame =
    patterns.groupBy(
        col("label"),
        array_join(col("properties"), ",").as("properties"),
        array_join(col("edges"), ",").as("edges"))
      .agg(count(lit(1)).as("n_rows"))
}
