package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * RDF N-Triples export of the constructed KG — the vendor-neutral
 * counterpart of [[Neo4jBulkExport]]: one `<subj> <pred> <obj> .` line
 * per triple, loadable by any triple store (Jena/Virtuoso/Blazegraph
 * riot/bulk loaders). The reference's pipeline ends inside its own
 * store; this sink (like the Neo4j one) is the migration path OUT.
 *
 * Serialization is spec-correct N-Triples (W3C N-Triples 1.1):
 *  - subjects/predicates/entity objects are IRIs minted as
 *    `<baseIri{e|p}/{percent-encoded local name}>` — encoding via the
 *    codegen'd `url_encode` with `+` → `%20` (form-encoding's one
 *    deviation from RFC 3986 percent-encoding), so spaces, quotes,
 *    angle brackets and non-ASCII can never break the line grammar;
 *  - literal objects (optional flag column) are quoted with the
 *    spec's escapes: `\` `"` LF CR TAB → `\\` `\"` `\n` `\r` `\t`.
 *
 * Scale shape: a pure zero-shuffle projection over the triple table
 * written DISTRIBUTED via `write.text` (one part per partition, no
 * coalesce(1) bottleneck) — the same posture as the Neo4j CSV parts.
 * [[read]] is the round-trip inverse (for tests and re-import), a
 * line-regex parse + decode, also a pure projection.
 */
object RdfExport {

  private def iri(base: String, kind: String, c: Column): Column =
    concat(lit("<" + base + kind + "/"),
      replace(url_encode(c), lit("+"), lit("%20")), lit(">"))

  private def literal(c: Column): Column = {
    val esc = replace(replace(replace(replace(replace(c,
      lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\"")),
      lit("\n"), lit("\\n")),
      lit("\r"), lit("\\r")),
      lit("\t"), lit("\\t"))
    concat(lit("\""), esc, lit("\""))
  }

  /**
   * Write `triples` (columns `subj`, `pred`, `obj`, all strings, nulls
   * dropped — RDF has no null term) as N-Triples parts under `dir`.
   *
   * @param literalObjFlag optional boolean column name: where true, the
   *                       object serializes as a quoted literal instead
   *                       of an entity IRI (property values vs links).
   */
  def write(triples: DataFrame, dir: String, baseIri: String = "urn:graft:",
            literalObjFlag: Option[String] = None): Unit = {
    require(baseIri.nonEmpty && !baseIri.exists(ch => ch <= ' ' || "<>\"{}|^`\\".contains(ch)),
      s"baseIri '$baseIri' contains characters illegal inside an IRI ref")
    val objTerm = literalObjFlag match {
      case Some(f) => when(col(f), literal(col("obj")))
        .otherwise(iri(baseIri, "e", col("obj")))
      case None => iri(baseIri, "e", col("obj"))
    }
    triples
      .filter(col("subj").isNotNull && col("pred").isNotNull && col("obj").isNotNull)
      .select(concat_ws(" ",
        iri(baseIri, "e", col("subj")),
        iri(baseIri, "p", col("pred")),
        objTerm, lit(".")).as("value"))
      .write.mode("overwrite").text(dir)
  }

  private val Line =
    """^<(\S+)> <(\S+)> (?:<(\S+)>|"(.*)") \.$""".r

  /** Round-trip reader: parse N-Triples parts written by [[write]] back
    * to (subj, pred, obj, obj_is_literal). Inverse of the encoding above;
    * local names are percent-decoded, literal escapes un-escaped. */
  def read(spark: SparkSession, dir: String, baseIri: String = "urn:graft:"): DataFrame = {
    val local = (c: Column) => url_decode(regexp_extract(c, "^.*?[ep]/(.*)$", 1))
    // sequential replace cannot unescape directly (the `\n` inside an
    // escaped-backslash `\\n` would mis-fire): park `\\` in a sentinel
    // first, undo the single-char escapes, then restore the backslash.
    // NUL as sentinel: cannot appear on disk (write escapes nothing to NUL
    // and text lines are the source).
    val unesc = (c: Column) =>
      replace(replace(replace(replace(replace(replace(c,
        lit("\\\\"), lit("\u0000")),
        lit("\\t"), lit("\t")),
        lit("\\r"), lit("\r")),
        lit("\\n"), lit("\n")),
        lit("\\\""), lit("\"")),
        lit("\u0000"), lit("\\"))
    spark.read.text(dir).select(
      local(regexp_extract(col("value"), Line.regex, 1)).as("subj"),
      local(regexp_extract(col("value"), Line.regex, 2)).as("pred"),
      // a raw `> "` only occurs before a literal opener: body quotes are
      // always escaped and IRIs percent-encode both characters
      col("value").rlike("> \"").as("_lit"),
      regexp_extract(col("value"), Line.regex, 3).as("_oi"),
      regexp_extract(col("value"), Line.regex, 4).as("_ol"))
      .select(col("subj"), col("pred"),
        when(col("_lit"), unesc(col("_ol"))).otherwise(local(col("_oi"))).as("obj"),
        col("_lit").as("obj_is_literal"))
  }
}
