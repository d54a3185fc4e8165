package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PII detection + redaction over a document corpus: replace matches of a
 * configurable pattern set (emails, phone numbers, SSN-shaped ids by
 * default) with stable placeholder tokens, and report per-pattern match
 * counts for the audit log a redaction pipeline keeps.
 *
 * 100 TB shape: a single zero-shuffle projection — every pattern is a
 * codegen'd built-in regexp expression ([[org.apache.spark.sql.functions.regexp_count]]
 * / [[org.apache.spark.sql.functions.regexp_replace]], both with doGenCode),
 * so the pass rides whatever partitioning the scan already has; no exchange,
 * no UDF, no driver state. Counts are computed against the ORIGINAL text per
 * pattern; replacements are applied in pattern order (placeholders contain
 * no digits or '@', so earlier replacements cannot manufacture later
 * matches).
 *
 * No reference analog (cs562_sdpg has no redaction pass); part of the
 * training-data operator family layered on the engine.
 */
object Pii {

  /** One redaction rule: regex must be valid in BOTH java.util.regex and
    * RE2 dialects (the oracle runs the same pattern in DuckDB). */
  final case class Rule(name: String, regex: String, replacement: String)

  /** Default rules: email, SSN-shaped id (3-2-4, matched before phone so the
    * stricter shape wins), NANP phone (3-3-4 with - or . separators). */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    Rule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[ID]"),
    Rule("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "[PHONE]"))

  /**
   * @return input row set with `textCol` replaced by `clean_text` plus one
   *         `n_<rule>` count column per rule; all other columns pass through
   */
  def redact(docs: DataFrame, idCol: String, textCol: String,
             rules: Seq[Rule] = defaultRules): DataFrame = {
    val counts = rules.map(r => regexp_count(col(textCol), lit(r.regex)).as(s"n_${r.name}"))
    val cleaned = rules.foldLeft(col(textCol)) { (c, r) =>
      regexp_replace(c, r.regex, r.replacement)
    }
    val passthrough = docs.columns.filterNot(_ == textCol).map(col).toSeq
    docs.select(passthrough ++ (cleaned.as("clean_text") +: counts): _*)
  }
}
