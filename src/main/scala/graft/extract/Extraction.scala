package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-turn triple extraction over the transcript contract table
 * `(conv_id, turn_idx, role, text, tool, ts)`.
 *
 * Analog of the reference's per-row label/property extraction
 * (cs562_sdpg `src2/main/scala/DataToPattern.scala:11-73`) — but where the
 * reference `collect()`s every file to the driver and walks rows in Scala
 * (`DataToPattern.scala:14`, a known defect, SURVEY.md appendix), this is
 * pure Catalyst column expressions (`regexp_extract`, `when`, `lower`):
 * whole-stage-codegen'd, fully distributed, no driver boundary.
 *
 * URI minting uses `sha2(..., 256)` exactly like the reference mints
 * `sdpg.gr/<label>/<sha256(id)>` (`DataToPattern.scala:75-79`) but with the
 * built-in expression instead of driver-side `MessageDigest`.
 */
object Extraction {

  /** Extraction rule: predicate name, anchored regex with two capture
    * groups, the literal infix between the groups (fast path), subject and
    * object entity types. Mirrors the template dictionary the reference
    * keeps for label inference (`DataToPattern.scala:9`, `Main.scala:17`). */
  final case class Rule(pred: String, regex: String, infix: String,
                        subjType: String, objType: String)

  val rules: Seq[Rule] = Seq(
    Rule("works_at",   "^(.{1,128}?) works at (.{1,128}?)\\.$",    " works at ",    "person", "org"),
    Rule("lives_in",   "^(.{1,128}?) lives in (.{1,128}?)\\.$",    " lives in ",    "person", "city"),
    Rule("reports_to", "^(.{1,128}?) reports to (.{1,128}?)\\.$",  " reports to ",  "person", "person"),
    Rule("based_in",   "^(.{1,128}?) is based in (.{1,128}?)\\.$", " is based in ", "org",    "city"))

  /** Normalize a surface form for blocking/equality: lowercase, strip
    * punctuation, collapse whitespace — as ONE native byte-level pass
    * ([[org.apache.spark.sql.graftfns.TextExpressions.NormalizeText]]).
    * java.util.regex does not scale with threads on this host class
    * (measured: replaceAll is SLOWER at 8 threads than at 1), and this runs
    * twice per triple over the whole stream. Parity with the regex
    * formulation below is spec-asserted. */
  def normalize(c: Column): Column =
    org.apache.spark.sql.graftfns.TextExpressions.normalize_text(c)

  /** The regex formulation normalize() must agree with (tests only). */
  def normalizeRegex(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Mint a stable URI for a normalized mention (reference analog:
    * `DataToPattern.scala:75-79`). */
  def mintUri(entityType: Column, normForm: Column): Column =
    concat(lit("graft://"), entityType, lit("/"), sha2(concat_ws("|", entityType, normForm), 256))

  /** The (subject, object, guard) expressions for one rule over the
    * `text` column — the deterministic first-occurrence split (see the
    * CONTRACT comment in [[triplesRaw]]), shared by [[triplesRaw]] and
    * [[Discourse.focusTrack]] so the two can never drift. */
  private[extract] def ruleSplit(r: Rule): (Column, Column, Column) = {
    val subj = substring_index(col("text"), r.infix, 1)
    val objPos = length(subj) + lit(r.infix.length + 1)
    val objLen = length(col("text")) - objPos
    val obj = col("text").substr(objPos, objLen)
    val guard = col("text").contains(r.infix) &&
      col("text").endsWith(".") &&
      !col("text").contains("\n") &&
      length(subj).between(1, 128) &&
      objLen.between(1, 128)
    (subj, obj, guard)
  }

  /**
   * Extract raw triples with provenance in ONE scan of the source: every
   * rule is evaluated as a nullable struct per row, non-matches filtered
   * inside the array, matches exploded. (A per-rule union would scan the
   * 100 TB source once per rule; this shape reads it once and keeps all
   * rule evaluation inside a single whole-stage-codegen projection.)
   *
   * Output: (conv_id, turn_idx, subj_raw, pred, obj_raw, subj_type, obj_type,
   *          subj_norm, obj_norm)
   */
  def triplesRaw(transcripts: DataFrame): DataFrame = {
    val ruleStructs = array(rules.map { r =>
      // The rule guard is the `Rule.regex` SEMANTICS without java.util.regex
      // (whose Matcher does not scale across threads on this host class —
      // see TextExpressions): anchored `^(.{1,128}?) INFIX (.{1,128}?)\.$`
      // == contains the infix, ends with '.', subject = text before the
      // FIRST infix occurrence (the non-greedy group) with 1..128 chars,
      // object = the rest minus the trailing dot with 1..128 chars, and no
      // newline anywhere (both groups are dot-classes; like RE2/DuckDB we
      // treat '$' as end-of-text, not before a trailing newline).
      //
      // CONTRACT — first-split-only: when the infix occurs MORE THAN ONCE
      // and the text after the FIRST occurrence exceeds 128 chars, a
      // backtracking regex engine would retry the match at a later
      // occurrence while this guard rejects the row. That regime is
      // ambiguous garbage, not data (a subject containing the relation
      // phrase verbatim plus a >128-char tail); the engine's contract is
      // the deterministic first-occurrence split, asserted as an explicit
      // edge case in KGPipelineSpec ("multi-infix text beyond the length
      // bound"). Single-occurrence texts — everything the fixtures and
      // oracle can produce — are split identically by both formulations.
      val (subj, obj, guard) = ruleSplit(r)
      when(guard,
        struct(
          subj.as("subj_raw"),
          lit(r.pred).as("pred"),
          obj.as("obj_raw"),
          lit(r.subjType).as("subj_type"),
          lit(r.objType).as("obj_type")))
        .otherwise(lit(null))
    }: _*)
    transcripts
      // materialize the rule matches in their own (whole-stage-codegen'd)
      // projection; the Generate below then explodes a plain column —
      // keeping the match-array work out of GenerateExec's interpreted
      // generator evaluation. The match array is deliberately NOT
      // pre-shrunk with the `filter(arr, isNotNull)` higher-order function:
      // ArrayFilter is a CodegenFallback expression, and one fallback drags
      // the ENTIRE rule-match projection out of whole-stage codegen into
      // interpreted eval (boxed And.eval chains + a Vector.map allocation
      // per row — thread dumps at 12M turns showed every executor thread in
      // CaseWhen.eval under ArrayFilter.eval). explode_outer emits null
      // array entries as null rows, so the isNotNull filter on the
      // generated attribute below does the same pruning at codegen'd
      // null-check cost (~#rules extra Generate rows per turn, nanoseconds
      // each — measured 1.75x faster end-to-end than the interpreted HOF:
      // 21.0 -> 12.0 s warm-trial KG pipeline at 12.48M turns, 32 threads).
      // explode_OUTER + isNotNull, deliberately: a plain explode triggers
      // InferFiltersFromGenerate, whose size(...)>0 filter gets
      // predicate-pushed BELOW the projection and re-evaluates the whole
      // 4-rule match array a second time per input row (measured: +26%
      // pipeline wall). The outer variant is exempt from that rule.
      .select(col("conv_id"), col("turn_idx"), ruleStructs.as("_matches"))
      .select(col("conv_id"), col("turn_idx"), explode_outer(col("_matches")).as("m"))
      .filter(col("m").isNotNull)
      .select(col("conv_id"), col("turn_idx"),
        col("m.subj_raw"), col("m.pred"), col("m.obj_raw"),
        col("m.subj_type"), col("m.obj_type"))
      .filter(col("subj_raw") =!= "" && col("obj_raw") =!= "")
      // coalesce makes the norm columns non-nullable, so downstream
      // equi-joins on them do NOT get an inferred isnotnull(<regex chain>)
      // filter — which would evaluate the normalization regexes a second
      // time per row in a Filter below the Project
      .withColumn("subj_norm", coalesce(normalize(col("subj_raw")), lit("")))
      .withColumn("obj_norm", coalesce(normalize(col("obj_raw")), lit("")))
  }

  /**
   * Distinct entity mentions across both triple slots.
   * `mention_id` is a stable 64-bit key = xxhash64(type, normalized form) —
   * partition-stable and deterministic (SURVEY.md §7 hard-part #2), unlike
   * the reference's JVM `hashCode` featurization (`LSH.scala:29-30`).
   *
   * Output: (mention_id, mention_type, norm, n_occurrences, forms)
   */
  def mentions(triples: DataFrame): DataFrame = {
    // ONE scan: both slots explode from the same row (a two-branch union
    // would evaluate the whole upstream extraction subtree twice).
    // explode_outer for the same reason as triplesRaw: the non-outer form
    // triggers an inferred size(...)>0 filter that predicate-pushdown
    // re-evaluates below the projection.
    val slots = triples.select(explode_outer(array(
        struct(col("subj_norm").as("norm"), col("subj_type").as("mention_type"),
          col("subj_raw").as("raw")),
        struct(col("obj_norm").as("norm"), col("obj_type").as("mention_type"),
          col("obj_raw").as("raw")))).as("s"))
      .filter(col("s").isNotNull)
      .select(col("s.norm").as("norm"), col("s.mention_type").as("mention_type"),
        col("s.raw").as("raw"))
    // two-level agg: count per raw form first (partial-agg friendly), then
    // roll up to the normalized mention with the majority raw form
    slots.groupBy("mention_type", "norm", "raw").agg(count(lit(1)).as("n"))
      .groupBy("mention_type", "norm").agg(
        sum("n").as("n_occurrences"),
        max_by(col("raw"), struct(col("n"), col("raw"))).as("top_raw"),
        collect_set(col("raw")).as("forms"))
      .select(
        xxhash64(col("mention_type"), col("norm")).as("mention_id"),
        col("mention_type"), col("norm"), col("n_occurrences"), col("top_raw"), col("forms"))
  }
}
