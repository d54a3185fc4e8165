package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Conversation-level discourse state over the transcript contract table
 * `(conv_id, turn_idx, role, text, tool, ts)` — the recency substrate that
 * anaphora/coreference resolution in dialogue KG construction starts
 * from: a pronoun or elliptical reference in turn t resolves to the most
 * recently mentioned entity at or before t. Chatter turns (no extraction
 * rule fires) inherit the conversation's running focus, which is exactly
 * the signal a downstream "attach this summary/tool call to the entity
 * under discussion" stage needs. The reference has no discourse stage (it
 * reads a property graph, not conversations; cf. its per-row extraction,
 * `DataToPattern.scala:11-73`); this is a transcript-native addition in
 * the extraction family.
 *
 * 100 TB shape: ONE scan of the source — the per-turn subject is the same
 * single-projection rule evaluation as [[Extraction.triplesRaw]] (shared
 * [[Extraction.ruleSplit]] builder, whole-stage codegen'd) — then ONE
 * window keyed by conversation: one Exchange + one Sort, both on conv_id,
 * the pipeline's natural partitioning (PlanSpec-pinned). Both window
 * aggregates share the same running frame so Catalyst plans a single
 * Window operator. Running state per conversation is O(1) (last mention
 * seen), so a pathological million-turn conversation costs memory O(1)
 * per partition, not O(turns).
 */
object Discourse {

  /**
   * Per turn: the conversation's focus entity — the subject surface form
   * of the most recent rule-matching turn at or before this one. Rule
   * precedence on (garbage) multi-infix texts is [[Extraction.rules]]
   * order, first match wins (`coalesce`), mirroring the oracle's CASE.
   *
   * @return (conv_id, turn_idx, focus_entity, focus_turn, turns_since);
   *         focus columns are null before a conversation's first mention.
   */
  def focusTrack(transcripts: DataFrame): DataFrame = {
    val subj = coalesce(Extraction.rules.map { r =>
      val (s, _, guard) = Extraction.ruleSplit(r)
      when(guard, s)
    }: _*)
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    transcripts
      .select(col("conv_id"), col("turn_idx"), subj.as("_subj"))
      .select(col("conv_id"), col("turn_idx"),
        last(col("_subj"), ignoreNulls = true).over(w).as("focus_entity"),
        max(when(col("_subj").isNotNull, col("turn_idx"))).over(w)
          .as("focus_turn"))
      .withColumn("turns_since", col("turn_idx") - col("focus_turn"))
  }

  /**
   * Entity→tool affinity: for every tool turn, the entity in focus when
   * the tool ran — aggregated to (entity, entity_type, tool, n_calls).
   * This is the KG edge agent transcripts have and document corpora don't:
   * "db_query runs while user 7 is under discussion" is the signal that
   * links tool usage to graph entities (serving-card enrichment, tool
   * routing, per-entity cost attribution). A tool turn whose own text
   * mentions an entity attributes to that entity (frame includes the
   * current row — the mention IS the discussion); tool turns before any
   * mention in their conversation are dropped.
   *
   * 100 TB shape: [[focusTrack]]'s one scan + one conversation window,
   * then a partial-agg count keyed by (entity, tool) — two Exchanges
   * total, both map-side combined.
   */
  def toolAffinity(transcripts: DataFrame): DataFrame = {
    val anchor = coalesce(Extraction.rules.map { r =>
      val (s, _, guard) = Extraction.ruleSplit(r)
      when(guard, struct(s.as("subj"), lit(r.subjType).as("subj_type")))
    }: _*)
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    transcripts
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        anchor.as("_a"))
      .select(col("role"), col("tool"),
        last(col("_a"), ignoreNulls = true).over(w).as("_focus"))
      .filter(col("role") === "tool" && col("tool").isNotNull &&
        col("_focus").isNotNull)
      .groupBy(col("_focus.subj").as("entity"),
        col("_focus.subj_type").as("entity_type"), col("tool"))
      .agg(count(lit(1)).as("n_calls"))
  }

  /** Subject surface forms treated as anaphoric — resolved against the
    * conversation's running focus instead of minted as entities. */
  val pronouns: Seq[String] = Seq("he", "she", "it", "they")

  /** First-match rule evaluation over the `text` column as ONE nullable
    * struct (subj, obj, pred, subj_type, obj_type) — the shared projection
    * behind [[resolveAnaphora]] and the streaming lift
    * ([[graft.streaming.StreamingIngest.resolvedTriplesStream]]), so batch
    * and stream can never disagree on what a turn mentions. */
  private[graft] def matchStruct: org.apache.spark.sql.Column =
    coalesce(Extraction.rules.map { r =>
      val (s, o, guard) = Extraction.ruleSplit(r)
      when(guard, struct(
        s.as("subj"), o.as("obj"),
        lit(r.pred).as("pred"),
        lit(r.subjType).as("subj_type"),
        lit(r.objType).as("obj_type")))
    }: _*)

  /**
   * Anaphora-resolved triple extraction — the coreference step between raw
   * extraction and entity linking in dialogue KG construction: a turn like
   * "He works at org 3." must attach to the entity under discussion, not
   * mint a bogus `person/he` node (which exact-match canonicalization
   * would happily merge ACROSS conversations — every "he" in the corpus
   * becoming one super-entity is the classic KG-poisoning failure).
   *
   * Semantics: rule matching is [[Extraction.triplesRaw]]'s first-match
   * contract (shared [[Extraction.ruleSplit]]); a subject whose lowercase
   * form is in [[pronouns]] resolves to the subject (and subject type) of
   * the most recent NON-pronoun rule match strictly BEFORE the turn — a
   * pronoun never resolves to itself, and pronoun turns do not move the
   * focus (resolving them to the focus would be a no-op move anyway).
   * Pronouns before any antecedent in their conversation are dropped
   * (unresolvable), flagged by `resolved` on the kept rows.
   *
   * 100 TB shape: identical to [[focusTrack]] — ONE source scan (the rule
   * evaluation is a single whole-stage-codegen'd projection), ONE window
   * on the conversation key (one Exchange + one Sort, PlanSpec-pinned),
   * O(1) running state per conversation. The reference has no coreference
   * stage (property-graph input, cf. `DataToPattern.scala:11-73`); this is
   * transcript-native.
   *
   * @return (conv_id, turn_idx, subj, subj_type, pred, obj, obj_type,
   *         resolved); `resolved` is 1 on pronoun rows that found an
   *         antecedent, 0 on direct matches.
   */
  def resolveAnaphora(transcripts: DataFrame): DataFrame = {
    val matched = matchStruct
    val wPrev = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val isPro = col("m").isNotNull &&
      lower(col("m.subj")).isin(pronouns: _*)
    val anchor = when(col("m").isNotNull && !isPro,
      struct(col("m.subj").as("subj"), col("m.subj_type").as("subj_type")))
    transcripts
      .select(col("conv_id"), col("turn_idx"), matched.as("m"))
      .select(col("conv_id"), col("turn_idx"), col("m"), isPro.as("_pro"),
        last(anchor, ignoreNulls = true).over(wPrev).as("_focus"))
      .filter(col("m").isNotNull &&
        (!col("_pro") || col("_focus").isNotNull))
      .select(col("conv_id"), col("turn_idx"),
        when(col("_pro"), col("_focus.subj")).otherwise(col("m.subj"))
          .as("subj"),
        when(col("_pro"), col("_focus.subj_type"))
          .otherwise(col("m.subj_type")).as("subj_type"),
        col("m.pred").as("pred"), col("m.obj").as("obj"),
        col("m.obj_type").as("obj_type"),
        col("_pro").cast("int").as("resolved"))
  }
}
