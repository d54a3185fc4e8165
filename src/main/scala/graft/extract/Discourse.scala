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
}
