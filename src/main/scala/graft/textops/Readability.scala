package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Readability scoring — Flesch reading ease per document, the standard
 * curriculum/difficulty signal a training-data pipeline uses beside the
 * [[TextAnalysis.qualityScore]] heuristics (difficulty-bucketing corpora,
 * filtering degenerate low-readability spans, stratifying eval sets).
 *
 * Deterministic, engine-portable surrogate definitions (the classic
 * formula needs a syllable dictionary; a 100 TB pipeline needs a pure
 * function of the bytes — both engines replay these exactly):
 *  - words: whitespace-split tokens of the trimmed text (non-empty);
 *  - sentences: count of `.` `!` `?` characters, floored at 1;
 *  - syllables: maximal `[aeiouy]+` runs in the lowercased text, plus 1
 *    per vowel-less word (the "min one syllable per word" convention —
 *    covers "Dr", "7th", acronyms).
 *
 *   flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
 *
 * 100 TB shape: a pure per-row projection — zero shuffle, zero joins,
 * whole-stage-codegen'd end to end; composes under any upstream
 * partitioning (plan-pinned exchange-free in PlanSpec).
 *
 * @return (idCol, n_words, n_sentences, n_syllables, flesch) — flesch
 *         rounded to 4 dp, NULL for word-less documents.
 */
object Readability {

  def flesch(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // no higher-order functions anywhere: HOFs are CodegenFallback, and a
    // per-row corpus scan is exactly where whole-stage codegen pays — every
    // count below is split/regexp/length arithmetic (all codegen'd),
    // plan-pinned by the PlanSpec `*Project` assert
    val trimmed = trim(lower(col(textCol)))
    // trimmed text split on space-runs yields no empty tokens, so the
    // token count needs no filter — only the all-whitespace guard
    val nWords = when(length(trimmed) === 0, 0)
      .otherwise(size(split(trimmed, " +")))
    val nSent = greatest(lit(1),
      length(col(textCol)) - length(regexp_replace(col(textCol), "[.!?]", "")))
    // vowel runs: collapse each [aeiouy]+ to one marker, count markers
    val runs = regexp_replace(lower(col(textCol)), "[aeiouy]+", "V")
    val nRuns = length(runs) - length(regexp_replace(runs, "V", ""))
    // vowel-less words: mark each space-delimited run with no vowel via
    // lookarounds (they don't consume the shared delimiter, so adjacent
    // vowel-less words all match), then count markers. The lowered text
    // cannot contain the uppercase marker. Java-regex-only is fine — the
    // ORACLE replays this as a per-token list filter, same semantics.
    val padded = concat(lit(" "), trimmed, lit(" "))
    val marked = regexp_replace(padded, "(?<= )[^aeiouy ]+(?= )", "W")
    val nNoVowel = length(marked) - length(regexp_replace(marked, "W", ""))
    val nSyll = nRuns + nNoVowel
    docs.select(col(idCol),
      nWords.as("n_words"),
      nSent.cast("int").as("n_sentences"),
      nSyll.cast("int").as("n_syllables"),
      when(nWords > 0,
        round(lit(206.835)
          - lit(1.015) * (nWords.cast("double") / nSent.cast("double"))
          - lit(84.6) * (nSyll.cast("double") / nWords.cast("double")), 4))
        .as("flesch"))
  }
}
