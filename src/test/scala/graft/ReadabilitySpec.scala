package graft

import graft.textops.Readability

/** Flesch readability: hand-computed fixtures for the deterministic
  * vowel-run syllable surrogate. */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): (Int, Int, Int, Option[Double]) = {
    val r = Readability.flesch(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    (r.getInt(1), r.getInt(2), r.getInt(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("hand-computed: one plain sentence") {
    // "the cat sat." -> words 3, sentences 1,
    // vowel runs: e/a/a -> 3, no vowel-less words -> syllables 3
    val (w, s, sy, f) = run("the cat sat.")
    assert((w, s, sy) == ((3, 1, 3)))
    // 206.835 - 1.015*(3/1) - 84.6*(3/3) = 119.19
    assert(f.contains(119.19))
  }

  test("vowel-less words count one syllable each; ! and ? end sentences") {
    // words: "dr" (no vowel -> +1), "strq" (no vowel -> +1), "ok!" "why?"
    // vowel runs: o (ok), y (why -> y is a vowel here) -> 2 runs
    val (w, s, sy, _) = run("dr strq ok! why?")
    assert(w == 4)
    assert(s == 2)
    assert(sy == 2 + 2)
  }

  test("sentence floor: no terminal punctuation still counts 1 sentence") {
    val (_, s, _, _) = run("no punctuation here")
    assert(s == 1)
  }

  test("empty text yields null flesch") {
    val (w, _, _, f) = run("")
    assert(w == 0 && f.isEmpty)
  }

  test("monotonicity: long polysyllabic prose scores below short prose") {
    val easy = run("the dog ran. the cat sat. we go now.")._4.get
    val hard = run("extraordinarily sophisticated organizational " +
      "methodologies necessitate comprehensive internationalization.")._4.get
    assert(easy > hard, s"$easy vs $hard")
  }
}
