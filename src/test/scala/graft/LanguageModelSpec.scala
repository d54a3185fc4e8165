package graft

import graft.textops.LanguageModel

/** Hashed-bigram LM training + perplexity scoring. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the hat"),
    (3L, "the cat sat on the mat again and again"),
    (4L, "zq xv qqj zzt vvw"), // gibberish: every bigram unseen elsewhere
    (5L, "one"),               // 1 token -> no bigrams
    (6L, "")                   // empty -> no tokens at all
  ).toDF("doc_id", "text")

  test("weight tables are bounded by the bucket space, in micro-log-units") {
    val (num, den) = LanguageModel.train(docs, "text", hexChars = 1)
    assert(num.size <= 16 && den.size <= 16, (num.size, den.size))
    // ln of a small count, scaled 1e6: well inside +-100e6
    for (v <- num.values ++ den.values)
      assert(math.abs(v) < 100000000L, v)
  }

  test("in-distribution text scores lower perplexity than gibberish") {
    val rep = LanguageModel.perplexityReport(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2)),
          Option(r.get(3)).map(_ => r.getDouble(3))))).toMap
    assert(rep(1L)._1 == 5L && rep(4L)._1 == 4L)
    val pplCommon = rep(1L)._3.get
    val pplGibberish = rep(4L)._3.get
    assert(pplCommon < pplGibberish,
      s"common $pplCommon !< gibberish $pplGibberish")
    // short/empty docs: zero bigrams, null scores
    assert(rep(5L) == ((0L, None, None)))
    assert(rep(6L) == ((0L, None, None)))
  }

  test("hand-checked single-bigram doc: avg_logp = num(b2) - den(b1)") {
    // corpus = one doc "x y": bigram count 1, unigram counts x=1, y=1
    val one = Seq((1L, "x y")).toDF("doc_id", "text")
    val (num, den) = LanguageModel.train(one, "text", hexChars = 2, alpha = 0.1)
    val row = LanguageModel.scoreDocs(one, "doc_id", "text", num, den).head()
    assert(row.getLong(1) == 1L)
    // bucket of "x" vs bucket of "y" may differ; recompute exactly:
    val xBucket = java.security.MessageDigest.getInstance("MD5")
      .digest("x".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(2)
    val lpMicro = num.values.head - den(xBucket) // exact long micro-units
    assert(math.abs(row.getDouble(2) - lpMicro / 1e6) <= 1e-9,
      (row.getDouble(2), lpMicro))
    assert(math.abs(row.getDouble(3) - math.exp(-row.getDouble(2))) < 1e-5)
  }

  test("scoring is repartition-invariant") {
    val (num, den) = LanguageModel.train(docs, "text")
    val a = LanguageModel.scoreDocs(docs, "doc_id", "text", num, den)
      .collect().map(_.toSeq).toSet
    val b = LanguageModel.scoreDocs(docs.repartition(9), "doc_id", "text", num, den)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
