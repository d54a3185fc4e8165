package graft

import graft.textops.Bm25

/** BM25 search vs a driver-side reference implementation. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark runs fast spark scales"),
    (2L, "ducks swim fast in ponds"),
    (3L, "spark spark spark spark spark spark"),
    (4L, "unrelated words entirely here"),
    (5L, "fast fast spark")
  ).toDF("doc_id", "text")

  private def brute(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, Double] = {
    val corpus = Map(
      1L -> "spark runs fast spark scales",
      2L -> "ducks swim fast in ponds",
      3L -> "spark spark spark spark spark spark",
      4L -> "unrelated words entirely here",
      5L -> "fast fast spark").view.mapValues(_.split(" +").toSeq).toMap
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    def idf(t: String): Double = {
      val df = corpus.values.count(_.contains(t)).toDouble
      math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }
    corpus.map { case (id, ws) =>
      val dl = ws.size.toDouble
      val s = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        idf(t) * tf * (k1 + 1) / (tf + k1 * ((1 - b) + b * dl / avgdl))
      }.sum
      id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.filter(_._2 > 0)
  }

  test("scores match the reference formula; non-matching docs absent") {
    val got = Bm25.search(docs, "doc_id", "text", Seq("spark", "fast"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = brute(Seq("spark", "fast"))
    assert(got.keySet == exp.keySet && !got.contains(4L))
    for ((id, s) <- exp)
      assert(math.abs(got(id) - s) <= 1e-6, s"$id: ${got(id)} vs $s")
  }

  test("term saturation: 6x repetition does not score 6x (k1 bounds tf)") {
    val got = Bm25.search(docs, "doc_id", "text", Seq("spark"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) > got(1L), "more occurrences still rank higher")
    assert(got(3L) < got(1L) * 3, s"tf must saturate: ${got(3L)} vs ${got(1L)}")
  }

  test("k truncates after ordering; n_terms_matched counts distinct terms") {
    val rows = Bm25.search(docs, "doc_id", "text", Seq("spark", "fast"), k = 2)
      .collect()
    assert(rows.length == 2)
    val m = Bm25.search(docs, "doc_id", "text", Seq("spark", "fast"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(1L) == 2L && m(3L) == 1L && m(5L) == 2L)
  }

  test("scoring plans as projection + TakeOrdered, no Exchange") {
    // parquet source: a local relation would constant-fold the projection
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Bm25.search(corpus, "doc_id", "text", Seq("spark"), k = 3)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!"(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).hasNext,
      s"scoring must not shuffle:\n${p.take(1200)}")
  }

  test("repartition-invariant") {
    val a = Bm25.search(docs, "doc_id", "text", Seq("spark", "fast"), 10)
      .collect().map(_.toSeq).toSet
    val b = Bm25.search(docs.repartition(7), "doc_id", "text", Seq("spark", "fast"), 10)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
