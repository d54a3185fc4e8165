package graft

import graft.textops.Keyphrases

class KeyphrasesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark engine"),
    (2L, "spark shuffle"),
    (3L, "engine tuning tuning tuning")).toDF("doc_id", "text")

  test("hand-computed tf-idf: scores, ranks, ties on term") {
    val got = Keyphrases.tfidfTopK(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    def s(tf: Long, df: Long): Double =
      BigDecimal(tf.toDouble * math.log(3.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: spark tf=2 df=2, engine tf=1 df=2
    assert(got((1L, 1L)) == (("spark", 2L, 2L, s(2, 2))))
    assert(got((1L, 2L)) == (("engine", 1L, 2L, s(1, 2))))
    // doc 2: shuffle (df=1) outscores spark (df=2)
    assert(got((2L, 1L)) == (("shuffle", 1L, 1L, s(1, 1))))
    assert(got((2L, 2L)) == (("spark", 1L, 2L, s(1, 2))))
    // doc 3: tuning tf=3 df=1 dominates engine
    assert(got((3L, 1L)) == (("tuning", 3L, 1L, s(3, 1))))
    assert(got((3L, 2L)) == (("engine", 1L, 2L, s(1, 2))))
    assert(got.size == 6, "k caps per-doc output; docs have 2 distinct terms")
  }

  test("score ties break on the term, ascending") {
    val d = Seq((1L, "bb aa"), (2L, "aa bb")).toDF("doc_id", "text")
    // every term: tf=1, df=2 -> score = ln(1) = 0 for all; rank by term
    val got = Keyphrases.tfidfTopK(d, "doc_id", "text", k = 2)
      .as[(Long, Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((1L, 1L) -> "aa", (1L, 2L) -> "bb",
      (2L, 1L) -> "aa", (2L, 2L) -> "bb"))
  }

  test("persisted-tf scale path equals the one-shot path") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("kp_tf").toString
    val tf = docs.select(col("doc_id"),
        explode(split(lower(col("text")), " +")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    tf.write.mode("overwrite").parquet(dir)
    val n = docs.agg(countDistinct(col("doc_id")))
    val fromTf = Keyphrases.tfidfTopKFromTf(spark.read.parquet(dir), n, k = 3)
      .as[(Long, Long, String, Long, Long, Double)].collect().toSet
    val oneShot = Keyphrases.tfidfTopK(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, String, Long, Long, Double)].collect().toSet
    assert(fromTf == oneShot && fromTf.nonEmpty)
  }

  test("k bounds output; normalization lowercases; repartition-invariant") {
    val d = Seq((1L, "Alpha beta gamma delta ALPHA")).toDF("doc_id", "text")
    val one = Keyphrases.tfidfTopK(d, "doc_id", "text", k = 1)
      .as[(Long, Long, String, Long, Long, Double)].collect()
    assert(one.length == 1 && one.head._3 == "alpha" && one.head._4 == 2L)
    val big = (1L to 200L).map(i => (i, s"w${i % 7} w${i % 7} w${i % 11} filler"))
      .toDF("doc_id", "text")
    val a = Keyphrases.tfidfTopK(big, "doc_id", "text", k = 2)
      .as[(Long, Long, String, Long, Long, Double)].collect().toSet
    val b = Keyphrases.tfidfTopK(big.repartition(13), "doc_id", "text", k = 2)
      .as[(Long, Long, String, Long, Long, Double)].collect().toSet
    assert(a == b)
  }
}
