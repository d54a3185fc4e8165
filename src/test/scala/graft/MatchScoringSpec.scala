package graft

import graft.link.MatchScoring

class MatchScoringSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(("a1", 0.9, 0.1), ("a2", 0.8, 0.2))
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("score: hand-computed log-likelihood sums") {
    val pairs = Seq(
      (1L, 2L, true, true),
      (1L, 3L, true, false),
      (2L, 3L, false, false)).toDF("id_a", "id_b", "a1", "a2")
    val got = MatchScoring.score(pairs, fields)
      .select("id_a", "id_b", "score").as[(Long, Long, Double)]
      .collect().toMap2
    val wAgree1 = math.log(0.9 / 0.1); val wDis1 = math.log(0.1 / 0.9)
    val wAgree2 = math.log(0.8 / 0.2); val wDis2 = math.log(0.2 / 0.8)
    assert(got((1L, 2L)) == r6(wAgree1 + wAgree2))
    assert(got((1L, 3L)) == r6(wAgree1 + wDis2))
    assert(got((2L, 3L)) == r6(wDis1 + wDis2))
    // agreement raises, disagreement lowers
    assert(got((1L, 2L)) > got((1L, 3L)) && got((1L, 3L)) > got((2L, 3L)))
  }

  test("parameter validation") {
    val df = Seq((1L, true)).toDF("id", "a1")
    intercept[IllegalArgumentException] {
      MatchScoring.score(df, Seq(("a1", 0.2, 0.5))) // u > m
    }
    intercept[IllegalArgumentException] {
      MatchScoring.score(df, Seq.empty)
    }
  }

  implicit class MapOps(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map(r => ((r._1, r._2), r._3)).toMap
  }
}
