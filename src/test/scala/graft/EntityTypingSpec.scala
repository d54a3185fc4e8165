package graft

import graft.graph.EntityTyping

class EntityTypingSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)])
      : Map[String, (String, Long, Long, Double)] =
    EntityTyping.plurality(rows.toDF("entity", "etype"), "entity", "etype")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("plurality wins; purity reports the disagreement") {
    val rows = Seq("amazon" -> "org", "amazon" -> "org", "amazon" -> "river",
      "u1" -> "person")
    val got = run(rows)
    assert(got("amazon") == (("org", 2L, 3L, 0.666667)))
    assert(got("u1") == (("person", 1L, 1L, 1.0)))
  }

  test("vote ties break on the smaller type name, deterministically") {
    val rows = Seq("x" -> "org", "x" -> "city", "x" -> "org", "x" -> "city")
    assert(run(rows)("x") == (("city", 2L, 4L, 0.5)))
  }

  test("null entities and types are dropped; repartition-invariant") {
    val rows = Seq(("a", "person"), ("a", "person"), (null, "org"), ("b", null))
    val got = run(rows.asInstanceOf[Seq[(String, String)]])
    assert(got == Map("a" -> (("person", 2L, 2L, 1.0))))
    val rnd = new scala.util.Random(61)
    val big = (1 to 500).map(i => (s"e${i % 40}", Seq("person", "org", "city")(rnd.nextInt(3))))
    val a = run(big)
    val b = EntityTyping.plurality(big.toDF("entity", "etype").repartition(13),
      "entity", "etype")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(a == b)
    // brute-force reference on the random corpus
    val ref = big.groupBy(_._1).map { case (e, ms) =>
      val counts = ms.groupBy(_._2).map { case (t, xs) => (t, xs.size.toLong) }
      val (t, v) = counts.toSeq.minBy { case (ty, n) => (-n, ty) }
      val n = counts.values.sum
      e -> ((t, v, n,
        BigDecimal(v.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(a == ref)
  }
}
