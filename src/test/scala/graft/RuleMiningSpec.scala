package graft

import graft.graph.RuleMining

/** AMIE-lite rule mining vs hand-computed functionality/inverse tables. */
class RuleMiningSpec extends SparkSpec {
  import spark.implicits._

  test("functionality: hand-computed ratios and conflict counts") {
    val t = Seq(
      // works_at: alice has TWO employers (conflict), bob one; acme shared
      ("alice", "works_at", "acme"),
      ("alice", "works_at", "globex"),
      ("bob", "works_at", "acme"),
      ("bob", "works_at", "acme"), // duplicate row, must collapse
      // lives_in: perfectly functional both ways
      ("alice", "lives_in", "paris"),
      ("bob", "lives_in", "oslo")
    ).toDF("subj", "pred", "obj")
    val got = RuleMining.functionality(t)
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // works_at: 3 distinct triples, 2 subjects (1 conflicted), 2 objects
    assert(got("works_at") ==
      (("works_at", 3L, 2L, 2L, 1L, 0.666667, 0.666667)))
    // lives_in: 2 triples, 2 subjects, 2 objects, no conflicts
    assert(got("lives_in") == (("lives_in", 2L, 2L, 2L, 0L, 1.0, 1.0)))
  }

  test("inversePairs: mirrored pair found with support + confidence; " +
       "symmetric predicate reports itself") {
    val t = Seq(
      ("a", "parent_of", "b"),
      ("b", "child_of", "a"),
      ("c", "parent_of", "d"),
      ("d", "child_of", "c"),
      ("e", "parent_of", "f"), // unmirrored: lowers confidence
      ("x", "married_to", "y"), // symmetric predicate
      ("y", "married_to", "x")
    ).toDF("subj", "pred", "obj")
    val got = RuleMining.inversePairs(t, minSupport = 2L)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("parent_of", "child_of", 2L, 3L, 0.666667),
      ("child_of", "parent_of", 2L, 2L, 1.0),
      ("married_to", "married_to", 2L, 2L, 1.0)))
  }

  test("property: both miners equal brute force on a seeded random KG") {
    val rnd = new scala.util.Random(562)
    val ents = (0 until 25).map(i => s"e$i")
    val preds = Seq("p0", "p1", "p2", "p3")
    val ts = Seq.fill(300)((ents(rnd.nextInt(ents.size)),
      preds(rnd.nextInt(preds.size)), ents(rnd.nextInt(ents.size)))).distinct
    val df = ts.toDF("subj", "pred", "obj")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val wantFun = ts.groupBy(_._2).map { case (p, rows) =>
      val nTriples = rows.size.toLong
      val bySubj = rows.groupBy(_._1)
      (p, nTriples, bySubj.size.toLong,
        rows.map(_._3).distinct.size.toLong,
        bySubj.count(_._2.size > 1).toLong,
        r6(bySubj.size.toDouble / nTriples),
        r6(rows.map(_._3).distinct.size.toDouble / nTriples))
    }.toSet
    val gotFun = RuleMining.functionality(df)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(gotFun == wantFun)

    val wantInv = (for {
      (a, p, b) <- ts; (x, q, y) <- ts if x == b && y == a
    } yield (p, q)).groupBy(identity).map { case ((p, q), hits) =>
      (p, q, hits.size.toLong, ts.count(_._2 == p).toLong,
        r6(hits.size.toDouble / ts.count(_._2 == p)))
    }.filter(_._3 >= 2).toSet
    val gotInv = RuleMining.inversePairs(df, minSupport = 2L)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(gotInv == wantInv)
  }

  test("minSupport filters; repartition invariance") {
    val t = Seq(
      ("a", "p", "b"), ("b", "q", "a"),
      ("c", "p", "d"), ("d", "q", "c")
    ).toDF("subj", "pred", "obj")
    assert(RuleMining.inversePairs(t, minSupport = 3L).count() == 0L)
    val a = RuleMining.inversePairs(t.repartition(5), minSupport = 1L)
      .as[(String, String, Long, Long, Double)].collect().toSet
    val b = RuleMining.inversePairs(t, minSupport = 1L)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
