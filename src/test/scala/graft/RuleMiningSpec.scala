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

  test("implicationRules: hand-computed directional confidences") {
    // p ⇒ q: pairs (a,b) and (c,d) carry both; (e,f) carries only p;
    // (g,h) carries only q. Duplicate assertions collapse (distinct).
    val t = Seq(
      ("a", "p", "b"), ("a", "p", "b"), ("a", "q", "b"),
      ("c", "p", "d"), ("c", "q", "d"),
      ("e", "p", "f"),
      ("g", "q", "h")
    ).toDF("subj", "pred", "obj")
    val got = RuleMining.implicationRules(t, minSupport = 2L)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("p", "q", 2L, 3L, 0.666667),
      ("q", "p", 2L, 3L, 0.666667)))
  }

  test("implicationRules: equals brute force on a seeded random KG") {
    val rnd = new scala.util.Random(35)
    val ents = (0 until 12).map(i => s"e$i")
    val preds = Seq("p0", "p1", "p2")
    val ts = Seq.fill(250)((ents(rnd.nextInt(ents.size)),
      preds(rnd.nextInt(preds.size)), ents(rnd.nextInt(ents.size)))).distinct
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byPair = ts.groupBy(r => (r._1, r._3)).view.mapValues(_.map(_._2).toSet)
    val want = (for {
      bp <- preds; hp <- preds if bp != hp
      sup = byPair.count { case (_, ps) => ps.contains(bp) && ps.contains(hp) }
      if sup >= 1
    } yield (bp, hp, sup.toLong, ts.count(_._2 == bp).toLong,
      r6(sup.toDouble / ts.count(_._2 == bp)))).toSet
    val got = RuleMining.implicationRules(ts.toDF("subj", "pred", "obj"))
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == want)
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

  test("implicationRulesWithCoMemberBody: equals the materialized-union " +
       "form on a seeded random KG with a hub group") {
    val rnd = new scala.util.Random(906)
    val ents = (0 until 20).map(i => s"e$i")
    val preds = Seq("p0", "p1", "p2")
    val ts = Seq.fill(220)((ents(rnd.nextInt(ents.size)),
      preds(rnd.nextInt(preds.size)), ents(rnd.nextInt(ents.size)))).distinct
    // membership with a deliberate hub group g0 (12 members) plus small
    // groups and multi-group members (pairs sharing >1 group must still
    // count once), and duplicate membership rows (must collapse)
    val mem = ((0 until 12).map(i => (s"e$i", "g0")) ++
      Seq(("e3", "g1"), ("e4", "g1"), ("e5", "g1"),
        ("e13", "g2"), ("e14", "g2"), ("e3", "g2"), ("e3", "g1"))).toSeq
    val tDf = ts.toDF("subj", "pred", "obj")
    val mDf = mem.toDF("entity", "grp")
    // materialized reference: body facts from the quadratic join, then
    // the ordinary miner over the union
    val body = (for {
      (a, g1) <- mem; (b, g2) <- mem if g1 == g2 && a != b
    } yield (a, "colleague", b)).distinct
    val want = RuleMining.implicationRules(
      tDf.unionByName(body.toDF("subj", "pred", "obj")), minSupport = 2L)
      .as[(String, String, Long, Long, Double)].collect().toSet
    val got = RuleMining.implicationRulesWithCoMemberBody(
      tDf, mDf, "colleague", minSupport = 2L)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(want.exists(_._1 == "colleague") || want.exists(_._2 == "colleague"),
      "fixture must actually exercise body-involving rules")
  }

  test("compositionRules: hand-computed works_at∧based_in⇒lives_in") {
    val t = Seq(
      ("alice", "works_at", "acme"), ("acme", "based_in", "paris"),
      ("alice", "lives_in", "paris"),                    // head present
      ("bob", "works_at", "acme"),                       // path, head absent
      ("carol", "works_at", "globex"), ("globex", "based_in", "oslo"),
      ("carol", "lives_in", "oslo")                      // head present
    ).toDF("subj", "pred", "obj")
    val got = RuleMining.compositionRules(t)
      .as[(String, String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    // paths for (works_at, based_in): (alice,paris),(bob,paris),(carol,oslo)
    assert(got(("works_at", "based_in", "lives_in")) == ((2L, 3L, 0.666667)))
  }

  test("compositionRules: distinct endpoint counting (several middles = one path)") {
    val t = Seq(
      ("x", "p", "m1"), ("x", "p", "m2"),
      ("m1", "q", "y"), ("m2", "q", "y"),  // two middles, one (x,y) pair
      ("x", "r", "y")
    ).toDF("subj", "pred", "obj")
    val got = RuleMining.compositionRules(t)
      .as[(String, String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    assert(got(("p", "q", "r")) == ((1L, 1L, 1.0)))
  }

  test("compositionRules: equals brute force on a seeded random KG; invariant") {
    val rnd = new scala.util.Random(563)
    val ents = (0 until 20).map(i => s"e$i")
    val preds = Seq("p0", "p1", "p2")
    val ts = Seq.fill(200)((ents(rnd.nextInt(ents.size)),
      preds(rnd.nextInt(preds.size)), ents(rnd.nextInt(ents.size)))).distinct
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tset = ts.toSet
    val pathPairs = (for {
      (x, p, z) <- ts; (z2, q, y) <- ts if z2 == z
    } yield (p, q, x, y)).distinct
    val nPaths = pathPairs.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size.toLong }
    val want = pathPairs.flatMap { case (p, q, x, y) =>
      preds.collect { case r if tset.contains((x, r, y)) => (p, q, r) }
    }.groupBy(identity).map { case ((p, q, r), hits) =>
      (p, q, r, hits.size.toLong, nPaths((p, q)),
        r6(hits.size.toDouble / nPaths((p, q))))
    }.filter(_._4 >= 2L).toSet
    val df = ts.toDF("subj", "pred", "obj")
    val got = RuleMining.compositionRules(df, minSupport = 2L)
      .as[(String, String, String, Long, Long, Double)].collect().toSet
    assert(got == want)
    val got2 = RuleMining.compositionRules(df.repartition(7), minSupport = 2L)
      .as[(String, String, String, Long, Long, Double)].collect().toSet
    assert(got2 == want)
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
