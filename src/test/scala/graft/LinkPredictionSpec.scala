package graft

import graft.graph.LinkPrediction

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], k: Int = 1000,
      maxDegree: Long = 0L): Seq[(String, String, Long, Double, Double)] =
    LinkPrediction.topCandidates(edges.toDF("src", "dst"), k, maxDegree)
      .as[(String, String, Long, Double, Double)].collect().toSeq

  // single-threaded reference: brute-force over the undirected simple
  // graph with the same micro-unit arithmetic
  private def ref(edges: Seq[(String, String)],
      maxDegree: Long = 0L): Seq[(String, String, Long, Double, Double)] = {
    val und = edges.filter { case (x, y) => x != y }
      .map { case (x, y) => if (x < y) (x, y) else (y, x) }.toSet
    val nodes = und.toSeq.flatMap { case (x, y) => Seq(x, y) }.distinct
    val adj = nodes.map { n =>
      n -> und.collect { case (x, y) if x == n => y; case (x, y) if y == n => x }
    }.toMap
    val deg = adj.map { case (n, s) => n -> s.size.toLong }
    val cands = for {
      i <- nodes.indices; j <- nodes.indices
      a = nodes(i); b = nodes(j)
      if a < b && !und.contains((a, b))
      zs = (adj(a) intersect adj(b)).filter(z => maxDegree <= 0L || deg(z) <= maxDegree)
      if zs.nonEmpty
    } yield {
      val aaU = zs.toSeq.map(z => math.round(1e6 / math.log(deg(z).toDouble))).sum
      val raU = zs.toSeq.map(z => math.round(1e6 / deg(z))).sum
      (a, b, zs.size.toLong, aaU, raU)
    }
    cands.sortBy { case (a, b, _, aaU, _) => (-aaU, a, b) }
      .map { case (a, b, cn, aaU, raU) =>
        (a, b, cn,
          BigDecimal(aaU / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(raU / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
  }

  test("hand-computed: colleagues via a shared org, existing edges excluded") {
    // alice and bob both work at acme; alice-carol already an edge
    val edges = Seq(("alice", "acme"), ("bob", "acme"), ("alice", "carol"))
    val got = run(edges)
    // candidate pairs sharing a neighbor: (alice,bob) via acme,
    // (acme,carol) via alice, (bob,carol) none, (alice,carol) is an edge
    assert(got.map(r => (r._1, r._2)).toSet == Set(("alice", "bob"), ("acme", "carol")))
    val ab = got.find(r => (r._1, r._2) == (("alice", "bob"))).get
    assert(ab._3 == 1L)
    // deg(acme)=2 -> aa = round(1e6/ln 2)/1e6, ra = 0.5
    assert(ab._4 == math.round(1e6 / math.log(2.0)) / 1e6)
    assert(ab._5 == 0.5)
    // (acme,carol) witness alice has deg 2 (acme + carol)
    val ac = got.find(r => (r._1, r._2) == (("acme", "carol"))).get
    assert(ac._4 == math.round(1e6 / math.log(2.0)) / 1e6)
    assert(got == ref(edges))
  }

  test("matches brute-force reference on a seeded random graph") {
    val rnd = new scala.util.Random(19)
    val edges = for {
      i <- 0 until 50; j <- (i + 1) until 50 if rnd.nextDouble() < 0.09
    } yield (f"n$i%02d", f"n$j%02d")
    assert(run(edges) == ref(edges))
  }

  test("top-k truncation follows (adamic_adar desc, a, b) with ties stable") {
    val rnd = new scala.util.Random(23)
    val edges = for {
      i <- 0 until 40; j <- (i + 1) until 40 if rnd.nextDouble() < 0.12
    } yield (f"n$i%02d", f"n$j%02d")
    val full = ref(edges)
    assert(full.size > 10)
    assert(run(edges, k = 10) == full.take(10))
  }

  test("maxDegree drops hub witnesses from the evidence") {
    // hub h connects everyone; x-y also share low-degree witness w
    val edges = Seq(("x", "h"), ("y", "h"), ("z", "h"), ("x", "w"), ("y", "w"))
    val capped = run(edges, maxDegree = 2L)
    // (x,z) and (y,z) only had the hub as witness -> gone under the cap
    assert(capped.map(r => (r._1, r._2)).toSet == Set(("x", "y"), ("h", "w")))
    val xy = capped.find(r => (r._1, r._2) == (("x", "y"))).get
    assert(xy._3 == 1L) // w only
    assert(capped == ref(edges, maxDegree = 2L))
    // uncapped, the hub counts
    assert(run(edges).find(r => (r._1, r._2) == (("x", "y"))).get._3 == 2L)
  }

  test("direction, duplicates, self-loops normalized; repartition-invariant") {
    val messy = Seq(("b", "a"), ("a", "b"), ("a", "a"), ("b", "c"), ("c", "d"))
    assert(run(messy) == run(Seq(("a", "b"), ("b", "c"), ("c", "d"))))
    val rnd = new scala.util.Random(31)
    val edges = for {
      i <- 0 until 40; j <- (i + 1) until 40 if rnd.nextDouble() < 0.1
    } yield (f"n$i%02d", f"n$j%02d")
    val a = run(edges)
    val b = LinkPrediction.topCandidates(
      edges.toDF("src", "dst").repartition(13), 1000)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(a == b)
  }
}
