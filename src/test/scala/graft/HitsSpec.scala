package graft

import graft.graph.Hits

/** HITS vs a driver-side brute-force iteration (the PageRankSpec
  * pattern: same fixed-iteration, L1-normalized semantics over Maps). */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: dense HITS over Maps. */
  private def brute(edges: Seq[(String, String)],
                    iters: Int): Map[String, (Double, Double)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    var auth = nodes.map(_ -> 1.0).toMap
    var hubs = auth
    def l1(m: Map[String, Double]): Map[String, Double] = {
      val z = m.values.sum
      if (z > 0) m.view.mapValues(_ / z).toMap else m.view.mapValues(_ => 0.0).toMap
    }
    for (_ <- 1 to iters) {
      hubs = l1(nodes.map(u =>
        u -> e.filter(_._1 == u).map { case (_, v) => auth(v) }.sum).toMap)
      auth = l1(nodes.map(v =>
        v -> e.filter(_._2 == v).map { case (u, _) => hubs(u) }.sum).toMap)
    }
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    nodes.map(n => n -> (r6(hubs(n)), r6(auth(n)))).toMap
  }

  private def run(edges: Seq[(String, String)],
                  iters: Int = 5): Map[String, (Double, Double)] =
    Hits.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

  test("matches brute force on a graph with sinks, sources, and a self-loop") {
    // d: pure sink (hub 0); e: pure source (authority 0); c: self-loop;
    // a->b duplicated (must collapse)
    val edges = Seq("a" -> "b", "a" -> "b", "b" -> "c", "c" -> "c",
      "c" -> "a", "a" -> "d", "e" -> "a")
    val got = run(edges)
    val exp = brute(edges, 5)
    assert(got.keySet == exp.keySet)
    for (k <- exp.keySet) {
      assert(math.abs(got(k)._1 - exp(k)._1) <= 1e-6, s"hub $k: ${got(k)} vs ${exp(k)}")
      assert(math.abs(got(k)._2 - exp(k)._2) <= 1e-6, s"auth $k: ${got(k)} vs ${exp(k)}")
    }
  }

  test("randomized graphs match brute force") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 3) {
      val n = 6 + rnd.nextInt(6)
      val edges = Seq.fill(2 * n)(
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      val got = run(edges, iters = 4)
      val exp = brute(edges, 4)
      assert(got.keySet == exp.keySet, s"trial $trial")
      for (k <- exp.keySet) {
        assert(math.abs(got(k)._1 - exp(k)._1) <= 1e-6, s"trial $trial hub $k")
        assert(math.abs(got(k)._2 - exp(k)._2) <= 1e-6, s"trial $trial auth $k")
      }
    }
  }

  test("L1 mass: hubs and authorities each sum to ~1") {
    val got = run(Seq("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "a"))
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-4)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("star graph: the center is the authority, the leaves are the hubs") {
    val got = run((1 to 6).map(i => s"leaf$i" -> "hub"))
    assert(got("hub")._2 > 0.99, got("hub"))
    assert(got("hub")._1 == 0.0)
    assert(math.abs(got("leaf1")._1 - 1.0 / 6) < 1e-6)
    assert(got("leaf1")._2 == 0.0)
  }
}
