package graft

import graft.graph.KHop

/** Bounded BFS vs hand-computed distances on a graph with cycles,
  * diamonds, and unreachable regions. */
class KHopSpec extends SparkSpec {
  import spark.implicits._

  //  a -> b -> c -> d -> e   (chain)
  //  a -> c                  (shortcut: c at 1 hop, not 2)
  //  e -> a                  (cycle back; a stays 0)
  //  x -> y                  (disconnected from a)
  private val edges = Seq(
    "a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e",
    "a" -> "c", "e" -> "a", "x" -> "y"
  ).toDF("src", "dst")

  private def run(seeds: Seq[String], k: Int): Map[String, Int] =
    KHop.distances(edges, seeds.toDF("node"), k)
      .as[(String, Int)].collect().toMap

  test("min-hop distances, shortcut wins over the longer path") {
    assert(run(Seq("a"), 3) ==
      Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2, "e" -> 3))
  }

  test("k truncates the ball; k=0 is just the seeds") {
    assert(run(Seq("a"), 1) == Map("a" -> 0, "b" -> 1, "c" -> 1))
    assert(run(Seq("a"), 0) == Map("a" -> 0))
  }

  test("cycles terminate early; unreachable nodes absent") {
    val m = run(Seq("a"), 10) // ball exhausts at hop 3, loop must stop
    assert(m.keySet == Set("a", "b", "c", "d", "e"))
    assert(!m.contains("x") && !m.contains("y"))
  }

  test("multiple seeds take the pointwise minimum; off-graph seed kept at 0") {
    val m = run(Seq("d", "zzz"), 2)
    assert(m == Map("d" -> 0, "zzz" -> 0, "e" -> 1, "a" -> 2))
  }

  test("matches a brute-force BFS on a random graph") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(300)((rnd.nextInt(60).toString, rnd.nextInt(60).toString))
    val seeds = Seq("1", "2", "3")
    val k = 4
    // driver-side BFS
    val adj = es.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    for (h <- 1 to k) {
      val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      dist ++= nxt.map(_ -> h)
      frontier = nxt
    }
    val got = KHop.distances(es.toDF("src", "dst"), seeds.toDF("node"), k)
      .as[(String, Int)].collect().toMap
    assert(got == dist)
  }
}
