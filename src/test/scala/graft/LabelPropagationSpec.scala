package graft

import graft.graph.LabelPropagation

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], rounds: Int = 5): Map[String, String] =
    LabelPropagation.run(edges.toDF("src", "dst"), rounds)
      .as[(String, String)].collect().toMap

  // single-threaded reference: synchronous plurality update, smallest-label
  // tie-break, over the undirected simple graph
  private def ref(edges: Seq[(String, String)], rounds: Int): Map[String, String] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2).distinct }
    var l = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      l = adj.map { case (v, ns) =>
        val votes = ns.map(l).groupBy(identity).map { case (lab, g) => (lab, g.size) }
        v -> votes.toSeq.minBy { case (lab, c) => (-c, lab) }._1
      }
    }
    l
  }

  test("two cliques joined by a bridge form two communities") {
    val k4 = (p: String) => for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (p + a, p + b)
    val edges = k4("x") ++ k4("y") :+ (("xa", "ya"))
    val got = run(edges)
    assert(got == ref(edges, 5))
    val xs = Seq("xa", "xb", "xc", "xd").map(got)
    val ys = Seq("ya", "yb", "yc", "yd").map(got)
    assert(xs.distinct.size == 1 && ys.distinct.size == 1 && xs.head != ys.head,
      s"got=$got")
  }

  test("0 rounds returns identity labels") {
    val edges = Seq(("a", "b"), ("b", "c"))
    assert(run(edges, 0) == Map("a" -> "a", "b" -> "b", "c" -> "c"))
  }

  test("matches the reference on a seeded random graph, round for round") {
    val rnd = new scala.util.Random(13)
    val edges = for {
      i <- 0 until 50; j <- (i + 1) until 50 if rnd.nextDouble() < 0.08
    } yield (s"n$i", s"n$j")
    for (r <- Seq(1, 3, 5)) assert(run(edges, r) == ref(edges, r), s"rounds=$r")
  }

  test("direction/duplicates/self-loops normalized; repartition-invariant") {
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("c", "a"), ("c", "a"))
    assert(run(messy) == run(Seq(("a", "b"), ("b", "c"), ("c", "a"))))
    val rnd = new scala.util.Random(17)
    val edges = for {
      i <- 0 until 40; j <- (i + 1) until 40 if rnd.nextDouble() < 0.1
    } yield (s"n$i", s"n$j")
    val a = run(edges)
    val b = LabelPropagation.run(edges.toDF("src", "dst").repartition(13), 5)
      .as[(String, String)].collect().toMap
    assert(a == b)
  }
}
