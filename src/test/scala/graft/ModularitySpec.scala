package graft

import org.apache.spark.sql.functions._
import graft.graph.{LabelPropagation, Modularity}

class ModularitySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], comm: Seq[(String, String)])
  : Map[String, (Long, Long, Long, Double)] =
    Modularity.perCommunity(edges.toDF("src", "dst"), comm.toDF("node", "community"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

  private def ref(edges: Seq[(String, String)], comm: Map[String, String])
  : Map[String, Double] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val m = und.size.toDouble
    val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, g) => n -> g.size }
    comm.values.toSet.map { (c: String) =>
      val nodes = comm.collect { case (n, cc) if cc == c => n }.toSet
      val e = und.count { case (a, b) => nodes(a) && nodes(b) }
      val d = nodes.toSeq.map(n => deg.getOrElse(n, 0)).sum
      c -> BigDecimal(e / m - (d / (m * 2)) * (d / (m * 2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  private val k4 = (p: String) => for {
    a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
  } yield (p + a, p + b)
  private val barbell = k4("x") ++ k4("y") :+ (("xa", "ya"))
  private val nodes = Seq("a", "b", "c", "d").flatMap(s => Seq("x" + s, "y" + s))

  test("hand-computed: two cliques + bridge, perfect split") {
    // m = 13; per clique e_c = 6, d_c = 3*3 + 4 = 13:
    // Q_c = 6/13 - (13/26)^2 = 0.211538 each
    val comm = nodes.map(n => n -> n.take(1))
    val got = run(barbell, comm)
    assert(got("x") == ((4L, 6L, 13L, 0.211538)), got)
    assert(got("y") == ((4L, 6L, 13L, 0.211538)), got)
  }

  test("single community scores exactly 0; singletons are negative") {
    val one = run(barbell, nodes.map(_ -> "all"))
    assert(one("all")._4 == 0.0, one)
    val singletons = run(barbell, nodes.map(n => n -> n))
    assert(singletons.values.forall(_._4 < 0.0), singletons)
  }

  test("matches the brute-force reference on a seeded random graph + LPA assignment") {
    val rnd = new scala.util.Random(29)
    val edges = for {
      i <- 0 until 50; j <- (i + 1) until 50 if rnd.nextDouble() < 0.08
    } yield (s"n$i", s"n$j")
    val lpa = LabelPropagation.run(edges.toDF("src", "dst"), 5)
      .as[(String, String)].collect().toMap
    val got = run(edges, lpa.toSeq)
    val want = ref(edges, lpa)
    assert(got.view.mapValues(_._4).toMap == want,
      s"diff=${got.keySet.filter(k => got(k)._4 != want(k)).take(3)}")
    // on a STRUCTURELESS Erdos-Renyi graph the LPA split legitimately
    // scores <= 0 (no communities to find); positive Q belongs to graphs
    // WITH structure — the barbell's LPA split:
    val structured = LabelPropagation.run(barbell.toDF("src", "dst"), 5)
      .as[(String, String)].collect()
    assert(run(barbell, structured.toSeq).values.map(_._4).sum > 0.2)
  }

  test("repartition-invariant") {
    val comm = nodes.map(n => n -> n.take(1))
    val a = run(barbell, comm)
    val b = Modularity.perCommunity(
      barbell.toDF("src", "dst").repartition(7),
      comm.toDF("node", "community").repartition(3))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(a == b)
  }
}
