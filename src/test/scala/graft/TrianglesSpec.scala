package graft

import org.apache.spark.sql.functions._
import graft.graph.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)]): Map[String, (Long, Long, Double)] =
    Triangles.perNode(edges.toDF("src", "dst"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (n, d, t, c) => n -> (d, t, c) }.toMap

  // single-threaded reference: brute-force triangle enumeration over the
  // undirected simple graph
  private def ref(edges: Seq[(String, String)]): Map[String, (Long, Long, Double)] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }
    val adj = nodes.map { n =>
      n -> und.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }
    }.toMap
    nodes.map { n =>
      val nb = adj(n).toSeq.sorted
      val t = (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if und.contains(if (nb(i) < nb(j)) (nb(i), nb(j)) else (nb(j), nb(i)))
      } yield 1).size.toLong
      val d = nb.size.toLong
      val c = if (d >= 2)
        BigDecimal(t * 2.0 / (d * (d - 1))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      n -> (d, t, c)
    }.toMap
  }

  test("hand-computed: triangle, path, star, K4, shared-edge bowtie") {
    assert(run(Seq(("a", "b"), ("b", "c"), ("c", "a"))) ==
      Map("a" -> (2L, 1L, 1.0), "b" -> (2L, 1L, 1.0), "c" -> (2L, 1L, 1.0)))
    assert(run(Seq(("a", "b"), ("b", "c"))) ==
      Map("a" -> (1L, 0L, 0.0), "b" -> (2L, 0L, 0.0), "c" -> (1L, 0L, 0.0)))
    assert(run(Seq(("h", "s1"), ("h", "s2"), ("h", "s3")))
      .forall { case (_, (_, t, c)) => t == 0 && c == 0.0 })
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b } yield (a, b)
    assert(run(k4).forall { case (_, (d, t, c)) => d == 3 && t == 3 && c == 1.0 })
    // two triangles sharing edge b-c
    val bowtie = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("c", "d"))
    assert(run(bowtie) == ref(bowtie))
    assert(run(bowtie)("b") == ((3L, 2L, BigDecimal(2 * 2.0 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("direction, duplicates and self-loops are normalized away") {
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"),
      ("b", "c"), ("c", "a"))
    assert(run(messy) == run(Seq(("a", "b"), ("b", "c"), ("c", "a"))))
  }

  test("matches brute-force reference on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val edges = for {
      i <- 0 until n; j <- (i + 1) until n if rnd.nextDouble() < 0.08
    } yield (s"n$i", s"n$j")
    assert(run(edges) == ref(edges))
  }

  test("repartition-invariant") {
    val rnd = new scala.util.Random(11)
    val edges = for {
      i <- 0 until 40; j <- (i + 1) until 40 if rnd.nextDouble() < 0.1
    } yield (s"n$i", s"n$j")
    val a = Triangles.perNode(edges.toDF("src", "dst"))
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Triangles.perNode(edges.toDF("src", "dst").repartition(13))
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
