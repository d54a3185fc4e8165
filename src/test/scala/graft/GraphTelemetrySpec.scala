package graft

import graft.graph.GraphTelemetry

class GraphTelemetrySpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed histogram: hub, self-loop, duplicate edges") {
    val e = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"),  // a: out 3
      ("b", "c"),                          // b: out 1; c: in 2
      ("e", "e"),                          // self-loop: out 1 + in 1
      ("a", "b")                           // duplicate, dropped
    ).toDF("src", "dst")
    val got = GraphTelemetry.degreeHistogram(e)
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // out: a=3, b=1, e=1 -> {3:1, 1:2} of 3 nodes
    assert(got(("out", 3L)) == ((1L, 0.333333)))
    assert(got(("out", 1L)) == ((2L, 0.666667)))
    // in: b=1, c=2, d=1, e=1 -> {1:3, 2:1} of 4 nodes
    assert(got(("in", 1L)) == ((3L, 0.75)))
    assert(got(("in", 2L)) == ((1L, 0.25)))
    // total: a=3, b=2, c=2, d=1, e=2 -> {3:1, 2:3, 1:1} of 5 nodes
    assert(got(("total", 3L)) == ((1L, 0.2)))
    assert(got(("total", 2L)) == ((3L, 0.6)))
    assert(got(("total", 1L)) == ((1L, 0.2)))
    assert(got.size == 7)
  }

  test("null endpoints dropped; fractions sum to 1 per kind; repartition invariant") {
    val rnd = new scala.util.Random(562)
    val e = (Seq.fill(300)((s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}")) ++
      Seq((null, "x"), ("y", null))).toDF("src", "dst")
    val rows = GraphTelemetry.degreeHistogram(e)
      .as[(String, Long, Long, Double)].collect()
    for (k <- Seq("in", "out", "total")) {
      val s = rows.filter(_._1 == k).map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$k fracs sum to $s")
    }
    val rows2 = GraphTelemetry.degreeHistogram(e.repartition(7))
      .as[(String, Long, Long, Double)].collect()
    assert(rows.toSet == rows2.toSet)
    // null-endpoint rows contributed nothing: only the 40 synthetic names
    val tot = rows.filter(_._1 == "total").map(_._3).sum
    assert(tot <= 40, s"at most 40 synthetic nodes, got $tot")
  }
}
