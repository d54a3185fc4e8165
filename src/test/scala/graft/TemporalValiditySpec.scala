package graft

import graft.graph.TemporalValidity

/** Islands-and-gaps interval coalescing vs a driver-side brute force. */
class TemporalValiditySpec extends SparkSpec {
  import spark.implicits._

  /** Reference: sort distinct days, split where the gap exceeds maxGap. */
  private def brute(obs: Seq[(String, Long)],
                    maxGap: Long): Set[(String, Int, Long, Long, Int)] =
    obs.distinct.groupBy(_._1).flatMap { case (k, rows) =>
      val days = rows.map(_._2).distinct.sorted
      val islands = days.foldLeft(Vector.empty[Vector[Long]]) { (acc, d) =>
        if (acc.nonEmpty && d - acc.last.last <= maxGap)
          acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      islands.zipWithIndex.map { case (ds, i) =>
        (k, i, ds.head, ds.last, ds.size)
      }
    }.toSet

  private def run(obs: Seq[(String, Long)],
                  maxGap: Long): Set[(String, Int, Long, Long, Int)] =
    TemporalValidity.intervals(obs.toDF("k", "day"), Seq("k"), "day", maxGap)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet

  test("hand case: two islands, duplicate observations collapse") {
    val obs = Seq("a" -> 3L, "a" -> 3L, "a" -> 4L, "a" -> 5L,
      "a" -> 20L, "a" -> 21L, "b" -> 7L)
    val got = run(obs, maxGap = 3)
    assert(got == Set(
      ("a", 0, 3L, 5L, 3), ("a", 1, 20L, 21L, 2), ("b", 0, 7L, 7L, 1)))
  }

  test("gap exactly maxGap stays one interval; maxGap+1 splits") {
    assert(run(Seq("x" -> 1L, "x" -> 4L), 3) == Set(("x", 0, 1L, 4L, 2)))
    assert(run(Seq("x" -> 1L, "x" -> 5L), 3) ==
      Set(("x", 0, 1L, 1L, 1), ("x", 1, 5L, 5L, 1)))
  }

  test("contradictions: overlapping intervals of different objects, canonical pairs") {
    // s/p: obj A valid [1,5] and [20,25]; obj B valid [4,8] and [24,28];
    // obj C valid [50,50] (no overlap with anything)
    val obs = Seq(
      ("s", "A", 1L), ("s", "A", 5L), ("s", "A", 20L), ("s", "A", 25L),
      ("s", "B", 4L), ("s", "B", 8L), ("s", "B", 24L), ("s", "B", 28L),
      ("s", "C", 50L)).map { case (k, o, d) => (k, "p", o, d) }
    val iv = TemporalValidity.intervals(
      obs.toDF("subj", "pred", "obj", "day"), Seq("subj", "pred", "obj"),
      "day", maxGap = 5)
    val got = TemporalValidity.contradictions(iv, Seq("subj", "pred"), "obj")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == Set(
      ("s", "p", "A", "B", 4L, 5L, 2L),    // [1,5] x [4,8]
      ("s", "p", "A", "B", 24L, 25L, 2L))) // [20,25] x [24,28]
  }

  test("asOf: horizon snapshot keeps runs alive within grace; explicit day filters both ends") {
    // A valid [1,5] and [20,25]; B valid [4,8]
    val obs = Seq(
      ("s", "A", 1L), ("s", "A", 5L), ("s", "A", 20L), ("s", "A", 25L),
      ("s", "B", 4L), ("s", "B", 8L)).map { case (k, o, d) => (k, "p", o, d) }
    val iv = TemporalValidity.intervals(
      obs.toDF("subj", "pred", "obj", "day"), Seq("subj", "pred", "obj"),
      "day", maxGap = 5)
    // horizon = 25: only A's [20,25] is current (B last seen day 8)
    val cur = TemporalValidity.asOf(iv, None, grace = 3)
      .select("obj", "from_day", "to_day", "as_of_day")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(cur == Set(("A", 20L, 25L, 25L)))
    // as of day 8: A's [1,5] (within grace) and B's [4,8]; A's [20,25]
    // hasn't started
    val at8 = TemporalValidity.asOf(iv, Some(8L), grace = 3)
      .select("obj", "from_day", "to_day")
      .as[(String, Long, Long)].collect().toSet
    assert(at8 == Set(("A", 1L, 5L), ("B", 4L, 8L)))
  }

  test("randomized inputs match brute force") {
    val rnd = new scala.util.Random(32)
    for (trial <- 1 to 3) {
      val obs = Seq.fill(120)(
        (s"k${rnd.nextInt(5)}", rnd.nextInt(40).toLong))
      val gap = 1 + rnd.nextInt(4)
      assert(run(obs, gap) == brute(obs, gap), s"trial $trial gap $gap")
    }
  }
}
