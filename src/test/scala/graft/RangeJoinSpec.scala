package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bin-bucketed point-in-interval join vs a brute-force theta join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // intervals: user 1 [10,20] and [15,25] (overlapping), user 2 [0,5];
  // one degenerate [30,30] and one inverted [50,40] (must match nothing)
  private val intervals = Seq(
    (1L, 10L, 20L, "a"), (1L, 15L, 25L, "b"), (2L, 0L, 5L, "c"),
    (1L, 30L, 30L, "d"), (2L, 50L, 40L, "e")
  ).toDF("user_id", "t_start", "t_end", "tag")

  // points: boundaries, interior of the overlap, gaps, wrong key
  private val points = Seq(
    (100L, 1L, 10L), (101L, 1L, 17L), (102L, 1L, 25L), (103L, 1L, 26L),
    (104L, 1L, 30L), (105L, 2L, 3L), (106L, 2L, 45L), (107L, 3L, 17L)
  ).toDF("point_id", "user_id", "t")

  private def pairs(binWidth: Long): Set[(Long, String)] =
    RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
        "t", "t_start", "t_end", binWidth)
      .select("point_id", "tag").as[(Long, String)].collect().toSet

  private val expected = Set(
    100L -> "a",              // t == start boundary
    101L -> "a", 101L -> "b", // interior of the overlap: both intervals
    102L -> "b",              // t == end boundary
    104L -> "d",              // degenerate single-instant interval
    105L -> "c")
    // 103 in the gap, 106 only meets the inverted interval, 107 wrong key

  test("matches brute force, boundaries inclusive, inverted dropped") {
    assert(pairs(binWidth = 16L) == expected)
    val brute = points.join(intervals, Seq("user_id"))
      .filter(col("t") >= col("t_start") && col("t") <= col("t_end"))
      .select("point_id", "tag").as[(Long, String)].collect().toSet
    assert(brute == expected)
  }

  test("bin width is correctness-neutral, incl. intervals spanning many bins") {
    // W=3 replicates [10,20] across 5 bins and [15,25] across 4; W=1000
    // puts everything in one bin. Same answer, no duplicate pairs.
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
        "t", "t_start", "t_end", w).select("point_id", "tag")
        .as[(Long, String)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at W=$w")
      assert(got.toSet == expected, s"wrong pairs at W=$w")
    }
  }

  test("negative time axis: floor bins, not truncation toward zero") {
    val i = Seq((1L, -10L, -2L, "n")).toDF("user_id", "t_start", "t_end", "tag")
    val p = Seq((200L, 1L, -5L), (201L, 1L, -1L)).toDF("point_id", "user_id", "t")
    val got = RangeJoin.pointInInterval(p, i, Seq("user_id"),
      "t", "t_start", "t_end", 4L).select("point_id", "tag")
      .as[(Long, String)].collect().toSet
    assert(got == Set(200L -> "n"))
  }

  test("plans as an equi-join on (key, bin), never a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
      "t", "t_start", "t_end", 16L).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
    assert(plan.contains("Join"), plan)
  }
}
