package graft

import java.sql.Timestamp
import graft.eval.Sessionize

class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  // gap = 600s for readable fixtures
  private val Gap = 600L * 1000000L

  test("hand-computed sessions: gap splits, counts, durations") {
    val e = Seq(
      // u1: 3 events 0/100/200s (one session), then 2000/2100s (second)
      (1L, 1L, ts(0)), (2L, 1L, ts(100)), (3L, 1L, ts(200)),
      (4L, 1L, ts(2000)), (5L, 1L, ts(2100)),
      // u2: single event
      (6L, 2L, ts(50)),
      // u3: two events exactly Gap apart -> SAME session (> is strict)
      (7L, 3L, ts(0)), (8L, 3L, ts(600)),
      // u3: third event Gap+1s after the second -> new session
      (9L, 3L, ts(1201))
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(e, "user_id", "ts", "event_id", Gap)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got((1L, 1L)) == ((0L, 200000000L, 3L, 200000000L)))
    assert(got((1L, 2L)) == ((2000000000L, 2100000000L, 2L, 100000000L)))
    assert(got((2L, 1L)) == ((50000000L, 50000000L, 1L, 0L)))
    assert(got((3L, 1L)) == ((0L, 600000000L, 2L, 600000000L)))
    assert(got((3L, 2L)) == ((1201000000L, 1201000000L, 1L, 0L)))
    assert(got.size == 5)
  }

  test("null user/ts excluded; numbering deterministic under repartition") {
    val e = Seq(
      (Option(1L), Option(ts(0)), 1L), (Option(1L), Option(ts(2000)), 2L),
      (None, Option(ts(0)), 3L), (Option(2L), None, 4L)
    ).toDF("user_id", "ts", "event_id")
    val a = Sessionize.sessions(e, "user_id", "ts", "event_id", Gap)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val b = Sessionize.sessions(e.repartition(7), "user_id", "ts", "event_id", Gap)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
    assert(a == Seq(
      (1L, 1L, 0L, 0L, 1L, 0L),
      (1L, 2L, 2000000000L, 2000000000L, 1L, 0L)))
  }

  test("tie timestamps break by id: one session, stable numbering") {
    val e = Seq(
      (10L, 1L, ts(100)), (11L, 1L, ts(100)), (12L, 1L, ts(100))
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(e, "user_id", "ts", "event_id", Gap)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 100000000L, 100000000L, 3L, 0L)))
  }
}
