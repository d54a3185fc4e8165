package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.eval.Retention

class RetentionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    // day 0 = 1970-01-05 (a Monday, start of absolute week 0 is actually
    // 1970-01-01; absolute weeks are epoch-based, not calendar-based)
    new Timestamp((day.toLong * 86400L + hour * 3600L) * 1000L)

  test("hand-computed cohort matrix") {
    // week = epoch_day DIV 7: days 0-6 -> week 0, 7-13 -> week 1, ...
    val e = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(8)),   // u1: cohort 0, active w0+w1
      (2L, ts(3)),                              // u2: cohort 0, only w0
      (3L, ts(7)), (3L, ts(20)),                // u3: cohort 1, active w1+w2
      (4L, ts(9)), (4L, ts(9, 5))               // u4: cohort 1, only w1 (dup day)
    ).toDF("user_id", "ts")
    val got = Retention.cohorts(e, "user_id", "ts")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(got((0L, 1L)) == ((1L, 2L, 0.5)))
    assert(got((1L, 0L)) == ((2L, 2L, 1.0)))
    assert(got((1L, 1L)) == ((1L, 2L, 0.5)))
    assert(got.size == 4)
  }

  test("null users/timestamps excluded; single-user identity") {
    val e = Seq(
      (Some(1L), Some(ts(0))), (None, Some(ts(0))), (Some(2L), None)
    ).toDF("user_id", "ts")
    val got = Retention.cohorts(e, "user_id", "ts")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((0L, 0L, 1L, 1L, 1.0)))
  }

  test("offset-0 retention is always 1.0; matrix equals brute force on random data") {
    val rnd = new scala.util.Random(562)
    val rows = Seq.fill(400)((rnd.nextInt(30).toLong, ts(rnd.nextInt(40), rnd.nextInt(24))))
    val e = rows.toDF("user_id", "ts")
    // brute force
    val act = rows.map { case (u, t) => (u, t.getTime / 1000 / (7 * 86400)) }.distinct
    val coh = act.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val sizes = coh.values.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val want = act.groupBy { case (u, w) => (coh(u), w - coh(u)) }
      .map { case ((cw, off), xs) =>
        val n = xs.size.toLong
        (cw, off, n, sizes(cw),
          BigDecimal(n.toDouble / sizes(cw))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
    val got = Retention.cohorts(e, "user_id", "ts")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == want)
    got.filter(_._2 == 0L).foreach(r => assert(r._5 == 1.0, s"offset-0 not 1.0: $r"))
    // repartition invariance
    val got2 = Retention.cohorts(e.repartition(7), "user_id", "ts")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got2 == want)
  }
}
