package graft

import java.sql.Timestamp
import graft.eval.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def run(rows: Seq[(Long, String, Timestamp)])
      : Map[Long, (Long, Long, Long, Int)] =
    Funnel.analyze(rows.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps)
      .selectExpr("user_id", "n_view", "n_click", "n_purchase", "reached")
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("full funnel in order reaches 3; counts are per-step totals") {
    val rows = Seq(
      (1L, "view", ts(10)), (1L, "view", ts(20)), (1L, "click", ts(30)),
      (1L, "purchase", ts(40)), (1L, "purchase", ts(50)))
    assert(run(rows) == Map(1L -> (2L, 1L, 2L, 3)))
  }

  test("out-of-order step breaks the chain and later order can't resurrect it") {
    // FIRST purchase (t=15) precedes the first click (t=20): step 3 fails
    // on first-occurrence order, so reached stops at 2 even though a later
    // purchase (t=30) follows the click — first occurrences decide, not
    // any-subsequence matching
    val rows = Seq(
      (1L, "view", ts(10)), (1L, "purchase", ts(15)),
      (1L, "click", ts(20)), (1L, "purchase", ts(30)))
    assert(run(rows)(1L) == ((1L, 1L, 2L, 2)))
    // click before any view: view still counts (step 1 needs only
    // presence) but click's first occurrence (t=5) precedes it → 1, and
    // the break pins — the well-ordered purchase (t=20) can't lift it
    val rows2 = Seq((2L, "click", ts(5)), (2L, "view", ts(10)), (2L, "purchase", ts(20)))
    assert(run(rows2)(2L) == ((1L, 1L, 1L, 1)))
  }

  test("equal first-occurrence timestamps do NOT advance (strict order)") {
    val rows = Seq((1L, "view", ts(10)), (1L, "click", ts(10)), (1L, "purchase", ts(20)))
    assert(run(rows)(1L)._4 == 1)
  }

  test("missing middle step freezes the count; other event types ignored") {
    val rows = Seq(
      (1L, "view", ts(10)), (1L, "purchase", ts(20)), (1L, "signup", ts(15)),
      (2L, "view", ts(10)), (2L, "click", ts(20)))
    val got = run(rows)
    assert(got(1L) == ((1L, 0L, 1L, 1)))
    assert(got(2L) == ((1L, 1L, 0L, 2)))
  }

  test("matches a brute-force reference on a seeded event log; invariant") {
    val rnd = new scala.util.Random(83)
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rows = (1 to 600).map { i =>
      ((i % 37).toLong, types(rnd.nextInt(types.size)), ts(rnd.nextInt(10000)))
    }
    def ref(rs: Seq[(Long, String, Timestamp)]): Map[Long, (Long, Long, Long, Int)] =
      rs.filter(r => steps.contains(r._2)).groupBy(_._1).map { case (u, es) =>
        val n = steps.map(s => es.count(_._2 == s).toLong)
        val first = steps.map(s => es.filter(_._2 == s).map(_._3.getTime).minOption)
        var reached = 0; var intact = true; var prev = Long.MinValue
        for (f <- first) {
          val ok = intact && f.exists(_ > prev)
          if (ok) { reached += 1; prev = f.get } else intact = false
        }
        u -> ((n(0), n(1), n(2), reached))
      }
    assert(run(rows) == ref(rows))
    val b = Funnel.analyze(rows.toDF("user_id", "event_type", "ts").repartition(13),
        "user_id", "event_type", "ts", steps)
      .selectExpr("user_id", "n_view", "n_click", "n_purchase", "reached")
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(b == ref(rows))
  }
}
