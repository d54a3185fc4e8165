package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Union+window as-of join vs hand-computed matches. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // quotes: user 1 at t=10 (v=1.0), t=20 (v=2.0); user 2 at t=15 (v=9.0)
  private val quotes = Seq(
    (1L, ts(10), 1.0), (1L, ts(20), 2.0), (2L, ts(15), 9.0)
  ).toDF("user_id", "q_ts", "q_val")

  // trades: before any quote, exactly on a quote, between, after all
  private val trades = Seq(
    (100L, 1L, ts(5)), (101L, 1L, ts(10)), (102L, 1L, ts(15)),
    (103L, 1L, ts(25)), (104L, 2L, ts(14)), (105L, 2L, ts(15))
  ).toDF("trade_id", "user_id", "t_ts")

  private def run(inclusive: Boolean): Map[Long, Option[Double]] =
    AsOfJoin.asOf(trades, quotes, Seq("user_id"), "t_ts", "q_ts", inclusive)
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("q_val")).map(_.asInstanceOf[Double])).toMap

  test("inclusive: latest quote at-or-before each trade") {
    assert(run(inclusive = true) == Map(
      100L -> None,        // before any quote
      101L -> Some(1.0),   // exactly on the t=10 quote
      102L -> Some(1.0),   // between quotes
      103L -> Some(2.0),   // after all quotes
      104L -> None,        // user 2, before its only quote
      105L -> Some(9.0)))  // exactly on it
  }

  test("exclusive: a quote at the same instant is NOT visible") {
    val m = run(inclusive = false)
    assert(m(101L).isEmpty && m(105L).isEmpty, m)
    assert(m(102L) == Some(1.0) && m(103L) == Some(2.0))
  }

  test("matched as-of timestamp rides along; non-key left columns survive") {
    val row = AsOfJoin.asOf(trades, quotes, Seq("user_id"), "t_ts", "q_ts")
      .filter(col("trade_id") === 103L).head()
    assert(row.getAs[Timestamp]("q_ts") == ts(20))
    assert(row.getAs[Timestamp]("t_ts") == ts(25))
  }

  test("single exchange: exactly one shuffle in the plan") {
    val df = AsOfJoin.asOf(trades, quotes, Seq("user_id"), "t_ts", "q_ts")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"as-of join must cost ONE shuffle, got $exchanges:\n$p")
    assert(!p.contains("Join"), s"no join operator expected:\n$p")
  }

  test("repartition-invariant") {
    val a = AsOfJoin.asOf(trades, quotes, Seq("user_id"), "t_ts", "q_ts")
      .collect().map(_.toSeq).toSet
    val b = AsOfJoin.asOf(trades.repartition(7), quotes.repartition(3),
      Seq("user_id"), "t_ts", "q_ts").collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
