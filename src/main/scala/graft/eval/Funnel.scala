package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ordered-funnel analysis over an event log — the product-analytics
 * staple (view → click → purchase): per user, how many events of each
 * step occurred and how deep the STRICTLY TIME-ORDERED funnel was
 * traversed (step k counts as reached only when its first occurrence is
 * strictly after step k−1's first occurrence — a purchase logged before
 * any click is attribution noise, not a conversion).
 *
 * Determinism / portability: per-step evidence is (count, min event
 * time as epoch micros) — exact integers; `reached` is a pure CASE
 * chain over them. No floats anywhere.
 *
 * 100 TB shape: ONE user-keyed partial aggregate (conditional
 * count/min per step — map-side combine collapses each user before the
 * shuffle), then a pure projection for the stage logic. No window, no
 * join, no explode; the event scan prunes to (user, type, ts).
 */
object Funnel {

  /** Per-user funnel report for ordered `steps` (event-type names):
    * (userCol, n_<step>... , ts_<step>_us..., reached). Null users and
    * events of types outside `steps` are ignored. */
  def analyze(events: DataFrame, userCol: String, typeCol: String,
              tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps, s"bad steps: $steps")
    val us = unix_micros(col(tsCol).cast("timestamp_ltz"))
    val aggs = steps.flatMap { s =>
      Seq(
        count(when(col(typeCol) === s, lit(1))).as(s"n_$s"),
        min(when(col(typeCol) === s, us)).as(s"ts_${s}_us"))
    }
    val base = events
      .filter(col(userCol).isNotNull && col(typeCol).isin(steps.map(lit): _*))
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
    // reached = longest PREFIX with strictly increasing first-occurrence
    // times: the fold carries (count so far, chain still intact) — once a
    // step fails, intact pins false and the count freezes, so a
    // well-ordered later step can't resurrect a broken funnel
    val (reached, _) = steps.zipWithIndex
      .foldLeft((lit(0): Column, lit(true): Column)) {
        case ((cnt, intact), (s, i)) =>
          val present = col(s"ts_${s}_us").isNotNull
          val ordered =
            if (i == 0) present
            else present && col(s"ts_${s}_us") > col(s"ts_${steps(i - 1)}_us")
          val ok = intact && ordered
          (when(ok, cnt + 1).otherwise(cnt), ok)
      }
    base.withColumn("reached", reached)
  }
}
