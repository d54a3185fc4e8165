package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cohort retention analysis — the standard activity matrix over an event
 * stream: users are cohorted by the week of their FIRST event, and each
 * (cohort_week, week_offset) cell counts how many of that cohort were
 * active offset weeks later, plus the retention rate against the cohort
 * size. The training-data analog of product retention: per-ingestion-
 * cohort contributor survival is how crawl pipelines detect source decay.
 *
 * Weeks are ABSOLUTE integer indices `epoch_micros DIV (7*86400e6)` —
 * pure integer arithmetic, no calendar/timezone semantics, so the result
 * is bit-identical across engines (the oracle uses DuckDB's `//`).
 *
 * 100 TB shape: activity dedup and the cohort min are consecutive
 * partial aggregates keyed on (user, week) then user; the activity ⋈
 * cohort join is a user-keyed equi join (AQE-planned); because each user
 * carries exactly ONE cohort and (user, week) rows are already distinct,
 * the per-cell count is a plain `count(*)` — no count-distinct expand.
 * The cohort-size table aggregates to #weeks rows and broadcasts into
 * the final join. No windows, no driver collects.
 */
object Retention {

  private val WeekMicros = 7L * 86400L * 1000000L

  /**
   * @param events   table with a user column and a timestamp column
   * @return (cohort_week, week_offset, n_active, cohort_size, retention)
   *         with retention = round(n_active / cohort_size, 6); offset 0
   *         rows carry retention 1.0 by construction.
   */
  def cohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val act = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) DIV $WeekMicros").as("week"))
      .distinct()
    val coh = act.groupBy(col("u")).agg(min(col("week")).as("cohort_week"))
    val sizes = coh.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    act.join(coh, Seq("u"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active")) // (u, week) distinct + 1 cohort/user
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }
}
