package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization — the canonical event-stream operator: a user's
 * events are split into sessions wherever the inactivity gap exceeds a
 * threshold, then each session is summarized (start, end, event count,
 * duration). The training-data analog: conversation/episode segmentation
 * of interaction logs before packing them into training examples.
 *
 * Timestamps are reduced to epoch micros up front (pure integer
 * arithmetic, engine-portable; the oracle uses DuckDB's `epoch_us`), and
 * ties within a user are broken by the event-id column so the session
 * numbering is deterministic under any row order.
 *
 * 100 TB shape: ONE Exchange total. The gap flag (`lag`) and the running
 * session index (`sum ... rows unbounded preceding`) share one window
 * spec — one hash partition on the user column, one sort, two Window
 * operators over the same pass. The closing per-(user, session_idx)
 * aggregate requires only clustering by a SUPERSET of the window's
 * partition key, which `HashPartitioning(user)` already satisfies, so
 * Catalyst plans it with NO second shuffle (plan-pinned in PlanSpec).
 * No driver collects, no joins, state is one row per event.
 */
object Sessionize {

  /**
   * @param events  table with a user column, a timestamp column, and a
   *                unique id column used only as a deterministic tiebreak
   * @param gapUsec inactivity gap (micros) that opens a new session
   * @return (user, session_idx, session_start_us, session_end_us,
   *         n_events, duration_usec); session_idx is 1-based per user in
   *         time order.
   */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, gapUsec: Long): DataFrame = {
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(idCol),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))").as("us"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("us"), col(idCol))
    val prev = lag(col("us"), 1).over(w)
    val flagged = e.withColumn("new_s",
      when(prev.isNull || col("us") - prev > gapUsec, 1L).otherwise(0L))
    val sessioned = flagged.withColumn("session_idx",
      sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned.groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col("us")).as("session_start_us"),
        max(col("us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_usec"))
  }
}
