package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal validity intervals — coalesce per-triple observation days into
 * maximal runs separated by gaps larger than `maxGap` days (islands &
 * gaps). This is the temporal-KG materialization step downstream of
 * kg15's provenance and kg19's belief revision: a fact observed on days
 * {3,4,5, 20,21} is not "valid from 3 to 21", it is valid on TWO
 * intervals — the representation temporal KGs (and contradiction
 * detection over them) need. The reference has no temporal model at all
 * (cs562_sdpg treats every observation as timeless).
 *
 * 100 TB shape — exactly two shuffles, in the right order:
 *  1. the observation stream dedupes to DISTINCT (keys, day) FIRST — a
 *     hash agg whose map-side combine collapses the (huge) raw
 *     observation multiplicity before anything shuffles; at 10^12 turns
 *     the distinct (triple, day) set is orders of magnitude smaller;
 *  2. one Exchange on the triple keys for the island window (lag + a
 *     running sum over the same frame — one Window operator);
 *  3. the final interval aggregate groups by (keys :+ interval_idx) — a
 *     SUPERSET of the window's partition keys, so Spark reuses the
 *     step-2 partitioning and plans NO third exchange (plan-pinned).
 *
 * @param obs     observation rows carrying `keyCols` and `dayCol`
 *                (an integral day number, e.g. epoch days); duplicates
 *                at any multiplicity are fine.
 * @param keyCols the fact identity (e.g. subj, pred, obj).
 * @param dayCol  integral observation-day column name.
 * @param maxGap  max allowed silence INSIDE one interval, in days:
 *                consecutive observed days d1 < d2 stay in the same
 *                interval iff d2 - d1 <= maxGap.
 * @return one row per (keys, interval): interval_idx (0-based, in day
 *         order), from_day, to_day, n_active_days (distinct observed
 *         days inside the interval).
 */
object TemporalValidity {

  def intervals(obs: DataFrame, keyCols: Seq[String], dayCol: String,
                maxGap: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(maxGap >= 0, s"maxGap $maxGap")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(dayCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs
      .groupBy(keys :+ col(dayCol): _*).agg(count(lit(1)).as("_n"))
      .drop("_n")
      .select(keys :+ col(dayCol) :+
        when(col(dayCol) - lag(col(dayCol), 1).over(w) > maxGap, 1)
          .otherwise(0).as("_brk"): _*)
      .select(keys :+ col(dayCol) :+
        sum(col("_brk")).over(run).cast("int").as("interval_idx"): _*)
      .groupBy(keys :+ col("interval_idx"): _*)
      .agg(min(col(dayCol)).as("from_day"),
        max(col(dayCol)).as("to_day"),
        count(lit(1)).cast("int").as("n_active_days"))
  }
}
