package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join — every left POINT row paired with every right
 * INTERVAL row of the same key whose `[start, end]` contains the point
 * (inclusive both ends): attribution windows, validity intervals,
 * sensor-reading-to-maintenance-window joins. The reference has no
 * interval join; the composable Spark form (equi-join on the key plus
 * two range predicates) keeps the range conditions OUT of the join key,
 * so one hot key degenerates to an O(|L_k|·|R_k|) nested-loop per key —
 * and with NO key it is a full BroadcastNestedLoopJoin.
 *
 * This is the BIN-BUCKETED formulation instead (the interval-join
 * strategy DataFusion/DuckDB plan natively):
 *
 *   1. pick a bin width `W` on the (integer) time axis;
 *   2. each point maps to exactly ONE bin, `floor(t / W)`;
 *   3. each interval is replicated to the bins it overlaps,
 *      `sequence(floor(start/W), floor(end/W))` exploded — with
 *      `W >= max interval length` that is at most 2 copies;
 *   4. equi-join on (keys..., bin) — a plain shuffled hash join — and
 *      re-check exact containment.
 *
 * Because a point lives in exactly one bin and an interval appears at
 * most once per bin, a matching pair meets in EXACTLY one bin: no
 * post-join dedup, the join output is the answer.
 *
 * 100 TB shape: two keyed exchanges (one per side) on (keys, bin) — the
 * same cost class as any equi-join — with interval replication bounded
 * by `ceil(len/W)+1`. Catalyst pushes the containment re-check into the
 * join as its non-equi condition; AQE's skew-join split handles hot
 * (key, bin) pairs, and a still-hotter axis region can be salted by
 * narrowing `W` (more bins = finer hash spread) without touching the
 * semantics — the exact filter makes bin choice correctness-neutral.
 *
 * The time axis is any integral column (epoch micros via `unix_micros`,
 * epoch days, sequence numbers): integer bin arithmetic is exact where
 * a double `floor(t/W)` would wobble at 1e15-scale timestamps.
 */
object RangeJoin {

  /** Exact floor-division bin of an integral column (negative-safe:
    * `pmod` keeps the remainder non-negative, so the quotient is the
    * mathematical floor, not truncation toward zero). */
  private def binOf(t: Column, w: Long): Column =
    ((t - pmod(t, lit(w))) / lit(w)).cast("long")

  /**
   * @param points    left side; one row per point event.
   * @param intervals right side; one row per `[start, end]` interval
   *                  (rows with `end < start` match nothing and are
   *                  dropped up front).
   * @param keys      equality key columns present on both sides.
   * @param pointTime integral point-time column on `points`.
   * @param startCol  integral interval-start column on `intervals`.
   * @param endCol    integral interval-end column on `intervals`.
   * @param binWidth  bin width on the time axis; pick ~the max interval
   *                  length (larger = fewer copies, smaller = finer
   *                  parallelism). Correctness does not depend on it.
   * @return points.* plus intervals' non-key columns, one row per
   *         containing (point, interval) pair.
   */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointTime: String,
                      startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one equality key")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!keys.contains(pointTime), "pointTime cannot be a key column")
    val payload = intervals.columns.filterNot(keys.contains).toSeq
    require(payload.contains(startCol) && payload.contains(endCol),
      s"$startCol/$endCol must be non-key columns of the interval side")
    val collide = payload.toSet.intersect(points.columns.toSet)
    require(collide.isEmpty,
      s"rename interval columns colliding with points: ${collide.mkString(",")}")

    val p = points.withColumn("_rj_bin", binOf(col(pointTime), binWidth))
    val i = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("_rj_bin",
        explode(sequence(binOf(col(startCol), binWidth),
          binOf(col(endCol), binWidth))))

    p.join(i,
        keys.map(k => p(k) === i(k))
          .reduce(_ && _) && p("_rj_bin") === i("_rj_bin") &&
          p(pointTime) >= i(startCol) && p(pointTime) <= i(endCol))
      .select(points.columns.map(p(_)).toSeq ++ payload.map(i(_)): _*)
  }
}
