package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join — for every left row, attach the MOST RECENT
 * right row with right.time <= left.time (or strictly <, see
 * `inclusive`) within the same key group: the "state of the world at
 * event time" join (price at trade time, last purchase before a click,
 * feature snapshot at label time). The reference has no temporal join;
 * DuckDB/kdb expose it as ASOF JOIN — which is exactly what the oracle
 * uses.
 *
 * Spark has no native as-of join; the naive range-join (t_r <= t_l,
 * windowed max) explodes to O(|L|·|R|) per key under a
 * BroadcastNestedLoopJoin. This implementation is the UNION + WINDOW
 * formulation instead:
 *
 *   1. tag right rows (carrying their payload as a struct) and left rows
 *      (payload null), union them;
 *   2. one window per key ordered by (time, side) — side ordered so a
 *      right row at the exact same timestamp sorts BEFORE the left row
 *      iff `inclusive`;
 *   3. `last(payload, ignoreNulls)` over the unbounded-preceding frame
 *      gives every left row its latest visible right payload;
 *   4. keep left rows, unpack the struct.
 *
 * 100 TB shape: ONE exchange total (the window's hash partitioning on
 * the key) and a linear per-partition scan — no join operator at all,
 * no payload duplication, robust to arbitrarily many left rows per
 * right row. A key so hot its whole history exceeds one task's slice is
 * the same skew case as any keyed window; mitigate upstream by
 * time-bucketing the key (bucket boundary rows carried into the next
 * bucket) — not built in, documented tradeoff.
 *
 * Determinism: callers must make the right side unique per
 * (keys, rightTime) — with duplicates the winner among equal timestamps
 * is partition-order-dependent. (The oracle queries pre-aggregate the
 * right side for exactly this reason.)
 */
object AsOfJoin {

  /**
   * @param keys      equality-join key columns (present on both sides).
   * @param leftTime  left event-time column name.
   * @param rightTime right event-time column name; it rides along in the
   *                  output (the matched as-of timestamp), so name it
   *                  distinctly from left's columns.
   * @param inclusive true: match right.time <= left.time; false: strict <.
   * @return left.* plus right's non-key columns from the matched row
   *         (all null when no right row precedes).
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           inclusive: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    val payload = right.columns.filterNot(keys.contains).toSeq
    require(payload.contains(rightTime), s"rightTime $rightTime not in payload")
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    require(leftCols.nonEmpty, "left side carries no non-key columns")
    val collide = payload.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty,
      s"rename right columns colliding with left: ${collide.mkString(",")}")

    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_asof_t"),
        lit(1).as("_asof_r"),
        struct(payload.map(col): _*).as("_asof_p")): _*)
    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_asof_t"),
        lit(0).as("_asof_r"),
        lit(null).cast(r2.schema("_asof_p").dataType).as("_asof_p"),
        struct(leftCols.map(col): _*).as("_asof_l")): _*)
    val r3 = r2.withColumn("_asof_l",
      lit(null).cast(l2.schema("_asof_l").dataType))

    // inclusive: right rows first at equal timestamps (desc on the 1/0
    // side tag), so the left row's frame already contains them
    val sideOrder = if (inclusive) col("_asof_r").desc else col("_asof_r").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r3.select(l2.columns.map(col): _*))
      .withColumn("_asof_m", last(col("_asof_p"), ignoreNulls = true).over(w))
      .filter(col("_asof_r") === 0)
      .select(keys.map(col) ++
        leftCols.map(n => col("_asof_l")(n).as(n)) ++
        payload.map(n => col("_asof_m")(n).as(n)): _*)
  }
}
