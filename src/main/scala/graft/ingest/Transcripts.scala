package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Transcript ingest: scan + stable turn ordering + skew-aware partitioning.
 *
 * Reference analog: `DataLoader.loadAllNodes` (cs562_sdpg
 * `DataLoader.scala:10-57`) — which collected every record to the driver and
 * re-parallelized. Rebuild: direct columnar scan (Parquet/Iceberg layout);
 * filters and column pruning reach the scan via Catalyst.
 *
 * Stable turn ordering (BASELINE input_hint "per-turn text equality under
 * stable turn ordering"): duplicate deliveries of the same
 * (conv_id, turn_idx) are resolved deterministically by earliest `ts` then
 * text — a window `row_number`, the same shape as the reference's
 * top-1-per-group (W1, `ClusteringEvaluation.scala:17-22`).
 */
object Transcripts {

  val contractCols: Seq[String] = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(contractCols.map(col): _*)

  /** Deterministic dedup to one row per (conv_id, turn_idx): earliest
    * (ts, text) wins. row_number + filter rn=1 is planned by Spark 4 as
    * WindowGroupLimit (streaming per-group top-1, no full-frame
    * materialization) — measured faster than both a min_by(struct)
    * SortAggregate and a scalar two-phase agg+join at 12M turns. */
  def stableTurns(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id", "turn_idx")
      .orderBy(col("ts").asc_nulls_last, col("text").asc_nulls_last)
    transcripts.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /**
   * Range partitioning on (conv_id, turn_idx) plus a salt component for hot
   * conversations (SURVEY.md §7 stage 1; reference gap — it never
   * partitions). The salt keeps a single 10^6-turn conversation from
   * serializing one task while preserving conv-locality for everything else.
   * Per-turn operators in this engine are embarrassingly parallel, so the
   * salt never has to be undone.
   */
  def repartitionForScale(transcripts: DataFrame, partitions: Int): DataFrame =
    transcripts.repartitionByRange(partitions,
      col("conv_id"), pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(16)), col("turn_idx"))
}
