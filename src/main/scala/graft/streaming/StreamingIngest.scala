package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.extract.Extraction

/**
 * Structured Streaming ingest for the transcript contract table.
 *
 * The reference has no streaming (SURVEY.md §2.10) — its streaming *role*
 * is the file-at-a-time incremental loop with serialized state
 * (cs562_sdpg `src2/main/scala/Main.scala:56-70`). This module lifts that
 * exact semantics onto Structured Streaming: a file-source stream over the
 * transcript directory, per-turn triple extraction as the same pure column
 * transforms used in batch (one code path), checkpointed exactly-once
 * append to a parquet sink. `Trigger.AvailableNow` gives the reference's
 * batch-incremental behavior (process everything present, then stop);
 * swap the trigger for continuous micro-batching in production.
 */
object StreamingIngest {

  import org.apache.spark.sql.types._

  val transcriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    StructField("tool", StringType), StructField("ts", TimestampType)))

  /** Streaming per-turn triple extraction: same column logic as batch. */
  def triplesStream(spark: SparkSession, inputDir: String): DataFrame =
    Extraction.triplesRaw(
      spark.readStream.schema(transcriptSchema).parquet(inputDir))

  /** Start an exactly-once extraction job: transcripts dir -> triples sink.
    * Resume = restart with the same checkpointLocation (Spark replays only
    * unprocessed files — the streaming analog of our stage checkpoints). */
  def startExtraction(spark: SparkSession, inputDir: String,
                      sinkDir: String, checkpointDir: String): StreamingQuery =
    triplesStream(spark, inputDir).writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Windowed per-conversation turn-rate aggregation with a watermark —
    * the standard streaming-telemetry companion query (event-time window,
    * late data bounded by the watermark). */
  def turnRates(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(transcriptSchema).parquet(inputDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("window.start").as("window_start"), col("role"), col("n_turns"))
}
