package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/**
 * Delimited-text transcript source.
 *
 * Reference analog: the incremental pipeline's pipe-delimited CSV ingest
 * with header + schema inference (cs562_sdpg `src2/main/scala/Main.scala:
 * 166-172`). Rebuild keeps the same reader options but pins the transcript
 * contract schema instead of per-file inference (inference re-scans every
 * file and can drift between increments — reference defect class).
 */
object CsvTranscripts {

  def read(spark: SparkSession, path: String, delimiter: String = "|"): DataFrame =
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .schema(StreamingIngest.transcriptSchema)
      .csv(path)
      .withColumn("tool", when(col("tool") === "", lit(null)).otherwise(col("tool")))
}
