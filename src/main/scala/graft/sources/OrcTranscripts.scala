package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.StreamingIngest

/**
 * ORC transcript source/sink — the third columnar format next to parquet
 * and pipe-delimited CSV. The reference's external graph-store ingest
 * (Neo4j over bolt, cs562_sdpg `DataLoader.scala:23,71`) has no in-sandbox
 * analog (no drivers, zero egress); file-based sources with a pinned
 * contract schema are the supported ingestion surface. ORC reads carry the
 * same pushdown/pruning properties as parquet under Catalyst.
 */
object OrcTranscripts {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(StreamingIngest.transcriptSchema).orc(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
