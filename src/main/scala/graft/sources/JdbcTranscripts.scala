package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/**
 * External-database transcript source over Spark's JDBC connector — the
 * shaped counterpart of the reference's live graph-store ingest
 * (cs562_sdpg `schemadiscovery/src/main/scala/DataLoader.scala:23,71`,
 * which pulls every node/relationship over a bolt driver and collects it
 * to the DRIVER heap — the #1 scalability sin per SURVEY.md §1).
 *
 * Rebuilt Spark-first: `spark.read.jdbc` with explicit range partitioning
 * (`partitionColumn`/`numPartitions`), so the pull is N parallel executor
 * reads, each a pushed-down range query — no driver materialization; the
 * optional `predicate` is pushed into the remote scan. Output is the pinned
 * transcript contract schema via [[toContract]] (never remote-side
 * inference — the reference defect class that made per-file schemas drift).
 *
 * NOT integration-testable in this sandbox (zero egress, no JDBC drivers
 * on the classpath — COVERAGE.md S-). The projection/cast logic is pure
 * DataFrame code, so [[toContract]] is unit-tested against an in-memory
 * frame with a typical remote schema (strings/wider ints/epoch millis).
 */
object JdbcTranscripts {

  /** Expected remote column names (same contract as every other source). */
  val columns: Seq[String] = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  /**
   * Read the transcript table from a JDBC source, partitioned for parallel
   * pull. `partitionColumn` must be a numeric/date column of the remote
   * table (e.g. a monotonically increasing row id); bounds are used ONLY to
   * size partitions — rows outside them are still read (Spark semantics).
   */
  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int, predicate: Option[String] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", predicate match {
        // push the filter into the remote scan as a derived-table subquery
        case Some(p) => s"(SELECT * FROM $table WHERE $p) AS graft_src"
        case None => table
      })
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .option("pushDownPredicate", "true")
      .options(options)
    toContract(reader.load())
  }

  /** Project + cast an arbitrary remote result to the pinned contract
    * schema `(conv_id string, turn_idx int, role string, text string,
    * tool string, ts timestamp)`. Accepts the usual remote widenings
    * (BIGINT turn_idx, epoch-millis BIGINT ts, empty-string tool). */
  def toContract(df: DataFrame): DataFrame = {
    val missing = columns.filterNot(df.columns.map(_.toLowerCase).contains)
    require(missing.isEmpty, s"jdbc source missing contract columns: $missing")
    val tsCol = df.schema(df.columns.indexWhere(_.equalsIgnoreCase("ts"))).dataType match {
      case org.apache.spark.sql.types.LongType => // epoch millis convention
        timestamp_millis(col("ts"))
      case _ => col("ts").cast("timestamp")
    }
    df.select(
      col("conv_id").cast("string").as("conv_id"),
      col("turn_idx").cast("int").as("turn_idx"),
      col("role").cast("string").as("role"),
      col("text").cast("string").as("text"),
      when(col("tool").cast("string") === "", lit(null).cast("string"))
        .otherwise(col("tool").cast("string")).as("tool"),
      tsCol.as("ts"))
  }

  /** Contract schema (shared with every other transcript source). */
  def contractSchema: org.apache.spark.sql.types.StructType =
    StreamingIngest.transcriptSchema
}
