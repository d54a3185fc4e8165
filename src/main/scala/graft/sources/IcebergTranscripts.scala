package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Try

/**
 * Iceberg transcript source/sink — the north rule's named table format
 * ("reads Iceberg tables of multi-turn agent transcripts", "every stage
 * checkpoints to Iceberg"). The reference has no table-format story at all
 * (cs562_sdpg reads a live Neo4j and keeps state on the driver); this
 * adapter is the rebuilt, cluster-shaped ingest path.
 *
 * Everything here is plain Spark DataSource-V2 API — `spark.read.table`
 * against a configured catalog, `DataFrameWriterV2` (`df.writeTo`) with
 * partition transforms — so it compiles with no Iceberg dependency and
 * works unchanged against any V2 catalog. The Iceberg runtime jar
 * (`iceberg-spark-runtime`) plus the catalog config from [[catalogConf]]
 * is all a cluster deployment adds.
 *
 * NOT integration-testable in this sandbox: `/opt/spark/jars` carries no
 * Iceberg runtime and there is no egress to fetch one ([[available]]
 * reports this honestly and is asserted false in tests). The pure pieces —
 * catalog config keys, contract projection (shared with
 * [[JdbcTranscripts.toContract]]), option plumbing for time travel and
 * incremental scans — are unit-tested. The Parquet checkpoint layout in
 * `graft.checkpoint.Checkpoint` (immutable stage dirs + manifest + atomic
 * pointer commit) maps 1:1 onto Iceberg's snapshot/manifest model, so the
 * durable-state story does not fork between the two backends.
 */
object IcebergTranscripts {

  /**
   * Spark-conf entries that register an Iceberg catalog named `catalog`.
   * Apply at session build (`.config(k, v)` per entry) or spark-submit
   * `--conf`. `catalogType` "hadoop" points at a warehouse path (tests,
   * object stores); "hive"/"rest" target a metastore/REST catalog, with
   * `warehouse` passed through as the catalog's warehouse location.
   */
  def catalogConf(catalog: String, warehouse: String,
                  catalogType: String = "hadoop"): Map[String, String] = Map(
    s"spark.sql.catalog.$catalog" -> "org.apache.iceberg.spark.SparkCatalog",
    s"spark.sql.catalog.$catalog.type" -> catalogType,
    s"spark.sql.catalog.$catalog.warehouse" -> warehouse,
    "spark.sql.extensions" ->
      "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")

  /** True iff the Iceberg Spark runtime is on this session's classpath —
    * false in this sandbox; the read/write paths require it at runtime. */
  def available: Boolean =
    Try(Class.forName("org.apache.iceberg.spark.SparkCatalog")).isSuccess

  /**
   * Read a transcript table (`catalog.db.table`) into the pinned contract
   * schema. `snapshotId`/`asOfTimestampMs` select a historical snapshot
   * (time travel — resume-from-lineage reads the snapshot a checkpoint
   * recorded, not "current"); `startSnapshotId`(+`endSnapshotId`) switches
   * to an INCREMENTAL append scan, the Iceberg-native form of
   * `graft.pipeline.Incremental`'s directory diffing: only files committed
   * after the start snapshot are scanned — O(increment), not O(table).
   */
  def read(spark: SparkSession, table: String,
           snapshotId: Option[Long] = None,
           asOfTimestampMs: Option[Long] = None,
           startSnapshotId: Option[Long] = None,
           endSnapshotId: Option[Long] = None): DataFrame = {
    require(available,
      "Iceberg runtime not on classpath: deploy iceberg-spark-runtime and " +
        s"session configs ${catalogConf("<catalog>", "<warehouse>").keys.mkString(", ")}")
    val opts = readOptions(snapshotId, asOfTimestampMs, startSnapshotId, endSnapshotId)
    JdbcTranscripts.toContract(spark.read.options(opts).table(table))
  }

  /** The Iceberg scan options for the given selection — split out so the
    * option plumbing is unit-testable without the runtime jar. */
  def readOptions(snapshotId: Option[Long] = None,
                  asOfTimestampMs: Option[Long] = None,
                  startSnapshotId: Option[Long] = None,
                  endSnapshotId: Option[Long] = None): Map[String, String] = {
    require(snapshotId.isEmpty || asOfTimestampMs.isEmpty,
      "snapshotId and asOfTimestampMs are mutually exclusive")
    require(endSnapshotId.isEmpty || startSnapshotId.nonEmpty,
      "endSnapshotId requires startSnapshotId (incremental scan bounds)")
    require(startSnapshotId.isEmpty || (snapshotId.isEmpty && asOfTimestampMs.isEmpty),
      "incremental scan and time travel are mutually exclusive")
    Map.empty[String, String] ++
      snapshotId.map("snapshot-id" -> _.toString) ++
      asOfTimestampMs.map("as-of-timestamp" -> _.toString) ++
      startSnapshotId.map("start-snapshot-id" -> _.toString) ++
      endSnapshotId.map("end-snapshot-id" -> _.toString)
  }

  /**
   * Stage sink: create-or-replace `table` from `df`, bucket-partitioned on
   * `bucketCol` — the write-side analog of the checkpoint module's
   * hash-bucketed merge state (a merge touching one bucket rewrites one
   * partition's files; Iceberg's commit makes the swap atomic, replacing
   * the manifest + pointer-rename machinery `Checkpoint` hand-rolls on
   * plain parquet). Appends (`replace = false`) are the incremental-commit
   * form; readers pick them up via [[read]]'s `startSnapshotId`.
   */
  def writeStage(df: DataFrame, table: String, bucketCol: String,
                 numBuckets: Int = 64, replace: Boolean = true): Unit = {
    require(available, "Iceberg runtime not on classpath (see writeStage scaladoc)")
    import org.apache.spark.sql.functions.{bucket, col}
    // partitionedBy is a create-time property; appends inherit the table's
    if (replace) df.writeTo(table).partitionedBy(bucket(numBuckets, col(bucketCol))).createOrReplace()
    else df.writeTo(table).append()
  }
}
