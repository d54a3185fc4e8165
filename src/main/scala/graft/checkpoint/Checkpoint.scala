package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/**
 * Stage checkpointing with per-partition lineage + metrics, and
 * resume-if-exists semantics.
 *
 * Reference analog: the incremental pipeline's resume gates — Java
 * serialization of a driver LinkedHashMap plus a Parquet overwrite of merged
 * patterns (cs562_sdpg `src2/main/scala/Main.scala:37-50,103-113,178-202`).
 * Rebuilt as: every stage is a partitioned Parquet table (Iceberg-layout
 * compatible) + a `_metrics.json` sidecar recording row counts per file
 * partition (the per-partition lineage required by the north rule). Files
 * prefixed `_` are ignored by Spark/Iceberg readers, so the sidecar lives
 * inside the stage directory.
 *
 * Resume = if the stage directory has a `_SUCCESS` marker and a metrics
 * sidecar, read it instead of recomputing — a killed job restarts
 * mid-pipeline and only recomputes the stage it died in. Idempotent because
 * every stage in this engine is deterministic (seeded hashes only,
 * SURVEY.md §7 hard-part #4).
 */
object Checkpoint {

  final case class StageMetrics(stage: String, rows: Long, files: Int, bytes: Long)

  def stagePath(dir: String, name: String): String = s"$dir/$name"

  def isComplete(dir: String, name: String): Boolean = {
    val p = stagePath(dir, name)
    Files.exists(Paths.get(s"$p/_SUCCESS")) && Files.exists(Paths.get(s"$p/_metrics.json"))
  }

  /**
   * Run (or resume) a stage. `partitionBy` buckets the output so downstream
   * resume reads are partition-pruned (reference gap: its .ser blob had no
   * pruning; SURVEY.md §7 stage 7).
   */
  def stage(spark: SparkSession, dir: String, name: String,
            partitionCols: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    val p = stagePath(dir, name)
    if (!isComplete(dir, name)) {
      val df = compute
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(p)
      writeMetrics(spark, dir, name)
    }
    spark.read.parquet(p)
  }

  /** Per-partition lineage: rows per input file of the materialized stage. */
  def writeMetrics(spark: SparkSession, dir: String, name: String): Unit = {
    val p = stagePath(dir, name)
    val perFile = spark.read.parquet(p)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))
      .collect()
    val total = perFile.map(_.getLong(1)).sum
    val parts = perFile.sortBy(_.getString(0)).map { r =>
      s"""{"file":${jsonStr(relative(r.getString(0), p))},"rows":${r.getLong(1)}}"""
    }.mkString("[", ",", "]")
    val json = s"""{"stage":${jsonStr(name)},"rows":$total,"files":${perFile.length},"partitions":$parts}"""
    Files.writeString(Paths.get(s"$p/_metrics.json"), json)
  }

  private def relative(file: String, base: String): String = {
    val i = file.indexOf(base)
    if (i >= 0) file.substring(i + base.length).stripPrefix("/") else file
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Read a stage's recorded row count without touching the data (used by
    * resume validation and tests). */
  def recordedRows(dir: String, name: String): Option[Long] = {
    val p = Paths.get(s"${stagePath(dir, name)}/_metrics.json")
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      val m = """"rows":(\d+)""".r.findFirstMatchIn(s)
      m.map(_.group(1).toLong)
    }
  }

  /** Idempotent incremental merge (reference E1, `Main.scala:103-113`):
    * new increment ∪ existing stage, value-deduplicated. */
  def mergeIncrement(spark: SparkSession, dir: String, name: String,
                     increment: DataFrame, keyCols: Seq[String]): DataFrame = {
    val p = stagePath(dir, name)
    val merged =
      if (Files.exists(Paths.get(s"$p/_SUCCESS")))
        spark.read.parquet(p).unionByName(increment).dropDuplicates(keyCols)
      else increment.dropDuplicates(keyCols)
    val tmp = s"$p.__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // atomic-ish swap: rewrite target from the temp materialization
    spark.read.parquet(tmp).write.mode("overwrite").parquet(p)
    writeMetrics(spark, dir, name)
    deleteRecursively(Paths.get(tmp))
    spark.read.parquet(p)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
