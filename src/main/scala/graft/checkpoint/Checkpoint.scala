package graft.checkpoint

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Stage checkpointing with per-partition lineage + metrics, and
 * resume-if-exists semantics — on the Hadoop FileSystem API, so stages and
 * resume work identically on file:, hdfs:, s3a:, gs: (at 100 TB the
 * checkpoints live in object storage by definition; `java.nio` would pin
 * this to the local disk of one node).
 *
 * Reference analog: the incremental pipeline's resume gates — Java
 * serialization of a driver LinkedHashMap plus a Parquet overwrite of merged
 * patterns (cs562_sdpg `src2/main/scala/Main.scala:37-50,103-113,178-202`).
 * Rebuilt as: every stage is a partitioned Parquet table (Iceberg-layout
 * compatible) + a `_metrics.json` sidecar recording row counts per file
 * (the per-partition lineage required by the north rule). Row counts come
 * from the Parquet FOOTERS, not a second data scan. Files prefixed `_` are
 * ignored by Spark/Iceberg readers, so the sidecar lives inside the stage
 * directory.
 *
 * Resume = if the stage directory has a `_SUCCESS` marker and a metrics
 * sidecar, read it instead of recomputing — a killed job restarts
 * mid-pipeline and only recomputes the stage it died in. Idempotent because
 * every stage in this engine is deterministic (seeded hashes only,
 * SURVEY.md §7 hard-part #4).
 *
 * Incremental state ([[mergeIncrement]]) is VERSIONED: each merge writes a
 * fresh `v_<n>` directory and commits it by atomically replacing a tiny
 * `_current` pointer file — the previous version stays intact until the new
 * one is fully written, so a crash at ANY point leaves a readable committed
 * state (the round-1 layout overwrote the state dir in place; a crash
 * mid-overwrite silently dropped all previously accumulated increments).
 */
object Checkpoint {

  final case class StageMetrics(stage: String, rows: Long, files: Int, bytes: Long)

  def stagePath(dir: String, name: String): String = s"$dir/$name"

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  private def fsFor(p: String, conf: Configuration): FileSystem =
    new Path(p).getFileSystem(conf)

  def isComplete(spark: SparkSession, dir: String, name: String): Boolean = {
    val p = stagePath(dir, name)
    val fs = fsFor(p, hadoopConf(spark))
    fs.exists(new Path(p, "_SUCCESS")) && fs.exists(new Path(p, "_metrics.json"))
  }

  /**
   * Run (or resume) a stage. `partitionCols` buckets the output so downstream
   * resume reads are partition-pruned (reference gap: its .ser blob had no
   * pruning; SURVEY.md §7 stage 7).
   */
  def stage(spark: SparkSession, dir: String, name: String,
            partitionCols: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    val p = stagePath(dir, name)
    if (!isComplete(spark, dir, name)) {
      val df = compute
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(p)
      writeMetrics(spark, name, p, p)
    }
    spark.read.parquet(p)
  }

  /** Per-partition lineage from the Parquet footers of the materialized
    * stage (metadata-only — no second scan of the data). `dataPath` is where
    * the parquet files live; the sidecar is written to `sidecarDir`. */
  def writeMetrics(spark: SparkSession, name: String,
                   dataPath: String, sidecarDir: String): Unit = {
    val conf = hadoopConf(spark)
    val fs = fsFor(dataPath, conf)
    val files = listParquetFiles(fs, new Path(dataPath))
    val perFile = files.map { st =>
      (relative(st.getPath.toString, dataPath), footerRowCount(st, conf), st.getLen)
    }.sortBy(_._1)
    val total = perFile.map(_._2).sum
    val bytes = perFile.map(_._3).sum
    val parts = perFile.map { case (f, r, _) =>
      s"""{"file":${jsonStr(f)},"rows":$r}"""
    }.mkString("[", ",", "]")
    val json = s"""{"stage":${jsonStr(name)},"rows":$total,"files":${perFile.length},""" +
      s""""bytes":$bytes,"partitions":$parts}"""
    writeString(fs, new Path(sidecarDir, "_metrics.json"), json)
  }

  private def listParquetFiles(fs: FileSystem, root: Path): Seq[FileStatus] = {
    val out = Seq.newBuilder[FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) out += st
    }
    out.result()
  }

  private def footerRowCount(st: FileStatus, conf: Configuration): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getRecordCount finally reader.close()
  }

  private def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def relative(file: String, base: String): String = {
    val i = file.indexOf(base.stripPrefix("file:"))
    if (i >= 0) file.substring(i + base.stripPrefix("file:").length).stripPrefix("/")
    else file
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Read a stage's recorded row count without touching the data (used by
    * resume validation and tests). */
  def recordedRows(spark: SparkSession, dir: String, name: String): Option[Long] = {
    val p = stagePath(dir, name)
    val fs = fsFor(p, hadoopConf(spark))
    val mp = new Path(p, "_metrics.json")
    if (!fs.exists(mp)) None
    else """"rows":(\d+)""".r.findFirstMatchIn(readString(fs, mp)).map(_.group(1).toLong)
  }

  // ---- versioned incremental state ----

  private val VersionRe = "v_(\\d{5})".r

  private def committedVersion(fs: FileSystem, root: Path): Option[Int] = {
    val pointer = new Path(root, "_current")
    if (fs.exists(pointer)) {
      val v = readString(fs, pointer).trim
      v match {
        case VersionRe(n) if fs.exists(new Path(new Path(root, v), "_SUCCESS")) =>
          Some(n.toInt)
        case _ =>
          throw new IllegalStateException(
            s"$root/_current points at '$v' which is not a committed version")
      }
    } else {
      // pointer missing: recover from the highest fully-written version, if
      // any (a crash can only lose the pointer between two committed
      // versions where the newer is a superset of the older — merge is a
      // monotone union-dedup — so the highest complete version is correct).
      val complete = listVersions(fs, root)
      if (complete.nonEmpty)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          f"Checkpoint: $root has committed versions but no _current pointer " +
            f"(crash during commit?); recovering to v_${complete.max}%05d")
      complete.maxOption
    }
  }

  private def listVersions(fs: FileSystem, root: Path): Seq[Int] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case VersionRe(n) if fs.exists(new Path(st.getPath, "_SUCCESS")) => Some(n.toInt)
          case _ => None
        }
    }.flatten

  /** Resolve the committed data path of a merged state table. */
  def mergedPath(spark: SparkSession, dir: String, name: String): Option[String] = {
    val root = new Path(stagePath(dir, name))
    val fs = root.getFileSystem(hadoopConf(spark))
    committedVersion(fs, root).map(v => new Path(root, f"v_$v%05d").toString)
  }

  /** Read the committed state of a merged table. */
  def readMerged(spark: SparkSession, dir: String, name: String): DataFrame =
    mergedPath(spark, dir, name) match {
      case Some(p) => spark.read.parquet(p)
      case None => throw new IllegalStateException(
        s"no committed state for merge table ${stagePath(dir, name)}")
    }

  /**
   * Idempotent incremental merge (reference E1, `Main.scala:103-113`):
   * new increment ∪ committed state, value-deduplicated, committed as a NEW
   * version + atomic pointer swap. The previous version survives until the
   * new one is fully committed, so there is no crash window that loses
   * accumulated state. Old versions beyond the previous one are pruned.
   */
  def mergeIncrement(spark: SparkSession, dir: String, name: String,
                     increment: DataFrame, keyCols: Seq[String]): DataFrame = {
    val root = new Path(stagePath(dir, name))
    val fs = root.getFileSystem(hadoopConf(spark))
    val current = committedVersion(fs, root)
    val merged = current match {
      case Some(v) =>
        spark.read.parquet(new Path(root, f"v_$v%05d").toString)
          .unionByName(increment).dropDuplicates(keyCols)
      case None => increment.dropDuplicates(keyCols)
    }
    val next = current.getOrElse(0) + 1
    val nextName = f"v_$next%05d"
    val nextPath = new Path(root, nextName)
    merged.write.mode("overwrite").parquet(nextPath.toString)
    require(fs.exists(new Path(nextPath, "_SUCCESS")),
      s"merge write of $nextPath did not produce _SUCCESS")
    writeMetrics(spark, name, nextPath.toString, root.toString)
    // commit: replace the pointer via write-temp-then-rename (rename of a
    // file is atomic on HDFS and posix file:; on object stores the pointer
    // is a single small object so the swap is still all-or-nothing)
    val tmp = new Path(root, "_current.tmp")
    writeString(fs, tmp, nextName)
    fs.delete(new Path(root, "_current"), false)
    if (!fs.rename(tmp, new Path(root, "_current")))
      throw new IllegalStateException(s"failed to commit pointer for $nextPath")
    // prune versions older than the previous committed one
    listVersions(fs, root).filter(v => v < next - 1).foreach { v =>
      fs.delete(new Path(root, f"v_$v%05d"), true)
    }
    spark.read.parquet(nextPath.toString)
  }
}
