package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query profiling harness: time named SparkEntry queries for N trials
  * each in ONE session (cache cleared between trials — Spark's CacheManager
  * otherwise silently serves trial 2+ from trial 1's plan cache), printing
  * every trial wall + host load. Diagnoses cross-round per-query moves that
  * the single-shot Bench numbers can't separate from host noise.
  *
  *   sbt "runMain graft.BenchQ <sfDir> q1,q2,... [trials]"
  */
object BenchQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val trials = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchq")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def load1: String = scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0)).getOrElse("-1")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val walls = (1 to trials).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir)
          .select(sum(pmod(xxhash64(struct(col("*"))), lit(1000000007L))).as("_force"))
          .head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHQ $name trials=[${walls.map(w => f"$w%.2f").mkString(",")}] " +
        f"best=${walls.min}%.2f load1=${load1}")
    }
    spark.stop()
  }
}
