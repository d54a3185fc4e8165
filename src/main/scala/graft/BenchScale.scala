package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.KGPipeline

/**
 * Dedicated N-vs-4N scaling pair on the pre-materialized big bench
 * fixture — `Bench`'s scaling section without the 112-query preamble,
 * so a quiet host window can be hit deliberately. Methodology matches
 * `Bench.runTrial` exactly: identical shuffle partitioning (16) at both
 * levels, default pipeline config, wall = end-to-end KG pipeline to
 * `canonicalTriples.count()`, best-of-`trials`, plus the same pure-CPU
 * hw probe per level so host-vs-engine scaling separates. Usage:
 *   runMain graft.BenchScale [lowThreads] [highThreads] [fixtureDir] [trials]
 */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val low = args.lift(0).map(_.toInt).getOrElse(2)
    val high = args.lift(1).map(_.toInt).getOrElse(8)
    val fixture = args.lift(2).getOrElse("target/bench_fixture/big")
    val trials = args.lift(3).map(_.toInt).getOrElse(3)

    def hwProbe(spark: SparkSession): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 2000000L, 1, spark.sparkContext.defaultParallelism * 4)
        .select(sum(pmod(xxhash64(sha2(col("id").cast("string"), 256)),
          lit(1000000007L))).as("s")).head()
      (System.nanoTime() - t0) / 1e9
    }

    def run(threads: Int): (Double, Double) = {
      val spark = SparkSession.builder()
        .master(s"local[$threads]")
        .appName(s"graft-scale-$threads")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val results = (1 to trials).map { t =>
          val tr = spark.read.parquet(s"$fixture/transcripts")
          val t0 = System.nanoTime()
          val triples = KGPipeline.run(spark, tr).canonicalTriples.count()
          val wall = (System.nanoTime() - t0) / 1e9
          val hw = hwProbe(spark)
          println(f"[scale] threads=$threads trial=$t wall=$wall%.2f s " +
            f"hw_probe=$hw%.2f s triples=$triples")
          (wall, hw)
        }
        (results.map(_._1).min, results.map(_._2).min)
      } finally spark.stop()
    }

    val (tLow, hwLow) = run(low)
    val (tHigh, hwHigh) = run(high)
    val eff = (tLow / tHigh) * low.toDouble / high.toDouble
    val hwEff = (hwLow / hwHigh) * low.toDouble / high.toDouble
    println(f"[scale] best: local[$low]=$tLow%.2f s  local[$high]=$tHigh%.2f s  " +
      f"raw_efficiency=$eff%.3f  hw_efficiency=$hwEff%.3f  " +
      f"vs_hw=${eff / hwEff}%.2f (north rule: raw >= 0.8 at N->4N)")
  }
}
