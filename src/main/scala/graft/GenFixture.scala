package graft

import org.apache.spark.sql.SparkSession
import graft.fixtures.TranscriptGen

/** Dev tool: materialize a synthetic transcript fixture for BenchKG runs.
  * args: <nConvs> <outDir> [files] */
object GenFixture {
  def main(args: Array[String]): Unit = {
    val nConvs = args(0).toLong
    val out = args(1)
    val files = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder().master("local[16]")
      .appName("graft-genfixture")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TranscriptGen.transcripts(spark, nConvs)
      .repartition(files, org.apache.spark.sql.functions.col("conv_id"))
      .write.mode("overwrite").parquet(s"$out/transcripts")
    println(s"[genfixture] wrote $out/transcripts")
    spark.stop()
  }
}
