package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.KGPipeline

/** Diagnostic: per-stage wall breakdown of the KG pipeline.
  * args: <threads> <fixtureDir> [cache|nocache] */
object BenchKG {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val fixture = args(1)
    val useCache = args.length < 3 || args(2) == "cache"
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-bench-kg")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tr = spark.read.parquet(s"$fixture/transcripts")
    t("count-input") { tr.count() }
    val turns = graft.ingest.Transcripts.stableTurns(tr)
    val raw0 = graft.extract.Extraction.triplesRaw(turns)
    val raw = if (useCache) raw0.cache() else raw0
    t("extract+count") { raw.count() }
    val mentions0 = graft.extract.Extraction.mentions(raw)
      .withColumn("shingles", graft.link.MinHashBlocking.shingles(col("norm"), 3))
    val mentions = if (useCache) mentions0.cache() else mentions0
    t("mentions") { mentions.count() }
    val pairs = t("pairs") {
      val p = graft.link.MinHashBlocking.candidatePairs(
        mentions, "mention_id", "shingles", 0.6, extraKey = Seq("mention_type"))
      p.count(); p
    }
    val entities0 = graft.link.Canonicalize.entities(mentions.drop("shingles"), pairs)
    val entities = if (useCache) entities0.cache() else entities0
    t("entities(cc)") { entities.count() }
    val canon = graft.link.Canonicalize.canonicalTriples(raw, entities)
    t("canonical-join+count") { canon.count() }
    spark.stop()
  }
}
