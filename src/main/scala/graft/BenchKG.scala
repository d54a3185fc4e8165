package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.KGPipeline

/** Diagnostic: per-stage wall breakdown of the KG pipeline.
  * args: <threads> <fixtureDir> [cache|nocache|pipeline] [shufflePartitions] [trials] */
object BenchKG {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val fixture = args(1)
    val mode = if (args.length < 3) "cache" else args(2)
    val useCache = mode == "cache"
    val parts = if (args.length > 3) args(3).toInt else 64
    val trials = if (args.length > 4) args(4).toInt else 3
    val builder = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-bench-kg")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (sys.env.contains("GRAFT_NO_INFER_GEN"))
      builder.config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    // cluster-posture knobs via env -> spark.graft.* confs -> Config
    // (e.g. GRAFT_CC_RELIABLE_EVERY=3 GRAFT_CC_DIR=target/ccbench measures
    // the durable-CC checkpoint overhead at bench scale, CC-only)
    sys.env.get("GRAFT_CC_RELIABLE_EVERY")
      .foreach(v => builder.config("spark.graft.ccReliableEvery", v))
    sys.env.get("GRAFT_CC_DIR")
      .foreach(v => builder.config("spark.graft.ccRoundsDir", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "probe2") {
      // EXACT replica of Bench.cpuProbe (xxhash64∘sha2 over 2M rows) so a
      // standalone run is comparable to the per-trial hw_probe_sec history
      // in BENCH_r*.json (round-4 t32 reference: 0.27-0.34 s)
      for (i <- 1 to trials) {
        val t0 = System.nanoTime()
        spark.range(0, 2000000L, 1, spark.sparkContext.defaultParallelism * 4)
          .select(sum(pmod(xxhash64(sha2(col("id").cast("string"), 256)), lit(1000000007L))).as("s"))
          .head()
        println(f"[probe2] threads=$threads trial=$i wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.stop()
      return
    }
    if (mode == "probe") {
      // workload-representative hardware probe: string materialization +
      // regex + shuffle-free agg, same op mix as extraction (memory-bandwidth
      // bound, unlike a cache-resident hash loop)
      for (i <- 1 to trials) {
        val t0 = System.nanoTime()
        spark.range(0, 6000000L, 1, threads * 4)
          .select(concat(lit("conv_"), lpad((col("id") % 1000000).cast("string"), 8, "0"),
            lit(" works at Acme Corp in Springfield today.")).as("s"))
          .select(sum(length(regexp_replace(lower(col("s")), "[^a-z0-9 ]", ""))).as("n"))
          .head()
        println(f"[probe] threads=$threads trial=$i wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop()
      return
    }
    if (mode == "pipeline") {
      // exactly what Bench's scaling pair times: full pipeline count
      val tr = spark.read.parquet(s"$fixture/transcripts")
      tr.count()
      val cfg = KGPipeline.Config.fromSession(spark)
      // per-trial executor-side totals (spill is the first thing to check
      // when a 10x fixture runs superlinear): reset at trial start
      val mSpillMem = new java.util.concurrent.atomic.AtomicLong
      val mSpillDisk = new java.util.concurrent.atomic.AtomicLong
      val mShufWrite = new java.util.concurrent.atomic.AtomicLong
      val mGcMs = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            mSpillMem.addAndGet(m.memoryBytesSpilled)
            mSpillDisk.addAndGet(m.diskBytesSpilled)
            mShufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            mGcMs.addAndGet(m.jvmGCTime)
          }
        }
      })
      for (i <- 1 to trials) {
        mSpillMem.set(0); mSpillDisk.set(0); mShufWrite.set(0); mGcMs.set(0)
        val t0 = System.nanoTime()
        val result = KGPipeline.run(spark, tr, cfg)
        val t1 = System.nanoTime()
        val triples = result.canonicalTriples.count()
        val t2 = System.nanoTime()
        // peak executor memory (local mode: executor == this JVM) — max of
        // per-pool peak heap usage since last reset, the endurance-run metric
        import scala.jdk.CollectionConverters._
        val peakHeap = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
          .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
          .map(_.getPeakUsage.getUsed).sum
        println(f"[pipeline] threads=$threads parts=$parts trial=$i " +
          f"wall=${(t2 - t0) / 1e9}%.2f s triples=$triples " +
          f"(construct+cc=${(t1 - t0) / 1e9}%.2f canonical=${(t2 - t1) / 1e9}%.2f) " +
          f"peakHeapGiB=${peakHeap / 1073741824.0}%.2f " +
          f"spillMemGiB=${mSpillMem.get / 1073741824.0}%.2f " +
          f"spillDiskGiB=${mSpillDisk.get / 1073741824.0}%.2f " +
          f"shufWriteGiB=${mShufWrite.get / 1073741824.0}%.2f " +
          f"gcSec=${mGcMs.get / 1000.0}%.1f")
        java.lang.management.ManagementFactory.getMemoryPoolMXBeans
          .asScala.foreach(p => try p.resetPeakUsage() catch { case _: Throwable => () })
        // each trial must pay the full pipeline: Spark's CacheManager matches
        // identical plans across trials and would serve trial 2+ from cache
        spark.catalog.clearCache()
        if (i == trials && sys.env.contains("GRAFT_EXPLAIN"))
          println(result.canonicalTriples.queryExecution.executedPlan.toString.take(6000))
      }
      spark.stop()
      return
    }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tr = spark.read.parquet(s"$fixture/transcripts")
    t("count-input") { tr.count() }
    val turns = graft.ingest.Transcripts.stableTurns(tr)
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(length(col("text"))) + sum(length(col("role")))).head().getLong(0)
    // V1: inline window row_number (Spark 4 plans WindowGroupLimit)
    val v1 = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("conv_id", "turn_idx").orderBy(col("ts"), col("text"))
      tr.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    }
    // V2: the shipped stableTurns — SAME window shape as V1 (it replaced an
    // earlier min_by(struct) variant after this bench showed the window wins)
    val v2 = graft.ingest.Transcripts.stableTurns(tr)
    // V3: scalar two-phase (min ts, then min text-hash) + dropDuplicates
    val v3 = {
      val k = Seq("conv_id", "turn_idx")
      val minTs = tr.groupBy(k.map(col): _*).agg(min(col("ts")).as("_mts"))
      val c1 = tr.join(minTs, k).filter(col("ts") === col("_mts"))
      val minH = c1.groupBy(k.map(col): _*).agg(min(xxhash64(col("text"))).as("_mh"))
      c1.join(minH, k).filter(xxhash64(col("text")) === col("_mh"))
        .dropDuplicates(k).drop("_mts", "_mh")
    }
    t("v1-window-inline") { force(v1) }
    t("v2-stableTurns") { force(v2) }
    t("v3-scalar-2phase") { force(v3) }
    t("extract-no-dedup") { graft.extract.Extraction.triplesRaw(tr).count() }
    t("extract-composed-nocache") { graft.extract.Extraction.triplesRaw(turns).count() }
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
