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
 *  3. scaling evidence: the SAME pipeline + input at two parallelism levels
 *     (no real cluster in this sandbox; thread counts stand in for N vs 4N
 *     executors per BASELINE.md), reporting throughput at both and
 *     efficiency = (thr_4N / thr_N) / 4.
 *
 * Budget discipline (round-3 postmortem: the driver's bench timed out,
 * rc=124, and the round lost its independent artifact): the run operates
 * under a wall-clock budget and ALWAYS emits a parsable line.
 *  - `SPARK_GRAFT_BENCH_BUDGET_SEC` (default 1380) is checked between
 *    queries and between trials; when the remaining budget can't cover a
 *    trial's estimated wall, that trial is skipped — trials-per-level
 *    degrade first, then whole levels, never the emit.
 *  - `SPARK_GRAFT_BENCH_TRIALS` (default 3) caps trials per level; the
 *    minimum viable set (1 trial at full threads for the kg headline, 1 at
 *    each primary-pair level for scaling) runs FIRST, extra trials only
 *    spend leftover budget.
 *  - The JSON line is CHECKPOINTED throughout the run (after each 8-query
 *    batch and after every trial, `"partial":true`, last-line-wins) and
 *    printed a final time with `"partial":false` on completion, plus a JVM
 *    shutdown hook as backstop. Checkpointing is what makes a kill
 *    survivable DETERMINISTICALLY: a SIGTERM from an external `timeout`
 *    races the parent sbt's output pump against the forked JVM's shutdown
 *    hook (round-4 kill test lost the hook's line that way) — with
 *    checkpoints the latest section-complete line is already in the
 *    captured output before the kill lands. `tools/bench_kill_test.sh`
 *    asserts this end-to-end.
 */
object Bench {

  // ---- incrementally-built section state (read by the shutdown hook) ----
  private val queryTimes = new java.util.concurrent.ConcurrentHashMap[String, Double]()
  private val errors = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val skipped = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // level -> trials of (wallSec, hwProbeSec, hostLoad1)
  private val allTrials =
    new java.util.concurrent.ConcurrentHashMap[String, List[(Double, Double, Double)]]()
  private val levelOrder = new java.util.concurrent.CopyOnWriteArrayList[String]()
  @volatile private var sfDirSeen: String = ""
  // fixture label ("big" | "small") -> (turns, triples)
  private val fixtureCounts =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  // tracks the small-fixture parquet WRITE itself (not whether a small
  // trial has run): extra-trial rounds may use an existing fixture even
  // when both initial small trials were unaffordable
  @volatile private var smallFixtureWritten: Boolean = false
  @volatile private var complete: Boolean = false
  private val emitted = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  /** Build the JSON line from whatever state exists right now. */
  private def buildJson(): String = {
    import scala.jdk.CollectionConverters._
    val qs = queryTimes.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    val errJson = errors.asScala.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skipJson = skipped.asScala.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = queryTimes.asScala.values.filter(_ >= 0).sum

    def trialsOf(level: String): List[(Double, Double, Double)] =
      Option(allTrials.get(level)).getOrElse(Nil)
    def bestWall(level: String): Option[Double] =
      trialsOf(level).map(_._1).minOption
    def bestHw(level: String): Option[Double] =
      trialsOf(level).map(_._2).minOption

    val trialsJson = levelOrder.asScala.map { level =>
      "\"" + level + "\":" + trialsOf(level).reverse.map { case (w, hw, l) =>
        s"""{"wall_sec":${jnum(w)},"hw_probe_sec":${jnum(hw)},"host_load1":${jnum(l)}}"""
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")

    def pairJson(lowLevel: String, highLevel: String, lowT: Int, highT: Int,
                 fixture: String): (String, Option[Double]) = {
      (bestWall(lowLevel), bestWall(highLevel), Option(fixtureCounts.get(fixture))) match {
        case (Some(wl), Some(wh), Some((_, triples))) =>
          val factor = highT.toDouble / lowT
          val eff = (wl / wh) / factor
          val hwEff = (for { hl <- bestHw(lowLevel); hh <- bestHw(highLevel) }
            yield (hl / hh) / factor).getOrElse(Double.NaN)
          (s"""{"threads_low":$lowT,"threads_high":$highT,"fixture":"$fixture",""" +
            s""""wall_low_sec":${jnum(wl)},"wall_high_sec":${jnum(wh)},""" +
            s""""triples_per_sec_low":${jnum(triples / wl)},"triples_per_sec_high":${jnum(triples / wh)},""" +
            s""""efficiency":${jnum(eff)},"hw_cpu_efficiency":${jnum(hwEff)},""" +
            s""""efficiency_vs_hw":${jnum(eff / hwEff)}}""", Some(eff))
        case _ => ("null", None)
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // primary pair on the big fixture; if the host was too loaded to afford
    // big 2-thread trials, the SMALL-fixture pair is the fallback evidence
    val (pairBig, effBig) = pairJson("t2_p16", "t8_p16", 2, 8, "big")
    val (pairSmall, effSmall) = pairJson("t2s_p16", "t8s_p16", 2, 8, "small")
    val (pairPrimary, effPrimary) =
      if (effBig.isDefined) (pairBig, effBig) else (pairSmall, effSmall)
    val (pairWide, _) = pairJson("t8_p64", s"t${cpus}_p64", 8, cpus, "big")

    val kg = (bestWall(s"t${cpus}_p64"), Option(fixtureCounts.get("big"))) match {
      case (Some(w), Some((turns, triples))) =>
        s"""{"turns":$turns,"triples":$triples,"wall_sec":${jnum(w)},""" +
          s""""turns_per_sec":${jnum(turns / w)},"triples_per_sec":${jnum(triples / w)}}"""
      case _ => "null"
    }
    val scaling =
      s"""{"efficiency":${effPrimary.map(jnum).getOrElse("null")},""" +
        s""""primary_pair":$pairPrimary,"wide_pair":$pairWide,""" +
        s""""host_load1_end":${jnum(load1)},"trials":$trialsJson}"""
    s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,""" +
      s""""errors":$errJson,"skipped":$skipJson,"partial":${!complete},""" +
      s""""sf":"$sfDirSeen","kg":$kg,"scaling":$scaling}"""
  }

  private def emit(): Unit =
    if (emitted.compareAndSet(false, true)) { println(buildJson()); System.out.flush() }

  /** Checkpoint emission: print the CURRENT state line mid-run (marked
    * `"partial":true`), last-line-wins for any parser that scans the output.
    *
    * Why (round-4 kill test, `tools/bench_kill_test.sh`): with only a
    * shutdown-hook emit, `timeout -s TERM` on the sbt parent is a RACE —
    * sbt's output pump can die before the forked JVM's hook output crosses
    * the pipe (observed: the hook line was lost; round 3's driver tail shows
    * the same race going the other way, child shutdown stderr captured).
    * Checkpointing after each query batch and every trial means the latest
    * section-complete line is already in the captured output BEFORE any
    * kill, deterministically. A successful run still ends with the one
    * `"partial":false` line printed last. Each line also lands in
    * `target/bench_last.json` for local forensics. */
  private def checkpoint(): Unit = {
    val line = buildJson()
    println(line); System.out.flush()
    try {
      val p = java.nio.file.Paths.get("target/bench_last.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, line + "\n")
    } catch { case _: Throwable => () }
  }

  private def load1: Double =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble).getOrElse(-1.0)

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

  /** Pure-CPU Spark job (fixed work, no shuffle): measures what the box
    * itself scales to at the session's thread count. */
  private def cpuProbe(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    // 2M rows: big enough to separate host-vs-engine scaling, small enough
    // that the probe itself doesn't eat the budget on a degraded host
    spark.range(0, 2000000L, 1, spark.sparkContext.defaultParallelism * 4)
      .select(sum(pmod(xxhash64(sha2(col("id").cast("string"), 256)), lit(1000000007L))).as("s"))
      .head()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1380").toDouble
    val maxTrials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt
    def remaining: Double = budgetSec - (System.nanoTime() - t0) / 1e9

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sfDirSeen = sfDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // fixture size scaled to the harness SF (sf0.1 -> ~180k convs ~2M turns)
    val nConvs: Long =
      if (sfDir.contains("0.1")) 180000L
      else if (sfDir.contains("0.01")) 18000L
      else 2000L

    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(), "bench-emit"))

    // ---- section 1: headline queries ----
    // Forcing: hash EVERY output column into a bounded sum — .count() lets
    // Catalyst prune unevaluated projections, so pure per-row selects would
    // time a row count, not their expressions. pmod bounds the sum (ANSI
    // long-overflow throws). A failed query records -1 and lands in
    // "errors"; a budget-skipped query records -2 and lands in "skipped"
    // instead of silently reporting a fast timing.
    val spark = session(cpus, cpus)
    var sinceCheckpoint = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      import org.apache.spark.sql.functions._
      // reserve ~half the budget for the kg/scaling sections; individual
      // headline queries are <=20s quiet, so this only trips on a
      // pathologically loaded host
      if (remaining < math.max(60.0, budgetSec * 0.45)) {
        skipped.add(name); queryTimes.put(name, -2.0)
      } else {
        val q0 = System.nanoTime()
        val ok = try {
          fn(spark, sfDir)
            .select(sum(pmod(xxhash64(struct(col("*"))), lit(1000000007L))).as("_force"))
            .head()
          true
        } catch { case e: Throwable =>
          System.err.println(s"bench query $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          errors.add(name)
          false
        }
        queryTimes.put(name, if (ok) (System.nanoTime() - q0) / 1e9 else -1.0)
        sinceCheckpoint += 1
        // a kill mid-section loses at most 8 queries of recorded data
        if (sinceCheckpoint >= 8) { checkpoint(); sinceCheckpoint = 0 }
      }
    }
    checkpoint()

    // ---- section 2: KG throughput fixture (big, compute-bound) ----
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
    // @cpus run serves both as the headline throughput and the wide pair's
    // high side. EVERY trial's wall + hw probe + host load goes into the
    // JSON artifact; the headline is best-of-recorded trials.
    def runTrial(threads: Int, parts: Int, fixture: String = "big"): Double = {
      val level = s"t$threads${if (fixture == "small") "s" else ""}_p$parts"
      if (!levelOrder.contains(level)) levelOrder.add(level)
      val s = session(threads, parts)
      try {
        val (wall, turns, triples) = kgRun(s, s"$fixtureDir/$fixture")
        val hw = cpuProbe(s)
        fixtureCounts.putIfAbsent(fixture, (turns, triples))
        allTrials.merge(level, List((wall, hw, load1)),
          (old, add) => add ::: old)
        checkpoint()
        wall
      } finally s.stop()
    }

    // Cost estimators (seconds) for "can the budget afford this trial?":
    // seeded from the full-thread wall, refined by each level's own best
    // once measured. BEST-of-trials, recomputed at every affordability
    // check: a first trial that lands on a degraded host window (round-4
    // dry run: t32 trial 1 = 297 s under a 26x-slow hw probe, trials 2-3 =
    // 19-22 s) must not permanently poison the derived estimates. At 2
    // threads the fixed work runs on 1/16 the cores but the box scales
    // sub-linearly, hence the conservative x6 (tightened to x4 of the
    // measured 8-thread wall once that level has run).
    val estimate = scala.collection.mutable.Map.empty[String, Double]
    def fullWall: Double = estimate.getOrElse(s"t${cpus}_p64", 120.0)
    def est(level: String, fallback: => Double): Double =
      estimate.getOrElse(level, fallback)
    // 1.6x margin + slack: a started trial cannot be preempted, so an
    // underestimate overshoots the budget by the whole trial (observed 5x
    // on a load-15 host at 2 threads) — the margin is the exit-in-time
    // insurance for the driver's external timeout
    def affordable(level: String, fallback: => Double): Boolean =
      remaining > 1.6 * est(level, fallback) + 30.0
    def tryTrial(threads: Int, parts: Int, fallbackEst: => Double,
                 fixture: String = "big"): Unit = {
      val level = s"t$threads${if (fixture == "small") "s" else ""}_p$parts"
      if (affordable(level, fallbackEst)) {
        val wall = runTrial(threads, parts, fixture)
        estimate(level) = math.min(estimate.getOrElse(level, wall), wall)
        skipped.remove(s"trial:$level")
      } else skipped.add(s"trial:$level")
    }
    // t2's estimate chains off t8's measured wall when available (measured
    // ratio ~3.5x on this box) — much tighter than 6x the 32-thread wall
    def est2: Double = estimate.get("t8_p16").map(4.0 * _).getOrElse(6.0 * fullWall)

    // minimum viable set first: kg headline (full threads), then the
    // primary scaling pair CHEAP SIDE FIRST (t8 refines t2's estimate),
    // then the wide pair's low side — one trial each
    tryTrial(cpus, 64, fallbackEst = 120.0)
    tryTrial(8, 16, fallbackEst = 2.5 * fullWall)
    tryTrial(2, 16, fallbackEst = est2)
    tryTrial(8, 64, fallbackEst = 2.5 * fullWall)

    // scaling fallback: the efficiency criterion is the north rule, so if
    // the host was too loaded to afford the big-fixture 2-thread trial,
    // measure the SAME pair on a 1/8-size fixture instead of reporting
    // nothing — the pair JSON is labeled with the fixture it ran on
    val havePair = allTrials.containsKey("t2_p16") && allTrials.containsKey("t8_p16")
    if (!havePair && remaining > 0.5 * fullWall + 20.0) {
      val sw = session(cpus, 32)
      TranscriptGen.transcripts(sw, nConvs * 6 / 8)
        .repartition(16, org.apache.spark.sql.functions.col("conv_id"))
        .write.mode("overwrite").parquet(s"$fixtureDir/small/transcripts")
      sw.stop()
      smallFixtureWritten = true
      tryTrial(2, 16, fallbackEst = 1.5 * fullWall, fixture = "small")
      tryTrial(8, 16, fallbackEst = 0.6 * fullWall, fixture = "small")
    }

    // leftover budget: extra trials round-robin (cheapest-information-first:
    // the pair levels benefit most from best-of filtering on a noisy host).
    // Fallback estimates are thunks over the CURRENT best walls, and a
    // level the minimum set skipped gets its first trial here once better
    // estimates make it affordable — a loaded early window no longer
    // forfeits the big-fixture pair for the whole run.
    val extraLevels: Seq[(Int, Int, () => Double, String)] =
      Seq((cpus, 64, () => 120.0, "big"), (8, 16, () => 2.5 * fullWall, "big"),
        (2, 16, () => est2, "big"), (8, 64, () => 2.5 * fullWall, "big"),
        (2, 16, () => 1.5 * fullWall, "small"), (8, 16, () => 0.6 * fullWall, "small"))
    var round = 2
    var progressed = true
    while (round <= maxTrials && progressed) {
      progressed = false
      extraLevels.foreach { case (t, p, fb, fx) =>
        val level = s"t$t${if (fx == "small") "s" else ""}_p$p"
        val have = Option(allTrials.get(level)).map(_.size).getOrElse(0)
        // have == 0 only for big-fixture levels the minimum set skipped
        // (small-fixture levels without a fixture write stay skipped)
        val fixtureReady = fx == "big" || smallFixtureWritten
        if (fixtureReady && have < round && affordable(level, fb())) {
          tryTrial(t, p, fb(), fx)
          progressed = true
        }
      }
      round += 1
    }

    complete = true
    emit()
  }
}
