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
    // Task-metric listener: separates "host stole the cpu" (wall >> runTime)
    // from "the engine did more work" (runTime/cpuTime/GC grew). Counters
    // are cumulative; each trial reports the delta.
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuMs.addAndGet(m.executorCpuTime / 1000000L)
          gcMs.addAndGet(m.jvmGCTime)
        }
      }
    })
    // BENCHQ_PLAN=1: after each trial, print the operator census of the
    // EXECUTED plan (post-AQE — shows the join strategies and exchange
    // reuse the run actually got, which can differ between trials)
    val showPlan = sys.env.get("BENCHQ_PLAN").contains("1")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val walls = (1 to trials).map { _ =>
        spark.catalog.clearCache()
        val (r0, c0, g0) = (runMs.get, cpuMs.get, gcMs.get)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
          .select(sum(pmod(xxhash64(struct(col("*"))), lit(1000000007L))).as("_force"))
        df.head()
        val wall = (System.nanoTime() - t0) / 1e9
        if (showPlan) {
          val census = scala.collection.mutable.LinkedHashMap.empty[String, Int]
          def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
            val n = p.getClass.getSimpleName
            census(n) = census.getOrElse(n, 0) + 1
            p.children.foreach(walk)
            p match {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                walk(a.executedPlan)
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                walk(q.plan)
              case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => ()
              case _ => ()
            }
          }
          walk(df.queryExecution.executedPlan)
          println(s"BENCHQ_PLAN $name " + census.filter { case (k, _) =>
            k.contains("Join") || k.contains("Exchange") || k.contains("Aggregate") ||
              k.contains("Generate") || k.contains("Scan")
          }.map { case (k, v) => s"$k=$v" }.mkString(","))
        }
        // listener events drain asynchronously; poll until the counters
        // stop moving (bounded at 2s) — a fixed sleep let late onTaskEnd
        // events from heavy stages leak into the NEXT trial's attribution
        var stableFor = 0; var lastSeen = (runMs.get, cpuMs.get, gcMs.get)
        var waited = 0
        while (stableFor < 2 && waited < 20) {
          Thread.sleep(100); waited += 1
          val now = (runMs.get, cpuMs.get, gcMs.get)
          if (now == lastSeen) stableFor += 1 else { stableFor = 0; lastSeen = now }
        }
        (wall, (runMs.get - r0) / 1e3, (cpuMs.get - c0) / 1e3, (gcMs.get - g0) / 1e3)
      }
      val ts = walls.map { case (w, r, c, g) =>
        f"{wall:$w%.2f,run:$r%.1f,cpu:$c%.1f,gc:$g%.1f}"
      }.mkString(",")
      println(f"BENCHQ $name trials=[$ts] best=${walls.map(_._1).min}%.2f load1=${load1}")
    }
    spark.stop()
  }
}
