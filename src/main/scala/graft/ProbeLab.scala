package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: which expression classes scale with local[k] threads on
  * this box? Variants share one JVM; sessions are recreated per thread
  * count (new SparkContext each time). */
object ProbeLab {
  def main(args: Array[String]): Unit = {
    val rows = 4000000L
    for (threads <- Seq(1, 4, 8)) {
      val spark = SparkSession.builder().master(s"local[$threads]")
        .appName(s"probe-$threads")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def base = spark.range(0, rows, 1, threads * 4)
        .select(concat(lit("conv_"), lpad((col("id") % 1000000).cast("string"), 8, "0"),
          lit(" works at Acme Corp in Springfield today.")).as("s"))
      val variants: Seq[(String, () => Any)] = Seq(
        "hash" -> (() => spark.range(0, rows, 1, threads * 4)
          .select(sum(pmod(xxhash64(sha2(col("id").cast("string"), 256)), lit(1000000007L))))
          .head()),
        "stralloc" -> (() => base
          .select(sum(length(lower(concat(col("s"), col("s"))))).as("n")).head()),
        "contains+substr" -> (() => base
          .select(sum(when(col("s").contains(" works at "),
            length(substring_index(col("s"), " works at ", 1))).otherwise(0)).as("n")).head()),
        "rlike" -> (() => base
          .select(sum(when(col("s").rlike("^(.{1,128}?) works at (.{1,128}?)\\.$"), 1)
            .otherwise(0)).as("n")).head()),
        "regex_replace" -> (() => base
          .select(sum(length(regexp_replace(lower(col("s")), "[^a-z0-9 ]", ""))).as("n")).head())
      )
      for ((name, f) <- variants; trial <- 1 to 2) {
        val t0 = System.nanoTime()
        f()
        println(f"[lab] threads=$threads $name%-16s trial=$trial wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop()
    }
  }
}
