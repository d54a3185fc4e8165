package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic: endurance + scaling evidence for the TEXT-DEDUP path (the
  * KG path has `BenchKG` + the sf1 endurance run; the north rule's
  * N-vs-4N criterion deserves measurement on the other production
  * pipeline too). Generates a deterministic planted-duplicate corpus
  * IN-MEMORY (no testdata dependency, any scale), then times the full
  * cleaning chain a 100 TB pretraining run executes:
  *
  *   exact dedup -> MinHash near-dup clusters -> survivors -> shard+shuffle
  *
  * Corpus construction (pure function of id, so every engine/partitioning
  * regenerates it bit-identically): docs live in families of 4; slot 0 is
  * the family head; other slots are exact copies (~25%), near-dups
  * (head + 2 trailing tokens, Jaccard ~0.95 over 3-word shingles; ~25%),
  * or unique docs (~50%). ~60 tokens/doc from a 50k-word vocabulary via
  * xxhash64. Planted truth makes the stage outputs self-checking: exact
  * digests ~= nDocs * (1 - 1/4 * P(exact-slot)), every near-dup must land
  * in its head's cluster, survivor count printed for cross-trial equality.
  *
  * args: <threads> <nDocs> [trials] [shufflePartitions]
  */
object BenchDedup {

  def corpus(spark: SparkSession, nDocs: Long, parts: Int): DataFrame = {
    val kindHash = pmod(xxhash64(col("fam"), col("slot")), lit(4L))
    spark.range(0, nDocs, 1, parts)
      // integer division: `/` on longs is DOUBLE division in Spark SQL and
      // would scatter a family across fractional fam values
      .select(col("id"), (col("id") % 4).as("slot"), expr("id div 4").as("fam"))
      .withColumn("kind",
        when(col("slot") === 0, lit("head"))
          .when(kindHash === 0, lit("exact"))
          .when(kindHash === 1, lit("near"))
          .otherwise(lit("uniq")))
      // unique docs draw tokens from a disjoint seed space (offset beyond
      // any family id), heads/copies/near-dups from the family seed
      .withColumn("seed",
        when(col("kind") === "uniq", col("id") + lit(1L << 40)).otherwise(col("fam")))
      .withColumn("text", array_join(
        transform(sequence(lit(0), lit(59)),
          j => concat(lit("w"), pmod(xxhash64(col("seed"), j), lit(50000L)))), " "))
      // near-dup: 2 extra trailing tokens -> 58 of 60-ish shingles shared
      .withColumn("text",
        when(col("kind") === "near",
          concat(col("text"), lit(" zq"), pmod(col("id"), lit(7L)),
            lit(" zr"), pmod(col("id"), lit(5L))))
          .otherwise(col("text")))
      .select("id", "kind", "text")
  }

  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val nDocs = args(1).toLong
    val trials = if (args.length > 2) args(2).toInt else 2
    val parts = if (args.length > 3) args(3).toInt else math.max(64, threads * 4)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-bench-dedup")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the corpus once, untimed — the timed stages measure the
    // dedup chain, not the generator (cache ~= nDocs * 420 B)
    val docs = corpus(spark, nDocs, parts).cache()
    val n = docs.count()
    println(s"[benchdedup] threads=$threads nDocs=$n parts=$parts")

    for (t <- 1 to trials) {
      val t0 = System.nanoTime()
      val digests = graft.textops.Dedup.exact(docs, "id", "text").count()
      val t1 = System.nanoTime()
      val clusters = graft.textops.Dedup.minhashDedup(docs, "id", "text", 0.8).cache()
      val survivors = clusters.filter(col("id") === col("keep_id")).count()
      val t2 = System.nanoTime()
      val keep = docs.join(clusters.filter(col("id") === col("keep_id")), Seq("id"))
      val shardChk = graft.textops.Sampling.shardShuffle(keep, "id", 256, "bd1")
        .agg(sum(pmod(col("pos") + col("shard"), lit(1000000007L))).as("chk")).head().getLong(0)
      val t3 = System.nanoTime()
      clusters.unpersist()
      val (wExact, wNear, wShard) =
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      val total = (t3 - t0) / 1e9
      println(f"[benchdedup] threads=$threads trial=$t exact=$wExact%.2f s " +
        f"neardup=$wNear%.2f s shard=$wShard%.2f s total=$total%.2f s " +
        f"docs_per_sec=${n / total}%.0f digests=$digests survivors=$survivors chk=$shardChk")
    }
    spark.stop()
  }
}
