package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: which expression classes scale with local[k] threads on
  * this box? Variants share one JVM; sessions are recreated per thread
  * count (new SparkContext each time). */
object ProbeLab {

  /** `runMain graft.ProbeLab simhash`: cost of the portable (md5 hex-digit)
    * vs production (`portableHash=false`, single xxhash64) simhash token
    * hash on a synthetic 1M x ~26-token corpus — quantifies what the md5
    * oracle-portability trick costs the hot path (the dd3 query must keep
    * md5 so DuckDB can re-derive it; a production dedup run should not). */
  private def simhashCost(): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("probe-simhash")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = spark.range(0, 1000000L, 1, 32)
      .select(org.apache.spark.sql.functions.col("id"),
        concat(lit(words), lit(" doc "), col("id").cast("string")).as("text"))
      .cache()
    docs.count()
    for ((name, portable) <- Seq("portable_md5" -> true, "fast_xxhash64" -> false);
         trial <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.textops.Dedup.simhash(docs, "id", "text", portableHash = portable)
        .select(sum(pmod(col("simhash"), lit(1000000007L)))).head()
      println(f"[lab] simhash $name%-14s trial=$trial wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  /** `runMain graft.ProbeLab veccodegen`: the five native vector expressions
    * on a synthetic 1M x 64-dim corpus, generated-code path (CODEGEN_ONLY)
    * vs per-row interpreted eval (NO_CODEGEN — what the round-4
    * CodegenFallback posture paid on every row). Quantifies VERDICT r4
    * "What's wrong #1". */
  private def vecCodegenCost(): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("probe-veccodegen")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graftfns.VectorExpressions._
    val dims = 64
    val vecs = spark.range(0, 1000000L, 1, 32)
      .select(col("id"),
        transform(sequence(lit(0), lit(dims - 1)),
          j => pmod(xxhash64(col("id"), j), lit(2001L)).cast("double") / 1000.0 - 1.0)
          .as("v"))
      .cache()
    vecs.count()
    val cents: Seq[Seq[Double]] =
      (0 until 16).map(c => (0 until dims).map(j => ((c * 31 + j * 7) % 17 - 8) / 8.0))
    val work: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "cosine" -> vecs.select(sum(cosine_fast(col("v"), reverse(col("v")))).as("s")),
      "l2" -> vecs.select(sum(l2_dist(col("v"), reverse(col("v")))).as("s")),
      "hyperplane_sig" -> vecs.select(
        sum(pmod(hyperplane_sig(col("v"), 16, 0), lit(1000000007L))).as("s")),
      "euclidean_sig" -> vecs.select(
        sum(pmod(euclidean_sig(col("v"), 4, 0, 1.0), lit(1000000007L))).as("s")),
      "nearest_centroid" -> vecs.select(
        sum(nearest_centroid(col("v"), cents)).as("s")))
    for (mode <- Seq("NO_CODEGEN", "CODEGEN_ONLY"); (name, df) <- work; trial <- 1 to 3) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.wholeStage", (mode == "CODEGEN_ONLY").toString)
      val t0 = System.nanoTime()
      df.head()
      println(f"[lab] vec $mode%-12s $name%-17s trial=$trial wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  /** `runMain graft.ProbeLab quant`: the int8-quantized ANN index vs the
    * float index on a synthetic 1M x 64-dim corpus — measured cached
    * footprint, parquet footprint, and brute-force scoring wall from each
    * (the scoring loop is the same fused native cosine either way; the win
    * is bytes moved/held, which is what dominates a 100 TB index). */
  private def quantCost(): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("probe-quant")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dims = 64
    // full-mantissa pseudo-random floats: real embeddings are entropy-dense,
    // so parquet can't dictionary-encode them away — a lattice-valued
    // synthetic (e.g. pmod 2001) would flatter the float index's footprint
    val base = spark.range(0, 1000000L, 1, 32)
      .select(col("id"),
        transform(sequence(lit(0), lit(dims - 1)),
          j => (xxhash64(col("id"), j).cast("double") / 9.223372036854776e18)
            .cast("float"))
          .as("v"))
    val floatIdx = base.cache()
    floatIdx.count()
    val quantIdx = base
      .select(col("id"), graft.ann.Similarity.quantizeI8(col("v")).as("v")).cache()
    quantIdx.count()
    val Seq(floatMem, quantMem) =
      spark.sparkContext.getRDDStorageInfo.toSeq.sortBy(_.id).map(_.memSize)
    println(s"[lab] cache float=$floatMem int8=$quantMem ratio=${
      f"${floatMem.toDouble / quantMem}%.2f"}")
    val tmp = java.nio.file.Files.createTempDirectory("probe_quant").toString
    floatIdx.write.mode("overwrite").parquet(s"$tmp/fidx")
    quantIdx.write.mode("overwrite").parquet(s"$tmp/qidx")
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val (fB, qB) = (dirBytes(s"$tmp/fidx"), dirBytes(s"$tmp/qidx"))
    println(f"[lab] parquet float=$fB int8=$qB ratio=${fB.toDouble / qB}%.2f")
    val queries = base.limit(16).collect()
    val qdf = spark.createDataFrame(
      spark.sparkContext.parallelize(queries.toIndexedSeq, 1), base.schema)
    for ((name, idx) <- Seq("float" -> floatIdx, "int8" -> quantIdx); trial <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.ann.Similarity
        .bruteForceTopK(qdf, idx, "id", "v", 10)
        .agg(sum(col("neighbor_id"))).head()
      println(f"[lab] quant scan=$name%-6s trial=$trial wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  /** `runMain graft.ProbeLab jaccard`: where does dd4's trial-to-trial CPU
    * variance (16 s .. 195 s across rounds on an identical plan census)
    * come from? Hypothesis: in the fused scan→generate→broadcast-join
    * pipeline the STREAM side's expensive interpreted `wordShingles` chain
    * is a deferred codegen variable, so slow trials re-evaluate it per
    * candidate PAIR (~80 matches/row) instead of once per row. Variants:
    * `deferred` = the shipped formulation; `checkpointed` = shingled table
    * materialized (localCheckpoint) before the self-join, making per-row
    * evaluation structural; `hashed` = shingles xxhash64'd to longs row-side
    * (cheap re-eval AND cheap intersect). Run on the REAL sf0.1 documents. */
  private def jaccardCost(): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-jaccard")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .withColumn("_bkt", floor(length(col("text")) / 8))
      .withColumn("_blk", explode(array(
        concat_ws("_", col("lang"), col("_bkt")),
        concat_ws("_", col("lang"), col("_bkt") + 1))))
      .cache()
    docs.count()
    def shingled = docs.select(col("_blk"), col("doc_id"),
      graft.textops.Dedup.wordShingles(col("text"), 3).as("_sh"))
    def pairsFrom(withSh: org.apache.spark.sql.DataFrame) = {
      val a = withSh.select(col("_blk"), col("doc_id").as("id_a"),
        col("_sh").as("_sh_a"), size(col("_sh")).as("_n_a"))
      val b = withSh.select(col("_blk"), col("doc_id").as("id_b"),
        col("_sh").as("_sh_b"), size(col("_sh")).as("_n_b"))
      a.join(b, Seq("_blk")).filter(col("id_a") < col("id_b"))
        .filter(least(col("_n_a"), col("_n_b")).cast("double") >=
          lit(0.5) * greatest(col("_n_a"), col("_n_b")).cast("double"))
        .withColumn("_inter", size(array_intersect(col("_sh_a"), col("_sh_b"))))
        .withColumn("jaccard", col("_inter").cast("double") /
          (col("_n_a") + col("_n_b") - col("_inter")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard").dropDuplicates("id_a", "id_b")
    }
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "deferred" -> (() => pairsFrom(shingled)),
      "checkpointed" -> (() => pairsFrom(shingled.localCheckpoint())),
      "hashed" -> (() => pairsFrom(shingled.withColumn("_sh",
        transform(col("_sh"), s => xxhash64(s))))))
    for ((name, f) <- variants; trial <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = f().count()
      println(f"[lab] jaccard $name%-13s trial=$trial pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  /** `runMain graft.ProbeLab classifier`: the qf3 GD trainer at 1M docs,
    * local[8] — per-phase walls (feature build+rollup, the 8 damped-Jacobi
    * iterations, corpus scoring) so the bench-scale "planning-overhead-
    * dominated" claim and the at-scale per-iteration cost are both
    * measured, not asserted. The weak label is a seed-keyword rule like
    * the qf3 query's. */
  private def classifierCost(): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("probe-classifier")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = spark.range(0, 1000000L, 1, 32)
      .select(col("id"),
        concat(lit(words), lit(" doc "),
          when(pmod(col("id"), lit(3)) === 0, lit("target marker ")).otherwise(lit("")),
          col("id").cast("string")).as("text"))
      .cache()
    docs.count()
    for (trial <- 1 to 2) {
      val t0 = System.nanoTime()
      val w = graft.textops.Classifier.train(docs, "id", "text",
        col("text").contains("marker"), iters = 8)
      val t1 = System.nanoTime()
      val n = graft.textops.Classifier.score(docs, "id", "text", w)
        .filter(col("pred") === 1).count()
      val t2 = System.nanoTime()
      println(f"[lab] classifier trial=$trial train8=${(t1 - t0) / 1e9}%.2f s " +
        f"(per-iter=${(t1 - t0) / 8e9}%.2f) score=${(t2 - t1) / 1e9}%.2f s pos=$n " +
        f"docs/s_train=${1000000L * 8 / ((t1 - t0) / 1e9)}%.0f")
    }
    spark.stop()
  }

  /** `runMain graft.ProbeLab jaccardjoin`: dd9's prefix-filtered EXACT
    * join at 100k and 400k synthetic Zipf-vocabulary docs (25 tokens,
    * 1% planted duplicates) — a 4x corpus would cost 16x under the naive
    * all-pairs join; the wall ratio measures how close prefix filtering
    * keeps the exact join to linear on a skewed vocabulary. */
  private def jaccardJoinCost(): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("probe-jaccardjoin")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(100000L, 400000L)) {
      val base = spark.range(0, n, 1, 32).select(col("id"),
        concat_ws(" ", transform(sequence(lit(1), lit(25)), p =>
          concat(lit("w"), floor(pow(
            pmod(xxhash64(col("id"), p), lit(1000000L)).cast("double") / 1000000.0,
            3.0) * 2000).cast("int").cast("string")))).as("text"))
      val dups = base.filter(pmod(col("id"), lit(100)) === 0)
        .select((col("id") + n).as("id"), col("text"))
      val docs = base.unionByName(dups).cache()
      docs.count()
      for (trial <- 1 to 2) {
        val t0 = System.nanoTime()
        val pairs = graft.textops.Dedup.jaccardJoinExact(docs, "id", "text", 0.8).count()
        println(f"[lab] jaccardjoin n=$n trial=$trial pairs=$pairs " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      docs.unpersist()
    }
    spark.stop()
  }

  /** `runMain graft.ProbeLab dict`: dense-id assignment at 5M distinct
    * strings — `Dictionary.build`'s range + local row_number + offsets vs
    * the naive global `row_number() OVER (ORDER BY value)` (one
    * partition, the shape that cannot survive 10^9 entities). Identical
    * id checksums both ways; wall compared at local[8]. */
  private def dictCost(n: Long): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("probe-dict")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vals = spark.range(0, n, 1, 32)
      .select(concat(lit("entity_"),
        lpad(col("id").cast("string"), 9, "0")).as("value"))
      .cache()
    vals.count()
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(pmod(xxhash64(col("value")) + col("id"), lit(1000000007L))))
        .head().getLong(0)
    for (trial <- 1 to 3) {
      var t0 = System.nanoTime()
      val c1 = checksum(graft.graph.Dictionary.build(vals, "value", 16))
      println(f"[lab] dict n=$n ranged trial=$trial wall=${(System.nanoTime() - t0) / 1e9}%.2f s checksum=$c1")
      t0 = System.nanoTime()
      val c2 = checksum(vals.distinct().withColumn("id",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("value"))
          .cast("long") - 1))
      println(f"[lab] dict n=$n global trial=$trial wall=${(System.nanoTime() - t0) / 1e9}%.2f s checksum=$c2")
      assert(c1 == c2, s"checksum divergence: $c1 vs $c2")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("dict")) {
      dictCost(args.lift(1).map(_.toLong).getOrElse(5000000L)); return
    }
    if (args.headOption.contains("jaccardjoin")) { jaccardJoinCost(); return }
    if (args.headOption.contains("simhash")) { simhashCost(); return }
    if (args.headOption.contains("veccodegen")) { vecCodegenCost(); return }
    if (args.headOption.contains("quant")) { quantCost(); return }
    if (args.headOption.contains("jaccard")) { jaccardCost(); return }
    if (args.headOption.contains("classifier")) { classifierCost(); return }
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
