package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.TextExpressions
import graft.link.MinHashBlocking
import graft.textops.Dedup

/**
 * Codegen + parity contract for the native shingle/minhash expressions
 * that replaced the interpreted HOF chains on the dedup family's
 * featurize path (r6 optimization): values must be BIT-IDENTICAL to the
 * composable formulation — the LSH band keys derive from these hashes,
 * so any value drift would silently change candidate selection — and
 * neither expression may be CodegenFallback.
 */
class ShingleCodegenSpec extends SparkSpec {

  import spark.implicits._

  private val hostile = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",                       // shorter than the gram
    "a",                         // single word
    "",                          // empty text -> one empty gram
    "x  y   z",                  // multi-space: empty tokens kept
    " leading and trailing ",    // boundary empties
    "dup dup dup dup dup",       // repeated grams collapse
    "naïve café über straße 日本語 テスト",  // multibyte UTF-8
    "tab\tand\nnewline stay single tokens"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def withMode[T](mode: String)(f: => T): T = {
    val m0 = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try { spark.conf.set("spark.sql.codegen.factoryMode", mode); f }
    finally spark.conf.set("spark.sql.codegen.factoryMode", m0)
  }

  test("neither shingle expression is CodegenFallback") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val fallback = classOf[CodegenFallback]
    for (c <- Seq(classOf[TextExpressions.WordShingleHashes],
                  classOf[TextExpressions.MinhashSignature],
                  classOf[TextExpressions.DeletionVariantHashes],
                  classOf[TextExpressions.MinGramMd5]))
      assert(!fallback.isAssignableFrom(c), s"${c.getSimpleName} is CodegenFallback")
  }

  test("min_gram_md5 == array_min(transform(wordShingles, md5)) " +
       "bit-for-bit (oracle-visible value), hostile strings") {
    val df = hostile.toDF("id", "t")
    for (n <- Seq(1, 5); mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val rows = withMode(mode) {
        df.select(col("id"),
            TextExpressions.min_gram_md5(col("t"), n).as("native"),
            array_min(transform(Dedup.wordShingles(col("t"), n),
              s => md5(s))).as("hof"))
          .collect()
      }
      rows.foreach { r =>
        assert(r.getString(1) == r.getString(2),
          s"mode=$mode n=$n id=${r.getLong(0)}: ${r.getString(1)} vs ${r.getString(2)}")
      }
    }
  }

  test("word_shingle_hashes == xxhash64 over array_distinct(wordShingles): " +
       "hostile strings + random corpus, codegen and interpreted") {
    val rnd = new scala.util.Random(906)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "", "longword" * 3)
    val random = (100 until 160).map(i => (i.toLong,
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val df = (hostile ++ random).toDF("id", "t")
    for (n <- Seq(1, 3, 4); mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val rows = withMode(mode) {
        df.select(col("id"),
            TextExpressions.word_shingle_hashes(col("t"), n).as("native"),
            MinHashBlocking.shingleBaseHashes(
              Dedup.wordShingles(col("t"), n)).as("hof"))
          .collect()
      }
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"mode=$mode n=$n id=${r.getLong(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
      }
    }
  }

  test("minhash_sig == array_min∘transform(xxhash64(i, h)) slot-for-slot; " +
       "empty array -> k nulls; null input -> null") {
    val dfs = Seq(
      (1L, Seq(42L, -7L, Long.MaxValue, Long.MinValue, 0L)),
      (2L, Seq(1L)),
      (3L, Seq.empty[Long]),
      (4L, null.asInstanceOf[Seq[Long]])
    ).toDF("id", "bh")
    for (k <- Seq(1, 8); mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val rows = withMode(mode) {
        dfs.select(col("id"),
            TextExpressions.minhash_sig(col("bh"), k).as("native"),
            MinHashBlocking.minhashSignatureFromHashes(col("bh"), k).as("hof"))
          .collect()
      }
      rows.foreach { r =>
        assert(!r.isNullAt(1) && !r.isNullAt(2),
          s"both forms are non-null arrays (null input -> k null slots), id=${r.getLong(0)}")
        assert(r.getSeq[java.lang.Long](1) == r.getSeq[java.lang.Long](2),
          s"mode=$mode k=$k id=${r.getLong(0)}")
      }
    }
  }

  test("deletion_variant_hashes == xxhash64 over the HOF deletion chain " +
       "(as sets; self included), hostile + multibyte strings") {
    val strs = Seq("", "a", "ab", "aa", "Customer#000000001",
      "naïve日本", "x y", "aaa").zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s")
    val hofVars = array_distinct(concat(
      array(col("s")),
      when(length(col("s")) > 0,
        transform(sequence(lit(1), length(col("s"))),
          i => concat(col("s").substr(lit(1), i - lit(1)),
            col("s").substr(i + lit(1), length(col("s"))))))
        .otherwise(array())))
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val rows = withMode(mode) {
        df.select(col("id"),
            TextExpressions.deletion_variant_hashes(col("s")).as("native"),
            transform(hofVars, v => xxhash64(v)).as("hof"))
          .collect()
      }
      rows.foreach { r =>
        assert(r.getSeq[Long](1).toSet == r.getSeq[Long](2).toSet,
          s"mode=$mode id=${r.getLong(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
      }
    }
  }

  test("end-to-end: minhashPairs over the native path equals the r5 " +
       "string-shingle formulation on a dup-heavy corpus") {
    val docs = (0 until 120).map { i =>
      val base = s"sentence ${i % 7} with shared words plus tail ${i % 11}"
      (i.toLong, if (i % 3 == 0) base else base + s" unique$i")
    }.toDF("doc_id", "text")
    val native = Dedup.minhashPairs(docs, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    // the pre-r6 formulation: string shingles in, hashing inside bandedIndex
    val legacy = MinHashBlocking.candidatePairs(
      docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("_shingles")),
      "doc_id", "_shingles", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(native == legacy)
    assert(native.nonEmpty, "fixture must produce pairs")
  }
}
