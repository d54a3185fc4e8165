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
                  classOf[TextExpressions.MinGramMd5],
                  classOf[TextExpressions.SimhashMd5Bits]))
      assert(!fallback.isAssignableFrom(c), s"${c.getSimpleName} is CodegenFallback")
  }

  test("simhash_md5_bits: every extracted bit equals the conv-digit " +
       "formulation's, hostile tokens, codegen and interpreted") {
    val toks = (hostile.map(_._2) ++ Seq("word", "é", "日本語", "x1", "UPPER"))
      .distinct.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = toks.toDF("id", "tok")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val cols = (0 until 64).flatMap { i =>
        val digit = conv(substring(md5(col("tok")), i / 4 + 1, 1), 16, 10).cast("int")
        Seq(shiftright(digit, 3 - (i % 4)).bitwiseAND(lit(1)).cast("long").as(s"hof_$i"),
          shiftright(TextExpressions.simhash_md5_bits(col("tok")), i)
            .bitwiseAND(lit(1L)).as(s"nat_$i"))
      }
      val rows = withMode(mode) { df.select(col("id") +: cols: _*).collect() }
      rows.foreach { r =>
        (0 until 64).foreach { i =>
          assert(r.getLong(1 + 2 * i) == r.getLong(2 + 2 * i),
            s"mode=$mode id=${r.getLong(0)} bit=$i")
        }
      }
    }
  }

  test("end-to-end: simhashPairs over the native bit path equals the " +
       "digit-column formulation on a near-dup corpus") {
    val docs = (0 until 80).map { i =>
      val base = "the quick brown fox jumps over the lazy dog again and again"
      (i.toLong, if (i % 4 == 0) base else base + s" tail${i % 9}")
    }.toDF("doc_id", "text")
    val native = Dedup.simhashPairs(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    // the pre-r6 digit-column signature, same banding machinery
    val tokens = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("_tok"))
    val withDigits = tokens.withColumn("_m", md5(col("_tok"))).select(
      col("doc_id") +: (0 until 16).map { k =>
        conv(substring(col("_m"), k + 1, 1), 16, 10).cast("int").as(s"_d$k")
      }: _*)
    def bit(i: Int) = shiftright(col(s"_d${i / 4}"), 3 - (i % 4)).bitwiseAND(lit(1))
    val bitSums = (0 until 64).map { i =>
      sum(when(bit(i) === 1, 1).otherwise(-1)).as(s"_b$i")
    }
    val agged = withDigits.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"_b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val legacySig = agged.select(col("doc_id"), sig.as("simhash"))
    val nativeSig = Dedup.simhash(docs, "doc_id", "text")
    val l = legacySig.as[(Long, Long)].collect().toMap
    val n = nativeSig.as[(Long, Long)].collect().toMap
    assert(l == n, "signatures must be bit-identical")
    assert(native.nonEmpty, "fixture must produce pairs")
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

  test("positioned_gram_hashes == xxhash64 over the regex-split HOF gram " +
       "chain, position-for-position, hostile strings") {
    // the es1 string formulation this replaces: split(" +") keeps
    // leading/trailing empty tokens; short docs produce no grams
    val df = (hostile ++ Seq((100L, "  double  leading"), (101L, "trailing  "),
      (102L, " "), (103L, "a  b   c d"))).toDF("id", "t")
    for (k <- Seq(1, 3, 5); mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val ws = split(col("t"), " +")
      val hof = when(size(ws) >= k,
        transform(transform(sequence(lit(0), size(ws) - k),
          i => array_join(slice(ws, i + 1, lit(k)), " ")), g => xxhash64(g)))
        .otherwise(array().cast("array<long>"))
      val rows = withMode(mode) {
        df.select(col("id"),
            TextExpressions.positioned_gram_hashes(col("t"), k).as("native"),
            hof.as("hofh"))
          .collect()
      }
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"mode=$mode k=$k id=${r.getLong(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
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
