// Lives under org.apache.spark.sql so it can reach the private[sql]
// Column<->Expression bridge (classic.ExpressionUtils) — the same
// extension point Spark's own connectors use.
package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native text expressions for the extraction hot path.
 *
 * Why not `regexp_replace`: measured on this class of host, java.util.regex
 * `Matcher.replaceAll` does NOT scale with threads (4M ops: 15.5 s at 1
 * thread, 23 s at 8 threads — worse than serial), while a manual byte loop
 * scales linearly (1.1 s -> 0.36 s). Normalization runs twice per extracted
 * triple over the full 10^12-turn stream, so it must be a tight loop, not a
 * regex. Parity with the regex formulation is asserted in ExtractionSpec.
 */
object TextExpressions {

  /**
   * normalize_text(s) ==
   * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""), " +", " "))`
   * for ASCII input, in ONE byte-level pass: ASCII-lowercase, keep
   * [a-z0-9 ], collapse space runs, trim ends. Non-ASCII bytes are dropped
   * (the regex drops them too after `lower`; the only divergence is exotic
   * case mappings whose lowercase IS ASCII, e.g. U+212A KELVIN SIGN -> 'k',
   * which the regex keeps and this drops).
   */
  /** One-pass normalization over UTF8 bytes (static so generated code can
    * call it — keeps the enclosing projection inside whole-stage codegen). */
  def normalizeUTF8(input: UTF8String): UTF8String = {
    val bytes = input.getBytes
    val out = new Array[Byte](bytes.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      var b = bytes(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = b; n += 1
      } else if (b == ' ') {
        pendingSpace = true
      }
      // everything else (punctuation, control, any non-ASCII byte) drops
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  case class NormalizeText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      normalizeUTF8(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftfns.TextExpressions.normalizeUTF8($c)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column API: native one-pass normalization. */
  def normalize_text(c: Column): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(c)))

  /** Register as a SQL function on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", exprs => NormalizeText(exprs(0)), "built-in")

  // ---- rep_stats: one-pass intra-doc repetition statistics ----

  /**
   * One pass over a doc's word array → [dup_word_ratio, dup_2gram_ratio,
   * dup_3gram_ratio, top_word_ratio] (raw doubles; callers round). VALUE
   * semantics are exactly the composable HOF formulation's
   * (`1 − distinct/total` with the same short-doc gram edge: a doc
   * shorter than the gram yields its single truncated gram; an EMPTY
   * word array yields [NaN, 0, 0, null] like the HOF chain), but the
   * quadratic interpreted top-word scan (O(distinct·words) string
   * equality per doc) and the per-gram Catalyst array materializations
   * become hash-map counting in a tight JVM loop. Static so generated
   * code calls it directly; parity with the HOF chain is spec-pinned.
   */
  def repStats(ws: org.apache.spark.sql.catalyst.util.ArrayData)
  : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val n = ws.numElements()
    if (n == 0)
      return new GenericArrayData(Array[Any](Double.NaN, 0.0, 0.0, null))
    val words = new Array[String](n)
    var i = 0
    while (i < n) { words(i) = ws.getUTF8String(i).toString; i += 1 }
    val counts = new java.util.HashMap[String, Integer](n * 2)
    var top = 0
    i = 0
    while (i < n) {
      val c = counts.merge(words(i), 1, (a: Integer, b: Integer) => a + b)
      if (c > top) top = c
      i += 1
    }
    def gramRatio(g: Int): Double = {
      val last = if (n - g > 0) n - g else 0
      val total = last + 1
      val set = new java.util.HashSet[String](total * 2)
      var j = 0
      while (j <= last) {
        val end = if (j + g < n) j + g else n
        val sb = new java.lang.StringBuilder
        var k = j
        while (k < end) { if (k > j) sb.append(' '); sb.append(words(k)); k += 1 }
        set.add(sb.toString)
        j += 1
      }
      1.0 - set.size.toDouble / total
    }
    new GenericArrayData(Array[Any](
      1.0 - counts.size.toDouble / n, gramRatio(2), gramRatio(3),
      top.toDouble / n))
  }

  case class RepetitionStats(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = true)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.sql}")
    }
    override def nullSafeEval(input: Any): Any =
      repStats(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftfns.TextExpressions.repStats($c)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: one-pass repetition statistics. */
  def rep_stats(c: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(c)))

  // ---- cdc_bounds: content-defined chunk boundaries (gear hash) ----

  /** splitmix64 (Steele et al., public domain) — seeds the gear table
    * deterministically so every engine/JVM derives identical boundaries. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 256-entry gear table, fixed for the library's lifetime (chunk
    * boundaries are CONTENT ADDRESSES — changing the table invalidates
    * every stored chunk hash). */
  private val Gear: Array[Long] = Array.tabulate(256)(i => splitmix64(i.toLong))

  /**
   * Gear-hash content-defined chunking (the windowless rolling hash of
   * LBFS/FastCDC lineage: h ← (h≪1) + G[byte]; the shift expires a
   * byte's influence after 64 positions, so boundaries re-synchronize
   * within ≤64 bytes of any edit). Returns the chunk START offsets
   * (byte positions, first always 0; empty input → empty array). A
   * position ends a chunk when at least `min` bytes have accumulated
   * and (h & mask) == 0, or unconditionally at `max` bytes; `mask` has
   * log2(avg−min) low bits so the expected chunk length is ≈ avg.
   */
  def cdcBounds(input: UTF8String, min: Int, avg: Int, max: Int)
  : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val bytes = input.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    var bits = 0
    while ((1 << (bits + 1)) <= (avg - min).max(1)) bits += 1
    val mask = (1L << bits) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Int](n / avg + 2)
    out += 0
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if (i < n - 1 &&
          ((len >= min && (h & mask) == 0L) || len >= max)) {
        out += (i + 1); start = i + 1; h = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class CdcBounds(child: Expression, min: Int, avg: Int, max: Int)
      extends UnaryExpression {
    require(min >= 1 && min < avg && avg < max, s"bad cdc sizes ($min,$avg,$max)")
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      cdcBounds(input.asInstanceOf[UTF8String], min, avg, max)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftfns.TextExpressions.cdcBounds($c, $min, $avg, $max)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: content-defined chunk start offsets. */
  def cdc_bounds(c: Column, min: Int, avg: Int, max: Int): Column =
    ExpressionUtils.column(CdcBounds(ExpressionUtils.expression(c), min, avg, max))

  // ---- word_shingle_hashes: fused word n-gram shingling + xxhash64 ----

  /**
   * Distinct word n-gram shingles of a string, 64-bit hashed — the native
   * fusion of the dedup family's featurize chain
   * `shingleBaseHashes(wordShingles(text, n))`, i.e.
   * `transform(array_distinct(transform(sequence(...), array_join(slice(
   * split(text, " "), ...)))), s -> xxhash64(s))`. Every higher-order
   * function in that chain is CodegenFallback (interpreted per element,
   * per row, with a Catalyst array materialized per gram); this is one
   * byte-level pass.
   *
   * Value parity (spec-pinned): `split(text, " ")` keeps empty tokens
   * (limit −1), so word boundaries are exactly the 0x20 byte positions —
   * safe on UTF-8 (0x20 never occurs inside a multibyte sequence); a gram
   * joined with " " is then a CONTIGUOUS byte range of the input, hashed
   * in place with Spark's own XXH64 at seed 42 — bit-identical to
   * `xxhash64(gram_string)`, so downstream minhash banding (dd2/dd8/er1)
   * selects IDENTICAL candidate pairs. Dedup is by hash value rather than
   * gram string: the arrays differ only if two distinct grams of ONE
   * document collide in xxhash64 (~n²/2⁶⁵ — the family's long-accepted
   * collision posture).
   */
  def wordShingleHashes(input: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val bytes = input.getBytes
    val len = bytes.length
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var w = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = len
    val nGrams = if (nWords >= n) nWords - n + 1 else 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](nGrams * 2)
    var g = 0
    while (g < nGrams) {
      val last = math.min(g + n, nWords) - 1
      val from = starts(g)
      seen.add(XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + from, ends(last) - from, 42L))
      g += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  case class WordShingleHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"shingle width $n")
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      wordShingleHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftfns.TextExpressions.wordShingleHashes($c, $n)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: distinct hashed word n-gram shingles. */
  def word_shingle_hashes(c: Column, n: Int): Column =
    ExpressionUtils.column(WordShingleHashes(ExpressionUtils.expression(c), n))

  // ---- minhash_sig: k seeded minhash values over pre-hashed shingles ----

  /**
   * k-element minhash signature over a base-hash array — the native form
   * of `array((0 until k).map(i => array_min(transform(bh, h ->
   * xxhash64(lit(i), h)))))`: per slot i the minimum of
   * `XXH64.hashLong(h, XXH64.hashInt(i, 42))` over the elements, which is
   * bit-identical to Spark's `xxhash64(lit(i), h)` seed-chaining, so the
   * banding keys (and therefore every LSH candidate set) are unchanged.
   * An empty input array yields k null slots exactly like `array_min`
   * over an empty transform; a null element leaves the running hash at
   * its seed exactly like xxhash64's null-skipping.
   */
  def minhashSig(arr: org.apache.spark.sql.catalyst.util.ArrayData, k: Int)
  : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = XXH64.hashInt(i, 42L)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = if (arr.isNullAt(j)) seed else XXH64.hashLong(arr.getLong(j), seed)
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Null-input form: k null slots — what `array((0 until k).map(i =>
    * array_min(transform(null, ...))))` evaluates to. The expression is
    * therefore never null itself (parity with the HOF chain, whose outer
    * `array(...)` constructor is non-null). */
  def minhashSigNull(k: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](k))

  case class MinhashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, s"signature length $k")
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = true)
    override def nullable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) minhashSigNull(k)
      else minhashSig(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val c = child.genCode(ctx)
      val fn = "org.apache.spark.sql.graftfns.TextExpressions"
      ev.copy(code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $fn.minhashSigNull($k) : $fn.minhashSig(${c.value}, $k);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: k-slot minhash signature over pre-hashed shingles. */
  def minhash_sig(c: Column, k: Int): Column =
    ExpressionUtils.column(MinhashSignature(ExpressionUtils.expression(c), k))

  // ---- deletion_variant_hashes: SymSpell delete-1 neighborhood keys ----

  /**
   * xxhash64 keys of a string's deletion-1 neighborhood: the string
   * itself plus every delete-one-CHARACTER variant, deduplicated — the
   * native form of the dd10 blocker's
   * `transform(sequence(1, length(s)), i -> concat(substr(..i-1),
   * substr(i+1..)))` chain, whose every element was an interpreted HOF
   * call materializing a Catalyst string. Deletion is character-based
   * (substr semantics), so multibyte text drops whole code points.
   * Values are bit-identical to `xxhash64(variant_string)` (seed 42 over
   * the variant's UTF-8 bytes); only the self-join key space depends on
   * them — the banded levenshtein verify downstream is what decides.
   */
  def deletionVariantHashes(input: UTF8String)
  : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val bytes = input.getBytes
    val len = bytes.length
    // char start offsets (UTF-8 lead bytes)
    var nChars = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) nChars += 1; i += 1 }
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = len
    val seen = new java.util.LinkedHashSet[java.lang.Long]((nChars + 2) * 2)
    seen.add(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, len, 42L))
    if (nChars > 0) {
      val buf = new Array[Byte](len)
      var k = 0
      while (k < nChars) {
        val from = starts(k)
        val to = starts(k + 1)
        System.arraycopy(bytes, 0, buf, 0, from)
        System.arraycopy(bytes, to, buf, from, len - to)
        seen.add(XXH64.hashUnsafeBytes(
          buf, Platform.BYTE_ARRAY_OFFSET, len - (to - from), 42L))
        k += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  case class DeletionVariantHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      deletionVariantHashes(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftfns.TextExpressions.deletionVariantHashes($c)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: hashed delete-1 neighborhood keys (self included). */
  def deletion_variant_hashes(c: Column): Column =
    ExpressionUtils.column(DeletionVariantHashes(ExpressionUtils.expression(c)))

  // ---- min_gram_md5: winnowing-style minimum shingle digest ----

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /**
   * Minimum md5 hex digest over a string's word n-gram shingles — the
   * native form of tx4's `array_min(transform(wordShingles(s, n), md5))`,
   * which evaluated one interpreted HOF call and one Catalyst string per
   * gram. Grams are built exactly like [[wordShingleHashes]] (contiguous
   * byte ranges under single-space split); the minimum over lowercase hex
   * strings equals the minimum over digest bytes compared unsigned (hex
   * encoding is monotone), so the digest is hex-encoded once at the end.
   * Value is bit-identical to the HOF form (spec-pinned) — it is
   * oracle-visible, so it must be.
   */
  def minGramMd5(input: UTF8String, n: Int): UTF8String = {
    val bytes = input.getBytes
    val len = bytes.length
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var w = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = len
    val nGrams = if (nWords >= n) nWords - n + 1 else 1
    val md = md5Local.get()
    var best: Array[Byte] = null
    var g = 0
    while (g < nGrams) {
      val last = math.min(g + n, nWords) - 1
      md.reset()
      md.update(bytes, starts(g), ends(last) - starts(g))
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      g += 1
    }
    val hex = new Array[Byte](32)
    val digits = "0123456789abcdef".getBytes
    i = 0
    while (i < 16) {
      hex(i * 2) = digits((best(i) >> 4) & 0xF)
      hex(i * 2 + 1) = digits(best(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  case class MinGramMd5(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"gram width $n")
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      minGramMd5(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftfns.TextExpressions.minGramMd5($c, $n)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: minimum md5 hex over word n-gram shingles. */
  def min_gram_md5(c: Column, n: Int): Column =
    ExpressionUtils.column(MinGramMd5(ExpressionUtils.expression(c), n))

  // ---- simhash_md5_bits: the dd3 portable token hash, fused ----

  /**
   * The 64 portable SimHash token bits as one long — the native form of
   * dd3's digit chain: bit j = bit (3 − j%4) of hex digit j/4 of
   * md5(token), previously derived per token as 16×
   * `conv(substring(md5, k+1, 1), 16, 10)` digit columns (16 UTF8String
   * slices + 16 base conversions per token) and re-sliced by 64
   * shift/mask expressions. Hex digit k of the md5 string is the
   * high (k even) / low (k odd) nibble of digest byte k/2, so the long
   * is assembled directly from the first 8 digest bytes; the bit
   * EXTRACTION downstream (`shiftright(_h, j) & 1`) then yields values
   * bit-identical to the digit formulation (spec-pinned), which is what
   * the oracle replays — the 64-sum signature aggregate is unchanged.
   */
  def simhashMd5Bits(input: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val bytes = input.getBytes
    md.update(bytes, 0, bytes.length)
    val digest = md.digest()
    var out = 0L
    var d = 0
    while (d < 16) {
      val b = digest(d / 2)
      val v = if ((d & 1) == 0) (b >> 4) & 0xF else b & 0xF
      var t = 0
      while (t < 4) {
        out |= (((v >> (3 - t)) & 1).toLong << (4 * d + t))
        t += 1
      }
      d += 1
    }
    out
  }

  case class SimhashMd5Bits(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullSafeEval(input: Any): Any =
      simhashMd5Bits(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftfns.TextExpressions.simhashMd5Bits($c)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: portable simhash token bits (md5-derived) as one long. */
  def simhash_md5_bits(c: Column): Column =
    ExpressionUtils.column(SimhashMd5Bits(ExpressionUtils.expression(c)))

  // ---- positioned_gram_hashes: es1's positioned k-grams, hashed ----

  /**
   * xxhash64 keys of the positioned word k-grams of a string under
   * REGEX-`" +"` split semantics — the native form of es1's
   * `transform(sequence(0, size(_w) − k), i → array_join(slice(_w, i+1,
   * k), " "))` over `split(text, " +")`: tokens are the (possibly empty)
   * segments between maximal space runs — a leading/trailing run yields
   * an empty first/last token, exactly like java.util.regex split with
   * limit −1 — and each gram joins k consecutive tokens with a SINGLE
   * space before hashing (so multi-space originals hash like their
   * collapsed form, as the string formulation did). Element i of the
   * result is gram position i; fewer than k tokens → empty array (the
   * caller's `size(_w) >= k` filter, folded in).
   *
   * The gram STRINGS are join/count keys only (never oracle-visible), so
   * the 64-bit key stands in for the ~k-word string — the dc1/dc2 key
   * narrowing posture; a cross-gram collision (~n²/2⁶⁵) could mark one
   * extra gram duplicated, the family's long-accepted collision odds.
   */
  def positionedGramHashes(input: UTF8String, k: Int)
  : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val bytes = input.getBytes
    val len = bytes.length
    // token boundaries under " +": segments between maximal space runs
    val starts = new scala.collection.mutable.ArrayBuffer[Int](len / 4 + 2)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](len / 4 + 2)
    var i = 0
    starts += 0
    while (i < len) {
      if (bytes(i) == ' ') {
        ends += i
        while (i < len && bytes(i) == ' ') i += 1
        starts += i
      } else i += 1
    }
    ends += len
    val nWords = starts.length
    if (nWords < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = nWords - k + 1
    val out = new Array[Long](nGrams)
    val buf = new Array[Byte](len)
    var g = 0
    while (g < nGrams) {
      var contiguous = true
      var w = g
      while (contiguous && w < g + k - 1) {
        if (starts(w + 1) != ends(w) + 1) contiguous = false
        w += 1
      }
      if (contiguous) {
        val from = starts(g)
        out(g) = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + from, ends(g + k - 1) - from, 42L)
      } else {
        // multi-space gaps: rebuild the gram with single spaces
        var n = 0
        w = g
        while (w < g + k) {
          if (w > g) { buf(n) = ' '; n += 1 }
          val l = ends(w) - starts(w)
          System.arraycopy(bytes, starts(w), buf, n, l)
          n += l
          w += 1
        }
        out(g) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, n, 42L)
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  case class PositionedGramHashes(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, s"gram width $k")
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      positionedGramHashes(input.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graftfns.TextExpressions.positionedGramHashes($c, $k)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: positioned word k-gram hashes (regex-split semantics). */
  def positioned_gram_hashes(c: Column, k: Int): Column =
    ExpressionUtils.column(PositionedGramHashes(ExpressionUtils.expression(c), k))
}
