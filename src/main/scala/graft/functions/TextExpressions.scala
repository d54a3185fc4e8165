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
}
