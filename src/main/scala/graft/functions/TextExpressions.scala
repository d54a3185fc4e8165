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
}
