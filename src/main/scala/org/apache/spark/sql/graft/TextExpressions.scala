/* Placed under org.apache.spark.sql for the same reason as
 * VectorExpressions: the private[sql] Column<->Expression bridge. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd winnowing-style fingerprint: the minimum base-31 polynomial
  * hash over every 8-char gram of the input string, as a long.
  *
  * hash(gram) = Σ_{j=0..7} code(c_{i+j}) · 31^(7−j), minimized over the
  * max(len−7, 1) window positions 0..len−8: for len ≥ 8 those are
  * exactly the COMPLETE in-bounds windows (no padded trailing windows
  * are hashed); for len < 8 there is a single window at position 0
  * whose out-of-range bytes read as space (0x20), so short and empty
  * inputs are total. Any reimplementation (e.g. a SQL oracle) must use
  * this same position count — a "pad then hash len+1 windows" model
  * gives different minima on inputs of length ≥ 8. Max value
  * 255·31^7 ≈ 7.0e12: exact 64-bit integer math an exact-arithmetic
  * oracle can recompute (`ord(substr(...))` products in SQL).
  *
  * Why an expression and not `explode(sequence(...))` + `substr`:
  * UTF8String `substr(s, i, 8)` walks from the string start to find
  * code-point i, so per-position extraction is O(i) and the whole
  * fingerprint goes O(len²) per document — measured 5× slower than this
  * single O(len) pass at sf0.1, and unboundedly worse on long documents.
  * Here the scan stage computes the fingerprint directly inside
  * whole-stage codegen: no explode, no shuffle amplification, one tight
  * byte loop per row.
  *
  * Precondition: the input is ASCII (byte == code point). The callers
  * normalize with `regexp_replace(lower(text), '[^a-z0-9]+', ' ')`
  * first, which guarantees it; non-ASCII bytes would still hash
  * deterministically (as their unsigned byte values) but would not match
  * an `ord`-based oracle. Input type is UTF8_BINARY StringType
  * deliberately: the hash is over raw bytes, so a fingerprint must not
  * vary with session collation — collated inputs should be normalized
  * (which the callers' regexp already does) before fingerprinting.
  * ImplicitCastInputTypes lets NULL literals and upcastable inputs bind.
  */
case class MinGramHash(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  private val P7 = 27512614111L // 31^7, the outgoing byte's coefficient

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "min_gram_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    val m = math.max(len - 7, 1)
    // rolling update h' = (h − c_out·31^7)·31 + c_in: ~2 multiply-adds
    // per position instead of 8; exact — max intermediate 255·31^8 ≈
    // 2.2e14, far under 2^63, so no modular reduction is needed
    def at(k: Int): Long = if (k < len) (bytes(k) & 0xff).toLong else 32L
    var h = 0L
    var j = 0
    while (j < 8) { h = h * 31L + at(j); j += 1 }
    var best = h
    var i = 1
    while (i < m) {
      h = (h - at(i - 1) * P7) * 31L + at(i + 7)
      if (h < best) best = h
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val best = ctx.freshName("best")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val at = ctx.freshName("at")
      // same rolling recurrence as the interpreted eval: ~2 multiply-adds
      // per position, exact in 64-bit (max intermediate 255*31^8 ~ 2.2e14)
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $len = $bytes.length;
         |int $m = java.lang.Math.max($len - 7, 1);
         |long $h = 0L;
         |for (int $j = 0; $j < 8; $j++) {
         |  $h = $h * 31L + (($j < $len) ? (long) ($bytes[$j] & 0xff) : 32L);
         |}
         |long $best = $h;
         |for (int $i = 1; $i < $m; $i++) {
         |  long $at = ($i + 7 < $len) ? (long) ($bytes[$i + 7] & 0xff) : 32L;
         |  $h = ($h - (long) ($bytes[$i - 1] & 0xff) * ${P7}L) * 31L + $at;
         |  if ($h < $best) $best = $h;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinGramHash =
    copy(child = newChild)
}

/** Column-level entry points for the text expressions. */
object TextColumns {
  /** Min base-31 8-gram hash of a string column, as long. */
  def minGramHash(c: Column): Column =
    ExpressionUtils.column(MinGramHash(ExpressionUtils.expression(c)))
}
