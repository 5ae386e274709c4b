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

/** [[MinGramHash]]'s CODE-POINT twin: the minimum base-31 polynomial
  * hash over every 8-code-point window of the input, as a long — the
  * fingerprint base for scripts the byte-windowed form cannot serve
  * (its documented precondition is ASCII input, where byte == code
  * point; a CJK squeeze breaks it — an `ord`-based SQL oracle reads
  * code points while the byte loop reads UTF-8 fragments).
  *
  * hash(window) = Σ_{j=0..7} cp_{i+j} · 31^(7−j), minimized over the
  * max(nCp−7, 1) positions — the SAME position count and pad contract
  * as [[MinGramHash]] (out-of-range positions read as space, 32), so
  * on pure-ASCII input the two expressions are EQUAL (pinned in
  * TextExpressionProps). The oracle twin pads with 8 literal spaces
  * and reads `ord(substr(sq, i+k, 1))` — DuckDB's substr is
  * code-point-indexed, so the arithmetic matches on every plane
  * (supplementary-plane letters certified by the planted Gothic doc
  * in `text_fingerprint_chars`).
  *
  * Exactness: max code point 0x10FFFF gives h ≤ 0x10FFFF·(31^8−1)/30
  * ≈ 3.2e16 and a rolling intermediate ≤ 31·h ≈ 9.9e17 < 2^63 — exact
  * 64-bit integer math, no modular reduction, recomputable in SQL.
  *
  * Scale shape: one O(len) pass inside whole-stage codegen (the UTF-8
  * decode is the window walk), no explode, no shuffle amplification —
  * same plan shape as the byte form. Callers pass the already-squeezed
  * `\p{L}` fold (ScriptRouting.squeezedLetters); the expression hashes
  * whatever code points it is given.
  */
case class MinCharGramHash(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "min_chargram_hash"

  override protected def nullSafeEval(input: Any): Any =
    MinCharGramHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.MinCharGramHash.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): MinCharGramHash =
    copy(child = newChild)
}

object MinCharGramHash {
  private val P7 = 27512614111L // 31^7, the outgoing code point's coefficient

  /** Shared by interpreted eval and generated code: decode UTF-8 to
    * code points in one pass, then the same rolling min-hash recurrence
    * as [[MinGramHash]] over code-point values.
    */
  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    var cps = new Array[Int](math.max(n, 1)) // nCp <= byte length
    var nCp = 0
    var i = 0
    while (i < n) {
      val b0 = b(i) & 0xff
      val (cp, w) =
        if (b0 < 0x80) (b0, 1)
        else if ((b0 & 0xe0) == 0xc0)
          (((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f), 2)
        else if ((b0 & 0xf0) == 0xe0)
          (((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f), 3)
        else
          (((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
            ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f), 4)
      cps(nCp) = cp
      nCp += 1
      i += w
    }
    val m = math.max(nCp - 7, 1)
    def at(k: Int): Long = if (k < nCp) cps(k).toLong else 32L
    var h = 0L
    var j = 0
    while (j < 8) { h = h * 31L + at(j); j += 1 }
    var best = h
    var p = 1
    while (p < m) {
      h = (h - at(p - 1) * P7) * 31L + at(p + 7)
      if (h < best) best = h
      p += 1
    }
    best
  }
}

/** Codegen'd word n-gram builder: the array of space-joined n-grams
  * over the maximal letter runs of the input, in one O(len + output)
  * byte pass. Two scanner modes:
  *
  *  - `unicode = false` (the historical default): words are maximal
  *    runs of bytes in 'a'..'z' — the twin of `split(text, '[^a-z]+')`.
  *    Byte-level scanning equals the code-point regex here because
  *    'a'..'z' cannot occur inside a UTF-8 multi-byte sequence
  *    (continuation bytes are >= 0x80), so any non-ASCII character
  *    separates words exactly as `[^a-z]+` does.
  *  - `unicode = true`: words are maximal runs of code points in the
  *    Unicode letter category `\p{L}` (Lu/Ll/Lt/Lm/Lo — exactly
  *    `Character.isLetter`, which is also what Java regex `\p{L}` and
  *    RE2's `\p{L}` in DuckDB's string_split_regex match) — the twin
  *    of `split(text, '[^\p{L}]+')`. ASCII bytes classify without
  *    decoding; only bytes >= 0x80 pay a UTF-8 code-point decode, so
  *    the dominant pure-ASCII corpus case runs the same tight byte
  *    loop as the ASCII mode.
  *
  * Contract (bit-exact twin of the declarative form every oracle uses —
  * `transform(sequence(0, size(words)-n), i -> concat_ws(' ', words[i],
  * ..., words[i+n-1]))` over the mode's split, with the
  * `ELSE array(array_join(words, ' '))` short-input fallback):
  *
  *  - with >= n words: one element per window position, words joined by
  *    a single space.
  *  - with < n words (including zero): ONE element, all words joined —
  *    the empty string for wordless input — matching the fallback
  *    branch above.
  *
  * Why an expression: the declarative form is built from higher-order
  * functions, which never enter codegen — and worse, when its array
  * feeds `explode`, CollapseProject inlines the lambda into the
  * generator, which re-evaluates it per OUTPUT element: O(grams²) per
  * document. The callers ALSO materialize before exploding (the
  * barrier is what fixes the asymptotics); this expression removes the
  * remaining constant factor — the interpreted per-window expression-
  * tree walk — with a single byte loop inside whole-stage codegen.
  */
case class WordNGrams(child: Expression, n: Int, unicode: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"word_ngrams window must be >= 1 word, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n, unicode)

  // one static call per row keeps the whole-stage codegen span intact;
  // the loop itself gains nothing from being inlined as generated Java
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.WordNGrams.compute($s, $n, $unicode);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** [[WordNGrams]] with split-window semantics and NO short-input
  * fallback: an input with fewer than `n` words yields the EMPTY array
  * — the bit-exact twin of the guarded declarative form
  * `CASE WHEN size(words) >= n THEN transform(...) ELSE array() END`
  * that the substring-dedup window table uses. A separate case class
  * rather than a flag on [[WordNGrams]] so the existing expression's
  * plan rendering (and the committed plan digests of its consumers)
  * stays byte-identical.
  *
  * Why it exists (r18): the guarded form evaluates the size guard as
  * `size(letterTokens(lower(nfc(text)))) >= n` — a SECOND full
  * letter-run scan (plus its token-array allocation) per document per
  * pass, measured ~30 % of the whole window-table pass at sf0.1; the
  * n-gram scanner already counts the words it windows, so the guard
  * folds into the same single scan.
  */
case class WordNGramsExact(child: Expression, n: Int, unicode: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"word_ngrams_exact window must be >= 1 word, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams_exact"

  override protected def nullSafeEval(input: Any): Any =
    WordNGramsExact.compute(input.asInstanceOf[UTF8String], n, unicode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.WordNGramsExact.compute($s, $n, $unicode);")

  override protected def withNewChildInternal(newChild: Expression): WordNGramsExact =
    copy(child = newChild)
}

object WordNGramsExact {
  private val EMPTY =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[AnyRef])

  /** [[WordNGrams.compute]] with the < n-words branch returning the
    * empty array instead of the joined-words fallback element.
    */
  def compute(s: UTF8String, n: Int,
      unicode: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val b = s.getBytes
    val (starts, ends, nWords) = LetterRuns.scan(b, unicode)
    if (nWords < n) EMPTY
    else {
      val out = new Array[AnyRef](nWords - n + 1)
      var g = 0
      while (g < out.length) {
        out(g) = LetterRuns.join(b, starts, ends, g, g + n); g += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** Shared maximal-letter-run scanner over a UTF-8 byte array: the
  * word-boundary pass behind [[WordNGrams]] and [[LetterRunTokens]].
  */
private[graft] object LetterRuns {
  /** Fills `starts`/`ends` (byte offsets, grown as needed) with the
    * maximal letter runs of `b` and returns (starts, ends, count).
    * ASCII mode: letters are 'a'..'z' bytes. Unicode mode: letters are
    * `Character.isLetter` code points ('a'..'z' | 'A'..'Z' below 0x80;
    * decoded from UTF-8 above).
    */
  def scan(b: Array[Byte], unicode: Boolean): (Array[Int], Array[Int], Int) = {
    val len = b.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nWords = 0
    var i = 0
    while (i < len) {
      val w = letterWidth(b, i, len, unicode)
      if (w > 0) {
        val st = i
        i += w
        var ww = letterWidth(b, i, len, unicode)
        while (ww > 0) { i += ww; ww = letterWidth(b, i, len, unicode) }
        if (nWords == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nWords * 2)
          ends = java.util.Arrays.copyOf(ends, nWords * 2)
        }
        starts(nWords) = st
        ends(nWords) = i
        nWords += 1
      } else i += -w // skip the non-letter's full byte width
    }
    (starts, ends, nWords)
  }

  /** Byte width of the code point at `i` if it is a letter under the
    * mode, else the NEGATED byte width (so the caller can skip whole
    * code points either way; never 0 while i < len).
    */
  private def letterWidth(b: Array[Byte], i: Int, len: Int,
      unicode: Boolean): Int = {
    if (i >= len) return -1
    val c = b(i)
    if (c >= 0) { // ASCII: classify without decoding
      val isL =
        if (unicode) (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        else c >= 'a' && c <= 'z'
      if (isL) 1 else -1
    } else if (!unicode) -1 // ASCII mode: any non-ASCII byte separates
    else {
      // UTF-8 decode; malformed/truncated sequences classify non-letter
      // byte-by-byte (UTF8String contents are validated UTF-8, so this
      // is a total-function backstop, not a hot path)
      val b0 = c & 0xff
      if ((b0 & 0xe0) == 0xc0 && i + 1 < len) {
        val cp = ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f)
        if (Character.isLetter(cp)) 2 else -2
      } else if ((b0 & 0xf0) == 0xe0 && i + 2 < len) {
        val cp = ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        if (Character.isLetter(cp)) 3 else -3
      } else if ((b0 & 0xf8) == 0xf0 && i + 3 < len) {
        val cp = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        if (Character.isLetter(cp)) 4 else -4
      } else -1
    }
  }

  /** words[from, until) joined by single spaces, as a fresh UTF8String. */
  def join(b: Array[Byte], starts: Array[Int], ends: Array[Int],
      from: Int, until: Int): UTF8String = {
    if (until <= from) return UTF8String.EMPTY_UTF8
    var size = until - from - 1
    var k = from
    while (k < until) { size += ends(k) - starts(k); k += 1 }
    val out = new Array[Byte](size)
    var p = 0
    k = from
    while (k < until) {
      if (k > from) { out(p) = ' '; p += 1 }
      val l = ends(k) - starts(k)
      System.arraycopy(b, starts(k), out, p, l)
      p += l
      k += 1
    }
    UTF8String.fromBytes(out)
  }
}

object WordNGrams {
  /** The single-pass gram builder backing both eval paths. */
  def compute(s: UTF8String, n: Int,
      unicode: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val b = s.getBytes
    val (starts, ends, nWords) = LetterRuns.scan(b, unicode)
    if (nWords >= n) {
      val out = new Array[AnyRef](nWords - n + 1)
      var g = 0
      while (g < out.length) {
        out(g) = LetterRuns.join(b, starts, ends, g, g + n); g += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[AnyRef](LetterRuns.join(b, starts, ends, 0, nWords)))
    }
  }
}

/** Codegen'd `\p{L}`-run tokenizer: the array of maximal Unicode-letter
  * runs of the input — the bit-exact twin of
  * `filter(split(text, '[^\p{L}]+'), x -> x <> '')` (and of DuckDB's
  * `list_filter(string_split_regex(text, '[^\p{L}]+'), x -> x <> '')`),
  * with NO short-input fallback: a letterless input tokenizes to the
  * EMPTY array. Same scanner as [[WordNGrams]]' unicode mode; exists
  * as its own expression because the word-LIST consumers (SimHash
  * tokens, decontamination word base, the substring-cut word stream)
  * want split semantics, not the n-gram windowing contract.
  */
case class LetterRunTokens(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "letter_tokens"

  override protected def nullSafeEval(input: Any): Any =
    LetterRunTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.LetterRunTokens.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): LetterRunTokens =
    copy(child = newChild)
}

object LetterRunTokens {
  /** The token-array builder backing both eval paths. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val b = s.getBytes
    val (starts, ends, nWords) = LetterRuns.scan(b, unicode = true)
    val out = new Array[AnyRef](nWords)
    var k = 0
    while (k < nWords) {
      out(k) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, starts(k), ends(k)))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd character n-gram builder for UNSEGMENTED scripts: squeeze
  * the input to its `\p{L}` code points (non-letters dropped, not
  * replaced), then emit every n-code-point sliding window — the
  * bit-exact twin of the declarative form the oracle uses,
  * `list_transform(range(length(sq) - (n-1)), i -> substr(sq, i+1, n))`
  * over `sq = regexp_replace(s, '[^\p{L}]+', '', 'g')`, with the
  * `ELSE [sq]` short-input fallback (one whole-squeeze element — the
  * empty string for letterless input — mirroring [[WordNGrams]]'
  * fallback contract so a minhash base built on it stays total).
  *
  * Why it exists: WORD n-gram shingles are structurally blind on
  * scripts written without word separators — a CJK document is ONE
  * maximal letter run, so its whole text is its only shingle and a
  * near-duplicate differing by one character shares nothing. The
  * published recipe (CCNet and friends) shingles such scripts on
  * character n-grams; this expression is that base. Window positions
  * count CODE POINTS (a 4-byte supplementary-plane letter is one
  * character), matching both engines' character-indexed substr.
  *
  * Why an expression and not `transform(sequence(...), i ->
  * substring(sq, i, n))`: UTF8String.substring walks from the string
  * start to find code point i, so the declarative form is O(len²) per
  * document (the MinGramHash lesson); this is one O(len + output)
  * pass inside whole-stage codegen.
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"char_ngrams window must be >= 1 code point, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.CharNGrams.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  /** The squeeze-then-window builder backing both eval paths. */
  def compute(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val b = s.getBytes
    // squeeze: contiguous letters-only bytes, plus per-kept-code-point
    // start offsets into the squeezed buffer (windows count code
    // points, grams copy byte ranges)
    val (starts, ends, nRuns) = LetterRuns.scan(b, unicode = true)
    var sqLen = 0
    var r = 0
    while (r < nRuns) { sqLen += ends(r) - starts(r); r += 1 }
    val sq = new Array[Byte](sqLen)
    var cpStarts = new Array[Int](16)
    var nCp = 0
    var p = 0
    r = 0
    while (r < nRuns) {
      var i = starts(r)
      while (i < ends(r)) {
        if (nCp == cpStarts.length)
          cpStarts = java.util.Arrays.copyOf(cpStarts, nCp * 2)
        cpStarts(nCp) = p
        nCp += 1
        // copy one UTF-8 code point (leading byte determines width)
        val b0 = b(i) & 0xff
        val w = if (b0 < 0x80) 1
          else if ((b0 & 0xe0) == 0xc0) 2
          else if ((b0 & 0xf0) == 0xe0) 3
          else 4
        var j = 0
        while (j < w) { sq(p) = b(i); p += 1; i += 1; j += 1 }
      }
      r += 1
    }
    def slice(fromCp: Int, untilCp: Int): UTF8String = {
      val from = if (fromCp < nCp) cpStarts(fromCp) else sqLen
      val until = if (untilCp < nCp) cpStarts(untilCp) else sqLen
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(sq, from, until))
    }
    if (nCp >= n) {
      val out = new Array[AnyRef](nCp - n + 1)
      var g = 0
      while (g < out.length) { out(g) = slice(g, g + n); g += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[AnyRef](slice(0, nCp)))
    }
  }
}

/** Codegen'd `\p{L}` squeeze: the input's Unicode-letter code points
  * concatenated in order with every non-letter dropped — the bit-exact
  * twin of `regexp_replace(s, '[^\p{L}]+', '')` (Spark) and
  * `regexp_replace(s, '[^\p{L}]+', '', 'g')` (DuckDB), proven by
  * property test against the regexp form on multilingual input.
  *
  * Why an expression and not the regexp built-in: the squeeze is the
  * [[graft.operators.ScriptRouting]] letter-mass pass that EVERY routed
  * operator (script routing, char-gram dedup, routed langid/quality/
  * fingerprint/packing/repetition) computes over every document, and
  * `regexp_replace` runs a java.util.regex NFA over each row where this
  * is one branch-predictable byte scan over the same [[LetterRuns]]
  * classifier the tokenizer family already trusts — same answer,
  * measured ~3-7× cheaper per pass at sf0.1 (OPTIMIZATION_r17.md).
  * Letter classification is `Character.isLetter` per code point,
  * identical to Java regex `\p{L}` (both are general category L).
  */
case class LetterSqueeze(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "squeeze_letters"

  override protected def nullSafeEval(input: Any): Any =
    LetterSqueeze.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.LetterSqueeze.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): LetterSqueeze =
    copy(child = newChild)
}

object LetterSqueeze {
  /** The squeeze builder backing both eval paths. All-letter input
    * (the common case for already-squeezed or single-script text)
    * returns the input object unchanged — no allocation.
    */
  def compute(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val (starts, ends, nRuns) = LetterRuns.scan(b, unicode = true)
    if (nRuns == 0) return UTF8String.EMPTY_UTF8
    if (nRuns == 1 && starts(0) == 0 && ends(0) == b.length) return s
    var size = 0
    var r = 0
    while (r < nRuns) { size += ends(r) - starts(r); r += 1 }
    val out = new Array[Byte](size)
    var p = 0
    r = 0
    while (r < nRuns) {
      val l = ends(r) - starts(r)
      System.arraycopy(b, starts(r), out, p, l)
      p += l
      r += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Codegen'd ASCII-lowercase-letter counter: the number of 'a'..'z'
  * CODE POINTS in the input, as int — so that
  * `length(regexp_replace(sq, '[a-z]+', ''))` (the non-ASCII letter
  * mass the routing majority reads) rewrites to
  * `length(sq) - ascii_letter_count(sq)` with no regex pass. In valid
  * UTF-8 an 'a'..'z' byte IS a standalone code point (continuation
  * bytes are ≥ 0x80), so one byte scan counts code points exactly.
  */
case class AsciiLetterCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_letter_count"

  override protected def nullSafeEval(input: Any): Any =
    AsciiLetterCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.AsciiLetterCount.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): AsciiLetterCount =
    copy(child = newChild)
}

object AsciiLetterCount {
  def compute(s: UTF8String): Int = {
    val b = s.getBytes
    var n = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') n += 1
      i += 1
    }
    n
  }
}

/** Codegen'd per-Unicode-script code-point counter: for each script
  * name in `scripts`, the number of input code points whose
  * `Character.UnicodeScript` is that script, as array<long> in the
  * given order — so that the langid family's per-class
  * `length(regexp_replace(sq, '[^\p{IsXxx}]+', ''))` columns (one java
  * regex NFA pass over every document PER CLASS) rewrite to element
  * lookups over ONE code-point scan. Java regex `\p{IsXxx}` is defined
  * as `UnicodeScript.forName("Xxx")` membership, so the counts are
  * bit-identical; the property spec proves it per class on
  * multilingual input.
  */
case class ScriptCounts(child: Expression, scripts: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(scripts.nonEmpty, "script_counts needs at least one script name")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "script_counts"

  @transient private lazy val resolvedScripts: Array[Character.UnicodeScript] =
    scripts.map(Character.UnicodeScript.forName).toArray

  override protected def nullSafeEval(input: Any): Any =
    ScriptCounts.compute(input.asInstanceOf[UTF8String], resolvedScripts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scripts", resolvedScripts,
      "java.lang.Character.UnicodeScript[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.ScriptCounts.compute($s, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {
  /** One UTF-8 decode pass; malformed sequences (impossible in a valid
    * UTF8String; total-function backstop) count toward no script.
    */
  def compute(s: UTF8String,
      scripts: Array[Character.UnicodeScript]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.getBytes
    val len = b.length
    val counts = new Array[Long](scripts.length)
    var i = 0
    while (i < len) {
      val b0 = b(i) & 0xff
      var cp = -1
      var w = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xe0) == 0xc0 && i + 1 < len) {
        cp = ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f); w = 2
      } else if ((b0 & 0xf0) == 0xe0 && i + 2 < len) {
        cp = ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f); w = 3
      } else if ((b0 & 0xf8) == 0xf0 && i + 3 < len) {
        cp = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f); w = 4
      }
      if (cp >= 0) {
        val sc = Character.UnicodeScript.of(cp)
        var k = 0
        while (k < scripts.length) {
          if (scripts(k) eq sc) counts(k) += 1
          k += 1
        }
      }
      i += w
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(counts)
  }
}

/** Codegen'd PII scrub scan: one pass over the raw bytes computing the
  * whole `text_pii_scrub` row base as
  * struct(n_emails: long, n_digit_runs: long, scrubbed: string) — the
  * bit-exact twin of the java-regex chain
  *
  *   n_emails     = size(regexp_extract_all(text, E, 0))
  *   scrubbed1    = regexp_replace(text, E, '<EMAIL>')
  *   n_digit_runs = size(regexp_extract_all(scrubbed1, D, 0))
  *   scrubbed     = regexp_replace(scrubbed1, D, '<NUM>')
  *
  * with E = `[a-z0-9._-]+@[a-z0-9.-]+` and D = `[0-9]{6,}` (the
  * DuckDB oracle keeps exactly that regexp spelling, so the oracle
  * hash-match proves the rewrite; TextExpressionProps proves it
  * per-row against the java.util.regex reference on adversarial
  * generators).
  *
  * Why a scanner can be exact here: both patterns are ASCII character
  * classes. For E, `A+@B+` with A = [a-z0-9._-], B = [a-z0-9.-]:
  * greedy A+ takes the maximal A-run, and since '@' ∉ A no backtracked
  * shorter run can expose an '@' — so a match starting at i exists iff
  * the maximal A-run from i ends at an '@' with a B char after it, and
  * the leftmost-match rule means the run's FIRST position wins. For D,
  * greedy `{6,}` matches exactly the maximal digit runs of length ≥ 6.
  * Both classes are pure ASCII, and in valid UTF-8 no multi-byte
  * sequence contains ASCII bytes, so the byte scan sees exactly the
  * code points the regex engine sees. One subtlety the scanner keeps:
  * scanning resumes AT the match end (a '_' right after a matched
  * B-run can start the next email's A-run, e.g. `a@b_c@d` → two
  * matches), matching find()'s continuation semantics.
  *
  * Why an expression: the regex chain runs FIVE java.util.regex NFA
  * passes per row (plus two full scrubbed-copy materializations);
  * this is two branch-predictable byte scans building each output
  * once. The three struct fields are consumed from ONE evaluation via
  * whole-stage codegen subexpression elimination (verified in the
  * committed plan/codegen).
  */
case class PiiScan(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_digit_runs", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_scan"

  override protected def nullSafeEval(input: Any): Any =
    PiiScan.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.PiiScan.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}

object PiiScan {
  private val EMAIL = "<EMAIL>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val NUM = "<NUM>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  // E's local-part class [a-z0-9._-]
  private def isA(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      b == '.' || b == '_' || b == '-'
  // E's domain class [a-z0-9.-]
  private def isB(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      b == '.' || b == '-'
  private def isD(b: Byte): Boolean = b >= '0' && b <= '9'

  /** The two-scan scrub backing both eval paths; see the class doc for
    * the exactness argument.
    */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    // pass 1: emails over the raw bytes
    var nEmails = 0L
    var t = b // unchanged input reused when no email matches
    var m = n
    var i = 0
    var out: java.io.ByteArrayOutputStream = null
    var copyFrom = 0
    while (i < n) {
      if (isA(b(i))) {
        var j = i + 1
        while (j < n && isA(b(j))) j += 1
        if (j < n && b(j) == '@' && j + 1 < n && isB(b(j + 1))) {
          var k = j + 2
          while (k < n && isB(b(k))) k += 1
          if (out == null) out = new java.io.ByteArrayOutputStream(n + 16)
          out.write(b, copyFrom, i - copyFrom)
          out.write(EMAIL, 0, EMAIL.length)
          nEmails += 1
          copyFrom = k
          i = k
        } else i = j
      } else i += 1
    }
    if (out != null) {
      out.write(b, copyFrom, n - copyFrom)
      t = out.toByteArray
      m = t.length
    }
    // pass 2: maximal digit runs of length >= 6 over the email-scrubbed
    // bytes
    var nDigits = 0L
    var r = t
    var out2: java.io.ByteArrayOutputStream = null
    i = 0
    copyFrom = 0
    while (i < m) {
      if (isD(t(i))) {
        var j = i + 1
        while (j < m && isD(t(j))) j += 1
        if (j - i >= 6) {
          if (out2 == null) out2 = new java.io.ByteArrayOutputStream(m + 16)
          out2.write(t, copyFrom, i - copyFrom)
          out2.write(NUM, 0, NUM.length)
          nDigits += 1
          copyFrom = j
        }
        i = j
      } else i += 1
    }
    if (out2 != null) {
      out2.write(t, copyFrom, m - copyFrom)
      r = out2.toByteArray
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nEmails, nDigits, UTF8String.fromBytes(r)))
  }
}

/** Column-level entry points for the text expressions. */
object TextColumns {
  /** Min base-31 8-gram hash of a string column, as long. */
  def minGramHash(c: Column): Column =
    ExpressionUtils.column(MinGramHash(ExpressionUtils.expression(c)))

  /** Min base-31 8-CODE-POINT-gram hash of a string column, as long —
    * the fingerprint base for non-ASCII (unsegmented-script) text.
    */
  def minCharGramHash(c: Column): Column =
    ExpressionUtils.column(MinCharGramHash(ExpressionUtils.expression(c)))

  /** Space-joined word n-grams of a string column, as array<string>
    * (ASCII `[a-z]`-run words).
    */
  def wordNGrams(c: Column, n: Int): Column =
    ExpressionUtils.column(WordNGrams(ExpressionUtils.expression(c), n))

  /** Space-joined word n-grams over Unicode `\p{L}`-run words — the
    * multilingual twin of [[wordNGrams]].
    */
  def wordNGramsU(c: Column, n: Int): Column =
    ExpressionUtils.column(
      WordNGrams(ExpressionUtils.expression(c), n, unicode = true))

  /** Space-joined word n-grams over Unicode `\p{L}`-run words with NO
    * short-input fallback: fewer than n words → empty array (the
    * guarded window-table contract, one scan).
    */
  def wordNGramsUExact(c: Column, n: Int): Column =
    ExpressionUtils.column(
      WordNGramsExact(ExpressionUtils.expression(c), n, unicode = true))

  /** Maximal `\p{L}`-run tokens of a string column, as array<string>
    * (empty array for letterless input — split semantics, no fallback).
    */
  def letterTokens(c: Column): Column =
    ExpressionUtils.column(LetterRunTokens(ExpressionUtils.expression(c)))

  /** One-pass PII scrub scan of a string column:
    * struct(n_emails, n_digit_runs, scrubbed) — the codegen'd twin of
    * the email/digit-run regex chain (see [[PiiScan]]).
    */
  def piiScan(c: Column): Column =
    ExpressionUtils.column(PiiScan(ExpressionUtils.expression(c)))

  /** Sliding n-code-point grams over the `\p{L}`-squeezed string — the
    * shingle base for unsegmented scripts (CJK), as array<string>.
    */
  def charNGrams(c: Column, n: Int): Column =
    ExpressionUtils.column(CharNGrams(ExpressionUtils.expression(c), n))

  /** The `\p{L}` squeeze of a string column: all Unicode-letter code
    * points concatenated, non-letters dropped (≡ `regexp_replace(c,
    * '[^\p{L}]+', '')`, one byte scan instead of a regex pass).
    */
  def squeezeLetters(c: Column): Column =
    ExpressionUtils.column(LetterSqueeze(ExpressionUtils.expression(c)))

  /** Count of 'a'..'z' code points of a string column, as int. */
  def asciiLetterCount(c: Column): Column =
    ExpressionUtils.column(AsciiLetterCount(ExpressionUtils.expression(c)))

  /** Per-script code-point counts of a string column, as array<long>
    * aligned with `scripts` (names as `Character.UnicodeScript.forName`
    * / java regex `\p{IsXxx}` spell them).
    */
  def scriptCounts(c: Column, scripts: Seq[String]): Column =
    ExpressionUtils.column(ScriptCounts(ExpressionUtils.expression(c), scripts))

  /** Unicode NFC normalization of a string column (identity on ASCII). */
  def nfc(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))

  /** Unicode FULL case folding of a string column (ICU default C+F). */
  def casefold(c: Column): Column =
    ExpressionUtils.column(CaseFold(ExpressionUtils.expression(c)))
}

/** Unicode NFC normalization (UAX#15 canonical composition) as a
  * codegen'd scalar — the ingest-side normalization pass a multilingual
  * dedup key needs BEFORE case folding, which Spark SQL has no built-in
  * for (UnicodeFoldSpec pins the gap: `lower()` never normalizes, so
  * precomposed and decomposed spellings of the same word survive any
  * case-folded key as distinct bytes in every engine).
  *
  * Semantics are `java.text.Normalizer.normalize(s, NFC)` exactly; the
  * DuckDB oracle twin is `nfc_normalize(s)` (utf8proc) — both implement
  * UAX#15, and the cross-engine agreement on the contract query's input
  * class (Latin scripts) is what the oracle certifies. The engines'
  * CASE MAPPING tables still differ on İ/final-sigma (see
  * UnicodeFoldSpec); normalization is orthogonal to that gap, so
  * contract queries fold only script classes where the mappings agree.
  *
  * Scale shape: row-local, one pass; the dominant corpus case (pure
  * ASCII, where NFC is the identity) returns the INPUT UTF8String
  * untouched after a byte scan — no String materialization, no
  * allocation — so the normalization tax is paid only by rows that can
  * actually need it (any byte >= 0x80).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.NfcNormalize.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. ASCII fast path:
    * NFC is the identity on ASCII (no combining sequences, no
    * compositions), and UTF-8 marks every non-ASCII byte with the high
    * bit, so one sign scan decides reuse-vs-normalize.
    */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Unicode FULL case folding (UAX "C + F" default folding, ICU
  * `UCharacter.foldCase`) as a codegen'd scalar — the operation
  * "case-insensitive" actually promises and `lower()` is not
  * (UnicodeFoldSpec pins the gap on both engines): folding maps
  * sharp-s to "ss" and BOTH sigma forms to the single medial sigma,
  * position-independently, so every case/position spelling of a word
  * lands on one key. Combined with [[NfcNormalize]] (fold does NOT
  * normalize — composed/decomposed inputs stay distinct), the
  * multilingual dedup key is `casefold(nfc(text))`.
  *
  * Deliberately NOT a contract query's key: DuckDB has no case-folding
  * function, so no cross-engine oracle exists — which is itself the
  * measured state of the ecosystem the fold/lower() distinction lives
  * in. The semantics are pinned spec-side instead (UnicodeFoldSpec
  * exact outputs; TextExpressionProps codegen/interpreted/ICU-reference
  * agreement). ICU4J is Spark 4's own bundled collation dependency —
  * no new library.
  *
  * Scale shape: row-local; pure-ASCII rows (the dominant corpus case)
  * fold in a byte scan — identity reuse when already lowercase, a
  * single byte-mapped copy otherwise — and only rows with a byte >=
  * 0x80 pay the ICU path.
  */
case class CaseFold(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "casefold"

  override protected def nullSafeEval(input: Any): Any =
    CaseFold.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.CaseFold.fold($s)")

  override protected def withNewChildInternal(newChild: Expression): CaseFold =
    copy(child = newChild)
}

object CaseFold {
  /** Shared by interpreted eval and generated code. ASCII folding is
    * exactly ASCII lowercasing (CaseFolding.txt maps A-Z to a-z and
    * nothing else below 0x80), so the scan classifies each row once:
    * already-folded ASCII returns the input object, upper-bearing
    * ASCII folds in one byte-mapped copy, anything non-ASCII goes
    * through ICU's full default (C+F) folding.
    */
  def fold(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    var upper = false
    while (ascii && i < n) {
      val b = s.getByte(i)
      if (b < 0) ascii = false
      else if (b >= 'A' && b <= 'Z') upper = true
      i += 1
    }
    if (ascii && !upper) s
    else if (ascii) {
      val out = new Array[Byte](n)
      var j = 0
      while (j < n) {
        val b = s.getByte(j)
        out(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        j += 1
      }
      UTF8String.fromBytes(out)
    } else UTF8String.fromString(com.ibm.icu.lang.UCharacter.foldCase(
      s.toString, com.ibm.icu.lang.UCharacter.FOLD_CASE_DEFAULT))
  }
}
