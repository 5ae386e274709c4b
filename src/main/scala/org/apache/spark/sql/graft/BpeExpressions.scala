/* Placed under org.apache.spark.sql for the same reason as
 * VectorExpressions: the private[sql] Column<->Expression bridge. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rank-indexed greedy BPE application — the tokenizer APPLY path at a
  * production merge count.
  *
  * The trainer (graft.operators.TextAnalysis.bpeRounds) learns merges
  * by sequential replay: round k rewrites the whole vocabulary with
  * merge k's literal pattern before round k+1 looks at anything. That
  * is the right shape for TRAINING (each round's pair counts must see
  * the previous round applied), but as an ENCODER it prices at
  * O(merges) passes per corpus — ~0.05 s/round × 32,768 merges ≈ 28
  * minutes per corpus pass at the measured per-round constant,
  * REGARDLESS of corpus size, because the cost is per-merge driver/job
  * overhead, not data work.
  *
  * This encoder is the standard production alternative (the algorithm
  * inside every deployed BPE tokenizer): hash the learned pair list to
  * ranks once, then per word repeatedly merge the LOWEST-RANK adjacent
  * pair present until none matches. Cost per word is O(len²) symbol
  * scans with O(1) rank lookups — INDEPENDENT of merge-list length —
  * and the whole corpus encodes in one codegen'd scan stage: no
  * shuffle, no per-merge jobs, no driver round trips.
  *
  * Equivalence with sequential replay (why the train-side oracle can
  * gate this encoder): applying the currently-lowest-ranked pair
  * exhaustively, then the next, replays merges in exactly training
  * order, because a merge can only CREATE pairs that involve its
  * output symbol, and any learned rule consuming that symbol was
  * learned later — i.e. has a HIGHER rank. So no merge ever re-creates
  * work for an earlier rank, "exhaust rank 0, then rank 1, ..."
  * (replay) equals "exhaust the minimum rank present, repeat"
  * (greedy), and each rank is selected at most once per word — the
  * outer loop is bounded by the word's pair count, never the
  * merge-list length. WITHIN a rank the occurrence choice must be the
  * trainer's, not the canonical leftmost-one-at-a-time (see
  * [[encodeWord]]: odd chains diverge between the two). The
  * text_bpe_encode_rank contract query re-proves the identity per run
  * against the replay-built DuckDB oracle, and BpeMergeSpec pins the
  * planted chain cases (overlapping runs like `a a a a a`, where the
  * naive greedy provably differs).
  *
  * Word seeding matches the trainer exactly: characters as single
  * symbols plus the terminal `</w>` marker. `</w>` contains no
  * lowercase letter and no space, so the `"a b"` rank key (symbols
  * joined by one space) is collision-free — trained symbols are
  * concatenations of [a-z] runs and the marker, never containing a
  * space themselves.
  */
final class BpeEncoder(val pairs: Array[(String, String)])
    extends Serializable {

  /* Fail fast on merge lists where greedy-by-rank and sequential replay
   * can diverge. The equivalence argument above needs every rule that
   * CONSUMES a symbol to be ranked after the rule that CREATES it —
   * which holds for any faithfully-trained list but not for an
   * arbitrary one, and silently breaks if two rules produce the same
   * output string (then a consumer ranked between them fires in greedy
   * on the later creator's output but not in replay). Validate both
   * halves in one pass: each input symbol must be a seed (single char
   * or the `</w>` marker) or the output of an EARLIER rule, and
   * outputs must be distinct. Runs once at construction on the driver
   * (Java deserialization bypasses the constructor), O(merges).
   */
  locally {
    val produced = new java.util.HashSet[String](pairs.length * 2)
    // "single char" counts CODE POINTS, not UTF-16 units: a
    // supplementary-plane seed character is two Java chars, and
    // sym.length == 1 would falsely reject it (unreachable under the
    // contract's ASCII [a-z] seed tokenizer, but this class validates
    // ARBITRARY stored merge lists via readTokenizer)
    def seedOrProduced(sym: String): Boolean =
      sym.codePointCount(0, sym.length) == 1 || sym == "</w>" ||
        produced.contains(sym)
    var i = 0
    while (i < pairs.length) {
      val (a, b) = pairs(i)
      require(seedOrProduced(a) && seedOrProduced(b),
        s"BPE merge list unsound at rank $i: input of ('$a','$b') is not a " +
          "seed symbol or an earlier rule's output - greedy-by-rank would " +
          "diverge from sequential replay")
      require(produced.add(a + b),
        s"BPE merge list ambiguous at rank $i: output '${a + b}' is already " +
          "produced by an earlier rule - greedy-by-rank would diverge from " +
          "sequential replay")
      i += 1
    }
  }

  /** pair "a b" -> rank (training order). Rebuilt lazily after task
    * deserialization; each task gets its own instance, so no sharing.
    */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      m.put(pairs(i)._1 + " " + pairs(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Per-task memo of word -> encoded symbol count: corpora repeat
    * words (Zipf), so most lookups hit. Capped so an adversarial
    * vocabulary cannot grow task memory unboundedly; eviction is
    * whole-clear (the cap is far above any natural working set, so a
    * clear is a once-per-pathological-corpus event, not a cycle).
    */
  @transient private lazy val countMemo =
    new java.util.HashMap[String, Integer](1 << 12)
  private val MEMO_CAP = 1 << 16

  /** Greedy min-rank merge of one word; returns the symbol sequence.
    *
    * Each selected rank is applied with the trainer's EXACT occurrence
    * semantics — two left-to-right non-overlapping passes where a
    * merge consumes the following boundary, so the next match starts
    * two symbols later (the literal `' a b '` replace consumes its
    * trailing space, and a match needs a leading one). This is NOT the
    * canonical always-leftmost greedy: on an odd run `a a a a a` the
    * replay merges occurrences (1,2) and (4,5), leaving the MIDDLE
    * singleton, where always-leftmost would merge (1,2),(3,4) and
    * leave the last — the two diverge, and the oracle (and the
    * trainer) implement the replay form, so this encoder does too.
    */
  def encodeWord(w: String): Array[String] = {
    val n = w.length
    val syms = new java.util.ArrayList[String](n + 1)
    var i = 0
    while (i < n) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    syms.add("</w>")
    var continue = syms.size >= 2
    while (continue) {
      var best = Integer.MAX_VALUE
      var j = 0
      var sz = syms.size
      while (j < sz - 1) {
        val r = rank.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Integer.MAX_VALUE) continue = false
      else {
        val (a, b) = pairs(best)
        val merged = a + b
        var pass = 0
        while (pass < 2) {
          var k = 0
          while (k < syms.size - 1) {
            if (syms.get(k) == a && syms.get(k + 1) == b) {
              syms.set(k, merged)
              syms.remove(k + 1)
              k += 2 // boundary consumed: next match starts 2 symbols on
            } else k += 1
          }
          pass += 1
        }
        sz = syms.size
        if (sz < 2) continue = false
      }
    }
    val out = new Array[String](syms.size)
    syms.toArray(out)
    out
  }

  /** Encoded symbol sequence of one word, space-joined (the trainer's
    * `seq` column representation).
    */
  def encodeJoined(w: UTF8String): UTF8String =
    UTF8String.fromString(String.join(" ", encodeWord(w.toString): _*))

  private def countWord(w: String): Int = {
    val hit = countMemo.get(w)
    if (hit != null) return hit.intValue()
    val c = encodeWord(w).length
    if (countMemo.size >= MEMO_CAP) countMemo.clear()
    countMemo.put(w, Integer.valueOf(c))
    c
  }

  /** Total encoded token count of a whole document: tokenize maximal
    * `[a-z]` byte runs (exactly the trainer's seed tokenization — byte
    * scanning equals the code-point regex because 'a'..'z' cannot occur
    * inside a UTF-8 multi-byte sequence) and sum each word's encoded
    * length. One O(len) pass per document plus the per-word merges.
    */
  def countText(s: UTF8String): Long = {
    val b = s.getBytes
    val len = b.length
    var total = 0L
    var i = 0
    while (i < len) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') {
        val st = i
        while (i < len && b(i) >= 'a' && b(i) <= 'z') i += 1
        total += countWord(new String(b, st, i - st,
          java.nio.charset.StandardCharsets.US_ASCII))
      } else i += 1
    }
    total
  }
}

/** `bpe_rank_encode(word)` — the encoded symbol sequence of one WORD,
  * space-joined, under the constructor's learned merge list. Output is
  * bit-identical to what sequential replay of the same merges leaves
  * in the trainer's `seq` column (see [[BpeEncoder]] equivalence note).
  */
case class BpeRankEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_rank_encode"

  @transient private lazy val enc = new BpeEncoder(merges.toArray)

  override protected def nullSafeEval(input: Any): Any =
    enc.encodeJoined(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEnc", enc,
      classOf[BpeEncoder].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.encodeJoined($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeRankEncode =
    copy(child = newChild)
}

/** `bpe_rank_count(text)` — total encoded token count of a whole
  * document under the constructor's merge list: the per-corpus-pass
  * cost a training pipeline actually pays, in one codegen'd expression
  * per row (tokenize + greedy-merge + sum; no explode, no shuffle).
  */
case class BpeRankCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_rank_count"

  @transient private lazy val enc = new BpeEncoder(merges.toArray)

  override protected def nullSafeEval(input: Any): Any =
    enc.countText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEnc", enc,
      classOf[BpeEncoder].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.countText($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeRankCount =
    copy(child = newChild)
}

/** Column-level entry points for the BPE apply path. */
object BpeColumns {
  def bpeRankEncode(c: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeRankEncode(ExpressionUtils.expression(c), merges))

  def bpeRankCount(c: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeRankCount(ExpressionUtils.expression(c), merges))
}
