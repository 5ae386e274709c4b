package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THE script-routing predicate — the tokenizer dispatch the whole
  * near-dup/gram family routes on, defined ONCE (round-16 advice: the
  * same squeeze+majority arithmetic lived in four copies across
  * `Dedup.unsegmentedOnly`, `TextAnalysis.scriptRoute`, and both of
  * their oracles; the `stream_corpus_gate` shared-policy precedent says
  * a policy consumed by more than one operator gets one definition).
  *
  * Semantics: squeeze the normalized fold `lower(nfc(text))` to its
  * `\p{L}` code points, then classify by letter mass —
  *  - `letterless`: no letters at all (no text-dedup base applies; in
  *    particular this retires the degenerate `""` fallback shingle
  *    under which every letterless doc would pair at 1.0);
  *  - `latin`: ASCII letters are at least half the letter mass → the
  *    word-shingle bases (whitespace-segmented scripts);
  *  - `nonlatin` (a.k.a. UNSEGMENTED here): majority non-ASCII letters
  *    → the char-gram bases, because scripts written without word
  *    separators make a whole document ONE `\p{L}` run and word
  *    shingling structurally blind.
  * Pure integer arithmetic on code-point counts, so the decision is
  * bit-reproducible cross-engine (`text_script_route` certifies it on
  * planted 2/3/4-byte docs every run).
  *
  * Case-fold caveat (round-16 advice, documented at the one site that
  * now owns the fold): the squeeze folds with `lower()`, and JVM full
  * lowercasing diverges from DuckDB's utf8proc simple mapping on a
  * small class of characters — e.g. U+0130 (LATIN CAPITAL LETTER I
  * WITH DOT ABOVE) lowers to "i" + U+0307 in Java (a combining mark
  * that is NOT `\p{L}`, so it splits/shrinks the letter squeeze) but
  * to a single code point in DuckDB. A real corpus containing such
  * characters can therefore route/shingle differently between Spark
  * and the oracle; the planted contract docs deliberately avoid the
  * class (all planted non-ASCII letters are unaffected by `lower()`
  * or map 1→1 identically in both engines — `text_casefold_key`
  * documents the same exclusion for the exact-dedup key). The
  * production-correct fold for those scripts is the spec-gated
  * `casefold(nfc)` path (UnicodeFoldSpec), which has no DuckDB twin
  * and so cannot sit under a cross-engine contract row.
  *
  * Scale: one row-local regexp pass per document, no shuffle — cheap
  * enough to compute as a side effect of any scan. Production
  * pipelines take the class from langid where available and keep this
  * as the structural fallback for unidentified languages.
  */
private[operators] object ScriptRouting {

  /** `lower(nfc(text))` squeezed to its `\p{L}` code points — the
    * letter mass every routing count reads. The squeeze is the
    * codegen'd [[org.apache.spark.sql.graft.LetterSqueeze]] byte scan,
    * bit-equal to the previous `regexp_replace(…, "[^\p{L}]+", "")`
    * form (property-tested in TextExpressionProps; the oracle twin
    * [[sqSql]] keeps the regexp spelling) — r17 optimization: one scan
    * instead of a java.util.regex pass per document, on the hottest
    * shared column of the routed family.
    */
  def squeezedLetters(text: Column): Column =
    org.apache.spark.sql.graft.TextColumns.squeezeLetters(
      lower(org.apache.spark.sql.graft.TextColumns.nfc(text)))

  /** Majority non-ASCII letters over a squeeze column — true exactly
    * for the `nonlatin` class (a letterless squeeze is false: 0·2 > 0
    * fails, so the degenerate docs drop out of every consumer that
    * filters on this). Non-ASCII letter mass is
    * `length − ascii_letter_count` (one byte scan), ≡ the oracle's
    * `length(regexp_replace(sq, '[a-z]+', ''))`: every non-[a-z] code
    * point of the squeeze survives that replace.
    */
  def unsegmented(sq: Column): Column =
    (length(sq) - org.apache.spark.sql.graft.TextColumns
      .asciiLetterCount(sq)) * 2 > length(sq)

  /** Letters present AND ASCII-majority — the word-shingle class. */
  def latin(sq: Column): Column =
    length(sq) > 0 && !unsegmented(sq)

  /** Keep only the unsegmented-majority docs of a (…, text, …) frame —
    * the char-gram bases' routed front door. The squeeze column is
    * computed and dropped here so callers never see it.
    */
  def unsegmentedOnly(df: DataFrame): DataFrame =
    df.withColumn("sq", squeezedLetters(col("text")))
      .filter(unsegmented(col("sq")))
      .drop("sq")

  // ---- DuckDB twins (one definition per engine, not per consumer) ----

  /** The squeeze as a SQL expression over a `text` column in scope. */
  val sqSql: String =
    "regexp_replace(lower(nfc_normalize(text)), '[^\\p{L}]+', '', 'g')"

  /** [[unsegmented]] over a squeeze expression/column name. */
  def unsegmentedSql(sq: String): String =
    s"length(regexp_replace($sq, '[a-z]+', '', 'g')) * 2 > length($sq)"

  /** [[latin]] over a squeeze expression/column name. */
  def latinSql(sq: String): String =
    s"(length($sq) > 0 AND NOT (${unsegmentedSql(sq)}))"
}
