package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql("... vec_dot(a,
  * b) ...")` works alongside the Column API ([[VectorColumns]]).
  *
  * Install via `SparkSession.builder().withExtensions(new
  * GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** One registration path for every function: arity is checked with the
    * standard WRONG_NUM_ARGS AnalysisException (the builder runs inside
    * the analyzer — a wrong arity is a user error that must carry the
    * error class + position the way built-ins report it), and the
    * ExpressionInfo carries usage text so `DESCRIBE FUNCTION` documents
    * the semantics instead of showing "N/A".
    */
  private def register(ext: SparkSessionExtensions, name: String,
      className: String, arity: Int, usage: String)(
      build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(className, null, name, usage, ""),
      (children: Seq[Expression]) => {
        if (children.length != arity)
          throw org.apache.spark.sql.errors.QueryCompilationErrors
            .wrongNumArgsError(name, Seq(arity), children.length)
        build(children)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "vec_dot", classOf[DotProductD].getName, 2,
      "vec_dot(a, b) - Dot product of two float/double arrays as DOUBLE, " +
        "accumulated strictly left-to-right. Returns NULL if either array " +
        "is NULL, contains a NULL element, or the lengths differ.")(
      c => DotProductD(c.head, c(1)))
    register(ext, "min_gram_hash", classOf[MinGramHash].getName, 1,
      "min_gram_hash(s) - Minimum base-31 polynomial hash over the " +
        "complete 8-byte windows of s (inputs shorter than 8 bytes hash " +
        "one space-padded window) as BIGINT; intended for ASCII-normalized " +
        "text fingerprinting. Returns NULL on NULL input.")(
      c => MinGramHash(c.head))
    register(ext, "min_chargram_hash", classOf[MinCharGramHash].getName, 1,
      "min_chargram_hash(s) - Minimum base-31 polynomial hash over the " +
        "complete 8-CODE-POINT windows of s (inputs shorter than 8 code " +
        "points hash one space-padded window) as BIGINT; the non-ASCII " +
        "twin of min_gram_hash for unsegmented-script fingerprinting. " +
        "Returns NULL on NULL input.")(
      c => MinCharGramHash(c.head))
    register(ext, "word_ngrams", classOf[WordNGrams].getName, 2,
      "word_ngrams(s, n) - Array of space-joined n-grams over the " +
        "maximal [a-z] runs of s (n a literal INT >= 1). With fewer than " +
        "n words the array holds ONE element: all words joined (the " +
        "empty string for wordless input). Returns NULL on NULL input.")(
      c => c(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)
            if v >= 1 => WordNGrams(c.head, v)
        case _ => throw org.apache.spark.sql.errors.QueryCompilationErrors
          .nonFoldableArgumentError("word_ngrams", "n",
            org.apache.spark.sql.types.IntegerType)
      })
    register(ext, "nfc", classOf[NfcNormalize].getName, 1,
      "nfc(s) - Unicode NFC normalization (UAX#15 canonical " +
        "composition), java.text.Normalizer semantics; the identity on " +
        "ASCII input (returned without allocation). The ingest-side pass " +
        "a multilingual dedup key applies BEFORE case folding. Returns " +
        "NULL on NULL input.")(
      c => NfcNormalize(c.head))
    register(ext, "casefold", classOf[CaseFold].getName, 1,
      "casefold(s) - Unicode FULL case folding (ICU default C+F: " +
        "sharp-s folds to ss, all sigma forms to medial sigma, " +
        "position-independent) - the operation lower() is not. Fold " +
        "AFTER nfc(): folding never normalizes. ASCII rows fold in a " +
        "byte scan. Returns NULL on NULL input.")(
      c => CaseFold(c.head))
  }
}
