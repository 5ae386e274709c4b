package graft

import org.apache.spark.sql.functions._

/** Case-folding / normalization divergence on non-ASCII text, pinned as
  * EXECUTABLE FACT instead of avoided. `text_tokens_unicode` (round 12)
  * deliberately keeps `lower()` off non-ASCII input because the engines
  * genuinely diverge there; this spec characterizes exactly WHERE, by
  * pushing planted multilingual documents through a case-folded dedup
  * key (`lower(text)` --- the key a real multilingual near-dup pipeline
  * would reach for first) and asserting this engine's grouping
  * verbatim, with the other engine's measured outputs written down
  * beside it. All non-ASCII is spelled in \u escapes so the pinned
  * bytes cannot be silently re-normalized by an editor.
  *
  * Per-engine ground truth on the planted strings (Spark side asserted
  * below under the session's configured `icu.caseMappings.enabled=false`
  * --- JVM `String.toLowerCase(Locale.ROOT)`, i.e. full Unicode case
  * mapping with SpecialCasing context rules; DuckDB side measured on
  * DuckDB 1.0.0, whose `lower()` is utf8proc SIMPLE per-codepoint
  * mapping):
  *
  *  | input                   | Spark/JVM lower()           | DuckDB lower()       |
  *  |-------------------------|-----------------------------|----------------------|
  *  | STRASSE                 | strasse                     | strasse (agree)      |
  *  | Stra{U+00DF}e           | stra{U+00DF}e (sharp-s kept)| stra{U+00DF}e (agree)|
  *  | {U+0130}stanbul         | i{U+0307}stanbul            | istanbul (plain i)   |
  *  | {Greek ODOS, capital}   | ...{U+03C2} (final sigma)   | ...{U+03C3} (medial) |
  *  | caf{U+00E9} (NFC)       | caf{U+00E9}                 | caf{U+00E9} (agree)  |
  *  | cafe{U+0301} (NFD)      | cafe{U+0301}                | cafe{U+0301} (agree) |
  *
  * Consequences for a case-folded dedup key, which the tests below pin:
  *  - sharp s: BOTH engines keep Stra{U+00DF}e != STRASSE (simple
  *    lowercase is not full case folding; folding {U+00DF}->ss needs an
  *    explicit rule) --- an agreement, but a trap vs. what
  *    "case-insensitive" promises.
  *  - {U+0130} (LATIN CAPITAL LETTER I WITH DOT ABOVE): the engines
  *    produce DIFFERENT keys (i{U+0307}stanbul vs plain istanbul), so a
  *    Spark-side dedup and a DuckDB-side dedup of the same Turkish
  *    corpus disagree on which docs collide --- this is why no contract
  *    query case-folds non-ASCII text: the oracle comparison would be
  *    comparing case mapping tables, not the operator under test.
  *  - Final sigma: Spark's context rule maps the capital Greek spelling
  *    onto the SAME key as the lowercase spelling with final {U+03C2};
  *    DuckDB's simple mapping yields medial {U+03C3} --- the two
  *    engines return different group counts on the same Greek corpus.
  *  - NFC: both engines agree in KEEPING the precomposed and decomposed
  *    caf{U+00E9} apart --- lower() never normalizes --- so a
  *    multilingual dedup key needs an explicit NFC pass BEFORE folding.
  *    Spark has no built-in NFC function; the production step is a
  *    normalization pass at ingest (java.text.Normalizer semantics,
  *    asserted below as the expected key-merge).
  *
  * SCALE.md (Tokenizer classes) records the same table.
  */
class UnicodeFoldSpec extends SparkSpec {

  private val strasseUpper = "STRASSE"
  private val strasseSharp = "Stra\u00dfe"
  private val istanbulCap  = "\u0130stanbul"
  private val odosUpper    = "\u039f\u0394\u039f\u03a3"
  private val odosLower    = "\u03bf\u03b4\u03bf\u03c2" // final sigma U+03C2
  private val cafeNfc      = "caf\u00e9"
  private val cafeNfd      = "cafe\u0301" // e + combining acute

  // expected Spark/JVM folded keys
  private val strasseFolded  = "stra\u00dfe"
  private val istanbulFolded = "i\u0307stanbul" // i + combining dot
  private val odosFolded     = "\u03bf\u03b4\u03bf\u03c2" // final sigma
  private val odosDuck       = "\u03bf\u03b4\u03bf\u03c3" // DuckDB: medial sigma

  // (doc_id, planted text). Negative ids, the text_tokens_unicode
  // planting discipline.
  private val planted = Seq(
    (-1L, strasseUpper), (-2L, strasseSharp), (-3L, istanbulCap),
    (-4L, odosUpper), (-5L, odosLower), (-6L, cafeNfc), (-7L, cafeNfd))

  test("lower() under icu.caseMappings=false is JVM full case mapping: " +
      "the exact per-string outputs, codepoint for codepoint") {
    import spark.implicits._
    val k = planted.toDF("doc_id", "text")
      .select(col("doc_id"), lower(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(k(-1L) == "strasse")
    // sharp s is preserved --- simple/full lowercase both keep it; only
    // full case FOLDING (a different operation neither engine's lower()
    // performs) maps it to ss
    assert(k(-2L) == strasseFolded)
    // U+0130 -> i + COMBINING DOT ABOVE (SpecialCasing.txt full
    // mapping). DuckDB 1.0.0: plain "istanbul" --- the divergence.
    assert(k(-3L) == istanbulFolded)
    // final-position capital sigma -> U+03C2 (JVM context rule).
    // DuckDB: U+03C3 always.
    assert(k(-4L) == odosFolded)
    assert(k(-5L) == odosFolded)
    // lower() never normalizes: NFC and NFD cafe keep distinct keys
    assert(k(-6L) == cafeNfc)
    assert(k(-7L) == cafeNfd)
  }

  test("case-folded dedup key: the groups THIS engine produces " +
      "(DuckDB's differ on the dotted-I and final-sigma inputs)") {
    import spark.implicits._
    val groups = planted.toDF("doc_id", "text")
      .groupBy(lower(col("text")).as("k"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    // Spark merges the capital and lowercase Greek spellings (the
    // final-sigma context rule makes the keys byte-identical)...
    assert(groups(odosFolded) == List(-5L, -4L), s"greek group: $groups")
    // ...DuckDB would NOT (its capital-spelling key is the
    // medial-sigma string): same corpus, different duplicate count ---
    // the executable form of the divergence.
    assert(!groups.contains(odosDuck))
    // sharp-s / STRASSE stay separate in BOTH engines
    assert(groups(strasseFolded) == List(-2L))
    assert(groups("strasse") == List(-1L))
    // the dotted I folds to the combining-dot key here, the plain-i
    // key in DuckDB --- either way a singleton on this corpus, but the
    // KEY BYTES differ, so a cross-engine bucket join would never meet
    assert(groups(istanbulFolded) == List(-3L))
    assert(!groups.contains("istanbul"))
    // the NFC/NFD pair never merges without explicit normalization
    assert(groups(cafeNfc) == List(-6L))
    assert(groups(cafeNfd) == List(-7L))
  }

  test("NFC normalization BEFORE folding is the production fix for the " +
      "composed/decomposed split --- and it must run at ingest because " +
      "no built-in exists downstream") {
    // Spark SQL has no built-in NFC function, so the normalization
    // pass belongs at ingest. Its semantics, as the JVM ships them:
    import java.text.Normalizer
    val nfc = (s: String) => Normalizer.normalize(s, Normalizer.Form.NFC)
    assert(nfc(cafeNfd) == cafeNfc, "NFC composes e+U+0301 into U+00E9")
    assert(nfc(cafeNfc) == cafeNfc)
    // normalized-then-folded, the pair collides --- the key a
    // multilingual dedup actually wants
    assert(nfc(cafeNfd).toLowerCase(java.util.Locale.ROOT) ==
      nfc(cafeNfc).toLowerCase(java.util.Locale.ROOT))
    // and NFC alone never case-folds: the divergent dotted-I row stays
    // divergent --- normalization is orthogonal to the mapping-table gap
    assert(nfc(istanbulCap) == istanbulCap)
  }

  test("the nfc() expression ships the ingest pass: NFD composes to NFC, " +
      "ASCII is the identity, and lower(nfc(s)) is the engine-agreeing " +
      "fold key on the Latin subset") {
    import spark.implicits._
    val rows = Seq(
      ("nfd", cafeNfd), ("nfc", cafeNfc), ("ascii", "plain ascii"),
      ("null", null: String)).toDF("tag", "s")
      .selectExpr("tag", "nfc(s) AS n", "lower(nfc(s)) AS k")
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(rows("nfd") == ((Some(cafeNfc), Some(cafeNfc))),
      "NFC must compose e+U+0301 into U+00E9 before folding")
    assert(rows("nfc") == ((Some(cafeNfc), Some(cafeNfc))))
    assert(rows("ascii") == ((Some("plain ascii"), Some("plain ascii"))))
    assert(rows("null") == ((None, None)), "nfc(NULL) must be NULL")
    // the contract query's collision structure, on the planted set the
    // oracle also sees (text_casefold_key): four spellings of one
    // logical key collapse, the sharp-s pair deliberately does not
    val groups = operators.TextAnalysis.LATIN_FOLD_DOCS
      .toDF("doc_id", "text")
      .groupBy(expr("lower(nfc(text))").as("k"))
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list("doc_id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(groups(("caf" + '\u00e9' + " cr" + '\u00e8' + "me")) ==
      List(-14L, -13L, -12L, -11L))
    assert(groups(("\u00fc" + "ber m" + '\u00fc' + "ller")) == List(-16L, -15L))
    assert(groups(("stra" + '\u00df' + "e")) == List(-17L))
    assert(groups("strasse") == List(-18L))
  }

  test("casefold() is the operation lower() is not: sharp-s folds to " +
      "ss, every sigma form folds to ONE medial-sigma key, and folding " +
      "never normalizes - nfc stays a separate, prior step") {
    import spark.implicits._
    val odosMixed = "\u039f\u0394\u039f\u03c2" // capital spelling, final sigma
    val rows = Seq(
      ("sharp", strasseSharp), ("upper", strasseUpper),
      ("greekU", odosUpper), ("greekL", odosLower), ("greekM", odosMixed),
      ("nfd", cafeNfd), ("nfc", cafeNfc),
      ("turk", istanbulCap), ("null", null: String))
      .toDF("tag", "s")
      .selectExpr("tag", "casefold(s) AS f", "casefold(nfc(s)) AS key")
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    // the fold lower() cannot do: Strasse spellings COLLIDE
    assert(rows("sharp")._1 == Some("strasse"))
    assert(rows("upper")._1 == Some("strasse"))
    // position-independent sigma: capital, lowercase-final, and mixed
    // spellings all land on the single medial-sigma key (lower() gave
    // this engine final-sigma keys and DuckDB medial - folding is the
    // spelling-stable form)
    assert(rows("greekU")._1 == Some(odosDuck))
    assert(rows("greekL")._1 == Some(odosDuck))
    assert(rows("greekM")._1 == Some(odosDuck))
    // folding does NOT normalize: NFD input keeps its combining mark
    // until nfc() runs first - the composed key only falls out of the
    // full casefold(nfc(s)) pipeline
    assert(rows("nfd")._1 != rows("nfc")._1)
    assert(rows("nfd")._2 == rows("nfc")._2)
    assert(rows("nfd")._2 == Some(cafeNfc))
    // dotted capital I folds with the combining dot (ICU default mode,
    // matching this engine's lower() rather than DuckDB's simple map)
    assert(rows("turk")._1 == Some(istanbulFolded))
    assert(rows("null") == ((None, None)))
  }

  test("casefold(nfc) in the PRODUCTION fingerprint path: sharp-s and " +
      "NFD spellings now fingerprint-collide with their canonical " +
      "forms, while ASCII rows keep the exact pre-fold fingerprint") {
    import spark.implicits._
    val ascii = "The Quick  Brown-Fox! 42"
    val docs = Seq(
      (-1L, strasseUpper), (-2L, strasseSharp),
      (-6L, "menu " + cafeNfc), (-7L, "menu " + cafeNfd),
      (-8L, ascii)).toDF("doc_id", "text")
    val fp = operators.TextAnalysis.fingerprintOf(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // ß→ss survives the [^a-z0-9]+ squeeze where lower()'s kept ß was
    // stripped: the two Strasse spellings now share BOTH fingerprints
    assert(fp(-1L) == fp(-2L),
      s"full fold must merge STRASSE with Straße: $fp")
    // nfc() composes e+U+0301 before hashing: the NFD menu now matches
    // the NFC menu (under plain lower() the mark was squeezed to a
    // space, splitting 'cafe' vs 'caf' — different fingerprints)
    assert(fp(-6L) == fp(-7L),
      s"NFC pass must merge composed/decomposed spellings: $fp")
    // ASCII identity: the fold changes nothing on the fixture class, so
    // the contract row stays oracle-gated — pin the exact normalized
    // bytes by recomputing the md5 the oracle's lower() form produces
    val expectNorm = "the quick brown fox 42"
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expectNorm.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(fp(-8L)._1 == expectMd5,
      "ASCII fingerprint must equal the lower()-normalized md5 byte-for-byte")
  }

  test("the casefold(nfc) signature twin folds sharp-s near-dups into " +
      "identical minhash signatures where the contract's lower fold " +
      "provably keeps them apart (round 15)") {
    import spark.implicits._
    // near-dup pair: the same 12-word sentence spelled with sharp-s vs
    // uppercase SS inside one word. Under lower(nfc) the folded words
    // differ (straße vs strasse -> different [a-z] runs), so every
    // 3-shingle containing that word differs; under casefold(nfc) the
    // two spellings are byte-identical, so ALL shingles - and hence the
    // K minhashes - agree.
    val base = (1 to 12).map(i => s"wort$i").toVector
    val withSharp = base.updated(5, "straße").mkString(" ")
    val withUpper = base.updated(5, "STRASSE").mkString(" ")
    val docs = Seq((1L, withSharp), (2L, withUpper)).toDF("doc_id", "text")
    def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    val folded = sigs(operators.Dedup.signaturesCasefold(docs))
    assert(folded(1L) == folded(2L),
      s"casefold shingles must make the pair minhash-identical: $folded")
    val lowered = sigs(operators.Dedup.signatures(docs))
    assert(lowered(1L) != lowered(2L),
      "the lower fold must NOT merge the sharp-s pair - if it does, " +
      "the casefold twin is redundant and this pin is stale")
  }
}
