package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators over `documents` — the LLM-pipeline north star.
  *
  * All hashing is md5-based so Spark and DuckDB compute identical values
  * (Spark's `hash()`/`xxhash64` have no DuckDB twin). Scale design:
  *  - exact dedup is one hash-partitioned aggregation on the content hash
  *    (no text comparison crosses the wire, only 32-byte digests);
  *  - MinHash signatures are computed per-row with higher-order array
  *    functions (no explode, no shuffle) — at 100 TB the signature table
  *    is ~100 bytes/doc regardless of document size;
  *  - LSH candidate pairs join on (band, band_hash), i.e. the shuffle key
  *    is a digest: only same-bucket docs are ever paired, which is the
  *    whole point of LSH at scale (no O(n²) comparison);
  *  - n-gram Jaccard verification joins on shingle within a lang block —
  *    the inverted-index join pattern, parallel over shingles.
  */
object Dedup extends QueryModule {

  import Tables._

  private val K = 16 // minhash functions
  private val BANDS = 4 // LSH bands of 4 rows each

  /** words + 3-word shingles, shared by minhash/jaccard (Spark side). */
  private def withShingles(df: DataFrame): DataFrame =
    df.withColumn("words",
        expr("filter(split(text, '[^a-z]+'), x -> x <> '')"))
      .withColumn("shingles",
        expr("""CASE WHEN size(words) >= 3
            THEN array_distinct(transform(sequence(0, size(words)-3),
              i -> concat_ws(' ', words[i], words[i+1], words[i+2])))
            ELSE array(array_join(words, ' ')) END"""))

  /** DuckDB twin of [[withShingles]] as a CTE body. */
  private val shinglesCte =
    """docs AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(text, '[^a-z]+'), x -> x <> '') AS words
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(CASE WHEN len(words) >= 3
      |      THEN list_transform(range(len(words)-2),
      |        i -> words[i+1] || ' ' || words[i+2] || ' ' || words[i+3])
      |      ELSE [array_to_string(words, ' ')] END) AS shingles
      |  FROM sh0) """.stripMargin
      .replace("FROM sh0", "FROM docs")

  // ---- exact dedup ----------------------------------------------------

  private def exactGroups(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))
      .orderBy("h")

  /** Keep-first dedup as a window operator (the form a pipeline uses). */
  private def exactKeep(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  // ---- MinHash signatures + LSH candidate pairs -----------------------

  private def minhashCols: Seq[Column] =
    (0 until K).map { k =>
      expr(s"substr(array_min(transform(shingles, s -> md5(concat('$k|', s)))), 1, 8)")
        .as(s"m$k")
    }

  private def minhashSig(s: SparkSession, d: String): DataFrame =
    withShingles(documents(s, d))
      .select(col("doc_id") +: minhashCols: _*)
      .orderBy("doc_id")

  private val minhashSigSqlCols: String =
    (0 until K).map { k =>
      s"substr(list_min(list_transform(shingles, s -> md5('$k|' || s))), 1, 8) AS m$k"
    }.mkString(",\n    ")

  private def minhashSigOracle: String =
    s"""WITH $shinglesCte
       |SELECT doc_id,
       |    $minhashSigSqlCols
       |FROM sh ORDER BY doc_id""".stripMargin

  /** LSH: band hash = md5 of 4 consecutive minhashes; candidates = docs
    * sharing any band; est. Jaccard = fraction of equal minhashes.
    */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val sig = withShingles(documents(s, d)).select(col("doc_id") +: minhashCols: _*)
    val bandCols = (0 until BANDS).map { b =>
      val h = md5(concat((0 until 4).map(r => col(s"m${4 * b + r}")): _*))
      struct(lit(b).as("band"), h.as("h"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sig.toDF(sig.columns.map(c => s"a_$c").toIndexedSeq: _*)
    val sb = sig.toDF(sig.columns.map(c => s"b_$c").toIndexedSeq: _*)
    val matches = (0 until K)
      .map(k => when(col(s"a_m$k") === col(s"b_m$k"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sa, col("doc_a") === col("a_doc_id"))
      .join(sb, col("doc_b") === col("b_doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(matches.cast("double") / K, 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  private def minhashPairsOracle: String = {
    val bandSelects = (0 until BANDS).map { b =>
      val cat = (0 until 4).map(r => s"m${4 * b + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS h FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val matches = (0 until K)
      .map(k => s"CASE WHEN sa.m$k = sb.m$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $shinglesCte,
       |sig AS (
       |  SELECT doc_id,
       |    $minhashSigSqlCols
       |  FROM sh),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, round(($matches)::DOUBLE / $K, 6) AS est_jaccard
       |FROM pairs
       |JOIN sig sa ON doc_a = sa.doc_id
       |JOIN sig sb ON doc_b = sb.doc_id
       |WHERE ($matches)::DOUBLE / $K >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash from word md5s. Bit i (from hex char i/4, bit i%4) is
    * set when more words have that md5 bit = 1 than = 0. The per-char
    * bit test is a hex-char set membership, identical in both engines —
    * no hex→int conversion needed.
    */
  private val hexSets: Array[Seq[String]] = Array(
    Seq("1", "3", "5", "7", "9", "b", "d", "f"), // bit 0 of the nibble
    Seq("2", "3", "6", "7", "a", "b", "e", "f"), // bit 1
    Seq("4", "5", "6", "7", "c", "d", "e", "f"), // bit 2
    Seq("8", "9", "a", "b", "c", "d", "e", "f")) // bit 3

  private def simhashBitExprs(engine: String): Seq[String] =
    (0 until 64).map { i =>
      val c = i / 4 + 1
      val set = hexSets(i % 4).map(x => s"'$x'").mkString(", ")
      val cnt = engine match {
        case "spark" => s"size(filter(words, w -> substr(md5(w), $c, 1) IN ($set)))"
        case _       => s"len(list_filter(words, w -> substr(md5(w), $c, 1) IN ($set)))"
      }
      // majority vote: bit = 1 when #ones >= #zeros (ties -> 1, both engines)
      s"CASE WHEN 2 * $cnt >= size0 THEN '1' ELSE '0' END"
    }

  private def simhash(s: SparkSession, d: String): DataFrame = {
    val bits = simhashBitExprs("spark").mkString(", ")
    documents(s, d)
      .withColumn("words", expr("filter(split(text, '[^a-z]+'), x -> x <> '')"))
      .withColumn("size0", expr("size(words)"))
      .withColumn("simhash64", expr(s"concat($bits)"))
      .select(col("doc_id"), col("simhash64"),
        expr("substr(simhash64, 1, 16)").as("bucket16"))
      .orderBy("doc_id")
  }

  private def simhashOracle: String = {
    val bits = simhashBitExprs("duckdb").mkString(" || ")
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '[^a-z]+'), x -> x <> '') AS words
       |  FROM documents),
       |sized AS (SELECT doc_id, words, len(words) AS size0 FROM docs),
       |fp AS (SELECT doc_id, $bits AS simhash64 FROM sized)
       |SELECT doc_id, simhash64, substr(simhash64, 1, 16) AS bucket16
       |FROM fp ORDER BY doc_id""".stripMargin
  }

  // ---- exact n-gram Jaccard verification (inverted-index join) --------

  private def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val sh = withShingles(documents(s, d)).select("doc_id", "lang", "shingles")
    val ex = sh.select(col("doc_id"), col("lang"), explode(col("shingles")).as("s"))
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("da", "sza"), col("doc_a") === col("da"))
      .join(sizes.toDF("db", "szb"), col("doc_b") === col("db"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")), 6))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  private def jaccardOracle: String =
    s"""WITH $shinglesCte,
       |ex AS (SELECT doc_id, lang, unnest(shingles) AS s FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM ex a JOIN ex b
       |    ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"         -> exactGroups _,
    "dedup_exact_keep"    -> exactKeep _,
    "dedup_minhash_sig"   -> minhashSig _,
    "dedup_minhash_pairs" -> minhashPairs _,
    "dedup_simhash"       -> simhash _,
    "dedup_jaccard_pairs" -> jaccardPairs _,
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n_dups, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,
    "dedup_exact_keep" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dedup_minhash_sig"   -> minhashSigOracle,
    "dedup_minhash_pairs" -> minhashPairsOracle,
    "dedup_simhash"       -> simhashOracle,
    "dedup_jaccard_pairs" -> jaccardOracle,
  )
}
