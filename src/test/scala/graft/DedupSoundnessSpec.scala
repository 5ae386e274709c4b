package graft

import org.apache.spark.sql.functions._

/** Planted-duplicate soundness of the dedup family, end to end through
  * the PRODUCTION queries on a synthetic corpus (not expression copies
  * — the exact `Dedup.queries` entries the driver runs). The DuckDB
  * oracle proves Spark and DuckDB agree on the fixture corpus; this
  * proves the shared semantics are the RIGHT ones: engineered
  * duplicates come out as pairs, engineered near-duplicates survive
  * the LSH/banding paths, and an unrelated document pairs with
  * nothing. All inputs are fixed strings, so every assertion is
  * deterministic run to run.
  */
class DedupSoundnessSpec extends SparkSpec {

  // 40 distinct lowercase words; tokenizers split on [^a-z]+
  private def words(seed: String): Seq[String] =
    (0 until 40).map(i => s"$seed${('a' + i / 26).toChar}${('a' + i % 26).toChar}")

  private val docA = words("qu").mkString(" ")            // 1 and 2: identical
  private val nearB = {                                    // 3 and 4: one word
    val w = words("zx"); (w.mkString(" "), w.updated(20, "changed").mkString(" "))
  }
  private val loner = (0 until 40).map(i => s"lone$i").mkString(" ")

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_sound_")
    val rows = Seq(
      (1L, docA), (2L, docA), (3L, nearB._1), (4L, nearB._2), (5L, loner))
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synthetic").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  private def pairs(q: String): Map[(Long, Long), Double] =
    operators.Dedup.queries(q)(spark, corpusDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.get(2).toString.toDouble)
      .toMap

  test("exact dedup groups the identical pair under one keeper") {
    val groups = operators.Dedup.queries("dedup_exact")(spark, corpusDir)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap // keeper -> n
    assert(groups(1L) == 2L, "identical docs 1,2 must share one group")
    assert(Seq(3L, 4L, 5L).forall(groups(_) == 1L))
  }

  test("minhash LSH reports the identical pair at est_jaccard 1 and " +
      "keeps the one-word near-dup above threshold") {
    val p = pairs("dedup_minhash_pairs")
    assert(p.get((1L, 2L)).contains(1.0),
      s"identical docs must collide in every band with every minhash equal: $p")
    assert(p.contains((3L, 4L)),
      s"one-word-in-40 near-dup lost by LSH banding or the 0.5 cut: $p")
    assert(p((3L, 4L)) >= 0.5 && p((3L, 4L)) < 1.0)
    assert(!p.keySet.exists(k => k._1 == 5L || k._2 == 5L),
      s"the unrelated doc must pair with nothing: $p")
  }

  test("simhash banding reports the identical pair at hamming 0 and " +
      "the near-dup within the 8-bit cut") {
    val p = pairs("dedup_simhash_pairs")
    assert(p.get((1L, 2L)).contains(0.0),
      s"identical docs have identical simhashes, so hamming must be 0: $p")
    assert(p.contains((3L, 4L)) && p((3L, 4L)) <= 8.0,
      s"one flipped word moves few majority votes — pair must survive: $p")
    assert(!p.keySet.exists(k => k._1 == 5L || k._2 == 5L),
      s"the unrelated doc must pair with nothing: $p")
  }
}
