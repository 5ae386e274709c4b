package graft

import org.apache.spark.sql.functions._

/** Planted-PII soundness of the scrub pass, end to end through the
  * PRODUCTION query: the oracle proves Spark and DuckDB agree on the
  * fixture corpus; this proves the agreed semantics redact what a
  * training-data pipeline needs redacted — the expected counts AND the
  * exact post-scrub digest (computed independently in the test) on
  * engineered rows, including the overlap case where an email's domain
  * swallows a trailing digit run.
  */
class TextSoundnessSpec extends SparkSpec {

  private val docs = Seq(
    (1L, "write to john.doe@example.com or ring 12345678 thanks"),
    // two emails; a 5-digit run is BELOW the {6,} cut and must survive
    (2L, "a@b.c and x_1-2@mail.org meet at 12345 not 999999"),
    // the email regex's domain class [a-z0-9.-]+ swallows trailing
    // digits, so no separate digit run remains here
    (3L, "stream dump foo@bar.com123456789 end"),
    (4L, "nothing sensitive here at all"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_text_sound_")
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synthetic").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("pii scrub counts and redacts exactly the planted entities") {
    val got = operators.TextAnalysis.queries("text_pii_scrub")(spark, corpusDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((1L, 1L,
      md5hex("write to <EMAIL> or ring <NUM> thanks"))))
    assert(got(2L) == ((2L, 1L,
      md5hex("<EMAIL> and <EMAIL> meet at 12345 not <NUM>"))),
      s"doc 2 mismatch: ${got(2L)}")
    assert(got(3L) == ((1L, 0L, md5hex("stream dump <EMAIL> end"))))
    assert(got(4L) == ((0L, 0L, md5hex("nothing sensitive here at all"))))
  }
}
