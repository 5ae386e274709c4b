package graft

import org.apache.spark.sql.functions._

/** Reference-parity golden test (SURVEY §5.2.3): word count with the
  * EXACT reference semantics — tokens are maximal runs of ASCII letters
  * (`mr/word_count.h:22-31`), case-sensitive, empties dropped
  * (`run_demo.sh:16`), output byte-order sorted (`LC_COLLATE=C` ≙
  * Spark UTF8_BINARY).
  */
class WordCountGoldenSpec extends SparkSpec {

  test("reference word-count semantics on a hand-verified fixture") {
    import spark.implicits._
    val fixture = Seq(
      "The quick brown fox; the quick fox!",
      "Zebra zebra... 42 foxes (Fox) -- don't",
      "").toDF("text")
    val got = fixture
      .select(explode(split(col("text"), "[^A-Za-z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")
      .as[(String, Long)].collect().toSeq
    // hand-computed: case-sensitive, "don't" -> don + t, byte order puts
    // uppercase (A-Z) before lowercase (a-z)
    val expected = Seq(
      "Fox" -> 1L, "The" -> 1L, "Zebra" -> 1L, "brown" -> 1L, "don" -> 1L,
      "fox" -> 2L, "foxes" -> 1L, "quick" -> 2L, "t" -> 1L, "the" -> 1L,
      "zebra" -> 1L)
    assert(got == expected)
  }

  test("flagship wordcount query runs on testdata and is key-sorted") {
    val df = operators.WordCount.dataframeWordCount(spark, sfDir)
    val rows = df.collect()
    assert(rows.length > 0)
    val words = rows.map(_.getString(0)).toSeq
    assert(words == words.sorted)
    // both implementations agree
    val mrRows = operators.WordCount.mrWordCount(spark, sfDir).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      mrRows.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
