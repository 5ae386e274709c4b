package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end proof of `Dedup.incrementalDedupStream` — the crawl-ingest
  * shape of incremental dedup: micro-batches of new documents arrive as
  * a file-source STREAM, each batch is deduplicated against the on-disk
  * corpus signature table (seeded from corpus A), survivors land in the
  * kept sink, and their signatures join the table so LATER batches dedup
  * against everything kept so far.
  *
  * Planted fates are hand-derived from the dominance rule, with the
  * cross-batch cases chosen as exact copies so the expected outcome
  * never depends on near-dup transitivity:
  *  - batch 0 replays the `DedupIncrementalSpec` batch (kept = 13, 14);
  *  - batch 1 then proves ACCUMULATION: a copy of batch-0-KEPT 13 drops
  *    (it is not in corpus A — only the growing table can catch it), a
  *    copy of batch-0-DROPPED 15's text drops via keeper 14, a genuinely
  *    new doc survives, and its within-batch near-dup drops.
  *
  * The second trigger runs from the SAME checkpoint in a separate
  * `start()`, and a third no-new-files run asserts replay idempotence —
  * the sink and signature table are byte-stable across restarts.
  */
class StreamingIncrementalDedupSpec extends SparkSpec {

  private def words(seed: String): Seq[String] =
    (0 until 40).map(i => s"$seed${('a' + i / 26).toChar}${('a' + i % 26).toChar}")

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synthetic").as("source"), length(col("text")).cast("long").as("n_chars"))
  }

  private lazy val corpusA = docs(Seq(
    1L -> words("aa").mkString(" "),
    2L -> words("bb").mkString(" "),
    3L -> words("cc").mkString(" "),
    4L -> words("dd").mkString(" "),
    5L -> words("ee").mkString(" ")))

  private lazy val batch0 = docs(Seq(
    11L -> words("aa").mkString(" "),                        // exact copy of corpus 1   -> drop
    12L -> words("cc").updated(20, "changed").mkString(" "), // near-dup of corpus 3     -> drop
    13L -> words("ff").mkString(" "),                        // genuinely new            -> keep
    14L -> words("gg").mkString(" "),                        // genuinely new            -> keep
    15L -> words("gg").mkString(" "),                        // copy of EARLIER new 14   -> drop
    16L -> words("ff").updated(13, "tweaked").mkString(" "))) // near-dup of earlier 13  -> drop

  private lazy val batch1 = docs(Seq(
    21L -> words("bb").mkString(" "),                        // exact copy of corpus 2   -> drop
    22L -> words("ff").mkString(" "),                        // copy of batch-0 KEPT 13  -> drop (accumulation)
    23L -> words("gg").mkString(" "),                        // text of DROPPED 15 = keeper 14's -> drop
    24L -> words("hh").mkString(" "),                        // genuinely new            -> keep
    25L -> words("hh").updated(13, "tweaked").mkString(" "))) // near-dup of earlier 24  -> drop

  /** Write `df` as ONE parquet file `dest` (the stream source dir holds
    * one file per planted micro-batch; maxFilesPerTrigger=1 maps them
    * 1:1 onto triggers).
    */
  private def writeOneFile(df: DataFrame, dest: File): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_incwrite_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Option(tmp.toFile.listFiles).toSeq.flatten
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file under $tmp"))
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Fs.rmTree(tmp.toFile)
  }

  private def runStream(inputDir: String, sigDir: String, keptDir: String,
      ckptDir: String): Unit = {
    val stream = spark.readStream.schema(corpusA.schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
    val q = operators.Dedup.incrementalDedupStream(
      stream, sigDir, keptDir, ckptDir)
    try q.awaitTermination() finally { if (q.isActive) q.stop() }
  }

  // partition-value inference types ingest_batch as int; normalize
  private def keptState(keptDir: String): Map[Long, Long] =
    spark.read.parquet(keptDir)
      .select(col("doc_id"), col("ingest_batch").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two planted micro-batches: corpus dedup, table accumulation, " +
      "within-batch dominance, and restart idempotence") {
    val root = java.nio.file.Files.createTempDirectory("graft_incdedup_").toFile
    val (in, sig, kept, ckpt) = (new File(root, "in"), new File(root, "sig"),
      new File(root, "kept"), new File(root, "ckpt"))
    in.mkdirs()
    try {
      operators.Dedup.writeSignatureTable(corpusA, sig.toString)
      assert(spark.read.parquet(sig.toString).count() == 5)

      // trigger 1: batch0 file only
      writeOneFile(batch0, new File(in, "b0.parquet"))
      runStream(in.toString, sig.toString, kept.toString, ckpt.toString)
      assert(keptState(kept.toString) == Map(13L -> 0L, 14L -> 0L),
        "batch 0 must replay the DedupIncrementalSpec fates")

      // trigger 2: batch1 file, restarted from the same checkpoint
      writeOneFile(batch1, new File(in, "b1.parquet"))
      runStream(in.toString, sig.toString, kept.toString, ckpt.toString)
      assert(keptState(kept.toString) == Map(13L -> 0L, 14L -> 0L, 24L -> 1L),
        "22 and 23 can only drop if batch-0 survivors joined the table")

      // kept rows carry the ORIGINAL columns
      val row24 = spark.read.parquet(kept.toString)
        .filter(col("doc_id") === 24L).collect().head
      assert(row24.getAs[String]("text") == words("hh").mkString(" "))

      // the signature table holds seed + kept rows, partitioned by batch
      val sigState = spark.read.parquet(sig.toString)
        .groupBy(col("ingest_batch").cast("long").as("b")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sigState == Map(-1L -> 5L, 0L -> 2L, 1L -> 1L))
      // and is joinable by any later run: same shape as signatures()
      assert(spark.read.parquet(sig.toString).schema.fieldNames.sorted
        .sameElements(Array("doc_id", "ingest_batch", "sig")))

      // restart with no new files: sink and table unchanged
      val sigBefore = spark.read.parquet(sig.toString).collect().toSet
      runStream(in.toString, sig.toString, kept.toString, ckpt.toString)
      assert(keptState(kept.toString) == Map(13L -> 0L, 14L -> 0L, 24L -> 1L))
      assert(spark.read.parquet(sig.toString).collect().toSet == sigBefore)
    } finally Fs.rmTree(root)
  }

  test("signature-table compaction folds batch partitions into the seed, " +
      "bounds file count, and leaves dedup behavior unchanged") {
    import operators.Dedup.{compactSignatureTable, dedupAgainst, signatures, writeSignatureTable}
    val root = java.nio.file.Files.createTempDirectory("graft_sigcompact_").toFile
    val sig = new File(root, "sig")
    try {
      // accumulated state after two committed triggers: seed + per-batch
      // signature partitions, exactly the layout the stream leaves behind
      writeSignatureTable(corpusA, sig.toString)
      val kept0 = docs(Seq(13L -> words("ff").mkString(" "), 14L -> words("gg").mkString(" ")))
      val kept1 = docs(Seq(24L -> words("hh").mkString(" ")))
      Seq(kept0 -> 0L, kept1 -> 1L).foreach { case (df, b) =>
        signatures(df).select("doc_id", "sig")
          .withColumn("ingest_batch", lit(b))
          .write.mode("append").partitionBy("ingest_batch").parquet(sig.toString)
      }
      val before = spark.read.parquet(sig.toString)
        .select("doc_id", "sig").collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

      compactSignatureTable(spark, sig.toString, targetFiles = 2)

      // same (doc_id, sig) content, all rows folded into the seed partition
      val compacted = spark.read.parquet(sig.toString)
      assert(compacted.select("doc_id", "sig").collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap == before)
      assert(compacted.select(col("ingest_batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq == Seq(-1L))
      // layout bounded: one partition dir, at most targetFiles parquet files
      val partDirs = Option(sig.listFiles).toSeq.flatten.filter(_.isDirectory)
      assert(partDirs.map(_.getName) == Seq("ingest_batch=-1"))
      assert(partDirs.head.listFiles.count(_.getName.endsWith(".parquet")) <= 2)
      // no staging debris survives a clean compaction
      assert(Option(root.listFiles).toSeq.flatten.map(_.getName).sorted == Seq("sig"))

      // dedup semantics against the compacted table are unchanged:
      // a copy of kept-13 and of kept-24 drop, a genuinely new doc stays
      val probe = docs(Seq(
        31L -> words("ff").mkString(" "),
        32L -> words("hh").mkString(" "),
        33L -> words("kk").mkString(" ")))
      val kept = dedupAgainst(
        spark.read.parquet(sig.toString).select("doc_id", "sig"), probe)
      assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(33L))

      // crash-safety contract: leftover staging siblings block a new run
      // (an interrupted swap must be resolved by a human, never clobbered)
      val old = new File(root, "sig_compact_old")
      old.mkdirs()
      val e = intercept[IllegalArgumentException](
        compactSignatureTable(spark, sig.toString, targetFiles = 2))
      assert(e.getMessage.contains("interrupted compaction"))
      Fs.rmTree(old)
    } finally Fs.rmTree(root)
  }

  test("streaming result equals the sequential batch dedupAgainst " +
      "composition it promises") {
    import operators.Dedup.{dedupAgainst, signatures}
    val seed = signatures(corpusA).select("doc_id", "sig")
    val kept0 = dedupAgainst(seed, batch0)
    val table1 = seed.unionByName(
      signatures(kept0).select("doc_id", "sig"))
    val kept1 = dedupAgainst(table1, batch1)
    assert(kept0.select("doc_id").collect().map(_.getLong(0)).toSet == Set(13L, 14L))
    assert(kept1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(24L))
  }
}
