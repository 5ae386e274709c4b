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

      // compaction against the REAL checkpoint this stream wrote — the
      // commit-precondition parse runs on genuine CommitLog layout, not
      // the fabricated one the precondition spec uses
      operators.Dedup.compactSignatureTable(
        spark, sig.toString, ckpt.toString, targetFiles = 2)
      val folded = spark.read.parquet(sig.toString)
      assert(folded.select("doc_id").collect().map(_.getLong(0)).toSet ==
        Set(1L, 2L, 3L, 4L, 5L, 13L, 14L, 24L))
      assert(folded.select(col("ingest_batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq == Seq(-1L))
    } finally Fs.rmTree(root)
  }

  /** Fabricate the commit log of a stream checkpoint that has committed
    * exactly `committed` — the layout Structured Streaming's CommitLog
    * leaves at `<ckpt>/commits/<batchId>` (content irrelevant to the
    * precondition, which keys on file NAMES).
    */
  private def fakeCheckpoint(root: File, name: String, committed: Long*): File = {
    val ckpt = new File(root, name)
    val commits = new File(ckpt, "commits")
    commits.mkdirs()
    committed.foreach(b => java.nio.file.Files.write(
      new File(commits, b.toString).toPath, "v1".getBytes))
    ckpt
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
      val ckpt = fakeCheckpoint(root, "ckpt", 0L, 1L)
      val before = spark.read.parquet(sig.toString)
        .select("doc_id", "sig").collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

      compactSignatureTable(spark, sig.toString, ckpt.toString, targetFiles = 2)

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
      assert(Option(root.listFiles).toSeq.flatten.map(_.getName).sorted ==
        Seq("ckpt", "sig"))

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
        compactSignatureTable(spark, sig.toString, ckpt.toString, targetFiles = 2))
      assert(e.getMessage.contains("interrupted compaction"))
      Fs.rmTree(old)
    } finally Fs.rmTree(root)
  }

  test("compaction refuses to fold a batch the stream checkpoint has not " +
      "committed, and accepts once the commit lands") {
    import operators.Dedup.{compactSignatureTable, signatures, writeSignatureTable}
    val root = java.nio.file.Files.createTempDirectory("graft_sigprecond_").toFile
    val sig = new File(root, "sig")
    try {
      writeSignatureTable(corpusA, sig.toString)
      Seq(0L, 1L).foreach { b =>
        signatures(docs(Seq((100 + b) -> words("zz").mkString(" "))))
          .select("doc_id", "sig").withColumn("ingest_batch", lit(b))
          .write.mode("append").partitionBy("ingest_batch").parquet(sig.toString)
      }
      // the crash window: batch 1's writes landed (foreachBatch ran) but
      // the checkpoint stopped between offset-write and commit — only
      // batch 0 is in commits/, so a restart REPLAYS batch 1
      val stale = fakeCheckpoint(root, "ckpt_stale", 0L)
      val e = intercept[IllegalArgumentException](
        compactSignatureTable(spark, sig.toString, stale.toString, targetFiles = 2))
      assert(e.getMessage.contains("exceed the max committed batch id (0)"))
      assert(e.getMessage.contains("ingest_batch"), "must name the unsafe partitions")

      // no commits/ at all (stream never committed anything): same refusal
      val empty = new File(root, "ckpt_empty"); empty.mkdirs()
      val e2 = intercept[IllegalArgumentException](
        compactSignatureTable(spark, sig.toString, empty.toString, targetFiles = 2))
      assert(e2.getMessage.contains("max committed batch id (-1)"))

      // refusal must not have touched the table
      assert(spark.read.parquet(sig.toString).count() == 7)

      // commit lands -> fold proceeds and erases batch identity
      val fresh = fakeCheckpoint(root, "ckpt_fresh", 0L, 1L)
      compactSignatureTable(spark, sig.toString, fresh.toString, targetFiles = 2)
      assert(spark.read.parquet(sig.toString)
        .select(col("ingest_batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq == Seq(-1L))
      assert(spark.read.parquet(sig.toString).count() == 7)
    } finally Fs.rmTree(root)
  }

  test("readers refuse a signature table stamped with different " +
      "parameters, an unstamped table, and name the remedy") {
    import operators.Dedup.{readSignatureTable, sigTableMeta, writeSignatureTable}
    val root = java.nio.file.Files.createTempDirectory("graft_sigstamp_").toFile
    val sig = new File(root, "sig")
    try {
      writeSignatureTable(corpusA, sig.toString)
      // matched stamp: reads fine
      assert(readSignatureTable(spark, sig.toString).count() == 5)

      // tamper the stamp into a different parameterization (K=32)
      val metaFile = new File(sig, "_graft_meta.json")
      val stamped = new String(
        java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8")
      assert(stamped == sigTableMeta)
      java.nio.file.Files.write(metaFile.toPath,
        stamped.replace("\"k\":16", "\"k\":32").getBytes("UTF-8"))
      val e = intercept[RuntimeException](readSignatureTable(spark, sig.toString))
      assert(e.getMessage.contains("different parameters"))
      assert(e.getMessage.contains("\"k\":32") && e.getMessage.contains("\"k\":16"),
        "error must carry both stamps")

      // the STREAM is a reader too: a mismatched table must fail its
      // first trigger, not silently mis-dedup the crawl
      val (in, kept, ckpt) =
        (new File(root, "in"), new File(root, "kept"), new File(root, "ckpt"))
      in.mkdirs()
      writeOneFile(batch0, new File(in, "b0.parquet"))
      val se = intercept[Exception](
        runStream(in.toString, sig.toString, kept.toString, ckpt.toString))
      assert(Iterator.iterate(se: Throwable)(_.getCause).takeWhile(_ != null)
        .take(10).exists(t => t.getMessage != null &&
          t.getMessage.contains("different parameters")))

      // unstamped (pre-stamping) table: refused with the exact sidecar
      java.nio.file.Files.delete(metaFile.toPath)
      val e2 = intercept[RuntimeException](readSignatureTable(spark, sig.toString))
      assert(e2.getMessage.contains("no _graft_meta.json"))
      assert(e2.getMessage.contains(sigTableMeta),
        "remedy must include the exact stamp to write after manual verification")

      // restore the true stamp: table reads again (stamping IS the fix)
      java.nio.file.Files.write(metaFile.toPath, sigTableMeta.getBytes("UTF-8"))
      assert(readSignatureTable(spark, sig.toString).count() == 5)
    } finally Fs.rmTree(root)
  }

  test("crash windows of the compaction swap: both intermediate layouts " +
      "fail-stop, and the documented manual restore recovers each") {
    import operators.Dedup.{compactSignatureTable, dedupAgainst, readSignatureTable, writeSignatureTable}
    val root = java.nio.file.Files.createTempDirectory("graft_sigcrash_").toFile
    val sig = new File(root, "sig")
    val tmp = new File(root, "sig_compact_tmp")
    val old = new File(root, "sig_compact_old")
    def table(): Set[Long] = readSignatureTable(spark, sig.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      writeSignatureTable(corpusA, sig.toString)
      val want = table()
      val ckpt = fakeCheckpoint(root, "ckpt") // seed-only: no batches to fold

      // -- window 1: crash BETWEEN the renames. Stage the exact layout the
      // code leaves: sigDir renamed away to _compact_old, staged rewrite
      // at _compact_tmp, sigDir missing.
      compactSignatureTable(spark, sig.toString, ckpt.toString, targetFiles = 1)
      assert(table() == want, "clean compaction sanity")
      val staged = new File(root, "staged_copy")
      // rebuild the staged rewrite (content irrelevant to the restore path)
      writeSignatureTable(corpusA, staged.toString)
      assert(sig.renameTo(old), "stage crash layout: sigDir -> _compact_old")
      assert(staged.renameTo(tmp), "stage crash layout: staged -> _compact_tmp")

      // readers fail-stop: the table dir is simply absent
      intercept[Exception](table())
      // a fresh compaction refuses while the siblings exist
      val e = intercept[IllegalArgumentException](
        compactSignatureTable(spark, sig.toString, ckpt.toString))
      assert(e.getMessage.contains("interrupted compaction"))

      // documented restore: _compact_old -> sigDir, drop _compact_tmp
      assert(old.renameTo(sig))
      Fs.rmTree(tmp)
      assert(table() == want, "restore must recover the full previous table")
      compactSignatureTable(spark, sig.toString, ckpt.toString, targetFiles = 1)
      assert(table() == want, "re-run after restore completes the fold")

      // -- window 2: crash AFTER the second rename, before delete(old).
      // sigDir is the compacted truth; _compact_old is leftover debris.
      val debris = new File(root, "debris_copy")
      writeSignatureTable(corpusA, debris.toString)
      assert(debris.renameTo(old))
      assert(table() == want, "table already correct in this window")
      val e2 = intercept[IllegalArgumentException](
        compactSignatureTable(spark, sig.toString, ckpt.toString))
      assert(e2.getMessage.contains("interrupted compaction"))
      // documented restore: just delete _compact_old
      Fs.rmTree(old)
      compactSignatureTable(spark, sig.toString, ckpt.toString, targetFiles = 1)
      assert(table() == want)
      // and the recovered table still dedups: a copy of corpus 1 drops
      val probe = docs(Seq(41L -> words("aa").mkString(" "),
        42L -> words("qq").mkString(" ")))
      val keptIds = dedupAgainst(
        readSignatureTable(spark, sig.toString).select("doc_id", "sig"), probe)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(keptIds == Set(42L))
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
