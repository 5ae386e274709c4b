package graft

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Signature-table maintenance exercise at rehearsal scale — the
  * observation behind the compaction scale claims (SCALE.md): run the
  * REAL streaming incremental-dedup pipeline over a fixture's documents
  * in micro-batches, then compact, and measure what compaction is for —
  * the file-count/bytes growth of the table and the fold's wall time.
  *
  * Shape: the first `corpusN` documents seed the signature table (the
  * existing corpus); the rest arrive as `batches` single-file
  * micro-batches through `Dedup.incrementalDedupStream` (one trigger
  * per file via maxFilesPerTrigger=1), each trigger appending its
  * survivors' signatures as an `ingest_batch=<id>` partition. That
  * leaves the exact layout a long-lived crawl ingest accrues, which
  * `Dedup.compactSignatureTable` folds to `targetFiles` files.
  *
  * Usage: runMain graft.SigMaintBench <sfDir> <workDir> [batches]
  *   [targetFiles] [filesPerBatch]
  * Prints one JSON line with before/after file counts, bytes, and
  * stream/compact wall times.
  *
  * filesPerBatch (default 1) controls how many parquet files each
  * planted micro-batch ships: 1 is the original file↔trigger harness
  * shape; >1 sets maxFilesPerTrigger to the same number so each
  * trigger still ingests exactly one crawl batch, but reads its files
  * in parallel. The knob exists because the single-file shape
  * SERIALIZES the batch's shingle+minhash CPU into one task — at the
  * sf100 decade (400k docs/batch) that measured 17 min/trigger at
  * ~1.3 cores, a harness artifact: a real crawl lands every ingest
  * batch as many part files.
  */
object SigMaintBench {

  private def walkStats(dir: File): (Long, Long) = {
    def go(f: File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles).toSeq.flatten.map(go)
          .foldLeft((0L, 0L)) { case ((c1, b1), (c2, b2)) => (c1 + c2, b1 + b2) }
      else if (f.getName.endsWith(".parquet")) (1L, f.length())
      else (0L, 0L)
    go(dir)
  }

  /** Write batch `b` as exactly `k` parquet files `bNNN_MM.parquet`
    * under `in`, every file stamped with the same strictly-increasing
    * per-batch modification time: the file stream source admits files
    * oldest-first, so a maxFilesPerTrigger=k trigger takes exactly one
    * batch's files (every earlier batch already consumed) and reads
    * them in parallel. k=1 keeps the original one-file-per-trigger
    * harness shape aside from the `_00` name suffix.
    */
  private def writeBatchFiles(df: DataFrame, in: File, b: Int,
      k: Int): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sigmaint_w_")
    df.repartition(k).write.mode("overwrite").parquet(tmp.toString)
    val parts = Option(tmp.toFile.listFiles).toSeq.flatten
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    // maxFilesPerTrigger=k REQUIRES exactly k files per batch or the
    // batch↔trigger mapping silently drifts
    require(parts.size == k, s"batch $b wrote ${parts.size} files, wanted $k")
    parts.zipWithIndex.foreach { case (p, i) =>
      val dest = new File(in, f"b$b%03d_$i%02d.parquet")
      java.nio.file.Files.move(p.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // fixed epoch base: only the ORDER between batches matters, and a
      // wall-clock base would make reruns in one minute interleave
      dest.setLastModified(1700000000000L + b * 60000L)
      ()
    }
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.foreach(rm)
      f.delete(); ()
    }
    rm(tmp.toFile)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val work = new File(args(1))
    val batches = args.lift(2).map(_.toInt).getOrElse(20)
    val targetFiles = args.lift(3).map(_.toInt).getOrElse(8)
    val filesPerBatch = args.lift(4).map(_.toInt).getOrElse(1)
    require(filesPerBatch >= 1, s"filesPerBatch $filesPerBatch < 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (in, sig, kept, ckpt) = (new File(work, "in"), new File(work, "sig"),
      new File(work, "kept"), new File(work, "ckpt"))
    in.mkdirs()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars")
      .persist()
    val n = docs.count()
    val corpusN = n / 5 // 20% existing corpus, 80% arrives on the stream
    val corpus = docs.filter(col("doc_id").isNotNull)
      .orderBy("doc_id").limit(corpusN.toInt)
    Dedup.writeSignatureTable(corpus, sig.toString)

    // remaining docs round-robin into `batches` micro-batches of
    // filesPerBatch files each (pmod on doc_id: deterministic, no
    // shared state with the corpus cut)
    val rest = docs.join(corpus.select("doc_id"), Seq("doc_id"), "left_anti")
    (0 until batches).foreach { b =>
      writeBatchFiles(rest.filter(pmod(col("doc_id"), lit(batches)) === b),
        in, b, filesPerBatch)
    }

    val t0 = System.nanoTime()
    val firstFile = Option(in.listFiles).toSeq.flatten
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val stream = spark.readStream.schema(
        spark.read.parquet(firstFile.toString).schema)
      .option("maxFilesPerTrigger", filesPerBatch.toString)
      .parquet(in.toString)
    val q = Dedup.incrementalDedupStream(
      stream, sig.toString, kept.toString, ckpt.toString)
    try q.awaitTermination() finally { if (q.isActive) q.stop() }
    val streamSec = (System.nanoTime() - t0) / 1e9

    val keptN = spark.read.parquet(kept.toString).count()
    val (filesBefore, bytesBefore) = walkStats(sig)
    val partsBefore = Option(new File(sig, "v=0").listFiles).toSeq.flatten
      .count(f => f.isDirectory && f.getName.startsWith("ingest_batch="))

    val t1 = System.nanoTime()
    Dedup.compactSignatureTable(spark, sig.toString, ckpt.toString, targetFiles)
    val compactSec = (System.nanoTime() - t1) / 1e9

    // live version after the fold (the superseded v=0 is kept one cycle
    // by design; report it separately so the steady-state cost is clear).
    // The fold publishes as nonce-suffixed `v=1.<nonce>` (the
    // concurrent-compactor guard), so look it up by number prefix.
    val v1 = Option(sig.listFiles).toSeq.flatten
      .find(f => f.getName == "v=1" || f.getName.startsWith("v=1."))
      .getOrElse(sys.error(s"no version-1 fold under $sig"))
    val (filesLive, bytesLive) = walkStats(v1)
    val (filesTotal, bytesTotal) = walkStats(sig)
    val rows = Dedup.readSignatureTable(spark, sig.toString).count()

    println(s"""{"sf":"$sfDir","docs":$n,"corpus":$corpusN,"batches":$batches,""" +
      s""""files_per_batch":$filesPerBatch,""" +
      s""""stream_sec":${math.round(streamSec * 10) / 10.0},"kept":$keptN,""" +
      s""""files_before":$filesBefore,"bytes_before":$bytesBefore,""" +
      s""""batch_partitions_before":$partsBefore,""" +
      s""""compact_sec":${math.round(compactSec * 10) / 10.0},""" +
      s""""files_live_after":$filesLive,"bytes_live_after":$bytesLive,""" +
      s""""files_total_after":$filesTotal,"bytes_total_after":$bytesTotal,""" +
      s""""sig_rows":$rows}""")
    Dedup.clearCaches()
    spark.stop()
  }
}
