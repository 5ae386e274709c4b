package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pricing the tokenizer APPLY path at production vocabulary sizes —
  * the half of the BPE story every corpus pass pays (the train half is
  * measured in BPE_LADDER.json).
  *
  * For each merge-count ladder point: train the vocab once with
  * [[operators.TextAnalysis.bpeRounds]] (untimed here — the train cost
  * is BPE_LADDER.json's measurement; this run only needs the learned
  * pairs, which the train returns driver-local), then time N shots of
  * the rank-indexed corpus encode: one codegen'd scan computing
  * `sum(bpe_rank_count(text))` over every document. The claim under
  * test is that per-document encode cost is INDEPENDENT of merge-list
  * length — the naive alternative (replaying each merge as a
  * vocab-wide rewrite, i.e. re-running the train recurrence without
  * the argmax) is O(merges) jobs per pass: ~0.05 s/round × 32,768 =
  * ~28 min at the measured per-round constant, corpus size
  * notwithstanding. If the rank encoder's wall is flat across the
  * ladder while total output tokens shrink (more merges = better
  * compression), the claim is measured, not argued.
  *
  * Usage: runMain graft.BpeEncodeBench [sfDir] [m1,m2,...] — shots per
  * point via SPARK_GRAFT_SHOTS (default 3). Prints one JSON line.
  */
object BpeEncodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10docs")
    val ladder: Seq[Int] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
      else Seq(10, 32768)
    val shots = sys.env.getOrElse("SPARK_GRAFT_SHOTS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rn(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString

    val nDocs = Tables.documents(spark, sfDir).count()
    val points = ladder.map { m =>
      val t0 = System.nanoTime()
      val merges = operators.TextAnalysis.bpeRounds(spark, sfDir, m)._3
      val trainWall = (System.nanoTime() - t0) / 1e9
      // release the train's surviving final-round checkpoint before the
      // timed shots (the ladder-point discipline of BpeLadderBench);
      // clear the memo too so the freed entry can't be reused
      operators.TextAnalysis.clearCaches()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.err.println(f"[bpe-encode] merges=$m trained ${merges.size} " +
        f"pairs in $trainWall%.1fs")
      val walls = (0 until shots).map { shot =>
        val s0 = System.nanoTime()
        val Array(row) = Tables.documents(spark, sfDir)
          .agg(sum(org.apache.spark.sql.graft.BpeColumns
            .bpeRankCount(col("text"), merges)).as("total_tokens"))
          .collect()
        val w = (System.nanoTime() - s0) / 1e9
        System.err.println(f"[bpe-encode] merges=$m shot$shot " +
          f"wall=$w%.2fs tokens=${row.getLong(0)}")
        (w, row.getLong(0))
      }
      val tokens = walls.head._2
      assert(walls.forall(_._2 == tokens), "token totals diverged across shots")
      val ws = walls.map(_._1).sorted
      (m, merges.size, trainWall, ws, tokens)
    }
    val json = points.map { case (m, learned, trainWall, ws, tokens) =>
      val p50 = ws(ws.size / 2)
      s"""{"merges":$m,"learned_pairs":$learned,""" +
        s""""train_wall_sec":${rn(trainWall, 1)},""" +
        s""""encode_wall_sec":{"min":${rn(ws.head, 3)},"p50":${rn(p50, 3)},""" +
        s""""max":${rn(ws.last, 3)},"samples":[${ws.map(rn(_, 3)).mkString(",")}]},""" +
        s""""docs":$nDocs,"total_tokens":$tokens,""" +
        s""""encode_us_per_doc":${rn(p50 * 1e6 / nDocs, 2)}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"bpe_encode_ladder","sf_dir":"$sfDir","shots":$shots,"points":$json}""")
    spark.stop()
  }
}
