package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, SyntheticVectors}

/** Recall@k measurement for the parameterized ANN API
  * ([[operators.Similarity.annLsh]] / [[operators.Similarity.annIvf]])
  * against the exact baseline ([[operators.Similarity.annBrute]]) on the
  * clustered synthetic corpus ([[operators.SyntheticVectors]]).
  *
  * The fixed sim_* fixtures prove EXACTNESS on planted copies; this
  * measures the statistical quantity a 100 TB ANN deployment actually
  * tunes — recall as a function of the two cost knobs (LSH tables,
  * IVF probes). Results are committed to SCALE.md; AnnRecallSpec pins
  * floors at the documented settings so a silent recall regression
  * fails the suite.
  *
  * Usage: runMain graft.RecallCurve [n] [nq]   (default 50000 100)
  * Prints one markdown table and one JSON line.
  */
object RecallCurve {

  private val DIM = 64
  private val CLUSTERS = 128
  private val SEED = 42L
  private val K = 10
  private val LSH_BITS = 8
  private val IVF_CELLS = 128
  private val IVF_ITERS = 3

  /** |approx ∩ truth| / |truth| over (qid, vec_id) pairs — overall
    * recall@k (truth has exactly k rows per query, so micro == macro
    * up to per-query candidate shortfalls, which count as misses).
    */
  def recallVs(truth: DataFrame, approx: DataFrame): Double = {
    val t = truth.select("qid", "vec_id")
    val hit = t.join(approx.select("qid", "vec_id"), Seq("qid", "vec_id"))
      .count()
    hit.toDouble / t.count()
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50000)
    val nq = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (corpus0, queries0) =
      SyntheticVectors.corpusAndQueries(spark, n, nq, DIM, CLUSTERS, SEED)
    val corpus = corpus0.persist(); val queries = queries0.persist()

    val truth = Similarity.annBrute(corpus, queries, K).persist()
    truth.count()

    val lshRows = Seq(1, 2, 4, 8).map { bands =>
      val t0 = System.nanoTime()
      val r = recallVs(truth, Similarity.annLsh(corpus, queries, K, bands, LSH_BITS))
      (s"lsh bands=$bands bits=$LSH_BITS", r, (System.nanoTime() - t0) / 1e9)
    }

    val cells = Similarity.trainCells(
      corpus, (0L until IVF_CELLS.toLong), IVF_ITERS).persist()
    cells.count()
    val ivfRows = Seq(1, 2, 4, 8, 16).map { nprobe =>
      val t0 = System.nanoTime()
      val r = recallVs(truth, Similarity.annIvf(corpus, queries, K, cells, nprobe))
      (s"ivf nprobe=$nprobe/$IVF_CELLS", r, (System.nanoTime() - t0) / 1e9)
    }

    println(f"%n| setting | recall@$K | sec |%n|---|---|---|")
    (lshRows ++ ivfRows).foreach { case (s, r, sec) =>
      println(f"| $s | $r%.3f | $sec%.1f |")
    }
    val json = (lshRows ++ ivfRows)
      .map { case (s, r, _) => s""""$s":${f"$r%.4f"}""" }
      .mkString(",")
    println(s"""{"n":$n,"nq":$nq,"dim":$DIM,"clusters":$CLUSTERS,"k":$K,$json}""")
    spark.stop()
  }
}
