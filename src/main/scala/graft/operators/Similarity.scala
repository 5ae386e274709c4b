package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / similarity search over
  * `embeddings.embedding: array<float>`.
  *
  * Three operators:
  *  - brute-force cosine top-k (the correctness baseline): broadcast the
  *    small query set against the full corpus — at 100 TB the corpus side
  *    streams partition-parallel, queries ride the broadcast, and the
  *    top-k per query is a bounded window (TakeOrdered shape), so no
  *    global materialization;
  *  - sign-LSH bucketed top-k (the scale path): bucket = sign bits of the
  *    first 10 dims (a fixed random-hyperplane family; the axis-aligned
  *    choice keeps it DuckDB-checkable). Candidates only join within a
  *    bucket — the shuffle key is the 10-bit code, turning O(N·Q) into
  *    O(N·Q/2^10) comparisons, the standard LSH trade;
  *  - cosine near-dup pairs within a label block (blocked all-pairs — the
  *    embedding-space analogue of Dedup's lang-blocked Jaccard).
  *
  * All arithmetic is double (floats upcast first) so Spark's
  * `aggregate`/`zip_with` fold and DuckDB's list_dot_product agree;
  * scores are rounded to 6 dp before ranking/filtering so ordering is
  * identical in both engines.
  */
object Similarity extends QueryModule {

  import Tables._

  private val TOPK = 5
  private val NQUERIES = 8 // query vectors: vec_id < 8
  private val LSHBITS = 10

  /** cosine(a, b) in double via higher-order fns (codegen'd, no UDF). */
  private def cosine(a: String, b: String): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v) /
         |(sqrt(aggregate($a, CAST(0 AS DOUBLE),
         |  (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) *
         | sqrt(aggregate($b, CAST(0 AS DOUBLE),
         |  (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin)

  private val cosineSqlFmt: (String, String) => String = (a, b) =>
    s"""list_dot_product(list_transform($a, x -> x::DOUBLE), list_transform($b, x -> x::DOUBLE)) /
       |  (sqrt(list_dot_product(list_transform($a, x -> x::DOUBLE), list_transform($a, x -> x::DOUBLE))) *
       |   sqrt(list_dot_product(list_transform($b, x -> x::DOUBLE), list_transform($b, x -> x::DOUBLE))))""".stripMargin

  // ---- brute-force cosine top-k --------------------------------------

  private def topkBrute(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val q = emb.filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(cosine("qe", "embedding"), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TOPK)
      .select("qid", "rnk", "vec_id", "sim")
      .orderBy("qid", "rnk")
  }

  private def topkBruteOracle: String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id < $NQUERIES),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    round(${cosineSqlFmt("q.qe", "e.embedding")}, 6) AS sim
       |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT qid, rnk, vec_id, sim FROM ranked
       |WHERE rnk <= $TOPK ORDER BY qid, rnk""".stripMargin

  // ---- sign-LSH bucketed top-k ---------------------------------------

  private def lshBucketExpr(emb: String): String =
    (1 to LSHBITS)
      .map(i => s"CASE WHEN $emb[${i - 1}] >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")

  private def lshBucketSql(emb: String): String =
    (1 to LSHBITS)
      .map(i => s"CASE WHEN $emb[$i] >= 0 THEN '1' ELSE '0' END")
      .mkString(" || ")

  private def topkLsh(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
      .withColumn("bucket", expr(lshBucketExpr("embedding")))
    val q = emb.filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    emb.join(broadcast(q), col("bucket") === col("qbucket") &&
        col("vec_id") =!= col("qid"))
      .withColumn("sim", round(cosine("qe", "embedding"), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TOPK)
      .select("qid", "rnk", "vec_id", "sim")
      .orderBy("qid", "rnk")
  }

  private def topkLshOracle: String =
    s"""WITH b AS (
       |  SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qbucket
       |  FROM b WHERE vec_id < $NQUERIES),
       |scored AS (
       |  SELECT q.qid, b.vec_id,
       |    round(${cosineSqlFmt("q.qe", "b.embedding")}, 6) AS sim
       |  FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT qid, rnk, vec_id, sim FROM ranked
       |WHERE rnk <= $TOPK ORDER BY qid, rnk""".stripMargin

  // ---- cosine near-dup pairs (label-blocked) -------------------------

  private def cosinePairs(s: SparkSession, d: String): DataFrame = {
    val a = embeddings(s, d).select(col("vec_id").as("va"),
      col("label").as("la"), col("embedding").as("ea"))
    val b = embeddings(s, d).select(col("vec_id").as("vb"),
      col("label").as("lb"), col("embedding").as("eb"))
    a.join(b, col("la") === col("lb") && col("va") < col("vb"))
      .withColumn("sim", round(cosine("ea", "eb"), 6))
      .filter(col("sim") >= 0.3)
      .select(col("va"), col("vb"), col("la").as("label"), col("sim"))
      .orderBy("va", "vb")
  }

  private def cosinePairsOracle: String =
    s"""SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS label,
       |  round(${cosineSqlFmt("a.embedding", "b.embedding")}, 6) AS sim
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round(${cosineSqlFmt("a.embedding", "b.embedding")}, 6) >= 0.3
       |ORDER BY va, vb""".stripMargin

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_brute" -> topkBrute _,
    "sim_topk_lsh"   -> topkLsh _,
    "sim_cos_pairs"  -> cosinePairs _,
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_brute" -> topkBruteOracle,
    "sim_topk_lsh"   -> topkLshOracle,
    "sim_cos_pairs"  -> cosinePairsOracle,
  )
}
