package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorColumns.{vecDot, vecNorm}

/** The codegen'd DotProductD expression must agree exactly with the
  * interpreted higher-order-function formulation (same left-to-right
  * double accumulation) — that equivalence is what lets the Similarity
  * oracles stay on DuckDB's list_dot_product.
  */
class VectorExpressionSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private lazy val emb =
    Tables.embeddings(spark, sfDir).limit(50).cache()

  private val hofDot =
    expr("""aggregate(zip_with(embedding, embedding,
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  test("vecDot matches the interpreted HOF aggregate bit-for-bit") {
    // null-safe inequality: a one-sided NULL divergence must count as a
    // diff, not evaluate to NULL and slip through the filter
    val diff = emb
      .select(vecDot(col("embedding"), col("embedding")).as("fast"), hofDot.as("slow"))
      .filter(!(col("fast") <=> col("slow")))
      .count()
    assert(diff === 0L)
  }

  test("vecDot on float literals: exact left-to-right sum, double upcast") {
    val df = spark.sql(
      """SELECT CAST(array(1.5, -2.0, 3.25) AS ARRAY<FLOAT>) AS a,
        |       CAST(array(2.0, 0.5, 4.0) AS ARRAY<FLOAT>) AS b""".stripMargin)
    val Row(d: Double) = df.select(vecDot(col("a"), col("b"))).head()
    assert(d === (1.5 * 2.0 + -2.0 * 0.5 + 3.25 * 4.0))
  }

  test("vecDot is null-safe and yields NULL on a length mismatch") {
    // a 384-dim query against a 256-dim index must surface as NULL, not
    // a silently truncated prefix score — and NULL is also what the HOF
    // aggregate(zip_with(...)) reference returns (zip_with null-pads)
    val df = spark.sql(
      """SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a,
        |       CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>) AS b,
        |       CAST(array(3.0) AS ARRAY<DOUBLE>) AS c""".stripMargin)
    val r = df.select(vecDot(col("a"), col("b")).as("n"),
      vecDot(col("c"), col("b")).as("p")).head()
    assert(r.isNullAt(0), "NULL array input propagates")
    assert(r.isNullAt(1), "length mismatch is NULL, never a prefix sum")
  }

  test("implicit casts: NULL literal and int arrays bind from SQL") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), NULL) AS n,
        |       vec_dot(array(1, 2), array(3, 4)) AS i,
        |       min_gram_hash(NULL) AS g""".stripMargin).head()
    assert(r.isNullAt(0), "NULL literal coerces and propagates")
    assert(r.getDouble(1) === 11.0, "int arrays upcast to a numeric array")
    assert(r.isNullAt(2), "min_gram_hash(NULL) coerces and propagates")
  }

  test("vec_dot is registered as a SQL function via GraftExtensions") {
    val Row(d: Double) = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(d === 11.0)
  }

  test("a null ELEMENT or length mismatch yields NULL, matching the HOF form") {
    // vec_dot is public SQL — reading a null slot as 0.0 (or truncating
    // to a common prefix) would be silently wrong data; the contract is
    // the HOF formulation's null propagation. Literal arrays
    // constant-fold (exercising eval), so the codegen branches need
    // non-foldable DataFrame columns.
    import spark.implicits._
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, CAST(NULL AS DOUBLE)),
        |               array(2.0D, 3.0D)) AS d,
        |       vec_dot(array(1.0D, 2.0D, CAST(NULL AS DOUBLE)),
        |               array(9.0D)) AS mismatch""".stripMargin).head()
    assert(r.isNullAt(0), "null element (eval path)")
    assert(r.isNullAt(1), "length mismatch is NULL (eval path)")
    val df = Seq(
        (Seq(Option(1.0), None), Seq(Option(2.0), Option(3.0))),
        (Seq(Option(1.0), Option(2.0)), Seq(Option(4.0), Option(0.5))),
        (Seq(Option(1.0)), Seq(Option(4.0), Option(0.5))))
      .toDF("a", "b")
      .select(vecDot(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0), "null element (codegen path)")
    assert(rows(1).getDouble(0) === 5.0, "null-free equal-length row unaffected")
    assert(rows(2).isNullAt(0), "length mismatch is NULL (codegen path)")
  }

  test("DESCRIBE FUNCTION documents the registered semantics") {
    // a SQL user's only discovery surface — must carry the NULL/length
    // contract, not "Usage: N/A"
    val d = spark.sql("DESCRIBE FUNCTION vec_dot").collect().map(_.getString(0)).mkString("\n")
    assert(d.contains("Dot product") && d.contains("lengths differ"), d)
    val g = spark.sql("DESCRIBE FUNCTION min_gram_hash").collect().map(_.getString(0)).mkString("\n")
    assert(g.contains("base-31"), g)
  }

  test("wrong arity raises an AnalysisException, not an internal error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0D))").head()
    }
    assert(e.getMessage.contains("vec_dot"))
  }

  test("vecNorm equals sqrt of self-dot") {
    val bad = emb.select(
        vecNorm(col("embedding")).as("n"),
        sqrt(vecDot(col("embedding"), col("embedding"))).as("s"))
      .filter(!(col("n") <=> col("s"))).count()
    assert(bad === 0L)
  }

  test("codegen and interpreted paths agree on real embeddings") {
    // Codegen path: the expression compiled inside WholeStageCodegen
    // over the non-foldable parquet column. Interpreted path: direct
    // eval() on the expression node over the SAME vectors — no codegen
    // context anywhere in that evaluation. A doGenCode/nullSafeEval
    // divergence in DotProductD fails here vector by vector.
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.DotProductD
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val viaCodegen = emb
      .select(col("vec_id").cast("long"),
        vecDot(col("embedding"), col("embedding")).as("d"))
      .as[(Long, Double)].collect().toMap
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    assert(vecs.nonEmpty)
    vecs.foreach { case (id, arr) =>
      val lit = Literal.create(arr.toSeq, ArrayType(FloatType))
      val interp = DotProductD(lit, lit).eval(null).asInstanceOf[Double]
      assert(interp == viaCodegen(id),
        s"vec $id: interpreted $interp vs codegen ${viaCodegen(id)}")
    }
  }

  override protected def afterAll(): Unit = {
    // the shared JVM-wide session outlives this suite — release the
    // suite-scoped cache instead of pinning it for every later suite
    emb.unpersist()
    super.afterAll()
  }
}
