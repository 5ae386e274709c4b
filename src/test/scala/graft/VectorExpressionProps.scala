package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Properties closing the `vec_dot` strict-semantics class
  * (VectorExpressionSpec pins the cases; these pin the LAW): on
  * arbitrary float arrays — including null elements, null arrays, and
  * length mismatches — the codegen'd expression must agree BIT-FOR-BIT
  * with the interpreted `aggregate(zip_with(a, b, (x,y) -> x*y), 0D,
  * (acc,v) -> acc+v)` formulation it replaces (null pad / null element
  * poisons the sum to NULL; the double cast inside the lambda mirrors
  * vec_dot's upcast-then-multiply order), and the expression's
  * interpreted eval must agree with a plain-Scala strict model.
  */
object VectorExpressionProps extends Properties("VecDot") {

  // each case runs Spark jobs — keep the case count modest
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val elemGen: Gen[java.lang.Float] = Gen.frequency(
    12 -> Gen.chooseNum(-100f, 100f).map(java.lang.Float.valueOf),
    // exact binary fractions and whole floats hit the no-rounding paths
    4 -> Gen.chooseNum(-8, 8).map(n => java.lang.Float.valueOf(n * 0.25f)),
    1 -> Gen.const(null: java.lang.Float))

  private def arrGen(n: Int): Gen[Seq[java.lang.Float]] =
    Gen.listOfN(n, elemGen)

  /** Pairs: mostly equal-length, plus mismatched lengths and null
    * arrays — every branch of the strict contract.
    */
  private val pairGen: Gen[(Seq[java.lang.Float], Seq[java.lang.Float])] =
    Gen.frequency(
      6 -> Gen.choose(0, 6).flatMap(n => Gen.zip(arrGen(n), arrGen(n))),
      2 -> (for {
        n <- Gen.choose(0, 5); m <- Gen.choose(0, 5).suchThat(_ != n)
        a <- arrGen(n); b <- arrGen(m)
      } yield (a, b)),
      1 -> Gen.choose(0, 4).flatMap(n =>
        arrGen(n).map(a => (null: Seq[java.lang.Float], a))),
      1 -> Gen.choose(0, 4).flatMap(n =>
        arrGen(n).map(a => (a, null: Seq[java.lang.Float]))))

  private def sameBits(x: Any, y: Any): Boolean = (x, y) match {
    case (null, null) => true
    case (a: java.lang.Double, b: java.lang.Double) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    case _ => false
  }

  property("codegen'd vec_dot is bit-identical to the interpreted " +
      "aggregate(zip_with) formulation") = Prop.forAll(
    Gen.listOfN(8, pairGen)) { pairs =>
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    import scala.jdk.CollectionConverters._
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      org.apache.spark.sql.Row(i, a, b) }
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = df.select(col("id"),
        org.apache.spark.sql.graft.VectorColumns.vecDot(col("a"), col("b"))
          .as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * " +
          "CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
          .as("ref"))
      .collect()
    got.length == pairs.length && got.forall(r => sameBits(r.get(1), r.get(2)))
  }

  property("interpreted eval agrees with a plain-Scala strict model") =
    Prop.forAll(pairGen) { case (a, b) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types._
      val t = ArrayType(FloatType, containsNull = true)
      val e = org.apache.spark.sql.graft.DotProductD(
        Literal.create(a, t), Literal.create(b, t))
      val model: Any =
        if (a == null || b == null || a.length != b.length ||
            a.contains(null) || b.contains(null)) null
        else java.lang.Double.valueOf(
          a.zip(b).foldLeft(0.0)((acc, p) =>
            acc + p._1.doubleValue * p._2.doubleValue))
      sameBits(e.eval(null), model)
    }
}
