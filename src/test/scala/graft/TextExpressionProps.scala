package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Properties for the MinGramHash Catalyst expression: the codegen'd
  * tight-loop result must agree with an obviously-correct Scala
  * reference on arbitrary ASCII inputs (including the short/empty pad
  * path), and the expression's interpreted eval (used off the codegen
  * path, e.g. under constant folding) must agree too.
  */
object TextExpressionProps extends Properties("MinGramHash") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  /** Reference: pad with 8 spaces, min base-31 hash over max(len-7,1)
    * 8-char windows.
    */
  private def reference(s: String): Long = {
    val padded = s + (" " * 8)
    (0 until math.max(s.length - 7, 1)).map { i =>
      padded.slice(i, i + 8).foldLeft(0L)((h, c) => h * 31L + c.toLong)
    }.min
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const(' ')))
      .map(_.mkString)

  property("codegen'd batch result equals the Scala reference") =
    Prop.forAll(Gen.listOfN(12, asciiText)) { texts =>
      import spark.implicits._
      val got = texts.zipWithIndex.map { case (t, i) => (i, t) }
        .toDF("id", "s")
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.graft.TextColumns.minGramHash(
            org.apache.spark.sql.functions.col("s")).as("h"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      texts.zipWithIndex.forall { case (t, i) => got(i) == reference(t) }
    }

  property("interpreted eval equals the Scala reference") =
    Prop.forAll(asciiText) { t =>
      val e = org.apache.spark.sql.graft.MinGramHash(
        org.apache.spark.sql.catalyst.expressions.Literal(t))
      e.eval(null) == reference(t)
    }
}
