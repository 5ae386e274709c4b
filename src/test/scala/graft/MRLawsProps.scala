package graft

import graft.mr.MapReduce
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based MR-contract laws (SURVEY §5.2 item 4), run by sbt's
  * native ScalaCheck support: the generic mapReduce must agree with the
  * declarative groupBy plan, be invariant under the reduce-partition
  * knob (the reference's R), and the keep-first dedup composition must
  * select exactly each key's minimum.
  */
object MRLawsProps extends Properties("MRLaws") {

  // each case runs Spark jobs — keep the case count modest
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val kvGen: Gen[List[(String, Int)]] =
    Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), Gen.chooseNum(-50, 50)))

  property("mapReduce(sum) == groupBy.sum") = Prop.forAll(kvGen) { pairs =>
    val ds = spark.createDataset(pairs)
    val mr = MapReduce.mapReduce[(String, Int), String, Int, (String, Long)](
      ds, Iterator(_), (k, vs) => (k, vs.map(_.toLong).sum))
      .collect().toMap
    val expected = pairs.groupMapReduce(_._1)(_._2.toLong)(_ + _)
    mr == expected
  }

  property("mapReduce result is invariant under the R partition knob") =
    Prop.forAll(kvGen, Gen.chooseNum(1, 7)) { (pairs, r) =>
      val ds = spark.createDataset(pairs)
      def run(n: Option[Int]) =
        MapReduce.mapReduce[(String, Int), String, Int, (String, Long)](
          ds, Iterator(_), (k, vs) => (k, vs.map(_.toLong).sum), n)
          .collect().toMap
      run(Some(r)) == run(None)
    }

  property("associative variant matches the all-values contract") =
    Prop.forAll(kvGen) { pairs =>
      val ds = spark.createDataset(pairs)
      val assoc = MapReduce.mapReduceAssociative[(String, Int), String, Int](
        ds, Iterator(_), _ + _).collect().toMap
      val full = MapReduce.mapReduce[(String, Int), String, Int, (String, Int)](
        ds, Iterator(_), (k, vs) => (k, vs.sum)).collect().toMap
      assoc == full
    }

  property("keep-first dedup composition selects the minimum per key") =
    Prop.forAll(kvGen) { pairs =>
      // the window composition Dedup.exactKeep is built from
      // (row_number over partition-by-content order-by-id, keep rn=1),
      // checked against a plain-Scala reference model — a law on OUR
      // composition, not a re-test of Spark's built-in dropDuplicates
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, row_number}
      val df = spark.createDataset(pairs).toDF("k", "v")
      val w = Window.partitionBy("k").orderBy("v")
      val kept = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("k", "v")
        .as[(String, Int)].collect().toSet
      val expected =
        pairs.groupMapReduce(_._1)(_._2)(math.min).toSet
      kept == expected
    }
}
