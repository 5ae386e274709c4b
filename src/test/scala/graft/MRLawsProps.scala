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

  property("WeightedMean aggregator equals the exact Scala model and " +
      "is invariant under repartitioning") = {
    val rowGen: Gen[List[(String, Int, Int)]] = Gen.listOfN(30,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0, 99), Gen.chooseNum(-99, 99)))
    Prop.forAll(rowGen, Gen.chooseNum(1, 5)) { (rows, parts) =>
      // cents-scale decimals exercise the exact-sum claim: the
      // Aggregator's BigDecimal partials must make the result identical
      // to an unpartitioned exact fold, whatever the partitioning
      val data = rows.map { case (k, q, p) =>
        (k, BigDecimal(q) / 100, BigDecimal(p) / 100) }
      def run(np: Int): Map[String, Double] = {
        val ds = spark.createDataset(data).repartition(np)
        ds.groupByKey(_._1)
          .agg(graft.functions.WeightedMean.toColumn.name("wavg"))
          .collect().toMap
      }
      val model = data.groupMapReduce(_._1)(t => (t._2 * t._3, t._2))(
        (a, b) => (a._1 + b._1, a._2 + b._2))
        .view.mapValues(s => s._1.toDouble / s._2.toDouble).toMap
      val got = run(parts)
      def same(x: Double, y: Double): Boolean =
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      got.keySet == model.keySet &&
        got.forall { case (k, v) => same(v, model(k)) } &&
        run(1).forall { case (k, v) => same(v, got(k)) }
    }
  }

  property("keep-first dedup composition selects the lex-min row per key") =
    Prop.forAll(kvGen) { pairs =>
      // the partial-aggregatable min(struct) composition Dedup.exactKeep
      // is built from (group by content-hash, min over a struct whose
      // FIRST field is the keeper-ordering key, carrying the payload
      // fields behind it), checked against a plain-Scala reference
      // model — a law on OUR composition, not a re-test of Spark's
      // built-in dropDuplicates. The payload column makes the carried-
      // whole contract observable: ties on v must resolve by the struct's
      // NEXT field, exactly Scala's lexicographic tuple Ordering.
      import org.apache.spark.sql.functions.{col, min, struct}
      val df = spark.createDataset(pairs.zipWithIndex)
        .map { case ((k, v), i) => (k, v, s"p$i") }
        .toDF("k", "v", "payload")
      val kept = df.groupBy(col("k"))
        .agg(min(struct(col("v"), col("payload"))).as("keep"))
        .select(col("k"), col("keep.v"), col("keep.payload"))
        .as[(String, Int, String)].collect().toSet
      val expected = pairs.zipWithIndex
        .map { case ((k, v), i) => (k, (v, s"p$i")) }
        .groupMapReduce(_._1)(_._2)(Ordering[(Int, String)].min)
        .map { case (k, (v, p)) => (k, v, p) }.toSet
      kept == expected
    }
}
