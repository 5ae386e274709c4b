package graft

import graft.mr.MapReduce
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => ScalaCheckTest}

/** MR-contract laws (SURVEY §5.2.4): the generic mapReduce reproduces
  * declarative groupBy results, is partition-count invariant, and the
  * reduce sees the complete value list per key.
  */
class MapReduceSpec extends SparkSpec {

  private def runMr(data: Seq[(String, Int)], parts: Option[Int]): Map[String, Long] = {
    import spark.implicits._
    MapReduce.mapReduce[(String, Int), String, Int, (String, Long)](
      data.toDS(),
      kv => Iterator.single(kv),
      (k, vs) => (k, vs.map(_.toLong).sum),
      parts
    ).collect().toMap
  }

  test("mapReduce(sum) equals groupBy.sum (property)") {
    val gen = Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c", "dd", "e!e"), Gen.chooseNum(-100, 100)))
    val prop = forAll(gen) { data =>
      val expected = data.groupBy(_._1).view
        .mapValues(_.map(_._2.toLong).sum).toMap
      runMr(data, None) == expected
    }
    val res = ScalaCheckTest.check(
      ScalaCheckTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("partition-count invariance") {
    val data = (1 to 500).map(i => (s"k${i % 17}", i))
    assert(runMr(data, Some(1)) == runMr(data, Some(7)))
    assert(runMr(data, Some(7)) == runMr(data, None))
  }

  test("reduce sees the complete value list (non-associative fold)") {
    import spark.implicits._
    // concatenation of sorted values — only correct if reduce gets ALL
    // values at once (the reference contract, worker.cc:238)
    val data = Seq(("k", 3), ("k", 1), ("k", 2), ("j", 9))
    val out = MapReduce.mapReduce[(String, Int), String, Int, (String, String)](
      data.toDS(),
      kv => Iterator.single(kv),
      (k, vs) => (k, vs.toSeq.sorted.mkString("-"))
    ).collect().toMap
    assert(out == Map("k" -> "1-2-3", "j" -> "9"))
  }

  test("mapReduceAssociative matches mapReduce for a monoid") {
    import spark.implicits._
    val data = (1 to 200).map(i => (s"k${i % 5}", i))
    val a = MapReduce.mapReduceAssociative[(String, Int), String, Int](
      data.toDS(), kv => Iterator.single(kv), _ + _).collect().toMap
    val b = data.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(a == b)
  }

  test("flatMap-style map emits 0..n records") {
    import spark.implicits._
    val docs = Seq("a b a", "", "b").toDS()
    val out = MapReduce.mapReduce[String, String, Int, (String, Long)](
      docs,
      line => line.split(" ").iterator.filter(_.nonEmpty).map(w => (w, 1)),
      (k, vs) => (k, vs.map(_.toLong).sum)
    ).collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 2L))
  }

  test("secondary sort: the streaming fold sees each key's values in " +
      "(date, orderkey) order — checksum matches a driver-side recompute") {
    val got = operators.WordCount.queries("mr_secondary_sort")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val P = 1000000007L
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "unix_micros(o_orderdate) AS ts", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = raw.groupBy(_._1).map { case (k, rows) =>
      val ks = rows.sortBy(t => (t._2, t._3)).map(_._3).toSeq
      val h = ks.map(_ % P).reduceLeft((a, x) => (a * 31 + x) % P)
      k -> ((ks.length.toLong, ks.head, ks.last, h))
    }
    assert(got == expected)
  }
}
