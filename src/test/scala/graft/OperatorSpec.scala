package graft

import org.apache.spark.sql.functions._

/** Unit tests with tiny in-memory frames + smoke over every registered
  * query (each must run and return its declared sorted output).
  */
class OperatorSpec extends SparkSpec {

  test("every registered query runs on sf0.001 and is non-degenerate") {
    val results = SparkEntry.queries.map { case (name, fn) =>
      val df = fn(spark, sfDir)
      name -> df.count()
    }
    // candidate-pair queries can legitimately be small but not negative;
    // everything else must produce rows
    val mustBeNonEmpty = results.filterNot { case (n, _) =>
      n.contains("pairs") || n == "sim_topk_lsh" || n.contains("anti")
    }
    val empty = mustBeNonEmpty.filter(_._2 == 0L).keys.toSeq
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("join types on tiny frames") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val r = Seq((1, "x"), (1, "y"), (4, "z")).toDF("id", "w")
    assert(l.join(r, Seq("id"), "inner").count() == 2)
    assert(l.join(r, Seq("id"), "left").count() == 4)
    assert(l.join(r, Seq("id"), "left_semi").as[(Int, String)].collect().toSet ==
      Set((1, "a")))
    assert(l.join(r, Seq("id"), "left_anti").select("id").as[Int].collect().toSet ==
      Set(2, 3))
    assert(l.crossJoin(r).count() == 9)
  }

  test("dedup idempotence on documents") {
    val once = operators.Dedup.queries("dedup_exact_keep")(spark, sfDir)
    val n1 = once.count()
    // dedup of an already-deduped set keeps everything
    val again = once.dropDuplicates("doc_id")
    assert(again.count() == n1)
  }

  test("windows: row_number bounded by partition size") {
    val df = operators.Relational.queries("rel_window_rank")(spark, sfDir)
    assert(df.agg(max("rn")).head().getLong(0) <= 3)
  }

  test("topk returns exactly k ordered rows") {
    val df = operators.Relational.queries("rel_topk")(spark, sfDir)
    val prices = df.collect().map(_.getDouble(2)).toSeq
    assert(prices.length == 100)
    assert(prices == prices.sortBy(-_))
  }

  test("cosine similarity: self-similarity is 1") {
    val sim = operators.Similarity.queries("sim_cos_pairs")(spark, sfDir)
    // pairs exclude self; check the brute-force query instead: a query
    // vector's own row is excluded, so top hit sim < 1 but >= -1
    val brute = operators.Similarity.queries("sim_topk_brute")(spark, sfDir)
    val sims = brute.collect().map(_.getDouble(3))
    assert(sims.forall(s => s >= -1.000001 && s <= 1.000001))
    assert(sim.columns.toSeq == Seq("va", "vb", "label", "sim"))
  }

  test("PPM codec round-trips, rejects garbage, and halves exactly") {
    import operators.Multimodal.PpmCodec
    val img = PpmCodec.synthesize("hello world".getBytes)
    val back = PpmCodec.decode(PpmCodec.encode(img))
    assert(back.width == img.width && back.height == img.height)
    assert(java.util.Arrays.equals(back.pixels, img.pixels))
    // header tokenizer handles comments and extra whitespace (netpbm spec)
    val commented = ("P6 #c\n# full comment line\n " +
      s"${img.width}\t${img.height}\n255\n")
      .getBytes("US-ASCII") ++ img.pixels
    assert(PpmCodec.decode(commented).brightness == img.brightness)
    val empty = PpmCodec.synthesize(Array.emptyByteArray)
    assert(empty.width >= 16 && empty.height >= 16 && empty.brightness == 0.0)
    intercept[IllegalArgumentException] {
      PpmCodec.decode("JFIF....".getBytes)
    }
    intercept[IllegalArgumentException] { // w*h*3 overflows Int to 0
      PpmCodec.decode("P6\n65536 65536\n255\n".getBytes)
    }
    intercept[IllegalArgumentException] { // digit accumulation must not wrap
      PpmCodec.decode(("P6\n4294967297 1\n255\n" + "xxx").getBytes)
    }
    intercept[IllegalArgumentException] { // truncated plane
      PpmCodec.decode(PpmCodec.encode(img).dropRight(1))
    }
    val half = PpmCodec.halve(img)
    assert(half.width == img.width / 2 && half.height == img.height / 2)
    // nearest-neighbor: output (0,0) is input (0,0), output (1,0) is input (2,0)
    assert(half.pixels(0) == img.pixels(0))
    assert(half.pixels(3) == img.pixels(6))
  }
}
