package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-11 additions: the SCD2 dimension rebuild
  * (rel_scd2), the deterministic corpus split (pipe_split), and the
  * per-source quality cap (pipe_domain_cap) — plus the plan shapes
  * that make each scale (single data exchange; WindowGroupLimit on
  * both sides of the cap's shuffle).
  */
class Scd2PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  // ---- rel_scd2 ---------------------------------------------------------

  private lazy val scd2 =
    operators.RelationalExt.queries("rel_scd2")(spark, dir)
  private lazy val scd2Rows = scd2.collect()

  test("scd2: versions are consecutive from 1 and exactly the last one is current") {
    val byCust = scd2Rows.groupBy(_.getLong(0))
    byCust.foreach { case (k, rows) =>
      val versions = rows.map(_.getLong(1)).sorted
      assert(versions.toSeq == (1L to versions.length).toSeq,
        s"customer $k: versions not consecutive: ${versions.toSeq}")
      val current = rows.filter(_.getBoolean(6))
      assert(current.length == 1 &&
        current.head.getLong(1) == versions.length,
        s"customer $k: is_current not exactly the last version")
      current.foreach(r => assert(r.isNullAt(4),
        s"customer $k: current version carries a valid_to"))
    }
  }

  test("scd2: intervals chain — each valid_to is the next version's valid_from") {
    scd2Rows.groupBy(_.getLong(0)).foreach { case (k, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDate(4) == b.getDate(3),
            s"customer $k: v${a.getLong(1)} valid_to != v${b.getLong(1)} valid_from")
          assert(a.getString(2) != b.getString(2),
            s"customer $k: adjacent runs share priority — run encoding not maximal")
        case _ => ()
      }
    }
  }

  test("scd2: per-customer n_orders tie out to the fact table") {
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = scd2Rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(5)).sum).toMap
    assert(got == want, "interval order counts do not partition the history")
  }

  test("scd2: one data exchange serves both windows and the run aggregation") {
    // the AQE string repeats the plan under "== Initial Plan ==" —
    // count in the final section only
    val plan = scd2.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // 1 hash exchange on o_custkey; the terminal orderBy is an Exchange
    // rangepartitioning, not counted here
    assert(exchanges == 1,
      s"expected exactly one hash exchange (got $exchanges):\n$plan")
  }

  // ---- pipe_split -------------------------------------------------------

  private lazy val split =
    operators.TrainingPipeline.queries("pipe_split")(spark, dir).collect()

  test("split: cells partition each language exactly") {
    val langTotals = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val summed = split.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(summed == langTotals, "per-lang split counts != corpus totals")
    split.foreach { r =>
      assert(r.getLong(4) == langTotals(r.getString(1)),
        s"lang_total column drifted for ${r.getString(1)}")
    }
    val splits = split.map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"), s"unexpected splits: $splits")
  }

  test("split: assignment is a pure function of doc_id (stable under replan)") {
    val q = operators.TrainingPipeline.queries("pipe_split")
    val again = q(spark, dir).repartition(7).orderBy("split", "lang").collect()
    assert(split.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "split accounting changed across plans — assignment is not row-local")
  }

  // ---- pipe_domain_cap ---------------------------------------------------

  private lazy val cap =
    operators.TrainingPipeline.queries("pipe_domain_cap")(spark, dir)
  private lazy val capRows = cap.collect()

  test("domain cap: exactly min(CAP, |source|) kept, ranked without gaps") {
    val perSource = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    capRows.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val wantN = math.min(60L, perSource(src))
      assert(rows.length == wantN, s"$src: kept ${rows.length}, want $wantN")
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to wantN).toSeq,
        s"$src: ranks not consecutive")
    }
  }

  test("domain cap: every kept doc dominates every dropped doc of its source") {
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val kept = capRows.map(r => (r.getString(0), r.getLong(2))).toSet
    // ordering key: longer first, doc_id breaks ties
    def beats(a: (Long, Long), b: (Long, Long)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    all.groupBy(_._1).foreach { case (src, docs) =>
      val (k, d) = docs.partition(x => kept((src, x._2)))
      if (d.nonEmpty) {
        val worstKept = k.map(x => (x._2, x._3)).minBy(x => (x._2, -x._1))
        val bestDropped = d.map(x => (x._2, x._3)).maxBy(x => (x._2, -x._1))
        assert(beats(worstKept, bestDropped),
          s"$src: dropped doc $bestDropped outranks kept $worstKept")
      }
    }
  }

  test("domain cap: WindowGroupLimit bounds the shuffle on both sides") {
    val plan = cap.queryExecution.executedPlan.toString
    val hits = "WindowGroupLimit".r.findAllIn(plan).length
    assert(hits >= 2,
      s"expected partial+final WindowGroupLimit (got $hits):\n$plan")
  }
}
