package graft

import org.apache.spark.sql.functions._

/** Pins the two round-13 structural claims that no oracle row can see
  * directly:
  *
  *  1. `stream_session` (now the append+rollup shape) and its
  *     per-session twin `stream_session_append` are views of the SAME
  *     finalized session set — the rollup's session counts, event
  *     counts, and value sums must reconcile row-for-row with the
  *     twin's per-session table. A drift here means the two builders'
  *     emission cutoffs diverged, which the independent DuckDB oracles
  *     would also catch but only as two unrelated hash failures; this
  *     test names the relationship.
  *
  *  2. The BPE train path retains O(1) checkpointed rounds, not
  *     O(merges) — the round-13 eager-argmax fix. The old shape kept
  *     every round's localCheckpoint blocks alive through the lazy
  *     per-round argmax frames (BpeLadderBench measured the 3×
  *     per-round bookkeeping growth by round 1000); the fix is only
  *     real if the persistent-RDD census stays flat as the merge count
  *     grows, which is exactly what this asserts.
  */
class Round13Spec extends SparkSpec {

  test("stream_session is the per-user rollup of exactly the sessions " +
      "its append twin emits") {
    val rollup = SparkEntry.queries("stream_session")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
      .toMap
    val sessions = SparkEntry.queries("stream_session_append")(spark, sfDir)
      .collect()
    assert(sessions.nonEmpty, "fixture must finalize at least one session")
    val byUser = sessions.groupBy(_.getLong(0))
    assert(rollup.keySet == byUser.keySet,
      "rollup user set != twin's finalized-session user set")
    byUser.foreach { case (user, rows) =>
      val (nSessions, nEvents, valueSum, first, last) = rollup(user)
      assert(nSessions == rows.length, s"user $user session count")
      assert(nEvents == rows.map(_.getLong(2)).sum, s"user $user event count")
      // the twin emits per-session value sums as double; the rollup
      // re-aggregates in decimal. Exact 6-dp equality would assume every
      // double is within 5e-7 of its decimal — false once sums exceed
      // ~3e9 (double ulp > 1e-6) — so reconcile with a per-session ulp
      // budget: each of the n sessions may contribute one rounding ulp.
      val twinSum = rows.map(r => BigDecimal(r.getDouble(3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val ulpBudget = rows.map(r => BigDecimal(math.ulp(r.getDouble(3)))).sum +
        BigDecimal("0.000001") * rows.length
      assert((BigDecimal(valueSum) - twinSum).abs <= ulpBudget,
        s"user $user value sum: $valueSum vs $twinSum (budget $ulpBudget)")
      assert(first == rows.map(_.getLong(1)).min, s"user $user first start")
      assert(last == rows.map(_.getLong(1)).max, s"user $user last start")
    }
  }

  test("the BPE train path retains O(1) checkpointed rounds: the " +
      "persistent-RDD census stays flat as merges grow") {
    def census: Int = spark.sparkContext.getPersistentRDDs.size
    def trainDelta(merges: Int): Int = {
      val before = census
      val (bests, vocab, _) = operators.TextAnalysis.bpeRounds(spark, sfDir, merges)
      // force both outputs the way the contract queries do
      assert(bests.count() >= 0)
      assert(vocab.agg(count(lit(1))).collect().head.getLong(0) > 0)
      val delta = census - before
      // release this run's surviving final-round blocks so repeated
      // calls (and later suites) see a clean census
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      delta
    }
    val d5 = trainDelta(5)
    val d25 = trainDelta(25)
    // only the FINAL round's checkpoint survives the loop (plus, at
    // most, one transient): the census delta must not grow with the
    // merge count — the O(merges) retention was the r12 defect
    assert(d5 <= 2, s"5-merge train left $d5 persisted RDDs")
    assert(d25 <= 2, s"25-merge train left $d25 persisted RDDs")
    assert(d25 <= d5 + 1,
      s"retained blocks grew with merge count: $d5 -> $d25")
  }
}
