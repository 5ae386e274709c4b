package graft

import java.sql.Timestamp

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming driven synchronously via MemoryStream + memory
  * sink (SURVEY §2.B streaming row).
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** Drive tumblingCounts over the canonical 3-event fixture and assert
    * the EXACT emitted row sequence. Row-level on purpose: collapsing
    * to a Map would silently absorb a duplicate window emission — the
    * exactly-once failure mode a streaming test exists to catch. Shared
    * by the heap-provider and RocksDB-provider tests so both providers
    * are held to the identical fixture and assertion.
    */
  /** Returns the query's last progress JSON so callers can assert HOW
    * the run executed (e.g. which state-store provider engaged), not
    * just what it produced.
    */
  private def assertTumblingFixture(queryName: String): String = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.tumblingCounts(events).writeStream
      .outputMode("append").format("memory").queryName(queryName).start()
    try {
      input.addData(
        (ts(5), 1L, "click", 1.0), (ts(10), 2L, "click", 2.0),
        (ts(40), 1L, "view", 3.0))
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; push the
      // watermark far ahead to close the 10:00 window
      input.addData((Timestamp.valueOf("2024-01-01 14:00:00"), 9L, "late", 0.0))
      q.processAllAvailable()
      val rows = spark.table(queryName)
        .select("event_type", "n").as[(String, Long)].collect()
        .sortBy(_._1).toSeq
      assert(rows == Seq("click" -> 2L, "view" -> 1L))
      q.lastProgress.json
    } finally q.stop()
  }

  test("tumbling watermark aggregation over a memory stream") {
    assertTumblingFixture("tumble_out")
  }

  test("streaming dedup drops exact (key, ts) redeliveries, keeps later same-key events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.dedupStream(events, Seq("user_id", "event_type"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      input.addData(
        (ts(1), 1L, "click", 1.0), (ts(1), 1L, "click", 1.0), // redelivery
        (ts(9), 1L, "click", 1.0), // same key, later ts: NOT a duplicate
        (ts(2), 1L, "view", 1.0))
      q.processAllAvailable()
      // assert WHICH rows survived, not just how many — a dedup that
      // kept the wrong occurrence would still count 3
      val kept = spark.table("dedup_out").select("ts", "event_type")
        .as[(Timestamp, String)].collect().sortBy(_._1.getTime).toSeq
      assert(kept == Seq(ts(1) -> "click", ts(2) -> "view", ts(9) -> "click"))
    } finally q.stop()
  }

  test("streaming exact dedup keeps only each key's first occurrence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.dedupStreamExact(events, Seq("user_id", "event_type"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_exact_out").start()
    try {
      input.addData(
        (ts(1), 1L, "click", 1.0), (ts(1), 1L, "click", 1.0),
        (ts(9), 1L, "click", 1.0), // same key, later ts: still dropped
        (ts(2), 1L, "view", 1.0))
      q.processAllAvailable()
      // the kept ts values prove FIRST-occurrence semantics: keeping
      // the ts(9) click instead would also count 2
      val kept = spark.table("dedup_exact_out").select("ts", "event_type")
        .as[(Timestamp, String)].collect().sortBy(_._1.getTime).toSeq
      assert(kept == Seq(ts(1) -> "click", ts(2) -> "view"))
    } finally q.stop()
  }

  test("watermark-bounded dedup suppresses near duplicates and evicts old state") {
    // the third dedup discipline (dropDuplicatesWithinWatermark): a key
    // is suppressed only while its first occurrence is younger than the
    // watermark delay — so the SAME key must pass again after the
    // watermark evicts its state, which is exactly what distinguishes
    // this from dedupStreamExact (and what bounds state at 100 TB/day)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.dedupStreamWithinWatermark(events, Seq("user_id", "event_type"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm_out").start()
    try {
      input.addData(
        (ts(1), 1L, "click", 1.0), (ts(1), 1L, "click", 1.0), // redelivery
        (ts(3), 1L, "click", 1.0)) // same key within the delay: suppressed
      q.processAllAvailable()
      // another user's far-future event pushes the watermark past
      // user 1's first occurrence + 2h delay, evicting its state
      val day2 = Timestamp.valueOf("2024-01-02 10:00:00")
      input.addData((day2, 2L, "view", 0.0))
      q.processAllAvailable()
      // same key again, after eviction: passes (exact dedup would drop it)
      val day2b = Timestamp.valueOf("2024-01-02 10:30:00")
      input.addData((day2b, 1L, "click", 1.0))
      q.processAllAvailable()
      val kept = spark.table("dedup_wm_out").select("ts", "user_id")
        .as[(Timestamp, Long)].collect().sortBy(_._1.getTime).toSeq
      assert(kept == Seq(ts(1) -> 1L, day2 -> 2L, day2b -> 1L))
    } finally q.stop()
  }

  test("unbounded rate source runs under a processing-time trigger") {
    // The one streaming shape the oracle-checked replay queries never
    // exercise: a genuinely unbounded source (no AvailableNow), a
    // continuous processing-time trigger, stopped by the caller after
    // observing real micro-batches. Shape-asserted only — an unbounded
    // source has no batch oracle, so it stays out of SparkEntry.queries.
    import spark.implicits._
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .groupBy((col("value") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("rate_out")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000L
      // q.isActive in the loop condition: a query that dies on its
      // first micro-batch must fail fast, not spin the full deadline
      while (System.currentTimeMillis() < deadline && q.isActive &&
          q.recentProgress.count(_.numInputRows > 0) < 2)
        Thread.sleep(100)
      assert(q.isActive, s"rate query died: ${q.exception}")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "rate source delivered fewer than 2 non-empty micro-batches in 30s")
    } finally q.stop()
    val out = spark.table("rate_out")
    assert(out.columns.toSeq == Seq("bucket", "n"))
    val (buckets, total) = (out.select("bucket").as[Long].collect().toSet,
      out.agg(sum("n")).head().getLong(0))
    assert(total > 0 && buckets.subsetOf((0L to 9L).toSet))
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.statefulSessions(input.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      // two bursts 30 min apart -> first session closes when the second
      // batch arrives (event-time gap logic inside the state fn)
      input.addData(Streams.Event(ts(0), 1L, "click", 1.0),
        Streams.Event(ts(2), 1L, "click", 2.0))
      q.processAllAvailable()
      input.addData(Streams.Event(ts(40), 1L, "click", 5.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Streams.SessionOut].collect()
      assert(closed.length == 1)
      assert(closed.head.nEvents == 2 && closed.head.valueSum == 3.0)
    } finally q.stop()
  }

  test("stateful session closes via event-time timeout when watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.statefulSessions(input.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_to_out").start()
    try {
      input.addData(Streams.Event(ts(0), 1L, "click", 1.0),
        Streams.Event(ts(2), 1L, "click", 2.0))
      q.processAllAvailable()
      // another user's far-future event advances the watermark past
      // user 1's lastTs + gap (watermark delay is 2h): 15:00 - 2h =
      // 13:00 > 10:02 + 10min. The timeout fires on the batch AFTER the
      // watermark update, so feed one more event and drain again.
      input.addData(Streams.Event(
        Timestamp.valueOf("2024-01-01 15:00:00"), 2L, "click", 0.0))
      q.processAllAvailable()
      input.addData(Streams.Event(
        Timestamp.valueOf("2024-01-01 15:01:00"), 2L, "click", 0.0))
      q.processAllAvailable()
      val closed = spark.table("sess_to_out").as[Streams.SessionOut].collect()
        .filter(_.userId == 1L)
      assert(closed.length == 1)
      assert(closed.head.nEvents == 2 && closed.head.valueSum == 3.0)
    } finally q.stop()
  }

  test("streaming session_window aggregation runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.sessionCounts(events).writeStream
      .outputMode("append").format("memory").queryName("swin_out").start()
    try {
      input.addData((ts(0), 1L, "a", 1.0), (ts(5), 1L, "a", 1.0),
        (ts(50), 1L, "a", 1.0))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 15:00:00"), 2L, "a", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("swin_out")
        .filter(col("user_id") === 1L).select("n_events")
        .as[Long].collect().sorted.toSeq
      assert(sessions == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream fixture scopes restore every session conf they touch") {
    // the replay fixtures transiently pin shuffle partitions, the
    // checkpoint base, and the no-data micro-batch flag; a broken
    // restore would silently degrade every LATER query in the session
    // (e.g. batch shuffles stuck at fan-out 2, or batch queries
    // inheriting a streaming checkpoint dir), which no per-query oracle
    // can catch — so assert the conf round-trip explicitly
    val keys = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.streaming.checkpointLocation",
      "spark.sql.streaming.noDataMicroBatches.enabled")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    val out = SparkEntry.queries("stream_tumbling")(spark, sfDir)
    assert(out.count() > 0)
    val after = keys.map(k => k -> spark.conf.getOption(k))
    assert(after == before,
      s"stream fixture leaked session conf: $before -> $after")
  }

  test("append-mode session windows emit exactly the watermark-closed sessions") {
    // Pins the emission rule `stream_session_append` relies on (a
    // session flushes once, when the watermark passes last-event+gap)
    // on a hand-computed input, independent of the oracle fixtures:
    // a session behind the watermark emits, a session ahead of it is
    // withheld, and nothing ever re-emits.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.sessionCounts(events).writeStream
      .outputMode("append").format("memory").queryName("sess_append_out")
      .start()
    try {
      def emitted(): Seq[(Long, Timestamp, Long)] =
        spark.table("sess_append_out")
          .select("user_id", "session_start", "n_events")
          .as[(Long, Timestamp, Long)].collect().sortBy(_._2.getTime).toSeq
      // user 1: events at 10:00 and 10:10 merge into one session
      // (end 10:40); a third at 13:00 opens a second session. After
      // this batch the watermark is 13:00 − 2 h = 11:00: the trailing
      // no-data batch must flush session 1 (10:40 ≤ 11:00) and must
      // NOT flush session 2 (13:30 > 11:00).
      input.addData(
        (ts(0), 1L, "click", 1.0), (ts(10), 1L, "click", 1.0),
        (Timestamp.valueOf("2024-01-01 13:00:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, ts(0), 2L)),
        "only the session behind the watermark may flush")
      // advance the watermark to 14:00: session 2 (ends 13:30) closes
      // and emits; the advancing event's OWN session (ends 16:30) is
      // withheld, and session 1 does not re-emit
      input.addData((Timestamp.valueOf("2024-01-01 16:00:00"), 9L, "late", 0.0))
      q.processAllAvailable()
      assert(emitted() == Seq(
        (1L, ts(0), 2L),
        (1L, Timestamp.valueOf("2024-01-01 13:00:00"), 1L)),
        "the closed session emits exactly once; the open one is withheld")
    } finally q.stop()
  }

  test("stateful aggregation runs unchanged on the RocksDB state store") {
    // The default state store keeps every key's state on the executor
    // heap — the one streaming component that does NOT survive a 100 TB
    // scale-up (state O(keys) vs heap O(GB)). Spark's RocksDB provider
    // spills state to local disk with the same exactly-once contract;
    // this proves the engine's stateful queries are provider-agnostic:
    // the SAME tumblingCounts plan, only the session conf differs — at
    // cluster scale the provider is a config flip, not a rewrite.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the SAME fixture and assertion as the heap-provider test —
      // shared runner, so the provider-agnostic claim is always tested
      // against an identical workload. Assert the provider actually
      // engaged: a renamed/typo'd conf key would silently fall back to
      // the heap provider and this test would prove nothing
      val progress = assertTumblingFixture("rocksdb_out")
      assert(progress.contains("rocksdb"),
        s"state-operator metrics show no RocksDB engagement:\n$progress")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
