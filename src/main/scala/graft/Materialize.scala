package graft

import org.apache.spark.sql.DataFrame

/** Materialize-once helper for contract queries whose pre-sort
  * projection is measured-expensive (r17 optimization, guide §1.2:
  * "don't compute things you throw away").
  *
  * A terminal global `orderBy` plans a range exchange whose
  * partition-bound SAMPLING job executes the whole child plan once
  * before the real pass does — so an expensive row-local projection
  * (the BigDecimal rounds of fn_math, the JSON parses of
  * fn_map/fn_json, the multi-regex scrub of text_pii_scrub) runs
  * TWICE per query for one output. `localCheckpoint(eager)` pays the
  * projection exactly once; the sampling job and the shuffle both
  * read the materialized rows. Measured at sf0.1/local[32]:
  * fn_math 2.41 → 1.68 s min, fn_map 1.66 → 0.85 s min
  * (OPTIMIZATION_r17.md §2).
  *
  * Scale stance: the materialized bytes equal the sort's own shuffle
  * footprint (the projection IS the output), so this trades one local
  * write+read for re-running a projection measured at ≥2× the scan
  * cost — the classic cache-vs-recompute call, made per query from
  * measurements, not globally. Blocks live on executors
  * (MEMORY_AND_DISK, spills under pressure).
  *
  * Lifecycle: keyed by (query, dataset); re-invoking the same query
  * frees the PREVIOUS invocation's blocks first (sweep N's consumers
  * are done before sweep N+1 constructs — the Bench/Verify/spec
  * lifecycle), so steady state holds one block set per query instead
  * of one per invocation (the retained-sink lesson in Bench.once).
  * Like the CC rounds, a freed checkpoint cannot be recomputed: a
  * caller that holds a stale frame across a re-invocation of the same
  * query must materialize it first. [[clear]] releases everything at
  * end of run (Cleanup.releaseAll also sweeps getPersistentRDDs, the
  * backstop that already covered the CC loop's blocks).
  */
object Materialize {
  private val last = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]

  /** Scale-adaptive scan fan-out for heavy row-local compute over an
    * effectively unsplittable input (guide §2.5: "one huge unsplittable
    * file … repartition immediately after the read"). The driver
    * fixtures are single-row-group parquet files, so EVERY scan stage —
    * and any expensive projection fused into it — runs as ONE task
    * regardless of core count; a corpus-scale table scans with
    * thousands of partitions and must NOT pay an extra exchange. The
    * gate is therefore the measured layout, not a constant: fan out to
    * the session's parallelism only when the scan yields fewer than
    * half that many partitions. Round-robin repartition is
    * deterministic (sort-before-repartition is on by default,
    * SPARK-23207) and every consumer downstream is row-local or
    * order-independent, so results are unchanged at any fan-out.
    */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  def once(key: String, df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    val prev = last.put(key, c)
    if (prev != null) free(prev)
    c
  }

  def clear(): Unit = {
    last.values().forEach(free(_))
    last.clear()
  }

  /** Dataset.unpersist is a no-op on checkpoint blocks (they are
    * RDD-level persists the CacheManager never registered) — unpersist
    * the LogicalRDD's RDD directly, as ConnectedComponents.freeCheckpoint
    * does.
    */
  private def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false); ()
      case _ => ()
    }
}
