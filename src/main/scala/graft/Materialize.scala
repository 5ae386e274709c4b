package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialize-once helper for contract queries whose pre-sort
  * projection is measured-expensive (r17 optimization, guide §1.2:
  * "don't compute things you throw away").
  *
  * A terminal global `orderBy` plans a range exchange whose
  * partition-bound SAMPLING job executes the whole child plan once
  * before the real pass does — so an expensive row-local projection
  * (the BigDecimal rounds of fn_math, the JSON parses of
  * fn_map/fn_json, the multi-regex scrub of text_pii_scrub) runs
  * TWICE per query for one output. Materializing the projection pays
  * it exactly once; the sampling job and the shuffle both read the
  * materialized rows. Measured at sf0.1/local[32]:
  * fn_math 2.41 → 1.68 s min, fn_map 1.66 → 0.85 s min
  * (OPTIMIZATION_r17.md §2).
  *
  * Materialization primitive (r18, the round-17 verdict's top item):
  * gated on the master. Under `local[*]` it is `localCheckpoint(eager)`
  * — executor loss IS driver loss there, so the unrecoverable-lineage
  * caveat is vacuous and the raw row blocks are the cheapest
  * re-readable form (persist's columnar cache build measured 0.5 s
  * SLOWER on fn_math's 600k-row double projection). On a real cluster
  * master it is `persist(MEMORY_AND_DISK)` instead — lineage kept, so
  * an executor loss (or dynamic-allocation decommission) after
  * materialization recomputes the lost blocks instead of failing the
  * job; the double-eval saving is identical because the sampling pass
  * populates the cache the output pass reads.
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
  * The free runs BEFORE the new materialization is registered: the
  * persist path registers with the CacheManager, which keys on the
  * logical plan — freeing the (plan-identical) previous frame after
  * registering the new one would evict the fresh cache entry too.
  * Like the CC rounds, a freed local checkpoint cannot be recomputed:
  * a caller that holds a stale frame across a re-invocation of the
  * same query must materialize it first. [[clear]] releases everything
  * at end of run (Cleanup.releaseAll also sweeps getPersistentRDDs,
  * the backstop that already covered the CC loop's blocks).
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
    * SPARK-23207); precondition on the CALLER: every downstream
    * consumer must be row-local/order-independent or end in a total
    * order (fn_math, the one call site, sorts on all 11 columns), so
    * results are unchanged at any fan-out.
    */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  def once(key: String, df: DataFrame): DataFrame = synchronized {
    val prev = last.remove(key)
    if (prev != null) free(prev)
    val c =
      if (df.sparkSession.sparkContext.isLocal) df.localCheckpoint(true)
      else df.persist(StorageLevel.MEMORY_AND_DISK)
    last.put(key, c)
    c
  }

  def clear(): Unit = synchronized {
    last.values().forEach(free(_))
    last.clear()
  }

  /** Release whichever materialization [[once]] built: the persist path
    * unregisters through the Dataset (CacheManager) route; the
    * checkpoint path needs the LogicalRDD's RDD unpersisted directly —
    * `Dataset.unpersist` is a no-op on checkpoint blocks (RDD-level
    * persists the CacheManager never registered), as
    * ConnectedComponents.freeCheckpoint documents.
    */
  private def free(df: DataFrame): Unit = {
    df.unpersist(false)
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false); ()
      case _ => ()
    }
  }
}
