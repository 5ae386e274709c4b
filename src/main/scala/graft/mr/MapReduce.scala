package graft.mr

import scala.reflect.ClassTag

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference's generic user contract, Spark-native.
  *
  * Reference model (Time0o/MapReducePlusPlus): a user supplies
  * `map: file -> Generator[KeyValue[K,V]]` (`mr/word_count.h:16-32`) and
  * `reduce: (K, values) -> V` that sees the COMPLETE value list for a key
  * (`src/worker.cc:238`, `mr/word_count.h:34-38`); the framework
  * hash-partitions by key (`src/worker.cc:176-182`), groups per key into a
  * key-sorted map (`src/worker.cc:208,227`), and runs reduce once per key.
  *
  * Spark mapping: `flatMap` (map stage; Spark's volcano/codegen iterators
  * are the same pull model as the reference's C++20 coroutine,
  * `include/generator.h:10-72`), `groupByKey` (hash-partitioned shuffle ≙
  * the reference's M×R file shuffle, `src/worker.cc:161-170`), `mapGroups`
  * (reduce sees the full value iterator — preserving the "no combiner"
  * contract for NON-associative user folds).
  *
  * Scale note: the reference ships every (k,1) pair across its shuffle
  * (`src/worker.cc:179` — no combiner). At 100 TB that is the bottleneck,
  * so associative folds should use [[mapReduceAssociative]], which lets
  * Spark run partial (map-side) aggregation and ships one partial value
  * per key per map partition instead.
  */
object MapReduce {

  /** Exact reference contract: reduce sees ALL values of a key at once.
    * Use when `reduce` is not an associative+commutative fold.
    *
    * `numPartitions` is the reference's compile-time R reduce-task knob
    * (`CMakeLists.txt:43-45`): when set, the reduce stage runs with
    * exactly that many hash partitions. The Dataset `groupByKey` API has
    * no partitioner parameter (it always shuffles to
    * `spark.sql.shuffle.partitions`), so that path drops to the RDD
    * `groupByKey(n)` — the one place this engine uses RDDs, precisely
    * because the capability (an explicit R) is per-job, not per-session.
    */
  def mapReduce[I, K, V, O: Encoder](
      input: Dataset[I],
      mapFn: I => IterableOnce[(K, V)],
      reduceFn: (K, Iterator[V]) => O,
      numPartitions: Option[Int] = None
  )(implicit kEnc: Encoder[K], kvEnc: Encoder[(K, V)],
    kTag: ClassTag[K], vTag: ClassTag[V], oTag: ClassTag[O]): Dataset[O] = {
    val mapped = input.flatMap(mapFn)
    numPartitions match {
      case Some(n) =>
        // NB: RDD groupByKey materializes each key's values in memory
        // (CompactBuffer) — same memory contract as the reference, whose
        // reducer also receives a fully-built per-key vector
        // (mr/word_count.h:34-38); the None branch below streams the
        // value iterator instead, so a skewed key that fits there can
        // OOM here. Choose R only when that trade is understood.
        val reduced = mapped.rdd
          .groupByKey(n)
          .map { case (k, vs) => reduceFn(k, vs.iterator) }
        input.sparkSession.createDataset(reduced)
      case None =>
        mapped.groupByKey(_._1).mapGroups((k, vs) => reduceFn(k, vs.map(_._2)))
    }
  }

  /** Monoid-fold variant with map-side partial aggregation (the combiner
    * the reference lacks). Same result for associative+commutative `merge`,
    * far less shuffle I/O at scale.
    */
  def mapReduceAssociative[I, K, V](
      input: Dataset[I],
      mapFn: I => IterableOnce[(K, V)],
      merge: (V, V) => V
  )(implicit kEnc: Encoder[K], kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    input.flatMap(mapFn)
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, merge(a._2, b._2)))
      .map { case (_, kv) => kv }
}
