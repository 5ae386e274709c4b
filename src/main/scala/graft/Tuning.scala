package graft

import org.apache.spark.sql.SparkSession

/** Per-query session tuning helpers. */
object Tuning {

  /** Run `f` with a transiently reduced shuffle-partition count, restoring
    * the session's previous value after.
    *
    * Used where the shuffled data is known-tiny relative to the session
    * default — stateful streaming (one state store instantiates per
    * partition per stateful operator) and iterative driver loops over
    * small label/edge tables (per-round task-launch overhead dominates).
    * Partition count never changes results — only hash-bucket fan-out.
    * At production scale the knob moves UP with key cardinality instead.
    */
  def withShufflePartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val old = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", old)
  }
}
