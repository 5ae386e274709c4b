package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB stance): `spark.read.parquet` gives splittable,
  * column-pruned, predicate-pushdown scans; at cluster scale the same call
  * reads a partitioned directory tree and Catalyst prunes partitions. No
  * driver-side materialization happens here — these are lazy plans.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** ns→µs normalization for `events.ts`: FLOOR division via pmod —
    * `div` truncates toward zero, which would land pre-epoch nanos 1 µs
    * late; double division would lose precision at 1.7e18 ns. ONE
    * definition shared by the batch loader below and the streaming
    * source (Sources.streamEvents), so the two paths cannot drift;
    * floor semantics pinned by TsNormalizationSpec.
    */
  private[graft] val nsToMicrosTs =
    "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads
    * with `spark.sql.legacy.parquet.nanosAsLong=true` — set here on the
    * session (it is runtime-settable) so the registry is self-contained
    * for a driver whose own session builder omits it.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr(nsToMicrosTs))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
