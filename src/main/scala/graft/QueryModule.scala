package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries.
  *
  * Each entry in [[queries]] builds a deterministic DataFrame over the
  * parquet tables in `sfDir`; each entry in [[oracles]] is the equivalent
  * ANSI SQL that DuckDB runs over the same tables (driver contract — see
  * SparkEntry). Queries without an oracle get a weaker rows-only check.
  *
  * Determinism rules (SURVEY §7.4): every query ends in an explicit
  * orderBy on a unique key; double aggregates are rounded to a stable
  * precision before output; timestamps are cast to date/epoch/string to
  * avoid physical-type drift between engines.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
