package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in [[QueryModule]] objects under `graft.operators`; this
  * object is the flat registry the driver reads. Every query here is
  * deterministic (explicit orderBy on a unique key) and every oracle
  * produces identical column names so the driver's sorted-column hash
  * compare succeeds.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.WordCount,
    operators.Relational,
    operators.RelationalExt,
    operators.ScalarFns,
    operators.Sources,
    operators.Dedup,
    operators.Typed,
    operators.TextAnalysis,
    operators.TrainingPipeline,
    operators.Similarity,
    operators.Multimodal,
    operators.Layout,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.WordCount.dataframeWordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    // toMap silently keeps the LAST entry on a name collision — a
    // cross-module clash would shrink the driver surface with every
    // check still green, so fail loudly instead
    val dups = all.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names across modules: $dups")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
