package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order clustering vs linear sort, with the
  * min/max file-skipping benefit MEASURED, not asserted.
  *
  * At 100 TB the dominant query cost is scan I/O, and the dominant scan
  * optimization after partition pruning is row-group/file skipping on
  * min/max statistics — which only works if the writer clustered the
  * data so each file's bounding box is tight. A linear sort gives tight
  * boxes on ONE key; Z-order (bit-interleaved) clustering gives
  * moderately tight boxes on EVERY interleaved key, which is why
  * lakehouse writers (Delta OPTIMIZE ZORDER BY, Iceberg sort orders)
  * ship it.
  *
  * `src_zorder_pruning` runs the whole decision declaratively: normalize
  * the two keys to a 16-bit grid, interleave to a 32-bit Z-value, assign
  * each row to one of [[FILES]] "files" by Z-prefix (exactly how a
  * z-clustered writer range-splits output — a row-local integer map, NO
  * global sort in the plan), collect per-file min/max key stats (one
  * hash aggregation), and replay a 2-D box probe against the stats using
  * the parquet reader's interval-intersection pruning rule. Output: per
  * layout, files touched and rows scanned by a min/max reader vs rows
  * actually matching. The DuckDB oracle recomputes the identical integer
  * pipeline from the SAME generated Z expression, so the measured
  * pruning fractions are contract-checked cross-engine.
  *
  * Scale shape: two scans of lineitem (stats build + probe accounting
  * share one), one broadcast of the 2-row max() scalar, one hash
  * aggregation per layout over ≤ [[FILES]] groups. Nothing here sorts;
  * bucket assignment is per-row arithmetic, so the plan is the same at
  * 10^5 or 10^12 rows.
  */
object Layout extends QueryModule {

  import Tables._

  /** Files per layout: a 16×16 Z-grid (4 high bits per key). */
  private val FILES = 256
  private val GRID = 65536L // 16-bit per-key normalization

  /** The 32-bit interleave of two 16-bit values as portable integer
    * arithmetic: bit i of px lands at 2i, bit i of sx at 2i+1. The
    * terms occupy disjoint bits, so `+` IS the bitwise OR — and `+`,
    * `%`, and floor division on non-negative operands are the only
    * operators needed, all bit-identical across Spark (`div`) and
    * DuckDB (`//`).
    */
  private def zExpr(px: String, sx: String, div: String): String =
    (0 until 16).flatMap { i =>
      Seq(
        s"(($px $div ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($sx $div ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString("(", " + ", ")")

  /** Shared pipeline text (engine-parameterized only by the division
    * operator): key normalization, z-value, file ids for both layouts,
    * probe-box membership. The box selects the [10%, 20%] slice of BOTH
    * key ranges — selective enough that layout matters, wide enough that
    * every grid granularity keeps some rows.
    */
  private def pipelineSql(div: String): String = {
    val z = zExpr("px", "sx", div)
    s"""mx AS (
       |  SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem),
       |ext AS (
       |  SELECT l_partkey, l_suppkey,
       |    (l_partkey * $GRID) $div (mp + 1) AS px,
       |    (l_suppkey * $GRID) $div (ms + 1) AS sx,
       |    (mp * 10) $div 100 AS plo, (mp * 20) $div 100 AS phi,
       |    (ms * 10) $div 100 AS slo, (ms * 20) $div 100 AS shi
       |  FROM lineitem CROSS JOIN mx),
       |zed AS (
       |  SELECT l_partkey, l_suppkey,
       |    $z $div ${1L << 24} AS file_z,
       |    px $div ${GRID / FILES} AS file_lin,
       |    CASE WHEN l_partkey BETWEEN plo AND phi
       |          AND l_suppkey BETWEEN slo AND shi THEN 1 ELSE 0 END AS in_box,
       |    plo, phi, slo, shi
       |  FROM ext),
       |stats AS (
       |  SELECT 'linear' AS layout, file_lin AS f,
       |    min(l_partkey) AS p0, max(l_partkey) AS p1,
       |    min(l_suppkey) AS s0, max(l_suppkey) AS s1,
       |    count(*) AS n, sum(in_box) AS n_box,
       |    min(plo) AS plo, min(phi) AS phi, min(slo) AS slo, min(shi) AS shi
       |  FROM zed GROUP BY file_lin
       |  UNION ALL
       |  SELECT 'zorder' AS layout, file_z AS f,
       |    min(l_partkey), max(l_partkey), min(l_suppkey), max(l_suppkey),
       |    count(*), sum(in_box), min(plo), min(phi), min(slo), min(shi)
       |  FROM zed GROUP BY file_z),
       |pruned AS (
       |  SELECT layout,
       |    CASE WHEN p0 <= phi AND p1 >= plo
       |          AND s0 <= shi AND s1 >= slo THEN 1 ELSE 0 END AS touched,
       |    n, n_box
       |  FROM stats)
       |SELECT layout,
       |  count(*) AS files,
       |  CAST(sum(touched) AS BIGINT) AS files_touched,
       |  CAST(sum(touched * n) AS BIGINT) AS rows_scanned,
       |  CAST(sum(n_box) AS BIGINT) AS rows_matched
       |FROM pruned GROUP BY layout ORDER BY layout""".stripMargin
  }

  /** Spark side runs the SAME generated text through `spark.sql` over a
    * temp view — the pipeline is pure relational algebra, and sharing
    * the text with the oracle makes the cross-engine check exact by
    * construction (only the floor-division spelling differs).
    */
  private def zorderPruning(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(s"WITH ${pipelineSql("div")}")
  }

  private def zorderOracle: String = s"WITH ${pipelineSql("//")}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_zorder_pruning" -> zorderPruning _,
  )

  val oracles: Map[String, String] = Map(
    "src_zorder_pruning" -> zorderOracle,
  )
}
