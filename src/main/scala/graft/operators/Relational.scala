package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.B relational surface: the capabilities the reference's
  * map→shuffle→group→reduce dataflow classically expresses, shipped as
  * Catalyst-planned DataFrame operators.
  *
  * Scale stance (100 TB): all plans below are declarative — predicate
  * pushdown and column pruning reach the parquet scan; aggregations run
  * partial→final (HashAggregate); small dimension tables (region, nation,
  * supplier) are broadcast explicitly so the big fact tables never
  * shuffle for those joins; sorts that feed a LIMIT plan as
  * TakeOrderedAndProject (no global sort materialization).
  */
object Relational extends QueryModule {

  import Tables._

  // ---- scans / projection / filter ------------------------------------

  private def scanProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      // every output column is a sort key: (l_orderkey, l_linenumber) is
      // not unique in the fixture, and a total order is what makes the
      // row-level dump comparable cross-engine at every scale
      .orderBy("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag")

  private def filterPred(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_returnflag") === "R" &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"), col("l_discount"))
      .orderBy("l_orderkey", "l_linenumber", "ship_date", "l_discount")

  // ---- aggregation ----------------------------------------------------

  /** TPC-H Q1-shaped pricing summary: partial+final hash aggregation. */
  private def aggPricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  private def aggMinMax(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy("c_mktsegment")
      .agg(
        round(min("c_acctbal"), 2).as("min_bal"),
        round(max("c_acctbal"), 2).as("max_bal"),
        // exact DECIMAL sum → one double division: built-in avg()
        // accumulates doubles in partition order and can drift from
        // DuckDB's scan-order sum into a different round(…,4) at ties
        // (the text_quality failure mode); min/max are order-exact
        round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          / count(lit(1)), 4).as("avg_bal"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  private def distinctSeg(s: SparkSession, d: String): DataFrame =
    customer(s, d).select("c_mktsegment").distinct().orderBy("c_mktsegment")

  private def countDistinctParts(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** HLL sketch. The approximate value itself can't hash-match an exact
    * engine, so the query emits the exact count PLUS the sketch's
    * relative-error bound check (|approx-exact|/exact ≤ 10%, 2× the
    * default rsd) — the oracle asserts the bound holds (`TRUE`), which
    * is a strictly stronger check than the rows-only fallback.
    */
  private def approxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .select(col("l_returnflag"), col("n_parts"),
        (abs(col("approx") - col("n_parts")).cast("double") /
          col("n_parts") <= 0.10).as("within_10pct"))
      .orderBy("l_returnflag")

  /** Mergeable-sketch rollup (Apache DataSketches HLL via Spark's
    * hll_sketch_agg / hll_union_agg): per-(flag, status) sketches of
    * distinct parts are built FIRST, then merged up to per-flag
    * estimates — without re-touching the raw rows. This is the
    * production incremental-distinct pattern at 100 TB: persist a
    * kilobyte sketch per partition/day, answer any distinct-count
    * rollup later by unioning sketches instead of rescanning the fact
    * table. The estimate is nondeterministic-ish across engines, so —
    * like rel_approx_distinct — the contract row carries the EXACT
    * count plus a 10%-relative-error bound check on the merged
    * estimate; the sketch math itself is what the bound proves live.
    */
  private def hllMerge(s: SparkSession, d: String): DataFrame = {
    val sketches = lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = sketches.groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
      .join(merged, "l_returnflag")
      .select(col("l_returnflag"), col("n_parts"),
        (abs(col("est") - col("n_parts")).cast("double") /
          col("n_parts") <= 0.10).as("merged_within_10pct"))
      .orderBy("l_returnflag")
  }

  // ---- joins ----------------------------------------------------------

  /** Shuffle hash/sort-merge equi-join on the fact tables (both large at
    * scale → co-partitioned shuffle join is correct; AQE picks SHJ/SMJ).
    */
  private def joinInner(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spent"))
      .orderBy("c_custkey")

  /** TPC-H Q5-shaped: big facts joined, small dims broadcast. */
  private def joinMulti(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("r_name", "n_name")

  private def joinLeft(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  private def joinSemi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  private def joinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Equi key + range predicate (theta component) in the join condition. */
  private def joinTheta(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_late_ship_lines"))
      .orderBy("o_orderstatus")

  // ---- sort / limit / top-k ------------------------------------------

  /** Plans as TakeOrderedAndProject — no global sort at scale. */
  private def topK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
      .limit(100)

  private def sortMulti(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .orderBy(col("s_nationkey"), col("s_acctbal").desc, col("s_suppkey"))

  // ---- grouping sets --------------------------------------------------

  private def rollupQ(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private def cubeQ(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  // ---- set operations -------------------------------------------------

  private def setIntersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  private def setExcept(s: SparkSession, d: String): DataFrame =
    nation(s, d).select(col("n_nationkey").as("nationkey"))
      .except(supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  private def setUnion(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey"), lit("customer").as("side"))
      .union(supplier(s, d).select(col("s_nationkey"), lit("supplier")))
      .groupBy("nationkey", "side").agg(count(lit(1)).as("n"))
      .orderBy("nationkey", "side")

  // ---- window functions ----------------------------------------------

  private def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rk", rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  private def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("next_price", lead("o_totalprice", 1).over(w))
      .withColumn("order_date", col("o_orderdate").cast("date"))
      .drop("o_orderdate")
      .orderBy("o_custkey", "o_orderkey")
  }

  // ---- pivot ----------------------------------------------------------

  private def pivotFlags(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum("l_quantity"), 2))
      .orderBy("l_linestatus")

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_scan_project"   -> scanProject _,
    "rel_filter"         -> filterPred _,
    "rel_agg_pricing"    -> aggPricing _,
    "rel_agg_minmax"     -> aggMinMax _,
    "rel_distinct"       -> distinctSeg _,
    "rel_count_distinct" -> countDistinctParts _,
    "rel_approx_distinct" -> approxDistinct _,
    "rel_hll_merge" -> hllMerge _,
    "rel_join_inner"     -> joinInner _,
    "rel_join_multi"     -> joinMulti _,
    "rel_join_left"      -> joinLeft _,
    "rel_join_semi"      -> joinSemi _,
    "rel_join_anti"      -> joinAnti _,
    "rel_join_theta"     -> joinTheta _,
    "rel_topk"           -> topK _,
    "rel_sort_multi"     -> sortMulti _,
    "rel_rollup"         -> rollupQ _,
    "rel_cube"           -> cubeQ _,
    "rel_set_intersect"  -> setIntersect _,
    "rel_set_except"     -> setExcept _,
    "rel_set_union"      -> setUnion _,
    "rel_window_rank"    -> windowRank _,
    "rel_window_running" -> windowRunning _,
    "rel_pivot"          -> pivotFlags _,
  )

  val oracles: Map[String, String] = Map(
    "rel_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag""".stripMargin,
    "rel_filter" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, l_discount
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |ORDER BY l_orderkey, l_linenumber, ship_date, l_discount""".stripMargin,
    "rel_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_agg_minmax" ->
      """SELECT c_mktsegment,
        |  round(min(c_acctbal), 2) AS min_bal,
        |  round(max(c_acctbal), 2) AS max_bal,
        |  round(sum(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE / count(*), 4) AS avg_bal,
        |  count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "rel_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "rel_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rel_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  TRUE AS within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rel_hll_merge" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  TRUE AS merged_within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rel_join_inner" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "rel_join_multi" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "rel_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "rel_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "rel_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "rel_join_theta" ->
      """SELECT o_orderstatus, count(*) AS n_late_ship_lines
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "rel_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "rel_sort_multi" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey, s_acctbal DESC, s_suppkey""".stripMargin,
    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "rel_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "rel_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "rel_set_except" ->
      """SELECT n_nationkey AS nationkey FROM nation
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "rel_set_union" ->
      """SELECT nationkey, side, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey, 'supplier' FROM supplier)
        |GROUP BY nationkey, side ORDER BY nationkey, side""".stripMargin,
    "rel_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "rel_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  o_totalprice,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    AS running_total,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "rel_pivot" ->
      """SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
  )
}
