package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the window-carry-forward as-of join
  * (rel_asof_join): the matched order rollup is the latest at-or-before
  * the event time, events with no prior order keep nulls on every order
  * column, and the match is monotone per user as event time advances.
  */
class AsofJoinSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private lazy val out =
    operators.RelationalExt.queries("rel_asof_join")(spark, sfDir).cache()

  override protected def afterAll(): Unit = {
    // the shared JVM-wide session outlives this suite — release the
    // suite-scoped cache instead of pinning it for every later suite
    out.unpersist()
    super.afterAll()
  }

  test("matched order day never exceeds the event time") {
    val bad = out.filter(col("last_order_day").isNotNull &&
      col("last_order_day").cast("timestamp").cast("long") > col("ts_s"))
    assert(bad.count() === 0L)
  }

  test("order columns are null together (no partial match)") {
    val bad = out.filter(
      col("last_order_day").isNull =!= col("n_orders").isNull ||
        col("n_orders").isNull =!= col("day_total").isNull)
    assert(bad.count() === 0L)
  }

  test("per-user match is monotone in event time") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_s")
    val bad = out
      .withColumn("prev_day", lag("last_order_day", 1).over(w))
      .filter(col("prev_day").isNotNull &&
        (col("last_order_day").isNull || col("last_order_day") < col("prev_day")))
    assert(bad.count() === 0L)
  }
}
