package graft

import org.apache.spark.sql.functions._

/** Pins the MERGE matrix of rel_merge_upsert against independent
  * recomputations from the base tables.
  */
class MergeUpsertSpec extends SparkSpec {

  // sf0.01, not the default sf0.001: the insert (n >= 20) and delete
  // (n = 1) arms first get members at this scale (max n is 18 at
  // sf0.001), and the spec's point is that EVERY arm fires
  private val mergeDir = "/root/testdata/sf0.01"

  private lazy val out =
    operators.RelationalExt.queries("rel_merge_upsert")(spark, mergeDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))

  private lazy val byCust = spark.read.parquet(s"$mergeDir/orders.parquet")
    .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("every MERGE arm fires and the counts tie out to the change rules") {
    val custkeys = spark.read.parquet(s"$mergeDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val wantDeleted = byCust.filter { case (k, n) => n == 1 && custkeys(k) }.keySet
    val wantUpdated = byCust.filter { case (k, n) => n >= 8 && custkeys(k) }.keySet
    val wantInserted = byCust.filter(_._2 >= 20).keySet.map(_ + 1000000L)
    val actions = out.groupBy(_._4).view.mapValues(_.map(_._1).toSet).toMap
    assert(actions("updated") == wantUpdated, "updated set diverged")
    assert(actions("inserted") == wantInserted, "inserted set diverged")
    assert(actions("kept") ==
      custkeys.diff(wantDeleted).diff(wantUpdated), "kept set diverged")
    assert(out.map(_._1).toSet.intersect(wantDeleted).isEmpty,
      "a deleted key survived the merge")
    Seq(wantDeleted, wantUpdated, wantInserted).foreach(s =>
      assert(s.nonEmpty, "an arm of the MERGE matrix never fired at sf0.01"))
  }

  test("inserted rows carry the NEW segment and their change total; " +
      "kept rows keep the target balance") {
    val customer = spark.read.parquet(s"$mergeDir/customer.parquet")
      .select("c_custkey", "c_acctbal")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach {
      case (k, seg, _, "inserted") =>
        assert(seg == "NEW" && k > 1000000L, s"insert shape wrong: $k $seg")
      case (k, _, bal, "kept") =>
        assert(bal == math.rint(customer(k) * 100) / 100,
          s"kept row $k balance drifted")
      case _ => ()
    }
  }
}
