package graft

/** The point of rel_bucketed_join is shuffle elimination: both sides are
  * bucketed on the join key, so the sort-merge join must execute with NO
  * hash-partitioning Exchange anywhere on the join path (the only
  * Exchanges allowed are the range partition for the final orderBy and
  * the single-partition one for the aggregate's tiny output, neither of
  * which touches the joined fact rows).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed join plan contains no hash-partition exchange before the join") {
    val df = operators.RelationalExt.bucketedJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a SortMergeJoin in:\n$plan")
    // everything BELOW the join in the plan string (children are printed
    // after the parent) must be exchange-free: buckets feed it directly
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(df.count() > 0)
  }
}
