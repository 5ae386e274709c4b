package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Inspects which columns actually cross each shuffle exchange of a
  * query's physical plan. This turns the repo's standing shuffle
  * discipline — candidate generation and sampling shuffle doc_id +
  * digests, never document CONTENT — from a Scaladoc claim into a
  * checkable property (ShuffleContentLintSpec pins it per family).
  *
  * The walk descends through AQE wrappers and subquery plans; each
  * result entry is the attribute-name list of one exchange's input
  * (what the shuffle actually serializes).
  */
object ShuffleAudit {

  def exchangeOutputs(df: DataFrame): Seq[Seq[String]] =
    walk(df.queryExecution.executedPlan)

  private def walk(p: SparkPlan): Seq[Seq[String]] = {
    val here = p match {
      case e: ShuffleExchangeLike => Seq(e.child.output.map(_.name).toSeq)
      case _ => Nil
    }
    val below = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _ => p.children.flatMap(walk)
    }
    here ++ below ++ p.subqueries.flatMap(walk)
  }

  /** Names of columns from `banned` that cross ANY exchange. */
  def bannedCrossings(df: DataFrame, banned: Set[String]): Seq[String] =
    exchangeOutputs(df).flatten.distinct.filter(banned)
}
