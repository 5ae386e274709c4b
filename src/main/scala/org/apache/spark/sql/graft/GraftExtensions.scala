package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql("... vec_dot(a,
  * b) ...")` works alongside the Column API ([[VectorColumns]]).
  *
  * Install via `SparkSession.builder().withExtensions(new
  * GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
        DotProductD(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("min_gram_hash"),
      new ExpressionInfo(classOf[MinGramHash].getName, "min_gram_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "min_gram_hash(s) takes exactly 1 argument")
        MinGramHash(children.head)
      }))
  }
}
