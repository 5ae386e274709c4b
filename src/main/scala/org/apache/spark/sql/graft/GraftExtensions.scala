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
        // AnalysisException (WRONG_NUM_ARGS), not a bare require: the
        // builder runs inside the analyzer, and a wrong arity is a user
        // error that must carry the standard error class + position the
        // way built-in functions report it
        if (children.length != 2)
          throw org.apache.spark.sql.errors.QueryCompilationErrors
            .wrongNumArgsError("vec_dot", Seq(2), children.length)
        DotProductD(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("min_gram_hash"),
      new ExpressionInfo(classOf[MinGramHash].getName, "min_gram_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 1)
          throw org.apache.spark.sql.errors.QueryCompilationErrors
            .wrongNumArgsError("min_gram_hash", Seq(1), children.length)
        MinGramHash(children.head)
      }))
  }
}
