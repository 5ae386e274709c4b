package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.B UDF/UDAF row; the reference's user
  * `reduce` generalized to Spark's partial-aggregation contract):
  * quantity-weighted mean price as an `Aggregator[IN, BUF, OUT]` with
  * EXACT BigDecimal partial sums — `merge` is associative+commutative
  * over exact values, so the result is independent of partitioning and
  * matches DuckDB's decimal arithmetic bit-for-bit after the final
  * double division.
  */
object WeightedMean
    extends Aggregator[(String, BigDecimal, BigDecimal),
      (BigDecimal, BigDecimal), Double] {

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal),
      in: (String, BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) = {
    val (_, q, p) = in
    (b._1 + q * p, b._2 + q)
  }

  override def merge(a: (BigDecimal, BigDecimal),
      b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (a._1 + b._1, a._2 + b._2)

  // identical to the oracle's CAST(sum AS DOUBLE) / CAST(sum AS DOUBLE)
  // — including a zero weight sum: both engines evaluate 0.0/0.0 to NaN
  // (x/0.0 to ±Inf) under IEEE double division, and the compare treats
  // NaN==NaN, so degenerate groups stay cross-engine consistent
  override def finish(b: (BigDecimal, BigDecimal)): Double =
    b._1.toDouble / b._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(BigDecimal, BigDecimal)]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
