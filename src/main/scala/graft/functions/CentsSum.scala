package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A8: custom typed aggregator — exact money summation of double columns
  * by accumulating integer cents (the reference's amounts are 2-decimal
  * values stored lossily; this reverses its Decimal→double narrowing,
  * SURVEY.md §2.2 P4, without the order-dependence of double sums).
  *
  * Buffer is a plain Long: fully map-side combinable, 8 bytes of state,
  * merge is addition — the ideal distributed-aggregation shape.
  */
object CentsSum extends Aggregator[Double, Long, Double] {
  override def zero: Long = 0L
  override def reduce(acc: Long, x: Double): Long = acc + math.round(x * 100)
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(cents: Long): Double = cents.toDouble / 100.0
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
