package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` UDAF (Q40, SURVEY.md §2.2): weighted average
  * computed in exact
  * decimal so partial-aggregate combine order (nondeterministic across
  * partitions) cannot change the result.
  *
  * Each double input is converted via `BigDecimal.valueOf` (shortest
  * decimal representation — e.g. the stored 2-dp price exactly), the
  * weighted sum accumulates exactly, and only the final quotient is
  * one IEEE double division — the same arithmetic the DuckDB oracle
  * runs, so results are bit-identical.
  */
class WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
  private def dec(d: Double): BigDecimal = BigDecimal(java.math.BigDecimal.valueOf(d))

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
  override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + dec(a._1) * dec(a._2), b._2 + dec(a._2))
  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2.signum == 0) Double.NaN else r._1.toDouble / r._2.toDouble
  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
