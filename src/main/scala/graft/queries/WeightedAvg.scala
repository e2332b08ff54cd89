package graft.queries

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** Mutable aggregation buffer for [[WeightedAvg]]. */
final case class WAvgBuf(var weightedSum: Double, var weightSum: Double)

/** Typed UDAF (SURVEY.md §2B B36): weighted average via the public
  * `Aggregator[IN, BUF, OUT]` API. The buffer is tiny and mergeable, so the
  * aggregate runs as partial (map-side) + final like any built-in — no data
  * is concentrated on one node regardless of input size.
  *
  * Capability parity target: an aggregate the reference cannot express at
  * all (it has no aggregation surface — SURVEY.md §2A).
  */
object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)

  override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
    b.weightedSum += in._1 * in._2
    b.weightSum += in._2
    b
  }

  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf = {
    a.weightedSum += b.weightedSum
    a.weightSum += b.weightSum
    a
  }

  override def finish(b: WAvgBuf): Double =
    if (b.weightSum == 0.0) Double.NaN else b.weightedSum / b.weightSum

  override def bufferEncoder = Encoders.product[WAvgBuf]
  override def outputEncoder = Encoders.scalaDouble

  /** Column-API handle: `udafColumn(value, weight)`. */
  lazy val udafColumn: UserDefinedFunction = udaf(WeightedAvg)
}
