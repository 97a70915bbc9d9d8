package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-defined aggregate surface (SURVEY.md §2.3 "aggregate →
  * Aggregator[IN,BUF,OUT] registered via functions.udaf"; reference analog:
  * arbitrary user folds in the Edgy monad, src/Edgy/Operations.hs:88-89).
  *
  * The library stance is built-ins-first (codegen), so the UDAF surface is
  * exercised with an aggregation the built-ins genuinely can't express
  * exactly: money summed in integer cents. `sum(price * qty)` on doubles
  * accumulates FP error and is summation-order-dependent; folding each row
  * to `round(price*100) * round(qty)` in a Long buffer is exact,
  * associative, and merge-safe — the partial-aggregation (map-side combine)
  * contract of `Aggregator.merge` holds by integer associativity.
  */
object RevenueCentsAgg extends Aggregator[(Double, Double), Long, Long] {
  override def zero: Long = 0L
  override def reduce(buf: Long, in: (Double, Double)): Long =
    buf + math.round(in._1 * 100.0) * math.round(in._2)
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
