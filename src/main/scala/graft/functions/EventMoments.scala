package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer moments buffer: count / sum / sum-of-squares of
  * cent-scaled (×100, rounded) values. All fields are exact Longs, so
  * the aggregation is order-independent (merge in any shuffle order
  * yields identical results) and variance derives as
  * `(ss - s²/n) / (n-1)` at read time. */
final case class MomentsBuf(n: Long, s: Long, ss: Long) {
  def variance: Double = {
    if (n < 2) Double.NaN
    else {
      val sd = s.toDouble
      (ss.toDouble - sd * sd / n) / (n - 1)
    }
  }
}

/** Typed UDAF (SURVEY.md Q52): `Aggregator[IN, BUF, OUT]` over
  * (event_type, cent-scaled value) pairs. Demonstrates the typed
  * aggregation path (`groupByKey(...).agg(...toColumn)`) with a custom
  * mergeable buffer — the same shape a sketch (HLL, CPC) would use. */
object EventMoments extends Aggregator[(String, Long), MomentsBuf, MomentsBuf] {
  override def zero: MomentsBuf = MomentsBuf(0L, 0L, 0L)
  override def reduce(b: MomentsBuf, in: (String, Long)): MomentsBuf = {
    val v = in._2
    MomentsBuf(b.n + 1, b.s + v, b.ss + v * v)
  }
  override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf =
    MomentsBuf(a.n + b.n, a.s + b.s, a.ss + b.ss)
  override def finish(b: MomentsBuf): MomentsBuf = b
  override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
  override def outputEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
}
