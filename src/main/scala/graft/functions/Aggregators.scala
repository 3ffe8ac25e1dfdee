package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (the Aggregator[IN, BUF, OUT] extension slot).
  *
  * WeightedMean: exact fixed-point weighted mean — inputs are
  * (value_in_cents, weight) longs, so partial buffers merge exactly in
  * any order (commutative integer sums -> engine-reproducible, same
  * contract as the rest of the engine's money math). finish() =
  * (num/den)/100.0 in doubles, mirrored verbatim by the SQL oracle.
  */
object Aggregators {

  case class WAvgBuf(num: Long, den: Long)

  /** IN = (cents, weight) */
  object WeightedMean extends Aggregator[(Long, Long), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0L, 0L)
    override def reduce(b: WAvgBuf, a: (Long, Long)): WAvgBuf =
      WAvgBuf(b.num + a._1 * a._2, b.den + a._2)
    override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
      WAvgBuf(x.num + y.num, x.den + y.den)
    override def finish(b: WAvgBuf): Double =
      if (b.den == 0L) Double.NaN else b.num.toDouble / b.den / 100.0
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
