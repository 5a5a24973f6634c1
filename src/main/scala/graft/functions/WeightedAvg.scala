package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2B "UDF/UDAF/UDTF"): weighted average as an
  * `Aggregator[IN, BUF, OUT]`.
  *
  * Determinism across merge orders: the buffer holds exact micro-unit longs
  * (each row's w·x rounded once to 6 d.p.), so partial aggregation and merge
  * order cannot change the result — mirroring the engine-wide rule that
  * cross-partition sums must be exact (see graft.operators.dsum). Overflow
  * headroom: |Σ w·x·1e6| < 2^63 holds through sf≈1.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {

  /** (value, weight) → accumulate (Σ w·x in µ-units, Σ w in µ-units). */
  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (x, w) = in
    (b._1 + math.round(w * x * 1e6), b._2 + math.round(w * 1e6))
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(acc: (Long, Long)): Double =
    if (acc._2 == 0L) Double.NaN
    else (acc._1.toDouble / 1e6) / (acc._2.toDouble / 1e6)

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
