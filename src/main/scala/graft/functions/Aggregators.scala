package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators — the engine's UDAF extensibility surface
  * (the reference's analogue is subclassing `Reducer`,
  * `WordCountV2.java:98-112`; here it's `Aggregator[IN, BUF, OUT]`
  * with full map-side partial aggregation for free).
  */
object Aggregators {

  /** Geometric mean via Σlog/n — partial-aggregatable and
    * overflow-free where a naive Πx would explode. */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
