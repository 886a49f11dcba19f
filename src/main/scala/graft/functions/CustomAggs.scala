package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** E1: custom aggregation functions as typed `Aggregator`s — the
  * Spark-native form of the reference's
  * `AggregationFunction::Custom(name, closure)`
  * (graph/views/src/windowed_operations.rs:97, invoked :376-379).
  * Registered via `functions.udaf` they work in both `agg(...)` and
  * SQL, and stream correctly (partial merge is explicit).
  */
object CustomAggs {

  /** Geometric mean: exp(mean(ln x)) with partial (sumLog, n) state —
    * map-side combinable, so the shuffle carries 2 doubles per group.
    */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
