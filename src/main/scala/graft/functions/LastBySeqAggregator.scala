package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for last-per-key compaction (S5/A3): max_by(value, seq)
  * as an `Aggregator[(seq, value), buf, value]` — the §2.8 "stateful counter
  * function" extension point, registrable as a SQL UDAF via
  * `functions.udaf(LastBySeqAggregator)`.
  *
  * The merge is associative/commutative (argmax by seq), so Catalyst plans
  * it with map-side partial aggregation like any built-in — this is the
  * shape to use for custom sketches (HLL, top-k, quantiles) at 100 TB.
  */
object LastBySeqAggregator
    extends Aggregator[(Long, Double), (Long, Double), Double] {

  override def zero: (Long, Double) = (Long.MinValue, Double.NaN)

  // tie-break on equal seq by the larger value, so reduce AND merge are
  // genuinely commutative (partition-order-independent) even on duplicate
  // seq keys — a claim max_by itself does not make
  private def pick(a: (Long, Double), b: (Long, Double)): (Long, Double) =
    if (a._1 > b._1) a
    else if (a._1 < b._1) b
    else if (a._2 >= b._2 || b._2.isNaN) a
    else b

  override def reduce(b: (Long, Double), a: (Long, Double)): (Long, Double) =
    pick(a, b)

  override def merge(b1: (Long, Double), b2: (Long, Double)): (Long, Double) =
    pick(b1, b2)

  override def finish(r: (Long, Double)): Double = r._2

  override def bufferEncoder: Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
