package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed folds — the general form of oamap's `reduce(data, tally,
  * fn)` (`oamap/operations.py::reduce`, public repo; SURVEY.md §4.2): an
  * arbitrary user combine function folded over elements with a typed tally,
  * for aggregations no built-in expresses.
  *
  * `Aggregator[IN, BUF, OUT]` is the Spark-native shape: `reduce` is the
  * per-element fold, `merge` combines partial tallies — which is exactly
  * what makes it distribute (map-side partials, one shuffle of tallies, no
  * row movement). Register with `spark.udf.register(name, udaf(agg))` for
  * SQL use.
  */
object Folds {

  /** Weighted mean with a (sum, weight) tally — not expressible as a single
    * built-in aggregate (sum(xw)/sum(w) needs two passes or this). */
  class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(t: (Double, Double)): Double =
      if (t._2 == 0.0) Double.NaN else t._1 / t._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Exact modular product tally: Π (x_i mod P) mod P over a long column —
    * an integer-exact fold with no built-in equivalent (product), used to
    * exercise arbitrary-tally reduce semantics deterministically. */
  class ModProduct(p: Long = Text.P) extends Aggregator[Long, Long, Long] {
    override def zero: Long = 1L
    override def reduce(b: Long, a: Long): Long = {
      val x = ((a % p) + p) % p
      (BigInt(b) * x % p).toLong // exact 128-bit intermediate
    }
    override def merge(x: Long, y: Long): Long = (BigInt(x) * y % p).toLong
    override def finish(t: Long): Long = t
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
