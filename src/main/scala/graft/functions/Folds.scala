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

  case class MgEntry(tok: String, est: Long)
  case class MgSummary(entries: Seq[MgEntry])

  /** Misra–Gries heavy-hitter summary — the bounded-state frequency-TOP
    * sketch that completes the family next to HLL (b18, distinct), GK
    * (b36, quantiles), Bloom (c34, membership) and count-min (c42/c78,
    * point frequency): at most `k` (token, count) entries regardless of
    * stream length, with the two-sided guarantee
    *
    *   f(x) − n/(k+1)  ≤  est(x)  ≤  f(x)        (absent ⇒ est = 0)
    *
    * so every token with f(x) > n/(k+1) is GUARANTEED present. Both the
    * per-element fold (decrement-all on overflow removes k+1 units of
    * mass, so ≤ n/(k+1) decrement rounds) and the cross-partition `merge`
    * (cell-wise add, then subtract the (k+1)-th largest count — the
    * mergeable-summaries construction of Agarwal et al., PODS'12) preserve
    * the bound, which is what makes it distribute: O(k) state per
    * partition, one tally shuffle, NO token→count map proportional to the
    * vocabulary. At 100 TB the exact groupBy costs a vocabulary-sized
    * shuffle; this costs k entries per task.
    *
    * The summary CONTENT depends on fold/merge order (est values may
    * differ run to run) — only the theorem-guaranteed audit facts
    * (capture of true heavies, error ≤ n/(k+1), size ≤ k) are
    * deterministic, so queries must output those, never raw `est`
    * (b80's shape; asserted under varying partitioning in
    * EquivalenceSpec). */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], MgSummary] {
    require(k >= 1, s"need k >= 1, got $k")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c)             => b.updated(tok, c + 1)
        case None if b.size < k  => b.updated(tok, 1L)
        case None => // decrement-all: removes k+1 units (k stored + the arrival)
          b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = (x.keySet ++ y.keySet).iterator
        .map(t => t -> (x.getOrElse(t, 0L) + y.getOrElse(t, 0L))).toMap
      if (sum.size <= k) sum
      else {
        val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
        sum.flatMap { case (t, c) => if (c - d > 0) Some(t -> (c - d)) else None }
      }
    }
    override def finish(t: Map[String, Long]): MgSummary =
      MgSummary(t.toSeq.sortBy { case (tk, c) => (-c, tk) }
        .map { case (tk, c) => MgEntry(tk, c) })
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  }

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
