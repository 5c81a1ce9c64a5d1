package graft.functions

import java.lang.{Long => JLong}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed Bloom filter over 64-bit hashes, as a typed Aggregator
  * producing an `array<long>` bitmap (SURVEY.md §2C decontamination: the
  * membership prefilter that replaces broadcasting a raw key set).
  *
  * Index derivation is the Kirsch–Mitzenmacher double-hash scheme: from one
  * 64-bit input `h`, `h2 = rotl(h, 31) | 1` (odd, so i·h2 walks the whole
  * ring), and probe i targets bit `floorMod(h + i·h2, m)`. The SAME
  * arithmetic — two's-complement wrap on `h + i·h2` included — is
  * implemented in [[BloomBuild.reduce]] (build side) and in
  * [[graft.plans.BloomExpressions.BloomMightContain]] (probe side, both
  * interpreted eval and generated code); any drift between the three copies
  * breaks the no-false-negative guarantee, so all are kept to this one
  * documented formula. `m` is carried structurally as 64·bitmap-length, so
  * build and probe cannot disagree on it; `k` must match by construction of
  * the caller (both sides take it from one call site).
  *
  * Scale: the aggregate is a map-side partial — each task ORs its rows into
  * a local bitmap and only bitmaps (m/8 bytes, e.g. 128 KiB at m=2²⁰) cross
  * the wire, never rows. The merged filter reaches probe tasks as a scalar
  * subquery result: one bitmap per executor, NOT a per-row join — this is
  * what lets a 100 TB scan drop non-members before any shuffle while the
  * filtered set (an eval suite's n-gram universe, say 10⁸ keys) would be
  * hundreds of broadcast megabytes raw.
  */
object Bloom {

  /** Set the k probe bits of `h` in `bits` (mutating). Shared by reduce on
    * every row — kept allocation-free. */
  private[graft] def setBits(bits: Array[Long], h: Long, k: Int): Unit = {
    val m = bits.length.toLong << 6
    val h2 = JLong.rotateLeft(h, 31) | 1L
    var i = 0
    while (i < k) {
      val idx = Math.floorMod(h + i.toLong * h2, m)
      bits((idx >>> 6).toInt) |= 1L << (idx & 63L)
      i += 1
    }
  }

  /** OR-mergeable Bloom bitmap over a long-hash column. `mBits` must be a
    * multiple of 64 (the bitmap is stored as longs). */
  class BloomBuild(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    override def zero: Array[Long] = new Array[Long](mBits / 64)
    override def reduce(b: Array[Long], h: Long): Array[Long] = { setBits(b, h, k); b }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(t: Array[Long]): Array[Long] = t
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate Column: Bloom bitmap (`array<long>`, m bits) of `hashCol`. */
  def build(hashCol: Column, mBits: Int, k: Int): Column =
    udaf(new BloomBuild(mBits, k), Encoders.scalaLong).apply(hashCol)
}
