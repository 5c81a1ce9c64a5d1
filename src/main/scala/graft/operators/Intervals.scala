package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range/interval joins that scale.
  *
  * Reference behavior: oamap has no interval-join operator, but the harness
  * surface (SURVEY.md §2B joins) includes theta joins, and the naive Spark
  * plan for `ON k.eq AND ts BETWEEN lo AND hi` with a *selective* equality
  * key is fine — Spark plans the equi-part as a hash join and the range as
  * a post-filter. The plan that is NOT fine at 100 TB is a pure range
  * predicate (or a low-selectivity key): Catalyst falls back to
  * BroadcastNestedLoopJoin, which is O(|L|·|R|) and dies when neither side
  * fits in memory.
  *
  * [[binnedRangeJoin]] is the standard bin/bucket decomposition: quantize
  * time into fixed-width bins of exactly the window width, replicate each
  * LEFT row into the (at most 2) bins its window overlaps, and equi-join on
  * (key, bin). Every qualifying pair lands in exactly one (key, bin) bucket
  * of the shuffle, the residual range predicate runs as a cheap post-filter,
  * and the whole thing is a plain shuffled hash/sort-merge join — AQE can
  * split skewed buckets like any other equi-join (PlanSpec asserts no
  * BroadcastNestedLoopJoin/CartesianProduct in the b35 plan).
  *
  * Replication factor is ceil(window/binWidth)+1 ≤ 2 copies of the left
  * side; shuffle volume stays linear in both inputs.
  */
object Intervals {

  /** All (left, right) pairs with `l.keyCol == r.keyCol` and
    * `r.tsCol ∈ [l.tsCol + lo, l.tsCol + hi)` — timestamps and offsets in
    * the same integral unit (e.g. epoch micros). Returns the left columns
    * plus the matched right columns (right side aliased with `rPrefix`).
    * Inner semantics; aggregate/left-join downstream as needed.
    */
  def binnedRangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                      leftTs: String, rightTs: String,
                      lo: Long, hi: Long, rPrefix: String = "r_"): DataFrame = {
    require(hi > lo, s"empty window: [$lo, $hi)")
    val w = hi - lo // bin width = window width → a window spans ≤ 2 bins
    // The bin label is the bin's START OFFSET `a - pmod(a, w)` — subtraction
    // and pmod only, pure long arithmetic end to end. (Dividing by w to get
    // an index would route through Spark's Divide, which is IEEE-double on
    // integral inputs: exact only below 2^53, so epoch nanos or far-future
    // micros could land in the wrong bin and silently drop matching pairs.)
    // pmod keeps the floor semantics correct for negative epochs too.
    def bin(c: Column, off: Long): Column = {
      val a = (c + off).cast("long")
      a - pmod(a, lit(w))
    }
    // Left rows replicate into every bin their window overlaps: bin starts
    // from bin(ts+lo) to bin(ts+hi-1), stepping by the bin width w.
    val l = left.withColumn("__bin",
      explode(sequence(bin(col(leftTs), lo), bin(col(leftTs), hi - 1), lit(w))))
    val r = right
      .withColumn("__bin", bin(col(rightTs), 0))
      .select(col("__bin") +: right.columns.toIndexedSeq.map(c => col(c).as(s"$rPrefix$c")): _*)
    l.join(r,
        l("__bin") === r("__bin") && l(keyCol) === r(s"$rPrefix$keyCol") &&
          r(s"$rPrefix$rightTs") >= l(leftTs) + lo &&
          r(s"$rPrefix$rightTs") < l(leftTs) + hi)
      .drop("__bin")
  }

  /** Per-left-row count of right rows in the window — the "events in the
    * last N seconds" shape. LEFT join semantics: left rows with no match
    * keep count 0. One equi-join shuffle + one groupBy on the left id.
    */
  def countInWindow(left: DataFrame, right: DataFrame, keyCol: String,
                    leftIdCol: String, leftTs: String, rightTs: String,
                    lo: Long, hi: Long): DataFrame = {
    val matched = binnedRangeJoin(left, right, keyCol, leftTs, rightTs, lo, hi)
      .groupBy(col(leftIdCol)).agg(count(lit(1)).as("n_in_window"))
    left.join(matched, Seq(leftIdCol), "left")
      .withColumn("n_in_window", coalesce(col("n_in_window"), lit(0L)))
  }
}
