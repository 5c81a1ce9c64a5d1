package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — the bounded-memory frequency estimator that
  * completes the sketch family next to HLL (b18), GK quantiles (b36) and
  * the Bloom bitmap (c34). `d` md5-derived hash rows × `width` buckets;
  * the sketch is a (row, bucket) → count table of at most d·width cells
  * built by ONE partial-aggregated groupBy, and sketches of shards merge
  * by cell-wise addition — at 100 TB you keep a few KB per shard instead
  * of an unbounded token→count map, and the merge is associative.
  *
  * Every cell is an exact integer and the hash is the engine-portable
  * 60-bit md5 construction ([[Text.tokenHash]]'s convention), so unlike
  * textbook CMS with seeded multiply-shift hashing, this sketch is
  * bit-reproducible in any engine — the one-sided error guarantee
  * (estimate ≥ true count, ALWAYS; overcount only from collisions,
  * P[overcount > 2N/width per row] < 1/2 per independent row) is therefore
  * hash-oracle-checkable, not just unit-testable.
  */
object CountMin {

  /** Bucket of `tok` in hash row `r` (a column): 60-bit md5 of "r:tok",
    * mod width — positive on both engines. */
  private def bucketOf(r: Column, tok: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(r.cast("string"), lit(":"), tok)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the sketch over a token column: ≤ d·width rows of
    * (r, bucket, cnt). One explode (d× the tokens, map-side) and one
    * partial+final groupBy whose reduce state is the fixed cell grid. */
  def build(toks: DataFrame, tokCol: String, d: Int, width: Int): DataFrame = {
    require(d >= 1 && width >= 2, s"need d >= 1, width >= 2; got d=$d width=$width")
    toks.select(col(tokCol).as("tok"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), bucketOf(col("r"), col("tok"), width).as("bucket"))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate frequencies for `queries`' tokens: min over the d
    * cells each token hashes to. The sketch (≤ d·width rows) is broadcast;
    * the query side never shuffles. A queried token that was never counted
    * can miss cells entirely — the left join + coalesce(0) keeps the
    * no-false-negative reading (estimate 0 only for tokens with no
    * colliding mass at all). */
  def estimate(sketch: DataFrame, queries: DataFrame, tokCol: String,
               d: Int, width: Int): DataFrame =
    queries.select(col(tokCol).as("tok"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", bucketOf(col("r"), col("tok"), width))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
