package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for aggregates — the "don't recompute the
  * world" shape that complements [[Merge]]'s row-level upserts: a
  * materialized per-key aggregate (yesterday's rollup) absorbs a new batch
  * by merging PARTIAL STATES, never by touching the base rows again.
  *
  * The algebra is exactly what Spark's own partial aggregation exploits:
  * count/sum/min/max states are commutative monoids, so
  * `state(A ∪ B) = state(A) ⊕ state(B)` — and derived measures (avg, rate)
  * are computed from the merged state at read time. Anything expressible
  * this way (or as a sketch — the b68 HLL rollup) maintains incrementally;
  * non-mergeable measures (exact median) do not, which is why they are
  * excluded from the contract here rather than silently wrong.
  *
  * Scale (100 TB): the nightly cost becomes O(|delta rows| + |affected
  * keys|) instead of O(|history|). The merge itself is a union of two
  * key-partitioned aggregate frames followed by one partial+final
  * aggregation on the key — map-side combine collapses the two states per
  * key before the (tiny, keys-only) shuffle. Determinism: states carry
  * integers/longs (cents, counts), so the merge is order-free and
  * bit-identical to the full recompute in any engine — which is precisely
  * what the b69 oracle asserts.
  */
object Ivm {

  /** Merge per-key aggregate state frames. Every frame must carry exactly
    * `keys ++ specs.keys` columns; `specs` maps each state column to its
    * merge monoid: `"sum"` (count and sum states), `"min"`, or `"max"`.
    */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String],
                  specs: Map[String, String]): DataFrame = {
    require(states.size >= 2, "mergeStates needs at least two state frames")
    val want = (keys ++ specs.keys).toSet
    states.foreach(st => require(st.columns.toSet == want,
      s"state frame columns ${st.columns.mkString(",")} != ${want.mkString(",")}"))
    val bad = specs.collect { case (c, m) if !Set("sum", "min", "max")(m) => s"$c->$m" }
    require(bad.isEmpty, s"unknown merge monoid(s): ${bad.mkString(", ")}")
    // stable column order regardless of map iteration order
    val stateCols = states.head.columns.filterNot(keys.contains).toSeq
    val aligned = states.map(_.select((keys ++ stateCols).map(col): _*))
    aligned.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        specs(stateCols.head) match {
          case "sum" => sum(col(stateCols.head)).as(stateCols.head)
          case "min" => min(col(stateCols.head)).as(stateCols.head)
          case "max" => max(col(stateCols.head)).as(stateCols.head)
        },
        stateCols.tail.map(c => specs(c) match {
          case "sum" => sum(col(c)).as(c)
          case "min" => min(col(c)).as(c)
          case "max" => max(col(c)).as(c)
        }): _*)
  }
}
