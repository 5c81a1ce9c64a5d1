package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computations beyond connected components
  * ([[Dedup.clusters]]). Same scale doctrine: edges are the only shuffled
  * relation, every round is one equi-join + one aggregation on explicit
  * keys, no driver-side graph state.
  */
object Graph {

  /** Fixed-iteration PageRank in exact integer (nano-scaled) arithmetic.
    *
    * Web-corpus pipelines weight documents by host/page centrality (the
    * Common Crawl ranking shape); this is that computation made
    * engine-exact. Ranks are unnormalized longs starting at 1e9 per node;
    * each round applies
    *
    *   r'(v) = 150_000_000 + Σ_{(u,v) ∈ E} (85 · r(u)) div (100 · deg(u))
    *
    * i.e. damping 0.85 with FLOOR division — every intermediate is a
    * BIGINT, so the result is bit-identical at any parallelism and in any
    * engine that mirrors the formula (DuckDB `//`). Classic float PageRank
    * sums millions of doubles in nondeterministic order; this never
    * touches a float. Nodes without in-edges keep the teleport term
    * (the node list left-joins the contribution sums); dangling nodes
    * (no out-edges) contribute nothing, matching the "remove dangling
    * mass" PageRank variant — fine for a relative ranking signal.
    *
    * Scale (100 TB): the degree-annotated edge list (src, dst, deg) is
    * built once and PERSISTED (memory-with-disk-spill) — the `iters`
    * rounds each reference it, and without the cache the whole
    * edges→degree build would re-derive per round (AQE's exchange-stage
    * reuse catches the duplicate shuffles within one action, but the
    * explicit cache does not rely on it and also serves repeated
    * actions). Cache retention: lifetime of the app, by design — an
    * iterative operator's edge relation is the canonical persisted
    * intermediate; callers running many distinct graphs can unpersist
    * via the returned plan's lineage. Each round is then a shuffle of
    * the rank vector (2 longs per node) onto src for the contribution
    * join plus one partial+final aggregation onto dst — O(E + V) bytes
    * per round, the textbook distributed-PageRank cost. A fixed small
    * iteration count (ranking signals converge in single digits) keeps
    * the whole thing lazily composable: no convergence action, no
    * checkpoint needed at this plan depth.
    */
  def pageRankNano(edges: DataFrame, nodes: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1,8] (fixed-iteration ranking signal), got $iters")
    val e = edges.select(col("src"), col("dst"))
    // out-degree rides on each edge row: (src, dst, deg)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.select(col("node"))
    var rank = n.select(col("node"), lit(1000000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(rank, withDeg("src") === rank("node"))
        .select(col("dst"),
          expr("(85L * r) div (100L * deg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      rank = n.join(contrib, n("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(150000000L) + coalesce(col("cs"), lit(0L))).as("r"))
    }
    rank.select(col("node"), col("r").as("rank_nano"))
  }
}
