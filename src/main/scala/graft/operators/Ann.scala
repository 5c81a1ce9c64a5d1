package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Similarity

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2C). Baseline = brute-force cosine top-k; scale path = IVF
  * cell blocking with deterministic centroids.
  */
object Ann {

  /** Brute-force cosine top-k: every query against every item, ranked per
    * query by (cosine desc, id asc — total order for determinism).
    *
    * The query side is expected to be small and is broadcast, so this is a
    * map-side-only pass over the item table followed by one shuffle on
    * query_id for the per-query top-k window — the right plan when
    * |queries| ≪ |items| even at 100 TB of items.
    */
  def bruteTopK(items: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int): DataFrame = {
    val it = items.select(col(idCol).as("item_id"), col(vecCol).as("iv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = it.join(broadcast(q), col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        Similarity.cosineRounded(col("qv"), col("iv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cos"), col("rank"))
  }

  /** Contrastive hard-negative mining: per query, the top-k most cosine-
    * similar items whose `labelCol` DIFFERS from the query's — the pairs a
    * contrastive/embedding trainer wants as negatives precisely because
    * they are near misses (similar vector, different class). Same plan
    * shape as [[bruteTopK]] — broadcast the small query side, one narrow
    * scoring pass over items, one shuffle on query_id for the per-query
    * top-k window — plus the label-inequality join predicate, which the
    * broadcast join evaluates row-local (never a shuffle key). For 100 TB
    * item tables swap the scoring pass for the IVF/LSH candidate
    * generation ([[ivfTopK]], [[lshTopK]]) and keep this ranking tail;
    * the negatives' DEFINITION stays identical. */
  def hardNegatives(items: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val it = items.select(col(idCol).as("item_id"), col(vecCol).as("iv"),
      col(labelCol).as("item_label"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("query_label"))
    val scored = it.join(broadcast(q),
        col("item_id") =!= col("query_id") &&
        col("item_label") =!= col("query_label"))
      .select(col("query_id"), col("item_id"), col("item_label"),
        Similarity.cosineRounded(col("qv"), col("iv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("item_label"), col("cos"), col("rank"))
  }

  /** Deterministic Lloyd k-means codebook for [[ivfTopK]]: init = the k
    * lowest-id vectors (no sampling, reproducible across runs), then
    * `iters` rounds of assign-to-nearest (cosine) + per-cell mean.
    *
    * Scale: each iteration is one broadcast of k centroids, a narrow
    * assignment pass, and one groupBy(cell) shuffle whose reduce state is
    * k × dim doubles — the textbook distributed Lloyd step. Results are
    * deterministic up to floating-point summation order inside the mean
    * (Spark partial-sum order), which is why IVF queries built on this are
    * validated by recall tests rather than a bitwise SQL oracle.
    */
  def kmeansCentroids(items: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 2): DataFrame = {
    val spark = items.sparkSession
    var centroids = items.orderBy(col(idCol)).limit(k)
      .select(row_number().over(Window.orderBy(col(idCol))).cast("long").as("centroid_id"),
        col(vecCol).as("cvec"))
    (0 until iters).foreach { _ =>
      val assigned = items.select(col(idCol).as("item_id"), col(vecCol).as("v"))
        .join(broadcast(centroids))
        .select(col("item_id"), col("v"), col("centroid_id"),
          Similarity.cosineRounded(col("v"), col("cvec")).as("csim"))
      val w = Window.partitionBy("item_id").orderBy(col("csim").desc, col("centroid_id"))
      val cells = assigned.withColumn("r", row_number().over(w)).where(col("r") === 1)
      val dim = org.apache.spark.sql.functions.size(col("v"))
      centroids = cells
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), _.getField("m")).cast("array<float>").as("cvec"))
    }
    centroids
  }

  /** IVF-style blocked ANN: assign every vector to its nearest of
    * `centroids` (a small deterministic DataFrame of (centroid_id, vec)),
    * then search only the query's `nprobe` best cells.
    *
    * Scale: centroids are broadcast; cell assignment is a narrow map; the
    * candidate join shuffles on centroid_id only — the classic IVF trade of
    * recall for a |items|/|cells| fan-in reduction. Deterministic (no
    * sampled k-means here; callers provide centroids — e.g. first K vectors
    * or a precomputed codebook).
    */
  /** Nearest-centroid assignment (argmax by csim desc, centroid_id asc)
    * as a map-side-combinable AGGREGATE, for the |items|-sized side of
    * IVF: the broadcast centroid join fans every row out
    * |centroids|-fold, and the former per-id window argmax shipped that
    * entire fan-out through the exchange (k rows per item). `max_by`
    * partial-aggregates the fan-out back to ONE compact state per id
    * inside each map task, so the exchange ships |items| rows — a
    * |centroids|× shuffle-volume reduction on the 100 TB side (r17;
    * the tiny query side keeps the window because it needs top-nprobe,
    * not argmax). Ordering is identical to the window shape:
    * lexicographic max of (csim, −centroid_id) = (csim desc,
    * centroid_id asc), a total order since centroid ids are unique. */
  private def assignNearest(df: DataFrame, id: String, v: String,
                            cent: DataFrame): DataFrame =
    df.join(cent)
      .select(col(id), col(v), col("centroid_id"),
        Similarity.cosineRounded(col(v), col("cvec")).as("csim"))
      .groupBy(col(id))
      .agg(max_by(struct(col(v).as("v"), col("centroid_id").as("cid")),
        struct(col("csim"), (lit(0L) - col("centroid_id")).as("tb"))).as("best"))
      .select(col(id), col("best.v").as(v), col("best.cid").as("centroid_id"))

  def ivfTopK(items: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val cent = broadcast(centroids.select(col("centroid_id"), col("cvec")))

    def assign(df: DataFrame, id: String, v: String, keep: Int): DataFrame = {
      val scored = df.select(col(id), col(v))
        .join(cent)
        .select(col(id), col(v), col("centroid_id"),
          Similarity.cosineRounded(col(v), col("cvec")).as("csim"))
      val w = Window.partitionBy(id).orderBy(col("csim").desc, col("centroid_id"))
      scored.withColumn("crank", row_number().over(w))
        .where(col("crank") <= keep)
        .select(col(id), col(v), col("centroid_id"))
    }

    val itemCells = assignNearest(
      items.select(col(idCol).as("item_id"), col(vecCol).as("iv")), "item_id", "iv", cent)
    val queryCells = assign(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv", nprobe)

    val scored = itemCells.join(queryCells, Seq("centroid_id"))
      .where(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        Similarity.cosineRounded(col("qv"), col("iv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cos"), col("rank"))
  }

  /** Uniform negative sampling for contrastive training — the unbiased
    * complement of [[hardNegatives]]: per query, `k` items of a DIFFERENT
    * label chosen uniformly (w.r.t. the hash) rather than by geometry.
    * Training recipes mix both (random negatives keep gradients unbiased;
    * hard negatives sharpen the margin), so the two share one plan shape
    * and output schema.
    *
    * Determinism: items rank by the 60-bit md5 of "query:item" — stable
    * across runs, engines, and cluster layouts (never rand(), the
    * split-assignment rule), id tiebreak. Plan: the same bounded
    * broadcast shape as hardNegatives/c06 — tiny query side broadcasts,
    * the label filter evaluates row-local inside the join, per-task
    * top-k heaps below the query_id exchange. At 100 TB the hash rank
    * needs no candidate generation at all: sampling, unlike nearest-
    * neighbor, can pre-filter items by `hash mod m = r` and rank only
    * that 1/m slice (recall-free thinning — documented, not needed at
    * test scale). */
  def randomNegatives(items: DataFrame, queries: DataFrame, idCol: String,
                      labelCol: String, k: Int): DataFrame = {
    val it = items.select(col(idCol).as("item_id"), col(labelCol).as("item_label"))
    val q = queries.select(col(idCol).as("query_id"), col(labelCol).as("query_label"))
    val h = graft.functions.Text.tokenHash(
      concat(col("query_id").cast("string"), lit(":"), col("item_id").cast("string")))
    val w = Window.partitionBy("query_id").orderBy(col("h"), col("item_id"))
    it.join(broadcast(q),
        col("item_id") =!= col("query_id") &&
        col("item_label") =!= col("query_label"))
      .withColumn("h", h)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("item_label"), col("rank"))
  }

  /** IVF probe-count advisor — the measured-curve→decision pattern (c94
    * LSH bands, c96 Bloom sizing, c100 join order) applied to [[ivfTopK]]'s
    * recall/cost dial: measure EXACT recall@k against the brute-force
    * ground truth at every candidate `nprobe`, then pick the smallest
    * probe count meeting `targetPpm`. Every ANN deployment tunes this
    * knob; this computes the whole curve in ONE candidate pass.
    *
    * The one-pass trick: probe sets nest (the crank ≤ 1 cells ⊂ crank ≤ 2
    * ⊂ …), so a candidate's rank within the nprobe-p subset is a RUNNING
    * CONDITIONAL COUNT — sum(crank ≤ p) over the per-query (cos DESC, id)
    * order — and all |probes| ranks share one partitioning and one sort.
    * A candidate is in the nprobe-p top-k iff its own crank ≤ p and that
    * running count ≤ k. No per-probe re-derivation of the candidate join
    * (the b94 stack rule: measure once, decide on the tiny frame).
    *
    * Exactness: rounded cosine + id tiebreaks make every rank integral
    * and engine-portable; hits/recall_ppm are pure BIGINT. Scale: the
    * candidate join is the ivfTopK plan at max(probes); the decision runs
    * on a |probes|-row frame. Output one row per probe:
    * (nprobe, hits, brute_n, recall_ppm, chosen). */
  def ivfProbeAdvisor(items: DataFrame, queries: DataFrame, centroids: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      probes: Seq[Int] = Seq(1, 2, 4),
                      targetPpm: Long = 900000L): DataFrame = {
    require(probes.nonEmpty && probes == probes.sorted && probes.distinct == probes,
      s"probes must be distinct ascending, got $probes")
    val cent = broadcast(centroids.select(col("centroid_id"), col("cvec")))
    val maxProbe = probes.max

    def assign(df: DataFrame, id: String, v: String, keep: Int): DataFrame = {
      val scored = df.select(col(id), col(v))
        .join(cent)
        .select(col(id), col(v), col("centroid_id"),
          Similarity.cosineRounded(col(v), col("cvec")).as("csim"))
      val w = Window.partitionBy(id).orderBy(col("csim").desc, col("centroid_id"))
      scored.withColumn("crank", row_number().over(w))
        .where(col("crank") <= keep)
        .select(col(id), col(v), col("centroid_id"), col("crank"))
    }

    val itemCells = assignNearest(
      items.select(col(idCol).as("item_id"), col(vecCol).as("iv")), "item_id", "iv", cent)
    val queryCells = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", maxProbe)

    val brute = bruteTopK(items, queries, idCol, vecCol, k)
      .select(col("query_id"), col("item_id"), lit(1L).as("in_brute"))

    val cand = itemCells.join(queryCells, Seq("centroid_id"))
      .where(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"), col("crank"),
        Similarity.cosineRounded(col("qv"), col("iv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("item_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = probes.foldLeft(cand) { (df, p) =>
      df.withColumn(s"r$p", sum(when(col("crank") <= p, 1L)).over(w))
    }
    val hitCols = probes.map { p =>
      sum(when(col("crank") <= p && col(s"r$p") <= k && col("in_brute") === 1L, 1L)
        .otherwise(0L)).as(s"h$p")
    }
    // FULL OUTER join: one evaluation of the brute subtree serves both
    // the hit flags and the ground-truth count (brute-only rows carry a
    // null crank and count only toward brute_n) — a left join + separate
    // count would re-run the brute scoring pass, the query's most
    // expensive subtree, twice
    val totals = ranked.join(brute, Seq("query_id", "item_id"), "full_outer")
      .agg(hitCols.head,
        hitCols.tail :+ coalesce(sum(col("in_brute")), lit(0L)).as("brute_n"): _*)
    val stacked = totals.select(expr(
      s"stack(${probes.size}, " + probes.map(p => s"$p, h$p").mkString(", ") +
        ") AS (nprobe, hits)"), col("brute_n"))
      .select(col("nprobe"), col("hits"), col("brute_n"),
        expr("(hits * 1000000) div nullif(brute_n, 0)").as("recall_ppm"))
    val eligible = col("recall_ppm") >= targetPpm
    val pick = Window.orderBy(eligible.desc,
      when(eligible, col("nprobe")).otherwise(-col("nprobe")))
    stacked.withColumn("chosen", row_number().over(pick) === 1)
  }

  /** Deterministic ±1 random-hyperplane components: plane `j`, component
    * `k` is the sign of the first byte of `md5("j:k")` (+1 if < 0x80).
    * Cryptographic mixing makes components independent across BOTH j and k
    * — measured on sf0.01 embeddings, banded tables built on an affine
    * (LCG-high-bit) construction correlated across plane indices and lost
    * ~35% recall vs these md5 planes at identical (bits, tables). md5 of a
    * short decimal string is equally computable in any SQL engine
    * (`('0x'||substring(md5(j||':'||k),1,2))::INT < 128`), so the whole
    * construction stays hash-oracle-checkable. */
  private[graft] def hyperplane(j: Int, dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(dim) { k =>
      md.reset()
      val d = md.digest(s"$j:$k".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((d(0) & 0xff) < 128) 1.0 else -1.0
    }
  }

  /** Hyperplane-LSH bucket id for a vector column: bit `j` of the bucket is
    * `dot(v, hyperplane(planeOffset + j)) >= 0`. A narrow map, no shuffle —
    * `bits` sequential-order dot products against literal plane arrays, each
    * a codegen'd [[graft.plans.VectorExpressions.DotProduct]] loop (the HOF
    * fold unrolls 64-element literals into an expression tree that falls
    * out of whole-stage codegen; the custom kernel keeps it one tight
    * loop with identical left-to-right double numerics).
    *
    * `planeOffset` selects a disjoint plane range so independent hash
    * tables (LSH banding, [[graft.operators.Dedup.embeddingLshPairs]]) can
    * share the one deterministic plane sequence. */
  def lshBucket(vec: Column, dim: Int, bits: Int, planeOffset: Int = 0): Column =
    (0 until bits).map { j =>
      when(graft.plans.VectorExpressions.dotProduct(
          vec, typedLit(hyperplane(planeOffset + j, dim))) >= 0d,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multiprobe hyperplane-LSH ANN — the second `§2C` ANN scale path next
    * to [[ivfTopK]], and unlike IVF fully deterministic end-to-end (the
    * codebook is the hyperplane construction above, not a trained k-means),
    * so it is hash-oracle-checkable against an SQL engine.
    *
    * Every vector gets a `bits`-bit sign bucket in one narrow pass; each
    * query probes its own bucket plus all `bits` hamming-1 neighbors
    * (multiprobe — recovers most of the recall a single-bucket probe loses
    * on near-boundary vectors). Probes are EXPLODED on the small query side
    * and equi-joined on the bucket id, so the plan is a broadcast hash join
    * feeding an exact cosine rerank — candidates ≈ |items|·(bits+1)/2^bits
    * per query, never all-pairs, and the only shuffle is the per-query
    * top-k window. Tune `bits` up with corpus size (each extra bit halves
    * the candidate fraction and adds one probe).
    */
  def lshTopK(items: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              dim: Int, bits: Int, k: Int): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
    require(dim >= 1, s"dim must be positive, got $dim")
    val it = items.select(col(idCol).as("item_id"), col(vecCol).as("iv"),
      lshBucket(col(vecCol), dim, bits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), dim, bits).as("qbucket"))
    // probe list: own bucket + each single-bit flip (all distinct, so no
    // candidate can match twice — no dedup pass needed)
    val probes = q.select(col("query_id"), col("qv"),
      explode(array(col("qbucket") +: (0 until bits).map(m =>
        col("qbucket").bitwiseXOR(lit(1L << m))): _*)).as("pbucket"))
    val scored = it.join(broadcast(probes),
        col("bucket") === col("pbucket") && col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        Similarity.cosineRounded(col("qv"), col("iv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cos"), col("rank"))
  }

  /** Scalar int8 quantization of an embedding column — the at-rest
    * compression step of a 100 TB vector pipeline (4× smaller than the
    * float32 at rest; candidate generation — IVF lists, LSH buckets —
    * reads the int8 codes, exact rerank fetches the originals for the
    * few survivors). Per-vector max-abs scaling: `scale = 127/max|v_k|`
    * maps the largest component to ±127; `q_k = floor(v_k·scale + 0.5)`
    * — round-half-up spelled as floor, which is bit-exact IEEE in every
    * engine, unlike `round()`, whose half-ulp handling is engine-specific
    * (the c35 lesson). Zero vectors quantize to zeros with scale 0.
    * `recon_ok` bound-checks the round trip (cosine(v, dequantized)
    * ≥ 0.995; int8 on 64-dim sits ~0.9999) — a boolean bound absorbs
    * summation-order variance, the b18 sketch pattern.
    *
    * Scale: narrow, shuffle-free, whole-stage-codegen'd single pass. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("mx", array_max(transform(col("v"), abs(_))))
      .withColumn("scale", when(col("mx") > 0, lit(127.0) / col("mx")).otherwise(lit(0.0)))
      .withColumn("q", transform(col("v"), x => floor(x * col("scale") + lit(0.5)).cast("int")))
      .withColumn("dq", transform(col("q"),
        x => when(col("scale") > 0, x / col("scale")).otherwise(lit(0.0))))
      .select(col(idCol), col("scale"), col("q"),
        when(col("mx") === 0, lit(true))
          .otherwise(Similarity.cosine(col("v"), col("dq")) >= 0.995).as("recon_ok"))

  /** Per-dimension z-score standardization of an embedding column — the
    * feature-prep pass before distance-based work (clustering, ANN) when
    * dimensions carry different scales. Output is milli-quantized
    * (`z_milli = round(1000·(x−μ_d)/σ_d)`) packed back to one CSV string
    * per vector (the c38 flat-representation convention for the gate).
    *
    * Determinism (c33/c38 pattern): components are micro-quantized to
    * exact longs first, so per-dim n/Σ/Σ² are exact integers in any
    * aggregation order; μ, σ and z then use a FIXED two-step IEEE order
    * (μ = Σ/n; σ² = Σ²/n − μ·μ; z = (m−μ)/σ) that the oracle mirrors
    * op-for-op. Constant dimensions (σ = 0) map to z = 0. Σ² bound:
    * |x| ≤ 1 ⇒ m² ≤ 10¹²; safe to ~9·10⁶ rows per job in a long —
    * beyond that, aggregate Σ² in DECIMAL(38,0) (the statistic is a
    * two-long-counters monoid either way).
    *
    * Scale: the stats pass shuffles only the 64-row per-dim aggregate
    * (map-side combined); the apply is a NARROW map — stats return as one
    * broadcast row of dim-sorted (μ, σ) arrays (an audited 1-row
    * bounded-broadcast, c19 shape) and the z transform runs element-wise
    * inside the array, no explode, no second shuffle. */
  def standardizeEmbeddings(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = df.select(col(idCol),
      transform(col(vecCol), x => floor(x.cast("double") * 1e6 + 0.5).cast("long")).as("m"))
    val pos = e.select(col(idCol), posexplode(col("m")).as(Seq("dim", "mv")))
    val stats = pos.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("mv")).as("s"),
        sum(col("mv") * col("mv")).as("ss"))
    val mu = col("s").cast("double") / col("n")
    val sd = sqrt(col("ss").cast("double") / col("n") - mu * mu)
    val statsRow = stats.select(col("dim"), mu.as("mu"), sd.as("sd"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mu"), col("sd")))).as("st"))
    e.crossJoin(broadcast(statsRow))
      .select(col(idCol), concat_ws(",",
        transform(col("m"), (mv, i) => {
          val st = element_at(col("st"), i + 1)
          when(st.getField("sd") === 0.0, lit(0L))
            .otherwise(floor(lit(1000.0) *
              ((mv.cast("double") - st.getField("mu")) / st.getField("sd")) + 0.5)
              .cast("long"))
            .cast("string")
        })).as("z_csv"))
  }

  /** Johnson–Lindenstrauss dimensionality reduction with a HASH-SIGN (±1)
    * projection matrix: y_j = Σ_i sign(j,i)·q_i where q_i is the per-row
    * micro-quantized component (`floor(x·10⁶+0.5)` — the c74 grid) and
    * sign(j,i) ∈ {−1,+1} is a BIT of the engine-portable 60-bit md5 hash
    * of (j, i div 30) — a seed-free, materialization-free projection
    * matrix (Achlioptas'01 database-friendly JL: ±1 entries preserve
    * pairwise distances within (1±ε) for k = O(log n / ε²)). This is the
    * pre-LSH scale lever: at 100 TB, shrinking 64-dim vectors to
    * `outDims` before [[Dedup]]'s hyperplane LSH or [[ivfTopK]] cuts every
    * downstream signature/centroid cost by dims-ratio with a GUARANTEED
    * distance distortion, and because both the quantization and the sign
    * bits are deterministic integer arithmetic, the projection is
    * bit-identical on any engine, at any parallelism — no stored matrix
    * to version or ship.
    *
    * Plan: the 16×64 sign matrix is computed ONCE on a 1-row frame
    * (nested `transform` over literal index sequences — 2 md5 calls per
    * (j, 30-bit block), ~64 total) and broadcast; the projection itself
    * is a NARROW per-row fold (`aggregate` over the vector positions) —
    * zero shuffle, no per-row hashing. The only join is the audited
    * 1-row bounded-broadcast crossJoin (the c74 statsRow shape). */
  /** 60-bit md5 of "salt:a:b" — the engine-portable hash whose low bits
    * seed the ±1 matrices below. */
  private def h60(salt: String, a: Column, b: Column): Column =
    conv(substring(md5(concat(lit(salt + ":"), a.cast("string"), lit(":"),
      b.cast("string"))), 1, 15), 16, 10).cast("long")

  /** ±1 from bit (i mod 30) of the 60-bit hash of (salt, j, i div 30). */
  private def hashSign(salt: String, j: Column, i: Column): Column =
    lit(1L) - lit(2L) * call_function("shiftright",
      h60(salt, j, call_function("div", i.cast("long"), lit(30L))),
      pmod(i, lit(30)).cast("int")).bitwiseAND(lit(1L))

  /** Appends column `yv` = the `outDims`-long integer JL projection of
    * `vecCol` (see [[jlProjectHashSign]]); all existing columns ride
    * along. The sign matrix is one broadcast row; the fold is narrow. */
  def jlProjectVecCol(df: DataFrame, vecCol: String,
                      outDims: Int, inDims: Int = 64): DataFrame = {
    val signMatrix = df.sparkSession.range(1).select(
      transform(sequence(lit(0), lit(outDims - 1)), j =>
        transform(sequence(lit(0), lit(inDims - 1)), i =>
          hashSign("jl", j, i))).as("sg"))
    df.crossJoin(broadcast(signMatrix))
      .withColumn("yv", transform(sequence(lit(0), lit(outDims - 1)), j =>
        aggregate(sequence(lit(0), lit(inDims - 1)), lit(0L), (acc, i) =>
          acc + element_at(element_at(col("sg"), j + 1), i + 1) *
            floor(element_at(col(vecCol), (i + 1).cast("int")).cast("double") * 1e6 + 0.5)
              .cast("long"))))
      .drop("sg")
  }

  def jlProjectHashSign(df: DataFrame, idCol: String, vecCol: String,
                        outDims: Int, inDims: Int = 64): DataFrame =
    jlProjectVecCol(df.select(col(idCol), col(vecCol)), vecCol, outDims, inDims)
      .select(col(idCol), posexplode(col("yv")).as(Seq("j", "y")))

  /** The composed scale path, end to end: near-duplicate pairs via
    * hyperplane LSH over the JL-PROJECTED integer vectors, exact-verified
    * in-stream on the ORIGINAL vectors — [[jlProjectVecCol]] (64 → 16
    * integer dims, narrow fold) feeding [[graft.operators.Dedup.embeddingLshPairs]]'s
    * banded-bucket shape, with the signature path 100% integer arithmetic:
    * bit t is the exact sign of Σ_j ±yv_j (a second md5 ±1 family,
    * salt "hp"), so signatures are bit-identical on any engine — no float
    * enters until the final cosine verify, which reuses the proven c05
    * 6dp-rounded contract. Recall mechanics: JL preserves angles within
    * (1±ε), each band of `bandBits` exact-sign bits collides with
    * p ≈ (1−θ/π)^bandBits, and `outDims/bandBits` bands OR together.
    *
    * Scale: projection + bit computation are narrow per-row folds over
    * 16 ints (not 64 floats); the only wide ops are the (band, sig)
    * self-join — bounded buckets, the c31 dial — and the verified-pairs
    * distinct. At 100 TB this is why you project first: signature cost
    * and bucket-join payload shrink by dims-ratio while the verify step
    * keeps precision exact. */
  def jlLshPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                 outDims: Int = 16, bandBits: Int = 4, inDims: Int = 64): DataFrame = {
    require(outDims % bandBits == 0, s"bandBits $bandBits must divide outDims $outDims")
    val dot = graft.plans.VectorExpressions.dotProduct _
    // STAGED dataflow, not nested HOFs: an all-HOF formulation (yv →
    // bits → sigs as array columns in one projection) gets inlined by
    // CollapseProject so every element_at re-evaluates the whole upstream
    // fold — measured 4M+ ops and thousands of md5 calls PER ROW (325 s
    // at sf0.1). Exploded rows + a broadcast sign table + two tiny
    // aggregations put a physical operator between every stage; the
    // signature stages shuffle only (id, small ints) — outDims rows per
    // vector — and the arithmetic is identical, so the oracle is
    // unchanged.
    val proj = jlProjectHashSign(df, idCol, vecCol, outDims, inDims) // (id, j, y)
    val hp = df.sparkSession.range(outDims).select(col("id").cast("int").as("t"))
      .select(col("t"), explode(sequence(lit(0), lit(outDims - 1))).as("j"))
      .select(col("t"), col("j"), hashSign("hp", col("t"), col("j")).as("sgn"))
    // bit t = [ Σ_j hp_sign(t,j)·y_j ≥ 0 ]  — exact integer sign test
    val bits = proj.join(broadcast(hp), "j")
      .groupBy(col(idCol), col("t"))
      .agg((sum(col("sgn") * col("y")) >= 0).cast("long").as("bit"))
    val sigs0 = bits.groupBy(col(idCol),
        call_function("div", col("t").cast("long"), lit(bandBits.toLong)).as("band"))
      .agg(sum(col("bit") * call_function("shiftleft", lit(1L),
        pmod(col("t"), lit(bandBits)).cast("int"))).as("sig"))
    val v = df.select(col(idCol), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val sigs = sigs0.join(v, idCol).withColumnRenamed(idCol, "id")
    sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cosr"))
      // prefilter-gated exact threshold test (VectorExpressions.cosineAtLeast)
      .where(graft.plans.VectorExpressions.cosineAtLeast(col("cosr"), threshold))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Exact distributed cluster centroids — the k-means/IVF "update" step
    * with none of [[kmeansCentroids]]'s summation-order caveat. Each
    * member component is first snapped to an exact nano-scaled integer
    * (`floor(x·10⁹ + 0.5)` — per-row IEEE, bit-identical in any engine;
    * never `round()`), so the per-(cluster, pos) sums are INTEGER sums:
    * exact in any accumulation order, on any engine, at any parallelism
    * (magnitudes ≤ 10⁹·|cluster| ≪ 2⁶³). The mean is then one IEEE
    * division of exact integers per output row. This is how a 100 TB
    * pipeline makes its codebook build reproducible run-to-run: the only
    * approximation (the 1e-9 grid) is applied per-row, deterministically,
    * BEFORE anything is distributed.
    *
    * Plan: one equi-join (members ⋈ embeddings on id), one
    * posexplode, one partial+final groupBy(cluster, pos) — reduce state
    * is |clusters|·dim longs. `members` is (id, cluster_rep), e.g.
    * [[Dedup.clusters]] output. */
  def clusterCentroidsExact(members: DataFrame, embeddings: DataFrame,
                            idCol: String, vecCol: String): DataFrame = {
    val e = embeddings.select(col(idCol).as("__eid"), col(vecCol).as("v"))
    members.join(e, col("id") === col("__eid"))
      .select(col("cluster_rep"), posexplode(transform(col("v"),
        x => floor(x.cast("double") * lit(1e9) + lit(0.5)).cast("long"))).as(Seq("pos", "nano")))
      .groupBy(col("cluster_rep"), col("pos"))
      .agg(count(lit(1)).as("n_members"), sum(col("nano")).as("c_nano"))
      .select(col("cluster_rep"), col("pos"), col("n_members"), col("c_nano"),
        (col("c_nano").cast("double")
          / (col("n_members").cast("double") * lit(1e9))).as("centroid"))
  }

  /** Product-quantization encode (Jégou, Douze & Schmid, TPAMI 2011): each
    * vector is split into `m` subvectors of `subDim` dims; per subspace, a
    * `k`-entry codebook; the vector's code is the id of its nearest
    * codeword in each subspace — `m` small integers instead of `m·subDim`
    * floats (here 4 codes for 64 floats, a 64× at-rest compression of the
    * search structure). ADC search then needs only per-(subspace, codeword)
    * distance tables to the query — emitted here as `adc_micro2`, the
    * query's ADC squared distance to each encoded vector.
    *
    * Codebook: the subvectors of the first `k` vectors (id < k), the
    * deterministic convention [[ivfTopK]] documents — callers with a
    * trained codebook pass the same shape through the same math.
    *
    * Determinism (hash-oracle-safe): components are micro-quantized
    * (`floor(x·1e6 + 0.5)` — exact IEEE per row, the c38/c40 discipline);
    * every distance is then an exact BIGINT sum of squared integer diffs
    * (unit vectors ⇒ per-subspace ≤ 16·(1.2e6)² ≈ 2.4e13 and the ADC sum
    * ≤ 1e14, inside 2^53, so even a double-folding engine is exact);
    * argmin ties break on code id via struct ordering (code ids unique —
    * the trailing codeword field is never compared).
    *
    * Plan — the 100 TB story is the point: encoding is a NARROW MAP. The
    * codebook (k·m rows) and the one query row collapse to single-row
    * broadcasts; codes + ADC are computed per vector inside one projection
    * (HOF argmin over the broadcast array) — zero shuffle, zero window,
    * no per-vector fan-out ever materialized. Only the caller's final
    * orderBy shuffles. */
  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
               m: Int = 4, subDim: Int = 16, k: Int = 16,
               queryId: Long = 0L): DataFrame = {
    val micro = (v: Column) =>
      transform(v, x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
    val sq = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
    // one broadcast row: array of (code, subs = m subvectors) structs
    val cbRow = broadcast(embeddings.where(col(idCol) < k)
      .select(struct(col(idCol).cast("long").as("code"),
        transform(sequence(lit(0), lit(m - 1)),
          sm => slice(micro(col(vecCol)), sm * subDim + 1, lit(subDim))).as("subs")).as("e"))
      .agg(collect_list(col("e")).as("cb")))
    // one broadcast row: the query's m subvectors
    val qRow = broadcast(embeddings.where(col(idCol) === queryId)
      .select(transform(sequence(lit(0), lit(m - 1)),
        sm => slice(micro(col(vecCol)), sm * subDim + 1, lit(subDim))).as("qs")))
    val enc = embeddings.crossJoin(cbRow).crossJoin(qRow)
    val parts = (0 until m).map { sm =>
      val sub = slice(micro(col(vecCol)), lit(sm * subDim + 1), lit(subDim))
      val best = array_min(transform(col("cb"), c =>
        struct(sq(sub, element_at(c.getField("subs"), sm + 1)).as("d"),
          c.getField("code").as("code"),
          element_at(c.getField("subs"), sm + 1).as("cw"))))
      (best.getField("code").as(s"c$sm"),
        sq(element_at(col("qs"), sm + 1), best.getField("cw")))
    }
    enc.select(col(idCol) +: parts.map(_._1) :+
      parts.map(_._2).reduce(_ + _).as("adc_micro2"): _*)
  }

  /** Quantized-rerank cascade ANN — the production pairing of
    * [[quantizeInt8]]: the coarse pass ranks EVERY item by the cosine of
    * its int8 codes (at rest this scan reads the 4×-smaller code column
    * only), keeps the top `candidates` per query, and only those
    * survivors fetch their float vectors for the exact rerank to top `k`.
    * At 100 TB the win is I/O: the full-corpus pass touches codes, the
    * float column is read for |queries|·candidates rows.
    *
    * Determinism (hash-oracle-safe): the int8 dot product and squared
    * norms are exact integers (≤ dim·127² ≪ 2⁵³, so even an engine that
    * folds them in doubles gets the exact value, in any order); the
    * coarse score is then a fixed per-row IEEE sequence
    * `dot / (sqrt(in2)·sqrt(qn2))` — identical in every engine — with
    * ties broken by item_id. The exact stage reuses the c06 rerank shape.
    *
    * Plan: coarse stage is the audited bounded-broadcast pattern (tiny
    * query-code side broadcast against the linear item scan, same as
    * c06); survivors (|queries|·candidates rows) are broadcast back for
    * the vector fetch, so the item table is never shuffled. The only
    * shuffles are the two per-query top-k windows. */
  def int8Rerank(items: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                 k: Int, candidates: Int): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    def toCodes(df: DataFrame, outId: String, q: String, n2: String): DataFrame =
      df.select(col(idCol).as(outId), transform(col(vecCol), _.cast("double")).as("v"))
        .withColumn("mx", array_max(transform(col("v"), abs(_))))
        .withColumn("sc", when(col("mx") > 0, lit(127.0) / col("mx")).otherwise(lit(0.0)))
        .withColumn(q, transform(col("v"), x => floor(x * col("sc") + lit(0.5)).cast("long")))
        .withColumn(n2, aggregate(transform(col(q), x => x * x), lit(0L), _ + _))
        .where(col(n2) > 0)
        .select(col(outId), col(q), col(n2))

    val ic = toCodes(items, "item_id", "iq", "in2")
    val qc = toCodes(queries, "query_id", "qq", "qn2")
    val coarse = ic.join(broadcast(qc), col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        (aggregate(zip_with(col("iq"), col("qq"), (x, y) => x * y), lit(0L), _ + _)
          .cast("double")
          / (sqrt(col("in2").cast("double")) * sqrt(col("qn2").cast("double")))).as("icos"))
    val wc = Window.partitionBy("query_id").orderBy(col("icos").desc, col("item_id"))
    val survivors = coarse.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("item_id"))

    val iv = items.select(col(idCol).as("item_id"), col(vecCol).as("iv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val exact = iv.join(broadcast(survivors), Seq("item_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("item_id"),
        Similarity.cosineRounded(col("qv"), col("iv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("item_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cos"), col("rank"))
  }

  /** Dimension-slice-then-rerank cascade (the PQ/ADC consumer shape the
    * npy store's [[graft.sources.Npy.readVectorsSlice]] exists for, r17):
    * coarse cosine over the leading `sliceLen` dims of every item —
    * `itemsSlice` carries PRE-SLICED vectors, at rest read straight off
    * the store materializing only sliceLen/d of the payload per task —
    * cut to top-`candidates` per query, then exact full-vector rerank of
    * the survivors to top-k.
    *
    * At 100 TB the win is the coarse pass's width: the linear scoring
    * scan streams sliceLen-float rows (12.5 % of a d=64 payload at
    * sliceLen=8) and the full float column is fetched for only
    * |queries|·candidates rows — the [[int8Rerank]] economics with the
    * slice instead of codes, and the same recall caveat (the cascade is
    * approximate exactly where the coarse metric disagrees with the full
    * metric; `candidates` is the recall dial).
    *
    * Determinism (hash-oracle-safe): both stages score with
    * [[Similarity.cosineRounded]] (6dp, the fixed per-row IEEE sequence
    * the c06 oracle reproduces) and break ties by item_id; the
    * candidate cut is exact at rank `candidates`. The query slice is
    * computed in-plan from the full query vectors (`slice(qv, from,
    * len)`), which equals the store's slice BIT-EXACTLY (b131 gates
    * that identity).
    *
    * Plan: coarse = the audited bounded-broadcast shape (tiny sliced
    * query side broadcast against the linear item-slice scan, c06's
    * shape); survivors (|queries|·candidates rows) broadcast back for
    * the full-vector fetch, so the item table is never shuffled; the
    * only shuffles are the two per-query top-k windows.
    *
    * `sliceFrom` is 0-BASED, matching the store's
    * [[graft.sources.Npy.readVectorsSlice]] `dimStart` exactly —
    * `sliceFrom = d0, sliceLen = dn − d0` pairs with
    * `readVectorsSlice(_, _, d0, dn)`. (Spark's `slice()` is 1-based;
    * the +1 conversion happens here so the two halves of the cascade
    * can never be one dim apart.) */
  def sliceRerankTopK(itemsSlice: DataFrame, items: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, sliceFrom: Int, sliceLen: Int,
                      k: Int, candidates: Int): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    require(sliceFrom >= 0 && sliceLen > 0,
      s"bad dimension slice [$sliceFrom, ${sliceFrom + sliceLen}): 0-based, non-empty")
    val is = itemsSlice.select(col(idCol).as("item_id"), col(vecCol).as("sv"))
    val qs = queries.select(col(idCol).as("query_id"),
      slice(col(vecCol), sliceFrom + 1, sliceLen).as("qsv"))
    val coarse = is.join(broadcast(qs), col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        Similarity.cosineRounded(col("qsv"), col("sv")).as("scos"))
    val wc = Window.partitionBy("query_id").orderBy(col("scos").desc, col("item_id"))
    val survivors = coarse.withColumn("crank", row_number().over(wc))
      .where(col("crank") <= candidates)
      .select(col("query_id"), col("item_id"))
    val iv = items.select(col(idCol).as("item_id"), col(vecCol).as("iv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val exact = iv.join(broadcast(survivors), Seq("item_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("item_id"),
        Similarity.cosineRounded(col("qv"), col("iv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("item_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cos"), col("rank"))
  }
}
