package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Ann, Dedup, Multimodal, Nested, Pipeline, Scale, Variant}
import graft.functions.{Similarity, Text}
import graft.sources.Tables
import graft.streaming.Streams
import graft.EntryShared._

/** §2C query/oracle family of the [[SparkEntry]] driver contract — the
  * LLM-pipeline extensions (mechanical r15 split; bodies verbatim). */
private[graft] object EntryC {

  // =================================================================
  // §2C — LLM-pipeline extensions
  // =================================================================

  private[graft] val cQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "text", "doc_id")
        .select(col("rep_id"), col("n_dups"))
        .orderBy(col("rep_id"))),

    "c02_dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairsOf(docShingleSets(s, d),
          numPerm = 64, bands = 16, threshold = 0.8)
        .orderBy(col("a"), col("b"))),

    "c03_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text", maxHamming = 3)
        .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("a"), col("b"))),

    "c04_ngram_jaccard" -> ((s, d) =>
      docJaccardPairs(s, d)
        .orderBy(col("a"), col("b"))),

    "c05_dedup_embedding" -> ((s, d) =>
      embeddingPairGraph(s, d)
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))),

    "c06_ann_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      Ann.bruteTopK(emb, queries, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("item_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "c07_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      val centroids = emb.where(pmod(col("vec_id"), lit(97)) === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      Ann.ivfTopK(emb, queries, centroids, "vec_id", "embedding", k = 10, nprobe = 2)
        .select(col("query_id"), col("item_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "c22_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      Ann.lshTopK(emb, queries, "vec_id", "embedding", dim = 64, bits = 5, k = 10)
        .select(col("query_id"), col("item_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "c39_ann_int8_rerank" -> ((s, d) => {
      // coarse int8-code scan → exact float rerank of the 50 survivors
      // per query; see Ann.int8Rerank for the determinism + I/O story
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      Ann.int8Rerank(emb, queries, "vec_id", "embedding", k = 10, candidates = 50)
        .select(col("query_id"), col("item_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "c23_split_assign" -> ((s, d) =>
      Pipeline.split(t(s, d, "documents").select(col("doc_id")), "doc_id")
        .orderBy(col("doc_id"))),

    "c24_pack_shards" -> ((s, d) =>
      Pipeline.packByBudget(
        t(s, d, "documents").select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("ws_tokens")),
        "doc_id", "ws_tokens", budget = 10000L)
        .orderBy(col("doc_id"))),

    "c25_contamination" -> ((s, d) =>
      Pipeline.contamination(docShingleSets(s, d),
          pmod(col("id"), lit(10)) === 7, minShingles = 5)
        .orderBy(col("train_id"))),

    "c26_stratified_sample" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), Text.langId(col("text")).as("lang"))
      Pipeline.stratifiedSample(docs, col("lang"), "doc_id", Map("en" -> 30))
        .orderBy(col("doc_id"))
    }),

    "c27_dedup_best" -> ((s, d) => {
      val scores = t(s, d, "documents")
        .select(col("doc_id"), Text.qualityScore(col("text")).as("score"))
      Pipeline.bestRepresentative(docClusters(s, d), scores)
        .orderBy(col("cluster_rep"))
    }),

    "c28_boilerplate" -> ((s, d) =>
      // cross-document boilerplate: shingles shared by >= 5 docs (reuses
      // the persisted shingle index; cross-doc counterpart of c16)
      Pipeline.boilerplateStats(docShingleSets(s, d), minDf = 5)
        .select(col("id").as("doc_id"), col("n_sh"), col("n_boiler"), col("boiler_ratio"))
        .orderBy(col("doc_id"))),

    "c29_length_filter" -> ((s, d) =>
      // per-language length-band trim: drop each lang's shortest/longest
      // 5% by n_chars (percentile_disc band, integer-exact cutoffs)
      Pipeline.lengthBandFilter(t(s, d, "documents"), "lang", "n_chars")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    "c41_quality_gate" -> ((s, d) =>
      // keep each language's top-half quality (milli-bucketed integer
      // rank cut — see Pipeline.qualityGate for why not exact percent_rank)
      Pipeline.qualityGate(
          t(s, d, "documents").select(col("doc_id"), col("lang"),
            Text.qualityScoreNano(col("text")).as("qn")),
          "lang", col("qn"), keepPct = 50)
        .select(col("doc_id"), col("lang"), col("qn"), col("qmilli"))
        .orderBy(col("doc_id"))),

    "c08_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.langId(col("text")).as("pred_lang"))
        .orderBy(col("doc_id"))),

    "c09_quality" -> ((s, d) => {
      val toks = Text.tokens(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
          size(filter(toks, tk => tk.isInCollection(Text.stopwordsEn))).cast("long").as("n_stop"),
          Text.qualityScore(col("text")).as("score"))
        .orderBy(col("doc_id"))
    }),

    "c10_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("ws_tokens"),
          Text.subwordCount(col("text")).cast("long").as("subwords"))
        .orderBy(col("doc_id"))),

    "c11_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.fingerprint(Text.tokens(col("text"))).as("fp"))
        .orderBy(col("doc_id"))),

    "c17_dedup_clusters" -> ((s, d) =>
      // near-dup pairs -> connected components -> min-id representative
      docClusters(s, d)
        .select(col("id").as("doc_id"), col("cluster_rep"))
        .orderBy(col("doc_id"))),

    "c18_dedup_apply" -> ((s, d) => {
      // the actual dedup output: keep every document that is not a
      // non-representative member of a near-dup cluster
      val docs = t(s, d, "documents")
      val members = docClusters(s, d)
        .where(col("id") =!= col("cluster_rep"))
        .select(col("id"))
      docs.join(members, docs("doc_id") === members("id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "c19_tfidf" -> ((s, d) => {
      // corpus TF-IDF, top-3 terms per document. Arithmetic is kept to
      // IEEE +,*,/ (no transcendental log) so the score ordering is
      // bit-identical across engines: score = tf · N / df, which ranks
      // the same as tf · idf for any monotone idf of N/df.
      val docs = t(s, d, "documents")
      val tf = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("score", col("tf").cast("double") * col("n") / col("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    "c20_embedding_clusters" -> ((s, d) =>
      // semantic dedup: connected components over the exact cosine pair
      // graph at a tighter threshold — derived for free from the memoized
      // c05 tile join (its cos column), so no second pairwise pass; the
      // tighter cut keeps dedup groups tight instead of one giant blob
      Dedup.clusters(
          embeddingPairGraph(s, d).where(col("cos") >= 0.42).select(col("a"), col("b")))
        .select(col("id").as("vec_id"), col("cluster_rep"))
        .orderBy(col("vec_id"))),

    "c43_weighted_sample" -> ((s, d) =>
      // 100 docs drawn ∝ token count (longer docs proportionally more
      // likely) — the token-budget-aware counterpart of c26's uniform
      // stratified draw; see Pipeline.weightedSample for the integer
      // ticket construction
      Pipeline.weightedSample(
          t(s, d, "documents").select(col("doc_id"),
            Text.tokenCount(col("text")).cast("long").as("ws_tokens")),
          "doc_id", col("ws_tokens"), k = 100)
        .orderBy(col("tick_min"), col("doc_id"))),

    "c44_dup_spans" -> ((s, d) =>
      // substring-level duplication signal: per doc, total 5-token span
      // positions and how many of them occur in ≥ 2 distinct docs — the
      // span/line-dedup quality feature (a doc can be pair-unique yet
      // mostly built of copied spans). See Dedup.dupSpanStats for the
      // hash-only shuffle story.
      Dedup.dupSpanStats(t(s, d, "documents"), "doc_id", "text", spanN = 5)
        .select(col("id").as("doc_id"), col("n_spans"), col("dup_spans"))
        .orderBy(col("doc_id"))),

    "c45_pagerank" -> ((s, d) => {
      // centrality weighting over the real customer↔supplier bipartite
      // trade graph (distinct (o_custkey, l_suppkey) pairs via
      // orders ⋈ lineitem, both directions; key namespaces disjoint by
      // parity). 3 fixed rounds of exact integer PageRank — see
      // Graph.pageRankNano for the formula and per-round shuffle cost.
      val li = t(s, d, "lineitem")
      val eBase = li
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = eBase.union(
        eBase.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = t(s, d, "customer")
        .select((col("c_custkey") * 2).as("node"))
        .union(t(s, d, "supplier").select((col("s_suppkey") * 2 + 1).as("node")))
      graft.operators.Graph.pageRankNano(edges, nodes, iters = 3)
        .orderBy(col("node"))
    }),

    "c47_dup_run" -> ((s, d) =>
      // longest copied-block extent per doc: max run of consecutive
      // duplicated 5-token span positions (run r = copied substring of
      // r+4 tokens) — the "strip long exact substrings" dedup policy
      // signal, finer than c44's position counts. See Dedup.dupSpanRuns.
      Dedup.dupSpanRuns(t(s, d, "documents"), "doc_id", "text", spanN = 5)
        .select(col("id").as("doc_id"), col("max_dup_run"))
        .orderBy(col("doc_id"))),

    "c48_source_overlap" -> ((s, d) =>
      // provenance matrix: distinct 5-token spans shared per source pair
      // (who copies from whom) — the view that decides where
      // cross-source dedup effort goes. See Dedup.sourceSpanOverlap:
      // per-hash join fan-out bounded by |sources|, never doc count.
      Dedup.sourceSpanOverlap(t(s, d, "documents"), "source", "text", spanN = 5)
        .orderBy(col("source_a"), col("source_b"))),

    "c49_containment" -> ((s, d) =>
      // directed near-containment (≥90% of the contained doc's distinct
      // shingles inside the container) — catches short-doc-quoted-in-
      // long-doc dedup cases whose symmetric jaccard is tiny. Pure
      // integer threshold; capped inverted index. See
      // Dedup.containmentPairs.
      Dedup.containmentPairs(docShingleSets(s, d), containPct = 90)
        .orderBy(col("contained"), col("container"))),

    "c55_leakproof_split" -> ((s, d) => {
      // leakage-proof train/val/test split: near-dup docs MUST share a
      // split — splitting by doc id (c23) can put one copy of a near-
      // dup pair in train and the other in test, silently inflating
      // eval. Split key = cluster representative for clustered docs
      // (own id otherwise), then the same md5 bucketing as c23 — so
      // whole clusters move between splits as a unit. One left join of
      // the memoized cluster labels onto the doc list; everything else
      // is the narrow c23 map.
      val docs = t(s, d, "documents").select(col("doc_id"))
      val m = docClusters(s, d).select(col("id").as("doc_id"), col("cluster_rep"))
      docs.join(m, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_rep"), col("doc_id")).as("skey"))
        .transform(df => Pipeline.split(df, "skey"))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    "c56_bm25_rank" -> ((s, d) =>
      // integer-exact BM25-lite retrieval scoring against a fixed term
      // bag (one rare + three head terms, so the idf spread does visible
      // work): per-(doc, term) rational score with denominators cleared
      // to a single BIGINT floor division, corpus stats via scalar
      // subqueries, idf as a |terms|-row broadcast — identical bits in
      // any engine (see Pipeline.bm25LiteMilli).
      Pipeline.bm25LiteMilli(t(s, d, "documents"), "doc_id", "text",
          Seq("dup", "merge", "stream", "window"))
        .orderBy(col("doc_id"))),

    "c57_hybrid_rrf" -> ((s, d) => {
      // hybrid retrieval fusion: c56's integer BM25 leg (lexical) and a
      // dense leg (6dp-rounded cosine to a fixed query vector, the green
      // c06 cross-engine pattern) are each cut to top-100 by
      // TakeOrderedAndProject, densely ranked, and fused by
      // reciprocal-rank fusion — Σ 10⁹ div (60 + rank) BIGINT rationals,
      // absent leg ⇒ 0 (Pipeline.rrfFuse). The one-row query vector is a
      // broadcast cross join (bounded-broadcast, audited in
      // docs/PLANS.md); the fusion join touches only the two 100-row
      // legs on doc_id. documents.doc_id ≡ embeddings.vec_id by
      // construction (TESTDATA.md synthetic corpus).
      val bmLeg = Pipeline.topKRanks(
        Pipeline.bm25LiteMilli(t(s, d, "documents"), "doc_id", "text",
            Seq("dup", "merge", "stream", "window"))
          .select(col("doc_id"), col("score_milli")),
        "doc_id", "score_milli", 100, "bm25_rank")
      val emb = t(s, d, "embeddings")
      val qv = broadcast(
        emb.where(col("vec_id") === 0).select(col("embedding").as("qv")))
      val cosLeg = Pipeline.topKRanks(
        emb.crossJoin(qv).select(col("vec_id").as("doc_id"),
          Similarity.cosineRounded(col("embedding"), col("qv")).as("cos")),
        "doc_id", "cos", 100, "cos_rank")
      Pipeline.rrfFuse(Seq(bmLeg, cosLeg), "doc_id")
        .withColumn("fused_rank", row_number().over(
          Window.orderBy(col("rrf_ppb").desc, col("doc_id"))))
        .orderBy(col("fused_rank"))
    }),

    "c61_source_cap" -> ((s, d) =>
      // per-source document cap: at most 5 docs per source, best-first by
      // the c09 quality score (engine-identical doubles, doc_id
      // tiebreak) — the "no single domain dominates the mix" curation
      // guard. Rank-filter shape → WindowGroupLimit: per-task top-5
      // heaps per source BEFORE the shuffle (plan-asserted).
      Pipeline.capPerGroup(
          t(s, d, "documents")
            .select(col("doc_id"), col("source"),
              Text.qualityScore(col("text")).as("score")),
          col("source"), Seq(col("score").desc, col("doc_id").asc), n = 5)
        .orderBy(col("source"), col("rank"))),

    "c62_triangles" -> ((s, d) =>
      // per-node triangle counts over the near-dup pair graph — cluster
      // cohesion (tight cliques vs chains glued by one borderline pair).
      // Degree-oriented wedge join: no hub blow-up, equi-joins only
      // (Graph.triangleCounts scaladoc); reuses the memoized c04 pair
      // graph, so no second shingle pass.
      graft.operators.Graph.triangleCounts(docJaccardPairs(s, d))
        .orderBy(col("node"))),

    "c63_semantic_dedup" -> ((s, d) => {
      // SemDeDup (cluster-then-dedup): nearest-centroid cells (the c07
      // modulo-97 centroid convention), keep-lowest-id greedy within each
      // cell at the c05 cosine threshold — the hard-bounded-work point on
      // the embedding-dedup frontier (exact c05 / LSH c31 / blocked
      // c63). Centroids broadcast; shuffles only on cell and id.
      val emb = t(s, d, "embeddings")
      val cent = emb.where(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      Dedup.semanticDedupBlocked(emb, "vec_id", "embedding", cent,
          threshold = 0.35)
        .select(col("id").as("vec_id"), col("cell"), col("kept"))
        .orderBy(col("vec_id"))
    }),

    "c64_ref_lm_filter" -> ((s, d) => {
      // CCNet-style importance filtering: score EVERY document under a
      // bigram LM whose counts come from a REFERENCE slice only (sources
      // src0–src3 — the "clean corpus" stand-in); low surprisal = close
      // to the reference domain. The c58 integer floor-log2 arithmetic
      // with +1 smoothing: surp = flog2(r1+1) − flog2(r12+1) ≥ 0 (r12 ≤
      // r1 structurally); an unseen transition after a common reference
      // context scores high, an unseen context scores 0 (uninformative —
      // the backoff-to-ignorance rule, documented). Plan: reference
      // lookups are vocab-bounded partial aggregates; the score join
      // shuffles the position table once on (w1,w2) + once on w1; per-doc
      // sum on doc_id. At 100 TB the reference-head lookup broadcasts.
      val bg = docBigramsWithSource(s, d)
      val all = bg.drop("source")
      val ref = bg.where(col("source").isin("src0", "src1", "src2", "src3"))
        .drop("source")
      val r2 = ref.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("r2"))
      val r1 = ref.groupBy(col("w1")).agg(count(lit(1)).as("r1"))
      all.join(r2, Seq("w1", "w2"), "left").join(r1, Seq("w1"), "left")
        .select(col("doc_id"),
          (length(conv(coalesce(col("r1"), lit(0L)) + 1, 10, 2))
            - length(conv(coalesce(col("r2"), lit(0L)) + 1, 10, 2))).as("surp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("surp")).cast("long").as("ref_surprisal_sum"))
        .withColumn("surp_milli",
          expr("(1000 * ref_surprisal_sum) div n_bigrams"))
        .orderBy(col("doc_id"))
    }),

    "c78_stream_cms_parity" -> ((s, d) =>
      // batch parity for the STREAM-maintained count-min sketch
      // (Streams.streamCountMinCells over user ids, d=4 × width=64):
      // cell addition commutes, so the drained complete-mode stream
      // equals this batch build cell-for-cell (StreamingSpec). The
      // engine-portable md5 bucket hash makes the whole grid
      // oracle-checkable — exact cells, not just bounds.
      graft.functions.CountMin.build(
          t(s, d, "events").select(col("user_id").cast("string").as("tok")),
          "tok", d = 4, width = 64)
        .orderBy(col("r"), col("bucket"))),

    "c79_cms_join_size" -> ((s, d) =>
      // self-join size (F2) read off the c78 count-min cells — the
      // query-planner "will this join explode, do I need b47 salting"
      // estimate from d·width integers instead of running the join.
      // 150 distinct users > width 64 forces collisions, so est > exact
      // strictly (non-vacuous); both bound booleans are theorem-
      // guaranteed and the estimate itself is a deterministic integer
      // under the portable md5 bucket rule (CountMin.selfJoinSizeAudit
      // scaladoc)
      graft.functions.CountMin.selfJoinSizeAudit(
        t(s, d, "events").select(col("user_id").cast("string").as("tok")),
        "tok", d = 4, width = 64)),

    "b80_heavy_hitters" -> ((s, d) => {
      // Misra–Gries bounded-state heavy hitters over the lang column
      // (en ≈ 44% by construction — a real heavy hitter at every sf):
      // k = 2 < 5 distinct values forces constant evictions/merge
      // truncations, and the output is the THEOREM-GUARANTEED audit
      // (capture of every lang with cnt·(k+1) > n; error ≤ n/(k+1)) —
      // never the order-dependent raw estimates (Folds.MisraGries
      // scaladoc). Oracle = exact counts + literal TRUE booleans.
      val docs = t(s, d, "documents").select(coalesce(col("lang"), lit("")).as("lang"))
      val mg = udaf(new graft.functions.Folds.MisraGries(2))
      val summary = docs.agg(mg(col("lang")).as("mg"))
        .select(explode(col("mg.entries")).as("e"))
        .select(col("e.tok").as("lang"), col("e.est").as("est"))
      val est0 = coalesce(col("est"), lit(0L))
      docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        .join(summary, Seq("lang"), "left")
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .select(col("lang"), col("cnt"),
          (col("cnt") * 3 > col("n")).as("is_heavy"),
          (!(col("cnt") * 3 > col("n")) || est0 > 0).as("captured"),
          (est0 <= col("cnt") && (col("cnt") - est0) * 3 <= col("n")).as("bound_ok"))
        .orderBy(col("lang"))
    }),

    "c80_jl_projection" -> ((s, d) =>
      // hash-sign Johnson–Lindenstrauss projection 64 → 16 dims — the
      // seed-free, matrix-free pre-LSH dimensionality reducer
      // (Ann.jlProjectHashSign scaladoc: sign matrix computed once on a
      // 1-row broadcast, per-row integer fold, zero shuffle)
      graft.operators.Ann.jlProjectHashSign(
          t(s, d, "embeddings"), "vec_id", "embedding", outDims = 16)
        .orderBy(col("vec_id"), col("j"))),

    "c81_cms_join_size_2t" -> ((s, d) =>
      // cross-table join-size estimate — |events ⋈ customer| on the user
      // key as the INNER PRODUCT of two c78-style sketches (min_r over
      // Σ_b cellA·cellB): the two-100-TB-tables planner estimate from
      // 2·d·width integers, no raw-row join executed
      // (CountMin.joinSizeAudit scaladoc). Domains overlap partially
      // (user_id 0..149 vs c_custkey 1..N), so exact_join is nontrivial.
      graft.functions.CountMin.joinSizeAudit(
        t(s, d, "events").select(col("user_id").cast("string").as("tok")),
        t(s, d, "customer").select(col("c_custkey").cast("string").as("tok")),
        "tok", d = 4, width = 64)),

    "b81_skew_profile" -> ((s, d) =>
      // key-skew diagnostic (Scale.keySkewProfile scaladoc): max/mean
      // ratio + Gini over the key distribution, integer-exact and
      // tie-insensitive — what you read before choosing b47 salting /
      // AQE skew split, next to c79's join-size estimate
      graft.operators.Scale.keySkewProfile(
        t(s, d, "events").select(col("user_id")), "user_id")),

    "c82_jl_lsh_pairs" -> ((s, d) =>
      // the scale path COMPOSED end-to-end: JL 64→16 integer projection
      // (c80) → exact-integer hyperplane signatures → banded bucket
      // self-join → in-stream exact cosine verify on the ORIGINAL
      // vectors, c05's 6dp contract (Ann.jlLshPairs scaladoc). Fully
      // deterministic — the oracle replays the identical integer
      // signature pipeline, so this checks the composition exactly, not
      // just its recall.
      graft.operators.Ann.jlLshPairs(
          t(s, d, "embeddings"), "vec_id", "embedding", threshold = 0.35)
        .orderBy(col("a"), col("b"))),

    "b82_event_paths" -> ((s, d) => {
      // sequential path mining: the top-10 most common 3-event sequences
      // (the product-analytics generalization of b50's fixed funnel) —
      // ONE window pass per user (two leads over the same (ts, event_id)
      // total order), partial-aggregated path counts, TakeOrdered cut.
      // Ties broken by the full path for a total order.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("e1"))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .withColumn("e3", lead(col("e1"), 2).over(w))
        .where(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(col("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
        .limit(10)
    }),

    "b83_analyze_stats" -> ((s, d) =>
      // ANALYZE-style catalog statistics over orders in one pass
      // (Scale.analyzeStats scaladoc: exact NDV via the Expand one-pass
      // shape; canonical BIGINT envelopes — cents, epoch days — dodge
      // float/collation traps)
      graft.operators.Scale.analyzeStats(t(s, d, "orders"), Seq(
          "o_orderkey" -> col("o_orderkey"),
          "o_custkey" -> col("o_custkey"),
          "o_totalprice_cents" -> floor(col("o_totalprice") * 100 + 0.5),
          "o_orderdate_day" -> datediff(to_date(col("o_orderdate")),
            lit("1970-01-01").cast("date"))))
        .orderBy(col("col_name"))),

    "b87_snapshot_diff" -> ((s, d) => {
      // data-versioning audit: diff two table versions (b66's base
      // snapshot vs its merged successor) into added / removed /
      // changed / unchanged per key — run against mergeApply's own
      // output, the diff RECOVERS the changelog classification
      // (Merge.snapshotDiff scaladoc). One full-outer join; null-safe
      // payload equality, no arithmetic.
      val cutoff = lit("2024-01-16").cast("timestamp")
      def compact(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("st"))
        .select(col("user_id"), col("st.event_type").as("event_type"),
          col("st.value").as("value"))
      val ev = t(s, d, "events")
      val base = compact(ev.where(col("ts") < cutoff)).drop("event_type")
      val changes = compact(ev.where(col("ts") >= cutoff))
        .select(col("user_id"), col("value"),
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"))
      val neu = graft.operators.Merge.mergeApply(base, changes, "user_id")
        .select(col("user_id"), col("value"))
      graft.operators.Merge.snapshotDiff(base, neu, "user_id")
        .orderBy(col("user_id"))
    }),

    "c89_ann_precision" -> ((s, d) => {
      // retrieval evaluation ON the engine: precision@10 of the
      // multiprobe-LSH ANN (c22) against the exact brute-force top-10
      // (c06), per query — both sides deterministic (6dp-rounded cosine,
      // id tiebreak), so the hit counts are oracle-exact, unlike a
      // sampled recall estimate. The eval every ANN deployment needs
      // before trusting its index.
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      val brute = Ann.bruteTopK(emb, queries, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("item_id"))
      val lsh = Ann.lshTopK(emb, queries, "vec_id", "embedding",
          dim = 64, bits = 5, k = 10)
        .select(col("query_id"), col("item_id"))
      val hits = brute.join(lsh, Seq("query_id", "item_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      queries.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("h"), lit(0L)).as("hits_at_10"))
        .orderBy(col("query_id"))
    }),

    "b86_bucketed_agg" -> ((s, d) => {
      // the aggregation half of the b37 at-rest-layout story: a groupBy
      // on the BUCKET KEY of a bucketed table plans with ZERO hash
      // exchange — the scan's bucket distribution already satisfies the
      // aggregate's requirement, so a 100 TB per-key rollup on a
      // bucketed-at-ingest table is shuffle-free (plan-asserted)
      val ob = graft.sources.Formats.bucketedTable(s, "orders_by_cust", d,
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "o_custkey", buckets = 8)
      ob.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_custkey"))
    }),

    "b90_grouped_mad" -> ((s, d) => {
      // per-language median + MAD of document length — the GROUPED
      // robust stats b88's scaladoc routes here: both medians via
      // Scale.groupedMedianDisc (cumulative window partitioned by
      // group — no per-group row buffering), deviations joined through
      // a broadcast of the tiny per-group median table.
      val docs = t(s, d, "documents")
        .select(coalesce(col("lang"), lit("")).as("lang"), col("n_chars"))
      val med = graft.operators.Scale.groupedMedianDisc(docs, "lang", "n_chars")
        .withColumnRenamed("med", "med_chars")
      val dev = docs.join(broadcast(med), Seq("lang"))
        .select(col("lang"), abs(col("n_chars") - col("med_chars")).as("ad"))
      val mad = graft.operators.Scale.groupedMedianDisc(dev, "lang", "ad")
        .withColumnRenamed("med", "mad_chars")
      med.join(mad, Seq("lang")).orderBy(col("lang"))
    }),

    "b89_scd2_asof" -> ((s, d) => {
      // point-in-time (AS OF) read over the b60 SCD2 dimension: each
      // user's row whose validity interval contains T — computed the
      // scale-right way: the time predicate pushes into the SCAN
      // (plan-asserted) and one max_by compaction per user replaces
      // interval construction entirely; provably equal to filtering
      // b60's [from, to) intervals because max_by on (ts, event_id) ≤ T
      // picks exactly the interval containing T under b60's tie order.
      val cutoff = lit("2024-01-16").cast("timestamp")
      t(s, d, "events").where(col("ts") <= cutoff)
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("event_id").as("eid"), unix_micros(col("ts")).as("vf")),
          struct(col("ts"), col("event_id"))).as("st"))
        .select(col("user_id"), col("st.eid").as("event_id"),
          col("st.vf").as("valid_from_us"))
        .orderBy(col("user_id"))
    }),

    "b88_mad_robust" -> ((s, d) => {
      // median absolute deviation — the robust scale estimate b75's
      // winsorize pairs with (outlier gates as med ± k·MAD survive the
      // heavy tails that wreck stddev): exact integer cents, two
      // percentile_disc passes with the 1-row median broadcast between
      // them. percentile_disc buffers per group — fine for ONE global
      // group; grouped variants at 100 TB go through b71's cumulative-
      // window trick instead (see c29's note). percentile_disc returns
      // DOUBLE; the inputs are exact longs so the cast back to long is
      // lossless — and required, because the oracle emits BIGINT and
      // the driver hashes rendered types (r8's one red cell).
      val cents = t(s, d, "lineitem")
        .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      val med = cents
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
          .cast("long").as("med"))
      cents.crossJoin(broadcast(med))
        .select(abs(col("v") - col("med")).as("ad"), col("med"))
        .agg(max(col("med")).as("median_cents"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)")
            .cast("long").as("mad_cents"),
          count(lit(1)).as("n"))
    }),

    "c100_join_order" -> ((s, d) =>
      // the c83 planner story at the MULTI-WAY level: all three pairwise
      // join sizes of (events, orders, customer) on the shared customer
      // key estimated from CMS inner products (2·d·width integers per
      // table, no raw join executed), and join_first = the smallest
      // estimated intermediate — the greedy first step of cost-based
      // join reordering, reproduced bit-for-bit by the oracle
      graft.functions.CountMin.joinOrderAdvisor(Seq(
          "events" -> t(s, d, "events").select(col("user_id").cast("string").as("tok")),
          "orders" -> t(s, d, "orders").select(col("o_custkey").cast("string").as("tok")),
          "customer" -> t(s, d, "customer").select(col("c_custkey").cast("string").as("tok"))),
          "tok", d = 4, width = 64)
        .orderBy(col("left_table"), col("right_table"))),

    "c101_temperature_mix" -> ((s, d) =>
      // temperature-scaled mixture sampling (T=2): kept mass per lang
      // ∝ sqrt(w_lang) — the multilingual exponent-smoothing recipe as a
      // downsample-only pass. The water-filling normalizer cancels
      // (Pipeline.temperatureMix scaladoc), so the ONLY float ops are
      // correctly-rounded IEEE sqrt/div/mul in a fixed order — the c33
      // determinism discipline with nothing left to order. md5 ppm
      // bucketing; the per-stratum ppm is in the output so the mix math
      // itself is oracle-checked.
      Pipeline.temperatureMix(
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "doc_id", "n_chars")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("ppm"))
        .orderBy(col("doc_id"))),

    "c102_hard_negatives" -> ((s, d) => {
      // contrastive hard-negative mining: per query vector, the top-10
      // nearest items of a DIFFERENT label (near-miss negatives — what
      // an embedding trainer pairs against positives). The c06 broadcast
      // + window shape with the label-inequality predicate evaluated
      // row-local inside the broadcast join; ranks are the output (the
      // c06 float discipline: rounded cosine breaks ties before id).
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      graft.operators.Ann.hardNegatives(emb, queries, "vec_id", "embedding",
          "label", k = 10)
        .select(col("query_id"), col("item_id"), col("item_label"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "c103_keep_best" -> ((s, d) =>
      // dedup survivorship policy: within each canonical-dup group keep
      // the best member by (n_chars desc, doc_id asc) — the "keep the
      // longest variant" rule, vs c71's min-id representative. One
      // shuffle on the 60-bit canonical hash; rank + group size share
      // one window partitioning.
      graft.operators.Dedup.keepBest(
          t(s, d, "documents"), "doc_id", "text", "n_chars")
        .orderBy(col("doc_id"))),

    "b102_funnel4" -> ((s, d) => {
      // 4-stage ordered funnel (view → click → signup → purchase): the
      // N-stage generalization of b94's kernel in the oracle gate, not
      // just unit tests — same ONE user shuffle shared by all four
      // chained conditional-min windows, same stack unpivot of the one
      // materialized count row (a union would re-derive the staged
      // pipeline per branch). Streams.funnelStagesWithState runs the
      // identical machine on a stream at any N.
      val staged = graft.operators.Series.funnelStageTimes(
        t(s, d, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "signup", "purchase"))
      val counts = staged.agg(
        count(col("s1")).as("u1"), count(col("s2")).as("u2"),
        count(col("s3")).as("u3"), count(col("s4")).as("u4"))
      counts.select(expr(
        "stack(4, " +
          "1, 'view',     u1, (u1 * 1000000) div nullif(u1, 0), " +
          "2, 'click',    u2, (u2 * 1000000) div nullif(u1, 0), " +
          "3, 'signup',   u3, (u3 * 1000000) div nullif(u1, 0), " +
          "4, 'purchase', u4, (u4 * 1000000) div nullif(u1, 0)) " +
          "AS (stage, event_type, users, conv_ppm)"))
        .orderBy(col("stage"))
    }),

    "b103_tpch_q6" -> ((s, d) => {
      // TPC-H Q6 shape (forecast revenue change): the pure-scan query —
      // every predicate on a RAW column so all three reach the parquet
      // reader (date range, discount band, quantity cut; PushedFilters
      // carries them all — double literals compare exactly against the
      // stored doubles in both engines), one map-side partial aggregate,
      // a 1-row final. Zero joins, zero wide shuffles: at 100 TB this is
      // the scan-bound query AQE cannot improve and pushdown decides.
      // Revenue in exact cent·percent integers (the b95/b100 rule).
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val disc = floor(col("l_discount") * 100 + 0.5).cast("long")
      t(s, d, "lineitem")
        .where(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate").cast("date") < lit("1997-01-01").cast("date") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(sum(cents * disc).as("revenue_cents_pct"),
          count(lit(1)).as("n_items"))
    }),

    "b104_tpch_q17" -> ((s, d) => {
      // TPC-H Q17 shape (small-quantity-order revenue): revenue from
      // lineitems whose quantity is below 20 % of their part's average.
      // The textbook form scans lineitem twice (a correlated per-part
      // avg subquery + the probe); this is the ONE-scan window form —
      // broadcast the filtered part keys, one l_partkey exchange serves
      // the per-part (sum, count) window AND the row filter. The 20 %
      // test is cleared-denominator integers (qty < sum/(5·cnt) ⟺
      // 5·qty·cnt < sum in deci-quantities — no division, no doubles),
      // so both engines agree bit-for-bit.
      val parts = t(s, d, "part").where(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val qtyDeci = floor(col("l_quantity") * 10 + 0.5).cast("long")
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      t(s, d, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), qtyDeci.as("qty_deci"), cents.as("cents"))
        .withColumn("sum_deci", sum(col("qty_deci")).over(wp))
        .withColumn("cnt", count(lit(1)).over(wp))
        .where(col("qty_deci") * col("cnt") * 5 < col("sum_deci"))
        .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_small"))
        .select(expr("sum_cents div 7").as("avg_yearly_cents"), col("n_small"))
    }),

    "c104_edit_distance_pairs" -> ((s, d) =>
      // typo-granular near-dup pairs: Levenshtein ≤ 14 on the first-8-
      // token "title", candidates blocked by lead token + the length
      // theorem |len(a)−len(b)| ≤ maxDist (a necessary condition for
      // lev ≤ maxDist, filtered before any DP runs). The character-edit
      // member of the dedup family next to set-overlap c02/c04 and
      // bit-distance c03; exact integer distances both engines compute
      // with the same Wagner–Fischer recurrence.
      graft.operators.Dedup.editDistancePairs(
          t(s, d, "documents"), "doc_id", "text", keyTokens = 8, maxDist = 14)
        .orderBy(col("doc_a"), col("doc_b"))),

    "c105_ivf_probe_advisor" -> ((s, d) => {
      // IVF nprobe advisor (the c94/c96/c100 measured-curve→decision
      // family): exact recall@10 vs the brute-force truth at nprobe ∈
      // {1,2,4} from ONE candidate pass — probe sets nest, so the
      // per-probe candidate rank is a running conditional count over the
      // same per-query sort — then choose the smallest probe count
      // reaching 90 % recall. Pure-integer hits/ppm, rounded-cosine +
      // id tiebreaks; the decision runs on a 3-row frame.
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      val centroids = emb.where(pmod(col("vec_id"), lit(97)) === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      graft.operators.Ann.ivfProbeAdvisor(emb, queries, centroids,
          "vec_id", "embedding", k = 10, probes = Seq(1, 2, 4),
          targetPpm = 900000L)
        .orderBy(col("nprobe"))
    }),

    "b105_trailing_days" -> ((s, d) => {
      // time-INTERVAL range frame (the missing sibling of b27's numeric
      // range frame): per customer, each order's trailing-7-day order
      // count and spend. The frame bound is event time, not row count —
      // a burst of same-day orders all enter each other's frame. Ordering
      // key = exact epoch micros (integer RANGE bounds are engine-
      // portable; INTERVAL literals in a frame are not everywhere), cents
      // exact. One customer shuffle, one sort, both aggregates share the
      // frame.
      val spanUs = 7L * 24 * 3600 * 1000000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("ts_us"))
        .rangeBetween(-spanUs, 0L)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_trailing"),
          sum(col("cents")).over(w).as("cents_trailing"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "c107_bootstrap_stats" -> ((s, d) =>
      // one-pass Poisson(1) bootstrap of corpus statistics: 8 replicates
      // of (docs drawn, total chars, mean chars) from deterministic
      // md5-ppm multiplicities — the sampling-variance error bar for
      // corpus metrics WITHOUT 8 corpus passes. Replicate explode is
      // map-side only (partial aggregation compacts to 8 rows per task).
      graft.operators.Pipeline.bootstrapStats(
          t(s, d, "documents"), "doc_id", "n_chars", replicates = 8)
        .orderBy(col("replicate"))),

    "c108_random_negatives" -> ((s, d) => {
      // uniform (hash-ranked) negative sampling — the unbiased partner
      // of c102's hard negatives, same plan shape and schema: per query,
      // 10 different-label items ranked by md5("query:item"). Unlike
      // geometry-ranked mining, sampling thins for free at 100 TB
      // (pre-filter items on hash mod m before ranking).
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      graft.operators.Ann.randomNegatives(emb, queries, "vec_id", "label", k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    "c109_quality_classifier" -> ((s, d) =>
      // fastText-style hashed-ngram linear classifier inference (the r12
      // VERDICT #5 depth item): unigram+bigram features → 2^16 md5 hash
      // buckets → broadcast integer-weight lookup → exact integer score,
      // gate = score >= 0. The learned quality gate next to the c09
      // heuristic and c64's count-based CCNet filter; weights-as-data
      // (Pipeline.demoClassifierWeights stands in for an exported
      // checkpoint). One broadcast join + one doc_id partial-sum exchange
      // — no new exchange classes (plan-asserted).
      docClassifierScores(s, d)
        .select(col("doc_id"), col("n_feats"), col("score"),
          (col("score") >= 0L).as("kept"))
        .orderBy(col("doc_id"))),

    "c110_classifier_yield" -> ((s, d) => {
      // the gate's YIELD CURVE — "if I move the quality bar, what do I
      // keep, per language?": conditional sums over a fixed threshold
      // grid computed in ONE pass over the scored frame (no per-threshold
      // re-scan; the 5-way stack runs on the |langs|-row aggregate), docs
      // + chars retained and the exact-ppm doc share. The report every
      // curation run publishes before committing to a threshold. Plan:
      // the c109 inference plan + one doc_id join + one lang exchange.
      val thr = Seq(-2000L, -1000L, 0L, 1000L, 2000L)
      val perLang = graft.operators.Pipeline.classifierYieldStateFromScored(
        docClassifierScores(s, d), "lang", "n_chars", thr)
      classifierYieldCurve(perLang, thr)
    }),

    "c113_eval_apportionment" -> ((s, d) =>
      // exactly-k stratified eval-set selection: per-language quotas by
      // largest-remainder (Hamilton) apportionment in pure BIGINT (floor
      // quotas + bonuses to the largest k*n mod N remainders, lang
      // tiebreak), membership = bottom-alloc docs per language by the md5
      // tokenHash (the c23 split doctrine). Output is exactly min(k, N)
      // rows — the property floor-only quotas lose. Plan: one count
      // exchange, the apportionment on the |langs|-row frame, one
      // lang-window membership pass (Pipeline.apportionedSample scaladoc).
      graft.operators.Pipeline.apportionedSample(
          t(s, d, "documents"), "lang", "doc_id", k = 100L)
        .orderBy(col("lang"), col("rk"))),

    "c112_yield_ivm" -> ((s, d) => {
      // the c110 yield report MAINTAINED INCREMENTALLY under a CDC batch
      // (the b69 IVM algebra applied to the classifier gate): the standing
      // corpus's per-lang yield STATE absorbs an insert batch (doc_id%10=3,
      // the c36 arrival convention) and a retraction batch (doc_id%10=7)
      // by monoid addition — retractions enter as the NEGATED state. Every
      // state column is a sum, so merge ≡ recompute exactly (the oracle IS
      // the full recompute over the post-CDC corpus). At 100 TB the nightly
      // cost is scoring the two small batches — the corpus is never
      // rescanned; here all three slices are filters over the one
      // memoized scored frame (docClassifierScores — the per-doc-score
      // materialized view this IVM maintains the rollup of). A fully-
      // retracted stratum leaves a zero state row the recompute has no
      // group for — filtered by total_docs > 0.
      val thr = Seq(-2000L, -1000L, 0L, 1000L, 2000L)
      val scored = docClassifierScores(s, d)
      def st(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Pipeline.classifierYieldStateFromScored(
          df, "lang", "n_chars", thr)
      val stateCols = Seq("total_docs") ++
        thr.indices.flatMap(i => Seq(s"kd$i", s"kc$i"))
      val negDel = st(scored.where(pmod(col("doc_id"), lit(10)) === 7))
        .select(col("lang") +: stateCols.map(c => (-col(c)).as(c)): _*)
      val merged = graft.operators.Ivm.mergeStates(
        Seq(st(scored.where(pmod(col("doc_id"), lit(10)) =!= 3)), // base
          st(scored.where(pmod(col("doc_id"), lit(10)) === 3)),   // inserts
          negDel),                                                // retractions
        Seq("lang"), stateCols.map(_ -> "sum").toMap)
      classifierYieldCurve(merged.where(col("total_docs") > 0), thr)
    }),

    "c111_gate_agreement" -> ((s, d) => {
      // learned gate vs heuristic gate, the 2×2 agreement matrix a
      // pipeline reads before letting a trained filter replace a
      // hand-tuned one: kept-by-both / only-classifier / only-heuristic /
      // neither, with doc and char mass in each cell. Both gates are
      // exact integers (c109 score ≥ 0; qualityScoreNano ≥ 0.395 in nanos
      // — c35's bar, near the fixture median so all four cells populate),
      // so the matrix is engine-reproducible. Plan: the c109 inference
      // plan + the narrow heuristic projection + one doc_id join + a
      // 4-row aggregate.
      t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          (Text.qualityScoreNano(coalesce(col("text"), lit(""))) >=
            395000000L).as("kept_h"))
        .join(docClassifierScores(s, d)
          .select(col("doc_id"), (col("score") >= 0L).as("kept_c")),
          "doc_id")
        .groupBy(col("kept_c"), col("kept_h"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("kept_c"), col("kept_h"))
    }),

    "c114_classifier_calibration" -> ((s, d) => {
      // CALIBRATION readout of the learned gate (the natural c109
      // consumer after the c111 agreement matrix): score-decile ×
      // empirical keep-rate reliability table, the heuristic gate
      // (c35's qualityScoreNano ≥ 0.395) standing in for labels — a
      // well-calibrated quality score should keep monotonically more
      // heuristic-passing docs per decile. Deciles are EXACT and
      // engine-reproducible without a per-doc global sort: docs
      // aggregate per integer score value first (one score exchange,
      // map-side combined), the cumulative rank runs over the
      // |distinct scores|-row frame (the c113 small-frame window
      // discipline — score is a bounded integer sum, so this frame is
      // tiny at any corpus size), and a score value's docs all land in
      // the decile of its LAST row: decile = ((cum−1)·10) div N + 1 —
      // ties never split across calibration bins. Everything BIGINT;
      // ppm is exact floor division. Off the memoized scored frame +
      // the c111 heuristic projection — zero new exchange classes.
      // Parallelism note (the c104/c31 1-file-scan rule, disposed): the
      // heuristic leg runs at SCAN parallelism before its narrow
      // (doc_id, kept_h) result broadcasts — at production scale that is
      // many-files-parallel; on the single-file testdata it is one task,
      // the same audited shape as c111 (~0.5 s at sf0.1). The alternative
      // — repartitioning (doc_id, text) — would shuffle raw text, the
      // worse standing-rule violation; raw text never shuffles.
      classifierCalibrationTable(s, d)
    }),

    "c116_calibration_audit" -> ((s, d) => {
      // the b80 audit-boolean discipline applied to c114: per decile,
      // is the empirical keep-rate monotone non-decreasing vs the
      // previous decile, plus the table-wide violation count — so the
      // calibration table becomes a machine-checkable regression signal
      // (a nightly pipeline alerts on violations_total > 0 instead of a
      // human reading ten ppm numbers). Both engines compute the SAME
      // booleans from the same exact-integer table — never a "close
      // enough" float comparison. Plan: the c114 plan + a lag window
      // and a count window on the 10-row decile frame (the c113
      // small-frame discipline); first decile is vacuously monotone.
      val wLag = Window.orderBy(col("decile"))
      val wAll = Window.partitionBy()
      classifierCalibrationTable(s, d)
        .select(col("decile"), col("n_docs"), col("kept_h_ppm"))
        .withColumn("prev_ppm",
          coalesce(lag(col("kept_h_ppm"), 1).over(wLag), lit(-1L)))
        // ppm ≥ 0 > −1, so the first decile's sentinel is vacuously
        // monotone under the plain comparison — no special case needed
        .withColumn("monotone_up", col("kept_h_ppm") >= col("prev_ppm"))
        .withColumn("violations_total",
          sum(when(col("monotone_up"), 0L).otherwise(1L)).over(wAll))
        .orderBy(col("decile"))
    }),

    "c115_gate_threshold_advisor" -> ((s, d) => {
      // threshold ADVISOR for the learned gate — the planner-advisor
      // pattern (c83 join strategy, c94 LSH params, c105 IVF probes)
      // applied to the classifier family: per language, the TIGHTEST
      // threshold on the c110 grid that still keeps at least the target
      // doc share (500000 ppm = half), i.e. "raise the quality bar as
      // far as the yield budget allows". Languages where even the
      // loosest threshold misses the target fall back to that loosest
      // threshold with qualifies=false — the advisor always answers.
      // Decision logic is ONE deterministic rank over the curve:
      // qualifying rows first, tightest (max thr) among them, loosest
      // (min thr) otherwise. Plan: the c110 plan + one rank window on
      // the |langs×5|-row curve frame (the c113 small-frame discipline);
      // reads the memoized scored frame, leaf-asserted.
      val thr = Seq(-2000L, -1000L, 0L, 1000L, 2000L)
      val curve = classifierYieldCurve(
        graft.operators.Pipeline.classifierYieldStateFromScored(
          docClassifierScores(s, d), "lang", "n_chars", thr), thr)
      val w = Window.partitionBy(col("lang")).orderBy(
        col("qualifies").desc,
        when(col("qualifies"), -col("thr")).otherwise(col("thr")))
      curve.withColumn("qualifies", col("kept_ppm") >= 500000L)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("lang"), col("thr").as("chosen_thr"), col("total_docs"),
          col("kept_docs"), col("kept_ppm"), col("qualifies"))
        .orderBy(col("lang"))
    }),

    "c117_calibration_drift" -> ((s, d) => {
      // calibration DRIFT over corpus generations (the r14-roadmap c114
      // consumer): the nightly signal a deployed gate needs is not one
      // reliability table but the DELTA between two generations of it —
      // the b87 snapshot-diff discipline applied to the 10-row decile
      // frame. Generations are the c112 CDC convention: "previous" = the
      // corpus before the insert batch (doc_id%10 != 3), "current" = the
      // full corpus; both tables come from the ONE calibrationTableOf
      // rule over the ONE memoized per-doc gate-bits frame, so a
      // generation can never be computed by a drifted rule. Each
      // generation self-normalizes its own deciles (a reliability table
      // is a within-corpus object — comparing decile k of gen A to
      // decile k of gen B is the standard calibration-drift readout).
      // Per decile: doc mass and keep-rate ppm on both sides, the ppm
      // delta, a drift boolean (|delta| > 10000 ppm — one point, chosen
      // against the measured fixture deltas so both verdicts populate at
      // every sf: 8/2 at sf0.001, 6/4 at 0.01, 2/8 at 0.1 — or a decile
      // missing from either side, possible only under extreme
      // score-tie mass),
      // and the table-wide drifted-decile count (the c116 audit-boolean
      // discipline: a nightly alerts on drifted_total, never on a human
      // reading 10 ppm numbers). All BIGINT; full-outer decile join with
      // 0/−1 sentinels (ppm_delta is then computed vs −1 and meaningless
      // — drifted is already forced true by the missing side, which is
      // the value a consumer gates on). Plan: two cache reads (the
      // memoized 10-row table + one re-aggregate of the memoized bits
      // frame under the slice filter — one score exchange, the c114
      // class), windows on ≤10-row frames; zero new exchange classes.
      val prev = calibrationTableOf(
          docGateBits(s, d).where(pmod(col("doc_id"), lit(10)) =!= 3))
        .select(col("decile"), col("n_docs").as("n_docs_prev"),
          col("kept_h_ppm").as("kept_h_ppm_prev"))
      val curr = classifierCalibrationTable(s, d)
        .select(col("decile"), col("n_docs").as("n_docs_curr"),
          col("kept_h_ppm").as("kept_h_ppm_curr"))
      val wAll = Window.partitionBy()
      curr.join(prev, Seq("decile"), "full_outer")
        .select(col("decile"),
          coalesce(col("n_docs_prev"), lit(0L)).as("n_docs_prev"),
          coalesce(col("n_docs_curr"), lit(0L)).as("n_docs_curr"),
          coalesce(col("kept_h_ppm_prev"), lit(-1L)).as("kept_h_ppm_prev"),
          coalesce(col("kept_h_ppm_curr"), lit(-1L)).as("kept_h_ppm_curr"))
        .withColumn("ppm_delta",
          col("kept_h_ppm_curr") - col("kept_h_ppm_prev"))
        .withColumn("drifted",
          abs(col("ppm_delta")) > 10000L ||
            col("kept_h_ppm_prev") < 0L || col("kept_h_ppm_curr") < 0L)
        .withColumn("drifted_total",
          sum(when(col("drifted"), 1L).otherwise(0L)).over(wAll))
        .orderBy(col("decile"))
    }),

    "c118_image_codec_roundtrip" -> ((s, d) => {
      // REAL image codec under the driver's gate (r15 extended — the JDK
      // ships javax.imageio, so the long-standing "codec stubbed" gap
      // closes for images): per doc, ENCODE the deterministic
      // Multimodal.patternPng RGB pattern as PNG and DECODE it back with
      // the real codec (decodeImage), emitting the exact integer pixel
      // features. PNG is lossless, so decode∘encode is the identity on
      // pixels — the oracle recomputes every feature in CLOSED FORM from
      // the pattern (an 8×6 bounded series join, no codec in SQL); any
      // codec defect (channel order, row order, color-space mangling,
      // dimension swap) breaks the hash. Plan: 1-column doc_id scan →
      // narrow per-row encode+decode (pixels never leave the executor,
      // the documented Multimodal mapPartitions class) → determinism
      // orderBy; zero joins, zero aggregates, bounded 4–8 × 3–6 px
      // images, ~1 KB per row of transient codec work.
      import s.implicits._
      t(s, d, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val f = Multimodal.decodeImage(Multimodal.patternPng(id))
          (id, f.ok, f.width, f.height, f.r_sum, f.g_sum, f.b_sum,
            f.l0, f.l1, f.l2, f.l3)
        })
        .toDF("doc_id", "ok", "width", "height", "r_sum", "g_sum", "b_sum",
          "l0", "l1", "l2", "l3")
        .orderBy(col("doc_id"))
    }),

    "c119_audio_codec_roundtrip" -> ((s, d) => {
      // the c118 discipline for REAL WAV audio (javax.sound.sampled):
      // encode the deterministic Multimodal.patternWav 16-bit PCM
      // fixture, decode with the real codec, emit exact frame/format/
      // amplitude features; PCM is raw so the roundtrip is exact and the
      // oracle is the closed form over the sample formula (negative
      // amplitudes exercised). Same narrow no-shuffle plan as c118.
      import s.implicits._
      t(s, d, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val f = Multimodal.decodeWavPcm(Multimodal.patternWav(id))
          (id, f.ok, f.n_frames, f.channels, f.rate_hz, f.amp_abs_sum)
        })
        .toDF("doc_id", "ok", "n_frames", "channels", "rate_hz", "amp_abs_sum")
        .orderBy(col("doc_id"))
    }),

    "c106_epoch_allocation" -> ((s, d) =>
      // token-budget epoch allocator: distribute a 2×-corpus token
      // budget across sources ∝ doc count, each source capped at 4
      // epochs of its own tokens; the water-filling split is a CLOSED
      // FORM on the |sources|-row frame (sort by cap/weight, prefix
      // sums, cleared-BIGINT validity products — no iteration, no
      // doubles in any decision). The data-recipe planning step next to
      // c33's target mix and c101's temperature mix.
      graft.operators.Pipeline.epochAllocation(
          t(s, d, "documents"), "source", "n_chars",
          maxEpochs = 4, budgetNum = 2L, budgetDen = 1L)
        .orderBy(col("source"))),

    "c99_sliding_topk" -> ((s, d) => {
      // batch parity for the SLIDING-window streaming Misra–Gries
      // heavy hitters (Streams.streamSlidingHeavyHitters, 1 h / 30 min,
      // k=2 over 5 event types — constant evictions by construction):
      // per closed window, exact per-type counts next to the
      // THEOREM-GUARANTEED audit booleans (capture of every type with
      // cnt·3 > n; error ≤ n/3) — never the merge-order-dependent raw
      // estimates, the b80 discipline applied per window. The exact
      // side is one grouped count; the summary side is one windowed MG
      // aggregate whose state is O(k) per window.
      val ev = t(s, d, "events")
      val wm = broadcast(ev.agg(
        (max(col("ts")) - expr("INTERVAL 30 MINUTES")).as("wm")))
      val mg = udaf(new graft.functions.Folds.MisraGries(2))
      val base = ev.select(window(col("ts"), "1 hour", "30 minutes").as("w"),
        coalesce(col("event_type"), lit("")).as("event_type"))
      val summary = base.groupBy(col("w")).agg(mg(col("event_type")).as("mg"))
        .select(col("w"), explode(col("mg.entries")).as("e"))
        .select(col("w"), col("e.tok").as("event_type"), col("e.est").as("est"))
      val exact = base.groupBy(col("w"), col("event_type")).agg(count(lit(1)).as("cnt"))
      val est0 = coalesce(col("est"), lit(0L))
      // n = window total, derived as a window SUM over the exact per-type
      // counts (r9 ADVICE): the exact frame already partitions every base
      // row into exactly one (w, event_type) cell, so sum(cnt) over w IS n
      // — one fewer full pass over the fact table than a third groupBy.
      exact.join(summary, Seq("w", "event_type"), "left")
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("w"))))
        .crossJoin(wm).where(col("w.end") <= col("wm"))
        .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
          col("cnt"),
          (col("cnt") * 3 > col("n")).as("is_heavy"),
          (!(col("cnt") * 3 > col("n")) || est0 > 0).as("captured"),
          (est0 <= col("cnt") && (col("cnt") - est0) * 3 <= col("n")).as("bound_ok"))
        .orderBy(col("w_start_us"), col("event_type"))
    }),

    "c98_sliding_cms" -> ((s, d) => {
      // batch parity for the SLIDING-window streaming CMS
      // (Streams.streamSlidingCmsCells, 1 h / 30 min, 4×64 grid): the
      // b91 sliding assignment composed with c78's counting-monoid cell
      // algebra — closed windows' grids are arrival-order-proof, so the
      // drained stream equals this batch aggregation cell-for-cell
      // (StreamingSpec asserts it live). Every cell is an exact integer
      // under the shared md5 bucket rule — fully hash-verified, no bound
      // booleans needed.
      val ev = t(s, d, "events")
      val wm = broadcast(ev.agg(
        (max(col("ts")) - expr("INTERVAL 30 MINUTES")).as("wm")))
      ev.select(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("user_id").cast("string").as("tok"))
        .select(col("w"), col("tok"), explode(sequence(lit(0), lit(3))).as("r"))
        .groupBy(col("w"), col("r"),
          graft.functions.CountMin.bucketOf(col("r"), col("tok"), 64).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(wm)
        .where(col("w.end") <= col("wm"))
        .select(unix_micros(col("w.start")).as("w_start_us"), col("r"),
          col("bucket"), col("cnt"))
        .orderBy(col("w_start_us"), col("r"), col("bucket"))
    }),

    "c97_anomaly_days" -> ((s, d) => {
      // robust ingest monitoring — the "did a feed drop or spike" check a
      // 100 TB pipeline runs per partition-day: daily event counts per
      // type, then median ± MAD gating (b88/b90's robust stats — a mean/
      // stddev gate is wrecked by exactly the outliers it should catch).
      // The fact table compacts to the (type × day) frame in ONE
      // map-side-combined shuffle before any window; the robust stats run
      // on that tiny frame via Scale.groupedMedianDisc (group-partitioned
      // cumulative windows, no per-group buffering) and broadcast back.
      // anomaly = |cnt − med| > 3·MAD, pure integers end to end.
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val med = graft.operators.Scale.groupedMedianDisc(
        daily.select(col("event_type"), col("cnt")), "event_type", "cnt")
      val dev = daily.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), abs(col("cnt") - col("med")).as("ad"))
      val mad = graft.operators.Scale.groupedMedianDisc(dev, "event_type", "ad")
        .withColumnRenamed("med", "mad")
      daily.join(broadcast(med), Seq("event_type"))
        .join(broadcast(mad), Seq("event_type"))
        .select(col("event_type"), col("day"), col("cnt"), col("med"), col("mad"),
          (abs(col("cnt") - col("med")) > col("mad") * 3).as("anomaly"))
        .orderBy(col("event_type"), col("day"))
    }),

    "c96_bloom_advisor" -> ((s, d) =>
      // Bloom sizing closed-loop: the integer m >= n·k/ln2 rule decides,
      // and the engine BUILDS each candidate filter and measures its
      // false-positive rate on provably-disjoint probes (prefix-split
      // hashes + anti-join) — fp bounds certified as the b18/b78
      // boolean pattern, the sizing itself exact-integer-verified.
      // chosen adapts with scale: 2^14 at sf0.001, 2^16 at sf0.01,
      // 2^18 at sf0.1 (customer grows 10x per sf).
      // fp_count is library-reported but NOT oracle-verified (r9 ADVICE:
      // monotonicity across independently hashed filters is expected, not
      // theorem-backed; only the fp_ok BOUND is certifiable) — select the
      // theorem-backed column set for the gate.
      graft.operators.Pipeline.bloomAdvisor(
        t(s, d, "customer"),
        graft.functions.Text.tokenHash(
          concat(lit("m"), col("c_custkey").cast("string"))))
        .select(col("m_bits"), col("k_hashes"), col("n_keys"), col("min_bits"),
          col("eligible"), col("chosen"), col("fp_ok"))
        .orderBy(col("m_bits"))),

    "c94_lsh_advisor" -> ((s, d) =>
      // the c83 "measure, then decide" pattern pointed at LSH's own
      // dials: per candidate banding, MEASURED bucket occupancy and
      // candidate-pair volume on the real corpus signatures next to the
      // analytic S-curve (threshold + recall at j=0.8), and a chosen
      // flag = cheapest config clearing the 99% recall floor within the
      // pair budget. Selects bands=16 — exactly c02's proven operating
      // point (measured recall table in docs/PLANS.md). Shares the
      // memoized shingle index; no pair is ever materialized.
      Dedup.lshParamAdvisor(docShingleSets(s, d))
        .orderBy(col("bands"))),

    "c93_cluster_size_dist" -> ((s, d) =>
      // duplicate-cluster size distribution, log₂-binned (the c87 shape
      // over c71's canonical groups): the dedup-impact report a corpus
      // owner reads — mass in bin 0 = unique docs, a heavy tail = a few
      // giant boilerplate families dominating removal
      graft.operators.Dedup.canonicalExact(t(s, d, "documents"), "doc_id", "text")
        .select(col("n_dups"), (length(bin(col("n_dups"))) - 1).as("size_bin"))
        .groupBy(col("size_bin"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("n_dups")).as("n_docs"),
          max(col("n_dups")).as("max_size"))
        .orderBy(col("size_bin"))),

    "c91_corpus_diversity" -> ((s, d) => {
      // Gini–Simpson diversity index per grouping dimension — the
      // corpus-mix KPI next to c85's per-source card: 1 − Σ pᵢ² as the
      // exact rational (1000·(n² − Σnᵢ²)) div n², no float, no log
      // (Shannon entropy would need one). 1000·(1−1/k) is the ceiling
      // for k equal groups; collapse toward 0 = concentration.
      def div(dim: String) = t(s, d, "documents")
        .select(coalesce(col(dim), lit("")).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_groups"), sum(col("c")).as("n"),
          sum(col("c") * col("c")).as("ss"))
        .select(lit(dim).as("dimension"), col("n_groups"),
          expr("(1000 * (n * n - ss)) div (n * n)").as("diversity_milli"))
      div("source").union(div("lang")).orderBy(col("dimension"))
    }),

    "c92_langid_confusion" -> ((s, d) =>
      // classifier evaluation ON the engine: c08's n-gram/stopword
      // language-ID scored against the declared lang column as a full
      // confusion matrix — the precision/recall raw material every
      // heuristic filter needs before it gates a 100 TB corpus. One
      // grouped pass; both the predictor and the truth are
      // deterministic columns.
      t(s, d, "documents")
        .select(coalesce(col("lang"), lit("")).as("true_lang"),
          Text.langId(col("text")).as("pred_lang"))
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("true_lang"), col("pred_lang"))),

    "c90_bpe_compression" -> ((s, d) => {
      // what the learned merges BUY: corpus symbol count before vs after
      // applying c88's three rules (Bpe.applyMerges — same pipeline that
      // learned them), with the saving in integer milli units. The
      // tokenizer-training feedback metric: merge yield flattening ⇒
      // stop learning rules.
      val docs = t(s, d, "documents")
      val before = docs
        .select(posexplode(Text.tokens(coalesce(col("text"), lit(""))))
          .as(Seq("p", "tk")))
        .where(col("tk") =!= "")
        .agg(count(lit(1)).as("toks_before"))
      val after = graft.operators.Bpe.applyMerges(docs, "doc_id", "text", k = 3)
        .agg(count(lit(1)).as("toks_after"))
      before.crossJoin(broadcast(after))
        .select(col("toks_before"), col("toks_after"),
          expr("(1000 * (toks_before - toks_after)) div toks_before").as("saved_milli"))
    }),

    "c88_bpe_merges" -> ((s, d) =>
      // tokenizer training ON THE ENGINE: the first 3 BPE merge rules
      // learned from the corpus — exact leftmost-greedy merge semantics
      // via gaps-and-islands parity, every per-round window sharing one
      // doc shuffle, winner = 1-row broadcast (Bpe.merges scaladoc);
      // oracle unrolls the identical three rounds
      graft.operators.Bpe.merges(t(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("rank"))),

    "c95_bpe_merges_k16" -> ((s, d) =>
      // the c88 pipeline driven to DEPTH — 16 rounds, the regime where
      // the per-round lineage-truncation discipline is what keeps the
      // plan flat (without it plan size doubles per round; the c82
      // lesson). The oracle is GENERATED: the same CTE chain c88
      // hand-writes at k=3, mechanically unrolled to k=16 — the "oracle
      // strategy past k≈8" the r8 ledger left open, resolved as full
      // exact verification rather than a weaker law/rows-only check.
      // Runs on the doc_id ≡ 0 (mod 16) corpus slice to bound the
      // 16-round wall cost in the bench suite — the demo value here is
      // DEPTH, and per-round cost at local scale is scheduling-floor-
      // dominated, not data-dominated (measured in docs/PLANS.md).
      graft.operators.Bpe.merges(
        t(s, d, "documents").where(pmod(col("doc_id"), lit(16)) === 0),
        "doc_id", "text", k = 16)
        .orderBy(col("rank"))),

    "c86_personalized_ppr" -> ((s, d) => {
      // proximity-to-seeds ranking over the c45 trade graph: restart
      // mass only on the seed customers (c_custkey ≡ 0 mod 20) — the
      // "related accounts" recommendation signal, exact nano-integer
      // recurrence (Graph.personalizedPageRankNano scaladoc)
      val li = t(s, d, "lineitem")
      val eBase = li
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = eBase.union(
        eBase.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = t(s, d, "customer")
        .select((col("c_custkey") * 2).as("node"),
          (pmod(col("c_custkey"), lit(20)) === 0).cast("long").as("seed"))
        .union(t(s, d, "supplier")
          .select((col("s_suppkey") * 2 + 1).as("node"), lit(0L).as("seed")))
      graft.operators.Graph.personalizedPageRankNano(edges, nodes, iters = 3)
        .orderBy(col("node"))
    }),

    "b85_asof_tolerance" -> ((s, d) => {
      // as-of join WITH TOLERANCE (the merge_asof tolerance/direction
      // surface): each purchase gets the user's most recent click only
      // if it happened within 1 hour — b08's linear one-window shape,
      // the click timestamp carried alongside the id so the gap test
      // never re-joins. Gap in whole seconds (floor of the micros
      // difference — exact integers both engines).
      val e = t(s, d, "events")
      val tagged = e.where(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "click", 0).otherwise(1).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = unix_micros(col("ts")) - unix_micros(col("cts"))
      val inTol = col("cts").isNotNull && gapUs <= 3600000000L
      tagged
        .withColumn("click_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("cts",
          last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
        .where(col("kind") === 1)
        .select(col("event_id"), col("user_id"),
          when(inTol, col("click_id")).as("click_id"),
          when(inTol, expr("(unix_micros(ts) - unix_micros(cts)) div 1000000"))
            .as("gap_s"))
        .orderBy(col("event_id"))
    }),

    "c87_degree_dist" -> ((s, d) => {
      // log₂-binned degree distribution of the trade graph — the
      // power-law diagnostic read before graph work is scheduled (a
      // heavy tail predicts hot reducers in any per-node aggregation;
      // pairs with b81's key-skew read). Bin = ⌊log₂ deg⌋ via binary
      // string length — exact integers, no float log.
      val li = t(s, d, "lineitem")
      val eBase = li
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = eBase.union(
        eBase.select(col("dst").as("src"), col("src").as("dst")))
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("deg"), (length(bin(col("deg"))) - 1).as("deg_bin"))
        .groupBy(col("deg_bin"))
        .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
          max(col("deg")).as("max_deg"))
        .orderBy(col("deg_bin"))
    }),

    "b84_weighted_pctile" -> ((s, d) =>
      // exact weighted percentiles — spend-weighted price points over
      // lineitem: the smallest price (cents) covering p% of total
      // quantity (Scale.weightedPercentiles scaladoc: distinct-value
      // compaction then a values-universe window, all-integer)
      graft.operators.Scale.weightedPercentiles(
          t(s, d, "lineitem"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
          floor(col("l_quantity")).cast("long"),
          Seq(50, 90, 99))
        .orderBy(col("pct"))),

    "c84_contiguous_ids" -> ((s, d) =>
      // contiguous 0..n-1 enumeration by doc_id WITHOUT a global
      // single-partition window (Scale.contiguousIds scaladoc: bucketed
      // rank + cumsum'd bucket offsets broadcast back) — the stable
      // sample-id assignment a 100 TB shard writer needs
      graft.operators.Scale.contiguousIds(
          t(s, d, "documents").select(col("doc_id")), "doc_id", bucketWidth = 1024L)
        .orderBy(col("doc_id"))),

    "c85_source_report" -> ((s, d) => {
      // per-source data card — the corpus-governance report: volume,
      // language mix, mean length, and canonical-dup rate per source in
      // ONE pass over (source)-grouped integer aggregates; dup detection
      // reuses c71's canonical 60-bit key (Dedup.canonicalKey), so raw
      // text never shuffles
      t(s, d, "documents")
        .select(col("source"), col("n_chars"),
          (coalesce(col("lang"), lit("")) === "en").cast("long").as("is_en"),
          Dedup.canonicalKey(col("text")).as("ck"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
          sum(col("is_en")).as("en_docs"), countDistinct(col("ck")).as("n_canonical"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          expr("total_chars div n_docs").as("mean_chars"),
          expr("(1000 * en_docs) div n_docs").as("pct_en_milli"),
          expr("(1000 * (n_docs - n_canonical)) div n_docs").as("dup_rate_milli"))
        .orderBy(col("source"))
    }),

    "c83_plan_advisor" -> ((s, d) => {
      // the diagnostics COMPOSED into a decision — what a 100 TB planner
      // does with c81's sketch join size and b81's skew profile before
      // scheduling events ⋈ customer: broadcast if the build side is
      // provably small, salt if the probe key is skewed, else plain SMJ.
      // Every input is a deterministic integer, so the recommendation is
      // engine-reproducible (thresholds in rows/milli-units).
      val audit = graft.functions.CountMin.joinSizeAudit(
        t(s, d, "events").select(col("user_id").cast("string").as("tok")),
        t(s, d, "customer").select(col("c_custkey").cast("string").as("tok")),
        "tok", d = 4, width = 64)
      val skew = graft.operators.Scale.keySkewProfile(
        t(s, d, "events").select(col("user_id")), "user_id")
      audit.crossJoin(broadcast(skew.select(col("skew_milli"))))
        .select(col("na"), col("nb"), col("est_join"), col("skew_milli"),
          when(col("nb") <= 1000000L, lit("broadcast_build_right"))
            .when(col("skew_milli") >= 5000L, lit("salted_smj"))
            .otherwise(lit("smj")).as("strategy"))
    }),

    "c77_e2e_curation" -> ((s, d) => {
      // the operators COMPOSED as a user would run them — the "prepare
      // training shards" pipeline in one lazy plan: (1) canonicalizing
      // dedup keeps each canonical group's min-id representative (c71's
      // key, rank-1 window on the 60-bit hash); (2) a token-count
      // quality band drops fragments (c29's shape); (3) survivors pack
      // greedily into 128-token context windows per hash shard (c68).
      // Every stage is the already-audited plan; composition adds no new
      // shuffle class. Oracle = the same three stages in SQL.
      val punct = ".,!?;:()\"'"
      val canon = array_join(
        filter(split(lower(translate(coalesce(col("text"), lit("")),
          punct, " " * punct.length)), " "), x => x =!= ""), " ")
      val ranked = t(s, d, "documents")
        .select(col("doc_id"), col("text"),
          graft.functions.Text.tokenHash(canon).as("ck"),
          size(graft.functions.Text.tokens(coalesce(col("text"), lit("")))).as("n_tok"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("ck")).orderBy(col("doc_id"))))
      val survivors = ranked
        .where(col("rn") === 1 && col("n_tok").between(20, 500))
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"), col("n_tok"))
      graft.operators.Pipeline.packGreedy(survivors, "doc_id", "n_tok", capacity = 128L)
        .select(col("doc_id"), col("shard"), col("pack"), col("n_tok"))
        .orderBy(col("doc_id"))
    }),

    "c76_top_similar_pairs" -> ((s, d) =>
      // threshold-free "worst near-dups" ranking: top-20 pairs by exact
      // integer milli-jaccard over the memoized shingle index
      // (Dedup.topSimilarPairs scaladoc: co-count kernel + TakeOrdered
      // per-task heaps, no full sort)
      Dedup.topSimilarPairs(docShingleSets(s, d), k = 20)
        .orderBy(col("milli_jaccard").desc, col("a"), col("b"))),

    "c75_cc_stars" -> ((s, d) =>
      // the SAME cluster assignment as c17, by the alternating
      // large-star/small-star edge contraction instead of pointer
      // jumping (Graph.connectedComponentsStars scaladoc) — one CC
      // semantics, two at-scale algorithms against one oracle, the
      // c02/c04/c67 pattern applied to graphs. Memoized c04 pair graph.
      graft.operators.Graph.connectedComponentsStars(docJaccardPairs(s, d))
        .select(col("node").as("doc_id"), col("cluster_rep"))
        .orderBy(col("doc_id"))),

    "c74_embedding_standardize" -> ((s, d) =>
      // per-dimension z-score feature standardization, milli-quantized
      // CSV output (Ann.standardizeEmbeddings scaladoc: exact micro-int
      // stats in any agg order, fixed IEEE order for mu/sigma/z, 64-row
      // stats shuffle + broadcast-back narrow apply)
      graft.operators.Ann.standardizeEmbeddings(
          t(s, d, "embeddings"), "vec_id", "embedding")
        .orderBy(col("vec_id"))),

    "c72_embedding_decontam" -> ((s, d) => {
      // semantic decontamination: training vectors flagged when cosine vs
      // ANY eval vector (the modulo-97 held-out slice) reaches 0.35 —
      // catches paraphrased leakage n-gram checks (c25/c34) miss. Exact
      // broadcast check, recall-critical so no LSH
      // (Pipeline.embeddingDecontam scaladoc)
      val emb = t(s, d, "embeddings")
      graft.operators.Pipeline.embeddingDecontam(
          emb.where(pmod(col("vec_id"), lit(97)) =!= 1),
          emb.where(pmod(col("vec_id"), lit(97)) === 1),
          "vec_id", "embedding", threshold = 0.35)
        .select(col("id").as("vec_id"), col("n_hits"))
        .orderBy(col("vec_id"))
    }),

    "c73_vocab_growth" -> ((s, d) => {
      // Heaps-law vocabulary growth: distinct tokens first seen within
      // the first N docs, at power-of-2 checkpoints — the corpus
      // diversity diagnostic (a flattening curve = diminishing new
      // content). One vocab agg keyed on the 60-bit token hash (never
      // the token string), then an 8-way explode of the vocab-sized
      // frame only
      val firstSeen = t(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.functions.Text.tokens(coalesce(col("text"), lit("")))).as("tok"))
        .select(col("doc_id"), graft.functions.Text.tokenHash(col("tok")).as("th"))
        .groupBy(col("th")).agg(min(col("doc_id")).as("first_doc"))
      val cps = Seq(64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L)
      firstSeen
        .select(explode(array(cps.map(lit(_)): _*)).as("checkpoint"), col("first_doc"))
        .where(col("first_doc") < col("checkpoint"))
        .groupBy(col("checkpoint")).agg(count(lit(1)).as("vocab"))
        .orderBy(col("checkpoint"))
    }),

    "c71_canonical_dedup" -> ((s, d) =>
      // normalization-aware exact dedup (lowercase + punctuation map +
      // empty-token drop, grouped on the canonical 60-bit hash — never on
      // raw text); n_variants counts distinct raw texts merged per group
      // (Dedup.canonicalExact scaladoc)
      Dedup.canonicalExact(t(s, d, "documents"), "doc_id", "text")
        .select(col("rep_id"), col("n_dups"), col("n_variants"))
        .orderBy(col("rep_id"))),

    "c70_cdc_chunks" -> ((s, d) =>
      // content-defined chunking dedup: variable chunks cut at rolling-
      // hash boundaries (insert-shift-proof, unlike fixed strides), chunk
      // identity = 60-bit hash of the chunk's ordered hash sequence,
      // per-doc dup-chunk stats (Dedup.cdcChunkDedup scaladoc: one
      // doc-id shuffle serves window + chunk agg, cross-doc agg on the
      // uniform chunk hash — linear, nothing pairwise)
      Dedup.cdcChunkDedup(t(s, d, "documents"), "doc_id", "text",
          w = 2, gearMod = 8)
        .select(col("id").as("doc_id"), col("n_chunks"), col("dup_chunks"),
          col("dup_tokens"))
        .orderBy(col("doc_id"))),

    "c69_source_keyness" -> ((s, d) =>
      // per-source over/under-represented tokens (one-cell chi-square vs
      // the corpus rate): the source-drift diagnostic before mixing.
      // Exact-long dev output; chi2 ranking doubles are bit-identical
      // across engines by the documented two-op IEEE order
      // (Pipeline.sourceKeyness scaladoc)
      graft.operators.Pipeline.sourceKeyness(
          t(s, d, "documents"), "source", "text", topK = 5)
        .orderBy(col("source"), col("rnk"))),

    "c68_pack_sequences" -> ((s, d) => {
      // greedy whole-doc packing into 128-token context windows, 8 hash
      // shards as the parallelism unit (Pipeline.packGreedy scaladoc:
      // sequential fold per shard, one exchange, O(1) state) — the
      // pretraining batch-packing step; c24 is the contiguous
      // token-budget variant that splits docs, this one never does
      val docs = t(s, d, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
          size(graft.functions.Text.tokens(coalesce(col("text"), lit("")))).as("n_tok"))
      graft.operators.Pipeline.packGreedy(docs, "doc_id", "n_tok", capacity = 128L)
        .select(col("doc_id"), col("shard"), col("pack"), col("n_tok"))
        .orderBy(col("doc_id"))
    }),

    "c67_prefix_jaccard" -> ((s, d) =>
      // SAME result set as c04 (all pairs with shingle-jaccard ≥ 0.8) via
      // the PPJoin prefix filter instead of the full inverted index: only
      // each doc's rarest-first (1−t)-prefix is indexed, so the candidate
      // join touches ~5× fewer postings and needs no hot-shingle cap for
      // exactness (Dedup.prefixJaccardPairsOf scaladoc has the pigeonhole
      // argument). Shares the memoized shingle index with c02/c04.
      Dedup.prefixJaccardPairsOf(docShingleSets(s, d), tNum = 4, tDen = 5)
        .orderBy(col("a"), col("b"))),

    "c66_kcore" -> ((s, d) =>
      // 2-core of the near-dup graph, 4 peel rounds: strips docs attached
      // to a dup community by a single borderline pair — the cohesion
      // filter above triangles (c62); bounded-round contract per
      // Graph.kCoreApprox scaladoc, memoized c04 pair graph
      graft.operators.Graph.kCoreApprox(docJaccardPairs(s, d), k = 2, rounds = 4)
        .orderBy(col("node"))),

    "c65_sorted_neighborhood" -> ((s, d) =>
      // sorted-neighborhood (merge/purge) near-dup discovery: rank the
      // corpus by its bottom-1 shingle sketch, compare each doc with its
      // 8 rank-successors, verify by exact jaccard — the windowed-sort
      // blocking alternative to banded LSH (Dedup.sortedNeighborhoodPairs
      // scaladoc: measured 28/28 recall at window=4 on sf0.001; two-phase
      // distributed rank, band equi-join, no global window).
      Dedup.sortedNeighborhoodPairs(t(s, d, "documents"), "doc_id", "text",
          window = 8, threshold = 0.8)
        .orderBy(col("a"), col("b"))),

    "c59_pq_encode" -> ((s, d) =>
      // product quantization over the embedding store: 4 sub-codebooks of
      // 16 codewords (the first-16-vectors convention), codes + the ADC
      // squared distance to query vec 0 — integer-exact end to end (see
      // Ann.pqEncode scaladoc). Zero-shuffle narrow-map encode; ~64×
      // smaller search structure than the float column. Completes the ANN
      // compression family: c38 int8 (flat), c59 PQ (codebook), c39 the
      // rerank cascade that consumes such codes.
      graft.operators.Ann.pqEncode(t(s, d, "embeddings"), "vec_id", "embedding")
        .orderBy(col("vec_id"))),

    "c60_pq_adc_rerank" -> ((s, d) => {
      // the PQ SEARCH cascade c59's codes exist for: coarse pass ranks
      // the whole corpus by integer ADC distance (reads only the 4-code
      // column at rest — the 64×-smaller structure), cuts to 100
      // candidates via TakeOrderedAndProject (per-partition heaps), and
      // only survivors fetch their float vectors for the exact cosine
      // rerank (c06 rounded-cosine pattern, c39 cascade shape). Coarse
      // stage is the zero-shuffle c59 narrow map + top-k; rerank touches
      // 100 rows. Integer ADC + 6dp-rounded per-row cosine keep every
      // compared value engine-exact.
      val emb = t(s, d, "embeddings")
      val coarse = graft.operators.Ann.pqEncode(emb, "vec_id", "embedding")
        .where(col("vec_id") =!= 0)
        .orderBy(col("adc_micro2").asc, col("vec_id").asc).limit(100)
        .select(col("vec_id"), col("adc_micro2"))
      val qv = broadcast(emb.where(col("vec_id") === 0)
        .select(col("embedding").as("qv")))
      emb.join(broadcast(coarse), Seq("vec_id"))
        .crossJoin(qv)
        .select(col("vec_id"), col("adc_micro2"),
          Similarity.cosineRounded(col("embedding"), col("qv")).as("cos"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id"))))
        .orderBy(col("rank"))
    }),

    "c58_bigram_lm_score" -> ((s, d) => {
      // bigram language-model quality scoring: per doc,
      // Σ over bigram positions of floor(log2 c(w1·)) − floor(log2 c(w1 w2))
      // — the integer-exact quantization of Σ −log2 P(w2|w1), a count-based
      // LM surprisal (KenLM-style scoring without a trained model; c54's
      // floor-log2 = binary-string-length trick, no float log anywhere).
      // High = improbable word transitions (garbage/boilerplate-stitched
      // text), low = formulaic. c(w1·) counts w1 as bigram-FIRST, so the
      // conditional is a true probability (Σ_w2 c(w1 w2) = c(w1·)).
      // Plan: bigram positions shuffle ONCE on (w1,w2) for the lookup
      // join; the lookup itself is vocab²-bounded (c2 ⋈ c1 on w1, both
      // partial-aggregated); final per-doc sum shuffles on doc_id. At
      // 100 TB the head of the bigram vocabulary broadcasts and the
      // position table would be cached at ingest (three scans here).
      val pairs = docBigramsWithSource(s, d).drop("source")
      val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val lk = c2.join(c1, Seq("w1"))
        .select(col("w1"), col("w2"),
          (length(conv(col("c1"), 10, 2)) - length(conv(col("c2"), 10, 2))).as("surp"))
      pairs.join(lk, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("surp")).cast("long").as("surprisal_sum"))
        .orderBy(col("doc_id"))
    }),

    "c54_token_rarity" -> ((s, d) => {
      // token-rarity quality signal: per doc, Σ floor(log2(corpus tf))
      // over its tokens — a low sum flags documents built from rare or
      // garbage tokens (the integer-exact cousin of unigram log-prob
      // scoring; floor(log2 n) = len(binary(n))−1, identical string
      // arithmetic in both engines, no float log anywhere). The classic
      // frequency join: corpus tf is vocab-sized (shuffle on token),
      // then one partial+final per-doc aggregate. At 100 TB the head of
      // the vocabulary broadcasts and only the long tail hash-joins.
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      toks.join(tf, Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(length(conv(col("tf"), 10, 2)) - 1).as("log_tf_sum"))
        .orderBy(col("doc_id"))
    }),

    "c53_soft_dedup_weights" -> ((s, d) => {
      // duplicate-aware training weights: instead of DROPPING near-dups
      // (c18's keep-one), keep every doc and down-weight each cluster
      // member to 1/k (integer ppm, floor div) so a 10-way duplicate
      // contributes one document's worth of gradient in aggregate — the
      // soft-dedup loss weighting. Two tiny aggregations + one join over
      // the memoized c17 cluster labels.
      val m = docClusters(s, d)
      val sizes = m.groupBy(col("cluster_rep")).agg(count(lit(1)).as("k"))
      m.join(sizes, Seq("cluster_rep"))
        .select(col("id").as("doc_id"), col("k"),
          expr("1000000L div k").as("weight_ppm"))
        .orderBy(col("doc_id"))
    }),

    "c52_minhash_calibration" -> ((s, d) =>
      // sketch-quality-as-columns (the b18/c42 pattern for minhash):
      // per exact near-dup pair, exact |∩|/|∪| NEXT TO the 64-perm
      // signature agreement — the estimator and its ground truth in one
      // hash-checked row. See Dedup.jaccardCalibration.
      Dedup.jaccardCalibration(docShingleSets(s, d), threshold = 0.8)
        .orderBy(col("a"), col("b"))),

    "c51_dedup_report" -> ((s, d) =>
      // dedup impact report: for each near-dup cluster size k, how many
      // clusters exist and how many docs a keep-one policy removes
      // (k−1 per cluster) — the ops-facing summary of a dedup pass.
      // Pure reuse of the memoized c17 cluster labels; two tiny
      // aggregations on top.
      docClusters(s, d)
        .groupBy(col("cluster_rep")).agg(count(lit(1)).as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("k") - 1).as("docs_removed"))
        .orderBy(col("k"))),

    "c50_span_novelty" -> ((s, d) =>
      // daily-ingest gate: per batch doc (the c25-style doc_id%10==7
      // split), how many span positions carry a span the corpus has
      // never seen — re-crawls and boilerplate ingests show ~0 novelty
      // and drop out before paying full pipeline cost. Corpus is
      // scanned+hashed once, never self-paired; batch anti-joins the
      // distinct-hash index. See Dedup.spanNovelty.
      Dedup.spanNovelty(t(s, d, "documents"), "doc_id", "text",
          isNew = pmod(col("doc_id"), lit(10)) === 7, spanN = 5)
        .select(col("id").as("doc_id"), col("n_spans"), col("novel_spans"))
        .orderBy(col("doc_id"))),

    "c46_bigrams" -> ((s, d) =>
      // exact corpus-level top-50 adjacent-token bigram counts — the
      // collocation table a tokenizer-merge (BPE) or stopword analysis
      // starts from, next to c13's per-doc tf and c42's sketched
      // heavy hitters. Positional spans (NOT per-doc distinct: corpus
      // frequency needs every occurrence). One groupBy with map-side
      // partial aggregation, then TakeOrdered for the top-k — no full
      // sort; ties broken by the bigram text for a total order.
      t(s, d, "documents")
        .select(explode(Text.spanStrings(col("text"), 2)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("bigram"))
        .limit(50)),

    "c42_count_min" -> ((s, d) => {
      // count-min sketch (4 × 256 cells) over all document tokens,
      // point-estimates for the exact top-20 — the deterministic md5
      // construction makes the one-sided guarantee (est ≥ tf, always)
      // a hash-checked column, not a unit-test claim
      val toks = t(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("tok"))
      val sketch = graft.functions.CountMin.build(toks, "tok", d = 4, width = 256)
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("tok")).limit(20)
      graft.functions.CountMin.estimate(sketch, top, "tok", d = 4, width = 256)
        .join(top, Seq("tok"))
        .select(col("tok"), col("tf"), col("est"), (col("est") >= col("tf")).as("ok"))
        .orderBy(col("tf").desc, col("tok"))
    }),

    "c40_cluster_centroids" -> ((s, d) =>
      // exact nano-integer centroid of every c20 semantic-dedup cluster —
      // the reproducible codebook-update step (see Ann.clusterCentroidsExact);
      // reuses the memoized cosine pair graph, so no second pairwise pass
      Ann.clusterCentroidsExact(
          Dedup.clusters(
            embeddingPairGraph(s, d).where(col("cos") >= 0.42).select(col("a"), col("b"))),
          t(s, d, "embeddings"), "vec_id", "embedding")
        .orderBy(col("cluster_rep"), col("pos"))),

    "c16_repetition" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.repetitionRatio(Text.tokens(col("text")), 2).as("rep2"),
          Text.repetitionRatio(Text.tokens(col("text")), 3).as("rep3"))
        .orderBy(col("doc_id"))),

    "c13_term_freq" -> ((s, d) =>
      // corpus term frequency (SURVEY.md §2C "tf = explode + groupBy"):
      // one shuffle on the token (map-side partial counts first), top-100
      // with deterministic tiebreak.
      t(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("tok"))
        .limit(100)),

    "c14_mm_join" -> ((s, d) =>
      // multimodal columns: documents joined to their embedding vectors
      // (documents.doc_id ↔ embeddings.vec_id); array<float> is first-class,
      // text stats and vector stats in one row.
      t(s, d, "documents")
        .join(t(s, d, "embeddings"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("label"),
          size(col("embedding")).cast("long").as("dim"))
        .orderBy(col("doc_id"))),

    "c15_frame_sample" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("payload", col("text").cast("binary"))
      Multimodal.sampleFrames(docs, "doc_id", "payload", k = 4)
        .select(col("media_id"), col("frame_idx"),
          col("features.n_bytes").as("n_bytes"), col("features.byte_sum").as("byte_sum"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    "c21_mm_resize" -> ((s, d) => {
      // media resize stage: nearest-neighbor byte downsample to ≤64 bytes
      // (codec stubbed like c12; the narrow binary-in/binary-out plumbing
      // is the real distributed shape)
      val docs = t(s, d, "documents").withColumn("payload", col("text").cast("binary"))
      Multimodal.resize(docs, "doc_id", "payload", target = 64)
        .select(col("media_id"), col("n_bytes"), col("r_bytes"), col("r_sum"))
        .orderBy(col("media_id"))
    }),

    "c12_multimodal" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("payload", col("text").cast("binary"))
      Multimodal.extractFeatures(docs, "doc_id", "payload")
        .select(col("media_id"),
          col("features.n_bytes").as("n_bytes"), col("features.byte_sum").as("byte_sum"),
          col("features.h0").as("h0"), col("features.h1").as("h1"),
          col("features.h2").as("h2"), col("features.h3").as("h3"))
        .orderBy(col("media_id"))
    }),

    "c30_redact" -> ((s, d) =>
      // PII scrub stage over the event props payload (the one testdata
      // column with digit runs): emails → <EMAIL>, digit runs → <NUM>.
      // Byte-exact against the oracle's RE2 'g'-mode regexp_replace.
      t(s, d, "events")
        .select(col("event_id"), Text.redact(col("props")).as("props_scrubbed"))
        .orderBy(col("event_id"))),

    "c32_chunking" -> ((s, d) =>
      // pretokenization relayout: 64-token chunks, 8-token overlap
      // (stride 56); short docs yield exactly one chunk
      Pipeline.chunk(t(s, d, "documents"), "doc_id", "text",
          sizeTokens = 64, overlap = 8)
        .select(col("id").as("doc_id"), col("chunk_idx"),
          col("chunk_text"), col("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    "c31_embedding_lsh_pairs" -> ((s, d) =>
      // The 100 TB route for c05: banded hyperplane-LSH candidates + exact
      // cosine verify (sub-quadratic, no BNLJ). bits=4/tables=16 targets
      // ~0.9 expected recall at the demo threshold 0.35; recall measured vs
      // exact c05 in docs/PLANS.md. At real near-dup thresholds (≥0.8) the
      // same machinery runs with bits=8+ and a far smaller candidate space.
      Dedup.embeddingLshPairs(t(s, d, "embeddings"), "vec_id", "embedding",
          threshold = 0.35, dim = 64, bits = 4, tables = 16)
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))),

    "c33_target_mix" -> ((s, d) =>
      // data-recipe rebalancing: downsample-only water-filling to a target
      // language mix (40/20/20/10/10), deterministic md5 sampling; the
      // per-stratum ppm rate is part of the output so the mix math itself
      // is oracle-checked
      Pipeline.targetMix(
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "doc_id", "n_chars",
          Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1, "zh" -> 0.1))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("ppm"))
        .orderBy(col("doc_id"))),

    "c34_bloom_decontaminate" -> ((s, d) =>
      // exact 5-gram train/eval decontamination behind a Bloom prefilter:
      // the bitmap (scalar subquery) drops non-member shingles before the
      // verify join's shuffle; no false negatives ⇒ result is exactly the
      // semi-join, which is what the oracle computes. 5-gram shingles (not
      // the shared 3-gram dedup index) so a hit means copied text, not a
      // common phrase.
      Pipeline.bloomContaminated(
          Dedup.shingleSets(t(s, d, "documents"), "doc_id", "text", shingleN = 5),
          pmod(col("id"), lit(10)) === 7)
        .select(col("id").as("doc_id"))
        .orderBy(col("doc_id"))),

    "c35_source_reputation" -> ((s, d) =>
      // domain-level curation: drop every document from sources whose MEAN
      // quality is below 0.395 (cutoff sits in a clear gap between source
      // means at the test SFs); integer-exact end-to-end — pure-rational
      // nano score (no round() on doubles), long sums, integer gate — so
      // the result is bit-identical in any engine, any DuckDB version.
      // NULL text scores as '' (one empty token → qn=5e8) on BOTH sides:
      // Spark split(""," ") ≡ DuckDB string_split('',' ') ≡ [''] — keeps a
      // NULL-text doc in src_docs AND in sum(qn) identically.
      Pipeline.sourceReputation(t(s, d, "documents"), "source", "doc_id",
          Text.qualityScoreNano(coalesce(col("text"), lit(""))), minMeanNano = 395000000L)
        .orderBy(col("doc_id"))),

    "c36_incremental_dedup" -> ((s, d) =>
      // daily-ingest dedup: near-dups of a new batch (doc_id % 10 = 3)
      // against the corpus + within the batch, candidates ∝ batch size,
      // corpus never self-paired or shuffled; reuses the persisted shingle
      // index; exact-verified ⇒ oracle = exact jaccard restricted to
      // batch-touching pairs
      Dedup.incrementalMinhashPairs(docShingleSets(s, d),
          pmod(col("id"), lit(10)) === 3)
        .orderBy(col("a"), col("b"))),

    "c37_stream_dedup_parity" -> ((s, d) =>
      // batch parity for the STREAMING near-dup detector: the same
      // minhash signature-agreement criterion the stream checks in-state
      // (n_agree >= 45 ⇔ est ≥ 0.7 exactly in IEEE doubles), arrival
      // fixed to id order so the directed result is oracle-checkable;
      // StreamingSpec asserts this query's semantics equal the live
      // transformWithState operator's collected output
      Dedup.signatureAgreementPairs(docShingleSets(s, d))
        .orderBy(col("doc_id"), col("dup_of"))),

    "c120_stream_neardup_live" -> ((s, d) =>
      // the exactly-once candidate readout a consumer MATERIALIZES from
      // the streaming minhash-LSH detector (the r16 graduation of the
      // r5 library-only surface, the b122 pattern): DISTINCT undirected
      // pairs with the stream's own emitted estimate est = n_agree/64
      // (exact in IEEE doubles — 64 = 2^6, so every value is a dyadic
      // rational both engines represent bit-identically). Direction is
      // normalized to a < b because within one micro-batch the
      // detector's emit direction follows undefined row order (the
      // scaladoc's documented consumer step is exactly this DISTINCT
      // normalization); c37 remains the directed arrival-order variant.
      // StreamingSpec drains the LIVE transformWithState detector over
      // THIS table at sf0.001 and asserts set equality with this key's
      // rows — so the driver gate + the spec together cover the
      // streaming operator end to end. Plan: identical to c37's audited
      // shape (banded self-join with the maxBucket hot-tower cap; no
      // all-pairs anywhere) plus one narrow projection.
      Dedup.signatureAgreementPairs(docShingleSets(s, d))
        .select(col("dup_of").as("a"), col("doc_id").as("b"),
          (col("n_agree") / lit(64.0)).as("est"))
        .orderBy(col("a"), col("b"))),

    "c38_embedding_quantize" -> ((s, d) =>
      // at-rest int8 compression for the embedding store: max-abs scaling,
      // round-half-up via floor (bit-exact IEEE in every engine — never
      // round()), reconstruction cosine bound-checked as a boolean. The
      // int8 codes travel to the gate as one CSV string per vector: the
      // driver's compare sorts/hashes pandas cells, and an array-typed
      // cell is unhashable there (the r5 c38 failure) — same codes, flat
      // representation.
      graft.operators.Ann.quantizeInt8(t(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          concat_ws(",", transform(col("q"), _.cast("string"))).as("q_csv"),
          col("recon_ok"))
        .orderBy(col("vec_id"))))

  private[graft] val cOracles: Map[String, String] = Map(
    "c60_pq_adc_rerank" ->
      // coarse = pq top-100 by integer ADC; rerank = c06's 6dp rounded
      // cosine over the 100 survivors only
      (pqCte + """,
        |coarse AS (SELECT vec_id, adc_micro2 FROM pq WHERE vec_id <> 0
        |           ORDER BY adc_micro2, vec_id LIMIT 100),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |rr AS (SELECT c.vec_id, c.adc_micro2,
        |         round(list_cosine_similarity(CAST(e2.embedding AS DOUBLE[]), q.qv), 6) AS cos
        |       FROM coarse c JOIN embeddings e2 ON e2.vec_id = c.vec_id, qv q)
        |SELECT vec_id, adc_micro2, cos,
        |  CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
        |FROM rr ORDER BY rank""".stripMargin),
    "c32_chunking" ->
      // same arithmetic: stride 56, size 64; 1-based inclusive list slice
      // == Spark's slice(start, length) incl. end-clamping; short/empty
      // docs produce one chunk via greatest(1, ...)
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, toks,
        |        greatest(1, CAST(ceil((len(toks) - 8)::DOUBLE / 56) AS BIGINT)) AS nch FROM t),
        |x AS (SELECT doc_id, toks, unnest(range(0, nch)) AS i FROM n)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |  array_to_string(toks[(i*56+1):(i*56+64)], ' ') AS chunk_text,
        |  CAST(len(toks[(i*56+1):(i*56+64)]) AS INTEGER) AS n_tokens
        |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,
    "c31_embedding_lsh_pairs" ->
      // Replicates the md5-plane construction (Ann.hyperplane) exactly:
      // plane j component k = +1 iff first byte of md5('j:k') < 0x80;
      // table = j // 4, local bit = j % 4. Candidates = same (table,
      // bucket); verify = exact cosine ≥ 0.35 on candidates only.
      """WITH hp AS (
        |  SELECT j, list(CASE WHEN ('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 2))::INTEGER < 128
        |                 THEN 1.0 ELSE -1.0 END ORDER BY k) AS hvec
        |  FROM generate_series(0,63) t1(j), generate_series(0,63) t2(k)
        |  GROUP BY j),
        |sig AS (
        |  SELECT e.vec_id, (hp.j // 4) AS tbl,
        |    CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), hp.hvec) >= 0
        |             THEN (1::BIGINT << (hp.j % 4)) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM embeddings e, hp
        |  GROUP BY e.vec_id, (hp.j // 4)),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        |  FROM sig x JOIN sig y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
        |SELECT c.a, c.b
        |FROM cand c
        |JOIN embeddings ea ON ea.vec_id = c.a
        |JOIN embeddings eb ON eb.vec_id = c.b
        |WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) >= 0.35
        |ORDER BY a, b""".stripMargin,
    "c30_redact" ->
      """SELECT event_id,
        |  regexp_replace(regexp_replace(props,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS props_scrubbed
        |FROM events ORDER BY event_id""".stripMargin,
    "c01_dedup_exact" ->
      """SELECT min(doc_id) AS rep_id, count(*) AS n_dups FROM documents
        |GROUP BY text ORDER BY rep_id""".stripMargin,
    "c33_target_mix" ->
      // Same water-filling arithmetic, SAME IEEE op order as
      // Pipeline.targetMix: cap = w/t, T = min(cap),
      // ppm = floor(((t*T)/w)*1e6); md5 bucketing as in c23.
      """WITH a AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS w FROM documents GROUP BY lang),
        |tgt(lang, t) AS (VALUES ('en', 0.4), ('de', 0.2), ('fr', 0.2), ('es', 0.1), ('zh', 0.1)),
        |j AS (SELECT a.lang, a.w, tgt.t, CAST(a.w AS DOUBLE) / tgt.t AS cap
        |      FROM a JOIN tgt USING (lang)),
        |r AS (SELECT lang,
        |        CAST(floor(t * (SELECT min(cap) FROM j) / CAST(w AS DOUBLE) * 1000000.0) AS BIGINT) AS ppm
        |      FROM j)
        |SELECT d.doc_id, d.lang, d.n_chars, r.ppm
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 < r.ppm
        |ORDER BY d.doc_id""".stripMargin,
    "c34_bloom_decontaminate" ->
      // The Bloom prefilter is transparent (no false negatives): the exact
      // answer is the plain 5-gram semi-join, which is what this computes.
      """WITH t5 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-4),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS sh
        |      FROM t5 WHERE len(t) >= 5),
        |e AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 10 = 7),
        |tr AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 10 != 7)
        |SELECT DISTINCT tr.doc_id FROM tr JOIN e USING (g) ORDER BY doc_id""".stripMargin,
    "c35_source_reputation" ->
      // integer-exact mirror of Text.qualityScoreNano: score is the
      // rational (50d + 20s + 3*min(L,10n)) / (100n) in integer counts,
      // so round-half-up nanos = (num*1e9 + 50n) // (100n) in pure BIGINT
      // arithmetic — no doubles, no round(). Counts come from unnest +
      // GROUP BY (count / count DISTINCT / sum CASE — primitives with one
      // possible semantics in any engine version), NOT list lambdas: the
      // r5 driver DuckDB disagreed with both Spark and DuckDB 1.0.0 on a
      // list-kernel score sum while agreeing on every gated row. The
      // output likewise exposes the gate decision, not the score sum.
      // COALESCE keeps a NULL-text document as one empty-token row so it
      // still reaches the per-source count(*) — unnest of an empty-less
      // list would drop the doc and diverge from Spark's src_docs.
      """WITH tok AS (
        |  SELECT doc_id, source, unnest(string_split(COALESCE(text, ''), ' ')) AS tk
        |  FROM documents),
        |agg AS (
        |  SELECT doc_id, source, count(*) AS n, count(DISTINCT tk) AS d,
        |    sum(CASE WHEN tk IN ('the','a','of','and','to','in','is','it') THEN 1 ELSE 0 END) AS st,
        |    sum(length(tk)) AS l
        |  FROM tok GROUP BY doc_id, source),
        |q AS (
        |  SELECT doc_id, source,
        |    CAST(((50 * d + 20 * st + 3 * least(l, 10 * n)) * 1000000000 + 50 * n)
        |         // (100 * n) AS BIGINT) AS qn
        |  FROM agg),
        |rep AS (
        |  SELECT source, count(*) AS src_docs
        |  FROM q GROUP BY source
        |  HAVING sum(qn) >= 395000000 * count(*))
        |SELECT q.doc_id, q.source, rep.src_docs
        |FROM q JOIN rep USING (source) ORDER BY doc_id""".stripMargin,
    "c36_incremental_dedup" -> (shingleCte +
      """
        |SELECT a.doc_id AS a, b.doc_id AS b
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE (a.doc_id % 10 = 3 OR b.doc_id % 10 = 3)
        |  AND len(list_intersect(a.sh, b.sh)) >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))
        |ORDER BY a, b""".stripMargin),
    // the shared full-minhash chain (EntryShared.sigAgreementCtes);
    // criterion = signature agreement on ≥ 45/64 permutations
    "c37_stream_dedup_parity" ->
      (sigAgreementCtes + """
        |SELECT b AS doc_id, a AS dup_of, CAST(n_agree AS INTEGER) AS n_agree
        |FROM pair WHERE n_agree >= 45 ORDER BY doc_id, dup_of""".stripMargin),
    // same chain, the stream consumer's undirected readout: est =
    // n_agree/64.0 is a dyadic rational — bit-identical in both engines
    "c120_stream_neardup_live" ->
      (sigAgreementCtes + """
        |SELECT a, b, n_agree / 64.0 AS est
        |FROM pair WHERE n_agree >= 45 ORDER BY a, b""".stripMargin),
    "c38_embedding_quantize" ->
      // identical arithmetic: scale = 127/max|v| (one IEEE division),
      // q = floor(v*scale + 0.5) (exact), dequant = q/scale; the cosine
      // round-trip check is a boolean bound so summation order is free
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
        |sc AS (SELECT vec_id, v, mx,
        |        CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale FROM m),
        |qz AS (SELECT vec_id, v, mx, scale,
        |        list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INTEGER)) AS q FROM sc),
        |dq AS (SELECT vec_id, v, mx, scale, q,
        |        list_transform(q, x -> CASE WHEN scale > 0 THEN x / scale ELSE 0.0 END) AS d FROM qz)
        |SELECT vec_id, scale, array_to_string(q, ',') AS q_csv,
        |  CASE WHEN mx = 0 THEN TRUE
        |       ELSE list_inner_product(v, d)
        |            / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(d, d))) >= 0.995
        |  END AS recon_ok
        |FROM dq ORDER BY vec_id""".stripMargin,
    "c02_dedup_minhash" -> jaccardPairsSql,
    "c03_dedup_simhash" ->
      // 64-bit token hash taken as two positive 32-bit md5 halves (a single
      // 16-hex-char parse can overflow signed BIGINT); the signature is
      // likewise assembled and XOR-compared per half, so no value anywhere
      // exceeds 2^32 — engine-portable with full 64-bit semantics.
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS hhi,
        |    CAST(('0x' || substring(md5(tok), 9, 8)) AS BIGINT) AS hlo
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN ((CASE WHEN j < 32 THEN hlo >> j ELSE hhi >> (j - 32) END) & 1) = 1
        |        THEN 1 ELSE -1 END) AS vote
        |  FROM h CROSS JOIN generate_series(0, 63) g(j) GROUP BY doc_id, j),
        |sh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN vote > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS lo,
        |    sum(CASE WHEN vote > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS hi
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        |ORDER BY a, b""".stripMargin,
    "c04_ngram_jaccard" -> jaccardPairsSql,
    // c67 = the same pair set as c04, derived by prefix filtering — one
    // semantic, three engines-worth of algorithms (c02 minhash approx,
    // c04 inverted index, c67 prefix filter) against one exact oracle
    "c67_prefix_jaccard" -> jaccardPairsSql,
    // same micro-int stats, same two-step IEEE order (mu = s/n;
    // var = ss/n - mu*mu; z = (m-mu)/sd), same milli round-half-up;
    // dim is 1-based here vs 0-based in Spark but is only an
    // engine-local join/order key, never output
    "c74_embedding_standardize" ->
      """WITH e AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |             x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS m FROM embeddings),
        |p AS (SELECT vec_id, unnest(list_transform(generate_series(1, len(m)),
        |        i -> struct_pack(dim := i, mv := m[i]))) AS s FROM e),
        |q AS (SELECT vec_id, s.dim AS dim, s.mv AS mv FROM p),
        |st AS (SELECT dim, count(*) AS n, CAST(sum(mv) AS BIGINT) AS sm,
        |         CAST(sum(mv * mv) AS BIGINT) AS ss FROM q GROUP BY dim),
        |sd AS (SELECT dim, CAST(sm AS DOUBLE) / n AS mu,
        |         sqrt(CAST(ss AS DOUBLE) / n
        |           - (CAST(sm AS DOUBLE) / n) * (CAST(sm AS DOUBLE) / n)) AS sd
        |       FROM st),
        |z AS (SELECT q.vec_id, q.dim,
        |        CASE WHEN sd.sd = 0 THEN 0
        |             ELSE CAST(floor(1000 * ((CAST(q.mv AS DOUBLE) - sd.mu) / sd.sd) + 0.5) AS BIGINT)
        |        END AS zv
        |      FROM q JOIN sd USING (dim))
        |SELECT vec_id, string_agg(CAST(zv AS VARCHAR), ',' ORDER BY dim) AS z_csv
        |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // same split, same rounding convention as c05's cosine oracle
    "c72_embedding_decontam" ->
      """WITH ev AS (SELECT vec_id AS eid, embedding AS ev FROM embeddings WHERE vec_id % 97 = 1),
        |tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 != 1)
        |SELECT tr.vec_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM tr JOIN ev ON round(list_cosine_similarity(
        |  CAST(tr.embedding AS DOUBLE[]), CAST(ev.ev AS DOUBLE[])), 6) >= 0.35
        |GROUP BY tr.vec_id ORDER BY vec_id""".stripMargin,

    // same 60-bit hash vocabulary (both engines count hashes, so even a
    // collision counts identically), same strict first_doc < checkpoint
    "c73_vocab_growth" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok
        |            FROM documents),
        |fs AS (SELECT CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS th,
        |         min(doc_id) AS first_doc FROM tk GROUP BY 1),
        |cp AS (SELECT unnest([64, 128, 256, 512, 1024, 2048, 4096, 8192]) AS checkpoint)
        |SELECT CAST(checkpoint AS BIGINT) AS checkpoint, CAST(count(*) AS BIGINT) AS vocab
        |FROM fs JOIN cp ON fs.first_doc < cp.checkpoint
        |GROUP BY 1 ORDER BY checkpoint""".stripMargin,

    // same md5 bucket rule ('r:tok' 60-bit mod width) — exact cell grid
    "c78_stream_cms_parity" ->
      """WITH tk AS (SELECT CAST(user_id AS VARCHAR) AS tok FROM events),
        |x AS (SELECT CAST(g.r AS INTEGER) AS r,
        |        CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket
        |      FROM tk CROSS JOIN generate_series(0, 3) g(r))
        |SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM x GROUP BY r, bucket ORDER BY r, bucket""".stripMargin,

    // same cells as c78; est = min_r Σ_b cell², exact = Σ f² — both exact
    // integers, so the audit booleans are engine-trivial
    "c79_cms_join_size" ->
      """WITH tk AS (SELECT CAST(user_id AS VARCHAR) AS tok FROM events),
        |cells AS (SELECT g.r AS r,
        |    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM tk CROSS JOIN generate_series(0, 3) g(r) GROUP BY 1, 2),
        |re AS (SELECT r, CAST(sum(cnt * cnt) AS BIGINT) AS row_est FROM cells GROUP BY r),
        |es AS (SELECT min(row_est) AS est_f2 FROM re),
        |ex AS (SELECT CAST(sum(c) AS BIGINT) AS n_toks, CAST(sum(c * c) AS BIGINT) AS exact_f2
        |       FROM (SELECT count(*) AS c FROM tk GROUP BY tok))
        |SELECT n_toks, exact_f2, est_f2, est_f2 >= exact_f2 AS one_sided_ok,
        |  (est_f2 - exact_f2) * 64 <= 4 * n_toks * n_toks AS bound_ok
        |FROM ex, es""".stripMargin,

    // exact counts + literal TRUE for the theorem-guaranteed audit bits
    // (capture and error bound hold at ANY merge order — Folds.MisraGries)
    "b80_heavy_hitters" ->
      """WITH dl AS (SELECT coalesce(lang, '') AS lang FROM documents),
        |n AS (SELECT count(*) AS nn FROM dl)
        |SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        |  (count(*) * 3 > n.nn) AS is_heavy,
        |  TRUE AS captured, TRUE AS bound_ok
        |FROM dl, n GROUP BY lang, n.nn ORDER BY lang""".stripMargin,

    // same micro-quantization (c74's grid) and the same md5 sign rule:
    // sign(j,i) = 1 - 2*bit_{i mod 30}(md5_60('jl:j:' || i//30))
    "c80_jl_projection" ->
      """WITH x AS (SELECT vec_id, g.i AS i,
        |    CAST(floor(CAST(embedding[g.i + 1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS q
        |  FROM embeddings CROSS JOIN generate_series(0, 63) g(i)),
        |s AS (SELECT gj.j AS j, gi.i AS i,
        |    1 - 2 * ((CAST(('0x' || substring(md5('jl:' || CAST(gj.j AS VARCHAR) || ':' ||
        |        CAST((gi.i // 30) AS VARCHAR)), 1, 15)) AS BIGINT)
        |      >> CAST((gi.i % 30) AS INTEGER)) & 1) AS sgn
        |  FROM generate_series(0, 15) gj(j) CROSS JOIN generate_series(0, 63) gi(i))
        |SELECT x.vec_id, CAST(s.j AS INTEGER) AS j, CAST(sum(s.sgn * x.q) AS BIGINT) AS y
        |FROM x JOIN s ON x.i = s.i GROUP BY 1, 2 ORDER BY vec_id, j""".stripMargin,

    // inner product of the two cell grids, same md5 bucket rule
    "c81_cms_join_size_2t" ->
      """WITH ta AS (SELECT CAST(user_id AS VARCHAR) AS tok FROM events),
        |tb AS (SELECT CAST(c_custkey AS VARCHAR) AS tok FROM customer),
        |ca AS (SELECT g.r AS r,
        |    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS ca
        |  FROM ta CROSS JOIN generate_series(0, 3) g(r) GROUP BY 1, 2),
        |cb AS (SELECT g.r AS r,
        |    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cb
        |  FROM tb CROSS JOIN generate_series(0, 3) g(r) GROUP BY 1, 2),
        |re AS (SELECT ca.r, CAST(sum(ca.ca * cb.cb) AS BIGINT) AS row_est
        |       FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket GROUP BY 1),
        |es AS (SELECT min(row_est) AS est_join FROM re),
        |fa AS (SELECT tok, count(*) AS fa FROM ta GROUP BY 1),
        |fb AS (SELECT tok, count(*) AS fb FROM tb GROUP BY 1),
        |ex AS (SELECT CAST(coalesce(sum(fa.fa * fb.fb), 0) AS BIGINT) AS exact_join
        |       FROM fa JOIN fb ON fa.tok = fb.tok),
        |sa AS (SELECT CAST(count(*) AS BIGINT) AS na FROM ta),
        |sb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM tb)
        |SELECT na, nb, exact_join, est_join, est_join >= exact_join AS one_sided_ok,
        |  (est_join - exact_join) * 64 <= 4 * na * nb AS bound_ok
        |FROM ex, sa, sb, es""".stripMargin,

    // gini over counts sorted asc is tie-insensitive (equal counts commute
    // in sum(i*c)), so row_number tie order is immaterial; all-integer with
    // one final floor division of non-negative operands (the b77 note)
    "b81_skew_profile" ->
      """WITH c AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c, k) AS i FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(c) AS BIGINT) AS n,
        |        CAST(max(c) AS BIGINT) AS mx, CAST(sum(i * c) AS BIGINT) AS s1 FROM r)
        |SELECT m AS n_keys, n AS n_rows, mx AS max_cnt,
        |  (1000 * mx * m) // n AS skew_milli,
        |  (1000 * (2 * s1 - (m + 1) * n)) // (m * n) AS gini_milli
        |FROM a""".stripMargin,

    // replay of the full integer signature pipeline: c80's projection,
    // the 'hp'-salted sign family, 4-bit band sigs, then c05's verify
    "c82_jl_lsh_pairs" ->
      """WITH e AS (SELECT vec_id AS id, embedding FROM embeddings),
        |x AS (SELECT id, g.i AS i,
        |    CAST(floor(CAST(embedding[g.i + 1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS q
        |  FROM e CROSS JOIN generate_series(0, 63) g(i)),
        |sj AS (SELECT gj.j AS j, gi.i AS i,
        |    1 - 2 * ((CAST(('0x' || substring(md5('jl:' || CAST(gj.j AS VARCHAR) || ':' ||
        |        CAST((gi.i // 30) AS VARCHAR)), 1, 15)) AS BIGINT)
        |      >> CAST((gi.i % 30) AS INTEGER)) & 1) AS sgn
        |  FROM generate_series(0, 15) gj(j) CROSS JOIN generate_series(0, 63) gi(i)),
        |y AS (SELECT x.id, sj.j AS j, CAST(sum(sj.sgn * x.q) AS BIGINT) AS y
        |      FROM x JOIN sj ON x.i = sj.i GROUP BY 1, 2),
        |hp AS (SELECT gt.t AS t, gj.j AS j,
        |    1 - 2 * ((CAST(('0x' || substring(md5('hp:' || CAST(gt.t AS VARCHAR) || ':' ||
        |        CAST((gj.j // 30) AS VARCHAR)), 1, 15)) AS BIGINT)
        |      >> CAST((gj.j % 30) AS INTEGER)) & 1) AS sgn
        |  FROM generate_series(0, 15) gt(t) CROSS JOIN generate_series(0, 15) gj(j)),
        |bits AS (SELECT y.id, hp.t AS t,
        |    CASE WHEN sum(hp.sgn * y.y) >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM y JOIN hp ON y.j = hp.j GROUP BY 1, 2),
        |sigs AS (SELECT id, t // 4 AS band,
        |    CAST(sum(bit * (1 << CAST(t % 4 AS INTEGER))) AS BIGINT) AS sig
        |  FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT sa.id AS a, sb.id AS b FROM sigs sa
        |  JOIN sigs sb ON sa.band = sb.band AND sa.sig = sb.sig AND sa.id < sb.id)
        |SELECT cand.a, cand.b FROM cand
        |JOIN e ea ON ea.id = cand.a JOIN e eb ON eb.id = cand.b
        |WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |  CAST(eb.embedding AS DOUBLE[])), 6) >= 0.35
        |ORDER BY a, b""".stripMargin,

    // same (ts, event_id) total order; full-path tiebreak makes the
    // top-10 cut deterministic
    "b82_event_paths" ->
      """WITH e AS (SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2, lead(event_type, 2) OVER w AS e3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS cnt FROM e
        |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY cnt DESC, e1, e2, e3 LIMIT 10""".stripMargin,

    // exact per-column stats; canonical BIGINT envelopes match the Spark
    // side (cents, epoch days)
    "b83_analyze_stats" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS dday
        |  FROM orders)
        |SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(o_custkey) AS BIGINT) AS n_non_null,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv,
        |  CAST(min(o_custkey) AS BIGINT) AS min_v, CAST(max(o_custkey) AS BIGINT) AS max_v FROM o
        |UNION ALL SELECT 'o_orderdate_day', CAST(count(*) AS BIGINT), CAST(count(dday) AS BIGINT),
        |  CAST(count(DISTINCT dday) AS BIGINT), CAST(min(dday) AS BIGINT), CAST(max(dday) AS BIGINT) FROM o
        |UNION ALL SELECT 'o_orderkey', CAST(count(*) AS BIGINT), CAST(count(o_orderkey) AS BIGINT),
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT), CAST(min(o_orderkey) AS BIGINT), CAST(max(o_orderkey) AS BIGINT) FROM o
        |UNION ALL SELECT 'o_totalprice_cents', CAST(count(*) AS BIGINT), CAST(count(cents) AS BIGINT),
        |  CAST(count(DISTINCT cents) AS BIGINT), CAST(min(cents) AS BIGINT), CAST(max(cents) AS BIGINT) FROM o
        |ORDER BY col_name""".stripMargin,

    // b66's base/changes CTEs; diff = full-outer + IS NOT DISTINCT FROM
    "b87_snapshot_diff" ->
      """WITH base AS (
        |  SELECT user_id, value FROM (
        |    SELECT user_id, value,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-16') WHERE rn = 1),
        |chg AS (
        |  SELECT user_id, value,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op FROM (
        |    SELECT user_id, event_type, value,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts >= TIMESTAMP '2024-01-16') WHERE rn = 1),
        |neu AS (
        |  SELECT coalesce(b.user_id, c.user_id) AS user_id,
        |    CASE WHEN c.op = 'U' THEN c.value ELSE b.value END AS value
        |  FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
        |  WHERE c.op IS NULL OR c.op <> 'D')
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |  CASE WHEN o.user_id IS NULL THEN 'added'
        |       WHEN n.user_id IS NULL THEN 'removed'
        |       WHEN o.value IS NOT DISTINCT FROM n.value THEN 'unchanged'
        |       ELSE 'changed' END AS change_type
        |FROM base o FULL OUTER JOIN neu n ON o.user_id = n.user_id
        |ORDER BY user_id""".stripMargin,

    // c06's brute CTEs ∩ c22's multiprobe CTEs, counted per query
    "c89_ann_precision" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS item_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM q JOIN embeddings e ON e.vec_id != q.query_id),
        |brute AS (
        |  SELECT query_id, item_id FROM (
        |    SELECT query_id, item_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |    FROM scored) WHERE rank <= 10),
        |hp AS (
        |  SELECT j, list(CASE WHEN ('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 2))::INTEGER < 128
        |                 THEN 1.0 ELSE -1.0 END ORDER BY k) AS hvec
        |  FROM generate_series(0,4) t1(j), generate_series(0,63) t2(k)
        |  GROUP BY j),
        |sig AS (
        |  SELECT e.vec_id, e.embedding,
        |    CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), hp.hvec) >= 0
        |             THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM embeddings e, hp
        |  GROUP BY e.vec_id, e.embedding),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS pqv,
        |    CASE WHEN m < 0 THEN bucket ELSE xor(bucket, (1::BIGINT << m)) END AS pbucket
        |  FROM sig, generate_series(-1,4) t(m)
        |  WHERE vec_id < 5),
        |cand AS (
        |  SELECT p.query_id, s.vec_id AS item_id,
        |    round(list_cosine_similarity(CAST(p.pqv AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])), 6) AS cos
        |  FROM probes p JOIN sig s ON s.bucket = p.pbucket AND s.vec_id != p.query_id),
        |lsh AS (
        |  SELECT query_id, item_id FROM (
        |    SELECT query_id, item_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |    FROM cand) WHERE rank <= 10),
        |h AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS h
        |      FROM brute b JOIN lsh l ON b.query_id = l.query_id AND b.item_id = l.item_id
        |      GROUP BY 1)
        |SELECT q.query_id AS query_id, coalesce(h.h, 0) AS hits_at_10
        |FROM q LEFT JOIN h ON h.query_id = q.query_id ORDER BY q.query_id""".stripMargin,

    // bucketing is engine-local layout; the contract is the plain rollup
    "b86_bucketed_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // quantile_disc ≡ the cw*2 >= tot rule (smallest v with cdf >= 0.5)
    "b90_grouped_mad" ->
      """WITH d0 AS (SELECT coalesce(lang, '') AS lang, n_chars FROM documents),
        |m AS (SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med_chars
        |      FROM d0 GROUP BY lang),
        |dv AS (SELECT d0.lang, abs(d0.n_chars - m.med_chars) AS ad
        |       FROM d0 JOIN m ON d0.lang = m.lang),
        |md AS (SELECT lang, CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad_chars
        |       FROM dv GROUP BY lang)
        |SELECT m.lang AS lang, m.med_chars, md.mad_chars
        |FROM m JOIN md ON m.lang = md.lang ORDER BY m.lang""".stripMargin,

    // latest row at-or-before T per user (row_number ≡ max_by on the
    // same (ts, event_id) total order)
    "b89_scd2_asof" ->
      """SELECT user_id, event_id, epoch_us(ts) AS valid_from_us FROM (
        |  SELECT user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-16') t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // same two exact passes; quantile_disc = DuckDB's discrete percentile
    "b88_mad_robust" ->
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM lineitem),
        |m AS (SELECT quantile_disc(v, 0.5) AS med FROM c)
        |SELECT CAST(max(m.med) AS BIGINT) AS median_cents,
        |  CAST(quantile_disc(abs(c.v - m.med), 0.5) AS BIGINT) AS mad_cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM c CROSS JOIN m""".stripMargin,

    // c71's canonical groups binned by binary-string length
    // three c81-style sketch inner products + the argmin rank — every
    // column a deterministic BIGINT under the shared md5 bucket rule
    "c100_join_order" ->
      """WITH ta AS (SELECT CAST(user_id AS VARCHAR) AS tok FROM events),
        |tb AS (SELECT CAST(o_custkey AS VARCHAR) AS tok FROM orders),
        |tc AS (SELECT CAST(c_custkey AS VARCHAR) AS tok FROM customer),
        |ca AS (SELECT g.r AS r,
        |    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM ta CROSS JOIN generate_series(0, 3) g(r) GROUP BY 1, 2),
        |cb AS (SELECT g.r AS r,
        |    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM tb CROSS JOIN generate_series(0, 3) g(r) GROUP BY 1, 2),
        |cc AS (SELECT g.r AS r,
        |    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM tc CROSS JOIN generate_series(0, 3) g(r) GROUP BY 1, 2),
        |eab AS (SELECT coalesce(min(s), 0) AS est FROM (
        |    SELECT a.r, sum(a.cnt * b.cnt) AS s FROM ca a JOIN cb b USING (r, bucket) GROUP BY a.r)),
        |eac AS (SELECT coalesce(min(s), 0) AS est FROM (
        |    SELECT a.r, sum(a.cnt * c.cnt) AS s FROM ca a JOIN cc c USING (r, bucket) GROUP BY a.r)),
        |ebc AS (SELECT coalesce(min(s), 0) AS est FROM (
        |    SELECT b.r, sum(b.cnt * c.cnt) AS s FROM cb b JOIN cc c USING (r, bucket) GROUP BY b.r)),
        |p AS (
        |  SELECT 'events' AS left_table, 'orders' AS right_table, CAST(est AS BIGINT) AS est_join FROM eab
        |  UNION ALL SELECT 'events', 'customer', CAST(est AS BIGINT) FROM eac
        |  UNION ALL SELECT 'orders', 'customer', CAST(est AS BIGINT) FROM ebc),
        |rk AS (SELECT *, row_number() OVER (ORDER BY est_join, left_table, right_table) AS rn FROM p)
        |SELECT left_table, right_table, est_join, rn = 1 AS join_first
        |FROM rk ORDER BY left_table, right_table""".stripMargin,

    // rate = sqrt(w_min)/sqrt(w): the water-filling normalizer cancels,
    // leaving only correctly-rounded IEEE sqrt/div/mul in this exact order
    "c101_temperature_mix" ->
      """WITH a AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS w FROM documents GROUP BY lang),
        |r AS (SELECT lang,
        |        CAST(floor(sqrt(CAST((SELECT min(w) FROM a) AS DOUBLE))
        |          / sqrt(CAST(w AS DOUBLE)) * 1000000.0) AS BIGINT) AS ppm
        |      FROM a)
        |SELECT d.doc_id, d.lang, d.n_chars, r.ppm
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 < r.ppm
        |ORDER BY d.doc_id""".stripMargin,

    // c06's brute-force shape restricted to different-label items
    "c102_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS item_id, e.label AS item_label,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM q JOIN embeddings e ON e.vec_id != q.query_id AND e.label != q.ql),
        |ranked AS (
        |  SELECT query_id, item_id, item_label,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |  FROM scored)
        |SELECT query_id, item_id, item_label, CAST(rank AS INTEGER) AS rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // c71's canonical key; survivor = (n_chars desc, doc_id asc) per group
    "c103_keep_best" ->
      """WITH c AS (SELECT doc_id, n_chars,
        |  CAST(('0x' || substring(md5(array_to_string(list_filter(
        |    string_split(lower(translate(coalesce(text, ''), '.,!?;:()"''', '          ')), ' '),
        |    x -> x != ''), ' ')), 1, 15)) AS BIGINT) AS ck
        |  FROM documents),
        |r AS (SELECT doc_id, n_chars,
        |    row_number() OVER (PARTITION BY ck ORDER BY n_chars DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY ck) AS gs
        |  FROM c)
        |SELECT doc_id, n_chars, CAST(gs AS BIGINT) AS group_size
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // b94's chained conditional-min windows extended to 4 stages
    "b102_funnel4" ->
      """WITH s1t AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS s1
        |  FROM events),
        |s2t AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > s1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s2
        |  FROM s1t),
        |s3t AS (
        |  SELECT *, min(CASE WHEN event_type = 'signup' AND ts > s2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s3
        |  FROM s2t),
        |s4t AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s3 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s4
        |  FROM s3t),
        |u AS (SELECT user_id, max(s1) AS s1, max(s2) AS s2, max(s3) AS s3,
        |        max(s4) AS s4
        |      FROM s4t GROUP BY user_id),
        |c AS (SELECT CAST(count(s1) AS BIGINT) AS u1, CAST(count(s2) AS BIGINT) AS u2,
        |        CAST(count(s3) AS BIGINT) AS u3, CAST(count(s4) AS BIGINT) AS u4 FROM u)
        |SELECT 1 AS stage, 'view' AS event_type, u1 AS users,
        |  (u1 * 1000000) // NULLIF(u1, 0) AS conv_ppm FROM c
        |UNION ALL SELECT 2, 'click', u2, (u2 * 1000000) // NULLIF(u1, 0) FROM c
        |UNION ALL SELECT 3, 'signup', u3, (u3 * 1000000) // NULLIF(u1, 0) FROM c
        |UNION ALL SELECT 4, 'purchase', u4, (u4 * 1000000) // NULLIF(u1, 0) FROM c
        |ORDER BY stage""".stripMargin,

    "b103_tpch_q6" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents_pct,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,

    "b104_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    CAST(floor(l_quantity * 10 + 0.5) AS BIGINT) AS qty_deci,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'ECONOMY'),
        |w AS (
        |  SELECT *, sum(qty_deci) OVER (PARTITION BY l_partkey) AS sum_deci,
        |    count(*) OVER (PARTITION BY l_partkey) AS cnt
        |  FROM li),
        |f AS (SELECT * FROM w WHERE qty_deci * cnt * 5 < sum_deci)
        |SELECT CAST(CAST(sum(cents) AS BIGINT) // 7 AS BIGINT) AS avg_yearly_cents,
        |  count(*) AS n_small FROM f""".stripMargin,

    "c104_edit_distance_pairs" ->
      """WITH k0 AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(string_split(lower(text), ' '), 1, 8), ' ') AS title,
        |    string_split(lower(text), ' ')[1] AS blk
        |  FROM documents WHERE text IS NOT NULL),
        |k AS (
        |  SELECT doc_id, title, blk FROM (
        |    SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id) AS rn
        |    FROM k0) WHERE rn <= 4096)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.title, b.title) AS INTEGER) AS dist
        |FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE abs(length(a.title) - length(b.title)) <= 14
        |  AND levenshtein(a.title, b.title) <= 14
        |ORDER BY doc_a, doc_b""".stripMargin,

    // c07's cell assignment at crank<=4 + c06's brute truth; per-probe
    // ranks are running conditional counts over ONE per-query sort
    "c105_ivf_probe_advisor" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |cent AS (
        |  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 97 = 0),
        |item_sc AS (
        |  SELECT e.vec_id AS item_id, e.embedding AS iv, c.centroid_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), 6) AS csim
        |  FROM embeddings e CROSS JOIN cent c),
        |item_cell AS (
        |  SELECT item_id, iv, centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item_id ORDER BY csim DESC, centroid_id) AS crank
        |    FROM item_sc) WHERE crank <= 1),
        |q_sc AS (
        |  SELECT q.query_id, q.qv, c.centroid_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), 6) AS csim
        |  FROM q CROSS JOIN cent c),
        |q_cell AS (
        |  SELECT query_id, qv, centroid_id, crank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, centroid_id) AS crank
        |    FROM q_sc) WHERE crank <= 4),
        |b_scored AS (
        |  SELECT q.query_id, e.vec_id AS item_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM q JOIN embeddings e ON e.vec_id != q.query_id),
        |brute AS (
        |  SELECT query_id, item_id FROM (
        |    SELECT query_id, item_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |    FROM b_scored) WHERE rank <= 10),
        |cand AS (
        |  SELECT qc.query_id, ic.item_id, qc.crank,
        |    round(list_cosine_similarity(CAST(qc.qv AS DOUBLE[]), CAST(ic.iv AS DOUBLE[])), 6) AS cos
        |  FROM item_cell ic JOIN q_cell qc USING (centroid_id)
        |  WHERE ic.item_id != qc.query_id),
        |ranked AS (
        |  SELECT *,
        |    sum(CASE WHEN crank <= 1 THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY query_id ORDER BY cos DESC, item_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
        |    sum(CASE WHEN crank <= 2 THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY query_id ORDER BY cos DESC, item_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2,
        |    sum(CASE WHEN crank <= 4 THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY query_id ORDER BY cos DESC, item_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r4
        |  FROM cand),
        |tot AS (
        |  SELECT
        |    sum(CASE WHEN crank <= 1 AND r1 <= 10 AND b.query_id IS NOT NULL THEN 1 ELSE 0 END) AS h1,
        |    sum(CASE WHEN crank <= 2 AND r2 <= 10 AND b.query_id IS NOT NULL THEN 1 ELSE 0 END) AS h2,
        |    sum(CASE WHEN crank <= 4 AND r4 <= 10 AND b.query_id IS NOT NULL THEN 1 ELSE 0 END) AS h4
        |  FROM ranked r LEFT JOIN brute b USING (query_id, item_id)),
        |bn AS (SELECT CAST(count(*) AS BIGINT) AS brute_n FROM brute),
        |rows_ AS (
        |  SELECT 1 AS nprobe, CAST(h1 AS BIGINT) AS hits FROM tot
        |  UNION ALL SELECT 2, CAST(h2 AS BIGINT) FROM tot
        |  UNION ALL SELECT 4, CAST(h4 AS BIGINT) FROM tot),
        |curve AS (
        |  SELECT nprobe, hits, brute_n,
        |    CAST((hits * 1000000) // NULLIF(brute_n, 0) AS BIGINT) AS recall_ppm
        |  FROM rows_ CROSS JOIN bn)
        |SELECT nprobe, hits, brute_n, recall_ppm,
        |  row_number() OVER (ORDER BY (recall_ppm >= 900000) DESC,
        |    CASE WHEN recall_ppm >= 900000 THEN nprobe ELSE -nprobe END) = 1 AS chosen
        |FROM curve ORDER BY nprobe""".stripMargin,

    "b105_trailing_days" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ts_us,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  count(*) OVER tw AS n_trailing,
        |  CAST(sum(cents) OVER tw AS BIGINT) AS cents_trailing
        |FROM o
        |WINDOW tw AS (PARTITION BY o_custkey ORDER BY ts_us
        |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // identical floored cumulative-Poisson ppm thresholds; the weight is
    // a pure function of md5("doc:replicate") in both engines
    "c107_bootstrap_stats" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars, b.b AS replicate
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) b),
        |w AS (
        |  SELECT replicate, n_chars,
        |    CASE WHEN bucket < 367879 THEN 0 WHEN bucket < 735758 THEN 1
        |         WHEN bucket < 919698 THEN 2 WHEN bucket < 981011 THEN 3
        |         WHEN bucket < 996340 THEN 4 ELSE 5 END AS w
        |  FROM (SELECT *,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(replicate AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS bucket
        |    FROM r)),
        |agg AS (
        |  SELECT replicate, CAST(sum(w) AS BIGINT) AS drawn,
        |    CAST(sum(w * n_chars) AS BIGINT) AS val_sum
        |  FROM w GROUP BY replicate)
        |SELECT CAST(replicate AS INTEGER) AS replicate, drawn, val_sum,
        |  CAST((val_sum * 1000) // NULLIF(drawn, 0) AS BIGINT) AS mean_milli
        |FROM agg ORDER BY replicate""".stripMargin,

    // c102's different-label join ranked by the 60-bit md5 instead of
    // cosine — the uniform-sampling partner
    "c108_random_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS ql
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS item_id, e.label AS item_label,
        |    CAST(('0x' || substring(md5(CAST(q.query_id AS VARCHAR) || ':' ||
        |      CAST(e.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM q JOIN embeddings e
        |    ON e.vec_id != q.query_id AND e.label != q.ql),
        |ranked AS (
        |  SELECT query_id, item_id, item_label,
        |    row_number() OVER (PARTITION BY query_id ORDER BY h, item_id) AS rank
        |  FROM scored)
        |SELECT query_id, item_id, item_label, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // hashed-ngram linear classifier (shared classifierScoreCte)
    "c109_quality_classifier" -> (classifierScoreCteWhere("") +
      """
        |SELECT doc_id, n_feats, score, (score >= 0) AS kept
        |FROM cscore ORDER BY doc_id""".stripMargin),

    // yield curve: conditional sums per threshold, stacked; ppm is exact
    // BIGINT floor division on both engines
    "c110_classifier_yield" -> (classifierScoreCteWhere("") +
      classifierYieldBodySql + classifierYieldSelectSql),

    // the IVM variant: same yield tail, corpus = post-CDC rows (base
    // minus doc_id%10=7 retractions plus the %10=3 inserts = everything
    // but the retracted tenth) — the full recompute the Spark-side
    // monoid merge must equal exactly
    // Hamilton apportionment replayed: integer floor quotas + remainder
    // bonuses, rank windows with the identical (rem DESC, lang) tiebreak
    "c113_eval_apportionment" ->
      """WITH cnt AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cnt),
        |ap AS (SELECT lang, n, nn, CAST((n * 100) // nn AS BIGINT) AS base,
        |         CAST((n * 100) % nn AS BIGINT) AS rem
        |       FROM cnt CROSS JOIN tot),
        |lo AS (SELECT CAST(100 - sum(base) AS BIGINT) AS leftover FROM ap),
        |al AS (SELECT lang,
        |         base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
        |                       <= leftover THEN 1 ELSE 0 END AS alloc
        |       FROM ap CROSS JOIN lo),
        |rks AS (SELECT lang, doc_id,
        |          row_number() OVER (PARTITION BY lang ORDER BY
        |            CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
        |            doc_id) AS rk
        |        FROM documents)
        |SELECT r.lang, r.doc_id, CAST(r.rk AS INTEGER) AS rk,
        |  CAST(a.alloc AS BIGINT) AS alloc
        |FROM rks r JOIN al a USING (lang)
        |WHERE r.rk <= a.alloc ORDER BY lang, rk""".stripMargin,

    "c112_yield_ivm" -> (classifierScoreCteWhere(" WHERE doc_id % 10 != 7") +
      classifierYieldBodySql + classifierYieldSelectSql),

    // 2x2 agreement: the heuristic leg replays the c35 qualityScoreNano
    // rational (GROUP-BY counts, never list lambdas — the r5 lesson);
    // the 0.395-nano bar is c35's, near the fixture median so all four
    // matrix cells are populated (the FloorDivSpec degeneracy lesson)
    "c111_gate_agreement" -> (classifierScoreCteWhere("") +
      heuristicGateCteSql + """,
        |cd AS (SELECT doc_id, (score >= 0) AS kept_c FROM cscore)
        |SELECT cd.kept_c, hq.kept_h, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
        |FROM cd JOIN hq USING (doc_id) JOIN documents d USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // reliability table: per-score-value counts first, cumulative rank on
    // the distinct-score frame, a value's docs take its LAST row's decile
    // (((cum−1)·10) // N + 1) — the identical rule the Spark side applies,
    // so ties never split across bins; BIGINT end to end
    "c114_classifier_calibration" -> (classifierScoreCteWhere("") +
      heuristicGateCteSql + calibrationCteSql + """
        |SELECT decile, n_docs, lo_score, hi_score, kept_h_docs, kept_h_ppm
        |FROM cal ORDER BY decile""".stripMargin),

    // the audit replays the SAME cal CTE + a lag window over the 10-row
    // decile frame; monotone_up is defined ONCE (in au) and the
    // violation count derives from it, never a second predicate copy;
    // ppm >= 0 > -1, so the first decile's sentinel is vacuously monotone
    "c116_calibration_audit" -> (classifierScoreCteWhere("") +
      heuristicGateCteSql + calibrationCteSql + """,
        |lg AS (
        |  SELECT decile, n_docs, kept_h_ppm,
        |    COALESCE(lag(kept_h_ppm) OVER (ORDER BY decile), -1) AS prev_ppm
        |  FROM cal),
        |au AS (SELECT *, (kept_h_ppm >= prev_ppm) AS monotone_up FROM lg)
        |SELECT decile, n_docs, kept_h_ppm, prev_ppm, monotone_up,
        |  CAST(sum(CASE WHEN monotone_up THEN 0 ELSE 1 END) OVER ()
        |    AS BIGINT) AS violations_total
        |FROM au ORDER BY decile""".stripMargin),

    // drift = the SAME cal chain instantiated twice (suffix-renamed CTEs;
    // prev = the pre-insert c112 slice), full-outer decile join with
    // 0/−1 sentinels; drifted is defined ONCE (in dj) and the table-wide
    // count derives from it, never a second predicate copy
    "c117_calibration_drift" -> (classifierScoreCteWhere("") +
      heuristicGateCteSql + calibrationCteSfx("", "") +
      calibrationCteSfx("p", " WHERE doc_id % 10 != 3") + """,
        |dj AS (
        |  SELECT COALESCE(c.decile, p.decile) AS decile,
        |    COALESCE(p.n_docs, 0) AS n_docs_prev,
        |    COALESCE(c.n_docs, 0) AS n_docs_curr,
        |    COALESCE(p.kept_h_ppm, -1) AS kept_h_ppm_prev,
        |    COALESCE(c.kept_h_ppm, -1) AS kept_h_ppm_curr,
        |    COALESCE(c.kept_h_ppm, -1) - COALESCE(p.kept_h_ppm, -1) AS ppm_delta,
        |    (abs(COALESCE(c.kept_h_ppm, -1) - COALESCE(p.kept_h_ppm, -1)) > 10000
        |     OR p.kept_h_ppm IS NULL OR c.kept_h_ppm IS NULL) AS drifted
        |  FROM cal c FULL OUTER JOIN calp p ON c.decile = p.decile)
        |SELECT decile, n_docs_prev, n_docs_curr, kept_h_ppm_prev,
        |  kept_h_ppm_curr, ppm_delta, drifted,
        |  CAST(sum(CASE WHEN drifted THEN 1 ELSE 0 END) OVER ()
        |    AS BIGINT) AS drifted_total
        |FROM dj ORDER BY decile""".stripMargin),

    // CLOSED FORM of the Multimodal.patternPng pixels (PNG lossless ⇒
    // decode∘encode = identity): bounded 8×6 series join, per-pixel
    // modular formulas in lockstep with patternPng, exact integer sums.
    // No codec runs in SQL — that asymmetry is the point: the Spark side
    // must push real bytes through javax.imageio and land on these exact
    // numbers.
    "c118_image_codec_roundtrip" ->
      """WITH xs(x) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)),
        |ys(y) AS (VALUES (0),(1),(2),(3),(4),(5)),
        |dm AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |         doc_id % 256 AS ro FROM documents),
        |px AS (SELECT dm.doc_id, dm.w, dm.h,
        |         (xs.x * 31 + ro) % 256 AS r,
        |         (ys.y * 57 + 2 * ro) % 256 AS g,
        |         ((xs.x + ys.y) * 13 + 3 * ro) % 256 AS b
        |       FROM dm JOIN xs ON xs.x < dm.w JOIN ys ON ys.y < dm.h)
        |SELECT doc_id, TRUE AS ok,
        |  CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
        |  CAST(sum(r) AS BIGINT) AS r_sum,
        |  CAST(sum(g) AS BIGINT) AS g_sum,
        |  CAST(sum(b) AS BIGINT) AS b_sum,
        |  CAST(sum(CASE WHEN (r+g+b) // 3 < 64 THEN 1 ELSE 0 END) AS BIGINT) AS l0,
        |  CAST(sum(CASE WHEN (r+g+b) // 3 >= 64 AND (r+g+b) // 3 < 128
        |    THEN 1 ELSE 0 END) AS BIGINT) AS l1,
        |  CAST(sum(CASE WHEN (r+g+b) // 3 >= 128 AND (r+g+b) // 3 < 192
        |    THEN 1 ELSE 0 END) AS BIGINT) AS l2,
        |  CAST(sum(CASE WHEN (r+g+b) // 3 >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS l3
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // CLOSED FORM of the Multimodal.patternWav samples (PCM raw ⇒
    // roundtrip exact); the sample formula in lockstep with patternWav,
    // negative amplitudes through ABS
    "c119_audio_codec_roundtrip" ->
      """WITH si(i) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)),
        |dm AS (SELECT doc_id, 4 + doc_id % 5 AS n, doc_id % 97 AS sd
        |       FROM documents),
        |sm AS (SELECT dm.doc_id, dm.n,
        |         (sd * 131 + si.i * 257) % 20000 - 10000 AS v
        |       FROM dm JOIN si ON si.i < dm.n)
        |SELECT doc_id, TRUE AS ok, CAST(max(n) AS BIGINT) AS n_frames,
        |  CAST(1 AS BIGINT) AS channels, CAST(8000 AS BIGINT) AS rate_hz,
        |  CAST(sum(ABS(v)) AS BIGINT) AS amp_abs_sum
        |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // advisor = ONE rank over the shared curve body: qualifying rows
    // first (tightest thr wins), else the loosest thr with
    // qualifies=false — identical ordering expression on both engines
    "c115_gate_threshold_advisor" -> (classifierScoreCteWhere("") +
      classifierYieldBodySql + s""",
        |cv AS (
        |  SELECT lang, thr, total_docs, kept_docs,
        |    $yieldPpmSql
        |  FROM st),
        |qv AS (SELECT *, (kept_ppm >= 500000) AS qualifies FROM cv),
        |rkd AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY
        |    qualifies DESC,
        |    CASE WHEN qualifies THEN -thr ELSE thr END) AS rk FROM qv)
        |SELECT lang, CAST(thr AS BIGINT) AS chosen_thr, total_docs,
        |  kept_docs, CAST(kept_ppm AS BIGINT) AS kept_ppm, qualifies
        |FROM rkd WHERE rk = 1 ORDER BY lang""".stripMargin),

    // closed-form water-filling: sort by cap/weight, prefix sums, the
    // split validity cleared to BIGINT products, 1-row split crossed back
    "c106_epoch_allocation" ->
      """WITH strata AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS tokens, count(*) AS docs
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot_tokens,
        |          CAST(sum(docs) AS BIGINT) AS tot_w FROM strata),
        |base AS (
        |  SELECT s.*, t.tot_tokens, t.tot_w,
        |    CAST((t.tot_tokens * 2) // 1 AS BIGINT) AS t_budget,
        |    tokens * 4 AS cap_tokens,
        |    CAST(tokens * 4 AS DOUBLE) / CAST(docs AS DOUBLE) AS r
        |  FROM strata s CROSS JOIN tot t),
        |pref AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY r, source) AS rk,
        |    CAST(sum(cap_tokens) OVER (ORDER BY r, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pref_cap,
        |    CAST(sum(docs) OVER (ORDER BY r, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pref_w,
        |    lead(cap_tokens) OVER (ORDER BY r, source) AS next_cap,
        |    lead(docs) OVER (ORDER BY r, source) AS next_w
        |  FROM base),
        |valid AS (
        |  SELECT rk, pref_cap, pref_w FROM pref
        |  WHERE cap_tokens * (tot_w - pref_w) <= (t_budget - pref_cap) * docs
        |    AND (next_cap IS NULL OR
        |         (t_budget - pref_cap) * next_w < next_cap * (tot_w - pref_w))),
        |split AS (
        |  SELECT coalesce(max(rk), 0) AS k_rank,
        |    coalesce(arg_max(pref_cap, rk), 0) AS k_cap,
        |    coalesce(arg_max(pref_w, rk), 0) AS k_w
        |  FROM valid),
        |alloc AS (
        |  SELECT source, tokens, docs, cap_tokens,
        |    CASE WHEN rk <= k_rank THEN cap_tokens
        |         ELSE ((t_budget - k_cap) * docs) // NULLIF(tot_w - k_w, 0) END
        |      AS alloc_tokens,
        |    rk <= k_rank AS capped
        |  FROM pref CROSS JOIN split)
        |SELECT source, tokens, CAST(docs AS BIGINT) AS docs,
        |  CAST(cap_tokens AS BIGINT) AS cap_tokens,
        |  CAST(alloc_tokens AS BIGINT) AS alloc_tokens, capped,
        |  CAST((alloc_tokens * 1000000) // NULLIF(tokens, 0) AS BIGINT) AS epochs_ppm
        |FROM alloc ORDER BY source""".stripMargin,

    // b91's sliding unroll; exact counts + literal TRUE audit booleans
    // (the b80 pattern — the theorem facts are what cross engines)
    "c99_sliding_topk" ->
      """WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wm FROM events),
        |w AS (SELECT time_bucket(INTERVAL '30 minutes', ts)
        |        - k.k * INTERVAL '30 minutes' AS ws,
        |        coalesce(event_type, '') AS event_type
        |      FROM events CROSS JOIN (VALUES (0), (1)) k(k)),
        |ex AS (SELECT ws, event_type, CAST(count(*) AS BIGINT) AS cnt
        |       FROM w GROUP BY 1, 2),
        |n AS (SELECT ws, count(*) AS n FROM w GROUP BY 1)
        |SELECT epoch_us(ws) AS w_start_us, event_type, cnt,
        |  cnt * 3 > n.n AS is_heavy, TRUE AS captured, TRUE AS bound_ok
        |FROM ex JOIN n USING (ws) CROSS JOIN wm
        |WHERE ws + INTERVAL 1 HOUR <= wm.wm
        |ORDER BY w_start_us, event_type""".stripMargin,

    // b91's sliding-window unroll composed with c78's md5 cell rule;
    // closed windows only (the b78 watermark bound)
    "c98_sliding_cms" ->
      """WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wm FROM events),
        |w AS (SELECT time_bucket(INTERVAL '30 minutes', ts)
        |        - k.k * INTERVAL '30 minutes' AS ws,
        |        CAST(user_id AS VARCHAR) AS tok
        |      FROM events CROSS JOIN (VALUES (0), (1)) k(k)),
        |x AS (SELECT ws, CAST(g.r AS INTEGER) AS r,
        |        CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket
        |      FROM w CROSS JOIN generate_series(0, 3) g(r))
        |SELECT epoch_us(ws) AS w_start_us, r, bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM x CROSS JOIN wm
        |WHERE ws + INTERVAL 1 HOUR <= wm.wm
        |GROUP BY ws, r, bucket ORDER BY w_start_us, r, bucket""".stripMargin,

    // same two quantile_disc passes as b90, applied to the compacted
    // (type × day) count frame; 3·MAD gate in pure integers
    "c97_anomaly_days" ->
      """WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |             CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(quantile_disc(cnt, 0.5) AS BIGINT) AS med FROM d GROUP BY 1),
        |dv AS (SELECT d.event_type, abs(d.cnt - m.med) AS ad FROM d JOIN m USING (event_type)),
        |md AS (SELECT event_type, CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad FROM dv GROUP BY 1)
        |SELECT d.event_type, d.day, d.cnt, m.med, md.mad,
        |  abs(d.cnt - m.med) > 3 * md.mad AS anomaly
        |FROM d JOIN m USING (event_type) JOIN md USING (event_type)
        |ORDER BY d.event_type, d.day""".stripMargin,

    // the sizing rule is exact-integer-verifiable (n from the data, the
    // ln2 quantization fixed); the measured fp side crosses engines as
    // bound booleans (b18 pattern) — DuckDB cannot rebuild the bitmap
    // (64-bit two's-complement wrap in the probe walk has no BIGINT
    // equivalent), but it fully verifies n_keys/min_bits/eligible/chosen
    "c96_bloom_advisor" ->
      """WITH n AS (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys FROM customer),
        |cfg AS (SELECT * FROM (VALUES (16384), (65536), (262144)) c(m_bits)),
        |r AS (SELECT m_bits, n_keys,
        |        (n_keys * 10 * 10000 + 6930) // 6931 AS min_bits,
        |        m_bits >= (n_keys * 10 * 10000 + 6930) // 6931 AS eligible
        |      FROM cfg CROSS JOIN n),
        |rk AS (SELECT *, row_number() OVER (ORDER BY eligible DESC, m_bits) AS rn FROM r)
        |SELECT CAST(m_bits AS INTEGER) AS m_bits, CAST(10 AS INTEGER) AS k_hashes,
        |  n_keys, CAST(min_bits AS BIGINT) AS min_bits, eligible, rn = 1 AS chosen,
        |  TRUE AS fp_ok
        |FROM rk ORDER BY m_bits""".stripMargin,

    // the full minhash construction replicated: 60-bit md5 shingle
    // hashes, the LCG-affine permutations (a·(h mod P)+b mod P — a,b
    // products stay < 2^62, int64-safe), slide-r band signatures, then
    // per-config bucket stats; threshold/recall milli literals are
    // injected from the SAME Scala helpers the Spark side uses
    "c94_lsh_advisor" -> {
      val cfgRows = Seq(8, 16, 32).map { b =>
        val r = 64 / b
        s"($b, $r, ${graft.operators.Dedup.lshThresholdMilli(b, r)}, " +
          s"${graft.operators.Dedup.lshRecallMilli(b, r, 800L)})"
      }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t)-2),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
        |      FROM t WHERE len(t) >= 3),
        |hd AS (SELECT DISTINCT doc_id, CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h FROM g),
        |perm AS (SELECT i,
        |    CASE WHEN (1103515245 * (i + 1) + 12345) % 2147483647 = 0 THEN 1
        |         ELSE (1103515245 * (i + 1) + 12345) % 2147483647 END AS a,
        |    (69069 * (i + 1) + 1) % 2147483647 AS b
        |  FROM generate_series(0, 63) gs(i)),
        |sig AS (SELECT doc_id, i, min((a * (h % 2147483647) + b) % 2147483647) AS s
        |        FROM hd CROSS JOIN perm GROUP BY doc_id, i),
        |cfg AS (SELECT * FROM (VALUES $cfgRows)
        |        c(bands, r, threshold_milli, recall_milli)),
        |bnd AS (SELECT c.bands, doc_id, (i // c.r) AS band,
        |          string_agg(CAST(s AS VARCHAR), '_' ORDER BY i) AS bandsig
        |        FROM sig CROSS JOIN cfg c GROUP BY 1, 2, 3),
        |bk AS (SELECT bands, band, bandsig, count(*) AS n FROM bnd GROUP BY 1, 2, 3),
        |st AS (SELECT bands,
        |         CAST(coalesce(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS hot_buckets,
        |         CAST(coalesce(max(n), 0) AS BIGINT) AS max_bucket,
        |         CAST(coalesce(sum((n * (n - 1)) // 2), 0) AS BIGINT) AS cand_pairs
        |       FROM bk GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM (SELECT DISTINCT doc_id FROM hd)),
        |rk AS (SELECT c.bands, CAST(c.r AS INTEGER) AS rows_per_band,
        |         CAST(c.threshold_milli AS BIGINT) AS threshold_milli,
        |         CAST(c.recall_milli AS BIGINT) AS recall_milli,
        |         st.hot_buckets, st.max_bucket, st.cand_pairs,
        |         row_number() OVER (ORDER BY
        |           (c.recall_milli >= 990 AND st.cand_pairs <= nd.n_docs * 20) DESC,
        |           st.cand_pairs, c.bands) AS rn
        |       FROM st JOIN cfg c USING (bands) CROSS JOIN nd)
        |SELECT CAST(bands AS INTEGER) AS bands, rows_per_band, threshold_milli,
        |  recall_milli, hot_buckets, max_bucket, cand_pairs, rn = 1 AS chosen
        |FROM rk ORDER BY bands""".stripMargin
    },

    "c93_cluster_size_dist" ->
      """WITH g AS (SELECT CAST(count(*) AS BIGINT) AS n_dups FROM (
        |    SELECT CAST(('0x' || substring(md5(array_to_string(list_filter(
        |      string_split(lower(translate(coalesce(text, ''), '.,!?;:()"''', '          ')), ' '),
        |      x -> x != ''), ' ')), 1, 15)) AS BIGINT) AS ck
        |    FROM documents) GROUP BY ck)
        |SELECT CAST(length(bin(n_dups)) - 1 AS INTEGER) AS size_bin,
        |  CAST(count(*) AS BIGINT) AS n_clusters, CAST(sum(n_dups) AS BIGINT) AS n_docs,
        |  CAST(max(n_dups) AS BIGINT) AS max_size
        |FROM g GROUP BY 1 ORDER BY size_bin""".stripMargin,

    // same exact rational; two single-row aggregates unioned
    "c91_corpus_diversity" ->
      """WITH ds AS (SELECT coalesce(source, '') AS g FROM documents),
        |dl AS (SELECT coalesce(lang, '') AS g FROM documents),
        |a1 AS (SELECT CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(c) AS BIGINT) AS n,
        |        CAST(sum(c * c) AS BIGINT) AS ss
        |       FROM (SELECT g, count(*) AS c FROM ds GROUP BY g)),
        |a2 AS (SELECT CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(c) AS BIGINT) AS n,
        |        CAST(sum(c * c) AS BIGINT) AS ss
        |       FROM (SELECT g, count(*) AS c FROM dl GROUP BY g))
        |SELECT 'source' AS dimension, n_groups, (1000 * (n * n - ss)) // (n * n) AS diversity_milli FROM a1
        |UNION ALL
        |SELECT 'lang', n_groups, (1000 * (n * n - ss)) // (n * n) FROM a2
        |ORDER BY dimension""".stripMargin,

    // c08's predictor CASE against the declared column, cross-tabulated
    "c92_langid_confusion" ->
      """WITH p AS (
        |  SELECT coalesce(lang, '') AS true_lang,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |      WHEN en > es AND en > 0 THEN 'en'
        |      WHEN es > en AND es > 0 THEN 'es'
        |      ELSE 'und' END AS pred_lang
        |  FROM (
        |    SELECT lang, text,
        |      len(list_filter(string_split(text,' '), tk -> tk IN ('the','a','of','and','to','in','is','it'))) AS en,
        |      len(list_filter(string_split(text,' '), tk -> tk IN ('el','la','de','y','que','en','un','es'))) AS es
        |    FROM documents))
        |SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY 1, 2 ORDER BY true_lang, pred_lang""".stripMargin,

    // the c88 chain extended by round 3's APPLICATION (m3/i3/o3/alive4);
    // counts of the pre- and post-merge symbol streams
    "c90_bpe_compression" ->
      """WITH alive1 AS (
        |  SELECT doc_id AS doc,
        |    generate_subscripts(string_split(coalesce(text, ''), ' '), 1) AS pos,
        |    unnest(string_split(coalesce(text, ''), ' ')) AS tok
        |  FROM documents),
        |a1 AS (SELECT doc, pos, tok, lead(tok) OVER wd AS ntok, row_number() OVER wd AS seq
        |       FROM (SELECT * FROM alive1 WHERE tok != '') WINDOW wd AS (PARTITION BY doc ORDER BY pos)),
        |b1 AS (SELECT tok AS bt, ntok AS bn FROM a1 WHERE ntok IS NOT NULL GROUP BY 1, 2
        |       ORDER BY count(*) DESC, bt DESC, bn DESC LIMIT 1),
        |m1 AS (SELECT a.*, (a.ntok IS NOT NULL AND a.tok = b.bt AND a.ntok = b.bn) AS im
        |       FROM a1 a CROSS JOIN b1 b),
        |i1 AS (SELECT *, CASE WHEN im THEN seq - row_number()
        |         OVER (PARTITION BY doc, im ORDER BY pos) END AS isl FROM m1),
        |o1 AS (SELECT *, im AND (row_number() OVER (PARTITION BY doc, isl ORDER BY pos) - 1) % 2 = 0 AS mg
        |       FROM i1),
        |alive2 AS (SELECT doc, pos, CASE WHEN mg THEN tok || ' ' || ntok ELSE tok END AS tok
        |           FROM (SELECT *, lag(mg) OVER (PARTITION BY doc ORDER BY pos) AS pm FROM o1)
        |           WHERE NOT coalesce(pm, FALSE)),
        |a2 AS (SELECT doc, pos, tok, lead(tok) OVER wd AS ntok, row_number() OVER wd AS seq
        |       FROM alive2 WINDOW wd AS (PARTITION BY doc ORDER BY pos)),
        |b2 AS (SELECT tok AS bt, ntok AS bn FROM a2 WHERE ntok IS NOT NULL GROUP BY 1, 2
        |       ORDER BY count(*) DESC, bt DESC, bn DESC LIMIT 1),
        |m2 AS (SELECT a.*, (a.ntok IS NOT NULL AND a.tok = b.bt AND a.ntok = b.bn) AS im
        |       FROM a2 a CROSS JOIN b2 b),
        |i2 AS (SELECT *, CASE WHEN im THEN seq - row_number()
        |         OVER (PARTITION BY doc, im ORDER BY pos) END AS isl FROM m2),
        |o2 AS (SELECT *, im AND (row_number() OVER (PARTITION BY doc, isl ORDER BY pos) - 1) % 2 = 0 AS mg
        |       FROM i2),
        |alive3 AS (SELECT doc, pos, CASE WHEN mg THEN tok || ' ' || ntok ELSE tok END AS tok
        |           FROM (SELECT *, lag(mg) OVER (PARTITION BY doc ORDER BY pos) AS pm FROM o2)
        |           WHERE NOT coalesce(pm, FALSE)),
        |a3 AS (SELECT doc, pos, tok, lead(tok) OVER wd AS ntok, row_number() OVER wd AS seq
        |       FROM alive3 WINDOW wd AS (PARTITION BY doc ORDER BY pos)),
        |b3 AS (SELECT tok AS bt, ntok AS bn FROM a3 WHERE ntok IS NOT NULL GROUP BY 1, 2
        |       ORDER BY count(*) DESC, bt DESC, bn DESC LIMIT 1),
        |m3 AS (SELECT a.*, (a.ntok IS NOT NULL AND a.tok = b.bt AND a.ntok = b.bn) AS im
        |       FROM a3 a CROSS JOIN b3 b),
        |i3 AS (SELECT *, CASE WHEN im THEN seq - row_number()
        |         OVER (PARTITION BY doc, im ORDER BY pos) END AS isl FROM m3),
        |o3 AS (SELECT *, im AND (row_number() OVER (PARTITION BY doc, isl ORDER BY pos) - 1) % 2 = 0 AS mg
        |       FROM i3),
        |alive4 AS (SELECT doc, pos FROM
        |           (SELECT doc, pos, lag(mg) OVER (PARTITION BY doc ORDER BY pos) AS pm FROM o3)
        |           WHERE NOT coalesce(pm, FALSE)),
        |cb AS (SELECT CAST(count(*) AS BIGINT) AS toks_before FROM a1),
        |ca AS (SELECT CAST(count(*) AS BIGINT) AS toks_after FROM alive4)
        |SELECT toks_before, toks_after,
        |  (1000 * (toks_before - toks_after)) // toks_before AS saved_milli
        |FROM cb, ca""".stripMargin,

    // the c88 CTE chain mechanically unrolled to k=16 on the quarter
    // corpus — see bpeMergesOracleSql (generated SQL grows linearly in k;
    // hand-writing stopped at 3)
    "c95_bpe_merges_k16" -> bpeMergesOracleSql(16, " WHERE doc_id % 16 = 0"),

    // three unrolled BPE rounds: adjacency lead + pair count + DESC-
    // tiebroken argmax + island-parity leftmost-greedy merge, identical
    // algebra to Bpe.merges (pos is engine-local: 1-based here, 0-based
    // in Spark — only its order matters)
    "c88_bpe_merges" ->
      """WITH alive1 AS (
        |  SELECT doc_id AS doc,
        |    generate_subscripts(string_split(coalesce(text, ''), ' '), 1) AS pos,
        |    unnest(string_split(coalesce(text, ''), ' ')) AS tok
        |  FROM documents),
        |a1 AS (SELECT doc, pos, tok, lead(tok) OVER wd AS ntok, row_number() OVER wd AS seq
        |       FROM (SELECT * FROM alive1 WHERE tok != '') WINDOW wd AS (PARTITION BY doc ORDER BY pos)),
        |b1 AS (SELECT tok AS bt, ntok AS bn, CAST(count(*) AS BIGINT) AS bc
        |       FROM a1 WHERE ntok IS NOT NULL GROUP BY 1, 2
        |       ORDER BY bc DESC, bt DESC, bn DESC LIMIT 1),
        |m1 AS (SELECT a.*, (a.ntok IS NOT NULL AND a.tok = b.bt AND a.ntok = b.bn) AS im
        |       FROM a1 a CROSS JOIN b1 b),
        |i1 AS (SELECT *, CASE WHEN im THEN seq - row_number()
        |         OVER (PARTITION BY doc, im ORDER BY pos) END AS isl FROM m1),
        |o1 AS (SELECT *, im AND (row_number() OVER (PARTITION BY doc, isl ORDER BY pos) - 1) % 2 = 0 AS mg
        |       FROM i1),
        |alive2 AS (SELECT doc, pos, CASE WHEN mg THEN tok || ' ' || ntok ELSE tok END AS tok
        |           FROM (SELECT *, lag(mg) OVER (PARTITION BY doc ORDER BY pos) AS pm FROM o1)
        |           WHERE NOT coalesce(pm, FALSE)),
        |a2 AS (SELECT doc, pos, tok, lead(tok) OVER wd AS ntok, row_number() OVER wd AS seq
        |       FROM alive2 WINDOW wd AS (PARTITION BY doc ORDER BY pos)),
        |b2 AS (SELECT tok AS bt, ntok AS bn, CAST(count(*) AS BIGINT) AS bc
        |       FROM a2 WHERE ntok IS NOT NULL GROUP BY 1, 2
        |       ORDER BY bc DESC, bt DESC, bn DESC LIMIT 1),
        |m2 AS (SELECT a.*, (a.ntok IS NOT NULL AND a.tok = b.bt AND a.ntok = b.bn) AS im
        |       FROM a2 a CROSS JOIN b2 b),
        |i2 AS (SELECT *, CASE WHEN im THEN seq - row_number()
        |         OVER (PARTITION BY doc, im ORDER BY pos) END AS isl FROM m2),
        |o2 AS (SELECT *, im AND (row_number() OVER (PARTITION BY doc, isl ORDER BY pos) - 1) % 2 = 0 AS mg
        |       FROM i2),
        |alive3 AS (SELECT doc, pos, CASE WHEN mg THEN tok || ' ' || ntok ELSE tok END AS tok
        |           FROM (SELECT *, lag(mg) OVER (PARTITION BY doc ORDER BY pos) AS pm FROM o2)
        |           WHERE NOT coalesce(pm, FALSE)),
        |a3 AS (SELECT doc, pos, tok, lead(tok) OVER wd AS ntok FROM alive3
        |       WINDOW wd AS (PARTITION BY doc ORDER BY pos)),
        |b3 AS (SELECT tok AS bt, ntok AS bn, CAST(count(*) AS BIGINT) AS bc
        |       FROM a3 WHERE ntok IS NOT NULL GROUP BY 1, 2
        |       ORDER BY bc DESC, bt DESC, bn DESC LIMIT 1)
        |SELECT 1 AS rank, bt AS lhs, bn AS rhs, bc AS pair_count FROM b1
        |UNION ALL SELECT 2, bt, bn, bc FROM b2
        |UNION ALL SELECT 3, bt, bn, bc FROM b3
        |ORDER BY rank""".stripMargin,

    // c45's unrolled rounds with the seed restart term; seeds are
    // customer nodes with c_custkey % 20 = 0
    "c86_personalized_ppr" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |n AS (SELECT c_custkey * 2 AS node,
        |        CASE WHEN c_custkey % 20 = 0 THEN 1 ELSE 0 END AS seed FROM customer
        |      UNION ALL SELECT s_suppkey * 2 + 1, 0 FROM supplier),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN d ON e.src = d.src),
        |r0 AS (SELECT node, CAST(seed * 1000000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT ed.dst, CAST(sum((85 * r0.r) // (100 * ed.deg)) AS BIGINT) AS cs
        |       FROM ed JOIN r0 ON r0.node = ed.src GROUP BY ed.dst),
        |r1 AS (SELECT n.node, n.seed * 150000000 + coalesce(c1.cs, 0) AS r
        |       FROM n LEFT JOIN c1 ON c1.dst = n.node),
        |c2 AS (SELECT ed.dst, CAST(sum((85 * r1.r) // (100 * ed.deg)) AS BIGINT) AS cs
        |       FROM ed JOIN r1 ON r1.node = ed.src GROUP BY ed.dst),
        |r2 AS (SELECT n.node, n.seed * 150000000 + coalesce(c2.cs, 0) AS r
        |       FROM n LEFT JOIN c2 ON c2.dst = n.node),
        |c3 AS (SELECT ed.dst, CAST(sum((85 * r2.r) // (100 * ed.deg)) AS BIGINT) AS cs
        |       FROM ed JOIN r2 ON r2.node = ed.src GROUP BY ed.dst)
        |SELECT n.node, CAST(n.seed * 150000000 + coalesce(c3.cs, 0) AS BIGINT) AS ppr_nano
        |FROM n LEFT JOIN c3 ON c3.dst = n.node ORDER BY n.node""".stripMargin,

    // b08's window construction + the carried click ts and the 1-hour
    // micros gap test; gap floored to whole seconds (non-negative ints)
    "b85_asof_tolerance" ->
      """WITH tg AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |wv AS (SELECT event_id, user_id, ts, kind,
        |    last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER w AS click_id,
        |    last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS) OVER w AS cts
        |  FROM tg WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  CASE WHEN cts IS NOT NULL AND epoch_us(ts) - epoch_us(cts) <= 3600000000
        |       THEN click_id END AS click_id,
        |  CASE WHEN cts IS NOT NULL AND epoch_us(ts) - epoch_us(cts) <= 3600000000
        |       THEN (epoch_us(ts) - epoch_us(cts)) // 1000000 END AS gap_s
        |FROM wv WHERE kind = 1 ORDER BY event_id""".stripMargin,

    // same symmetrized trade graph; bin via binary-string length, no
    // float log
    "c87_degree_dist" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)
        |SELECT CAST(length(bin(deg)) - 1 AS INTEGER) AS deg_bin,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(min(deg) AS BIGINT) AS min_deg, CAST(max(deg) AS BIGINT) AS max_deg
        |FROM d GROUP BY 1 ORDER BY deg_bin""".stripMargin,

    // smallest v with cumweight*100 >= p*total; integer throughout
    "b84_weighted_pctile" ->
      """WITH g AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT v, CAST(sum(w) OVER (ORDER BY v) AS BIGINT) AS cw,
        |        CAST(sum(w) OVER () AS BIGINT) AS tot FROM g),
        |p AS (SELECT unnest([50, 90, 99]) AS pct)
        |SELECT pct, CAST(min(CASE WHEN cw * 100 >= pct * tot THEN v END) AS BIGINT) AS value_v,
        |  CAST(max(tot) AS BIGINT) AS total_w
        |FROM c CROSS JOIN p GROUP BY pct ORDER BY pct""".stripMargin,

    // the bucketed construction is engine-local; the CONTRACT is plain
    // dense rank from zero
    "c84_contiguous_ids" ->
      """SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same canonical-key rule as c71; integer milli rates, floor division
    // of non-negative operands
    "c85_source_report" ->
      """WITH c AS (SELECT source, n_chars,
        |    CASE WHEN coalesce(lang, '') = 'en' THEN 1 ELSE 0 END AS is_en,
        |    CAST(('0x' || substring(md5(array_to_string(list_filter(
        |      string_split(lower(translate(coalesce(text, ''), '.,!?;:()"''', '          ')), ' '),
        |      x -> x != ''), ' ')), 1, 15)) AS BIGINT) AS ck
        |  FROM documents),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |        CAST(sum(is_en) AS BIGINT) AS en_docs,
        |        CAST(count(DISTINCT ck) AS BIGINT) AS n_canonical
        |      FROM c GROUP BY source)
        |SELECT source, n_docs, total_chars, total_chars // n_docs AS mean_chars,
        |  (1000 * en_docs) // n_docs AS pct_en_milli,
        |  (1000 * (n_docs - n_canonical)) // n_docs AS dup_rate_milli
        |FROM a ORDER BY source""".stripMargin,

    // c81's sketch-size CTEs + b81's skew + the CASE decision
    "c83_plan_advisor" ->
      """WITH ta AS (SELECT CAST(user_id AS VARCHAR) AS tok FROM events),
        |tb AS (SELECT CAST(c_custkey AS VARCHAR) AS tok FROM customer),
        |ca AS (SELECT g.r AS r,
        |    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS ca
        |  FROM ta CROSS JOIN generate_series(0, 3) g(r) GROUP BY 1, 2),
        |cb AS (SELECT g.r AS r,
        |    CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cb
        |  FROM tb CROSS JOIN generate_series(0, 3) g(r) GROUP BY 1, 2),
        |re AS (SELECT ca.r, CAST(sum(ca.ca * cb.cb) AS BIGINT) AS row_est
        |       FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket GROUP BY 1),
        |es AS (SELECT min(row_est) AS est_join FROM re),
        |sa AS (SELECT CAST(count(*) AS BIGINT) AS na FROM ta),
        |sb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM tb),
        |kc AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
        |kr AS (SELECT c, row_number() OVER (ORDER BY c, k) AS i FROM kc),
        |ka AS (SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(c) AS BIGINT) AS n,
        |       CAST(max(c) AS BIGINT) AS mx FROM kr),
        |sk AS (SELECT (1000 * mx * m) // n AS skew_milli FROM ka)
        |SELECT na, nb, est_join, skew_milli,
        |  CASE WHEN nb <= 1000000 THEN 'broadcast_build_right'
        |       WHEN skew_milli >= 5000 THEN 'salted_smj'
        |       ELSE 'smj' END AS strategy
        |FROM sa, sb, es, sk""".stripMargin,

    // the same three stages composed: c71's canonical key -> min-id rep
    // (rank-1), c29-style token band, c68's per-shard recursive packing
    "c77_e2e_curation" ->
      """WITH RECURSIVE c AS (SELECT doc_id, text,
        |  CAST(('0x' || substring(md5(array_to_string(list_filter(
        |    string_split(lower(translate(coalesce(text, ''), '.,!?;:()"''', '          ')), ' '),
        |    x -> x != ''), ' ')), 1, 15)) AS BIGINT) AS ck,
        |  CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY ck ORDER BY doc_id) AS rn FROM c),
        |surv AS (SELECT doc_id, doc_id % 8 AS shard, n_tok FROM r
        |         WHERE rn = 1 AND n_tok BETWEEN 20 AND 500),
        |o AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS srn FROM surv),
        |p(shard, doc_id, n_tok, srn, pack, fill) AS (
        |  SELECT shard, doc_id, n_tok, srn, CAST(0 AS BIGINT), n_tok FROM o WHERE srn = 1
        |  UNION ALL
        |  SELECT o.shard, o.doc_id, o.n_tok, o.srn,
        |    CASE WHEN p.fill + o.n_tok > 128 THEN p.pack + 1 ELSE p.pack END,
        |    CASE WHEN p.fill + o.n_tok > 128 THEN o.n_tok ELSE p.fill + o.n_tok END
        |  FROM p JOIN o ON o.shard = p.shard AND o.srn = p.srn + 1)
        |SELECT doc_id, shard, pack, n_tok FROM p ORDER BY doc_id""".stripMargin,

    // same fixed ASCII canonicalization (lower + 10-char punctuation map +
    // empty-token drop), same 60-bit md5 group key
    "c71_canonical_dedup" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(('0x' || substring(md5(array_to_string(list_filter(
        |    string_split(lower(translate(coalesce(text, ''), '.,!?;:()"''', '          ')), ' '),
        |    x -> x != ''), ' ')), 1, 15)) AS BIGINT) AS ck,
        |  CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS th
        |  FROM documents)
        |SELECT min(doc_id) AS rep_id, CAST(count(*) AS BIGINT) AS n_dups,
        |  CAST(count(DISTINCT th) AS BIGINT) AS n_variants
        |FROM c GROUP BY ck ORDER BY rep_id""".stripMargin,

    // same rolling boundary rule (bigram md5-hash ≡ 0 mod 8), same chunk
    // identity (md5 of the space-joined decimal hash sequence, ordered by
    // position) — chunk numbers are engine-local, identities compare
    "c70_cdc_chunks" ->
      """WITH tk AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM documents),
        |p0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
        |         i -> struct_pack(pos := i,
        |           h := CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1]), 1, 15)) AS BIGINT)))) AS s
        |       FROM tk WHERE len(t) >= 2),
        |p AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM p0),
        |c AS (SELECT doc_id, pos, h,
        |        sum(CASE WHEN h % 8 = 0 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY doc_id ORDER BY pos) AS chunk
        |      FROM p),
        |ch AS (SELECT doc_id, chunk, CAST(count(*) AS BIGINT) AS chunk_len,
        |         CAST(('0x' || substring(md5(string_agg(CAST(h AS VARCHAR), ' ' ORDER BY pos)), 1, 15)) AS BIGINT) AS ch
        |       FROM c GROUP BY doc_id, chunk),
        |nd AS (SELECT ch, count(DISTINCT doc_id) AS nd FROM ch GROUP BY ch)
        |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
        |  CAST(sum(CASE WHEN nd.nd > 1 THEN chunk_len ELSE 0 END) AS BIGINT) AS dup_tokens
        |FROM ch JOIN nd USING (ch) GROUP BY ch.doc_id ORDER BY doc_id""".stripMargin,

    // same exact-long dev; chi2 recomputed with the identical two-IEEE-op
    // order (CAST·CAST then divide) so the per-source ranking agrees
    "c69_source_keyness" ->
      """WITH tk AS (SELECT source, unnest(string_split(coalesce(text, ''), ' ')) AS tok
        |            FROM documents),
        |obs AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS obs FROM tk GROUP BY 1, 2),
        |gl AS (SELECT tok, CAST(sum(obs) AS BIGINT) AS glob FROM obs GROUP BY 1),
        |st AS (SELECT source, CAST(sum(obs) AS BIGINT) AS src_tot FROM obs GROUP BY 1),
        |g AS (SELECT CAST(sum(src_tot) AS BIGINT) AS grand FROM st),
        |sc AS (SELECT o.source, o.tok, o.obs,
        |         o.obs * g.grand - st.src_tot * gl.glob AS dev,
        |         (CAST(o.obs * g.grand - st.src_tot * gl.glob AS DOUBLE) *
        |          CAST(o.obs * g.grand - st.src_tot * gl.glob AS DOUBLE)) /
        |         CAST(st.src_tot * gl.glob * g.grand AS DOUBLE) AS chi2
        |       FROM obs o JOIN gl USING (tok) JOIN st USING (source) CROSS JOIN g),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY chi2 DESC, tok) AS rnk
        |      FROM sc)
        |SELECT source, tok, obs, dev, CAST(rnk AS INTEGER) AS rnk
        |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,

    // the same greedy capacity-reset fold, expressed as a per-shard
    // recursive CTE walking rn → rn+1 (DuckDB's only sequential-fold form)
    "c68_pack_sequences" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |o AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM d),
        |p(shard, doc_id, n_tok, rn, pack, fill) AS (
        |  SELECT shard, doc_id, n_tok, rn, CAST(0 AS BIGINT), n_tok FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.doc_id, o.n_tok, o.rn,
        |    CASE WHEN p.fill + o.n_tok > 128 THEN p.pack + 1 ELSE p.pack END,
        |    CASE WHEN p.fill + o.n_tok > 128 THEN o.n_tok ELSE p.fill + o.n_tok END
        |  FROM p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1)
        |SELECT doc_id, shard, pack, n_tok FROM p ORDER BY doc_id""".stripMargin,
    "c05_dedup_embedding" ->
      """SELECT a.vec_id AS a, b.vec_id AS b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
        |ORDER BY a, b""".stripMargin,
    "c06_ann_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS item_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM q JOIN embeddings e ON e.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |  FROM scored)
        |SELECT query_id, item_id, CAST(rank AS INTEGER) AS rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "c07_ann_ivf" ->
      """WITH cent AS (
        |  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 97 = 0),
        |item_sc AS (
        |  SELECT e.vec_id AS item_id, e.embedding AS iv, c.centroid_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), 6) AS csim
        |  FROM embeddings e CROSS JOIN cent c),
        |item_cell AS (
        |  SELECT item_id, iv, centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item_id ORDER BY csim DESC, centroid_id) AS crank
        |    FROM item_sc) WHERE crank <= 1),
        |q_sc AS (
        |  SELECT e.vec_id AS query_id, e.embedding AS qv, c.centroid_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), 6) AS csim
        |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 5),
        |q_cell AS (
        |  SELECT query_id, qv, centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, centroid_id) AS crank
        |    FROM q_sc) WHERE crank <= 2),
        |scored AS (
        |  SELECT q.query_id, i.item_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(i.iv AS DOUBLE[])), 6) AS cos
        |  FROM item_cell i JOIN q_cell q USING (centroid_id)
        |  WHERE i.item_id != q.query_id)
        |SELECT query_id, item_id, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT query_id, item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |  FROM scored) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "c22_ann_lsh" ->
      """WITH hp AS (
        |  SELECT j, list(CASE WHEN ('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 2))::INTEGER < 128
        |                 THEN 1.0 ELSE -1.0 END ORDER BY k) AS hvec
        |  FROM generate_series(0,4) t1(j), generate_series(0,63) t2(k)
        |  GROUP BY j),
        |sig AS (
        |  SELECT e.vec_id, e.embedding,
        |    CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), hp.hvec) >= 0
        |             THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM embeddings e, hp
        |  GROUP BY e.vec_id, e.embedding),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS qv,
        |    CASE WHEN m < 0 THEN bucket ELSE xor(bucket, (1::BIGINT << m)) END AS pbucket
        |  FROM sig, generate_series(-1,4) t(m)
        |  WHERE vec_id < 5),
        |cand AS (
        |  SELECT p.query_id, s.vec_id AS item_id,
        |    round(list_cosine_similarity(CAST(p.qv AS DOUBLE[]), CAST(s.embedding AS DOUBLE[])), 6) AS cos
        |  FROM probes p JOIN sig s ON s.bucket = p.pbucket AND s.vec_id != p.query_id)
        |SELECT query_id, item_id, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT query_id, item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |  FROM cand) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "c39_ann_int8_rerank" ->
      // identical arithmetic to Ann.int8Rerank: the int8 dot/norms are
      // exact integers (≤ 64·127² ≪ 2⁵³ — exact even when folded in
      // doubles, any order), the coarse score one fixed IEEE sequence
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
        |qz AS (SELECT vec_id, v,
        |        list_transform(v, x -> CAST(floor(x * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END) + 0.5) AS BIGINT)) AS q
        |       FROM m),
        |n AS (SELECT vec_id, v, q,
        |        CAST(list_inner_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[])) AS BIGINT) AS n2 FROM qz),
        |qs AS (SELECT vec_id AS query_id, v AS qv, q AS qq, n2 AS qn2 FROM n WHERE vec_id < 5 AND n2 > 0),
        |it AS (SELECT vec_id AS item_id, v AS iv, q AS iq, n2 AS in2 FROM n WHERE n2 > 0),
        |coarse AS (
        |  SELECT qs.query_id, it.item_id,
        |    list_inner_product(CAST(it.iq AS DOUBLE[]), CAST(qs.qq AS DOUBLE[]))
        |      / (sqrt(CAST(it.in2 AS DOUBLE)) * sqrt(CAST(qs.qn2 AS DOUBLE))) AS icos
        |  FROM it JOIN qs ON it.item_id != qs.query_id),
        |surv AS (SELECT query_id, item_id FROM (
        |  SELECT query_id, item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY icos DESC, item_id) AS crank
        |  FROM coarse) WHERE crank <= 50),
        |ex AS (SELECT s.query_id, s.item_id,
        |    round(list_cosine_similarity(it.iv, qs.qv), 6) AS cos
        |  FROM surv s JOIN it ON it.item_id = s.item_id JOIN qs ON qs.query_id = s.query_id)
        |SELECT query_id, item_id, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT query_id, item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |  FROM ex) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "c23_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "c24_pack_shards" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens FROM documents)
        |SELECT doc_id, ws_tokens,
        |  CAST(floor(coalesce(sum(ws_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 10000.0) AS BIGINT) AS shard
        |FROM w ORDER BY doc_id""".stripMargin,
    "c28_boilerplate" -> (shingleCte +
      """,
        |ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |boiler AS (SELECT g FROM (SELECT g, count(*) AS df FROM ex GROUP BY g) WHERE df >= 5),
        |per AS (SELECT ex.doc_id, count(*) AS n_boiler FROM ex JOIN boiler USING (g) GROUP BY ex.doc_id)
        |SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_sh,
        |  CAST(coalesce(per.n_boiler, 0) AS BIGINT) AS n_boiler,
        |  CAST(coalesce(per.n_boiler, 0) AS DOUBLE) / CAST(len(s.sh) AS DOUBLE) AS boiler_ratio
        |FROM s LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin),
    "c29_length_filter" ->
      """WITH hist AS (
        |  SELECT lang, n_chars AS v, count(*) AS cnt FROM documents GROUP BY 1, 2),
        |c AS (
        |  SELECT lang, v, cnt,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM hist),
        |cuts AS (
        |  SELECT lang,
        |    min(v) FILTER (cum * 100 >= 5 * n) AS lo_cut,
        |    min(v) FILTER (cum * 100 >= 95 * n) AS hi_cut
        |  FROM c GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN cuts USING (lang)
        |WHERE d.n_chars BETWEEN lo_cut AND hi_cut
        |ORDER BY d.doc_id""".stripMargin,
    "c41_quality_gate" ->
      // qn mirrors c35's integer-exact rational; the cut is the c29
      // histogram construction scanned from the top bucket
      """WITH q AS (
        |  SELECT doc_id, lang,
        |    ((50 * len(list_distinct(t))
        |      + 20 * len(list_filter(t, tk -> tk IN ('the','a','of','and','to','in','is','it')))
        |      + 3 * least(CAST(list_sum(list_transform(t, tk -> length(tk))) AS BIGINT), 10 * len(t)))
        |     * 1000000000 + 50 * len(t)) // (100 * len(t)) AS qn
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)),
        |qb AS (SELECT doc_id, lang, qn, qn // 1000000 AS qmilli FROM q),
        |hist AS (SELECT lang, qmilli, count(*) AS cnt FROM qb GROUP BY 1, 2),
        |c AS (
        |  SELECT lang, qmilli, cnt,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY qmilli DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM hist),
        |cuts AS (
        |  SELECT lang, max(qmilli) FILTER (cum * 100 >= 50 * n) AS q_cut
        |  FROM c GROUP BY lang)
        |SELECT qb.doc_id, qb.lang, qb.qn, qb.qmilli
        |FROM qb JOIN cuts USING (lang)
        |WHERE qb.qmilli >= q_cut
        |ORDER BY qb.doc_id""".stripMargin,
    "c25_contamination" -> (shingleCte +
      """,
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 10 = 7),
        |tr AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 10 != 7),
        |ov AS (
        |  SELECT tr.doc_id AS train_id, e.doc_id AS eval_id, count(DISTINCT tr.g) AS novl
        |  FROM tr JOIN e ON tr.g = e.g
        |  GROUP BY tr.doc_id, e.doc_id
        |  HAVING count(DISTINCT tr.g) >= 5)
        |SELECT train_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
        |  CAST(max(novl) AS BIGINT) AS max_overlap
        |FROM ov GROUP BY train_id ORDER BY train_id""".stripMargin),
    "c26_stratified_sample" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |      WHEN en > es AND en > 0 THEN 'en'
        |      WHEN es > en AND es > 0 THEN 'es'
        |      ELSE 'und' END AS lang
        |  FROM (
        |    SELECT doc_id, text,
        |      len(list_filter(string_split(text,' '), tk -> tk IN ('the','a','of','and','to','in','is','it'))) AS en,
        |      len(list_filter(string_split(text,' '), tk -> tk IN ('el','la','de','y','que','en','un','es'))) AS es
        |    FROM documents))
        |SELECT doc_id, lang FROM l
        |WHERE (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100)
        |      < (CASE WHEN lang = 'en' THEN 30 ELSE 100 END)
        |ORDER BY doc_id""".stripMargin,
    "c27_dedup_best" -> (shingleCte +
      """,
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sh, b.sh)) >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))),
        |e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
        |r AS (
        |  WITH RECURSIVE reach(id, x) AS (
        |    SELECT src, src FROM e
        |    UNION
        |    SELECT e.src, reach.x FROM e JOIN reach ON reach.id = e.dst)
        |  SELECT id, min(x) AS rep FROM reach GROUP BY id),
        |q AS (
        |  SELECT doc_id,
        |    (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.5
        |      + (CAST(len(list_filter(t, tk -> tk IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.2
        |      + least(CAST(list_sum(list_transform(t, tk -> length(tk))) AS DOUBLE) / CAST(len(t) AS DOUBLE) / 10.0, 1.0) * 0.3 AS score
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
        |SELECT rep AS cluster_rep, id AS best_doc, score AS best_score FROM (
        |  SELECT r.rep, r.id, q.score,
        |    row_number() OVER (PARTITION BY r.rep ORDER BY q.score DESC, r.id) AS rk
        |  FROM r JOIN q ON q.doc_id = r.id)
        |WHERE rk = 1 ORDER BY cluster_rep""".stripMargin),
    "c08_lang_id" ->
      """SELECT doc_id,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |    WHEN en > es AND en > 0 THEN 'en'
        |    WHEN es > en AND es > 0 THEN 'es'
        |    ELSE 'und' END AS pred_lang
        |FROM (
        |  SELECT doc_id, text,
        |    len(list_filter(string_split(text,' '), tk -> tk IN ('the','a','of','and','to','in','is','it'))) AS en,
        |    len(list_filter(string_split(text,' '), tk -> tk IN ('el','la','de','y','que','en','un','es'))) AS es
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "c09_quality" ->
      """SELECT doc_id,
        |  CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
        |  CAST(len(list_filter(t, tk -> tk IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stop,
        |  (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.5
        |    + (CAST(len(list_filter(t, tk -> tk IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.2
        |    + least(CAST(list_sum(list_transform(t, tk -> length(tk))) AS DOUBLE) / CAST(len(t) AS DOUBLE) / 10.0, 1.0) * 0.3 AS score
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "c10_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    // outer CAST(.. AS BIGINT): DuckDB's sum over BIGINT returns HUGEINT
    // (decimal128); Spark writes int64 — same values, different physical type.
    "c11_fingerprint" ->
      """SELECT doc_id,
        |  CAST(sum(((CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 2147483647)
        |       * (((pos - 1) % 64) + 1)) % 2147483647) % 2147483647 AS BIGINT) AS fp
        |FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // transitive closure of the exact-jaccard pair graph via recursive CTE;
    // min reachable id = cluster representative
    "c17_dedup_clusters" -> ccClustersSql,
    // only pairs sharing >= 1 shingle can rank (jaccard > 0) — matches
    // the Spark co-count kernel's support exactly; same integer milli
    // score, same (a, b) tie-break
    "c76_top_similar_pairs" ->
      (shingleCte +
        """,
          |pp AS (
          |  SELECT a.doc_id AS a, b.doc_id AS b,
          |    len(list_intersect(a.sh, b.sh)) AS i,
          |    len(list_distinct(list_concat(a.sh, b.sh))) AS u
          |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
          |SELECT a, b, CAST((1000 * i) // u AS BIGINT) AS milli_jaccard
          |FROM pp WHERE i > 0
          |ORDER BY milli_jaccard DESC, a, b LIMIT 20""".stripMargin),
    // c75 = the identical cluster assignment derived by star contraction
    // instead of pointer jumping — one CC semantics, one oracle
    "c75_cc_stars" -> ccClustersSql,
    "c18_dedup_apply" ->
      (shingleCte +
        """,
          |p AS (
          |  SELECT a.doc_id AS a, b.doc_id AS b
          |  FROM s a JOIN s b ON a.doc_id < b.doc_id
          |  WHERE len(list_intersect(a.sh, b.sh)) >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))),
          |e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
          |r AS (
          |  WITH RECURSIVE reach(id, x) AS (
          |    SELECT src, src FROM e
          |    UNION
          |    SELECT e.src, reach.x FROM e JOIN reach ON reach.id = e.dst)
          |  SELECT id, min(x) AS rep FROM reach GROUP BY id)
          |SELECT doc_id, lang, n_chars FROM documents
          |WHERE doc_id NOT IN (SELECT id FROM r WHERE id != rep)
          |ORDER BY doc_id""".stripMargin),
    "c19_tfidf" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (
        |  SELECT doc_id, tok, tf, df, CAST(tf AS DOUBLE) * n / df AS score
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, tok, tf, df,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank
        |  FROM sc)
        |SELECT doc_id, tok, tf, df, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "c20_embedding_clusters" ->
      """WITH p AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.42),
        |e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
        |r AS (
        |  WITH RECURSIVE reach(id, x) AS (
        |    SELECT src, src FROM e
        |    UNION
        |    SELECT e.src, reach.x FROM e JOIN reach ON reach.id = e.dst)
        |  SELECT id, x FROM reach)
        |SELECT id AS vec_id, min(x) AS cluster_rep
        |FROM r GROUP BY id ORDER BY vec_id""".stripMargin,
    "c43_weighted_sample" ->
      """WITH w AS (SELECT doc_id, least(len(string_split(text, ' ')), 64) AS w FROM documents),
        |t AS (SELECT doc_id,
        |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) AS ticket
        |      FROM w CROSS JOIN generate_series(0, 63) g(j) WHERE j < w),
        |k AS (SELECT doc_id, min(ticket) AS tick_min FROM t GROUP BY doc_id)
        |SELECT doc_id, tick_min FROM k ORDER BY tick_min, doc_id LIMIT 100""".stripMargin,

    "c44_dup_spans" ->
      // positional (non-distinct) 5-token spans, the same 60-bit md5
      // token-hash convention as the shingle CTE; dup = span text seen in
      // >= 2 distinct docs, counted per position
      """WITH sp AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-4),
        |    i -> CAST(('0x' || substring(md5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]), 1, 15)) AS BIGINT))) AS h
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 5),
        |dup AS (SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |tot AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id),
        |dc AS (SELECT sp.doc_id, count(*) AS dup_spans FROM sp JOIN dup USING (h) GROUP BY sp.doc_id)
        |SELECT tot.doc_id, tot.n_spans, coalesce(dc.dup_spans, CAST(0 AS BIGINT)) AS dup_spans
        |FROM tot LEFT JOIN dc USING (doc_id) ORDER BY doc_id""".stripMargin,

    "c45_pagerank" ->
      // 3 unrolled rounds of the exact integer recurrence
      // r' = 150e6 + sum (85*r) // (100*deg) over the symmetrized distinct
      // customer<->supplier trade edges; node namespaces disjoint by parity
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |n AS (SELECT c_custkey * 2 AS node FROM customer
        |      UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN d ON e.src = d.src),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT ed.dst, CAST(sum((85 * r0.r) // (100 * ed.deg)) AS BIGINT) AS cs
        |       FROM ed JOIN r0 ON r0.node = ed.src GROUP BY ed.dst),
        |r1 AS (SELECT n.node, 150000000 + coalesce(c1.cs, 0) AS r FROM n LEFT JOIN c1 ON c1.dst = n.node),
        |c2 AS (SELECT ed.dst, CAST(sum((85 * r1.r) // (100 * ed.deg)) AS BIGINT) AS cs
        |       FROM ed JOIN r1 ON r1.node = ed.src GROUP BY ed.dst),
        |r2 AS (SELECT n.node, 150000000 + coalesce(c2.cs, 0) AS r FROM n LEFT JOIN c2 ON c2.dst = n.node),
        |c3 AS (SELECT ed.dst, CAST(sum((85 * r2.r) // (100 * ed.deg)) AS BIGINT) AS cs
        |       FROM ed JOIN r2 ON r2.node = ed.src GROUP BY ed.dst),
        |r3 AS (SELECT n.node, 150000000 + coalesce(c3.cs, 0) AS r FROM n LEFT JOIN c3 ON c3.dst = n.node)
        |SELECT node, CAST(r AS BIGINT) AS rank_nano FROM r3 ORDER BY node""".stripMargin,

    "c46_bigrams" ->
      """WITH b AS (
        |  SELECT unnest(list_transform(generate_series(1, len(t)-1),
        |    i -> t[i] || ' ' || t[i+1])) AS bigram
        |  FROM (SELECT string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 2)
        |SELECT bigram, count(*) AS n FROM b
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""".stripMargin,

    "c47_dup_run" ->
      // positional spans with 1-based positions; islands via
      // pos - row_number per doc; docs with >= 5 tokens and no dup
      // positions report 0
      """WITH sp AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-4),
        |    i -> {'pos': i, 'h': CAST(('0x' || substring(md5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]), 1, 15)) AS BIGINT)})) AS u
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 5),
        |sp2 AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM sp),
        |dup AS (SELECT h FROM sp2 GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |dp AS (SELECT sp2.doc_id, sp2.pos FROM sp2 JOIN dup USING (h)),
        |g AS (SELECT doc_id, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dp),
        |r AS (SELECT doc_id, grp, count(*) AS run FROM g GROUP BY 1, 2),
        |m AS (SELECT doc_id, max(run) AS max_dup_run FROM r GROUP BY 1)
        |SELECT d.doc_id, coalesce(m.max_dup_run, CAST(0 AS BIGINT)) AS max_dup_run
        |FROM (SELECT DISTINCT doc_id FROM sp2) d LEFT JOIN m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "c48_source_overlap" ->
      """WITH sp AS (
        |  SELECT DISTINCT source AS src, h FROM (
        |    SELECT source, unnest(list_transform(generate_series(1, len(t)-4),
        |      i -> CAST(('0x' || substring(md5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]), 1, 15)) AS BIGINT))) AS h
        |    FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
        |    WHERE len(t) >= 5))
        |SELECT a.src AS source_a, b.src AS source_b, count(*) AS shared_spans
        |FROM sp a JOIN sp b ON a.h = b.h AND a.src < b.src
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "c55_leakproof_split" ->
      // c17's CC labels; split key = cluster rep (own id for unclustered
      // docs); then exactly c23's md5 bucketing
      (shingleCte +
        """,
          |p AS (
          |  SELECT a.doc_id AS a, b.doc_id AS b
          |  FROM s a JOIN s b ON a.doc_id < b.doc_id
          |  WHERE len(list_intersect(a.sh, b.sh)) >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))),
          |e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
          |r AS (
          |  WITH RECURSIVE reach(id, x) AS (
          |    SELECT src, src FROM e
          |    UNION
          |    SELECT e.src, reach.x FROM e JOIN reach ON reach.id = e.dst)
          |  SELECT id, x FROM reach),
          |m AS (SELECT id, min(x) AS cluster_rep FROM r GROUP BY id),
          |k AS (SELECT d.doc_id, coalesce(m.cluster_rep, d.doc_id) AS skey
          |      FROM documents d LEFT JOIN m ON m.id = d.doc_id)
          |SELECT doc_id,
          |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
          |FROM (SELECT doc_id,
          |  CAST(('0x' || substring(md5(CAST(skey AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
          |  FROM k)
          |ORDER BY doc_id""".stripMargin),

    "c56_bm25_rank" ->
      // same cleared-denominator rationals in pure BIGINT floor division;
      // HUGEINT sums cast back to BIGINT at every output/reuse point
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS a_tokens FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
        |       WHERE tok IN ('dup','merge','stream','window') GROUP BY doc_id, tok),
        |idf AS (SELECT tok,
        |          (1000 * (2 * (st.n_docs - d.df_t) + 1)) // (2 * d.df_t + 1) AS idf_milli
        |        FROM (SELECT tok, count(*) AS df_t FROM tf GROUP BY tok) d, st),
        |term AS (SELECT tf.doc_id,
        |           (idf.idf_milli * 44 * tf.tf * st.a_tokens)
        |           // (20 * tf.tf * st.a_tokens + 6 * st.a_tokens
        |              + 18 * dl.dl * st.n_docs) AS term_milli
        |         FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id), st)
        |SELECT doc_id, count(*) AS n_terms, CAST(sum(term_milli) AS BIGINT) AS score_milli
        |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "c57_hybrid_rrf" ->
      // same c56 BM25 rationals for the lexical leg; c06's rounded
      // list_cosine_similarity for the dense leg; ranks are
      // row_number() over the identical (score DESC, doc_id) total
      // order; fusion = the same 10⁹ // (60 + rank) floor divisions
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS a_tokens FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
        |       WHERE tok IN ('dup','merge','stream','window') GROUP BY doc_id, tok),
        |idf AS (SELECT tok,
        |          (1000 * (2 * (st.n_docs - d.df_t) + 1)) // (2 * d.df_t + 1) AS idf_milli
        |        FROM (SELECT tok, count(*) AS df_t FROM tf GROUP BY tok) d, st),
        |term AS (SELECT tf.doc_id,
        |           (idf.idf_milli * 44 * tf.tf * st.a_tokens)
        |           // (20 * tf.tf * st.a_tokens + 6 * st.a_tokens
        |              + 18 * dl.dl * st.n_docs) AS term_milli
        |         FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id), st),
        |bm AS (SELECT doc_id, CAST(sum(term_milli) AS BIGINT) AS score_milli
        |       FROM term GROUP BY doc_id),
        |bmr AS (SELECT doc_id, CAST(rn AS INTEGER) AS bm25_rank FROM (
        |          SELECT doc_id, row_number() OVER (ORDER BY score_milli DESC, doc_id) AS rn
        |          FROM bm) WHERE rn <= 100),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |cs AS (SELECT e.vec_id AS doc_id,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos
        |       FROM embeddings e, q),
        |csr AS (SELECT doc_id, CAST(rn AS INTEGER) AS cos_rank FROM (
        |          SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rn
        |          FROM cs) WHERE rn <= 100),
        |f AS (SELECT coalesce(b.doc_id, c.doc_id) AS doc_id, b.bm25_rank, c.cos_rank,
        |        CAST(coalesce(1000000000 // (60 + b.bm25_rank), 0)
        |           + coalesce(1000000000 // (60 + c.cos_rank), 0) AS BIGINT) AS rrf_ppb
        |      FROM bmr b FULL OUTER JOIN csr c ON b.doc_id = c.doc_id)
        |SELECT doc_id, bm25_rank, cos_rank, rrf_ppb,
        |  CAST(row_number() OVER (ORDER BY rrf_ppb DESC, doc_id) AS INTEGER) AS fused_rank
        |FROM f ORDER BY fused_rank""".stripMargin,

    "c61_source_cap" ->
      // c09's score formula + per-source row_number cap; the score
      // doubles are bit-identical across engines (c09 hash-matches), so
      // ranking on them is stable; doc_id breaks ties totally
      """WITH q AS (
        |  SELECT doc_id, source,
        |    (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.5
        |    + (CAST(len(list_filter(t, tk -> tk IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 0.2
        |    + least(CAST(list_sum(list_transform(t, tk -> length(tk))) AS DOUBLE) / CAST(len(t) AS DOUBLE) / 10.0, 1.0) * 0.3 AS score
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents))
        |SELECT doc_id, source, score, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT doc_id, source, score,
        |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rank
        |  FROM q) WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,

    "c62_triangles" ->
      // same degree orientation ((deg, id)-lesser endpoint first) and
      // wedge-closure join over the c04 exact-jaccard pair graph.
      // p is MATERIALIZED: deg/o reference it three times and DuckDB
      // would otherwise inline (re-evaluate) the quadratic intersect
      // join per reference — measured 3× the c04 CTE cost at sf0.1
      // (~16 min materialized; fine at the sf0.01 gate)
      (shingleCte +
        """,
          |p AS MATERIALIZED (
          |  SELECT a.doc_id AS a, b.doc_id AS b
          |  FROM s a JOIN s b ON a.doc_id < b.doc_id
          |  WHERE len(list_intersect(a.sh, b.sh)) >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))),
          |deg AS (SELECT node, count(*) AS deg FROM (
          |          SELECT a AS node FROM p UNION ALL SELECT b AS node FROM p)
          |        GROUP BY node),
          |o AS (SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND p.a < p.b)
          |             THEN p.a ELSE p.b END AS u,
          |             CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND p.a < p.b)
          |             THEN p.b ELSE p.a END AS v
          |      FROM p JOIN deg d1 ON d1.node = p.a JOIN deg d2 ON d2.node = p.b),
          |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
          |        FROM o e1 JOIN o e2 ON e1.v = e2.u
          |        WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.u = e1.u AND e3.v = e2.v))
          |SELECT node, count(*) AS n_tri FROM (
          |  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          |  UNION ALL SELECT z FROM tri)
          |GROUP BY node ORDER BY node""".stripMargin),

    "c63_semantic_dedup" ->
      // c07's centroid convention + argmax cell assignment; keep-lowest-id
      // within-cell greedy at the c05 threshold
      """WITH cent AS (
        |  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 97 = 0),
        |sc AS (
        |  SELECT e.vec_id, e.embedding, c.centroid_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])), 6) AS csim
        |  FROM embeddings e CROSS JOIN cent c),
        |cell AS (
        |  SELECT vec_id, embedding, centroid_id AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) AS crank
        |    FROM sc) WHERE crank = 1),
        |dup AS (
        |  SELECT DISTINCT y.vec_id
        |  FROM cell x JOIN cell y ON x.cell = y.cell AND x.vec_id < y.vec_id
        |  WHERE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]), CAST(y.embedding AS DOUBLE[])), 6) >= 0.35)
        |SELECT c.vec_id, c.cell, d.vec_id IS NULL AS kept
        |FROM cell c LEFT JOIN dup d ON d.vec_id = c.vec_id
        |ORDER BY c.vec_id""".stripMargin,

    "c64_ref_lm_filter" ->
      // c58's bin-length arithmetic with +1 smoothing; reference counts
      // filtered to src0–src3 on both engines
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, source, unnest(list_transform(generate_series(1, len(t)-1),
        |         i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
        |       FROM tk WHERE len(t) >= 2),
        |b AS (SELECT doc_id, source, p.w1 AS w1, p.w2 AS w2 FROM bg),
        |r2 AS (SELECT w1, w2, count(*) AS r2 FROM b
        |       WHERE source IN ('src0','src1','src2','src3') GROUP BY w1, w2),
        |r1 AS (SELECT w1, count(*) AS r1 FROM b
        |       WHERE source IN ('src0','src1','src2','src3') GROUP BY w1),
        |sc AS (SELECT b.doc_id,
        |        length(bin(coalesce(r2.r2, 0) + 1)) AS l2,
        |        length(bin(coalesce(r1.r1, 0) + 1)) AS l1
        |       FROM b LEFT JOIN r2 ON b.w1 = r2.w1 AND b.w2 = r2.w2
        |              LEFT JOIN r1 ON b.w1 = r1.w1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(l1 - l2) AS BIGINT) AS ref_surprisal_sum,
        |  CAST((1000 * sum(l1 - l2)) // count(*) AS BIGINT) AS surp_milli
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "c66_kcore" ->
      // the same 4 unrolled synchronized peels; every stage MATERIALIZED
      // (each is referenced twice — inlined, DuckDB would re-evaluate the
      // chain exponentially back to the quadratic pair join)
      (shingleCte +
        """,
          |p AS MATERIALIZED (
          |  SELECT a.doc_id AS a, b.doc_id AS b
          |  FROM s a JOIN s b ON a.doc_id < b.doc_id
          |  WHERE len(list_intersect(a.sh, b.sh)) >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))),
          |d0 AS (SELECT node, count(*) AS deg FROM (
          |         SELECT a AS node FROM p UNION ALL SELECT b AS node FROM p) GROUP BY node),
          |e1 AS MATERIALIZED (SELECT a, b FROM p
          |  WHERE a IN (SELECT node FROM d0 WHERE deg >= 2)
          |    AND b IN (SELECT node FROM d0 WHERE deg >= 2)),
          |d1 AS (SELECT node, count(*) AS deg FROM (
          |         SELECT a AS node FROM e1 UNION ALL SELECT b AS node FROM e1) GROUP BY node),
          |e2 AS MATERIALIZED (SELECT a, b FROM e1
          |  WHERE a IN (SELECT node FROM d1 WHERE deg >= 2)
          |    AND b IN (SELECT node FROM d1 WHERE deg >= 2)),
          |d2 AS (SELECT node, count(*) AS deg FROM (
          |         SELECT a AS node FROM e2 UNION ALL SELECT b AS node FROM e2) GROUP BY node),
          |e3 AS MATERIALIZED (SELECT a, b FROM e2
          |  WHERE a IN (SELECT node FROM d2 WHERE deg >= 2)
          |    AND b IN (SELECT node FROM d2 WHERE deg >= 2)),
          |d3 AS (SELECT node, count(*) AS deg FROM (
          |         SELECT a AS node FROM e3 UNION ALL SELECT b AS node FROM e3) GROUP BY node),
          |e4 AS MATERIALIZED (SELECT a, b FROM e3
          |  WHERE a IN (SELECT node FROM d3 WHERE deg >= 2)
          |    AND b IN (SELECT node FROM d3 WHERE deg >= 2))
          |SELECT node, count(*) AS deg FROM (
          |  SELECT a AS node FROM e4 UNION ALL SELECT b AS node FROM e4)
          |GROUP BY node ORDER BY node""".stripMargin),

    "c65_sorted_neighborhood" ->
      // identical bottom-1-sketch ordering (60-bit md5 shingle hashes,
      // the Text.tokenHash convention), rank-window candidates, c04
      // integer-size jaccard verify
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
        |        i -> CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15)) AS BIGINT))) AS sh
        |      FROM tk WHERE len(t) >= 3),
        |r AS (SELECT doc_id, sh,
        |        row_number() OVER (ORDER BY list_min(sh), doc_id) AS rn FROM s),
        |cand AS (SELECT x.doc_id AS xa, x.sh AS xsh, y.doc_id AS yb, y.sh AS ysh
        |         FROM r x JOIN r y ON y.rn > x.rn AND y.rn <= x.rn + 8)
        |SELECT least(xa, yb) AS a, greatest(xa, yb) AS b
        |FROM cand
        |WHERE len(list_intersect(xsh, ysh)) >= 0.8 * len(list_distinct(list_concat(xsh, ysh)))
        |ORDER BY a, b""".stripMargin,

    "c59_pq_encode" ->
      // identical integer arithmetic: micro-quantized components, exact
      // BIGINT squared L2 per subspace, argmin tie-broken on code id; ADC
      // = sum of the assigned codewords' distances to vec 0's subvectors
      (pqCte +
        "\nSELECT vec_id, c0, c1, c2, c3, adc_micro2 FROM pq ORDER BY vec_id"),

    "c58_bigram_lm_score" ->
      // identical integer arithmetic: surprisal per position =
      // len(bin(c1)) - len(bin(c2)) (the floor-log2 -1s cancel); both
      // counts >= 1 because every observed bigram is its own evidence
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
        |         i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
        |       FROM tk WHERE len(t) >= 2),
        |b AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
        |lk AS (SELECT c2.w1, c2.w2, length(bin(c1.c1)) - length(bin(c2.c2)) AS surp
        |       FROM c2 JOIN c1 USING (w1))
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  CAST(sum(lk.surp) AS BIGINT) AS surprisal_sum
        |FROM b JOIN lk ON b.w1 = lk.w1 AND b.w2 = lk.w2
        |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,

    "c54_token_rarity" ->
      // floor(log2 n) = len(bin(n))-1 — DuckDB bin() mirrors Spark's
      // conv(n,10,2) exactly for positive counts
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT tok, count(*) AS tf FROM tk GROUP BY tok)
        |SELECT tk.doc_id, count(*) AS n_tokens,
        |  CAST(sum(length(bin(tf.tf)) - 1) AS BIGINT) AS log_tf_sum
        |FROM tk JOIN tf ON tk.tok = tf.tok
        |GROUP BY tk.doc_id ORDER BY doc_id""".stripMargin,

    "c53_soft_dedup_weights" ->
      // c17's recursive-CC oracle + per-cluster sizes; weight = 1e6 // k
      (shingleCte +
        """,
          |p AS (
          |  SELECT a.doc_id AS a, b.doc_id AS b
          |  FROM s a JOIN s b ON a.doc_id < b.doc_id
          |  WHERE len(list_intersect(a.sh, b.sh)) >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))),
          |e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
          |r AS (
          |  WITH RECURSIVE reach(id, x) AS (
          |    SELECT src, src FROM e
          |    UNION
          |    SELECT e.src, reach.x FROM e JOIN reach ON reach.id = e.dst)
          |  SELECT id, x FROM reach),
          |m AS (SELECT id, min(x) AS cluster_rep FROM r GROUP BY id),
          |cl AS (SELECT cluster_rep, count(*) AS k FROM m GROUP BY cluster_rep)
          |SELECT m.id AS doc_id, cl.k, CAST(1000000 // cl.k AS BIGINT) AS weight_ppm
          |FROM m JOIN cl ON m.cluster_rep = cl.cluster_rep
          |ORDER BY doc_id""".stripMargin),

    "c52_minhash_calibration" ->
      // exact inter/uni over the 60-bit HASH sets (identical collision
      // behavior to Spark by construction) + the c37 full-minhash
      // replication for the signature agreement
      (shingleCte +
        """,
          |hs AS (SELECT doc_id, list_distinct(list_transform(sh, x ->
          |        CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT))) AS hs FROM s),
          |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
          |        len(list_intersect(a.hs, b.hs)) AS inter,
          |        len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS uni
          |      FROM hs a JOIN hs b ON a.doc_id < b.doc_id
          |      WHERE len(list_intersect(a.hs, b.hs)) >=
          |            0.8 * (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))),
          |perm AS (SELECT i,
          |        CASE WHEN (1103515245 * (i+1) + 12345) % 2147483647 = 0 THEN 1
          |             ELSE (1103515245 * (i+1) + 12345) % 2147483647 END AS a,
          |        (69069 * (i+1) + 1) % 2147483647 AS b
          |        FROM generate_series(0, 63) g(i)),
          |sig AS (SELECT h.doc_id, p.i,
          |        min((p.a * (h.h % 2147483647) + p.b) % 2147483647) AS sg
          |        FROM (SELECT doc_id, unnest(hs) AS h FROM hs) h CROSS JOIN perm p
          |        GROUP BY h.doc_id, p.i),
          |sigl AS (SELECT doc_id, list(sg ORDER BY i) AS sig FROM sig GROUP BY doc_id)
          |SELECT p.a, p.b, CAST(p.inter AS BIGINT) AS inter, CAST(p.uni AS BIGINT) AS uni,
          |  CAST(len(list_filter(generate_series(1, 64), i -> sa.sig[i] = sb.sig[i])) AS INTEGER) AS n_agree
          |FROM p JOIN sigl sa ON sa.doc_id = p.a JOIN sigl sb ON sb.doc_id = p.b
          |ORDER BY a, b""".stripMargin),

    "c51_dedup_report" ->
      // same recursive-CC oracle as c17, summarized to the per-size
      // report: clusters of size k and the k-1 docs a keep-one removes
      (shingleCte +
        """,
          |p AS (
          |  SELECT a.doc_id AS a, b.doc_id AS b
          |  FROM s a JOIN s b ON a.doc_id < b.doc_id
          |  WHERE len(list_intersect(a.sh, b.sh)) >= 0.8 * len(list_distinct(list_concat(a.sh, b.sh)))),
          |e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
          |r AS (
          |  WITH RECURSIVE reach(id, x) AS (
          |    SELECT src, src FROM e
          |    UNION
          |    SELECT e.src, reach.x FROM e JOIN reach ON reach.id = e.dst)
          |  SELECT id, x FROM reach),
          |cl AS (SELECT cluster_rep, count(*) AS k FROM (
          |         SELECT id, min(x) AS cluster_rep FROM r GROUP BY id)
          |       GROUP BY cluster_rep)
          |SELECT k, count(*) AS n_clusters, CAST(sum(k - 1) AS BIGINT) AS docs_removed
          |FROM cl GROUP BY k ORDER BY k""".stripMargin),

    "c50_span_novelty" ->
      """WITH sp AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-4),
        |    i -> CAST(('0x' || substring(md5(t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]), 1, 15)) AS BIGINT))) AS h
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 5),
        |b AS (SELECT doc_id, h FROM sp WHERE doc_id % 10 = 7),
        |ch AS (SELECT DISTINCT h FROM sp WHERE doc_id % 10 <> 7),
        |tot AS (SELECT doc_id, count(*) AS n_spans FROM b GROUP BY doc_id),
        |nv AS (SELECT b.doc_id, count(*) AS novel_spans
        |       FROM b WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.h = b.h)
        |       GROUP BY b.doc_id)
        |SELECT tot.doc_id, tot.n_spans, coalesce(nv.novel_spans, CAST(0 AS BIGINT)) AS novel_spans
        |FROM tot LEFT JOIN nv USING (doc_id) ORDER BY doc_id""".stripMargin,

    "c49_containment" ->
      // directed: >= 90% of the CONTAINED doc's distinct shingles appear
      // in the container; integer test 100*inter >= 90*|A|
      (shingleCte +
        """
          |SELECT a.doc_id AS contained, b.doc_id AS container
          |FROM s a JOIN s b ON a.doc_id <> b.doc_id
          |WHERE 100 * len(list_intersect(a.sh, b.sh)) >= 90 * len(a.sh)
          |ORDER BY contained, container""".stripMargin),
    "c42_count_min" ->
      // identical md5 cell hashing; 15 hex chars = 60 bits, positive in
      // both engines, so % and pmod agree
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |ex AS (SELECT tok, count(*) AS tf FROM tk GROUP BY tok
        |       ORDER BY tf DESC, tok LIMIT 20),
        |cells AS (
        |  SELECT r, CAST(('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 256 AS bucket,
        |         count(*) AS cnt
        |  FROM tk CROSS JOIN generate_series(0, 3) g(r)
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT ex.tok, ex.tf, min(coalesce(cells.cnt, 0)) AS est
        |  FROM ex CROSS JOIN generate_series(0, 3) g(r)
        |  LEFT JOIN cells ON cells.r = g.r
        |    AND cells.bucket = CAST(('0x' || substring(md5(CAST(g.r AS VARCHAR) || ':' || ex.tok), 1, 15)) AS BIGINT) % 256
        |  GROUP BY ex.tok, ex.tf)
        |SELECT tok, tf, CAST(est AS BIGINT) AS est, est >= tf AS ok
        |FROM est ORDER BY tf DESC, tok""".stripMargin,
    "c40_cluster_centroids" ->
      // same CC construction as c20, extended with the nano-integer
      // component sums; floor(x·1e9 + 0.5) is per-row IEEE (exact in both
      // engines), integer sums are order-free, the mean one IEEE division
      """WITH p AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.42),
        |e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
        |r AS (
        |  WITH RECURSIVE reach(id, x) AS (
        |    SELECT src, src FROM e
        |    UNION
        |    SELECT e.src, reach.x FROM e JOIN reach ON reach.id = e.dst)
        |  SELECT id, x FROM reach),
        |mem AS (SELECT id, min(x) AS cluster_rep FROM r GROUP BY id),
        |ev AS (SELECT m.cluster_rep, CAST(emb.embedding AS DOUBLE[]) AS v
        |       FROM mem m JOIN embeddings emb ON emb.vec_id = m.id),
        |comp AS (SELECT cluster_rep, CAST(i - 1 AS INTEGER) AS pos,
        |          CAST(floor(v[i] * 1000000000.0 + 0.5) AS BIGINT) AS nano
        |         FROM ev CROSS JOIN generate_series(1, 64) g(i))
        |SELECT cluster_rep, pos, count(*) AS n_members,
        |  CAST(sum(nano) AS BIGINT) AS c_nano,
        |  CAST(sum(nano) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000000.0) AS centroid
        |FROM comp GROUP BY cluster_rep, pos ORDER BY cluster_rep, pos""".stripMargin,
    "c16_repetition" ->
      """SELECT doc_id,
        |  CASE WHEN len(t)-1 > 0 THEN 1.0 - CAST(len(list_distinct(
        |    list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])))
        |    AS DOUBLE) / CAST(len(t)-1 AS DOUBLE) END AS rep2,
        |  CASE WHEN len(t)-2 > 0 THEN 1.0 - CAST(len(list_distinct(
        |    list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
        |    AS DOUBLE) / CAST(len(t)-2 AS DOUBLE) END AS rep3
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "c13_term_freq" ->
      """SELECT tok, count(*) AS tf
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY tf DESC, tok LIMIT 100""".stripMargin,
    "c14_mm_join" ->
      """SELECT doc_id, lang, n_chars, label,
        |  CAST(len(embedding) AS BIGINT) AS dim
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
    // frame stride q = ceil(len/4); frame j covers [j*q, min((j+1)*q, len))
    "c15_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, j,
        |    least(j * ((strlen(text)+3)//4), strlen(text)) AS s,
        |    least((j+1) * ((strlen(text)+3)//4), strlen(text)) AS e,
        |    text
        |  FROM documents CROSS JOIN generate_series(0, 3) g(j)),
        |fr AS (
        |  SELECT doc_id, j, substring(text, CAST(s+1 AS INTEGER), CAST(e-s AS INTEGER)) AS frame
        |  FROM f WHERE e > s)
        |SELECT doc_id AS media_id, CAST(j AS INTEGER) AS frame_idx,
        |  CAST(strlen(frame) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(string_split(frame, ''), c -> ascii(c))) AS BIGINT) AS byte_sum
        |FROM fr ORDER BY media_id, frame_idx""".stripMargin,
    // stride s = ceil(len/64); kept byte positions are 1, 1+s, 1+2s, …
    "c21_mm_resize" ->
      """WITH f AS (
        |  SELECT doc_id, text, strlen(text) AS len,
        |    CAST(ceil(strlen(text) / 64.0) AS INTEGER) AS s
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, len,
        |    CASE WHEN len <= 64 THEN text
        |      ELSE list_aggregate(list_transform(
        |        list_filter(generate_series(1, CAST(len AS INTEGER)), i -> (i-1) % s = 0),
        |        i -> substring(text, i, 1)), 'string_agg', '')
        |      END AS r
        |  FROM f)
        |SELECT doc_id AS media_id, CAST(len AS BIGINT) AS n_bytes,
        |  CAST(strlen(r) AS BIGINT) AS r_bytes,
        |  CAST(coalesce(list_sum(list_transform(string_split(r, ''), c -> ascii(c))), 0) AS BIGINT) AS r_sum
        |FROM k ORDER BY media_id""".stripMargin,
    "c12_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS BIGINT) AS byte_sum,
        |  CAST(len(list_filter(string_split(text, ''), c -> ascii(c) // 64 = 0)) AS BIGINT) AS h0,
        |  CAST(len(list_filter(string_split(text, ''), c -> ascii(c) // 64 = 1)) AS BIGINT) AS h1,
        |  CAST(len(list_filter(string_split(text, ''), c -> ascii(c) // 64 = 2)) AS BIGINT) AS h2,
        |  CAST(len(list_filter(string_split(text, ''), c -> ascii(c) // 64 = 3)) AS BIGINT) AS h3
        |FROM documents ORDER BY media_id""".stripMargin)
}
