package graft

import graft.EntryShared._

/** §2C oracle registry of the [[SparkEntry]] driver contract — the
  * DuckDB twin of [[EntryC]]'s query builders (mechanical r16 split;
  * strings verbatim — byte-identical oracle dump asserted at split
  * time; oracle-only CTE helpers travel with their consumers). */
private[graft] object OraclesC {

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
    // byte-for-byte the c06 oracle: the Spark side serves both join legs
    // from the npy pair layout instead of parquet, and must produce the
    // IDENTICAL ranking — the store-served ≡ parquet-served parity claim
    "c121_ann_npy_topk" ->
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
    // replicates the CASCADE, not brute top-k: coarse cosine on dims
    // [1:8] (1-based inclusive — Spark's slice(v,1,8) elements), exact
    // rank-50 cut with id tiebreaks, then full-vector rerank to top-10;
    // both stages 6dp-rounded (the c06 float discipline)
    "c122_ann_slice_rerank" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |coarse AS (
        |  SELECT q.query_id, e.vec_id AS item_id,
        |    round(list_cosine_similarity(CAST(q.qv[1:8] AS DOUBLE[]), CAST(e.embedding[1:8] AS DOUBLE[])), 6) AS scos
        |  FROM q JOIN embeddings e ON e.vec_id != q.query_id),
        |surv AS (
        |  SELECT query_id, item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY scos DESC, item_id) AS crank
        |  FROM coarse),
        |exact AS (
        |  SELECT s.query_id, s.item_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM surv s
        |  JOIN q ON q.query_id = s.query_id
        |  JOIN embeddings e ON e.vec_id = s.item_id
        |  WHERE s.crank <= 50),
        |ranked AS (
        |  SELECT query_id, item_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
        |  FROM exact)
        |SELECT query_id, item_id, CAST(rank AS INTEGER) AS rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
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
        |         (c.recall_milli >= 990 AND st.cand_pairs <= nd.n_docs * 20) AS eligible,
        |         row_number() OVER (ORDER BY
        |           (c.recall_milli >= 990 AND st.cand_pairs <= nd.n_docs * 20) DESC,
        |           st.cand_pairs, c.bands) AS rn
        |       FROM st JOIN cfg c USING (bands) CROSS JOIN nd)
        |SELECT CAST(bands AS INTEGER) AS bands, rows_per_band, threshold_milli,
        |  recall_milli, hot_buckets, max_bucket, cand_pairs, eligible,
        |  (eligible AND rn = 1) AS chosen
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
  )

}
