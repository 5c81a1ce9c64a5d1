package graft

import graft.EntryShared._

/** Second half of the §2C oracle registry (mechanical r17 split of
  * [[OraclesC]] at the c90 entry boundary; strings verbatim —
  * byte-identical oracle dump asserted at split time). */
private[graft] object OraclesC2 {

  private[graft] val cOracles2: Map[String, String] = Map(
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
    // c123 = the c07 IVF oracle verbatim: the npy layout roundtrips raw
    // IEEE bits (b129), so store-served IVF must equal parquet-served
    // IVF bit-for-bit — the oracle keeps reading the parquet original
    "c123_ann_npy_ivf" ->
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
        |  CAST((coalesce(sum(ws_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 10000) AS BIGINT) AS shard
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
