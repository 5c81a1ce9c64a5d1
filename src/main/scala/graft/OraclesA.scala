package graft

import graft.EntryShared._

/** §2A oracle registry of the [[SparkEntry]] driver contract — the
  * DuckDB twin of [[EntryA]]'s query builders (mechanical r16 split;
  * strings verbatim — byte-identical oracle dump asserted at split
  * time; oracle-only CTE helpers travel with their consumers). */
private[graft] object OraclesA {

  private[graft] val aOracles: Map[String, String] = Map(
    "a01_fieldname" ->
      """SELECT l_orderkey AS okey, l_linenumber AS ln, l_quantity AS qty
        |FROM lineitem ORDER BY okey, ln, qty""".stripMargin,
    "a02_recordname" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey",
    "a03_project" ->
      """SELECT l_orderkey, count(*) AS n, sum(l_quantity) AS total_qty
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a04_keep" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "a05_drop" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "a06_split" ->
      """SELECT l_orderkey, count(*) AS n, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a07_merge" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty_price
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a08_parent" ->
      """SELECT l_orderkey AS okey, l_linenumber AS ln, l_quantity AS qty
        |FROM lineitem ORDER BY okey, ln, qty""".stripMargin,
    "a09_index" ->
      """SELECT l_orderkey,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount) - 1 AS idx,
        |  l_linenumber AS ln, l_quantity AS qty
        |FROM lineitem ORDER BY l_orderkey, idx""".stripMargin,
    "a10_tomask" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN l_discount BETWEEN 0.02 AND 0.04 THEN NULL ELSE l_discount END AS disc_masked
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, disc_masked NULLS FIRST""".stripMargin,
    "a11_flatten" ->
      """SELECT l_orderkey, 2*count(*) AS n_flat,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) + CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_flat
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a12_filter" ->
      """SELECT l_orderkey, count(*) FILTER (WHERE l_quantity > 25) AS n_big
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a13_define" ->
      """SELECT l_orderkey, l_linenumber AS ln, l_quantity AS qty,
        |  l_quantity * l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem ORDER BY l_orderkey, ln, qty, revenue""".stripMargin,
    "a14_map" ->
      """SELECT l_orderkey, l_linenumber AS ln,
        |  l_quantity * l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem ORDER BY l_orderkey, ln, revenue""".stripMargin,
    "a15_reduce" ->
      """SELECT l_orderkey, sum(l_quantity) AS total_qty
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a16_lazy_scan" ->
      """SELECT l_orderkey, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY l_orderkey, l_quantity""".stripMargin,
    "a17_slice" ->
      """SELECT l_orderkey, min(l_linenumber) AS first_ln,
        |  least(count(*), 2) AS n_first2
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a18_union_case" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        |  CASE WHEN event_type = 'purchase' THEN value ELSE NULL END AS purchase_value,
        |  CASE WHEN event_type = 'purchase' THEN NULL
        |       ELSE CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS INTEGER) END AS other_k
        |FROM events ORDER BY event_id""".stripMargin,
    "a19_pointer_gather" ->
      """SELECT e.event_id, e.user_id, c.c_name
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "a20_ingest_json" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS INTEGER) AS k,
        |  CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS INTEGER) AS k2
        |FROM events ORDER BY event_id""".stripMargin,
    "a21_inference" ->
      """SELECT CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS BIGINT) AS k,
        |  count(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,
    "a23_explode_outer" ->
      """SELECT o_orderkey, l_linenumber AS ln, l_quantity AS qty
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey, ln ASC NULLS FIRST, qty""".stripMargin,
    "a24_union_n" ->
      """SELECT event_id,
        |  CASE event_type WHEN 'purchase' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS tag,
        |  CASE WHEN event_type = 'purchase' THEN value ELSE NULL END AS purchase_value,
        |  CASE WHEN event_type = 'click'
        |    THEN CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS INTEGER)
        |    ELSE NULL END AS click_k,
        |  CASE WHEN event_type NOT IN ('purchase', 'click') THEN event_type
        |    ELSE NULL END AS other_type
        |FROM events ORDER BY event_id""".stripMargin,
    "a25_tensor_dims" ->
      """SELECT label, count(*) AS n,
        |  min(embedding[1]) AS min_e0, max(embedding[1]) AS max_e0
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "a26_normalize" ->
      """SELECT doc_id, lang, source FROM documents ORDER BY doc_id""".stripMargin,
    "a27_union_infer" ->
      """SELECT CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        |  count(*) AS n,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS amount_total,
        |  count(DISTINCT CASE WHEN event_type != 'purchase' THEN event_type END) AS n_kinds
        |FROM events GROUP BY tag ORDER BY tag""".stripMargin,
    // affine minhash permutation 0: a=coeffA(0)=1103527590, b=coeffB(0)=69070,
    // over the same md5-derived 60-bit shingle hashes (mod P = 2^31-1).
    "a22_compiled_expr" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 3),
        |h AS (
        |  SELECT doc_id, CAST(('0x' || substring(md5(unnest(sh)), 1, 15)) AS BIGINT) AS h
        |  FROM s)
        |SELECT doc_id,
        |  min((1103527590 * (h % 2147483647) + 69070) % 2147483647) AS sig0
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
