package graft

import graft.EntryShared._

/** §2B oracle registry of the [[SparkEntry]] driver contract — the
  * DuckDB twin of [[EntryB]]'s query builders (mechanical r16 split;
  * strings verbatim — byte-identical oracle dump asserted at split
  * time; oracle-only CTE helpers travel with their consumers). */
private[graft] object OraclesB {

  /** The b124 oracle CTE chain (funnel stage windows → md5 arm → the
    * 3-row transition stack → hour-bucket histogram → from/conv/cum
    * coverage frame `k`), shared by the b124 per-arm readout and the b125
    * contrast so the bucketing and coverage rules can never fork between
    * the table and its verdict. */
  private[graft] val funnelAbTtcOracleCtes =
    """WITH ev AS (
      |  SELECT user_id, ts, event_type FROM events
      |  WHERE event_type IN ('view','click','signup','purchase')),
      |s1t AS (SELECT user_id, ts, event_type,
      |    min(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS s1 FROM ev),
      |s2t AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > s1 THEN ts END)
      |      OVER (PARTITION BY user_id) AS s2 FROM s1t),
      |s3t AS (SELECT *, min(CASE WHEN event_type = 'signup' AND ts > s2 THEN ts END)
      |      OVER (PARTITION BY user_id) AS s3 FROM s2t),
      |s4t AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s3 THEN ts END)
      |      OVER (PARTITION BY user_id) AS s4 FROM s3t),
      |u AS (SELECT user_id, max(s1) AS s1, max(s2) AS s2, max(s3) AS s3, max(s4) AS s4
      |      FROM s4t GROUP BY user_id),
      |a AS (SELECT *, CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |        AS BIGINT) % 2 AS arm FROM u),
      |tr AS (
      |  SELECT arm, 1 AS t, 'view_click' AS transition,
      |    epoch_us(s1) AS from_us, epoch_us(s2) AS to_us FROM a
      |  UNION ALL SELECT arm, 2, 'click_signup', epoch_us(s2), epoch_us(s3) FROM a
      |  UNION ALL SELECT arm, 3, 'signup_purchase', epoch_us(s3), epoch_us(s4) FROM a),
      |r AS (SELECT arm, t, transition,
      |        CASE WHEN to_us IS NOT NULL THEN (to_us - from_us) // 3600000000 END AS hrs
      |      FROM tr WHERE from_us IS NOT NULL),
      |h AS (SELECT arm, t, transition, hrs, CAST(count(*) AS BIGINT) AS n_users
      |      FROM r GROUP BY 1,2,3,4),
      |f AS (SELECT *, CAST(sum(n_users) OVER (PARTITION BY arm, t) AS BIGINT) AS from_users
      |      FROM h),
      |k AS (SELECT *, CAST(sum(n_users) OVER (PARTITION BY arm, t) AS BIGINT) AS conv_users,
      |        CAST(sum(n_users) OVER (PARTITION BY arm, t ORDER BY hrs
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM f WHERE hrs IS NOT NULL)""".stripMargin

  /** The b123 revenue-attribution oracle CTE chain (funnel stage windows
    * → optional watermark-closed cut → purchase rows → per-user
    * attribution → md5 arm → per-arm pivot `p`) — the SQL twin of
    * `funnelAbRevUserFrame` + `funnelAbRevArmPivot`, ONE definition for
    * the b123 readout, the b126 stream-parity replica, and the b128
    * contrast so the attribution rule can never fork across the seven
    * hand-copied chains it replaces (r15 extended review).
    * `closedCut` inserts b126's watermark-closed population (wm/hz/cl)
    * and swaps the attribution window to the 12 h honesty bound — the
    * streaming require(attrWindow <= gap)'s 43200000 ms / INTERVAL 12
    * HOUR constants live HERE and in the b126 builder; change them
    * together or the gate fails. */
  private[graft] def funnelAbRevOracleCtes(closedCut: Boolean): String = {
    val closedCtes = if (closedCut) """
      |wm AS (SELECT epoch_ms(max(ts)) - 1800000 AS wm_ms FROM events),
      |hz AS (SELECT user_id, epoch_ms(max(ts)) AS last_ms FROM ev GROUP BY 1),""".stripMargin
      else ""
    val clCte = if (closedCut) """
      |cl AS (SELECT u.* FROM u JOIN hz USING (user_id) CROSS JOIN wm
      |       WHERE hz.last_ms + 43200000 < wm.wm_ms),""".stripMargin
      else ""
    val puFrom = if (closedCut) "cl" else "u"
    val attrIv = if (closedCut) "INTERVAL 12 HOUR" else "INTERVAL 30 DAY"
    s"""WITH ev AS (
      |  SELECT user_id, ts, event_type, value FROM events
      |  WHERE event_type IN ('view','click','signup','purchase')),""".stripMargin +
    closedCtes + """
      |s1t AS (SELECT user_id, ts, event_type,
      |    min(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS s1 FROM ev),
      |s2t AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > s1 THEN ts END)
      |      OVER (PARTITION BY user_id) AS s2 FROM s1t),
      |s3t AS (SELECT *, min(CASE WHEN event_type = 'signup' AND ts > s2 THEN ts END)
      |      OVER (PARTITION BY user_id) AS s3 FROM s2t),
      |s4t AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s3 THEN ts END)
      |      OVER (PARTITION BY user_id) AS s4 FROM s3t),
      |u AS (SELECT user_id, max(s1) AS s1, max(s2) AS s2, max(s4) AS s4
      |      FROM s4t GROUP BY user_id),""".stripMargin +
    clCte + s"""
      |pr AS (SELECT user_id, ts,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS pc
      |  FROM events WHERE event_type = 'purchase'),
      |pu AS (SELECT u.user_id, u.s1, u.s4,
      |    COALESCE(sum(CASE WHEN p.ts > u.s2
      |      AND p.ts <= u.s2 + $attrIv THEN p.pc END), 0) AS attr_c
      |  FROM $puFrom u LEFT JOIN pr p USING (user_id)
      |  GROUP BY u.user_id, u.s2, u.s1, u.s4),
      |a AS (SELECT *, CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |        AS BIGINT) % 2 AS arm FROM pu),
      |p AS (SELECT
      |  COALESCE(CAST(count(CASE WHEN arm = 0 THEN s1 END) AS BIGINT), 0) AS ctrl_users,
      |  COALESCE(CAST(count(CASE WHEN arm = 1 THEN s1 END) AS BIGINT), 0) AS trt_users,
      |  COALESCE(CAST(count(CASE WHEN arm = 0 THEN s4 END) AS BIGINT), 0) AS ctrl_purchasers,
      |  COALESCE(CAST(count(CASE WHEN arm = 1 THEN s4 END) AS BIGINT), 0) AS trt_purchasers,
      |  COALESCE(CAST(sum(CASE WHEN arm = 0 THEN attr_c END) AS BIGINT), 0) AS ctrl_rev_c,
      |  COALESCE(CAST(sum(CASE WHEN arm = 1 THEN attr_c END) AS BIGINT), 0) AS trt_rev_c
      |  FROM a)""".stripMargin
  }

  /** The nine-column readout SELECT over the pivot CTE `p` — rev-per-user
    * micro-cents + the HUGEINT-floored lift; shared by b123 and b126. */
  private[graft] val funnelAbRevOracleSelect: String = """
    |SELECT ctrl_users, trt_users, ctrl_purchasers, trt_purchasers,
    |  ctrl_rev_c, trt_rev_c,
    |  COALESCE((ctrl_rev_c * 10000) // NULLIF(ctrl_users, 0), -1)
    |    AS ctrl_rev_per_user_uc,
    |  COALESCE((trt_rev_c * 10000) // NULLIF(trt_users, 0), -1)
    |    AS trt_rev_per_user_uc,
    |  COALESCE(CAST((CAST(trt_rev_c AS HUGEINT) * ctrl_users * 10000)
    |    // NULLIF(CAST(ctrl_rev_c AS HUGEINT) * trt_users, 0) AS BIGINT), -1)
    |    AS rev_lift_bp
    |FROM p""".stripMargin

  private[graft] val bOracles: Map[String, String] = Map(
    "b115_tpch_q2" ->
      s"""WITH $psCte,
        |cost AS (
        |  SELECT ps_partkey, ps_suppkey, ps_supplycost_c
        |  FROM ps JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT CAST(floor(s_acctbal*100+0.5) AS BIGINT) AS s_acctbal_c, s_name, n_name,
        |  p_partkey, p_type, ps_supplycost_c
        |FROM part JOIN cost ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_size <= 10 AND p_type = 'LARGE'
        |  AND ps_supplycost_c = (SELECT min(c2.ps_supplycost_c) FROM cost c2
        |                         WHERE c2.ps_partkey = p_partkey)
        |ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "b116_tpch_q9" ->
      s"""WITH $psCte
        |SELECT n_name AS nation, CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))
        |    - 100 * ps_supplycost_c) AS BIGINT) AS profit_c100
        |FROM lineitem JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1,2 ORDER BY nation, o_year DESC""".stripMargin,

    "b117_tpch_q11" ->
      s"""WITH $psCte,
        |v AS (
        |  SELECT ps_partkey, CAST(sum(ps_supplycost_c * ps_availqty_deci) AS BIGINT) AS value_cd
        |  FROM ps JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_5'
        |  GROUP BY ps_partkey),
        |tt AS (SELECT CAST(sum(value_cd) AS BIGINT) AS tot,
        |         CAST(count(*) AS BIGINT) AS n_parts FROM v)
        |SELECT ps_partkey, value_cd FROM v CROSS JOIN tt
        |WHERE CAST(value_cd AS DECIMAL(38,0)) * n_parts > 3 * CAST(tot AS DECIMAL(38,0))
        |ORDER BY value_cd DESC, ps_partkey""".stripMargin,

    "b118_tpch_q16" ->
      s"""WITH $psCte
        |SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1,2,3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "b119_tpch_q20" ->
      s"""WITH $psCte,
        |yq AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(floor(l_quantity*10+0.5) AS BIGINT)) AS BIGINT) AS year_qty_deci
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |  GROUP BY 1,2)
        |SELECT s_name, CAST(floor(s_acctbal*100+0.5) AS BIGINT) AS s_acctbal_c
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM ps LEFT JOIN yq ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
        |      AND ps_availqty_deci > 4 * COALESCE(year_qty_deci, 0))
        |ORDER BY s_name""".stripMargin,

    "b111_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT) AS revenue_c100
        |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,

    "b112_tpch_q8" ->
      """WITH all_nations AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
        |    CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT)) AS volume,
        |    n2.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        |    AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01')
        |SELECT o_year,
        |  CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS BIGINT)
        |    AS nation_rev_c100,
        |  CAST(sum(volume) AS BIGINT) AS total_rev_c100,
        |  (CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS BIGINT) * 10000)
        |    // CAST(sum(volume) AS BIGINT) AS mkt_share_bp
        |FROM all_nations GROUP BY o_year ORDER BY o_year""".stripMargin,

    // textbook EXISTS/NOT-EXISTS form — independently checks the
    // builder's single-shuffle aggregated rewrite
    "b113_tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderstatus = 'F' AND r_name = 'AFRICA'
        |  AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
        |              AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                  AND CAST(l3.l_shipdate AS DATE) > CAST(o3.o_orderdate AS DATE) + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    "b114_funnel_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_type, value FROM events
        |  WHERE event_type IN ('view','click','purchase')),
        |s1t AS (
        |  SELECT user_id, ts, event_type, value,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS s1
        |  FROM ev),
        |s2t AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > s1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s2
        |  FROM s1t),
        |s3t AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s3
        |  FROM s2t),
        |u AS (SELECT user_id, max(s1) AS s1, max(s2) AS s2, max(s3) AS s3
        |      FROM s3t GROUP BY user_id),
        |p AS (SELECT user_id, ts, CAST(floor(value*100+0.5) AS BIGINT) AS pc
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT u.user_id, s1, s2, s3,
        |        COALESCE(sum(pc), 0) AS purch_c,
        |        COALESCE(sum(CASE WHEN p.ts > s2 AND p.ts <= s2 + INTERVAL 30 DAY
        |          THEN pc END), 0) AS attr_c
        |      FROM u LEFT JOIN p ON u.user_id = p.user_id
        |      GROUP BY 1,2,3,4)
        |SELECT user_id,
        |  CASE WHEN s3 IS NOT NULL THEN 3 WHEN s2 IS NOT NULL THEN 2
        |    WHEN s1 IS NOT NULL THEN 1 ELSE 0 END AS cohort,
        |  CAST(purch_c AS BIGINT) AS purchase_c,
        |  CAST(attr_c AS BIGINT) AS attributed_c,
        |  COALESCE((CAST(attr_c AS BIGINT) * 1000000)
        |    // NULLIF(CAST(purch_c AS BIGINT), 0), -1) AS attr_share_ppm
        |FROM j ORDER BY user_id""".stripMargin,

    "b120_funnel_ttc" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('view','click','signup','purchase')),
        |s1t AS (SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS s1 FROM ev),
        |s2t AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > s1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s2 FROM s1t),
        |s3t AS (SELECT *, min(CASE WHEN event_type = 'signup' AND ts > s2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s3 FROM s2t),
        |s4t AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s3 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s4 FROM s3t),
        |u AS (SELECT user_id, max(s1) AS s1, max(s2) AS s2, max(s3) AS s3, max(s4) AS s4
        |      FROM s4t GROUP BY user_id),
        |tr AS (
        |  SELECT 1 AS t, 'view_click' AS transition,
        |    epoch_us(s1) AS from_us, epoch_us(s2) AS to_us FROM u
        |  UNION ALL SELECT 2, 'click_signup', epoch_us(s2), epoch_us(s3) FROM u
        |  UNION ALL SELECT 3, 'signup_purchase', epoch_us(s3), epoch_us(s4) FROM u),
        |r AS (SELECT t, transition,
        |        CASE WHEN to_us IS NOT NULL THEN (to_us - from_us) // 3600000000 END AS hrs
        |      FROM tr WHERE from_us IS NOT NULL),
        |h AS (SELECT t, transition, hrs, CAST(count(*) AS BIGINT) AS n_users
        |      FROM r GROUP BY 1,2,3),
        |f AS (SELECT *, CAST(sum(n_users) OVER (PARTITION BY t) AS BIGINT) AS users_from
        |      FROM h),
        |k AS (SELECT t, transition, hrs, n_users, users_from,
        |        CAST(sum(n_users) OVER (PARTITION BY t ORDER BY hrs
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |      FROM f WHERE hrs IS NOT NULL)
        |SELECT t, transition, hrs, n_users, cum_users, users_from,
        |  CAST((cum_users * 1000000) // users_from AS BIGINT) AS ttc_cum_ppm
        |FROM k ORDER BY t, hrs""".stripMargin,

    "b121_funnel_ab" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('view','click','signup','purchase')),
        |s1t AS (SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS s1 FROM ev),
        |s2t AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > s1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s2 FROM s1t),
        |s3t AS (SELECT *, min(CASE WHEN event_type = 'signup' AND ts > s2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s3 FROM s2t),
        |s4t AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s3 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s4 FROM s3t),
        |u AS (SELECT user_id, max(s1) AS s1, max(s2) AS s2, max(s3) AS s3, max(s4) AS s4
        |      FROM s4t GROUP BY user_id),
        |a AS (SELECT *, CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |        AS BIGINT) % 2 AS arm FROM u),
        |pa AS (SELECT arm, CAST(count(s1) AS BIGINT) AS u1, CAST(count(s2) AS BIGINT) AS u2,
        |         CAST(count(s3) AS BIGINT) AS u3, CAST(count(s4) AS BIGINT) AS u4
        |       FROM a GROUP BY arm),
        |p AS (SELECT
        |  COALESCE(CAST(sum(CASE WHEN arm = 0 THEN u1 END) AS BIGINT), 0) AS c1,
        |  COALESCE(CAST(sum(CASE WHEN arm = 1 THEN u1 END) AS BIGINT), 0) AS t1,
        |  COALESCE(CAST(sum(CASE WHEN arm = 0 THEN u2 END) AS BIGINT), 0) AS c2,
        |  COALESCE(CAST(sum(CASE WHEN arm = 1 THEN u2 END) AS BIGINT), 0) AS t2,
        |  COALESCE(CAST(sum(CASE WHEN arm = 0 THEN u3 END) AS BIGINT), 0) AS c3,
        |  COALESCE(CAST(sum(CASE WHEN arm = 1 THEN u3 END) AS BIGINT), 0) AS t3,
        |  COALESCE(CAST(sum(CASE WHEN arm = 0 THEN u4 END) AS BIGINT), 0) AS c4,
        |  COALESCE(CAST(sum(CASE WHEN arm = 1 THEN u4 END) AS BIGINT), 0) AS t4
        |  FROM pa),
        |st AS (
        |  SELECT 1 AS stage, 'view' AS event_type, c1 AS ctrl_users, t1 AS trt_users,
        |    c1 AS cb, t1 AS tb FROM p
        |  UNION ALL SELECT 2, 'click', c2, t2, c1, t1 FROM p
        |  UNION ALL SELECT 3, 'signup', c3, t3, c1, t1 FROM p
        |  UNION ALL SELECT 4, 'purchase', c4, t4, c1, t1 FROM p)
        |SELECT stage, event_type, ctrl_users, trt_users,
        |  COALESCE((ctrl_users * 1000000) // NULLIF(cb, 0), -1) AS ctrl_ppm,
        |  COALESCE((trt_users * 1000000) // NULLIF(tb, 0), -1) AS trt_ppm,
        |  COALESCE(CAST((CAST(trt_users AS HUGEINT) * cb * 10000)
        |    // NULLIF(CAST(ctrl_users AS HUGEINT) * tb, 0) AS BIGINT), -1) AS lift_bp
        |FROM st ORDER BY stage""".stripMargin,

    // per-source gate monitor: the classifier score CTE + one slim
    // documents projection, exact-ppm keep rate by BIGINT floor division
    "b122_stream_classifier_parity" -> (classifierScoreCteWhere("") + """,
        |cj AS (
        |  SELECT d.source, d.n_chars, s.score
        |  FROM documents d JOIN cscore s USING (doc_id))
        |SELECT source, CAST(count(*) AS BIGINT) AS total_docs,
        |  CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        |  CAST(sum(CASE WHEN score >= 0 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
        |  (CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // CAST(count(*) AS BIGINT) AS kept_ppm
        |FROM cj GROUP BY source ORDER BY source""".stripMargin),

    // b121's funnel CTE + b114's attribution window; the rate lift is
    // floored in HUGEINT (the b121 rule — DuckDB's // on DECIMAL rounds).
    // Chain + readout single-sourced with b126/b128 (funnelAbRevOracleCtes).
    "b123_funnel_ab_revenue" ->
      (funnelAbRevOracleCtes(closedCut = false) + funnelAbRevOracleSelect),

    // b123's funnel + attribution CTEs restricted to the watermark-CLOSED
    // population (the b99 epoch_ms horizon convention) with the 12 h
    // attribution window matching the streaming honesty bound — the
    // closedCut=true branch of the shared funnelAbRevOracleCtes chain
    "b126_stream_funnel_ab_revenue" ->
      (funnelAbRevOracleCtes(closedCut = true) + funnelAbRevOracleSelect),

    // the c117 prev-generation calibration table as the REFERENCE, live =
    // full corpus bucketed into the reference's [lo_d, lo_{d+1}) ranges
    // (decile 1 open below, last open above — lead over the 10-row frame)
    "b127_stream_calibration_monitor" -> (classifierScoreCteWhere("") +
      heuristicGateCteSql +
      calibrationCteSfx("p", " WHERE doc_id % 10 != 3") + """,
        |bk AS (SELECT decile, lo_score, kept_h_ppm AS ref_kept_ppm,
        |         lead(lo_score) OVER (ORDER BY lo_score) AS next_lo,
        |         lag(lo_score) OVER (ORDER BY lo_score) IS NULL AS is_first
        |       FROM calp),
        |lb AS (SELECT s.score, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN hq.kept_h THEN 1 ELSE 0 END) AS BIGINT) AS kh
        |       FROM cscore s JOIN hq USING (doc_id) GROUP BY s.score),
        |bj AS (SELECT b.decile, b.ref_kept_ppm, l.n, l.kh
        |       FROM lb l JOIN bk b
        |         ON (b.is_first OR l.score >= b.lo_score)
        |        AND (b.next_lo IS NULL OR l.score < b.next_lo)),
        |ag AS (SELECT decile, CAST(ref_kept_ppm AS BIGINT) AS ref_kept_ppm,
        |         CAST(sum(n) AS BIGINT) AS n_docs_live,
        |         CAST(sum(kh) AS BIGINT) AS kept_h_docs_live
        |       FROM bj GROUP BY decile, ref_kept_ppm)
        |SELECT decile, ref_kept_ppm, n_docs_live, kept_h_docs_live,
        |  (kept_h_docs_live * 1000000) // n_docs_live AS kept_h_ppm_live,
        |  (kept_h_docs_live * 1000000) // n_docs_live - ref_kept_ppm AS ppm_delta,
        |  (abs((kept_h_docs_live * 1000000) // n_docs_live - ref_kept_ppm)
        |    > 10000) AS drifted,
        |  CAST(sum(CASE WHEN abs((kept_h_docs_live * 1000000) // n_docs_live
        |    - ref_kept_ppm) > 10000 THEN 1 ELSE 0 END) OVER ()
        |    AS BIGINT) AS drifted_total
        |FROM ag ORDER BY decile""".stripMargin),

    // b120's TTC machinery with the md5 arm in every key; pN = smallest
    // hour bucket with N% cumulative coverage, pure BIGINT comparisons.
    // The WITH chain lives in [[funnelAbTtcOracleCtes]], shared with the
    // b125 contrast so the bucketing rule can never fork.
    "b124_funnel_ab_ttc" -> (funnelAbTtcOracleCtes + """
        |SELECT arm, t, transition, from_users, conv_users,
        |  CAST((conv_users * 1000000) // from_users AS BIGINT) AS conv_ppm,
        |  CAST(min(CASE WHEN cum * 2 >= conv_users THEN hrs END) AS BIGINT) AS p50_hrs,
        |  CAST(min(CASE WHEN cum * 10 >= conv_users * 9 THEN hrs END) AS BIGINT) AS p90_hrs
        |FROM k GROUP BY 1,2,3,4,5 ORDER BY arm, t""".stripMargin),

    // the contrast: per-arm percentiles off the SAME k frame, pivoted to
    // one row per transition; the verdict booleans are cleared-BIGINT
    // products (cov·2 ≥ n for the sign, cov·20 ≥ 11·n + a 20-converter
    // floor for the cleared margin) — never a ratio, both engines floor
    // nothing because nothing divides
    "b125_funnel_ab_ttc_contrast" -> (funnelAbTtcOracleCtes + """,
        |pct AS (
        |  SELECT arm, t, transition, conv_users,
        |    CAST(min(CASE WHEN cum * 2 >= conv_users THEN hrs END) AS BIGINT) AS p50_hrs,
        |    CAST(min(CASE WHEN cum * 10 >= conv_users * 9 THEN hrs END) AS BIGINT) AS p90_hrs
        |  FROM k GROUP BY 1,2,3,4),
        |pv AS (
        |  SELECT t, transition,
        |    COALESCE(CAST(max(CASE WHEN arm = 0 THEN conv_users END) AS BIGINT), 0) AS ctrl_convs,
        |    COALESCE(CAST(max(CASE WHEN arm = 1 THEN conv_users END) AS BIGINT), 0) AS trt_convs,
        |    COALESCE(CAST(max(CASE WHEN arm = 0 THEN p50_hrs END) AS BIGINT), -1) AS ctrl_p50_hrs,
        |    COALESCE(CAST(max(CASE WHEN arm = 1 THEN p50_hrs END) AS BIGINT), -1) AS trt_p50_hrs,
        |    COALESCE(CAST(max(CASE WHEN arm = 0 THEN p90_hrs END) AS BIGINT), -1) AS ctrl_p90_hrs,
        |    COALESCE(CAST(max(CASE WHEN arm = 1 THEN p90_hrs END) AS BIGINT), -1) AS trt_p90_hrs
        |  FROM pct GROUP BY 1, 2),
        |cv AS (
        |  SELECT pv.t,
        |    COALESCE(CAST(sum(CASE WHEN k.hrs <= pv.ctrl_p50_hrs THEN k.n_users END)
        |      AS BIGINT), 0) AS trt_cov_at_ctrl_p50
        |  FROM pv LEFT JOIN k ON k.t = pv.t AND k.arm = 1
        |  GROUP BY pv.t)
        |SELECT pv.t, pv.transition, ctrl_convs, trt_convs,
        |  ctrl_p50_hrs, trt_p50_hrs, ctrl_p90_hrs, trt_p90_hrs,
        |  trt_p50_hrs - ctrl_p50_hrs AS d_p50_hrs,
        |  trt_p90_hrs - ctrl_p90_hrs AS d_p90_hrs,
        |  cv.trt_cov_at_ctrl_p50,
        |  (ctrl_convs > 0 AND trt_convs > 0
        |   AND cv.trt_cov_at_ctrl_p50 * 2 >= trt_convs) AS trt_faster_at_median,
        |  (ctrl_convs >= 20 AND trt_convs >= 20
        |   AND cv.trt_cov_at_ctrl_p50 * 20 >= trt_convs * 11) AS speedup_cleared
        |FROM pv JOIN cv ON pv.t = cv.t ORDER BY pv.t""".stripMargin),

    // b123's funnel + attribution CTEs, then the b125 cleared-product
    // devices on rev-per-user: the ≥5 % rate margin in HUGEINT products
    // and the whale-guard median contrast over whole-dollar buckets
    // (cum/tot window sums on the bounded distribution frame; control's
    // discrete median = smallest bucket with 2·cum ≥ tot)
    "b128_funnel_ab_rev_contrast" ->
      (funnelAbRevOracleCtes(closedCut = false) + """,
        |di AS (SELECT arm, greatest(COALESCE(attr_c, 0), 0) // 100 AS rev_d,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM a WHERE s4 IS NOT NULL GROUP BY 1, 2),
        |fl AS (SELECT arm, rev_d, n,
        |         sum(n) OVER (PARTITION BY arm ORDER BY rev_d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(n) OVER (PARTITION BY arm) AS tot
        |       FROM di),
        |f2 AS (SELECT arm, rev_d, n, (cum * 2 >= tot) AS at_med,
        |         min(CASE WHEN arm = 0 AND cum * 2 >= tot THEN rev_d END)
        |           OVER () AS ctrl_med_g
        |       FROM fl),
        |md AS (SELECT
        |    COALESCE(CAST(min(ctrl_med_g) AS BIGINT), -1) AS ctrl_med_rev_d,
        |    COALESCE(CAST(min(CASE WHEN arm = 1 AND at_med THEN rev_d END)
        |      AS BIGINT), -1) AS trt_med_rev_d,
        |    COALESCE(CAST(sum(CASE WHEN arm = 1 AND rev_d > ctrl_med_g THEN n END)
        |      AS BIGINT), 0) AS trt_gt_ctrl_med
        |  FROM f2),
        |v AS (SELECT ctrl_users, trt_users, ctrl_purchasers, trt_purchasers,
        |  ctrl_rev_c, trt_rev_c,
        |  COALESCE(CAST((CAST(trt_rev_c AS HUGEINT) * ctrl_users * 10000)
        |    // NULLIF(CAST(ctrl_rev_c AS HUGEINT) * trt_users, 0) AS BIGINT), -1)
        |    AS rev_lift_bp,
        |  ctrl_med_rev_d, trt_med_rev_d,
        |  trt_med_rev_d - ctrl_med_rev_d AS d_med_rev_d,
        |  trt_gt_ctrl_med,
        |  (ctrl_purchasers >= 20 AND trt_purchasers >= 20 AND ctrl_rev_c > 0
        |   AND CAST(trt_rev_c AS HUGEINT) * ctrl_users * 20
        |     >= CAST(ctrl_rev_c AS HUGEINT) * trt_users * 21) AS lift_cleared,
        |  (ctrl_purchasers > 0 AND trt_purchasers > 0
        |   AND trt_gt_ctrl_med * 2 >= trt_purchasers) AS trt_bigger_at_median,
        |  (ctrl_purchasers >= 20 AND trt_purchasers >= 20
        |   AND trt_gt_ctrl_med * 20 >= trt_purchasers * 11) AS median_shift_cleared
        |  FROM p CROSS JOIN md)
        |SELECT *, (lift_cleared AND median_shift_cleared) AS uplift_cleared
        |FROM v""".stripMargin),

    "b106_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |              AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "b107_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN COALESCE(o_orderpriority IN ('1-URGENT','2-HIGH'), FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(sum(CASE WHEN COALESCE(o_orderpriority IN ('1-URGENT','2-HIGH'), FALSE) THEN 0 ELSE 1 END) AS BIGINT)
        |    AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 30 DAY
        |  AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "b108_tpch_q13" ->
      """WITH oc AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt FROM orders
        |  WHERE o_orderpriority <> '4-NOT SPECIFIED' GROUP BY o_custkey)
        |SELECT COALESCE(cnt, 0) AS c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM customer LEFT JOIN oc ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "b109_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT) AS total_revenue_c100
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_c100
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue_c100 = (SELECT max(total_revenue_c100) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "b110_tpch_q19" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT) AS revenue_c100,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    "b33_orc_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n_sup,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "b34_csv_roundtrip" ->
      """SELECT p_brand, count(*) AS n_parts, max(p_size) AS max_size,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    // the closed-form truth of the npy roundtrip (the c118 asymmetry: the
    // Spark side must push real bytes through the backend and land here)
    "b129_npy_roundtrip" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  TRUE AS roundtrip_ok
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // closed-form truth off the parquet original (the b129 asymmetry);
    // sum cast to BIGINT — DuckDB's sum(BIGINT) widens to HUGEINT
    "b130_npy_ids_scan" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_ids,
        |  CAST(sum(vec_id) AS BIGINT) AS id_sum,
        |  min(vec_id) AS id_min, max(vec_id) AS id_max
        |FROM embeddings""".stripMargin,
    // closed-form truth off the parquet original (the b129 asymmetry):
    // any misdecoded/reordered/missing slice breaks slice_ok or rows;
    // slice_dim's literal 8 is the requested width — the Spark side
    // rejects a layout with d < 8 loudly before producing rows
    "b131_npy_dim_slice" ->
      """SELECT vec_id, CAST(8 AS BIGINT) AS slice_dim,
        |  TRUE AS slice_ok
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "b54_percentile_cont" ->
      """SELECT l_returnflag,
        |  quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS q25,
        |  quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median,
        |  quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS q75,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "b55_unpivot" ->
      """SELECT measure, count(*) AS n, CAST(sum(value) AS BIGINT) AS total,
        |  min(value) AS mn, max(value) AS mx
        |FROM (
        |  SELECT 'l_linenumber' AS measure, CAST(l_linenumber AS BIGINT) AS value FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin,

    "b56_recursive_cte" ->
      """WITH RECURSIVE walk(node, cur, path_sum, depth) AS (
        |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT), 0 FROM customer
        |  UNION ALL
        |  SELECT node, cur // 2, path_sum + (cur // 2), depth + 1
        |  FROM walk WHERE cur > 1)
        |SELECT depth, count(*) AS n_nodes, CAST(sum(path_sum) AS BIGINT) AS ancestor_key_sum
        |FROM walk WHERE cur = 1
        |GROUP BY depth ORDER BY depth""".stripMargin,

    "b60_scd2" ->
      """SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts), 1) OVER w AS valid_to_us,
        |  lead(epoch_us(ts), 1) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "b61_zorder_key" ->
      // the same spread-bits ladder, stepwise; pure integer & | << so the
      // key is bit-identical
      """WITH s0 AS (
        |  SELECT o_orderkey,
        |    (o_custkey & 65535) AS x,
        |    (date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 65535) AS y
        |  FROM orders),
        |s1 AS (SELECT o_orderkey, ((x | (x << 8)) & 16711935) AS x, ((y | (y << 8)) & 16711935) AS y FROM s0),
        |s2 AS (SELECT o_orderkey, ((x | (x << 4)) & 252645135) AS x, ((y | (y << 4)) & 252645135) AS y FROM s1),
        |s3 AS (SELECT o_orderkey, ((x | (x << 2)) & 858993459) AS x, ((y | (y << 2)) & 858993459) AS y FROM s2),
        |s4 AS (SELECT o_orderkey, ((x | (x << 1)) & 1431655765) AS x, ((y | (y << 1)) & 1431655765) AS y FROM s3)
        |SELECT o_orderkey, CAST(x | (y << 1) AS BIGINT) AS zkey
        |FROM s4 ORDER BY zkey, o_orderkey LIMIT 2000""".stripMargin,

    "b62_share_of_group" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name, cents,
        |  CAST((cents * 1000000) // sum(cents) OVER (PARTITION BY r_name) AS BIGINT) AS share_ppm
        |FROM rev ORDER BY r_name, n_name""".stripMargin,

    "b59_cohort_retention" ->
      """WITH cohort AS (
        |  SELECT o_custkey, CAST(date_trunc('quarter', min(o_orderdate)) AS DATE) AS cohort
        |  FROM orders GROUP BY o_custkey),
        |active AS (
        |  SELECT DISTINCT o_custkey, CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q
        |  FROM orders)
        |SELECT c.cohort, a.q, count(DISTINCT a.o_custkey) AS n_active
        |FROM active a JOIN cohort c ON a.o_custkey = c.o_custkey
        |GROUP BY c.cohort, a.q ORDER BY c.cohort, a.q""".stripMargin,

    "b57_locf" ->
      """SELECT user_id, event_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "b58_latest_state" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT user_id, event_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "b53_date_spine" ->
      """WITH m AS (SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day, count(*) AS n_orders
        |           FROM orders GROUP BY 1, 2),
        |b AS (SELECT o_orderpriority, min(day) AS lo, max(day) AS hi FROM m GROUP BY 1),
        |sp AS (SELECT o_orderpriority, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b)
        |SELECT sp.o_orderpriority, CAST(sp.day AS DATE) AS day,
        |  coalesce(m.n_orders, 0) AS n_orders
        |FROM sp LEFT JOIN m USING (o_orderpriority, day)
        |ORDER BY sp.o_orderpriority, sp.day""".stripMargin,
    "b52_union_evolve" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT coalesce(o_orderpriority, 'LEGACY') AS prio, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM u GROUP BY 1 ORDER BY prio""".stripMargin,
    "b51_exact_moments" ->
      // HUGEINT moments in DuckDB ≡ DECIMAL(38,0) in Spark: both exact,
      // both cast-to-double at the same single point in the formula
      """WITH li AS (SELECT l_returnflag,
        |  CAST(l_quantity AS BIGINT) AS q,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM lineitem),
        |a AS (SELECT l_returnflag, count(*) AS n,
        |  sum(q) AS sum_q, sum(q * q) AS sum_q2,
        |  sum(cents) AS sum_cents, sum(cents * cents) AS sum_cents2
        |  FROM li GROUP BY 1)
        |SELECT l_returnflag, n, CAST(sum_q AS BIGINT) AS sum_q,
        |  CAST(sum_q AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
        |  CAST(n * sum_q2 - sum_q * sum_q AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS var_q,
        |  CAST(n * sum_cents2 - sum_cents * sum_cents AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 10000.0 AS var_price
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "b50_funnel" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts AS vts FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
        |pu AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'),
        |vc AS (SELECT v.view_id, v.user_id, min(c.cts) AS fc
        |       FROM v JOIN c ON c.user_id = v.user_id
        |         AND c.cts >= v.vts AND c.cts < v.vts + INTERVAL 30 MINUTE
        |       GROUP BY v.view_id, v.user_id),
        |vcp AS (SELECT DISTINCT vc.view_id, vc.user_id
        |        FROM vc JOIN pu ON pu.user_id = vc.user_id
        |          AND pu.pts >= vc.fc AND pu.pts < vc.fc + INTERVAL 2 HOUR)
        |SELECT v.user_id, count(*) AS n_views,
        |  count(vc.view_id) AS n_clicked, count(vcp.view_id) AS n_purchased
        |FROM v LEFT JOIN vc USING (view_id, user_id)
        |       LEFT JOIN vcp USING (view_id, user_id)
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,
    "b49_json_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "b35_range_join" ->
      """SELECT p.event_id, p.user_id, count(c.user_id) AS n_clicks_60s
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id AND c.ts >= p.ts - INTERVAL 1 MINUTE AND c.ts < p.ts
        |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin,
    "b36_approx_quantile" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.5) AS median_price,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "b37_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "b38_partition_prune" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "b63_partitioned_bucketed" ->
      // layout changes the plan, never the answer: plain filter+join+agg
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "b92_hilbert_key" -> hilbertKeySql,

    "b93_hilbert_prune" ->
      // identical to b64's: the curve rewrite is pure layout, the 2-D
      // box aggregate is the answer — one oracle, two at-rest layouts
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_custkey < 80
        |  AND date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) < 730
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "b64_zorder_prune" ->
      // the z-ordered rewrite is pure layout; the 2-D box is the answer
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_custkey < 80
        |  AND date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) < 730
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "b39_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "b40_scalar_subquery" ->
      """WITH c AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM orders),
        |st AS (SELECT sum(cents) AS sc, count(*) AS n FROM c)
        |SELECT o_orderkey, o_custkey, o_totalprice FROM c, st
        |WHERE cents * 2 * n > 3 * sc ORDER BY o_orderkey""".stripMargin,
    "b41_lateral_join" ->
      """SELECT n.n_name, t.s_name, t.s_acctbal
        |FROM nation n,
        |LATERAL (SELECT s_name, s_acctbal FROM supplier
        |         WHERE s_nationkey = n.n_nationkey
        |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
        |ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""".stripMargin,
    "b42_stream_interval_join" ->
      """SELECT v.event_id AS view_id, v.user_id, c.event_id AS click_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |  ON c.user_id = v.user_id
        |  AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 30 MINUTE
        |ORDER BY view_id, click_id""".stripMargin,
    "b48_stream_interval_left" ->
      """SELECT v.event_id AS view_id, v.user_id, coalesce(c.event_id, -1) AS click_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |  ON c.user_id = v.user_id
        |  AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 30 MINUTE
        |ORDER BY view_id, click_id""".stripMargin,
    "b47_salted_skew_join" ->
      // plain join: salting must be invisible in the result
      """SELECT s_nationkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "b46_map_type" ->
      // the map is an engine-side container; its observable content is
      // exactly this per-(priority,status) count relation
      """WITH pc AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |            FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority,
        |  CAST(count(*) AS INTEGER) AS n_statuses,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN n END), 0) AS BIGINT) AS n_f,
        |  CAST(coalesce(sum(CASE WHEN n >= 100 THEN n END), 0) AS BIGINT) AS big_total,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS keys_csv
        |FROM pc GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b45_join_full_outer" ->
      """WITH big AS (SELECT o_custkey, count(*) AS n_big FROM orders
        |             WHERE o_totalprice > 400000 GROUP BY o_custkey),
        |neg AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0)
        |SELECT coalesce(o_custkey, c_custkey) AS custkey,
        |  coalesce(n_big, 0) AS n_big,
        |  n_big IS NOT NULL AS has_big,
        |  c_acctbal IS NOT NULL AS in_arrears,
        |  coalesce(c_acctbal, 0.0) AS acctbal
        |FROM big FULL OUTER JOIN neg ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin,
    "b43_window_dist" ->
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders WHERE o_totalprice > 150000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "b44_variant_json" ->
      // props is strictly {"k": int}, so a portable RE2 digit-run extract
      // reproduces the typed variant_get path without requiring a JSON
      // extension in the oracle engine
      """SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(regexp_extract(props, '[0-9]+') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,
    "b01_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b02_join_broadcast" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "b03_join_multi" ->
      """SELECT r_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "b04_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "b05_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "b06_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "b07_join_theta" ->
      """SELECT c_custkey, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey AND o_totalprice > c_acctbal * 50
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "b08_join_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS cu, ts AS cts, event_id AS click_id FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.event_id, p.user_id, c.click_id,
        |  row_number() OVER (PARTITION BY p.event_id ORDER BY c.cts DESC NULLS LAST, c.click_id DESC NULLS LAST) AS rn
        |  FROM p LEFT JOIN c ON p.user_id = c.cu AND c.cts <= p.ts)
        |SELECT event_id, user_id, click_id FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "b09_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "b10_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "b11_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS days_since_prev,
        |  lead(o_orderkey, 1) OVER w AS next_order
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "b27_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING) AS n_similar
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "b12_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "b13_setops" ->
      """WITH oc AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |ec AS (SELECT DISTINCT user_id AS k FROM events)
        |SELECT 'both' AS tag, count(*) AS n FROM (SELECT k FROM oc INTERSECT SELECT k FROM ec)
        |UNION ALL
        |SELECT 'only_orders' AS tag, count(*) AS n FROM (SELECT k FROM oc EXCEPT SELECT k FROM ec)
        |UNION ALL
        |SELECT 'union' AS tag, count(*) AS n FROM (SELECT k FROM oc UNION SELECT k FROM ec)
        |ORDER BY tag""".stripMargin,
    "b31_setops_all" ->
      """WITH a AS (SELECT l_returnflag AS f FROM lineitem),
        |b AS (SELECT l_returnflag AS f FROM lineitem WHERE l_quantity > 25)
        |SELECT 'intersect_all' AS op, f, count(*) AS n
        |FROM (SELECT f FROM a INTERSECT ALL SELECT f FROM b) GROUP BY f
        |UNION ALL
        |SELECT 'except_all' AS op, f, count(*) AS n
        |FROM (SELECT f FROM a EXCEPT ALL SELECT f FROM b) GROUP BY f
        |ORDER BY op, f""".stripMargin,
    "b32_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "b14_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b15_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "b21_cube" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS prio,
        |  coalesce(CAST(year(o_orderdate) AS INTEGER), -1) AS yr,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderpriority, year(o_orderdate))
        |ORDER BY prio, yr""".stripMargin,
    "b30_math_fns" ->
      """SELECT l_orderkey, l_linenumber AS ln,
        |  abs(l_discount - 0.05) AS d_abs,
        |  sqrt(l_quantity) AS q_sqrt,
        |  CAST(floor(l_extendedprice / 100) AS BIGINT) AS p_floor,
        |  CAST(ceil(l_extendedprice / 100) AS BIGINT) AS p_ceil,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS d_sign,
        |  l_linenumber % 3 AS ln_mod
        |FROM lineitem ORDER BY l_orderkey, ln, d_abs, q_sqrt""".stripMargin,
    "b28_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "b29_percentile_disc" ->
      """SELECT o_orderpriority,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b16_string_fns" ->
      """SELECT p_partkey, lower(p_brand) AS brand_lower, substring(p_name, 1, 5) AS name5,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |  CAST(len(string_split(p_type, ' ')) AS BIGINT) AS type_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "b17_date_fns" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY month ORDER BY month""".stripMargin,
    "b18_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "b19_window_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type ORDER BY window_start, event_type""".stripMargin,
    // Spark's sliding window(ts, 1h, 30m) assigns each event to the two
    // epoch-aligned 30-minute starts within the hour before it; reproduced
    // with integer epoch-millisecond arithmetic (no engine-specific
    // time_bucket origins).
    "b22_window_sliding" ->
      """WITH w AS (
        |  SELECT unnest(ARRAY[
        |      make_timestamp((epoch_ms(ts) // 1800000) * 1800000 * 1000),
        |      make_timestamp(((epoch_ms(ts) // 1800000) - 1) * 1800000 * 1000)
        |    ]) AS window_start,
        |    event_type
        |  FROM events)
        |SELECT window_start, event_type, count(*) AS n
        |FROM w GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    "b26_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "b24_sql" ->
      """SELECT o_orderpriority, count(*) AS n, min(o_orderkey) AS first_key
        |FROM orders WHERE o_totalprice > 100000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b25_skew_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_distinct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "b23_join_supplier" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "b20_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
        |  user_id, count(*) AS n
        |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "b68_sketch_rollup" ->
      // exact weekly distinct hash-checked; the union-of-daily-sketches
      // estimate is engine-specific, so (as b18) its evidence is the
      // 5% bound the oracle asserts TRUE. date_trunc('week') is
      // Monday-anchored in both engines.
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
        |  count(DISTINCT date_trunc('day', ts)) AS n_days,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS rollup_ok
        |FROM events GROUP BY week ORDER BY week""".stripMargin,

    "b66_merge_apply" ->
      // same compaction (row_number ≡ max_by on the same total order) and
      // the same merge CASE branches; payload doubles pass through raw
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
        |    FROM events WHERE ts >= TIMESTAMP '2024-01-16') WHERE rn = 1)
        |SELECT coalesce(b.user_id, c.user_id) AS user_id,
        |  CASE WHEN c.op = 'U' THEN c.value ELSE b.value END AS value,
        |  CASE WHEN c.op IS NULL THEN 'carry'
        |       WHEN b.user_id IS NULL THEN 'insert'
        |       ELSE 'update' END AS src
        |FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY user_id""".stripMargin,

    "b67_interval_coverage" ->
      // identical sweep in integer epoch-micros: island break when s
      // exceeds the running max of prior interval ends
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |              epoch_us(ts) + 1800000000 AS e FROM events),
        |x AS (SELECT user_id, event_id, s, e,
        |        max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |      FROM iv),
        |y AS (SELECT user_id, event_id, s, e,
        |        CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk FROM x),
        |z AS (SELECT user_id, s, e,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
        |          ROWS UNBOUNDED PRECEDING) AS island FROM y),
        |i AS (SELECT user_id, island, max(e) - min(s) AS cov
        |      FROM z GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_islands, CAST(sum(cov) AS BIGINT) AS covered_micros
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,

    "b69_ivm_merge" ->
      // the FULL recompute — equality with the state merge is the claim
      """WITH e AS (SELECT user_id,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(cents) AS min_cents, max(cents) AS max_cents,
        |  CAST(sum(cents) // count(*) AS BIGINT) AS avg_cents_floor
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "b70_interpolate" ->
      // same grid + bracketing windows + cleared-denominator weighted
      // mean; all operands non-negative BIGINTs so // ≡ div
      """WITH obs0 AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS h,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 3600000000
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |k AS (SELECT user_id, h, cents FROM obs0 WHERE rn = 1),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM k GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM span),
        |j AS (SELECT g.user_id, g.h, k.cents FROM grid g
        |      LEFT JOIN k ON k.user_id = g.user_id AND k.h = g.h),
        |w AS (SELECT user_id, h, cents,
        |  last_value(cents IGNORE NULLS) OVER back AS pv,
        |  last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS) OVER back AS ph,
        |  first_value(cents IGNORE NULLS) OVER fwd AS nv,
        |  first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS) OVER fwd AS nh
        |  FROM j WINDOW
        |    back AS (PARTITION BY user_id ORDER BY h
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fwd AS (PARTITION BY user_id ORDER BY h
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, h AS hour_id,
        |  CAST(CASE WHEN cents IS NOT NULL THEN cents
        |       ELSE (pv * (nh - h) + nv * (h - ph)) // (nh - ph) END AS BIGINT) AS val_cents,
        |  CASE WHEN cents IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
        |FROM w ORDER BY user_id, hour_id""".stripMargin,

    "b71_equidepth_hist" ->
      // identical integer bucket rule over the distinct-value frame
      """WITH vc AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
        |              count(*) AS cnt
        |            FROM lineitem GROUP BY 1),
        |c AS (SELECT v, cnt,
        |        sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                       AND CURRENT ROW) AS cum,
        |        sum(cnt) OVER () AS n
        |      FROM vc)
        |SELECT CAST(((cum - 1) * 16) // n AS BIGINT) AS bin,
        |  min(v) AS lo, max(v) AS hi, CAST(sum(cnt) AS BIGINT) AS n_rows
        |FROM c GROUP BY 1 ORDER BY bin""".stripMargin,

    "b79_dynamic_partition_prune" ->
      """WITH dim(p, urgency) AS (VALUES
        |  ('1-URGENT', 'high'), ('2-HIGH', 'high'), ('3-MEDIUM', 'low'),
        |  ('4-NOT SPECIFIED', 'low'), ('5-LOW', 'low'))
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders JOIN dim ON o_orderpriority = p
        |WHERE urgency = 'high'
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "b78_stream_hll_parity" ->
      // exact distinct per closed hour window; the HLL estimate is
      // checked Spark-side as the bound boolean (b18 pattern)
      """WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wm FROM events),
        |w AS (SELECT date_trunc('hour', ts) AS ws, user_id FROM events)
        |SELECT epoch_us(ws) AS w_start_us,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS approx_ok
        |FROM w CROSS JOIN wm
        |WHERE ws + INTERVAL 1 HOUR <= wm.wm
        |GROUP BY ws ORDER BY w_start_us""".stripMargin,

    "b98_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity * 10 + 0.5) AS BIGINT)) AS BIGINT) AS total_qty_deci
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(floor(l_quantity * 10 + 0.5) AS BIGINT)) > 3000)
        |SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
        |  total_qty_deci
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice_cents DESC, o_orderkey LIMIT 100""".stripMargin,

    // the Series.funnelStageTimes machine in SQL (chained strictly-after
    // mins) + the ms-granular horizon cut the stream's timeout clock uses
    "b99_stream_funnel_parity" ->
      """WITH f AS (SELECT user_id, event_type, ts FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |wm AS (SELECT epoch_ms(max(ts)) - 1800000 AS wm_ms FROM events),
        |s1 AS (SELECT user_id, min(ts) AS s1 FROM f WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT f.user_id, min(f.ts) AS s2 FROM f JOIN s1 USING (user_id)
        |       WHERE f.event_type = 'click' AND f.ts > s1.s1 GROUP BY 1),
        |s3 AS (SELECT f.user_id, min(f.ts) AS s3 FROM f JOIN s2 USING (user_id)
        |       WHERE f.event_type = 'purchase' AND f.ts > s2.s2 GROUP BY 1),
        |hz AS (SELECT user_id, epoch_ms(max(ts)) AS last_ms FROM f GROUP BY 1)
        |SELECT hz.user_id, epoch_us(s1.s1) AS s1_us, epoch_us(s2.s2) AS s2_us,
        |  epoch_us(s3.s3) AS s3_us
        |FROM hz LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id) CROSS JOIN wm
        |WHERE hz.last_ms + 1800000 < wm.wm_ms
        |ORDER BY hz.user_id""".stripMargin,

    "b100_tpch_q14" ->
      """WITH r AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev,
        |    p_type = 'PROMO' AS is_promo
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT month,
        |  CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT) AS promo_rev_c100,
        |  CAST(sum(rev) AS BIGINT) AS total_rev_c100,
        |  (CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT) * 10000)
        |    // CAST(sum(rev) AS BIGINT) AS promo_bp
        |FROM r GROUP BY month ORDER BY month""".stripMargin,

    // the mean gate clears denominators (bal·n > sum) — no float average
    "b101_tpch_q22" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c FROM customer),
        |a AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s, count(*) AS n FROM c WHERE bal_c > 0)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        |FROM c CROSS JOIN a
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE bal_c * a.n > a.s
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "b95_tpch_q3" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_c100
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-06-30'
        |  AND CAST(l_shipdate AS DATE) > DATE '1996-06-30'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_c100 DESC, l_orderkey LIMIT 10""".stripMargin,

    "b96_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_c100
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_c100 DESC, n_name""".stripMargin,

    "b97_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_c100
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_c100 DESC, c_custkey LIMIT 20""".stripMargin,

    // identical chained conditional-min windows; DuckDB's FILTER clause
    // is the CASE form's equivalent, kept as CASE for symmetry
    "b94_funnel" ->
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
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS s3
        |  FROM s2t),
        |u AS (SELECT user_id, max(s1) AS s1, max(s2) AS s2, max(s3) AS s3
        |      FROM s3t GROUP BY user_id),
        |c AS (SELECT CAST(count(s1) AS BIGINT) AS u1, CAST(count(s2) AS BIGINT) AS u2,
        |        CAST(count(s3) AS BIGINT) AS u3 FROM u)
        |SELECT 1 AS stage, 'view' AS event_type, u1 AS users,
        |  (u1 * 1000000) // NULLIF(u1, 0) AS conv_ppm FROM c
        |UNION ALL SELECT 2, 'click', u2, (u2 * 1000000) // NULLIF(u1, 0) FROM c
        |UNION ALL SELECT 3, 'purchase', u3, (u3 * 1000000) // NULLIF(u1, 0) FROM c
        |ORDER BY stage""".stripMargin,

    "b91_stream_sliding_hll" ->
      // sliding windows unrolled as the k ∈ {0,1} slide offsets of the
      // event's 30-min bucket: start ≡ 0 (mod slide) and ts ∈
      // [start, start + 1h) — exactly Spark's window(ts, 1h, 30m)
      // assignment; closed = end ≤ max(ts) − delay, the b78 shape
      """WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS wm FROM events),
        |w AS (SELECT time_bucket(INTERVAL '30 minutes', ts)
        |        - k.k * INTERVAL '30 minutes' AS ws, user_id
        |      FROM events CROSS JOIN (VALUES (0), (1)) k(k))
        |SELECT epoch_us(ws) AS w_start_us,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS approx_ok
        |FROM w CROSS JOIN wm
        |WHERE ws + INTERVAL 1 HOUR <= wm.wm
        |GROUP BY ws ORDER BY w_start_us""".stripMargin,

    "b77_period_over_period" ->
      // same sign-split bps rule (magnitude // then sign) — see the
      // Spark-side comment on the DuckDB-floor vs Spark-trunc difference
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1),
        |x AS (SELECT month, rev_cents,
        |        lag(rev_cents, 1) OVER (ORDER BY month) AS prev_cents FROM m)
        |SELECT month, rev_cents, prev_cents,
        |  rev_cents - prev_cents AS delta_cents,
        |  CAST(CASE WHEN rev_cents - prev_cents >= 0 THEN 1 ELSE -1 END
        |    * ((abs(rev_cents - prev_cents) * 10000) // NULLIF(prev_cents, 0)) AS BIGINT) AS change_bps
        |FROM x ORDER BY month""".stripMargin,

    "b76_expectations" ->
      """WITH rc AS (
        |  SELECT
        |    CAST(sum(CASE WHEN o_orderkey IS NULL OR o_custkey IS NULL
        |                    OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS not_null_keys,
        |    CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_positive,
        |    CAST(sum(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_le_100k,
        |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1992-01-01'
        |                    OR CAST(o_orderdate AS DATE) >= DATE '2002-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_in_range,
        |    CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
        |                    '4-NOT SPECIFIED', '5-LOW') THEN 1 ELSE 0 END) AS BIGINT) AS priority_domain
        |  FROM orders),
        |up AS (
        |  SELECT 'not_null_keys' AS "check", not_null_keys AS n_viol FROM rc
        |  UNION ALL SELECT 'totalprice_positive', totalprice_positive FROM rc
        |  UNION ALL SELECT 'totalprice_le_100k', totalprice_le_100k FROM rc
        |  UNION ALL SELECT 'orderdate_in_range', orderdate_in_range FROM rc
        |  UNION ALL SELECT 'priority_domain', priority_domain FROM rc
        |  UNION ALL SELECT 'custkey_fk', CAST(count(*) AS BIGINT) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL SELECT 'orderkey_unique', CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
        |    (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
        |SELECT "check", n_viol FROM up ORDER BY "check"""".stripMargin,

    "b75_winsorize" ->
      // the same explicit inverse-CDF rule over the distinct-value frame
      // (NOT quantile_disc — one shared integer definition on both
      // engines), then the same clamp
      """WITH li AS (SELECT l_returnflag AS flag,
        |              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |            FROM lineitem),
        |vc AS (SELECT flag, cents, count(*) AS cnt FROM li GROUP BY 1, 2),
        |c AS (SELECT flag, cents, cnt,
        |        sum(cnt) OVER (PARTITION BY flag ORDER BY cents) AS cum,
        |        sum(cnt) OVER (PARTITION BY flag) AS n
        |      FROM vc),
        |e AS (SELECT flag, min(CASE WHEN cum * 20 >= n THEN cents END) AS lo,
        |             min(CASE WHEN cum * 20 >= 19 * n THEN cents END) AS hi
        |      FROM c GROUP BY flag)
        |SELECT li.flag, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(greatest(lo, least(hi, cents))) AS BIGINT) AS sum_winsorized,
        |  CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
        |FROM li JOIN e USING (flag) GROUP BY li.flag ORDER BY flag""".stripMargin,

    "b74_attribution" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER lb AS click_id0,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER lb AS click_us0
        |  FROM events
        |  WINDOW lb AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id AS purchase_id, user_id,
        |  CASE WHEN click_us0 IS NOT NULL AND us - click_us0 <= 604800000000 THEN click_id0 END AS click_id,
        |  CASE WHEN click_us0 IS NOT NULL AND us - click_us0 <= 604800000000 THEN us - click_us0 END AS gap_us
        |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,

    "b73_twap" ->
      // identical lead-window areas; durations tile the span so the sum
      // is bounded by max_cents · span — no overflow at any row count
      """WITH o AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |x AS (SELECT user_id, us, cents,
        |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt FROM o),
        |g AS (SELECT user_id, count(*) AS n_obs,
        |        max(us) - min(us) AS span_micros,
        |        CAST(sum(CASE WHEN nxt IS NOT NULL THEN cents * (nxt - us) ELSE 0 END) AS BIGINT) AS area
        |      FROM x GROUP BY user_id)
        |SELECT user_id, n_obs, span_micros,
        |  CAST(area // span_micros AS BIGINT) AS twap_cents
        |FROM g WHERE span_micros > 0 ORDER BY user_id""".stripMargin,

    "b72_stream_ivm_parity" ->
      """SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,

    "b65_stream_session_parity" ->
      // b20's gaps-and-islands sessionization + the final-watermark cut:
      // only sessions whose end (last event + gap) the watermark
      // (max ts - delay) passed — i.e. exactly what the append-mode
      // native session_window stream has emitted after draining the table
      """WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |sess AS (
        |  SELECT CAST(min(ts) AS TIMESTAMP) AS session_start,
        |    CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
        |    user_id, count(*) AS n
        |  FROM y GROUP BY user_id, sid)
        |SELECT session_start, session_end, user_id, n FROM sess
        |WHERE session_end <= (SELECT max(ts) - INTERVAL 30 MINUTE FROM events)
        |ORDER BY user_id, session_start""".stripMargin)
}
