package graft

/** DuckDB oracle SQL for [[graft.operators.Relational]].
  *
  * Conventions keeping both engines bit-identical:
  *   - money: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` — decimal
  *     accumulation is exact, so the final double is order-independent;
  *   - counts cast to BIGINT on both sides;
  *   - `length()`/`year()` return INT in Spark vs BIGINT in DuckDB →
  *     Spark side casts to long.
  */
object OracleRelational {

  private def dsum(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private val discPrice =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  val q1: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       |  ${dsum("l_extendedprice")} AS sum_base_price,
       |  $discPrice AS sum_disc_price,
       |  count(*) AS count_order,
       |  min(l_quantity) AS min_qty,
       |  max(l_quantity) AS max_qty
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val q2: String =
    """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_discount > 0.05 AND l_quantity < 10""".stripMargin

  val q3: String =
    s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
       |  $discPrice AS revenue, count(*) AS n_items
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderstatus = 'F'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority""".stripMargin

  val q4: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 48)
      |GROUP BY o_orderpriority""".stripMargin

  val q5: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 250000)""".stripMargin

  val q6: String =
    s"""SELECT p_brand, ${dsum("l_extendedprice")} AS brand_revenue,
       |  count(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand""".stripMargin

  val q7: String =
    s"""SELECT c_custkey, c_mktsegment,
       |  count(o_orderkey) AS n_orders,
       |  COALESCE(${dsum("o_totalprice")}, 0.0) AS total_spent
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey, c_mktsegment""".stripMargin

  val q8: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
      |  FROM orders)
      |WHERE rk <= 3""".stripMargin

  val q9: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_spend
      |FROM orders""".stripMargin

  val q10: String =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  val q11: String =
    """SELECT c_custkey AS custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin

  val q12: String =
    """SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
      |INTERSECT
      |SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer""".stripMargin

  val q13: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  val q14: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  val q15: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  val q16: String =
    s"""SELECT o_custkey, count(*) AS n_orders, ${dsum("o_totalprice")} AS spend
       |FROM orders GROUP BY o_custkey HAVING count(*) >= 15""".stripMargin

  val q17: String =
    s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
       |            WHEN o_totalprice < 150000 THEN 'medium'
       |            ELSE 'large' END AS bucket,
       |  count(*) AS n, ${dsum("o_totalprice")} AS bucket_total
       |FROM orders GROUP BY 1""".stripMargin

  val q18: String =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_upper,
      |  lower(p_type) AS type_lower,
      |  substring(p_name, 1, 8) AS name_prefix,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  p_brand || '/' || p_type AS brand_type,
      |  regexp_replace(p_brand, '#', '-') AS brand_dashed,
      |  p_name LIKE '%green%' AS is_green,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word
      |FROM part""".stripMargin

  val q19: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
      |  CAST(day(o_orderdate) AS BIGINT) AS order_day,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  o_orderdate + INTERVAL 30 DAY AS due_date
      |FROM orders""".stripMargin

  val q20: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM orders)""".stripMargin

  val q21: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  val q23: String =
    s"""SELECT r_name, n_name, $discPrice AS revenue, count(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name""".stripMargin

  val q24: String =
    """SELECT k % 10 AS k_mod, event_type, count(*) AS n
      |FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |             event_type FROM events)
      |GROUP BY k % 10, event_type""".stripMargin

  val q25: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  string_split(text, ' ')[1] AS first_word,
      |  string_split(text, ' ')[-1] AS last_word,
      |  list_contains(string_split(text, ' '), 'spark') AS mentions_spark
      |FROM documents""".stripMargin

  val q26: String =
    """WITH s AS (SELECT CAST(s_nationkey AS INT) AS nationkey, count(*) AS n_suppliers
      |           FROM supplier GROUP BY 1),
      |     c AS (SELECT CAST(c_nationkey AS INT) AS nationkey, count(*) AS n_customers
      |           FROM customer GROUP BY 1)
      |SELECT COALESCE(s.nationkey, c.nationkey) AS nationkey,
      |  COALESCE(n_suppliers, 0) AS n_suppliers,
      |  COALESCE(n_customers, 0) AS n_customers
      |FROM s FULL OUTER JOIN c ON s.nationkey = c.nationkey""".stripMargin

  val q27: String =
    """SELECT nationkey, count(*) AS n FROM (
      |  SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
      |  UNION ALL
      |  SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer)
      |GROUP BY nationkey""".stripMargin

  /** Differential check of the union+window as-of implementation
    * against DuckDB's NATIVE ASOF JOIN (right side pre-deduped per
    * (user, ts) so tie-breaking is engine-independent).
    */
  val q28: String =
    """WITH purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |),
      |views AS (
      |  SELECT user_id, ts AS view_ts, max(event_id) AS view_event_id
      |  FROM events WHERE event_type = 'view'
      |  GROUP BY user_id, ts
      |)
      |SELECT p.event_id, p.user_id, p.ts,
      |  v.view_ts AS asof_view_ts,
      |  v.view_event_id AS asof_view_event_id
      |FROM purchases p
      |ASOF LEFT JOIN views v
      |  ON p.user_id = v.user_id AND p.ts >= v.view_ts""".stripMargin

  val q29: String =
    """WITH purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |),
      |views AS (
      |  SELECT user_id, ts AS view_ts, value AS view_value
      |  FROM events WHERE event_type = 'view'
      |)
      |SELECT p.user_id, p.event_id, p.ts,
      |  count(v.view_ts) AS n_prior_views,
      |  CAST(sum(CAST(v.view_value AS DECIMAL(18,2))) AS DOUBLE) AS prior_view_value
      |FROM purchases p
      |LEFT JOIN views v
      |  ON p.user_id = v.user_id
      |  AND v.view_ts >= p.ts - INTERVAL 1 DAY
      |  AND v.view_ts < p.ts
      |GROUP BY p.user_id, p.event_id, p.ts""".stripMargin

  val q30: String =
    """WITH marked AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              <= INTERVAL 30 MINUTE
      |         THEN 0 ELSE 1 END AS new_session
      |  FROM events
      |),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM marked
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  val q31: String =
    s"""SELECT CAST(floor(o_totalprice / 25000) AS INT) AS bucket,
       |  count(*) AS n,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
       |FROM orders
       |GROUP BY 1""".stripMargin

  val q32: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS median,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** Salting is an execution detail: the oracle is the plain count. */
  val q34: String =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word""".stripMargin

  val q36: String =
    """SELECT event_id, user_id, ts,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_7d_value,
      |  count(*) OVER w AS rolling_7d_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin

  val q37: String =
    """SELECT event_id, user_id, ts,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  lead(event_type, 1) OVER w AS next_type,
      |  first_value(event_id) OVER wf AS first_event,
      |  last_value(event_id) OVER wf AS last_event
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
      |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  /** Pivot as portable conditional aggregation (count of no rows is 0,
    * matching the Spark side's fill).
    */
  val q33: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'view') AS view,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase
      |FROM events
      |GROUP BY user_id""".stripMargin

  /** Mirror of Relational.q38Funnel: same integer encode and ordered
    * fold; `list_prepend(0, ...)` supplies the seed Spark's `aggregate`
    * passes explicitly (DuckDB's list_reduce seeds with the head).
    */
  val q38: String =
    """WITH f AS (
      |  SELECT user_id,
      |    epoch_us(ts) * 8 + CASE event_type
      |      WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3
      |      ELSE 0 END AS enc
      |  FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')
      |)
      |SELECT user_id,
      |  CAST(list_reduce(list_prepend(0, list_sort(list(enc))), (acc, x) -> CASE
      |    WHEN acc = 0 AND x % 8 = 1 THEN 1
      |    WHEN acc = 1 AND x % 8 = 2 THEN 2
      |    WHEN acc = 2 AND x % 8 = 3 THEN 3
      |    ELSE acc END) AS BIGINT) AS funnel_stage,
      |  count(*) AS n_funnel_events
      |FROM f GROUP BY user_id""".stripMargin

  /** Mirror of Relational.q39Retention: first-activity-day cohorts ×
    * day offset, distinct users per cell (integer day math).
    */
  val q39: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
      |),
      |coh AS (
      |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
      |)
      |SELECT c.cohort_day,
      |  CAST(e.day - c.cohort_day AS BIGINT) AS day_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM ev e JOIN coh c USING (user_id)
      |GROUP BY c.cohort_day, day_offset""".stripMargin

  /** Mirror of Relational.q40GroupingSets: the two single-column sets,
    * gid encoded exactly like Spark's grouping_id() over
    * (l_returnflag, l_linestatus).
    */
  val q40: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin

  /** Mirror of Relational.q41ExistsSubquery (same correlated predicates). */
  val q41: String =
    """SELECT p_partkey, p_brand, p_type
      |FROM part p
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49
      |      AND l.l_returnflag = 'R')""".stripMargin

  /** Mirror of Relational.q43LateralTopN (DuckDB runs the same LATERAL). */
  val q43: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name ASC LIMIT 3
      |) t""".stripMargin

  /** Mirror of Relational.q44HeavyHitters: exact GROUP BY — valid
    * because capacity 4096 > distinct users at every test SF, so the
    * Misra-Gries sketch runs in its exact regime (no decrement fires).
    */
  val q44: String =
    """SELECT user_id, count(*) AS events
      |FROM events
      |WHERE user_id IS NOT NULL
      |GROUP BY user_id
      |ORDER BY events DESC, user_id ASC
      |LIMIT 20""".stripMargin

  /** Mirror of Relational.q46CmsCounts: the sketch runs in its exact
    * regime (identity row, width > key domain), so the estimate for
    * every probed key equals the exact count — 0 for absent keys.
    */
  val q46: String =
    """WITH probes AS (SELECT unnest(range(0, 200)) AS user_id),
      |cnt AS (
      |  SELECT user_id, count(*) AS c FROM events
      |  WHERE user_id IS NOT NULL GROUP BY user_id
      |)
      |SELECT p.user_id, CAST(COALESCE(c.c, 0) AS BIGINT) AS events_est
      |FROM probes p LEFT JOIN cnt c USING (user_id)""".stripMargin

  /** Mirror of Relational.q48KmvDistinct — recomputes the bottom-k
    * hash set from scratch: distinct (event_type, 60-bit md5-device
    * hash), `row_number() OVER (ORDER BY h) <= k` keeps the k
    * smallest, max-of-kept is the k-th minimum, and the estimate is
    * the single division by the same Scala-folded numerator the Spark
    * side embeds. LEFT JOIN from the distinct type list so a group
    * whose user_ids are all NULL still emits the empty sketch.
    */
  val q48: String = {
    val k = graft.operators.Relational.KmvK
    val num = java.lang.Double.toString(graft.functions.KmvAgg.estimatorNum(k))
    val rot = OracleText.rotLong("hh", 0)
    s"""WITH hs AS (
       |  SELECT DISTINCT event_type, $rot AS h
       |  FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hh
       |        FROM events WHERE user_id IS NOT NULL)
       |),
       |rk AS (
       |  SELECT event_type, h, row_number() OVER (
       |    PARTITION BY event_type ORDER BY h) AS rn
       |  FROM hs
       |),
       |kept AS (
       |  SELECT event_type, count(*) AS n_kept, max(h) AS kth
       |  FROM rk WHERE rn <= $k GROUP BY event_type
       |),
       |ex AS (
       |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events GROUP BY event_type
       |)
       |SELECT e.event_type, e.n_exact,
       |  CAST(COALESCE(kp.n_kept, 0) AS BIGINT) AS n_kept,
       |  kp.kth AS kmv_kth,
       |  CASE WHEN COALESCE(kp.n_kept, 0) < $k
       |       THEN CAST(COALESCE(kp.n_kept, 0) AS DOUBLE)
       |       ELSE $num / CAST(kp.kth AS DOUBLE) END AS kmv_est
       |FROM ex e LEFT JOIN kept kp USING (event_type)""".stripMargin
  }

  /** Mirror of Relational.q47HllDistinct — recomputes the HLL register
    * file FROM SCRATCH in plain SQL (no sketch state crosses engines):
    * the md5-device 60-bit hash (OracleText.rotLong's r = 0 form), top
    * 12 bits = bucket, rank via the bin-string first-set-bit device,
    * max rank per bucket, then the integer-scaled harmonic sum with
    * empty buckets contributing `2^49` each (LEFT JOIN + COALESCE: a
    * group whose keys are all NULL still gets the all-empty file).
    * The estimate is the single division by the Scala-folded constant
    * K — the one double op, identical parse on both engines. Integer
    * sums CAST back to BIGINT (DuckDB widens to HUGEINT).
    */
  val q47: String = {
    val p = graft.operators.Relational.HllP
    val m = 1 << p
    val lowBits = 60 - p
    val lowMod = 1L << lowBits
    val maxRank = lowBits + 1
    val k = java.lang.Double.toString(graft.functions.HyperLogLogAgg.estimatorK(p))
    val rot = OracleText.rotLong("hh", 0)
    s"""WITH hs AS (
       |  SELECT event_type, $rot AS h
       |  FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hh
       |        FROM events WHERE user_id IS NOT NULL)
       |),
       |br AS (
       |  SELECT event_type, h // $lowMod AS bucket,
       |    CASE WHEN h % $lowMod = 0 THEN $maxRank
       |         ELSE strpos(lpad(bin(h % $lowMod), $lowBits, '0'), '1') END AS rho
       |  FROM hs
       |),
       |regs AS (
       |  SELECT event_type, bucket, max(rho) AS r FROM br GROUP BY event_type, bucket
       |),
       |ag AS (
       |  SELECT event_type,
       |    CAST(sum(CAST(1 AS BIGINT) << ($maxRank - r)) AS BIGINT) AS s_obs,
       |    count(*) AS n_obs
       |  FROM regs GROUP BY event_type
       |),
       |ex AS (
       |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events GROUP BY event_type
       |)
       |SELECT e.event_type, e.n_exact,
       |  CAST(COALESCE(a.s_obs, 0) +
       |    ($m - COALESCE(a.n_obs, 0)) * (CAST(1 AS BIGINT) << $maxRank) AS BIGINT) AS hll_s,
       |  CAST($m - COALESCE(a.n_obs, 0) AS BIGINT) AS hll_zero,
       |  CAST($k AS DOUBLE) / CAST(COALESCE(a.s_obs, 0) +
       |    ($m - COALESCE(a.n_obs, 0)) * (CAST(1 AS BIGINT) << $maxRank) AS DOUBLE) AS hll_est
       |FROM ex e LEFT JOIN ag a USING (event_type)""".stripMargin
  }

  /** Mirror of sources.Layout.q45BucketedJoin: the SAME join with no
    * layout at all — identical results is the proof that bucketing is
    * a pure physical-plan property.
    */
  val q45: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS lines
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Mirror of sources.Layout.evtPartitionPruned: the same date window
    * as a plain predicate over the unpartitioned table.
    */
  val evtPruned: String =
    """SELECT event_type, count(*) AS events,
      |  min(event_id) AS min_event_id, max(event_id) AS max_event_id
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
      |GROUP BY event_type""".stripMargin

  /** Mirror of sources.Layout.evtZorderBox: the same 2-D box (user
    * band × week) as plain predicates over the unordered table — the
    * z-curve re-layout must not change a single row.
    */
  val evtZorderBox: String =
    """SELECT event_type, count(*) AS events,
      |  min(event_id) AS min_event_id, max(event_id) AS max_event_id
      |FROM events
      |WHERE user_id BETWEEN 4 AND 7
      |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
      |GROUP BY event_type""".stripMargin

  /** Mirror of Relational.evtRollingDistinct: the explode-to-equi-join
    * window algebra in SQL (each observation fans to its ≤ 7 anchor
    * days; anchors clipped to observed days), exact distinct count.
    */
  val evtRollingDistinct: String = {
    val w = graft.operators.Relational.RollingDays
    s"""WITH obs AS (
       |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
       |  FROM events
       |),
       |od AS (SELECT DISTINCT event_type, day FROM obs),
       |contrib AS (
       |  SELECT o.event_type, o.day + CAST(t.o AS INT) AS day, o.user_id
       |  FROM obs o, unnest(range(0, $w)) t(o)
       |)
       |SELECT c.event_type, c.day,
       |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users_7d
       |FROM contrib c JOIN od USING (event_type, day)
       |GROUP BY c.event_type, c.day""".stripMargin
  }

  /** Mirror of Relational.evtRollingDistinctHll — rebuilds every
    * window's register file FROM SCRATCH (union of the window's
    * users, then the q47 register pipeline per (type, day) anchor):
    * element-wise max of daily registers equals registers of the
    * union, so the merged-sketch query is fully hash-checkable.
    */
  val evtRollingDistinctHll: String = {
    val p = graft.operators.Relational.HllP
    val m = 1 << p
    val lowBits = 60 - p
    val lowMod = 1L << lowBits
    val maxRank = lowBits + 1
    val k = java.lang.Double.toString(graft.functions.HyperLogLogAgg.estimatorK(p))
    val w = graft.operators.Relational.RollingDays
    val rot = OracleText.rotLong("hh", 0)
    s"""WITH obs AS (
       |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
       |  FROM events WHERE user_id IS NOT NULL
       |),
       |od AS (SELECT DISTINCT event_type, day FROM obs),
       |win AS (
       |  SELECT DISTINCT c.event_type, c.day, c.user_id FROM (
       |    SELECT o.event_type, o.day + CAST(t.o AS INT) AS day, o.user_id
       |    FROM obs o, unnest(range(0, $w)) t(o)) c
       |  JOIN od USING (event_type, day)
       |),
       |hs AS (
       |  SELECT event_type, day, $rot AS h
       |  FROM (SELECT event_type, day, md5(CAST(user_id AS VARCHAR)) AS hh
       |        FROM win)
       |),
       |br AS (
       |  SELECT event_type, day, h // $lowMod AS bucket,
       |    CASE WHEN h % $lowMod = 0 THEN $maxRank
       |         ELSE strpos(lpad(bin(h % $lowMod), $lowBits, '0'), '1') END AS rho
       |  FROM hs
       |),
       |regs AS (
       |  SELECT event_type, day, bucket, max(rho) AS r
       |  FROM br GROUP BY event_type, day, bucket
       |),
       |ag AS (
       |  SELECT event_type, day,
       |    CAST(sum(CAST(1 AS BIGINT) << ($maxRank - r)) AS BIGINT) AS s_obs,
       |    count(*) AS n_obs
       |  FROM regs GROUP BY event_type, day
       |)
       |SELECT event_type, day,
       |  CAST(s_obs + ($m - n_obs) * (CAST(1 AS BIGINT) << $maxRank) AS BIGINT) AS hll_s,
       |  CAST($m - n_obs AS BIGINT) AS hll_zero,
       |  CAST($k AS DOUBLE) / CAST(s_obs +
       |    ($m - n_obs) * (CAST(1 AS BIGINT) << $maxRank) AS DOUBLE) AS hll_est
       |FROM ag""".stripMargin
  }

  /** Mirror of Relational.q52Pagination: same full total order, same
    * page window.
    */
  val q52: String = {
    val from = graft.operators.Relational.PageFrom
    val size = graft.operators.Relational.PageSize
    s"""WITH rk AS (
       |  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
       |    row_number() OVER (PARTITION BY c_nationkey
       |      ORDER BY c_acctbal DESC, c_custkey ASC) AS "rank"
       |  FROM customer
       |)
       |SELECT * FROM rk WHERE "rank" > $from AND "rank" <= ${from + size}""".stripMargin
  }

  /** Mirror of Relational.q53KeysetPage: the cursor is the sort-order
    * last of the first-PageFrom rows (LIMIT/OFFSET here — the oracle
    * can afford the naive form), the page is the key predicate + top
    * PageSize.
    */
  val q53: String = {
    val from = graft.operators.Relational.PageFrom
    val size = graft.operators.Relational.PageSize
    s"""WITH b AS (
       |  SELECT c_acctbal AS b_acctbal, c_custkey AS b_custkey
       |  FROM customer ORDER BY c_acctbal DESC, c_custkey ASC
       |  LIMIT 1 OFFSET ${from - 1}
       |)
       |SELECT c.c_custkey, c.c_name, c.c_acctbal
       |FROM customer c, b
       |WHERE c.c_acctbal < b.b_acctbal
       |   OR (c.c_acctbal = b.b_acctbal AND c.c_custkey > b.b_custkey)
       |ORDER BY c.c_acctbal DESC, c.c_custkey ASC
       |LIMIT $size""".stripMargin
  }

  /** Mirror of Relational.q54CompositeAgg: the after-key predicate on
    * raw columns, then the grouped page in key order.
    */
  val q54: String = {
    val r = graft.operators.Relational
    s"""SELECT c_nationkey, c_mktsegment,
       |  CAST(count(*) AS BIGINT) AS n_cust,
       |  ${dsum("c_acctbal")} AS sum_acctbal
       |FROM customer
       |WHERE c_nationkey > ${r.CompositeAfterNation}
       |   OR (c_nationkey = ${r.CompositeAfterNation}
       |       AND c_mktsegment > '${r.CompositeAfterSegment}')
       |GROUP BY c_nationkey, c_mktsegment
       |ORDER BY c_nationkey ASC, c_mktsegment ASC
       |LIMIT ${r.CompositePageSize}""".stripMargin
  }

  /** Mirror of sources.Layout.evtBloomSkip: the same point lookups as
    * a plain IN over the unindexed table — identical rows proves the
    * bloom skipping is correctness-free (no false negatives; false
    * positives die in the exact filter).
    */
  val evtBloomSkip: String = {
    val ids = graft.sources.Layout.BloomProbeIds.mkString(", ")
    s"""SELECT event_id, user_id, event_type, value
       |FROM events WHERE event_id IN ($ids)""".stripMargin
  }

  /** Mirror of Relational.q42RankFamily: one fully-ordered window, so
    * ranks have no peer groups and the double ratios are bit-equal.
    */
  val q42: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin

  /** Mirror of Relational.q49WeightedSample — the same replicated-unit
    * min-hash keys recomputed from scratch: power-of-two weight
    * quantization (exact floor), one md5 per (event, unit), min per
    * event, rank ≤ k per type. Pure integer order throughout.
    */
  val q49: String = {
    val k = graft.operators.Relational.WsK
    val cap = graft.operators.Relational.WsCap
    val rot = OracleText.rotLong("hh", 0)
    s"""WITH wt AS (
       |  SELECT event_type, event_id,
       |    greatest(1, least($cap, 1 + CAST(floor(value / 64.0) AS BIGINT))) AS weight
       |  FROM events
       |),
       |units AS (
       |  SELECT event_type, event_id, weight,
       |    unnest(range(1, weight + 1)) AS r
       |  FROM wt
       |),
       |keys AS (
       |  SELECT event_type, event_id, weight, $rot AS unit_key
       |  FROM (SELECT event_type, event_id, weight,
       |          md5(CAST(event_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS hh
       |        FROM units)
       |),
       |mins AS (
       |  SELECT event_type, event_id,
       |    max(weight) AS weight, min(unit_key) AS sample_key
       |  FROM keys GROUP BY event_type, event_id
       |),
       |rk AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY event_type ORDER BY sample_key ASC, event_id ASC) AS "rank"
       |  FROM mins
       |)
       |SELECT event_type, "rank", event_id, weight, sample_key
       |FROM rk WHERE "rank" <= $k""".stripMargin
  }

  /** Mirror of Relational.q50SampleQuantiles — the bottom-k-by-hash
    * sample re-taken from scratch (md5 hash order ≡ Spark), quantile
    * indexes by integer division (`//` ≡ Spark DIV), values copied
    * never computed — bit-equal by construction.
    */
  val q50: String = {
    val k = graft.operators.Relational.SqK
    val rot = OracleText.rotLong("hh", 0)
    s"""WITH h AS (
       |  SELECT event_type, event_id, value, $rot AS h
       |  FROM (SELECT event_type, event_id, value,
       |          md5(CAST(event_id AS VARCHAR)) AS hh FROM events)
       |),
       |rk AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY event_type ORDER BY h ASC, event_id ASC) AS rn
       |  FROM h
       |),
       |smp AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled,
       |    list(value ORDER BY value) AS vs
       |  FROM rk WHERE rn <= $k GROUP BY event_type
       |)
       |SELECT event_type, n_sampled,
       |  vs[1] AS sample_min,
       |  vs[CAST((n_sampled - 1) // 4 + 1 AS INT)] AS p25,
       |  vs[CAST((n_sampled - 1) // 2 + 1 AS INT)] AS p50,
       |  vs[CAST(3 * (n_sampled - 1) // 4 + 1 AS INT)] AS p75,
       |  vs[CAST(n_sampled AS INT)] AS sample_max
       |FROM smp""".stripMargin
  }

  /** Mirror of Relational.q57KmvJaccard: same 60-bit hash, same
    * bottom-k sketches, same union-sketch Jaccard estimator, same
    * exact gauges.
    */
  val q57: String = {
    val k = graft.operators.Relational.KmvK
    val rot = OracleText.rotLong("hh", 0)
    s"""WITH hs AS (
       |  SELECT DISTINCT event_type, $rot AS h
       |  FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hh
       |        FROM events WHERE user_id IS NOT NULL)
       |),
       |sk AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h, row_number() OVER (
       |      PARTITION BY event_type ORDER BY h) AS rn FROM hs
       |  ) WHERE rn <= $k
       |),
       |types AS (SELECT DISTINCT event_type FROM hs),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b
       |  FROM types a, types b WHERE a.event_type < b.event_type
       |),
       |uk AS (
       |  SELECT type_a, type_b, h FROM (
       |    SELECT p.type_a, p.type_b, u.h, row_number() OVER (
       |      PARTITION BY p.type_a, p.type_b ORDER BY u.h) AS rn
       |    FROM pairs p JOIN (SELECT DISTINCT p2.type_a, p2.type_b, hs.h
       |      FROM pairs p2 JOIN hs
       |        ON hs.event_type = p2.type_a OR hs.event_type = p2.type_b) u
       |      ON u.type_a = p.type_a AND u.type_b = p.type_b
       |  ) WHERE rn <= $k
       |),
       |ku AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS k_used
       |       FROM uk GROUP BY type_a, type_b),
       |com AS (
       |  SELECT u.type_a, u.type_b, CAST(count(*) AS BIGINT) AS n_common
       |  FROM uk u
       |  JOIN sk sa ON sa.event_type = u.type_a AND sa.h = u.h
       |  JOIN sk sb ON sb.event_type = u.type_b AND sb.h = u.h
       |  GROUP BY u.type_a, u.type_b
       |),
       |du AS (SELECT DISTINCT event_type, user_id FROM events
       |       WHERE user_id IS NOT NULL),
       |np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd
       |       FROM du GROUP BY event_type),
       |ix AS (
       |  SELECT p.type_a, p.type_b, CAST(count(*) AS BIGINT) AS n_inter_exact
       |  FROM pairs p
       |  JOIN du da ON da.event_type = p.type_a
       |  JOIN du db ON db.event_type = p.type_b AND db.user_id = da.user_id
       |  GROUP BY p.type_a, p.type_b
       |)
       |SELECT p.type_a, p.type_b, ku.k_used,
       |  COALESCE(com.n_common, 0) AS n_common,
       |  CAST(COALESCE(com.n_common, 0) AS DOUBLE) / CAST(ku.k_used AS DOUBLE)
       |    AS jaccard_est,
       |  COALESCE(ix.n_inter_exact, 0) AS n_inter_exact,
       |  na.nd + nb.nd - COALESCE(ix.n_inter_exact, 0) AS n_union_exact,
       |  CAST(COALESCE(ix.n_inter_exact, 0) AS DOUBLE) /
       |    CAST(na.nd + nb.nd - COALESCE(ix.n_inter_exact, 0) AS DOUBLE)
       |    AS jaccard_exact
       |FROM pairs p
       |JOIN ku ON ku.type_a = p.type_a AND ku.type_b = p.type_b
       |LEFT JOIN com ON com.type_a = p.type_a AND com.type_b = p.type_b
       |LEFT JOIN ix ON ix.type_a = p.type_a AND ix.type_b = p.type_b
       |JOIN np na ON na.event_type = p.type_a
       |JOIN np nb ON nb.event_type = p.type_b""".stripMargin
  }

  /** Mirror of Relational.evtPipelineAggs: same daily counters, same
    * three bucket-level windows.
    */
  /** Mirror of Relational.evtSerialDiff. */
  val evtSerialDiff: String = {
    val lag = graft.operators.Relational.SerialDiffLag
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY event_type, CAST(ts AS DATE)
       |)
       |SELECT event_type, day, n,
       |  n - lag(n, $lag) OVER (PARTITION BY event_type ORDER BY day)
       |    AS diff7
       |FROM daily""".stripMargin
  }

  /** Mirror of Relational.evtSiblingAggs: window-rank argmin/argmax
    * (≡ the Spark struct-min selection on exact integers), one IEEE
    * division, exact lower median at the integer index.
    */
  val evtSiblingAggs: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)
      |),
      |agg AS (
      |  SELECT event_type,
      |    CAST(sum(n) AS BIGINT) AS sum_n,
      |    CAST(count(*) AS BIGINT) AS n_buckets,
      |    list_sort(list(n)) AS ns
      |  FROM daily GROUP BY event_type
      |),
      |mx AS (
      |  SELECT event_type, day AS max_bucket_day, n AS max_n FROM (
      |    SELECT event_type, day, n, row_number() OVER (
      |      PARTITION BY event_type ORDER BY n DESC, day ASC) AS rk
      |    FROM daily) WHERE rk = 1
      |),
      |mn AS (
      |  SELECT event_type, day AS min_bucket_day, n AS min_n FROM (
      |    SELECT event_type, day, n, row_number() OVER (
      |      PARTITION BY event_type ORDER BY n ASC, day ASC) AS rk
      |    FROM daily) WHERE rk = 1
      |)
      |SELECT a.event_type,
      |  mx.max_bucket_day, mx.max_n,
      |  mn.min_bucket_day, mn.min_n,
      |  CAST(a.sum_n AS DOUBLE) / CAST(a.n_buckets AS DOUBLE) AS avg_n,
      |  a.sum_n, a.n_buckets,
      |  a.ns[CAST((a.n_buckets - 1) // 2 + 1 AS INT)] AS p50_n
      |FROM agg a
      |JOIN mx ON mx.event_type = a.event_type
      |JOIN mn ON mn.event_type = a.event_type""".stripMargin

  val evtPipelineAggs: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)
      |)
      |SELECT event_type, day, n,
      |  n - lag(n) OVER w AS delta,
      |  CAST(sum(n) OVER w7 AS DOUBLE) / CAST(count(n) OVER w7 AS DOUBLE) AS ma7,
      |  CAST(sum(n) OVER wcum AS BIGINT) AS cum_n
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day),
      |  w7 AS (PARTITION BY event_type ORDER BY day
      |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |  wcum AS (PARTITION BY event_type ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Mirror of Relational.q55Mad: per-group exact median, then the
    * median of absolute deviations from it (quantile_cont ≡ Spark
    * percentile — the q32 precedent).
    */
  val q55: String =
    """WITH med AS (
      |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l.l_returnflag, min(m.median) AS median,
      |  quantile_cont(abs(l.l_quantity - m.median), 0.5) AS mad,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem l JOIN med m USING (l_returnflag)
      |GROUP BY l.l_returnflag""".stripMargin

  /** Mirror of Relational.q56ExtendedStats: exact integer moments
    * (HUGEINT ≡ Spark DECIMAL(38,0) — both exact; quantities are
    * integral), divisions and sqrt in double at the very end.
    */
  val q56: String =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(l_quantity) AS min_q,
      |  max(l_quantity) AS max_q,
      |  CAST(sum(CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sum_q,
      |  CAST(sum(CAST(l_quantity AS HUGEINT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS avg_q,
      |  CAST(sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT))
      |    AS DOUBLE) AS sum_sq,
      |  CAST(CAST(count(*) AS HUGEINT)
      |         * sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT))
      |       - sum(CAST(l_quantity AS HUGEINT)) * sum(CAST(l_quantity AS HUGEINT))
      |    AS DOUBLE)
      |    / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)) AS variance_pop,
      |  sqrt(CAST(CAST(count(*) AS HUGEINT)
      |         * sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT))
      |       - sum(CAST(l_quantity AS HUGEINT)) * sum(CAST(l_quantity AS HUGEINT))
      |    AS DOUBLE)
      |    / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE))) AS std_pop
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** Mirror of Relational.evtAnomaly: same daily counters, same
    * integer-space flag rewrite `(d·n − s)² > Z²·(d·ss − s²)` (HUGEINT
    * arithmetic on DuckDB's side — exact either way), one IEEE
    * division for the reported mean.
    */
  val evtAnomaly: String = {
    val z2 = graft.operators.Relational.AnomalyZ * graft.operators.Relational.AnomalyZ
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY event_type, CAST(ts AS DATE)
       |),
       |m AS (
       |  SELECT event_type, day, n,
       |    count(*) OVER w AS d, sum(n) OVER w AS s,
       |    sum(CAST(n AS HUGEINT) * n) OVER w AS ss
       |  FROM daily WINDOW w AS (PARTITION BY event_type)
       |)
       |SELECT event_type, day, n,
       |  CAST(s AS DOUBLE) / CAST(d AS DOUBLE) AS mean_daily,
       |  CAST(d * n - s AS HUGEINT) * (d * n - s)
       |    > $z2 * (CAST(d AS HUGEINT) * ss - CAST(s AS HUGEINT) * s) AS is_anomaly
       |FROM m""".stripMargin
  }

  /** Mirror of Relational.evtPaths: the q30 sessionization rule, the
    * ordered list device (`list(... ORDER BY ts, event_id)` ≡ Spark's
    * sort_array over collected structs — same (ts, id) total order),
    * identical cap/suffix, deterministic (count desc, path) top-k.
    */
  val evtPaths: String = {
    val cap = graft.operators.Relational.PathMaxLen
    val k = graft.operators.Relational.PathTopK
    s"""WITH seq AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN ts - lag(ts) OVER (
       |        PARTITION BY user_id ORDER BY ts, event_id)
       |      <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
       |  FROM events
       |),
       |sess AS (
       |  SELECT *, sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM seq
       |),
       |paths AS (
       |  SELECT list(event_type ORDER BY ts, event_id) AS l
       |  FROM sess GROUP BY user_id, session_id
       |),
       |p2 AS (
       |  SELECT array_to_string(l[1:$cap], '>') ||
       |    CASE WHEN len(l) > $cap THEN '>…' ELSE '' END AS path,
       |    CAST(len(l) AS BIGINT) AS len
       |  FROM paths
       |),
       |agg AS (
       |  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
       |    CAST(sum(len) AS BIGINT) AS n_events
       |  FROM p2 GROUP BY path
       |)
       |SELECT * FROM agg ORDER BY n_sessions DESC, path ASC LIMIT $k""".stripMargin
  }

  /** Mirror of Relational.evtDateHistogram: dense calendar frame via
    * generate_series over the same min/max span, zero-filled left
    * join, DECIMAL-summed day totals.
    */
  val evtDateHistogram: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)
      |),
      |span AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |  FROM events
      |),
      |days AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span
      |),
      |types AS (SELECT DISTINCT event_type FROM events)
      |SELECT t.event_type, dy.day,
      |  COALESCE(d.n, 0) AS n, COALESCE(d.value_sum, 0.0) AS value_sum
      |FROM days dy CROSS JOIN types t
      |LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = dy.day""".stripMargin

  /** Mirror of Relational.evtBucketPipeline: daily conditional counts,
    * HAVING floor, integer-grid derived metric, total-ordered top-N.
    */
  val evtBucketPipeline: String = {
    val r = graft.operators.Relational
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase
       |  FROM events GROUP BY CAST(ts AS DATE)
       |  HAVING count(*) >= ${r.BsMinDocs}
       |),
       |derived AS (
       |  SELECT day, doc_count, n_purchase,
       |    CAST((n_purchase * 1099511627776) // doc_count AS BIGINT)
       |      AS purchase_share_grid
       |  FROM daily
       |)
       |SELECT day, doc_count, n_purchase, purchase_share_grid,
       |  CAST(purchase_share_grid AS DOUBLE) / 1099511627776.0 AS purchase_share
       |FROM derived
       |ORDER BY purchase_share_grid DESC, day ASC
       |LIMIT ${r.BsTopN}""".stripMargin
  }

  /** Mirror of Relational.evtMovingMedian: the same ≤7-day explode
    * onto target days, inner join to observed days, sorted in-window
    * list, lower-median index copy.
    */
  val evtMovingMedian: String = {
    val w = graft.operators.Relational.MmWindow
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       |  FROM events GROUP BY CAST(ts AS DATE)
       |),
       |contrib AS (
       |  SELECT CAST(unnest(generate_series(day, day + INTERVAL ${w - 1} DAY,
       |    INTERVAL 1 DAY)) AS DATE) AS tday, value_sum
       |  FROM daily
       |),
       |win AS (
       |  SELECT c.tday, CAST(count(*) AS BIGINT) AS n_window,
       |    list(c.value_sum ORDER BY c.value_sum) AS vs
       |  FROM contrib c JOIN (SELECT day AS tday FROM daily) d USING (tday)
       |  GROUP BY c.tday
       |)
       |SELECT tday AS day, n_window,
       |  vs[CAST((n_window - 1) // 2 + 1 AS INT)] AS p50
       |FROM win""".stripMargin
  }

  /** Mirror of Relational.evtRandomSampler: the same md5-rotation
    * keep-1-in-N gate, DECIMAL sampled sums, ×N scale-ups.
    */
  val evtRandomSampler: String = {
    val m = graft.operators.Relational.RsMod
    s"""WITH s AS (
       |  SELECT event_type, value FROM (
       |    SELECT event_type, value, ${OracleText.rotLong("hh", 0)} AS h
       |    FROM (SELECT event_type, value,
       |            md5(CAST(event_id AS VARCHAR)) AS hh FROM events))
       |  WHERE h % $m = 0
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled,
       |  CAST(count(*) * $m AS BIGINT) AS est_count,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum_sampled,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * ${m}.0
       |    AS est_value_sum
       |FROM s GROUP BY event_type""".stripMargin
  }

  /** Mirror of Relational.evtRangeAgg: the same literal bucket table,
    * per-bucket predicate join, zero-filled left join back onto the
    * configured buckets.
    */
  val evtRangeAgg: String = {
    val vals = graft.operators.Relational.RangeBuckets.map { case (k, lo, hi) =>
      def d(o: Option[Double]) =
        o.map(_.toString).getOrElse("CAST(NULL AS DOUBLE)")
      s"('$k', ${d(lo)}, ${d(hi)})"
    }.mkString(", ")
    s"""WITH b(range_key, lo, hi) AS (VALUES $vals),
       |per AS (
       |  SELECT b.range_key, CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       |  FROM events e JOIN b
       |    ON (b.lo IS NULL OR e.value >= b.lo)
       |   AND (b.hi IS NULL OR e.value < b.hi)
       |  GROUP BY b.range_key
       |)
       |SELECT b.range_key, CAST(b.lo AS DOUBLE) AS lo, CAST(b.hi AS DOUBLE) AS hi,
       |  COALESCE(p.doc_count, 0) AS doc_count,
       |  COALESCE(p.value_sum, 0.0) AS value_sum
       |FROM b LEFT JOIN per p USING (range_key)""".stripMargin
  }

  /** Mirror of Relational.evtFiltersAgg: the same conditional
    * aggregates via FILTER clauses, unpivoted as a 3-way UNION ALL of
    * the one aggregate row.
    */
  val evtFiltersAgg: String =
    """WITH agg AS (
      |  SELECT
      |    CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS c_views,
      |    COALESCE(CAST(sum(CAST(value AS DECIMAL(18,2)))
      |      FILTER (event_type = 'view') AS DOUBLE), 0.0) AS s_views,
      |    CAST(count(*) FILTER (event_type = 'purchase' AND value > 100.0)
      |      AS BIGINT) AS c_big,
      |    COALESCE(CAST(sum(CAST(value AS DECIMAL(18,2)))
      |      FILTER (event_type = 'purchase' AND value > 100.0) AS DOUBLE), 0.0)
      |      AS s_big,
      |    CAST(count(*) FILTER (NOT (event_type = 'view')
      |      AND NOT (event_type = 'purchase' AND value > 100.0)) AS BIGINT)
      |      AS c_other,
      |    COALESCE(CAST(sum(CAST(value AS DECIMAL(18,2)))
      |      FILTER (NOT (event_type = 'view')
      |        AND NOT (event_type = 'purchase' AND value > 100.0)) AS DOUBLE), 0.0)
      |      AS s_other
      |  FROM events
      |)
      |SELECT 'views' AS filter_key, c_views AS doc_count, s_views AS value_sum FROM agg
      |UNION ALL
      |SELECT 'big_purchases', c_big, s_big FROM agg
      |UNION ALL
      |SELECT 'other', c_other, s_other FROM agg""".stripMargin

  /** Mirror of Relational.q66WeightedAvg: DECIMAL product and weight
    * sums, one edge division.
    */
  val q66: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS weight_sum,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wprice_sum,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS weighted_avg_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Mirror of Relational.evtVariableWidthHistogram: the same
    * integer-grid quantize → largest-gaps single-linkage cut →
    * per-bucket stats with the 2^20-grid centroid (one IEEE division
    * at the edge, identical formula text).
    */
  val evtVariableWidthHistogram: String = {
    val b = operators.Relational.VwBuckets
    val g = operators.Relational.VwCells
    val s = operators.Relational.VwScale
    s"""WITH e AS (SELECT value FROM events WHERE value IS NOT NULL),
       |mm AS (SELECT min(value) AS vmin, max(value) AS vmax FROM e),
       |cells AS (
       |  SELECT CASE WHEN vmax = vmin THEN 0
       |              ELSE least(${g - 1}, CAST(floor((value - vmin) / (vmax - vmin) * $g) AS BIGINT))
       |         END AS cell,
       |    count(*) AS cnt,
       |    CAST(sum(CAST(floor(value * $s) AS BIGINT)) AS BIGINT) AS gsum,
       |    min(value) AS cell_min, max(value) AS cell_max
       |  FROM e, mm GROUP BY 1
       |),
       |gaps AS (
       |  SELECT *, cell - lag(cell) OVER (ORDER BY cell) AS gap FROM cells
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY gap DESC NULLS LAST, cell ASC) AS grk
       |  FROM gaps
       |),
       |clustered AS (
       |  SELECT *, 1 + CAST(sum(CASE WHEN gap IS NOT NULL AND grk <= ${b - 1}
       |                            THEN 1 ELSE 0 END)
       |    OVER (ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS bucket
       |  FROM ranked
       |)
       |SELECT bucket, min(cell_min) AS min_value, max(cell_max) AS max_value,
       |  CAST(sum(gsum) AS DOUBLE) / (CAST($s AS DOUBLE) * CAST(sum(cnt) AS DOUBLE))
       |    AS centroid,
       |  CAST(sum(cnt) AS BIGINT) AS doc_count
       |FROM clustered GROUP BY bucket""".stripMargin
  }

  /** Mirror of Relational.evtValueHistogram: the same
    * floor(value/interval) bucket ids, range() dense frame off the
    * min/max ids, zero-filled left join, DECIMAL value sums, exact
    * integer·interval lower bounds.
    */
  val evtValueHistogram: String =
    """WITH ev AS (
      |  SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket_id, value
      |  FROM events
      |),
      |per AS (
      |  SELECT bucket_id, CAST(count(*) AS BIGINT) AS doc_count,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |  FROM ev GROUP BY bucket_id
      |),
      |bounds AS (SELECT min(bucket_id) AS b0, max(bucket_id) AS b1 FROM ev),
      |frame AS (
      |  SELECT unnest(range(b0, b1 + 1)) AS bucket_id
      |  FROM bounds WHERE b0 IS NOT NULL
      |)
      |SELECT f.bucket_id, CAST(f.bucket_id * 25 AS DOUBLE) AS bucket_lo,
      |  COALESCE(p.doc_count, 0) AS doc_count,
      |  COALESCE(p.value_sum, 0.0) AS value_sum
      |FROM frame f LEFT JOIN per p USING (bucket_id)""".stripMargin

  /** Mirror of Relational.q51PercentileRanks: conditional integer
    * counts, one IEEE division each.
    */
  val q51: String = {
    val cols = graft.operators.Relational.PrThresholds.map { t =>
      s"""CAST(count(*) FILTER (o_totalprice <= $t) AS DOUBLE) /
         |    CAST(count(*) AS DOUBLE) AS pr_${t / 1000}k""".stripMargin
    }.mkString(",\n  ")
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       |  $cols
       |FROM orders GROUP BY o_orderpriority""".stripMargin
  }

  /** Mirror of Relational.evtTransitions: the same (ts, event_id)-
    * ordered lag per user, integer counts, one IEEE division of exact
    * integers per row.
    */
  val evtTransitions: String =
    """WITH lagd AS (
      |  SELECT user_id, event_type, lag(event_type) OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
      |  FROM events
      |),
      |c AS (
      |  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
      |  FROM lagd WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
      |)
      |SELECT prev_type, next_type, n,
      |  CAST(n AS DOUBLE) /
      |    CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      |FROM c""".stripMargin

  /** Mirror of Relational.q59MatrixStats: identical centi-unit
    * integerization (DECIMAL(18,2)·100 → BIGINT), HUGEINT moments
    * (≡ Spark DECIMAL(38,0) — both exact), one fixed double expression
    * per output; the 6-pair matrix comes off the single moment row via
    * a VALUES cross join.
    */
  val q59MatrixStats: String =
    """WITH c AS (
      |  SELECT
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xq,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xp,
      |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS xd
      |  FROM lineitem
      |),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(xq AS HUGEINT)) AS s_q,
      |    sum(CAST(xp AS HUGEINT)) AS s_p,
      |    sum(CAST(xd AS HUGEINT)) AS s_d,
      |    sum(CAST(xq AS HUGEINT) * xq) AS s_qq,
      |    sum(CAST(xq AS HUGEINT) * xp) AS s_qp,
      |    sum(CAST(xq AS HUGEINT) * xd) AS s_qd,
      |    sum(CAST(xp AS HUGEINT) * xp) AS s_pp,
      |    sum(CAST(xp AS HUGEINT) * xd) AS s_pd,
      |    sum(CAST(xd AS HUGEINT) * xd) AS s_dd
      |  FROM c
      |),
      |pairs(field_x, field_y, k) AS (VALUES
      |  ('quantity', 'quantity', 's_qq'),
      |  ('quantity', 'extendedprice', 's_qp'),
      |  ('quantity', 'discount', 's_qd'),
      |  ('extendedprice', 'extendedprice', 's_pp'),
      |  ('extendedprice', 'discount', 's_pd'),
      |  ('discount', 'discount', 's_dd')
      |),
      |j AS (
      |  SELECT field_x, field_y, n,
      |    CASE field_x WHEN 'quantity' THEN s_q
      |                 WHEN 'extendedprice' THEN s_p ELSE s_d END AS sx,
      |    CASE field_y WHEN 'quantity' THEN s_q
      |                 WHEN 'extendedprice' THEN s_p ELSE s_d END AS sy,
      |    CASE field_x WHEN 'quantity' THEN s_qq
      |                 WHEN 'extendedprice' THEN s_pp ELSE s_dd END AS sxx,
      |    CASE field_y WHEN 'quantity' THEN s_qq
      |                 WHEN 'extendedprice' THEN s_pp ELSE s_dd END AS syy,
      |    CASE k WHEN 's_qq' THEN s_qq WHEN 's_qp' THEN s_qp
      |           WHEN 's_qd' THEN s_qd WHEN 's_pp' THEN s_pp
      |           WHEN 's_pd' THEN s_pd ELSE s_dd END AS sxy
      |  FROM pairs, m
      |)
      |SELECT field_x, field_y, n,
      |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_x,
      |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_y,
      |  CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0 AS cov_pop,
      |  CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
      |         * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)) AS corr
      |FROM j""".stripMargin

  /** Mirror of Relational.q60StringStats: same char explode
    * (string_split with '' delimiter ≡ Spark split on the empty
    * regex — both yield the character list, spaces included), same
    * integer-log2 entropy grid, one IEEE division per double.
    */
  val q60StringStats: String =
    """WITH d AS (
      |  SELECT lang, text FROM documents WHERE length(text) >= 1
      |),
      |lens AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(min(length(text)) AS BIGINT) AS min_len,
      |    CAST(max(length(text)) AS BIGINT) AS max_len,
      |    CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_len
      |  FROM d GROUP BY lang
      |),
      |cc AS (
      |  SELECT lang, ch, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT lang, unnest(string_split(text, '')) AS ch FROM d)
      |  GROUP BY lang, ch
      |),
      |ent AS (
      |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_chars,
      |    CAST(count(*) AS BIGINT) AS n_distinct_chars,
      |    CAST(sum(c * (length(bin(c)) - 1)) AS BIGINT) AS sum_clog
      |  FROM cc GROUP BY lang
      |)
      |SELECT lang, n_docs, min_len, max_len,
      |  CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_len,
      |  n_chars, n_distinct_chars,
      |  CAST(n_chars * (length(bin(n_chars)) - 1) - sum_clog AS DOUBLE)
      |    / CAST(n_chars AS DOUBLE) AS entropy_bits
      |FROM lens JOIN ent USING (lang)""".stripMargin

  /** Mirror of Relational.q61TTest: identical conditional HUGEINT
    * moments in one pass, sample variance as exact numerator over a
    * double n·(n−1), t and Welch df as the same fixed double
    * expressions.
    */
  val q61TTest: String =
    """WITH g AS (
      |  SELECT l_linestatus,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
      |    sum(CASE WHEN l_returnflag = 'R'
      |        THEN CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) END) AS s_r,
      |    sum(CASE WHEN l_returnflag = 'R'
      |        THEN CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
      |           * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS ss_r,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    sum(CASE WHEN l_returnflag = 'A'
      |        THEN CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) END) AS s_a,
      |    sum(CASE WHEN l_returnflag = 'A'
      |        THEN CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
      |           * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS ss_a
      |  FROM lineitem WHERE l_returnflag IN ('R', 'A')
      |  GROUP BY l_linestatus
      |),
      |e AS (
      |  SELECT l_linestatus, n_r, n_a,
      |    CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE) AS m_r,
      |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS m_a,
      |    CAST(CAST(n_r AS HUGEINT) * ss_r - s_r * s_r AS DOUBLE)
      |      / (CAST(n_r AS DOUBLE) * (CAST(n_r AS DOUBLE) - 1.0)) AS v_r,
      |    CAST(CAST(n_a AS HUGEINT) * ss_a - s_a * s_a AS DOUBLE)
      |      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) AS v_a
      |  FROM g
      |)
      |SELECT l_linestatus, n_r, n_a,
      |  m_r / 100.0 AS mean_r,
      |  m_a / 100.0 AS mean_a,
      |  (m_r - m_a) / sqrt(v_r / CAST(n_r AS DOUBLE) + v_a / CAST(n_a AS DOUBLE)) AS t_stat,
      |  ((v_r / CAST(n_r AS DOUBLE) + v_a / CAST(n_a AS DOUBLE))
      |   * (v_r / CAST(n_r AS DOUBLE) + v_a / CAST(n_a AS DOUBLE)))
      |  / ((v_r / CAST(n_r AS DOUBLE)) * (v_r / CAST(n_r AS DOUBLE)) / (CAST(n_r AS DOUBLE) - 1.0)
      |   + (v_a / CAST(n_a AS DOUBLE)) * (v_a / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) AS welch_df
      |FROM e""".stripMargin

  /** Mirror of Relational.evtChangePoint: same daily counters, same
    * exact HUGEINT split statistic with one IEEE division, same
    * (stat DESC, day ASC) argmax.
    */
  val evtChangePoint: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)
      |),
      |cum AS (
      |  SELECT event_type, day, n,
      |    CAST(row_number() OVER wo AS BIGINT) AS d,
      |    sum(n) OVER wo AS s,
      |    count(*) OVER wp AS dd,
      |    sum(n) OVER wp AS ss
      |  FROM daily
      |  WINDOW wo AS (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wp AS (PARTITION BY event_type)
      |),
      |scored AS (
      |  SELECT event_type, day, d, s, dd, ss,
      |    CAST(abs(CAST(dd - d AS HUGEINT) * s - CAST(d AS HUGEINT) * (ss - s)) AS DOUBLE)
      |      / (CAST(d AS DOUBLE) * CAST(dd - d AS DOUBLE)) AS stat
      |  FROM cum WHERE d < dd
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY event_type ORDER BY stat DESC, day ASC) AS rk
      |  FROM scored
      |)
      |SELECT event_type, day AS change_day,
      |  CAST(s AS DOUBLE) / CAST(d AS DOUBLE) AS mean_before,
      |  CAST(ss - s AS DOUBLE) / CAST(dd - d AS DOUBLE) AS mean_after,
      |  CAST(ss - s AS DOUBLE) / CAST(dd - d AS DOUBLE)
      |    - CAST(s AS DOUBLE) / CAST(d AS DOUBLE) AS shift,
      |  stat
      |FROM ranked WHERE rk = 1""".stripMargin

  /** Mirror of Relational.q63AdjacencyMatrix: one conditional-sum
    * scan, the same ES-style key labels, pairs as conjunction sums.
    */
  val q63AdjacencyMatrix: String = {
    val hv = graft.operators.Relational.AdjHighValue
    s"""WITH m AS (
       |  SELECT
       |    CAST(sum(CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END) AS BIGINT) AS c_ui,
       |    CAST(sum(CASE WHEN value > $hv THEN 1 ELSE 0 END) AS BIGINT) AS c_hv,
       |    CAST(sum(CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END) AS BIGINT) AS c_mo,
       |    CAST(sum(CASE WHEN event_type IN ('click','view') AND value > $hv THEN 1 ELSE 0 END) AS BIGINT) AS c_ui_hv,
       |    CAST(sum(CASE WHEN event_type IN ('click','view') AND hour(ts) < 12 THEN 1 ELSE 0 END) AS BIGINT) AS c_ui_mo,
       |    CAST(sum(CASE WHEN value > $hv AND hour(ts) < 12 THEN 1 ELSE 0 END) AS BIGINT) AS c_hv_mo
       |  FROM events
       |),
       |k(key, c) AS (VALUES
       |  ('ui', 'c_ui'), ('high_value', 'c_hv'), ('morning', 'c_mo'),
       |  ('high_value&ui', 'c_ui_hv'), ('morning&ui', 'c_ui_mo'),
       |  ('high_value&morning', 'c_hv_mo')
       |)
       |SELECT key,
       |  CASE c WHEN 'c_ui' THEN c_ui WHEN 'c_hv' THEN c_hv
       |         WHEN 'c_mo' THEN c_mo WHEN 'c_ui_hv' THEN c_ui_hv
       |         WHEN 'c_ui_mo' THEN c_ui_mo ELSE c_hv_mo END AS doc_count
       |FROM k, m
       |WHERE CASE c WHEN 'c_ui' THEN c_ui WHEN 'c_hv' THEN c_hv
       |             WHEN 'c_mo' THEN c_mo WHEN 'c_ui_hv' THEN c_ui_hv
       |             WHEN 'c_ui_mo' THEN c_ui_mo ELSE c_hv_mo END > 0""".stripMargin
  }

  /** Mirror of Relational.evtDownsample: identical integer epoch-floor
    * bucketing, DECIMAL value sums, one IEEE division for the avg.
    */
  val evtDownsample: String = {
    val w = graft.operators.Relational.DownsampleSeconds
    s"""SELECT event_type,
       |  (CAST(floor(epoch(ts)) AS BIGINT) // $w) * $w AS bucket_epoch,
       |  CAST(count(*) AS BIGINT) AS n,
       |  min(value) AS v_min,
       |  max(value) AS v_max,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS v_avg
       |FROM events
       |GROUP BY event_type, (CAST(floor(epoch(ts)) AS BIGINT) // $w) * $w""".stripMargin
  }

  /** Mirror of Relational.q64AutoDateHistogram: identical integer
    * ladder election over the 1-row span, identical epoch-floor bucket
    * identity, DECIMAL value sums.
    */
  val q64: String = {
    val lad = graft.operators.Relational.AutoHistLadder
    val target = graft.operators.Relational.AutoHistTarget
    s"""WITH ev AS (
       |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e, value FROM events
       |),
       |span AS (SELECT min(e) AS e0, max(e) AS e1 FROM ev),
       |lad AS (SELECT unnest([${lad.mkString(", ")}]) AS ival),
       |pick AS (
       |  SELECT COALESCE(min(ival), ${lad.max}) AS interval_sec
       |  FROM lad, span
       |  WHERE (e1 // ival) - (e0 // ival) + 1 <= $target
       |)
       |SELECT p.interval_sec,
       |  (e // p.interval_sec) * p.interval_sec AS bucket_start,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       |FROM ev, pick p
       |GROUP BY 1, 2""".stripMargin
  }

  /** Mirror of Relational.q65DiversifiedSampler: identical md5-device
    * score order, nested (shard, user) / shard row_number cutoffs,
    * terms agg over the merged sample.
    */
  val q65: String = {
    val s = graft.operators.Relational.SamplerShards
    val sz = graft.operators.Relational.SamplerShardSize
    val mk = graft.operators.Relational.SamplerMaxPerKey
    s"""WITH ev AS (
       |  SELECT event_id, user_id, event_type,
       |    event_id % $s AS shard,
       |    ${OracleText.rotLong("md5(CAST(event_id AS VARCHAR))", 0)} AS h
       |  FROM events
       |),
       |k AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY shard, user_id ORDER BY h, event_id) AS rk
       |  FROM ev
       |),
       |smp AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY shard ORDER BY h, event_id) AS rs
       |  FROM k WHERE rk <= $mk
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS doc_count,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |FROM smp WHERE rs <= $sz
       |GROUP BY event_type""".stripMargin
  }

  /** Mirror of Relational.evtInterpolate: identical dense hourly frame,
    * IGNORE NULLS neighbor windows, and the integer-cents lerp with one
    * terminal IEEE division.
    */
  val evtInterpolate: String = {
    val w = graft.operators.Relational.InterpSeconds
    s"""WITH ev AS (
       |  SELECT event_type,
       |    (CAST(floor(epoch(ts)) AS BIGINT) // $w) * $w AS b, value
       |  FROM events
       |),
       |hourly AS (
       |  SELECT event_type, b, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM ev GROUP BY event_type, b
       |),
       |span AS (SELECT min(b) AS b0, max(b) AS b1 FROM ev),
       |buckets AS (
       |  SELECT CAST(unnest(generate_series(b0, b1, $w)) AS BIGINT) AS b
       |  FROM span
       |),
       |types AS (SELECT DISTINCT event_type FROM ev),
       |frame AS (
       |  SELECT t.event_type, bk.b, h.n, h.cents
       |  FROM buckets bk CROSS JOIN types t
       |  LEFT JOIN hourly h ON h.event_type = t.event_type AND h.b = bk.b
       |),
       |fb AS (
       |  SELECT event_type, b, n, cents,
       |    last_value(cents IGNORE NULLS) OVER up AS pc,
       |    last_value(CASE WHEN cents IS NOT NULL THEN b END IGNORE NULLS)
       |      OVER up AS pb,
       |    first_value(cents IGNORE NULLS) OVER dn AS nc,
       |    first_value(CASE WHEN cents IS NOT NULL THEN b END IGNORE NULLS)
       |      OVER dn AS nb
       |  FROM frame
       |  WINDOW up AS (PARTITION BY event_type ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    dn AS (PARTITION BY event_type ORDER BY b
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |)
       |SELECT event_type, b AS bucket_epoch,
       |  COALESCE(n, 0) AS n,
       |  CAST(COALESCE(pc, nc) AS DOUBLE) / 100.0 AS v_locf,
       |  CASE
       |    WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) / 100.0
       |    WHEN pc IS NOT NULL AND nc IS NOT NULL THEN
       |      CAST(pc * (nb - b) + nc * (b - pb) AS DOUBLE)
       |        / CAST((nb - pb) * 100 AS DOUBLE)
       |    ELSE CAST(COALESCE(pc, nc) AS DOUBLE) / 100.0
       |  END AS v_interp
       |FROM fb""".stripMargin
  }

  /** Mirror of Relational.evtEwma: same explode-onto-target-days window,
    * day-ordered cents list, dyadic-weight integer fold, one edge
    * division.
    */
  val evtEwma: String = {
    val w = graft.operators.Relational.EwmaWindow
    val weights = (Seq(1L) ++ (1 until w).map(k => 1L << (k - 1)))
      .mkString("[", ",", "]")
    val denoms = (1 to w).map(n => 1L << (n - 1)).mkString("[", ",", "]")
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM events GROUP BY CAST(ts AS DATE)
       |),
       |contrib AS (
       |  SELECT CAST(unnest(generate_series(day, day + INTERVAL ${w - 1} DAY,
       |    INTERVAL 1 DAY)) AS DATE) AS tday, day, cents
       |  FROM daily
       |),
       |win AS (
       |  SELECT c.tday, CAST(count(*) AS BIGINT) AS n_window,
       |    list(c.cents ORDER BY c.day) AS vs
       |  FROM contrib c JOIN (SELECT day AS tday FROM daily) d USING (tday)
       |  GROUP BY c.tday
       |)
       |SELECT tday AS day, n_window,
       |  CAST(list_reduce(list_transform(range(1, CAST(n_window + 1 AS INT)),
       |      j -> vs[CAST(j AS INT)] * ($weights)[CAST(j AS INT)]),
       |    (x, y) -> x + y) AS DOUBLE)
       |  / CAST(($denoms)[CAST(n_window AS INT)] * 100 AS DOUBLE) AS ewma
       |FROM win""".stripMargin
  }

  /** Mirror of Relational.q67Boxplot: integer-cents quantization, exact
    * quartile interpolation, identical fence arithmetic op order.
    */
  val q67: String =
    """WITH o AS (
      |  SELECT o_orderpriority,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |),
      |quart AS (
      |  SELECT o_orderpriority,
      |    quantile_cont(cents, 0.25) AS q1c,
      |    quantile_cont(cents, 0.5) AS q2c,
      |    quantile_cont(cents, 0.75) AS q3c,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM o GROUP BY o_orderpriority
      |),
      |fences AS (
      |  SELECT *, q1c - 1.5 * (q3c - q1c) AS lo_fence,
      |            q3c + 1.5 * (q3c - q1c) AS hi_fence
      |  FROM quart
      |)
      |SELECT o.o_orderpriority, min(f.n) AS n,
      |  CAST(min(o.cents) AS DOUBLE) / 100.0 AS min_price,
      |  min(f.q1c) / 100.0 AS q1,
      |  min(f.q2c) / 100.0 AS median,
      |  min(f.q3c) / 100.0 AS q3,
      |  CAST(max(o.cents) AS DOUBLE) / 100.0 AS max_price,
      |  CAST(min(CASE WHEN o.cents >= f.lo_fence THEN o.cents END) AS DOUBLE)
      |    / 100.0 AS lower_whisker,
      |  CAST(max(CASE WHEN o.cents <= f.hi_fence THEN o.cents END) AS DOUBLE)
      |    / 100.0 AS upper_whisker
      |FROM o JOIN fences f USING (o_orderpriority)
      |GROUP BY o.o_orderpriority""".stripMargin

  /** Mirror of Relational.q68MultiTerms. */
  val q68: String =
    s"""SELECT c_mktsegment, o_orderpriority,
       |  CAST(count(*) AS BIGINT) AS doc_count,
       |  ${dsum("o_totalprice")} AS price_sum
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment, o_orderpriority
       |ORDER BY doc_count DESC, c_mktsegment ASC, o_orderpriority ASC
       |LIMIT 10""".stripMargin

  /** Mirror of Relational.q69TopMetrics. */
  val q69: String =
    """SELECT event_type, ts AS latest_ts, event_id, user_id,
      |  value AS top_value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** Mirror of Relational.q75TopHits (both engines default DESC
    * ordering to NULLS LAST, and the integer tiebreak pins ties). */
  val q75: String = {
    val k = graft.operators.Relational.TopHitsK
    s"""WITH hits AS (
       |  SELECT event_type, event_id, user_id, ts, value,
       |    CAST(row_number() OVER (PARTITION BY event_type
       |      ORDER BY value DESC, event_id ASC) AS BIGINT) AS hit_rank
       |  FROM events
       |),
       |cnt AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS doc_count
       |  FROM events GROUP BY 1
       |)
       |SELECT h.event_type, c.doc_count, h.hit_rank, h.event_id,
       |  h.user_id, h.ts, h.value
       |FROM hits h JOIN cnt c USING (event_type)
       |WHERE h.hit_rank <= $k""".stripMargin
  }

  /** Mirror of Relational.q70FrequentPairs: identical basket
    * construction, exact integer lift numerator/denominator, one
    * division.
    */
  val q70: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, p_brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |),
      |pairs AS (
      |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
      |    CAST(count(*) AS BIGINT) AS pair_support
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      |  GROUP BY 1, 2
      |),
      |sup AS (
      |  SELECT p_brand, CAST(count(*) AS BIGINT) AS s
      |  FROM items GROUP BY p_brand
      |),
      |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
      |       FROM items)
      |SELECT brand_a, brand_b, pair_support,
      |  sa.s AS support_a, sb.s AS support_b, nb.n_baskets,
      |  CAST(pair_support * nb.n_baskets AS DOUBLE)
      |    / CAST(sa.s * sb.s AS DOUBLE) AS lift
      |FROM pairs
      |JOIN sup sa ON sa.p_brand = brand_a
      |JOIN sup sb ON sb.p_brand = brand_b
      |CROSS JOIN nb
      |ORDER BY pair_support DESC, brand_a ASC, brand_b ASC
      |LIMIT 25""".stripMargin

  /** Mirror of Relational.q76FrequentTriples: the same support-ordered
    * chained enumeration (each set built once, rarest item leading),
    * lossless item prune, canonical sorted itemset key, one division.
    */
  val q76: String = {
    val m = operators.Relational.FtMinSupport
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey, p_brand
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |),
       |sup AS (
       |  SELECT p_brand, CAST(count(*) AS BIGINT) AS s
       |  FROM items GROUP BY p_brand
       |  HAVING count(*) >= $m
       |),
       |oi AS (
       |  SELECT i.l_orderkey, i.p_brand, s.s FROM items i JOIN sup s USING (p_brand)
       |),
       |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
       |       FROM items),
       |t AS (
       |  SELECT a.p_brand AS ba, b.p_brand AS bb, c.p_brand AS bc
       |  FROM oi a
       |  JOIN oi b ON a.l_orderkey = b.l_orderkey
       |    AND (a.s < b.s OR (a.s = b.s AND a.p_brand < b.p_brand))
       |  JOIN oi c ON b.l_orderkey = c.l_orderkey
       |    AND (b.s < c.s OR (b.s = c.s AND b.p_brand < c.p_brand))
       |),
       |g AS (
       |  SELECT array_to_string(list_sort([ba, bb, bc]), '|') AS items,
       |    CAST(count(*) AS BIGINT) AS support
       |  FROM t GROUP BY 1
       |)
       |SELECT items, support, n_baskets,
       |  CAST(support AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support_ratio
       |FROM g, nb WHERE support >= $m
       |ORDER BY support DESC, items ASC
       |LIMIT ${operators.Relational.FpTopK}""".stripMargin
  }

  /** Mirror of Relational.q71NestedAgg: children pre-aggregated per
    * parent key, 1:1 left join, plain sums.
    */
  val q71: String =
    """WITH kids AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS kc,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS kp
      |  FROM lineitem WHERE l_quantity > 25
      |  GROUP BY l_orderkey
      |)
      |SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS parent_count,
      |  CAST(sum(COALESCE(kc, 0)) AS BIGINT) AS child_count,
      |  CAST(COALESCE(SUM(kp), 0) AS DOUBLE) AS child_price_sum,
      |  CAST(sum(CASE WHEN kc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS parents_with_match
      |FROM orders LEFT JOIN kids ON o_orderkey = l_orderkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority""".stripMargin

  /** Mirror of Relational.q72RateAgg. */
  val q72: String =
    """SELECT event_type,
      |  CAST(date_trunc('month', ts) AS DATE) AS month_start,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
      |  CAST(day(last_day(CAST(date_trunc('month', ts) AS DATE))) AS BIGINT)
      |    AS days_in_month,
      |  CAST(count(*) AS DOUBLE)
      |    / CAST(day(last_day(CAST(date_trunc('month', ts) AS DATE))) AS DOUBLE)
      |    AS rate_per_day,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |    / CAST(day(last_day(CAST(date_trunc('month', ts) AS DATE))) AS DOUBLE)
      |    AS value_per_day
      |FROM events
      |GROUP BY event_type, CAST(date_trunc('month', ts) AS DATE)""".stripMargin

  /** Mirror of Relational.q73BucketSort. */
  val q73: String = {
    val from = graft.operators.Relational.BsFrom
    val size = graft.operators.Relational.BsSize
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS doc_count,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |  FROM events GROUP BY CAST(ts AS DATE)
      |),
      |r AS (
      |  SELECT *, CAST(row_number() OVER (
      |    ORDER BY value_sum DESC, day ASC) AS BIGINT) AS bucket_rank
      |  FROM daily
      |)
      |SELECT day, doc_count, value_sum, bucket_rank
      |FROM r
      |""".stripMargin +
      s"WHERE bucket_rank > $from AND bucket_rank <= ${from + size}"
  }

  /** Mirror of Relational.evtIpRange: identical md5-derived integer
    * address, integer range membership, integer-div dotted quads
    * (OracleText.rotLong is the shared hex fold).
    */
  val evtIpRange: String = {
    val edges = graft.operators.Relational.IpRangeEdges
    val bounds = (Seq(0L) ++ edges) :+ 4294967296L
    val values = bounds.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      s"($i, CAST($lo AS BIGINT), CAST($hi AS BIGINT))"
    }.mkString(", ")
    def quad(c: String): String =
      s"""CAST($c // 16777216 AS VARCHAR) || '.' ||
         |  CAST(($c // 65536) % 256 AS VARCHAR) || '.' ||
         |  CAST(($c // 256) % 256 AS VARCHAR) || '.' ||
         |  CAST($c % 256 AS VARCHAR)""".stripMargin
    s"""WITH frame(range_id, ip_from, ip_to) AS (VALUES $values),
       |ips AS (
       |  SELECT ${OracleText.rotLong("md5(CAST(event_id AS VARCHAR))", 0)}
       |    % 4294967296 AS ip, value
       |  FROM events
       |),
       |per AS (
       |  SELECT f.range_id,
       |    CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(sum(CAST(i.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       |  FROM ips i JOIN frame f ON i.ip >= f.ip_from AND i.ip < f.ip_to
       |  GROUP BY f.range_id
       |)
       |SELECT CAST(f.range_id AS BIGINT) AS range_id,
       |  ${quad("f.ip_from")} AS from_addr,
       |  ${quad("(f.ip_to - 1)")} AS to_addr,
       |  COALESCE(per.doc_count, 0) AS doc_count,
       |  COALESCE(per.value_sum, 0.0) AS value_sum
       |FROM frame f LEFT JOIN per ON per.range_id = f.range_id""".stripMargin
  }

  /** Mirror of Relational.evtIpPrefix. */
  val evtIpPrefix: String =
    s"""WITH nets AS (
       |  SELECT (${OracleText.rotLong("md5(CAST(event_id AS VARCHAR))", 0)}
       |    % 4294967296) // 16777216 AS net, value
       |  FROM events
       |)
       |SELECT CAST(net AS VARCHAR) || '.0.0.0/8' AS prefix, net,
       |  CAST(count(*) AS BIGINT) AS doc_count,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       |FROM nets
       |GROUP BY net
       |ORDER BY doc_count DESC, net ASC
       |LIMIT ${graft.operators.Relational.IpPrefixTopK}""".stripMargin

  /** Mirror of Relational.q74TermsPartition: the hash-shard filter on
    * the grouping key, then the standard terms ordering.
    */
  val q74: String = {
    val np = graft.operators.Relational.TpNumPartitions
    val p = graft.operators.Relational.TpPartition
    s"""SELECT term, CAST(count(*) AS BIGINT) AS doc_count
       |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
       |WHERE ${OracleText.rotLong("md5(term)", 0)} % $np = $p
       |GROUP BY term
       |ORDER BY doc_count DESC, term ASC""".stripMargin
  }

  /** Mirror of Relational.evtBucketScript. */
  val evtBucketScript: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS purchases,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS views,
      |  COALESCE(CAST(sum(CASE WHEN event_type = 'purchase'
      |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
      |    AS purchase_value,
      |  CASE WHEN sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0
      |    THEN CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |           AS DOUBLE)
      |       / CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |           AS DOUBLE)
      |  END AS conversion
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Mirror of Relational.evtAnomalyDow (isodow − 1 ≡ Spark weekday).
    * ss and the flag arms use HUGEINT (≡ the Spark side's widened
    * DECIMAL(38,0)), the same device as [[evtAnomaly]] — a
    * DECIMAL(19,0) ss would overflow before Spark's at n ≳ 3e9. */
  val evtAnomalyDow: String = {
    val z2 = graft.operators.Relational.AnomalyZ * graft.operators.Relational.AnomalyZ
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS dow
       |  FROM events GROUP BY event_type, CAST(ts AS DATE)
       |),
       |m AS (
       |  SELECT event_type, day, dow, n,
       |    CAST(count(*) OVER w AS BIGINT) AS d,
       |    CAST(sum(n) OVER w AS BIGINT) AS s,
       |    sum(CAST(n AS HUGEINT) * n) OVER w AS ss
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type, dow)
       |)
       |SELECT event_type, day, dow, n,
       |  CAST(s AS DOUBLE) / CAST(d AS DOUBLE) AS mean_dow,
       |  CAST(d * n - s AS HUGEINT) * (d * n - s)
       |    > $z2 * (CAST(d AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
       |    AS is_anomaly
       |FROM m""".stripMargin
  }

  /** Mirror of Relational.evtCumulativeCardinality. */
  val evtCumulativeCardinality: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS doc_count
      |  FROM events GROUP BY 1
      |),
      |nu AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS new_users
      |  FROM (SELECT user_id, min(CAST(ts AS DATE)) AS day
      |        FROM events GROUP BY user_id)
      |  GROUP BY day
      |)
      |SELECT d.day, d.doc_count,
      |  COALESCE(nu.new_users, 0) AS new_users,
      |  CAST(sum(COALESCE(nu.new_users, 0)) OVER (ORDER BY d.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cumulative_users
      |FROM daily d LEFT JOIN nu ON nu.day = d.day""".stripMargin

  /** Mirror of Relational.evtCategorize ('g' flag: DuckDB's
    * regexp_replace is first-match-only by default, Spark's replaces
    * all).
    */
  val evtCategorize: String =
    """SELECT regexp_replace(event_type || ' ' || props, '[0-9]+', '#', 'g')
      |    AS template,
      |  CAST(count(*) AS BIGINT) AS doc_count,
      |  min(event_id) AS example_event,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM events
      |GROUP BY 1
      |ORDER BY doc_count DESC, template ASC""".stripMargin
}
