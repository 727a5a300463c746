package graft

/** DuckDB oracle SQL for the asset pipelines in
  * [[graft.operators.Assets]]. Each string must be semantically identical
  * to the Spark pipeline AND produce identical column names — the
  * driver's compare sorts columns by name before hashing.
  */
object OracleAssets {

  /** SQL mirror of [[graft.sources.Tables.signalsFrom]] — must stay in
    * exact lockstep with the Spark projection. `src` is the events-shaped
    * relation (a table name or a parenthesized union for multi-path
    * sources).
    */
  def signalsCteFrom(src: String): String =
    s"""ev AS (
      |  SELECT event_id, ts, user_id, event_type, value,
      |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
      |  FROM $src
      |),
      |signals AS (
      |  SELECT event_id, ts, user_id, event_type, value, k,
      |    'svc-' || CAST(user_id % 20 AS VARCHAR) AS service_name,
      |    CASE WHEN user_id % 2 = 0 THEN 'prod' ELSE 'dev' END AS service_environment,
      |    CASE WHEN k % 3 = 0 THEN 'c-' || CAST(k % 7 AS VARCHAR) END AS container_id,
      |    CASE WHEN k % 2 = 1 THEN 'p-' || CAST(k % 5 AS VARCHAR) END AS kubernetes_pod_uid,
      |    CASE WHEN k % 4 = 0 THEN 'h-' || CAST(k % 6 AS VARCHAR) END AS host_name,
      |    CASE WHEN k % 9 <> 8 THEN 'hh-' || CAST(k % 9 AS VARCHAR) END AS host_hostname,
      |    CASE WHEN k % 5 <> 2 THEN 'n-' || CAST(k % 4 AS VARCHAR) END AS kubernetes_node_name,
      |    CASE WHEN k % 5 = 0 THEN 'aws' END AS cloud_provider,
      |    CASE WHEN k % 7 = 0 THEN 'cl-' || CAST(k % 2 AS VARCHAR) END AS orchestrator_cluster_name,
      |    CASE WHEN k % 11 = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE ['t-' || CAST(k % 3 AS VARCHAR), 't-' || CAST(k % 5 AS VARCHAR)]
      |         END AS service_tags,
      |    CASE WHEN k % 13 = 0 THEN NULL
      |         WHEN k % 6 = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE list_slice(['a-' || CAST(k % 4 AS VARCHAR),
      |                          'a-' || CAST(k % 5 AS VARCHAR),
      |                          'a-' || CAST(k % 6 AS VARCHAR)],
      |                         1, CAST(1 + k % 3 AS INT))
      |         END AS host_aliases
      |  FROM ev
      |),
      |mx AS (SELECT max(ts) AS m FROM signals)""".stripMargin

  val signalsCte: String = signalsCteFrom("events")

  val parentTypeCase: String =
    """CASE WHEN container_id IS NOT NULL THEN 'container'
      |     WHEN kubernetes_pod_uid IS NOT NULL THEN 'k8s.pod'
      |     WHEN host_name IS NOT NULL THEN 'host.name'
      |     WHEN host_hostname IS NOT NULL THEN 'host.hostname'
      |     ELSE 'unknown' END""".stripMargin

  val parentIdExpr: String =
    "COALESCE(container_id, kubernetes_pod_uid, host_name, host_hostname, '')"

  val batchTs: String = s"TIMESTAMP '${operators.Assets.BatchTs}'"

  val svcLatest: String =
    s"""WITH $signalsCte
       |SELECT service_name, service_environment, max(ts) AS latest_ts
       |FROM signals, mx
       |WHERE event_type = 'purchase' AND ts >= m - INTERVAL 7 DAY
       |GROUP BY service_name, service_environment""".stripMargin

  val svcSummaries: String =
    s"""WITH $signalsCte,
       |p1 AS (
       |  SELECT DISTINCT service_name FROM signals, mx
       |  WHERE event_type = 'purchase' AND ts >= m - INTERVAL 7 DAY
       |)
       |SELECT s.event_id, s.ts,
       |  'service:' || s.service_name AS asset_ean,
       |  'service' AS asset_type,
       |  s.service_name AS asset_id,
       |  s.service_name AS asset_name,
       |  s.service_environment,
       |  $parentTypeCase AS parent_type,
       |  $parentIdExpr AS parent_id,
       |  ($parentTypeCase) || ':' || $parentIdExpr AS parent_ean
       |FROM signals s, mx
       |WHERE s.ts >= m - INTERVAL 14 DAY
       |  AND (container_id IS NOT NULL OR kubernetes_pod_uid IS NOT NULL
       |       OR host_name IS NOT NULL OR host_hostname IS NOT NULL)
       |  AND s.service_name IN (SELECT service_name FROM p1)""".stripMargin

  /** Collapsed (top-1 per service, newest-first) signal rows — with
    * the body's binding `should`+`minimum_should_match:1` parent-
    * candidate disjunction (lib/collectServices.ts:56-78).
    */
  private def collapsedServicesCteNamed(base: String, c: String, days: Int = 21): String =
    s"""$base AS (
       |  SELECT s.* FROM signals s, mx
       |  WHERE s.ts >= m - INTERVAL $days DAY AND s.service_name IS NOT NULL
       |    AND (container_id IS NOT NULL OR kubernetes_pod_uid IS NOT NULL
       |         OR host_name IS NOT NULL OR host_hostname IS NOT NULL)
       |),
       |$c AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY service_name ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM $base
       |)""".stripMargin

  private val collapsedServicesCte: String = collapsedServicesCteNamed("base", "c")

  val svcCollapse: String =
    s"""WITH $signalsCte, $collapsedServicesCte
       |SELECT $batchTs AS asset_ts,
       |  'service:' || service_name AS asset_ean,
       |  'service' AS asset_type,
       |  service_name AS asset_id,
       |  service_name AS asset_name,
       |  service_environment, cloud_provider, orchestrator_cluster_name,
       |  CASE WHEN container_id IS NOT NULL
       |       THEN 'container:' || container_id END AS asset_parents
       |FROM c WHERE rn = 1""".stripMargin

  val containerGraph: String =
    s"""WITH $signalsCte, $collapsedServicesCte
       |SELECT $batchTs AS asset_ts,
       |  'container:' || container_id AS asset_ean,
       |  'container' AS asset_type,
       |  container_id AS asset_id,
       |  array_to_string(list_slice(list_sort(array_agg(DISTINCT 'service:' || service_name)), 1, ${operators.Assets.MaxEdges}), '|')
       |    AS asset_children,
       |  -- DuckDB array_to_string(NULL or []) is NULL; Spark concat_ws of an
       |  -- empty set is '' — outer COALESCE aligns the empty-edge-set case.
       |  COALESCE(array_to_string(list_slice(list_sort(array_agg(DISTINCT 'k8s.pod:' || kubernetes_pod_uid)
       |             FILTER (WHERE kubernetes_pod_uid IS NOT NULL)), 1, ${operators.Assets.MaxEdges}), '|'), '')
       |    AS asset_references
       |FROM c WHERE rn = 1 AND container_id IS NOT NULL
       |GROUP BY container_id""".stripMargin

  private def collapsedPodsCteNamed(base: String, c: String): String =
    s"""$base AS (
       |  SELECT s.* FROM signals s, mx
       |  WHERE s.ts >= m - INTERVAL 21 DAY
       |    AND s.kubernetes_pod_uid IS NOT NULL
       |    AND s.kubernetes_node_name IS NOT NULL
       |),
       |$c AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY kubernetes_pod_uid ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM $base
       |)""".stripMargin

  private val collapsedPodsCte: String = collapsedPodsCteNamed("base", "c")

  val podsCollapse: String =
    s"""WITH $signalsCte, $collapsedPodsCte
       |SELECT $batchTs AS asset_ts,
       |  'k8s.pod:' || kubernetes_pod_uid AS asset_ean,
       |  'k8s.pod' AS asset_type,
       |  kubernetes_pod_uid AS asset_id,
       |  'k8s.node:' || kubernetes_node_name AS asset_parents,
       |  CASE WHEN orchestrator_cluster_name IS NOT NULL
       |       THEN 'k8s.cluster:' || orchestrator_cluster_name END AS asset_references,
       |  cloud_provider
       |FROM c WHERE rn = 1""".stripMargin

  val nodeGraph: String =
    s"""WITH $signalsCte, $collapsedPodsCte
       |SELECT $batchTs AS asset_ts,
       |  'k8s.node:' || kubernetes_node_name AS asset_ean,
       |  'k8s.node' AS asset_type,
       |  kubernetes_node_name AS asset_id,
       |  array_to_string(list_slice(list_sort(array_agg(DISTINCT 'k8s.pod:' || kubernetes_pod_uid)), 1, ${operators.Assets.MaxEdges}), '|')
       |    AS asset_children,
       |  COALESCE(array_to_string(list_slice(list_sort(array_agg(DISTINCT 'k8s.cluster:' || orchestrator_cluster_name)
       |             FILTER (WHERE orchestrator_cluster_name IS NOT NULL)), 1, ${operators.Assets.MaxEdges}), '|'), '')
       |    AS asset_references
       |FROM c WHERE rn = 1
       |GROUP BY kubernetes_node_name""".stripMargin

  /** pods over the doubled multi-path source union (SourceRegistry
    * `signals_all`): identical rows collapse, so output equals
    * podsCollapse — that idempotence IS the semantic under test.
    */
  val podsMultiSource: String =
    s"""WITH ${signalsCteFrom("(SELECT * FROM events UNION ALL SELECT * FROM events)")},
       |$collapsedPodsCte
       |SELECT $batchTs AS asset_ts,
       |  'k8s.pod:' || kubernetes_pod_uid AS asset_ean,
       |  'k8s.pod' AS asset_type,
       |  kubernetes_pod_uid AS asset_id,
       |  'k8s.node:' || kubernetes_node_name AS asset_parents,
       |  CASE WHEN orchestrator_cluster_name IS NOT NULL
       |       THEN 'k8s.cluster:' || orchestrator_cluster_name END AS asset_references,
       |  cloud_provider
       |FROM c WHERE rn = 1""".stripMargin

  /** Multi-valued field unwrap (P3): list index 1 ≡ Spark
    * try_element_at (both null on empty).
    */
  val svcMultivalued: String =
    s"""WITH $signalsCte
       |SELECT event_id,
       |  'service:' || service_name AS asset_ean,
       |  service_tags[1] AS primary_tag,
       |  CAST(len(service_tags) AS BIGINT) AS n_tags
       |FROM signals""".stripMargin

  /** Mirror of Assets.hostFamily: the `host.*` wildcard family read,
    * with the multi-valued member serialized at the output boundary
    * (NULL stays NULL; empty list is '' — Spark concat_ws semantics).
    */
  val hostFamily: String =
    s"""WITH $signalsCte
       |SELECT event_id, host_name, host_hostname,
       |  CASE WHEN host_aliases IS NULL THEN NULL
       |       ELSE COALESCE(array_to_string(host_aliases, '|'), '')
       |       END AS host_aliases
       |FROM signals""".stripMargin

  /** Second multi-valued family unwrap (P3): absent-field (NULL) vs
    * empty-array vs variable-length semantics over host_aliases —
    * list[1] and len are NULL-propagating on both engines.
    */
  val hostMultivalued: String =
    s"""WITH $signalsCte
       |SELECT event_id,
       |  CASE WHEN host_name IS NOT NULL THEN 'host:' || host_name END AS asset_ean,
       |  host_aliases[1] AS primary_alias,
       |  CAST(len(host_aliases) AS BIGINT) AS n_aliases,
       |  CASE WHEN host_aliases IS NULL THEN NULL
       |       ELSE COALESCE(array_to_string(list_sort(list_distinct(host_aliases)), '|'), '')
       |       END AS aliases_norm
       |FROM signals""".stripMargin

  /** All four asset pipelines conformed to the fixed output schema
    * (AssetSchema.schema order), unioned — mirror of Assets.assetsAll.
    */
  val assetsAll: String = {
    val cols =
      """asset_ts, asset_ean, asset_type, asset_id, asset_name,
        |  asset_parents, asset_children, asset_references,
        |  service_environment, cloud_provider, orchestrator_cluster_name""".stripMargin
    s"""WITH $signalsCte,
       |${collapsedServicesCteNamed("sbase", "sc")},
       |${collapsedPodsCteNamed("pbase", "pc")}
       |SELECT $cols FROM (
       |  SELECT $batchTs AS asset_ts,
       |    'service:' || service_name AS asset_ean,
       |    'service' AS asset_type,
       |    service_name AS asset_id,
       |    service_name AS asset_name,
       |    CASE WHEN container_id IS NOT NULL
       |         THEN 'container:' || container_id END AS asset_parents,
       |    CAST(NULL AS VARCHAR) AS asset_children,
       |    CAST(NULL AS VARCHAR) AS asset_references,
       |    service_environment, cloud_provider, orchestrator_cluster_name
       |  FROM sc WHERE rn = 1
       |  UNION ALL
       |  SELECT $batchTs,
       |    'container:' || container_id,
       |    'container',
       |    container_id,
       |    CAST(NULL AS VARCHAR),
       |    CAST(NULL AS VARCHAR),
       |    array_to_string(list_slice(list_sort(array_agg(DISTINCT 'service:' || service_name)), 1, ${operators.Assets.MaxEdges}), '|'),
       |    COALESCE(array_to_string(list_slice(list_sort(array_agg(DISTINCT 'k8s.pod:' || kubernetes_pod_uid)
       |               FILTER (WHERE kubernetes_pod_uid IS NOT NULL)), 1, ${operators.Assets.MaxEdges}), '|'), ''),
       |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
       |  FROM sc WHERE rn = 1 AND container_id IS NOT NULL
       |  GROUP BY container_id
       |  UNION ALL
       |  SELECT $batchTs,
       |    'k8s.pod:' || kubernetes_pod_uid,
       |    'k8s.pod',
       |    kubernetes_pod_uid,
       |    CAST(NULL AS VARCHAR),
       |    'k8s.node:' || kubernetes_node_name,
       |    CAST(NULL AS VARCHAR),
       |    CASE WHEN orchestrator_cluster_name IS NOT NULL
       |         THEN 'k8s.cluster:' || orchestrator_cluster_name END,
       |    CAST(NULL AS VARCHAR), cloud_provider, CAST(NULL AS VARCHAR)
       |  FROM pc WHERE rn = 1
       |  UNION ALL
       |  SELECT $batchTs,
       |    'k8s.node:' || kubernetes_node_name,
       |    'k8s.node',
       |    kubernetes_node_name,
       |    CAST(NULL AS VARCHAR),
       |    CAST(NULL AS VARCHAR),
       |    array_to_string(list_slice(list_sort(array_agg(DISTINCT 'k8s.pod:' || kubernetes_pod_uid)), 1, ${operators.Assets.MaxEdges}), '|'),
       |    COALESCE(array_to_string(list_slice(list_sort(array_agg(DISTINCT 'k8s.cluster:' || orchestrator_cluster_name)
       |               FILTER (WHERE orchestrator_cluster_name IS NOT NULL)), 1, ${operators.Assets.MaxEdges}), '|'), ''),
       |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
       |  FROM pc WHERE rn = 1
       |  GROUP BY kubernetes_node_name
       |) u""".stripMargin
  }

  val batchTs2: String = s"TIMESTAMP '${operators.Assets.BatchTs2}'"

  /** Mirror of Assets.assetUpsertMerge: container graphs from a 21-day
    * (T1) and 7-day (T2) window, full-outer merged per EAN — newest
    * run's scalars, UNIONED edge sets (the reference's accumulate-over-
    * runs contract).
    */
  val assetUpsertMerge: String = {
    def containerArm(c: String, ts: String): String =
      s"""SELECT $ts AS asset_ts,
         |    'container:' || container_id AS asset_ean,
         |    'container' AS asset_type,
         |    container_id AS asset_id,
         |    array_to_string(list_slice(list_sort(array_agg(DISTINCT 'service:' || service_name)), 1, ${operators.Assets.MaxEdges}), '|')
         |      AS asset_children,
         |    COALESCE(array_to_string(list_slice(list_sort(array_agg(DISTINCT 'k8s.pod:' || kubernetes_pod_uid)
         |               FILTER (WHERE kubernetes_pod_uid IS NOT NULL)), 1, ${operators.Assets.MaxEdges}), '|'), '')
         |      AS asset_references
         |  FROM $c WHERE rn = 1 AND container_id IS NOT NULL
         |  GROUP BY container_id""".stripMargin
    def mergeEdges(a: String, b: String): String =
      s"""CASE WHEN $a IS NULL AND $b IS NULL THEN CAST(NULL AS VARCHAR)
         |  ELSE COALESCE(array_to_string(list_slice(list_sort(list_distinct(list_concat(
         |    CASE WHEN $a IS NULL OR $a = '' THEN CAST([] AS VARCHAR[]) ELSE str_split($a, '|') END,
         |    CASE WHEN $b IS NULL OR $b = '' THEN CAST([] AS VARCHAR[]) ELSE str_split($b, '|') END
         |  ))), 1, ${operators.Assets.MaxEdges}), '|'), '') END""".stripMargin
    val batchWins =
      "(b.asset_ts IS NOT NULL AND (s.asset_ts IS NULL OR b.asset_ts >= s.asset_ts))"
    s"""WITH $signalsCte,
       |${collapsedServicesCteNamed("sbase", "sc", 21)},
       |${collapsedServicesCteNamed("nbase", "nc", 7)},
       |state AS (
       |  ${containerArm("sc", batchTs)}
       |),
       |batch AS (
       |  ${containerArm("nc", batchTs2)}
       |)
       |SELECT
       |  CASE WHEN $batchWins THEN b.asset_ts ELSE s.asset_ts END AS asset_ts,
       |  asset_ean,
       |  CASE WHEN $batchWins THEN b.asset_type ELSE s.asset_type END AS asset_type,
       |  CASE WHEN $batchWins THEN b.asset_id ELSE s.asset_id END AS asset_id,
       |  CAST(NULL AS VARCHAR) AS asset_name,
       |  CAST(NULL AS VARCHAR) AS asset_parents,
       |  ${mergeEdges("s.asset_children", "b.asset_children")} AS asset_children,
       |  ${mergeEdges("s.asset_references", "b.asset_references")} AS asset_references,
       |  CAST(NULL AS VARCHAR) AS service_environment,
       |  CAST(NULL AS VARCHAR) AS cloud_provider,
       |  CAST(NULL AS VARCHAR) AS orchestrator_cluster_name
       |FROM state s FULL OUTER JOIN batch b USING (asset_ean)""".stripMargin
  }

  /** Mirror of Assets.assetUpsert: 21-day state (T1) merged with a
    * 7-day batch (T2); newest asset_ts wins, batch wins ties.
    */
  val assetUpsert: String = {
    def svcArm(c: String, ts: String, src: Int): String =
      s"""SELECT $ts AS asset_ts,
         |    'service:' || service_name AS asset_ean,
         |    'service' AS asset_type,
         |    service_name AS asset_id,
         |    service_name AS asset_name,
         |    CASE WHEN container_id IS NOT NULL
         |         THEN 'container:' || container_id END AS asset_parents,
         |    CAST(NULL AS VARCHAR) AS asset_children,
         |    CAST(NULL AS VARCHAR) AS asset_references,
         |    service_environment, cloud_provider, orchestrator_cluster_name,
         |    $src AS src
         |  FROM $c WHERE rn = 1""".stripMargin
    s"""WITH $signalsCte,
       |${collapsedServicesCteNamed("sbase", "sc", 21)},
       |${collapsedServicesCteNamed("nbase", "nc", 7)},
       |u AS (
       |  ${svcArm("sc", batchTs, 0)}
       |  UNION ALL
       |  ${svcArm("nc", batchTs2, 1)}
       |),
       |r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY asset_ean ORDER BY asset_ts DESC, src DESC,
       |      asset_type ASC NULLS FIRST, asset_id ASC NULLS FIRST,
       |      asset_name ASC NULLS FIRST, asset_parents ASC NULLS FIRST,
       |      asset_children ASC NULLS FIRST, asset_references ASC NULLS FIRST,
       |      service_environment ASC NULLS FIRST, cloud_provider ASC NULLS FIRST,
       |      orchestrator_cluster_name ASC NULLS FIRST) AS rn2
       |  FROM u
       |)
       |SELECT asset_ts, asset_ean, asset_type, asset_id, asset_name,
       |  asset_parents, asset_children, asset_references,
       |  service_environment, cloud_provider, orchestrator_cluster_name
       |FROM r WHERE rn2 = 1""".stripMargin
  }

  /** Parent/child join-field CTEs shared by the has_child/has_parent
    * mirrors: assetsAll as `aa`, plus the (child, parent) relation
    * from asset_parents ∪ inverted asset_children (references
    * excluded — GraphOps.parentChildEdges' rationale).
    */
  private val joinFieldCtes: String =
    s"""aa AS (
       |$assetsAll
       |),
       |pc AS (
       |  SELECT asset_ean AS child, unnest(string_split(asset_parents, '|')) AS parent
       |  FROM aa WHERE asset_parents IS NOT NULL AND asset_parents <> ''
       |  UNION
       |  SELECT unnest(string_split(asset_children, '|')) AS child, asset_ean AS parent
       |  FROM aa WHERE asset_children IS NOT NULL AND asset_children <> ''
       |)""".stripMargin

  /** Mirror of GraphOps.assetHasChild. */
  val assetHasChild: String =
    s"""WITH $joinFieldCtes,
       |matching AS (
       |  SELECT asset_ean AS child FROM aa
       |  WHERE asset_type = 'service' AND service_environment = 'prod'
       |),
       |hits AS (
       |  SELECT parent, CAST(count(DISTINCT child) AS BIGINT) AS n_matching_children
       |  FROM pc JOIN matching USING (child) GROUP BY parent
       |)
       |SELECT aa.*, h.n_matching_children
       |FROM aa JOIN hits h ON aa.asset_ean = h.parent""".stripMargin

  /** Mirror of GraphOps.assetHasParent. */
  val assetHasParent: String =
    s"""WITH $joinFieldCtes,
       |matching AS (
       |  SELECT asset_ean AS parent FROM aa
       |  WHERE asset_type = 'k8s.node'
       |    AND asset_references IS NOT NULL AND asset_references <> ''
       |),
       |hits AS (
       |  SELECT child, CAST(count(DISTINCT parent) AS BIGINT) AS n_matching_parents
       |  FROM pc JOIN matching USING (parent) GROUP BY child
       |)
       |SELECT aa.*, h.n_matching_parents
       |FROM aa JOIN hits h ON aa.asset_ean = h.child""".stripMargin
}
