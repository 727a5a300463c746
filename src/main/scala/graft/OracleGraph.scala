package graft

import graft.operators.GraphOps

/** DuckDB mirrors of [[graft.operators.GraphOps]].
  *
  * The PageRank iterations are UNROLLED (p1..p5 CTEs) — same device as
  * OracleVectors.dedupEmbeddingClusters: the oracle must be one static
  * SQL statement, and the round count is a small fixed constant shared
  * with the Spark side. All mass arithmetic is BIGINT (integer grid,
  * floor division on positive operands — DuckDB `//` and Spark `div`
  * both truncate there), so sums are order-free and HUGEINT results
  * are cast back to BIGINT.
  */
object OracleGraph {

  private val edgesCte: String =
    """edges AS (
      |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
      |    CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY src, dst
      |)""".stripMargin

  val degreeCentrality: String =
    s"""WITH $edgesCte,
       |od AS (
       |  SELECT src AS node, count(*) AS out_deg, CAST(sum(w) AS BIGINT) AS out_w
       |  FROM edges GROUP BY src
       |),
       |id AS (
       |  SELECT dst AS node, count(*) AS in_deg, CAST(sum(w) AS BIGINT) AS in_w
       |  FROM edges GROUP BY dst
       |)
       |SELECT COALESCE(od.node, id.node) AS node,
       |  COALESCE(out_deg, 0) AS out_deg, COALESCE(out_w, 0) AS out_w,
       |  COALESCE(in_deg, 0) AS in_deg, COALESCE(in_w, 0) AS in_w
       |FROM od FULL OUTER JOIN id ON od.node = id.node""".stripMargin

  val pagerank: String = {
    val base =
      GraphOps.PrScale * (GraphOps.PrDampDen - GraphOps.PrDampNum) / GraphOps.PrDampDen
    val rounds = (1 to GraphOps.PrRounds).map { i =>
      val prev = s"p${i - 1}"
      s"""p$i AS (
         |  SELECT n.node,
         |    $base + COALESCE(CAST(sum(
         |      (p.pr * ${GraphOps.PrDampNum} * e.w)
         |      // (${GraphOps.PrDampDen} * e.wout)) AS BIGINT), 0) AS pr
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.node
         |  LEFT JOIN $prev p ON p.node = e.src
         |  GROUP BY n.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ew AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |    CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY src, dst
       |),
       |wo AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM ew GROUP BY src),
       |edges AS (SELECT ew.src, ew.dst, ew.w, wo.wout FROM ew JOIN wo ON ew.src = wo.src),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |p0 AS (SELECT node, CAST(${GraphOps.PrScale} AS BIGINT) AS pr FROM nodes),
       |$rounds
       |SELECT node, pr FROM p${GraphOps.PrRounds}""".stripMargin
  }

  /** Mirror of GraphOps.assetClosure: the same WITH RECURSIVE over the
    * same derived upward edges (DuckDB's recursive CTE semantics match:
    * UNION ALL accumulation with a depth guard, min-depth collapse).
    */
  val assetClosure: String =
    s"""WITH RECURSIVE aa AS (
       |${OracleAssets.assetsAll}
       |),
       |up AS (
       |  SELECT asset_ean AS src, unnest(string_split(asset_parents, '|')) AS dst
       |  FROM aa WHERE asset_parents IS NOT NULL AND asset_parents <> ''
       |  UNION
       |  SELECT unnest(string_split(asset_children, '|')) AS src, asset_ean AS dst
       |  FROM aa WHERE asset_children IS NOT NULL AND asset_children <> ''
       |  UNION
       |  SELECT asset_ean AS src, unnest(string_split(asset_references, '|')) AS dst
       |  FROM aa WHERE asset_references IS NOT NULL AND asset_references <> ''
       |),
       |reach(src, dst, depth) AS (
       |  SELECT src, dst, CAST(1 AS BIGINT) FROM up
       |  UNION ALL
       |  SELECT r.src, e.dst, r.depth + 1
       |  FROM reach r JOIN up e ON r.dst = e.src
       |  WHERE r.depth < ${GraphOps.ClosureMaxDepth}
       |)
       |SELECT src AS asset_ean, dst AS reached_ean,
       |  CAST(min(depth) AS BIGINT) AS depth
       |FROM reach GROUP BY src, dst""".stripMargin

  /** Mirror of GraphOps.assetReachability: the assets_all oracle as a
    * CTE, its edge scalars split back to (src, dst) pairs, joined out
    * to ReachDepth hops, min depth kept. UNION (distinct) matches the
    * Spark side's .distinct() on the edge set.
    */
  val assetReachability: String = {
    val hops = (2 to GraphOps.ReachDepth).map { d =>
      s"""d$d AS (
         |  SELECT a.src, b.dst, $d AS depth
         |  FROM d${d - 1} a JOIN up b ON a.dst = b.src
         |)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to GraphOps.ReachDepth)
      .map(d => s"SELECT * FROM d$d").mkString(" UNION ALL ")
    s"""WITH aa AS (
       |${OracleAssets.assetsAll}
       |),
       |up AS (
       |  SELECT asset_ean AS src, unnest(string_split(asset_parents, '|')) AS dst
       |  FROM aa WHERE asset_parents IS NOT NULL AND asset_parents <> ''
       |  UNION
       |  SELECT unnest(string_split(asset_children, '|')) AS src, asset_ean AS dst
       |  FROM aa WHERE asset_children IS NOT NULL AND asset_children <> ''
       |  UNION
       |  SELECT asset_ean AS src, unnest(string_split(asset_references, '|')) AS dst
       |  FROM aa WHERE asset_references IS NOT NULL AND asset_references <> ''
       |),
       |d1 AS (SELECT src, dst, 1 AS depth FROM up),
       |$hops
       |SELECT src AS asset_ean, dst AS reached_ean,
       |  CAST(min(depth) AS BIGINT) AS depth
       |FROM ($unionAll)
       |GROUP BY src, dst""".stripMargin
  }

  /** Mirror of GraphOps.triangles — deliberately NOT the degree-ordered
    * algorithm: a plain `a < b < c` three-way self-join over the
    * undirected distinct edge set counts each triangle exactly once,
    * so agreement proves the orientation machinery is pure plumbing
    * (orientation-independence is the correctness claim). Nodes in no
    * triangle emit 0 via the LEFT JOIN onto the endpoint set.
    */
  val triangles: String =
    s"""WITH $edgesCte,
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src <> dst
       |),
       |tri AS (
       |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
       |  FROM und e1
       |  JOIN und e2 ON e2.a = e1.b
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
       |),
       |pern AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
       |  FROM (SELECT a AS node FROM tri UNION ALL
       |        SELECT b FROM tri UNION ALL
       |        SELECT c FROM tri)
       |  GROUP BY node
       |),
       |nodes AS (
       |  SELECT DISTINCT a AS node FROM und
       |  UNION SELECT DISTINCT b FROM und
       |)
       |SELECT n.node, COALESCE(p.n_triangles, 0) AS n_triangles
       |FROM nodes n LEFT JOIN pern p USING (node)""".stripMargin

  /** Mirror of GraphOps.kCore: top-quartile undirected edges (cut at
    * the SAME bottom-k-by-hash sample p75 as Spark — hash order,
    * LIMIT, sorted-list index arithmetic all re-taken from scratch,
    * value copied never computed, so the threshold is bit-equal), then
    * KCoreRounds peeling rounds unrolled as (degree, keep, filter)
    * CTE triples. The round CTEs are MATERIALIZED: each e(i−1) is
    * referenced 3× per round, and DuckDB's default inlining would
    * expand the 8-round chain into 3^8 copies of the base scan —
    * measured as an EMFILE blowup, not just slowness.
    */
  /** The strong-trade-graph CTE chain (mirror of GraphOps.strongEdges):
    * undirected summed edges, the bottom-k-by-hash sample threshold
    * re-taken from scratch, and the w ≥ p75 cut — ends in
    * `strong(a, b)`. Shared by [[kCore]] and [[linkPredict]].
    */
  private val strongCtes: String = {
    val rot = OracleText.rotLong("hh", 0)
    s"""$edgesCte,
       |und AS (
       |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
       |    CAST(sum(w) AS BIGINT) AS w
       |  FROM edges WHERE src <> dst GROUP BY 1, 2
       |),
       |smp AS (
       |  SELECT a, b, w FROM (
       |    SELECT a, b, w, $rot AS h
       |    FROM (SELECT a, b, w, md5(concat_ws(':', a, b)) AS hh FROM und))
       |  ORDER BY h ASC, a ASC, b ASC LIMIT ${GraphOps.KCoreSampleK}
       |),
       |th AS (
       |  SELECT vs[CAST(3 * (m - 1) // 4 + 1 AS INT)] AS t
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS m,
       |          list(w ORDER BY w) AS vs FROM smp)
       |),
       |strong AS MATERIALIZED (SELECT a, b FROM und, th WHERE w >= t)""".stripMargin
  }

  val kCore: String = {
    val k = GraphOps.KCoreK
    val rounds = (1 to GraphOps.KCoreRounds).map { i =>
      val prev = if (i == 1) "strong" else s"e${i - 1}"
      s"""d$i AS MATERIALIZED (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev)
         |  GROUP BY node
         |),
         |n$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM $prev e
         |  JOIN n$i na ON na.node = e.a
         |  JOIN n$i nb ON nb.node = e.b
         |)""".stripMargin
    }.mkString(",\n")
    val last = s"e${GraphOps.KCoreRounds}"
    s"""WITH $strongCtes,
       |$rounds
       |SELECT node, CAST(count(*) AS BIGINT) AS core_deg FROM (
       |  SELECT a AS node FROM $last UNION ALL SELECT b FROM $last)
       |GROUP BY node""".stripMargin
  }

  /** Mirror of GraphOps.linkPredict: the same strong-graph chain, the
    * same friends-of-friends wedge join with per-middle-node grid
    * contributions (AA via integer-log2 `length(bin(deg))`, RA via
    * integer reciprocal), anti-joined against the existing edge set,
    * total-ordered top-N.
    */
  val linkPredict: String =
    s"""WITH $strongCtes,
       |adj AS (
       |  SELECT a AS z, b AS n FROM strong
       |  UNION ALL SELECT b, a FROM strong
       |),
       |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY z),
       |adjd AS (
       |  SELECT adj.z, adj.n,
       |    CAST(1099511627776 // length(bin(deg)) AS BIGINT) AS aa_c,
       |    CAST(1099511627776 // deg AS BIGINT) AS ra_c
       |  FROM adj JOIN deg USING (z)
       |),
       |wedges AS (
       |  SELECT x.n AS u, y.n AS v, x.aa_c, x.ra_c
       |  FROM adjd x JOIN adjd y ON x.z = y.z AND x.n < y.n
       |),
       |cand AS (
       |  SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
       |    CAST(sum(aa_c) AS BIGINT) AS aa_grid,
       |    CAST(sum(ra_c) AS BIGINT) AS ra_grid
       |  FROM wedges GROUP BY u, v
       |)
       |SELECT c.u, c.v, c.cn, c.aa_grid, c.ra_grid
       |FROM cand c LEFT JOIN strong s ON s.a = c.u AND s.b = c.v
       |WHERE s.a IS NULL
       |ORDER BY c.aa_grid DESC, c.u ASC, c.v ASC
       |LIMIT ${GraphOps.LpTopN}""".stripMargin

  /** Mirror of GraphOps.personalizedPagerank: the pagerank unroll with
    * the teleport mass CASEd onto the seed set only.
    */
  val personalizedPagerank: String = {
    val base =
      GraphOps.PrScale * (GraphOps.PrDampDen - GraphOps.PrDampNum) / GraphOps.PrDampDen
    val seeds = GraphOps.PprSeeds.mkString(", ")
    val rounds = (1 to GraphOps.PrRounds).map { i =>
      val prev = s"p${i - 1}"
      s"""p$i AS (
         |  SELECT n.node,
         |    CAST(CASE WHEN n.node IN ($seeds) THEN $base ELSE 0 END AS BIGINT)
         |      + COALESCE(CAST(sum(
         |        (p.ppr * ${GraphOps.PrDampNum} * e.w)
         |        // (${GraphOps.PrDampDen} * e.wout)) AS BIGINT), 0) AS ppr
         |  FROM nodes n
         |  LEFT JOIN edges2 e ON e.dst = n.node
         |  LEFT JOIN $prev p ON p.node = e.src
         |  GROUP BY n.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |wo AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src),
       |edges2 AS (SELECT e.src, e.dst, e.w, wo.wout FROM edges e JOIN wo ON e.src = wo.src),
       |nodes AS (SELECT src AS node FROM edges2 UNION SELECT dst FROM edges2),
       |p0 AS (
       |  SELECT node,
       |    CAST(CASE WHEN node IN ($seeds) THEN ${GraphOps.PrScale} ELSE 0 END
       |      AS BIGINT) AS ppr
       |  FROM nodes
       |),
       |$rounds
       |SELECT node, ppr FROM p${GraphOps.PrRounds}""".stripMargin
  }

  /** Mirror of GraphOps.hits: the same bounded unroll with the
    * max-normalized integer grid — every round MATERIALIZED (each
    * rank CTE is referenced twice; the kCore EMFILE lesson), the
    * per-round max as a scalar subquery.
    */
  val hits: String = {
    val s = GraphOps.HitsScale
    val rounds = (1 to GraphOps.HitsRounds).map { i =>
      val prevH = if (i == 1) "h0" else s"h${i - 1}"
      s"""a${i}raw AS MATERIALIZED (
         |  SELECT n.node, COALESCE(CAST(sum(p.h) AS BIGINT), 0) AS a
         |  FROM nodes n
         |  LEFT JOIN e2 e ON e.dst = n.node
         |  LEFT JOIN $prevH p ON p.node = e.src
         |  GROUP BY n.node
         |),
         |a$i AS MATERIALIZED (
         |  SELECT node, (a * $s) // (SELECT max(a) FROM a${i}raw) AS a
         |  FROM a${i}raw
         |),
         |h${i}raw AS MATERIALIZED (
         |  SELECT n.node, COALESCE(CAST(sum(p.a) AS BIGINT), 0) AS h
         |  FROM nodes n
         |  LEFT JOIN e2 e ON e.src = n.node
         |  LEFT JOIN a$i p ON p.node = e.dst
         |  GROUP BY n.node
         |),
         |h$i AS MATERIALIZED (
         |  SELECT node, (h * $s) // (SELECT max(h) FROM h${i}raw) AS h
         |  FROM h${i}raw
         |)""".stripMargin
    }.mkString(",\n")
    val r = GraphOps.HitsRounds
    s"""WITH $edgesCte,
       |e2 AS (SELECT src, dst FROM edges),
       |nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
       |h0 AS (SELECT node, CAST($s AS BIGINT) AS h FROM nodes),
       |$rounds
       |SELECT h.node, h.h AS hub_grid, a.a AS auth_grid,
       |  CAST(h.h AS DOUBLE) / CAST($s AS DOUBLE) AS hub,
       |  CAST(a.a AS DOUBLE) / CAST($s AS DOUBLE) AS authority
       |FROM h$r h JOIN a$r a ON a.node = h.node""".stripMargin
  }
}
