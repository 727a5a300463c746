package graft

import graft.operators.{Retrieval, VectorOps}

/** DuckDB oracle SQL for [[graft.operators.Retrieval]]. */
object OracleRetrieval {

  /** Mirror of Retrieval.hybridRrf: the BM25 chain with the derived
    * top-3-TF-IDF query table (self-hit excluded), the exact-KNN
    * ranking, a full outer join per (query, doc), and the
    * integer-grid RRF sum — `⌊2^40 / (60 + rank)⌋` per list, missing
    * rank contributes 0. Nested WITHs live inside subqueries (the
    * dedupEmbeddingClusters device).
    */
  val hybridRrf: String = hybridRrfWith(OracleVectors.knnExact)

  /** Mirror of Retrieval.hybridRrfAnn: identical lex tower and fusion,
    * the vector ranks from the AUTO-SIZED trained-IVF mirror (dial
    * CTEs derive nlist/nprobe from count(*)) instead of the exact
    * scan.
    */
  val hybridRrfAnn: String = hybridRrfWith(OracleVectors.knnIvfAuto)

  /** Mirror of Retrieval.hybridRrfAnnRecall: per-query overlap@K of
    * the ANN-served hybrid page against the exact-vector hybrid page.
    */
  val hybridRrfAnnRecall: String =
    s"""WITH exact AS (
       |  SELECT query_id, doc_id FROM ($hybridRrf)
       |),
       |approx AS (
       |  SELECT query_id, doc_id FROM ($hybridRrfAnn)
       |)
       |SELECT e.query_id,
       |  CAST(count(a.doc_id) AS DOUBLE) / ${Retrieval.RrfTopK} AS recall_at_k,
       |  count(*) AS n_exact
       |FROM exact e LEFT JOIN approx a
       |  ON a.query_id = e.query_id AND a.doc_id = e.doc_id
       |GROUP BY e.query_id""".stripMargin

  /** The hybrid chain over an injectable (query_id, neighbor_id,
    * "rank") vector-ranking subquery.
    */
  /** Mirror of Retrieval.hybridRrfServing: both towers restricted to
    * the FIXED [[Retrieval.ServingQMax]]-bounded query page — the
    * fixture whose bench ratio isolates corpus growth from query-set
    * growth.
    */
  lazy val hybridRrfServing: String = hybridRrfWith(
    OracleVectors.knnIvfAutoQueries(c =>
      s"$c % ${VectorOps.QueryMod} = 0 AND $c < ${Retrieval.ServingQMax}"),
    qdocExtra = s"AND doc_id < ${Retrieval.ServingQMax}")

  private def hybridRrfWith(vecSql: String,
      qdocExtra: String = ""): String = {
    val qm = VectorOps.QueryMod
    val grid = 1099511627776L
    val k = Retrieval.RrfK
    val qCte =
      s"""q AS (
         |  SELECT doc_id AS query_id, word AS term
         |  FROM (${OracleText.tfidf}) t
         |  WHERE doc_id % $qm = 0 $qdocExtra
         |)""".stripMargin
    s"""WITH lex AS (
       |  SELECT query_id, doc_id, "rank" AS lex_rank
       |  FROM (${OracleText.bm25Sql(qCte, excludeSelf = true)}) l
       |),
       |vec AS (
       |  SELECT query_id, neighbor_id AS doc_id, "rank" AS vec_rank
       |  FROM ($vecSql) v
       |),
       |fused AS (
       |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
       |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
       |    l.lex_rank, v.vec_rank,
       |    COALESCE($grid // ($k + l.lex_rank), 0) +
       |      COALESCE($grid // ($k + v.vec_rank), 0) AS rrf_score
       |  FROM lex l FULL OUTER JOIN vec v
       |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS "rank"
       |  FROM fused
       |)
       |SELECT query_id, "rank", doc_id, rrf_score, lex_rank, vec_rank
       |FROM ranked WHERE "rank" <= ${Retrieval.RrfTopK}""".stripMargin
  }

  /** Mirror of Retrieval.mmrRerank: the knnExact candidates, the k²
    * pairwise candidate cosines, then the greedy λ-trade selection
    * unrolled as one CTE pair (pick + accumulated set) per step — the
    * Lloyd-rounds device. The (1−λ) coefficient is interpolated from
    * the same Scala subtraction the operator uses.
    */
  val mmrRerank: String = {
    val lam = Retrieval.MmrLambda
    val oml = 1 - Retrieval.MmrLambda
    val dim = VectorOps.Dim
    def dot(a: String, b: String): String =
      s"""list_reduce(list_transform(range(1, ${dim + 1}),
         |  i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)),
         |  (acc, v) -> acc + v)""".stripMargin
    val steps = (2 to Retrieval.MmrK).map { t =>
      s"""pick$t AS (
         |  SELECT query_id, doc_id, CAST($t AS BIGINT) AS pick_order,
         |    rel, max_div, mmr
         |  FROM (
         |    SELECT r.*, row_number() OVER (
         |      PARTITION BY query_id ORDER BY mmr DESC, doc_id ASC) AS rk
         |    FROM (
         |      SELECT c.query_id, c.doc_id, c.rel, m.max_div,
         |        $lam * c.rel - $oml * m.max_div AS mmr
         |      FROM cands c
         |      JOIN (
         |        SELECT p.query_id, p.a AS doc_id, max(p.psim) AS max_div
         |        FROM pairs p
         |        JOIN sel${t - 1} s ON s.query_id = p.query_id AND s.doc_id = p.b
         |        GROUP BY p.query_id, p.a
         |      ) m ON m.query_id = c.query_id AND m.doc_id = c.doc_id
         |      WHERE NOT EXISTS (
         |        SELECT 1 FROM sel${t - 1} s2
         |        WHERE s2.query_id = c.query_id AND s2.doc_id = c.doc_id)
         |    ) r
         |  ) WHERE rk = 1
         |),
         |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pick$t)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH cands AS (
       |  SELECT query_id, neighbor_id AS doc_id, sim AS rel
       |  FROM (${OracleVectors.knnExact}) e
       |),
       |vec AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding")} AS nrm
       |  FROM embeddings
       |),
       |pairs AS (
       |  SELECT c1.query_id, c1.doc_id AS a, c2.doc_id AS b,
       |    ${dot("e1.embedding", "e2.embedding")} /
       |      (sqrt(e1.nrm) * sqrt(e2.nrm)) AS psim
       |  FROM cands c1
       |  JOIN cands c2 ON c1.query_id = c2.query_id AND c1.doc_id <> c2.doc_id
       |  JOIN vec e1 ON e1.vec_id = c1.doc_id
       |  JOIN vec e2 ON e2.vec_id = c2.doc_id
       |),
       |sel1 AS (
       |  SELECT query_id, doc_id, CAST(1 AS BIGINT) AS pick_order, rel,
       |    0.0 AS max_div, $lam * rel AS mmr
       |  FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS rk
       |    FROM cands
       |  ) WHERE rk = 1
       |),
       |$steps
       |SELECT query_id, pick_order, doc_id, rel, max_div, mmr
       |FROM sel${Retrieval.MmrK}""".stripMargin
  }

  /** Mirror of Retrieval.clusterCards: the IVF assignment (nested as a
    * subquery, the hybridRrf device) labels each embedded doc's
    * cluster; the sig-terms pipeline then runs with cluster as the
    * foreground source and the embedded corpus as background.
    */
  val clusterCards: String = {
    val topK = graft.operators.TextOps.SigTermsTopK
    s"""WITH asn AS (
       |  SELECT vec_id AS doc_id,
       |    'cluster_' || CAST(assigned_label AS VARCHAR) AS source
       |  FROM (${OracleVectors.ivfAssign()}) a
       |),
       |d AS (
       |  SELECT dd.doc_id, a.source, string_split(dd.text, ' ') AS words
       |  FROM documents dd JOIN asn a USING (doc_id)
       |),
       |dt AS (
       |  SELECT DISTINCT doc_id, source, unnest(words) AS term FROM d
       |),
       |fg AS (
       |  SELECT source, term, count(*) AS fg FROM dt GROUP BY source, term
       |),
       |bg AS (
       |  SELECT term, count(*) AS bg FROM dt GROUP BY term
       |),
       |fgt AS (
       |  SELECT source, count(*) AS fg_total FROM asn GROUP BY source
       |),
       |n AS (SELECT count(*) AS bg_total FROM asn),
       |scored AS (
       |  SELECT f.source, f.term, f.fg, b.bg,
       |    (CAST(f.fg AS DOUBLE) / CAST(t.fg_total AS DOUBLE) -
       |     CAST(b.bg AS DOUBLE) / CAST(n.bg_total AS DOUBLE)) *
       |    ((CAST(f.fg AS DOUBLE) / CAST(t.fg_total AS DOUBLE)) /
       |     (CAST(b.bg AS DOUBLE) / CAST(n.bg_total AS DOUBLE))) AS jlh
       |  FROM fg f JOIN bg b USING (term) JOIN fgt t USING (source), n
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY source ORDER BY jlh DESC, term ASC) AS "rank"
       |  FROM scored
       |)
       |SELECT source AS cluster, "rank", term, CAST(fg AS BIGINT) AS fg,
       |  CAST(bg AS BIGINT) AS bg, jlh
       |FROM ranked WHERE "rank" <= $topK""".stripMargin
  }

  /** Mirror of Retrieval.termsError: the same doc_id % S sharding,
    * per-shard top-K with the (cnt DESC, term ASC) tiebreak, merged
    * doc_count over RETURNED shards only, and the error bound as the
    * sum of non-returning shards' K-th counts (0 for a shard that
    * returned its whole term list).
    */
  val termsError: String = {
    val s = Retrieval.TermsShards
    val k = Retrieval.TermsTopK
    s"""WITH wm AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |),
       |p AS (SELECT DISTINCT doc_id, term FROM wm),
       |per AS (
       |  SELECT CAST(doc_id % $s AS BIGINT) AS shard, term,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM p GROUP BY 1, 2
       |),
       |rk AS (
       |  SELECT shard, term, cnt, row_number() OVER (
       |    PARTITION BY shard ORDER BY cnt DESC, term ASC) AS rn
       |  FROM per
       |),
       |top AS (SELECT shard, term, cnt FROM rk WHERE rn <= $k),
       |kth AS (SELECT shard, cnt AS kth_cnt FROM rk WHERE rn = $k),
       |sk AS (
       |  SELECT s.shard, COALESCE(kth.kth_cnt, 0) AS kth_cnt
       |  FROM (SELECT DISTINCT shard FROM per) s
       |  LEFT JOIN kth ON kth.shard = s.shard
       |),
       |cand AS (SELECT DISTINCT term FROM top),
       |j AS (
       |  SELECT g.term, g.kth_cnt, t.cnt
       |  FROM (SELECT c.term, sk.shard, sk.kth_cnt FROM cand c CROSS JOIN sk) g
       |  LEFT JOIN top t ON t.term = g.term AND t.shard = g.shard
       |)
       |SELECT term,
       |  CAST(sum(COALESCE(cnt, 0)) AS BIGINT) AS doc_count,
       |  CAST(sum(CASE WHEN cnt IS NULL THEN kth_cnt ELSE 0 END) AS BIGINT)
       |    AS doc_count_error_upper_bound
       |FROM j GROUP BY term
       |ORDER BY doc_count DESC, term ASC
       |LIMIT $k""".stripMargin
  }

  /** Mirror of Retrieval.rankEval: the exact-KNN run (nested-WITH
    * subquery, the hybridRrf device) judged by label match; per-query
    * integer divisions, summary means via the DECIMAL(18,12)
    * quantize-then-exact-sum device.
    */
  val rankEval: String = rankEvalOf(OracleVectors.knnExact)

  /** rank_eval over the IVF run — same harness, ANN run subquery. */
  val rankEvalIvf: String = rankEvalOf(OracleVectors.knnIvf())

  private def rankEvalOf(run: String): String = {
    val k = VectorOps.K
    val qm = VectorOps.QueryMod
    // the SAME code-gen decimal literals the Spark side embeds
    // (Retrieval.dcgWeight) — DuckDB list syntax, identical values
    val wLit = (1 to k)
      .map(r => s"CAST('${Retrieval.dcgWeight(r).toPlainString}' AS DECIMAL(18,12))")
      .mkString("[", ", ", "]")
    val prefix = (1 to k).scanLeft(java.math.BigDecimal.ZERO) {
      (acc, r) => acc.add(Retrieval.dcgWeight(r))
    }.tail
    val pLit = prefix
      .map(p => s"CAST('${p.toPlainString}' AS DECIMAL(18,12))")
      .mkString("[", ", ", "]")
    s"""WITH knn AS ($run),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |qlab AS (
       |  SELECT vec_id AS query_id, label AS qlabel
       |  FROM embeddings WHERE vec_id % $qm = 0
       |),
       |nrel AS (
       |  SELECT q.query_id, CAST(count(*) - 1 AS BIGINT) AS n_rel
       |  FROM qlab q JOIN lab l ON l.label = q.qlabel
       |  GROUP BY q.query_id
       |),
       |per AS (
       |  SELECT kn.query_id,
       |    CAST(sum(CASE WHEN nl.label = q.qlabel THEN 1 ELSE 0 END) AS BIGINT)
       |      AS rel_at_k,
       |    min(CASE WHEN nl.label = q.qlabel THEN kn."rank" END) AS first_rank,
       |    sum(CASE WHEN nl.label = q.qlabel
       |        THEN ($wLit)[CAST(kn."rank" AS INT)]
       |        ELSE CAST('0' AS DECIMAL(18,12)) END) AS dcg
       |  FROM knn kn
       |  JOIN qlab q USING (query_id)
       |  JOIN lab nl ON nl.vec_id = kn.neighbor_id
       |  GROUP BY kn.query_id
       |),
       |met AS (
       |  SELECT p.query_id, p.rel_at_k, n.n_rel, p.first_rank,
       |    CAST(p.rel_at_k AS DOUBLE) / CAST($k AS DOUBLE) AS p_at_k,
       |    CAST(p.rel_at_k AS DOUBLE) / CAST(n.n_rel AS DOUBLE) AS recall_at_k,
       |    COALESCE(CAST(1 AS DOUBLE) / p.first_rank, CAST(0 AS DOUBLE)) AS rr,
       |    CASE WHEN n.n_rel = 0 THEN CAST(NULL AS DOUBLE)
       |      ELSE CAST(p.dcg AS DOUBLE)
       |        / CAST(($pLit)[CAST(greatest(1, least(n.n_rel, $k)) AS INT)] AS DOUBLE)
       |      END AS ndcg_at_k
       |  FROM per p JOIN nrel n USING (query_id)
       |)
       |SELECT * FROM met
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS query_id,
       |  CAST(sum(rel_at_k) AS BIGINT) AS rel_at_k,
       |  CAST(sum(n_rel) AS BIGINT) AS n_rel,
       |  CAST(NULL AS BIGINT) AS first_rank,
       |  CAST(sum(CAST(p_at_k AS DECIMAL(18,12))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS p_at_k,
       |  CAST(sum(CAST(recall_at_k AS DECIMAL(18,12))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS recall_at_k,
       |  CAST(sum(CAST(rr AS DECIMAL(18,12))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS rr,
       |  CAST(sum(CAST(ndcg_at_k AS DECIMAL(18,12))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS ndcg_at_k
       |FROM met""".stripMargin
  }
}
