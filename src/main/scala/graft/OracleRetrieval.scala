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
  val hybridRrf: String = {
    val qm = VectorOps.QueryMod
    val grid = 1099511627776L
    val k = Retrieval.RrfK
    val qCte =
      s"""q AS (
         |  SELECT doc_id AS query_id, word AS term
         |  FROM (${OracleText.tfidf}) t
         |  WHERE doc_id % $qm = 0
         |)""".stripMargin
    s"""WITH lex AS (
       |  SELECT query_id, doc_id, "rank" AS lex_rank
       |  FROM (${OracleText.bm25Sql(qCte, excludeSelf = true)}) l
       |),
       |vec AS (
       |  SELECT query_id, neighbor_id AS doc_id, "rank" AS vec_rank
       |  FROM (${OracleVectors.knnExact}) v
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
}
