package graft

import graft.operators.{DslQueries, VectorOps}

/** DuckDB oracle SQL for the [[graft.operators.DslQueries]] bodies —
  * each mirror is the hand-written SQL meaning of the JSON request the
  * compiler lowered, over the same fixture CTEs the asset oracles use.
  */
object OracleDsl {

  /** Mirror of DslQueries.SearchBody: filter range + must terms (with
    * the `service_summary`→`purchase` value translation) + null-safe
    * must_not + should/msm=1 + (ts desc, id desc) size cut.
    */
  val dslSearch: String =
    s"""WITH ${OracleAssets.signalsCte}
       |SELECT event_id, ts, service_name, service_environment,
       |       container_id, kubernetes_pod_uid, cloud_provider
       |FROM signals, mx
       |WHERE ts >= m - INTERVAL 14 DAY
       |  AND event_type IN ('purchase', 'view')
       |  AND NOT COALESCE(cloud_provider = 'aws', FALSE)
       |  AND (container_id IS NOT NULL OR kubernetes_pod_uid IS NOT NULL)
       |ORDER BY ts DESC, event_id DESC
       |LIMIT 500""".stripMargin

  /** Mirror of DslQueries.CollapseBody: the logs∪apm union stream
    * (both patterns resolve to the same physical events, so the union
    * doubles rows — the overlapping-index shape podsMultiSource
    * models), exists conjunction, top-1 per pod uid under
    * (ts desc, event_id desc).
    */
  val dslCollapse: String =
    s"""WITH ${OracleAssets.signalsCteFrom(
            "(SELECT * FROM events UNION ALL SELECT * FROM events)")},
       |filtered AS (
       |  SELECT * FROM signals, mx
       |  WHERE ts >= m - INTERVAL 21 DAY
       |    AND kubernetes_pod_uid IS NOT NULL
       |    AND kubernetes_node_name IS NOT NULL
       |),
       |collapsed AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY kubernetes_pod_uid
       |    ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM filtered
       |)
       |SELECT event_id, ts, kubernetes_pod_uid, kubernetes_node_name,
       |       orchestrator_cluster_name, cloud_provider
       |FROM collapsed WHERE rn = 1""".stripMargin

  /** Mirror of DslQueries.CollapseInnerBody: the same collapse window,
    * rank kept as hit_rank, top-2 per group.
    */
  val dslCollapseInner: String =
    s"""WITH ${OracleAssets.signalsCteFrom(
            "(SELECT * FROM events UNION ALL SELECT * FROM events)")},
       |filtered AS (
       |  SELECT * FROM signals, mx
       |  WHERE ts >= m - INTERVAL 21 DAY
       |    AND kubernetes_pod_uid IS NOT NULL
       |    AND kubernetes_node_name IS NOT NULL
       |),
       |collapsed AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY kubernetes_pod_uid
       |    ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM filtered
       |)
       |SELECT event_id, CAST(rn AS BIGINT) AS hit_rank, ts,
       |       kubernetes_pod_uid, kubernetes_node_name,
       |       orchestrator_cluster_name, cloud_provider
       |FROM collapsed WHERE rn <= 2""".stripMargin

  /** Mirror of DslQueries.CollapseInnerSizeBody: the same collapse
    * window, the top-level `size` counted in COLLAPSED groups — the 3
    * newest rank-1 hits pick the surviving pods, their rn ≤ 2 inner
    * rows come along.
    */
  val dslCollapseInnerSize: String =
    s"""WITH ${OracleAssets.signalsCteFrom(
            "(SELECT * FROM events UNION ALL SELECT * FROM events)")},
       |filtered AS (
       |  SELECT * FROM signals, mx
       |  WHERE ts >= m - INTERVAL 21 DAY
       |    AND kubernetes_pod_uid IS NOT NULL
       |    AND kubernetes_node_name IS NOT NULL
       |),
       |collapsed AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY kubernetes_pod_uid
       |    ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM filtered
       |),
       |top_groups AS (
       |  SELECT kubernetes_pod_uid FROM collapsed WHERE rn = 1
       |  ORDER BY ts DESC, event_id DESC LIMIT 3
       |)
       |SELECT event_id, CAST(rn AS BIGINT) AS hit_rank, ts,
       |       kubernetes_pod_uid, kubernetes_node_name,
       |       orchestrator_cluster_name, cloud_provider
       |FROM collapsed
       |WHERE rn <= 2 AND kubernetes_pod_uid IN
       |  (SELECT kubernetes_pod_uid FROM top_groups)""".stripMargin

  /** Mirror of DslQueries.MatchBody: `match` = OR of token membership
    * (whitespace analysis), `match_phrase` = padded-text adjacency.
    */
  val dslMatch: String =
    """SELECT doc_id, lang, source, n_chars
      |FROM documents
      |WHERE (list_contains(string_split(text, ' '), 'vector')
      |       OR list_contains(string_split(text, ' '), 'hash'))
      |  AND instr(' ' || text || ' ', ' merge slow ') > 0""".stripMargin

  /** Mirror of DslQueries.AggsBody: nested buckets as one multi-key
    * group, decimal-device metrics, exact cardinality, the terms size
    * cut as the same dense-rank window.
    */
  val dslAggs: String =
    s"""WITH ${OracleAssets.signalsCte},
       |f AS (SELECT * FROM signals, mx WHERE ts >= m - INTERVAL 21 DAY),
       |g AS (
       |  SELECT CAST(ts AS DATE) AS per_day, event_type AS by_type,
       |    CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |      / CAST(count(value) AS DOUBLE) AS value_avg,
       |    max(value) AS value_max,
       |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |  FROM f GROUP BY 1, 2
       |),
       |r AS (
       |  SELECT *, dense_rank() OVER (
       |    PARTITION BY per_day ORDER BY doc_count DESC, by_type ASC) AS rk
       |  FROM g
       |)
       |SELECT per_day, by_type, doc_count, value_sum, value_avg, value_max,
       |       n_users
       |FROM r WHERE rk <= 3""".stripMargin

  /** Mirror of DslQueries.ScoreBody: the shared BM25 CTE chain
    * (OracleText.bm25Ctes — grid scores, log-free idf) with this
    * body's analyzed terms as the query relation, hits joined back to
    * the projected fields.
    */
  val dslScore: String = {
    val terms = Seq("spark", "join", "window")
    val qvals = terms.map(t => s"(CAST(0 AS BIGINT), '$t')").mkString(", ")
    s"""WITH ${OracleText.bm25Ctes(
           s"q(query_id, term) AS (VALUES $qvals)", excludeSelf = false)}
       |SELECT r.doc_id, r.score, r."rank", r.n_matched, d2.lang, d2.source
       |FROM (SELECT doc_id, score, "rank", n_matched FROM ranked
       |      WHERE "rank" <= ${operators.TextOps.Bm25TopK}) r
       |JOIN documents d2 ON d2.doc_id = r.doc_id""".stripMargin
  }

  /** Mirror of DslQueries.FiltersBody: the same conditional aggregates
    * over one pass, unstacked with UNION ALL (DuckDB has no stack).
    */
  val dslFilters: String = {
    def arm(i: Int, name: String): String =
      s"SELECT '$name' AS groups, c$i AS doc_count, s$i AS value_sum, " +
        s"m$i AS value_max, u$i AS n_users FROM one"
    s"""WITH ${OracleAssets.signalsCte},
       |flags AS (
       |  SELECT value, user_id,
       |    COALESCE(event_type = 'view', FALSE) AS p0,
       |    COALESCE(event_type = 'error' AND value >= 100, FALSE) AS p1,
       |    COALESCE(cloud_provider = 'aws' AND container_id IS NOT NULL, FALSE) AS p2
       |  FROM signals
       |),
       |one AS (
       |  SELECT
       |    CAST(sum(CASE WHEN p0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
       |    COALESCE(CAST(sum(CASE WHEN p0 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS s0,
       |    max(CASE WHEN p0 THEN value END) AS m0,
       |    CAST(count(DISTINCT CASE WHEN p0 THEN user_id END) AS BIGINT) AS u0,
       |    CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    COALESCE(CAST(sum(CASE WHEN p1 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS s1,
       |    max(CASE WHEN p1 THEN value END) AS m1,
       |    CAST(count(DISTINCT CASE WHEN p1 THEN user_id END) AS BIGINT) AS u1,
       |    CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
       |    COALESCE(CAST(sum(CASE WHEN p2 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS s2,
       |    max(CASE WHEN p2 THEN value END) AS m2,
       |    CAST(count(DISTINCT CASE WHEN p2 THEN user_id END) AS BIGINT) AS u2
       |  FROM flags
       |)
       |${arm(0, "views")}
       |UNION ALL
       |${arm(1, "big_errors")}
       |UNION ALL
       |${arm(2, "tagged_aws")}""".stripMargin
  }

  /** Per-field BM25 score-table CTE chain — the DuckDB mirror of
    * QueryDsl.fieldScoreTable ∘ TextOps.bm25ScoreTable for one field
    * of the documents index: same tf restriction, same length norm,
    * same grid floor, summed per doc with no top-k cut. Emits
    * `<p>_scored(doc_id, score, n_matched)`.
    */
  private def fieldScoreCtes(p: String, fieldExpr: String,
      terms: Seq[String]): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""${p}_dl AS (
       |  SELECT doc_id, len(string_split($fieldExpr, ' ')) AS dl FROM documents
       |),
       |${p}_stats AS (
       |  SELECT count(dl) AS n_docs, sum(dl) AS dl_sum FROM ${p}_dl
       |),
       |${p}_tc AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split($fieldExpr, ' ')) AS term
       |    FROM documents) t
       |  WHERE term IN ($termList)
       |  GROUP BY doc_id, term
       |),
       |${p}_df AS (SELECT term, count(*) AS df FROM ${p}_tc GROUP BY term),
       |${p}_c2 AS (
       |  SELECT tc.doc_id, tc.tf, l.dl,
       |    CAST(s.dl_sum AS DOUBLE) / CAST(s.n_docs AS DOUBLE) AS avgdl,
       |    (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) /
       |      (CAST(d.df AS DOUBLE) + 0.5) + 1.0 AS idf
       |  FROM ${p}_tc tc JOIN ${p}_df d USING (term)
       |  JOIN ${p}_dl l USING (doc_id), ${p}_stats s
       |),
       |${p}_scored AS (
       |  SELECT doc_id,
       |    CAST(sum(CAST(floor(idf * ((CAST(tf AS DOUBLE) * 2.2) /
       |      (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |        (CAST(dl AS DOUBLE) / avgdl)))) * 1099511627776.0) AS BIGINT))
       |      AS BIGINT) AS score,
       |    count(*) AS n_matched
       |  FROM ${p}_c2 GROUP BY doc_id
       |)""".stripMargin
  }

  /** Mirror of DslQueries.BoolScoredBody: must score + left-joined
    * should additions in clause order (((must + should0) + should1)),
    * filter/must_not as the unscored gate, top-15 under
    * (s DESC, doc_id ASC).
    */
  val dslBoolScored: String =
    s"""WITH ${fieldScoreCtes("m", "text", Seq("spark", "join", "window"))},
       |${fieldScoreCtes("b", "text", Seq("fast", "merge"))},
       |${fieldScoreCtes("t", "source", Seq("src3"))},
       |combined AS (
       |  SELECT m.doc_id,
       |    ((CAST(m.score AS DOUBLE) * 1.0 + COALESCE(b.s1, 0.0))
       |      + COALESCE(t.s2, 0.0)) AS s
       |  FROM m_scored m
       |  LEFT JOIN (SELECT doc_id, CAST(score AS DOUBLE) * 2.0 AS s1
       |             FROM b_scored) b USING (doc_id)
       |  LEFT JOIN (SELECT doc_id, CAST(score AS DOUBLE) * 1.0 AS s2
       |             FROM t_scored) t USING (doc_id)
       |),
       |gated AS (
       |  SELECT c.doc_id, c.s FROM combined c
       |  JOIN documents d ON d.doc_id = c.doc_id
       |  WHERE d.n_chars >= 200 AND NOT COALESCE(d.lang = 'de', FALSE)
       |),
       |ranked AS (
       |  SELECT doc_id, s AS score,
       |    row_number() OVER (ORDER BY s DESC, doc_id ASC) AS "rank"
       |  FROM gated
       |)
       |SELECT r.doc_id, r.score, r."rank", d.lang, d.source, d.n_chars
       |FROM (SELECT * FROM ranked WHERE "rank" <= 15) r
       |JOIN documents d ON d.doc_id = r.doc_id""".stripMargin

  /** Mirror of DslQueries.MultiMatchBody: per-field score tables (the
    * `^2` boost on source), full-outer merged, dis_max with
    * tie_breaker 0.5 — `max + 0.5·(sum − max)`, the engine's exact
    * per-row arithmetic.
    */
  val dslMultiMatch: String = {
    val toks = Seq("src7", "spark", "stream")
    s"""WITH ${fieldScoreCtes("x", "text", toks)},
       |${fieldScoreCtes("y", "source", toks)},
       |merged AS (
       |  SELECT doc_id, COALESCE(x.s0, 0.0) AS s0, COALESCE(y.s1, 0.0) AS s1
       |  FROM (SELECT doc_id, CAST(score AS DOUBLE) * 1.0 AS s0
       |        FROM x_scored) x
       |  FULL OUTER JOIN (SELECT doc_id, CAST(score AS DOUBLE) * 2.0 AS s1
       |                   FROM y_scored) y USING (doc_id)
       |),
       |scored AS (
       |  SELECT doc_id,
       |    (greatest(s0, s1) + 0.5 * ((s0 + s1) - greatest(s0, s1))) AS s
       |  FROM merged
       |),
       |ranked AS (
       |  SELECT doc_id, s AS score,
       |    row_number() OVER (ORDER BY s DESC, doc_id ASC) AS "rank"
       |  FROM scored
       |)
       |SELECT r.doc_id, r.score, r."rank", d.lang, d.source
       |FROM (SELECT * FROM ranked WHERE "rank" <= 12) r
       |JOIN documents d ON d.doc_id = r.doc_id""".stripMargin
  }

  /** Mirror of DslQueries.AggsStatsBody: one grouped pass with the
    * stats family flattened, exact interpolated percentiles
    * (quantile_cont ≡ Spark `percentile` on whole values at binary
    * fractions), and conditional-count percentile ranks.
    */
  val dslAggsStats: String =
    """WITH g AS (
      |  SELECT lang AS by_lang,
      |    CAST(count(*) AS BIGINT) AS doc_count,
      |    CAST(count(n_chars) AS BIGINT) AS len_count,
      |    min(n_chars) AS len_min,
      |    max(n_chars) AS len_max,
      |    CAST(sum(n_chars) AS BIGINT) AS len_sum,
      |    CAST(sum(n_chars) AS DOUBLE) / CAST(count(n_chars) AS DOUBLE) AS len_avg,
      |    quantile_cont(n_chars, 0.25) AS lenq_p25,
      |    quantile_cont(n_chars, 0.5) AS lenq_p50,
      |    quantile_cont(n_chars, 0.75) AS lenq_p75,
      |    CAST(sum(CASE WHEN n_chars <= 300 THEN 1 ELSE 0 END) AS DOUBLE) /
      |      CAST(count(n_chars) AS DOUBLE) * 100.0 AS lenr_pr_300,
      |    CAST(sum(CASE WHEN n_chars <= 600 THEN 1 ELSE 0 END) AS DOUBLE) /
      |      CAST(count(n_chars) AS DOUBLE) * 100.0 AS lenr_pr_600
      |  FROM documents GROUP BY 1
      |),
      |r AS (
      |  SELECT *, dense_rank() OVER (
      |    ORDER BY doc_count DESC, by_lang ASC) AS rk
      |  FROM g
      |)
      |SELECT by_lang, doc_count, len_count, len_min, len_max, len_sum,
      |       len_avg, lenq_p25, lenq_p50, lenq_p75, lenr_pr_300, lenr_pr_600
      |FROM r WHERE rk <= 10""".stripMargin

  /** Mirror of DslQueries.AggsMissingBody: the `missing` bucket as a
    * COALESCE key, decimal-device sum, terms size cut.
    */
  val dslAggsMissing: String =
    s"""WITH ${OracleAssets.signalsCte},
       |g AS (
       |  SELECT COALESCE(cloud_provider, 'none') AS by_provider,
       |    CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       |  FROM signals GROUP BY 1
       |),
       |r AS (
       |  SELECT *, dense_rank() OVER (
       |    ORDER BY doc_count DESC, by_provider ASC) AS rk
       |  FROM g
       |)
       |SELECT by_provider, doc_count, value_sum FROM r WHERE rk <= 10""".stripMargin

  /** Mirror of DslQueries.SigTermsBody: foreground/background doc
    * counts, the JLH score over exact integer counts, positive
    * correlation gate, top-5.
    */
  val dslSigTerms: String =
    """WITH fgd AS (SELECT * FROM documents WHERE lang = 'en'),
      |fg AS (SELECT source, CAST(count(*) AS BIGINT) AS doc_count FROM fgd GROUP BY 1),
      |bg AS (SELECT source, CAST(count(*) AS BIGINT) AS bg_count FROM documents GROUP BY 1),
      |t AS (
      |  SELECT (SELECT count(*) FROM fgd) AS fg_total,
      |         (SELECT count(*) FROM documents) AS bg_total
      |),
      |s AS (
      |  SELECT fg.source, fg.doc_count, bg.bg_count,
      |    CAST(fg.doc_count AS DOUBLE) / CAST(t.fg_total AS DOUBLE) AS fg_pct,
      |    CAST(bg.bg_count AS DOUBLE) / CAST(t.bg_total AS DOUBLE) AS bg_pct
      |  FROM fg JOIN bg USING (source), t
      |)
      |SELECT source AS sig_sources, doc_count, bg_count,
      |  (fg_pct - bg_pct) * (fg_pct / bg_pct) AS score
      |FROM s
      |WHERE fg_pct > bg_pct
      |ORDER BY score DESC, sig_sources ASC
      |LIMIT 5""".stripMargin

  /** Mirror of DslQueries.SuggestBody: OracleText's suggest device —
    * deletion-1 key blocking + exact levenshtein — with the vocabulary
    * derived from the documents field (occurrence counts ≡ Σtf) and
    * this body's input tokens.
    */
  val dslSuggest: String = {
    val inputs = Seq("ordr", "scann", "vektor", "key", "zebra")
    val inVals = inputs.map(s => s"('$s')").mkString(", ")
    def delKeys(c: String): String =
      s"""list_distinct(list_concat([$c],
         |    list_transform(range(1, length($c) + 1),
         |      i -> substr($c, 1, i - 1) || substr($c, i + 1))))""".stripMargin
    s"""WITH vocab AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
       |  GROUP BY term
       |),
       |vkeys AS (
       |  SELECT term, freq, unnest(${delKeys("term")}) AS key FROM vocab
       |),
       |ikeys AS (
       |  SELECT input_term, unnest(${delKeys("input_term")}) AS key
       |  FROM (VALUES $inVals) t(input_term)
       |),
       |cands AS (
       |  SELECT DISTINCT input_term, term, freq
       |  FROM vkeys JOIN ikeys USING (key)
       |),
       |scored AS (
       |  SELECT input_term, term, freq,
       |    CAST(levenshtein(input_term, term) AS BIGINT) AS dist
       |  FROM cands
       |),
       |ranked AS (
       |  SELECT input_term, term, freq, dist, row_number() OVER (
       |    PARTITION BY input_term
       |    ORDER BY dist ASC, freq DESC, term ASC) AS r
       |  FROM scored WHERE dist <= 1
       |)
       |SELECT input_term, CAST(r AS BIGINT) AS "rank", term AS suggestion,
       |  dist, freq
       |FROM ranked WHERE r <= 3""".stripMargin
  }

  /** Mirror of DslQueries.SuggestPhraseBody: per-slot deletion-1
    * candidates over the field-derived vocabulary (the dslSuggest
    * device), slot candidates crossed, bigram-LM rescoring, the
    * operator's all-integer ranking key — OracleText.suggestPhrase's
    * chain restricted to the body's single two-slot text (no query_id
    * in the response).
    */
  val dslSuggestPhrase: String = {
    def delKeys(c: String): String =
      s"""list_distinct(list_concat([$c],
         |    list_transform(range(1, length($c) + 1),
         |      i -> substr($c, 1, i - 1) || substr($c, i + 1))))""".stripMargin
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |),
       |vocab AS (
       |  SELECT term FROM (
       |    SELECT unnest(words) AS term FROM docs) t
       |  GROUP BY term
       |),
       |vkeys AS (
       |  SELECT term, unnest(${delKeys("term")}) AS key FROM vocab
       |),
       |ikeys AS (
       |  SELECT input_term, unnest(${delKeys("input_term")}) AS key
       |  FROM (VALUES ('ordr'), ('scann')) t(input_term)
       |),
       |cands AS (
       |  SELECT DISTINCT input_term, term FROM vkeys JOIN ikeys USING (key)
       |),
       |sc AS (
       |  SELECT input_term, term,
       |    CAST(levenshtein(input_term, term) AS BIGINT) AS dist
       |  FROM cands
       |  WHERE levenshtein(input_term, term) <= ${operators.TextOps.SuggestMaxEdits}
       |),
       |pairs AS (
       |  SELECT a.term AS cand_a, a.dist AS dist_a,
       |    b.term AS cand_b, b.dist AS dist_b
       |  FROM sc a, sc b
       |  WHERE a.input_term = 'ordr' AND b.input_term = 'scann'
       |),
       |bgr AS (
       |  SELECT words[CAST(i AS INT)] AS w1, words[CAST(i + 1 AS INT)] AS w2
       |  FROM docs, unnest(range(1, len(words))) t(i)
       |  WHERE len(words) >= 2
       |),
       |bgc AS (SELECT w1, w2, count(*) AS c_bg FROM bgr GROUP BY w1, w2),
       |scored AS (
       |  SELECT p.cand_a, p.cand_b,
       |    CAST(COALESCE(bgc.c_bg, 0) AS BIGINT) AS bg_count,
       |    p.dist_a + p.dist_b AS dist_sum
       |  FROM pairs p
       |  LEFT JOIN bgc ON bgc.w1 = p.cand_a AND bgc.w2 = p.cand_b
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    ORDER BY bg_count DESC, dist_sum ASC, cand_a ASC, cand_b ASC) AS r
       |  FROM scored
       |)
       |SELECT CAST(r AS BIGINT) AS "rank",
       |  cand_a AS suggestion_a, cand_b AS suggestion_b, bg_count, dist_sum
       |FROM ranked WHERE r <= 3""".stripMargin
  }

  /** Mirror of DslQueries.SuggestCompletionBody: the field-derived
    * occurrence-count vocabulary, capped prefix keys, starts-with
    * verification, (freq DESC, term ASC) ranking —
    * OracleText.suggestCompletion's chain on this body's prefix.
    */
  val dslSuggestCompletion: String = {
    val cap = operators.TextOps.CompletionMaxPrefix
    s"""WITH vocab AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
       |  GROUP BY term
       |),
       |pfx AS (
       |  SELECT term, freq, unnest(list_transform(
       |    range(1, least(length(term), $cap) + 1),
       |    i -> substr(term, 1, i))) AS key
       |  FROM vocab
       |),
       |ikeys AS (
       |  SELECT input_prefix, substr(input_prefix, 1, $cap) AS key
       |  FROM (VALUES ('cust')) t(input_prefix)
       |),
       |cands AS (
       |  SELECT input_prefix, term, freq
       |  FROM pfx JOIN ikeys USING (key)
       |  WHERE substr(term, 1, length(input_prefix)) = input_prefix
       |),
       |ranked AS (
       |  SELECT input_prefix, term, freq, row_number() OVER (
       |    PARTITION BY input_prefix
       |    ORDER BY freq DESC, term ASC) AS r
       |  FROM cands
       |)
       |SELECT input_prefix, CAST(r AS BIGINT) AS "rank",
       |  term AS suggestion, freq
       |FROM ranked WHERE r <= 3""".stripMargin
  }

  /** Mirror of DslQueries.MltBody: the tf·idf-ratio seed-term
    * selection (df ≥ 2, top-8 by score DESC, term ASC), then the
    * standard BM25 chain restricted to the chosen terms, seeds
    * excluded from the hits (scored over the FULL corpus incl. seeds —
    * the exclusion is post-scoring, like the engine).
    */
  val dslMlt: String =
    """WITH pairs AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |),
      |seed_tf AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS stf FROM pairs
      |  WHERE doc_id IN (3, 11) GROUP BY term
      |),
      |dfq AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
      |    SELECT DISTINCT doc_id, term FROM pairs) t
      |  GROUP BY term
      |),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |chosen AS (
      |  SELECT term FROM (
      |    SELECT s.term,
      |      CAST(s.stf AS DOUBLE) * ((CAST(nd.n_docs AS DOUBLE) + 1.0) /
      |        (CAST(d.df AS DOUBLE) + 1.0)) AS mlt_score
      |    FROM seed_tf s JOIN dfq d USING (term), nd
      |    WHERE s.stf >= 2 AND d.df >= 2) sel
      |  ORDER BY mlt_score DESC, term ASC LIMIT 8
      |),
      |m_dl AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
      |),
      |m_stats AS (
      |  SELECT count(dl) AS n_docs, sum(dl) AS dl_sum FROM m_dl
      |),
      |m_tc AS (
      |  SELECT doc_id, term, count(*) AS tf FROM pairs
      |  WHERE term IN (SELECT term FROM chosen)
      |  GROUP BY doc_id, term
      |),
      |m_df AS (SELECT term, count(*) AS df FROM m_tc GROUP BY term),
      |m_c2 AS (
      |  SELECT tc.doc_id, tc.tf, l.dl,
      |    CAST(s.dl_sum AS DOUBLE) / CAST(s.n_docs AS DOUBLE) AS avgdl,
      |    (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) /
      |      (CAST(d.df AS DOUBLE) + 0.5) + 1.0 AS idf
      |  FROM m_tc tc JOIN m_df d USING (term)
      |  JOIN m_dl l USING (doc_id), m_stats s
      |),
      |m_scored AS (
      |  SELECT doc_id,
      |    CAST(sum(CAST(floor(idf * ((CAST(tf AS DOUBLE) * 2.2) /
      |      (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |        (CAST(dl AS DOUBLE) / avgdl)))) * 1099511627776.0) AS BIGINT))
      |      AS BIGINT) AS score
      |  FROM m_c2 GROUP BY doc_id
      |),
      |ranked AS (
      |  SELECT doc_id, CAST(score AS DOUBLE) AS score,
      |    row_number() OVER (
      |      ORDER BY CAST(score AS DOUBLE) DESC, doc_id ASC) AS "rank"
      |  FROM m_scored WHERE doc_id NOT IN (3, 11)
      |)
      |SELECT r.doc_id, r.score, r."rank", d.source
      |FROM (SELECT * FROM ranked WHERE "rank" <= 10) r
      |JOIN documents d ON d.doc_id = r.doc_id""".stripMargin

  /** Mirror of DslQueries.FunctionScoreBody: the match score times the
    * two filter weights in function order (CASE identities at 1.0).
    */
  val dslFunctionScore: String =
    s"""WITH ${fieldScoreCtes("m", "text", Seq("spark", "join", "window"))},
       |scored AS (
       |  SELECT m.doc_id,
       |    (CAST(m.score AS DOUBLE) * 1.0) *
       |      ((CASE WHEN d.source IN ('src1', 'src3', 'src5')
       |          THEN 3.0 ELSE 1.0 END)
       |       * (CASE WHEN d.lang = 'en' THEN 2.0 ELSE 1.0 END)) AS s
       |  FROM m_scored m JOIN documents d ON d.doc_id = m.doc_id
       |),
       |ranked AS (
       |  SELECT doc_id, s AS score,
       |    row_number() OVER (ORDER BY s DESC, doc_id ASC) AS "rank"
       |  FROM scored
       |)
       |SELECT r.doc_id, r.score, r."rank", d.lang, d.source
       |FROM (SELECT * FROM ranked WHERE "rank" <= 10) r
       |JOIN documents d ON d.doc_id = r.doc_id""".stripMargin

  /** Mirror of DslQueries.DecayBody: the weight CASE times the two
    * quantized decay factors, numerator arrays generated by THE SAME
    * driver-side quantizer as the Spark plan
    * (QueryDsl.decayNumerators — zero curve drift by construction),
    * each factor one list lookup + one exact 2^-40 division.
    */
  val dslDecay: String = {
    def factor(kind: String, origin: Long, scale: Long, decay: Double): String = {
      val (cw, nums) = graft.plans.QueryDsl.decayNumerators(kind, scale, decay)
      val steps = graft.plans.QueryDsl.DecaySteps
      val arr = nums.mkString("[", ", ", "]")
      val dist = s"greatest(0, abs(CAST(d.n_chars AS BIGINT) - $origin) - 0)"
      s"""CAST(($arr)[CAST(least($dist // $cw, $steps) AS INT) + 1] AS DOUBLE)
         | / 1099511627776.0""".stripMargin
    }
    val g = factor("gauss", 300L, 256L, 0.5)
    val l = factor("linear", 300L, 128L, 0.5)
    s"""WITH ${fieldScoreCtes("m", "text", Seq("spark", "join", "window"))},
       |scored AS (
       |  SELECT m.doc_id,
       |    (CAST(m.score AS DOUBLE) * 1.0) *
       |      (((CASE WHEN d.lang = 'en' THEN 2.0 ELSE 1.0 END)
       |        * ($g))
       |       * ($l)) AS s
       |  FROM m_scored m JOIN documents d ON d.doc_id = m.doc_id
       |),
       |ranked AS (
       |  SELECT doc_id, s AS score,
       |    row_number() OVER (ORDER BY s DESC, doc_id ASC) AS "rank"
       |  FROM scored
       |)
       |SELECT r.doc_id, r.score, r."rank", d.lang, d.n_chars
       |FROM (SELECT * FROM ranked WHERE "rank" <= 10) r
       |JOIN documents d ON d.doc_id = r.doc_id""".stripMargin
  }

  /** Mirror of DslQueries.CompositeBody: the multi-key group in key
    * order, first page of 8.
    */
  val dslComposite: String =
    s"""WITH ${OracleAssets.signalsCte},
       |g AS (
       |  SELECT CAST(ts AS DATE) AS day, event_type AS type,
       |    CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       |  FROM signals GROUP BY 1, 2
       |)
       |SELECT day, type, doc_count, value_sum
       |FROM g ORDER BY day ASC, type ASC LIMIT 8""".stripMargin

  /** Mirror of DslQueries.TopHitsBody: per-bucket window top-2 under
    * (ts DESC, event_id DESC) with the projected fields.
    */
  val dslTopHits: String =
    s"""WITH ${OracleAssets.signalsCte},
       |ranked AS (
       |  SELECT event_type AS by_type, event_id, service_name, value,
       |    row_number() OVER (
       |      PARTITION BY event_type
       |      ORDER BY ts DESC, event_id DESC) AS hit_rank
       |  FROM signals
       |)
       |SELECT by_type, hit_rank, event_id, service_name, value
       |FROM ranked WHERE hit_rank <= 2""".stripMargin

  /** Mirror of DslQueries.RescoreBody: primary BM25 top-30 window,
    * left-joined phrase-gated constant_score bonus (2·2^40 where
    * ` spark join ` occurs adjacent), re-ranked top-10.
    */
  val dslRescore: String =
    s"""WITH ${fieldScoreCtes("m", "text", Seq("spark", "join"))},
       |primary_top AS (
       |  SELECT doc_id, CAST(score AS DOUBLE) * 1.0 AS s FROM m_scored
       |  ORDER BY s DESC, doc_id ASC
       |  LIMIT 30
       |),
       |bonus AS (
       |  SELECT doc_id, 2199023255552.0 AS rs FROM documents
       |  WHERE instr(' ' || text || ' ', ' spark join ') > 0
       |),
       |combined AS (
       |  SELECT p.doc_id, 1.0 * p.s + 1.0 * COALESCE(b.rs, 0.0) AS s
       |  FROM primary_top p LEFT JOIN bonus b USING (doc_id)
       |),
       |ranked AS (
       |  SELECT doc_id, s AS score,
       |    row_number() OVER (ORDER BY s DESC, doc_id ASC) AS "rank"
       |  FROM combined
       |)
       |SELECT r.doc_id, r.score, r."rank", d.source
       |FROM (SELECT * FROM ranked WHERE "rank" <= 10) r
       |JOIN documents d ON d.doc_id = r.doc_id""".stripMargin

  /** Mirror of DslQueries.GeoBody: the identical md5 microdegree
    * derivation (OracleGeo's hex fold), the four inclusive bbox
    * compares, and the exact integer squared-distance ring.
    */
  val dslGeo: String = {
    val h60 =
      """list_reduce(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substring(md5(CAST(event_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, d) -> a * 16 + d)""".stripMargin
    s"""WITH h AS (
       |  SELECT event_id, event_type, value, $h60 AS h FROM events
       |),
       |coords AS (
       |  SELECT event_id, event_type, value,
       |    h % 360000000 AS lon_micro,
       |    (h // 360000000) % 180000000 AS lat_micro
       |  FROM h
       |)
       |SELECT event_id, event_type, value
       |FROM coords
       |WHERE lat_micro >= 90000000 AND lat_micro <= 150000000
       |  AND lon_micro >= 135000000 AND lon_micro <= 225000000
       |  AND ((lon_micro - 180000000) * (lon_micro - 180000000)
       |     + (lat_micro - 90000000) * (lat_micro - 90000000))
       |    < CAST(1600000000000000 AS BIGINT)""".stripMargin
  }

  /** Mirror of DslQueries.GeoGridBody: bbox filter, geotile cell
    * assignment from the SAME x/y generators (GeoOps.geotileXSql with
    * `//`, geotileYSql's literal cutoffs), decimal value mass, and the
    * count-desc/cell-asc top-`size` cut.
    */
  val dslGeoGrid: String = {
    val h60 =
      """list_reduce(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substring(md5(CAST(event_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, d) -> a * 16 + d)""".stripMargin
    val z = 3
    val x = graft.operators.GeoOps.geotileXSql(z, (a, b) => s"($a // $b)")
    val y = graft.operators.GeoOps.geotileYSql(z)
    s"""WITH h AS (
       |  SELECT event_id, value, $h60 AS h FROM events
       |),
       |coords AS (
       |  SELECT value,
       |    h % 360000000 AS lon_micro,
       |    (h // 360000000) % 180000000 AS lat_micro
       |  FROM h
       |),
       |filt AS (
       |  SELECT * FROM coords
       |  WHERE lat_micro >= 90000000 AND lat_micro <= 150000000
       |    AND lon_micro >= 135000000 AND lon_micro <= 225000000
       |),
       |g AS (
       |  SELECT concat('$z/', CAST(CAST($x AS BIGINT) AS VARCHAR), '/',
       |      CAST(CAST($y AS BIGINT) AS VARCHAR)) AS tiles,
       |    CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vmass
       |  FROM filt GROUP BY 1
       |)
       |SELECT tiles, doc_count, vmass FROM (
       |  SELECT *, row_number() OVER (ORDER BY doc_count DESC, tiles ASC) AS rk
       |  FROM g)
       |WHERE rk <= 12""".stripMargin
  }

  /** Mirror of DslQueries.GeohashGridBody — the shared-generator
    * geohash cell (GeoOps.geohashSql with `//`) over the whole index.
    */
  val dslGeohashGrid: String = {
    val h60 =
      """list_reduce(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substring(md5(CAST(event_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT)),
        |      (a, d) -> a * 16 + d)""".stripMargin
    val gh = graft.operators.GeoOps.geohashSql(2, (a, b) => s"($a // $b)")
    s"""WITH h AS (
       |  SELECT event_id, $h60 AS h FROM events
       |),
       |coords AS (
       |  SELECT h % 360000000 AS lon_micro,
       |    (h // 360000000) % 180000000 AS lat_micro
       |  FROM h
       |),
       |g AS (
       |  SELECT $gh AS cells, CAST(count(*) AS BIGINT) AS doc_count
       |  FROM coords GROUP BY 1
       |)
       |SELECT cells, doc_count FROM (
       |  SELECT *, row_number() OVER (ORDER BY doc_count DESC, cells ASC) AS rk
       |  FROM g)
       |WHERE rk <= 15""".stripMargin
  }

  /** Mirror of DslQueries.HighlightBody: the score chain's top-5
    * joined to the field's words, first position = min over query
    * terms of list_position (absent terms filtered), the same
    * ±HlWindow slice with per-word `<em>` wrapping — OracleText's
    * highlight device over the compiled envelope.
    */
  val dslHighlight: String = {
    val hw = operators.TextOps.HlWindow
    s"""WITH ${fieldScoreCtes("m", "text", Seq("merge", "vector"))},
       |ranked AS (
       |  SELECT doc_id, CAST(score AS DOUBLE) * 1.0 AS score,
       |    row_number() OVER (
       |      ORDER BY CAST(score AS DOUBLE) * 1.0 DESC, doc_id ASC) AS "rank"
       |  FROM m_scored
       |),
       |hits AS (
       |  SELECT r.doc_id, r.score, r."rank", d.source,
       |    string_split(d.text, ' ') AS words
       |  FROM (SELECT * FROM ranked WHERE "rank" <= 5) r
       |  JOIN documents d ON d.doc_id = r.doc_id
       |),
       |pos AS (
       |  SELECT *, CAST(list_aggregate(list_filter(
       |    list_transform(['merge', 'vector'], t -> list_position(words, t)),
       |    p -> p IS NOT NULL), 'min') AS BIGINT) AS first_pos
       |  FROM hits
       |),
       |fr AS (
       |  SELECT *, greatest(CAST(1 AS BIGINT), first_pos - $hw) AS frag_start
       |  FROM pos
       |)
       |SELECT doc_id, score, "rank", source, first_pos, frag_start,
       |  array_to_string(list_transform(
       |    list_slice(words, frag_start, first_pos + $hw),
       |    w -> CASE WHEN list_contains(['merge', 'vector'], w)
       |      THEN '<em>' || w || '</em>' ELSE w END), ' ') AS fragment
       |FROM fr""".stripMargin
  }

  /** Mirror of DslQueries.HybridBody: exact-cosine top-20 ranks FULL
    * OUTER the BM25 top-20 ranks, fused by integer-grid reciprocal
    * rank (`2^40 // (60 + rank)`, exact BIGINT arithmetic), top-10
    * under (rrf_score DESC, doc_id ASC) with the hit fields joined
    * back. The id spaces align (vec_id ≡ doc_id), so the hybrid
    * index's text statistics equal the documents table's.
    */
  val dslHybrid: String = {
    val qv = DslQueries.KnnVector
      .map(d => s"CAST($d AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH ${fieldScoreCtes("h", "text", Seq("spark", "join", "window"))},
       |qk AS (SELECT $qv AS v),
       |vec_top AS (
       |  SELECT vec_id AS doc_id,
       |    ${dot("embedding", "qk.v")} / (sqrt(${dot("embedding", "embedding")})
       |      * sqrt(${dot("qk.v", "qk.v")})) AS score
       |  FROM embeddings, qk
       |  ORDER BY score DESC, vec_id ASC
       |  LIMIT 20
       |),
       |vecr AS (
       |  SELECT doc_id, row_number() OVER (
       |    ORDER BY score DESC, doc_id ASC) AS vec_rank
       |  FROM vec_top
       |),
       |lex_top AS (
       |  SELECT doc_id, CAST(score AS DOUBLE) * 1.0 AS s FROM h_scored
       |  ORDER BY s DESC, doc_id ASC
       |  LIMIT 20
       |),
       |lexr AS (
       |  SELECT doc_id, row_number() OVER (
       |    ORDER BY s DESC, doc_id ASC) AS lex_rank
       |  FROM lex_top
       |),
       |fused AS (
       |  SELECT doc_id, lex_rank, vec_rank,
       |    (COALESCE(CAST(1099511627776 AS BIGINT) // (60 + lex_rank),
       |       CAST(0 AS BIGINT))
       |     + COALESCE(CAST(1099511627776 AS BIGINT) // (60 + vec_rank),
       |       CAST(0 AS BIGINT))) AS rrf_score
       |  FROM lexr FULL OUTER JOIN vecr USING (doc_id)
       |),
       |cut AS (
       |  SELECT * FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
       |),
       |ranked AS (
       |  SELECT doc_id, lex_rank, vec_rank, rrf_score, row_number() OVER (
       |    ORDER BY rrf_score DESC, doc_id ASC) AS "rank"
       |  FROM cut
       |)
       |SELECT r.doc_id, r.lex_rank, r.vec_rank, r.rrf_score, r."rank",
       |       d.lang, d.source
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id""".stripMargin
  }

  /** Mirror of DslQueries.HybridApproxBody: [[dslHybrid]] with the
    * vec_top CTE swapped for the AUTO-SIZED trained-IVF candidate
    * walk (OracleVectors.knnCandidateWalkAuto at k=20 — the knn
    * clause's `k`, which is also the rank window) — the lex tower,
    * fusion, cut, and field join are byte-identical to the exact
    * twin's.
    */
  val dslHybridApprox: String = {
    val walk = OracleVectors.knnCandidateWalkAuto(
      DslQueries.KnnVector, 20, DslQueries.KnnNumCandidates)
    s"""WITH ${fieldScoreCtes("h", "text", Seq("spark", "join", "window"))},
       |vec_top AS (
       |  SELECT vec_id AS doc_id, score FROM ($walk)
       |),
       |vecr AS (
       |  SELECT doc_id, row_number() OVER (
       |    ORDER BY score DESC, doc_id ASC) AS vec_rank
       |  FROM vec_top
       |),
       |lex_top AS (
       |  SELECT doc_id, CAST(score AS DOUBLE) * 1.0 AS s FROM h_scored
       |  ORDER BY s DESC, doc_id ASC
       |  LIMIT 20
       |),
       |lexr AS (
       |  SELECT doc_id, row_number() OVER (
       |    ORDER BY s DESC, doc_id ASC) AS lex_rank
       |  FROM lex_top
       |),
       |fused AS (
       |  SELECT doc_id, lex_rank, vec_rank,
       |    (COALESCE(CAST(1099511627776 AS BIGINT) // (60 + lex_rank),
       |       CAST(0 AS BIGINT))
       |     + COALESCE(CAST(1099511627776 AS BIGINT) // (60 + vec_rank),
       |       CAST(0 AS BIGINT))) AS rrf_score
       |  FROM lexr FULL OUTER JOIN vecr USING (doc_id)
       |),
       |cut AS (
       |  SELECT * FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
       |),
       |ranked AS (
       |  SELECT doc_id, lex_rank, vec_rank, rrf_score, row_number() OVER (
       |    ORDER BY rrf_score DESC, doc_id ASC) AS "rank"
       |  FROM cut
       |)
       |SELECT r.doc_id, r.lex_rank, r.vec_rank, r.rrf_score, r."rank",
       |       d.lang, d.source
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id""".stripMargin
  }

  /** In-order dot fold (OracleVectors' device: `list_reduce` seeding
    * the first element ≡ Spark `aggregate` seeding 0.0).
    */
  private def dot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${VectorOps.Dim + 1}),
       |  i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)),
       |  (acc, v) -> acc + v)""".stripMargin

  /** Mirror of DslQueries.KnnBody: pre-filtered exact cosine top-k,
    * the identical literal vector text on both engines.
    */
  val dslKnn: String = {
    val qv = DslQueries.KnnVector
      .map(d => s"CAST($d AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH q AS (SELECT $qv AS v)
       |SELECT vec_id,
       |  ${dot("embedding", "q.v")} / (sqrt(${dot("embedding", "embedding")})
       |    * sqrt(${dot("q.v", "q.v")})) AS score
       |FROM embeddings, q
       |WHERE label = ${DslQueries.KnnLabel}
       |ORDER BY score DESC, vec_id ASC
       |LIMIT 10""".stripMargin
  }

  /** Mirror of DslQueries.KnnApproxBody — the compiled approximate knn
    * (`num_candidates`) via the AUTO-SIZED trained-IVF candidate walk
    * (OracleVectors.knnCandidateWalkAuto carries the whole index
    * mirror, dials from count(*)).
    */
  val dslKnnApprox: String = OracleVectors.knnCandidateWalkAuto(
    DslQueries.KnnVector, 10, DslQueries.KnnNumCandidates)

  /** Mirror of DslQueries.dslKnnApproxRecall: recall@10 of the
    * approximate response against the exact response of the same
    * request — both sides computed in SQL.
    */
  val dslKnnApproxRecall: String = {
    val qv = DslQueries.KnnVector
      .map(d => s"CAST($d AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH exact AS (
       |  SELECT vec_id FROM (
       |    WITH q AS (SELECT $qv AS v)
       |    SELECT vec_id,
       |      ${dot("embedding", "q.v")} / (sqrt(${dot("embedding", "embedding")})
       |        * sqrt(${dot("q.v", "q.v")})) AS score
       |    FROM embeddings, q
       |    ORDER BY score DESC, vec_id ASC
       |    LIMIT 10)
       |),
       |approx AS (SELECT vec_id FROM ($dslKnnApprox))
       |SELECT CAST(count(a.vec_id) AS DOUBLE) / 10.0 AS recall_at_k,
       |  count(*) AS n_exact
       |FROM exact e LEFT JOIN approx a USING (vec_id)""".stripMargin
  }
}
