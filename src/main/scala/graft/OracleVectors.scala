package graft

import graft.operators.VectorOps

/** DuckDB oracle SQL for [[graft.operators.VectorOps]]. See the float
  * determinism contract in that file's Scaladoc: in-order double folds
  * (`list_reduce` ≡ Spark `aggregate` with 0.0 seed), float→double→
  * decimal casts, decimal group sums.
  */
object OracleVectors {

  private val dim = VectorOps.Dim
  private val k = VectorOps.K
  private val qm = VectorOps.QueryMod

  /** In-order dot-product fold of two list columns (1-based indices). */
  private def dot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |  i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)),
       |  (acc, v) -> acc + v)""".stripMargin

  private val baseCte: String =
    s"""base AS (
       |  SELECT vec_id, label, embedding,
       |    ${dot("embedding", "embedding")} AS nrm
       |  FROM embeddings
       |)""".stripMargin

  private val queriesCte: String =
    s"""q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE vec_id % $qm = 0
       |)""".stripMargin

  val knnExact: String =
    s"""WITH $baseCte, $queriesCte,
       |sims AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id,
       |    ${dot("b.embedding", "q.qv")} / (sqrt(b.nrm) * sqrt(q.qnrm)) AS sim
       |  FROM base b, q WHERE b.vec_id <> q.query_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin

  /** Mirror of VectorOps.knnFiltered: knnExact with the label
    * predicate joined into the scoring relation (pre-filter — the
    * rank runs over filtered pairs only).
    */
  val knnFiltered: String =
    s"""WITH $baseCte,
       |qf AS (
       |  SELECT vec_id AS query_id, label AS qlabel, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE vec_id % $qm = 0
       |),
       |sims AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id,
       |    ${dot("b.embedding", "q.qv")} / (sqrt(b.nrm) * sqrt(q.qnrm)) AS sim
       |  FROM base b, qf q
       |  WHERE b.vec_id <> q.query_id AND b.label = q.qlabel
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin

  /** Mirror of VectorOps.hardNegatives: one scored relation split by
    * the label predicate — negatives ranked (sim DESC, neighbor_id),
    * the positive reference a per-query max, the semi-hard CASE over
    * the same literals.
    */
  val hardNegatives: String =
    s"""WITH $baseCte,
       |qf AS (
       |  SELECT vec_id AS query_id, label AS qlabel, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE vec_id % $qm = 0
       |),
       |scored AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id, b.label, q.qlabel,
       |    ${dot("b.embedding", "q.qv")} / (sqrt(b.nrm) * sqrt(q.qnrm)) AS sim
       |  FROM base b, qf q WHERE b.vec_id <> q.query_id
       |),
       |negs AS (
       |  SELECT query_id, neighbor_id, sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM scored WHERE label <> qlabel
       |),
       |pos AS (
       |  SELECT query_id, max(sim) AS pos_sim
       |  FROM scored WHERE label = qlabel GROUP BY query_id
       |)
       |SELECT n.query_id, n.neighbor_id, n."rank", n.sim, p.pos_sim,
       |  CAST(CASE WHEN p.pos_sim IS NOT NULL AND n.sim < p.pos_sim
       |    AND n.sim + ${VectorOps.HnMargin} > p.pos_sim
       |    THEN 1 ELSE 0 END AS BIGINT) AS semi_hard
       |FROM negs n LEFT JOIN pos p USING (query_id)
       |WHERE n."rank" <= $k""".stripMargin

  /** Mirror of VectorOps.silhouette: the trained-codebook chain plus
    * one more means→vector step, per-vector top-2 centroids by
    * (sim DESC, c_label ASC), the same grid CASE, BIGINT grid sums,
    * one edge division.
    */
  def silhouette(nlist: Int = VectorOps.NList): String = {
    val g = VectorOps.SilGrid
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |cvf AS (
       |  SELECT label AS c_label,
       |    list(CAST(centroid_sum AS DOUBLE) / $scale / n ORDER BY pos) AS centroid
       |  FROM cent GROUP BY label
       |),
       |cnf AS (
       |  SELECT c_label, centroid, ${dot("centroid", "centroid")} AS cnrm FROM cvf
       |),
       |csims AS (
       |  SELECT b.vec_id, c.c_label,
       |    ${dot("b.embedding", "c.centroid")} / (sqrt(b.nrm) * sqrt(c.cnrm)) AS sim
       |  FROM base b, cnf c
       |),
       |rk AS (
       |  SELECT vec_id, c_label, sim, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY sim DESC, c_label ASC) AS rn
       |  FROM csims
       |),
       |pair AS (
       |  SELECT a.vec_id, a.c_label AS cluster, a.sim AS sim1, b.sim AS sim2
       |  FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2
       |),
       |sgrid AS (
       |  SELECT cluster,
       |    CAST(CASE WHEN greatest(1.0 - sim1, 1.0 - sim2) = 0.0 THEN 0
       |      ELSE floor((sim1 - sim2) / greatest(1.0 - sim1, 1.0 - sim2)
       |        * CAST($g AS DOUBLE)) END AS BIGINT) AS s_grid
       |  FROM pair
       |)
       |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(s_grid) AS BIGINT) AS s_grid_sum,
       |  CAST(sum(s_grid) AS DOUBLE) /
       |    (CAST(count(*) AS DOUBLE) * CAST($g AS DOUBLE)) AS mean_silhouette
       |FROM sgrid GROUP BY cluster""".stripMargin
  }

  private def codeCte(numPlanes: Int): String =
    s"""coded AS (
       |  SELECT vec_id, embedding, nrm,
       |    array_to_string(list_transform(${VectorOps.planesLitDuck(numPlanes)}, p ->
       |      CASE WHEN list_reduce(list_transform(range(1, ${dim + 1}),
       |          i -> p[CAST(i AS INT)] * CAST(embedding[CAST(i AS INT)] AS DOUBLE)),
       |          (acc, v) -> acc + v) > 0
       |      THEN '1' ELSE '0' END), '') AS code
       |  FROM base
       |)""".stripMargin

  /** Mirror of VectorOps.probeKeysExpr: the key plus its Hamming-1
    * variants (flips are distinct from the original — plain concat).
    */
  private def probeKeys(bandBits: Int, probeBits: Int): String =
    if (probeBits == 0) "[band_key]"
    else s"""list_concat([band_key], list_transform(range(1, ${bandBits + 1}), i ->
            |  substring(band_key, 1, CAST(i - 1 AS INT)) ||
            |  (CASE WHEN substring(band_key, CAST(i AS INT), 1) = '1'
            |        THEN '0' ELSE '1' END) ||
            |  substring(band_key, CAST(i + 1 AS INT), CAST($bandBits - i AS INT))))""".stripMargin

  def knnLsh(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits, probeBits: Int = 0): String = {
    val qKeys = probeKeys(bandBits, probeBits)
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |bands AS (
       |  SELECT vec_id,
       |    b.b AS band_idx,
       |    substring(code, CAST(b.b * $bandBits + 1 AS INT), $bandBits) AS band_key
       |  FROM coded CROSS JOIN (SELECT unnest(range(${numPlanes / bandBits})) AS b) b
       |),
       |qprobes AS (
       |  SELECT vec_id, band_idx, unnest($qKeys) AS band_key
       |  FROM bands WHERE vec_id % $qm = 0
       |),
       |candidates AS (
       |  SELECT DISTINCT qb.vec_id AS query_id, db.vec_id AS neighbor_id
       |  FROM bands db JOIN qprobes qb USING (band_idx, band_key)
       |  WHERE db.vec_id <> qb.vec_id
       |),
       |sims AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${dot("db.embedding", "qb.embedding")} / (sqrt(db.nrm) * sqrt(qb.nrm)) AS sim
       |  FROM candidates c
       |  JOIN base db ON db.vec_id = c.neighbor_id
       |  JOIN base qb ON qb.vec_id = c.query_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin
  }

  /** Mirror of VectorOps.autoBandBits as a 1-row CTE: the integer
    * bit-length form of ⌈log2(N·nBands/c)⌉ — `length(bin(x-1))`
    * (minimal binary string), clamped to [BandBits, MaxAutoBandBits].
    * No libm log enters either engine.
    */
  private lazy val bandDialCte: String = {
    val nb = VectorOps.NumBands
    val c = VectorOps.LshCandPerVec
    s"""bdial AS (
       |  SELECT LEAST(${VectorOps.MaxAutoBandBits},
       |    GREATEST(${VectorOps.BandBits},
       |      CASE WHEN x <= 1 THEN 1
       |           ELSE CAST(length(bin(x - 1)) AS BIGINT) END)) AS bb
       |  FROM (SELECT GREATEST(CAST(1 AS BIGINT),
       |      (count(*) * $nb) // $c) AS x FROM embeddings) t
       |)""".stripMargin
  }

  /** Mirror of VectorOps.lshAutoDial. */
  lazy val lshAutoDial: String =
    s"""WITH $bandDialCte
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vectors,
       |  bb AS band_bits, ${VectorOps.NumBands} * bb AS num_planes
       |FROM bdial""".stripMargin

  /** Mirror of VectorOps.knnLshAuto: the 192-plane code (prefix-stable
    * plane generator, so the first 8·bb bits equal the 8·bb-plane
    * code), bands sliced at the DERIVED width, Hamming-1 multi-probe
    * at that width (probeKeys with the scalar bb), then knnLsh's
    * candidate join / exact-cosine chain verbatim.
    */
  lazy val knnLshAuto: String =
    s"""WITH $baseCte, $bandDialCte,
       |${codeCte(VectorOps.NumBands * VectorOps.MaxAutoBandBits)},
       |bands AS (
       |  SELECT vec_id,
       |    b.b AS band_idx,
       |    substring(code, CAST(b.b * d.bb + 1 AS INT), CAST(d.bb AS INT)) AS band_key
       |  FROM coded
       |  CROSS JOIN bdial d
       |  CROSS JOIN (SELECT unnest(range(${VectorOps.NumBands})) AS b) b
       |),
       |qprobes AS (
       |  SELECT vec_id, band_idx, unnest(
       |    list_concat([band_key], list_transform(range(1, d.bb + 1), i ->
       |      substring(band_key, 1, CAST(i - 1 AS INT)) ||
       |      (CASE WHEN substring(band_key, CAST(i AS INT), 1) = '1'
       |            THEN '0' ELSE '1' END) ||
       |      substring(band_key, CAST(i + 1 AS INT), CAST(d.bb - i AS INT))))
       |  ) AS band_key
       |  FROM bands, bdial d WHERE vec_id % $qm = 0
       |),
       |candidates AS (
       |  SELECT DISTINCT qb.vec_id AS query_id, db.vec_id AS neighbor_id
       |  FROM bands db JOIN qprobes qb USING (band_idx, band_key)
       |  WHERE db.vec_id <> qb.vec_id
       |),
       |sims AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${dot("db.embedding", "qb.embedding")} / (sqrt(db.nrm) * sqrt(qb.nrm)) AS sim
       |  FROM candidates c
       |  JOIN base db ON db.vec_id = c.neighbor_id
       |  JOIN base qb ON qb.vec_id = c.query_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin

  /** Mirror of VectorOps.lshAutoRecall. */
  lazy val lshAutoRecall: String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN ($knnLshAuto) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** Mirror of VectorOps.dedupEmbedding: all-vector band self-join,
    * exact cosine on candidates, thresholded.
    */
  def dedupEmbedding(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String =
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |bands AS (
       |  SELECT vec_id,
       |    b.b AS band_idx,
       |    substring(code, CAST(b.b * $bandBits + 1 AS INT), $bandBits) AS band_key
       |  FROM coded CROSS JOIN (SELECT unnest(range(${numPlanes / bandBits})) AS b) b
       |),
       |candidates AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.vec_id < b.vec_id
       |)
       |SELECT c.vec_a, c.vec_b,
       |  ${dot("ba.embedding", "bb.embedding")} / (sqrt(ba.nrm) * sqrt(bb.nrm)) AS sim
       |FROM candidates c
       |JOIN base ba ON ba.vec_id = c.vec_a
       |JOIN base bb ON bb.vec_id = c.vec_b
       |WHERE ${dot("ba.embedding", "bb.embedding")} / (sqrt(ba.nrm) * sqrt(bb.nrm))
       |      >= ${VectorOps.DupThreshold}""".stripMargin

  /** Mirror of VectorOps.embDedupEval: sampled all-pairs cosine truth
    * (composed dot/sqrt ≡ the fused cosine_sim, the standing
    * contract), the banded-candidate mirror filtered to the sample,
    * confusion counts.
    */
  def embDedupEval(): String = {
    val m = VectorOps.DedupEvalMod
    s"""WITH $baseCte,
       |samp AS (SELECT vec_id, embedding, nrm FROM base WHERE vec_id % $m = 0),
       |truth AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, CAST(1 AS BIGINT) AS t
       |  FROM samp a JOIN samp b ON a.vec_id < b.vec_id
       |  WHERE ${dot("a.embedding", "b.embedding")} / (sqrt(a.nrm) * sqrt(b.nrm))
       |        >= ${VectorOps.DupThreshold}
       |),
       |pred AS (
       |  SELECT vec_a, vec_b, CAST(1 AS BIGINT) AS p
       |  FROM (${dedupEmbedding()})
       |  WHERE vec_a % $m = 0 AND vec_b % $m = 0
       |),
       |conf AS (
       |  SELECT
       |    CAST(sum(COALESCE(t, 0)) AS BIGINT) AS n_true_pairs,
       |    CAST(sum(COALESCE(p, 0)) AS BIGINT) AS n_cand_pairs,
       |    CAST(sum(COALESCE(t, 0) * COALESCE(p, 0)) AS BIGINT) AS n_tp
       |  FROM truth FULL OUTER JOIN pred USING (vec_a, vec_b)
       |)
       |SELECT n_true_pairs, n_cand_pairs, n_tp,
       |  CASE WHEN n_cand_pairs > 0
       |    THEN CAST(n_tp AS DOUBLE) / CAST(n_cand_pairs AS DOUBLE) END
       |    AS precision,
       |  CASE WHEN n_true_pairs > 0
       |    THEN CAST(n_tp AS DOUBLE) / CAST(n_true_pairs AS DOUBLE) END
       |    AS recall
       |FROM conf""".stripMargin
  }

  /** Mirror of VectorOps.embDecontaminate: corpus bands join the
    * eval side's Hamming-1-expanded probes, exact cosine on
    * candidates, per-corpus-vector hit aggregate, left join so
    * clean vectors carry (0, NULL, keep=true).
    */
  def embDecontaminate(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String = {
    val em = VectorOps.EvalMod
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |bands AS (
       |  SELECT vec_id,
       |    b.b AS band_idx,
       |    substring(code, CAST(b.b * $bandBits + 1 AS INT), $bandBits) AS band_key
       |  FROM coded CROSS JOIN (SELECT unnest(range(${numPlanes / bandBits})) AS b) b
       |),
       |eprobes AS (
       |  SELECT vec_id AS eval_id, band_idx,
       |    unnest(${probeKeys(bandBits, 1)}) AS band_key
       |  FROM bands WHERE vec_id % $em = 0
       |),
       |candidates AS (
       |  SELECT DISTINCT c.vec_id, e.eval_id
       |  FROM bands c JOIN eprobes e USING (band_idx, band_key)
       |  WHERE c.vec_id % $em <> 0
       |),
       |sims AS (
       |  SELECT cd.vec_id,
       |    ${dot("bc.embedding", "be.embedding")} / (sqrt(bc.nrm) * sqrt(be.nrm)) AS sim
       |  FROM candidates cd
       |  JOIN base bc ON bc.vec_id = cd.vec_id
       |  JOIN base be ON be.vec_id = cd.eval_id
       |),
       |hits AS (
       |  SELECT vec_id, count(*) AS n_hits, max(sim) AS max_sim
       |  FROM sims WHERE sim >= ${VectorOps.DupThreshold} GROUP BY vec_id
       |)
       |SELECT b.vec_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  h.max_sim, COALESCE(h.n_hits, 0) = 0 AS keep
       |FROM base b LEFT JOIN hits h USING (vec_id)
       |WHERE b.vec_id % $em <> 0""".stripMargin
  }

  /** Mirror of VectorOps.dedupEmbeddingClusters: the same CcRounds
    * unrolled min-label propagation (shared with OracleText's
    * dedupClusters) over the embedding near-dup pair graph.
    */
  def dedupEmbeddingClusters(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String = {
    val rounds = (1 to graft.operators.TextOps.CcRounds).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS (
         |  SELECT n.node,
         |    least(n.label, COALESCE(m.nbr, n.label)) AS label
         |  FROM $prev n LEFT JOIN (
         |    SELECT e.vec_a AS node, min(x.label) AS nbr
         |    FROM edges e JOIN $prev x ON x.node = e.vec_b
         |    GROUP BY e.vec_a
         |  ) m USING (node)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT vec_a, vec_b FROM (${dedupEmbedding(numPlanes, bandBits)}) p
       |),
       |edges AS (
       |  SELECT vec_a, vec_b FROM pairs
       |  UNION ALL
       |  SELECT vec_b AS vec_a, vec_a AS vec_b FROM pairs
       |),
       |nodes AS (SELECT DISTINCT vec_a AS node FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$rounds
       |SELECT node AS vec_id, label AS cluster_id,
       |  count(*) OVER (PARTITION BY label) AS cluster_size
       |FROM l${graft.operators.TextOps.CcRounds}""".stripMargin
  }

  /** Recall@K of IVF vs exact, composing the two query oracles (the
    * ivfRecall mirror; same shape as [[lshRecall]]).
    */
  /** Mirror of VectorOps.ivfRecallCurve: the labeled union of the
    * per-nprobe recall mirrors.
    */
  def ivfRecallCurve(): String =
    VectorOps.RecallCurveProbes.map { np =>
      s"""SELECT CAST($np AS BIGINT) AS nprobe, query_id, recall_at_k, n_exact
         |FROM (${ivfRecall(nprobe = np)})""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** The auto-sizing dial CTEs (mirror of VectorOps.autoDials): nlist
    * = max(round(sqrt(N)), NList), training-sample stride from the
    * TrainPerCell budget, nprobe = max(round(sqrt(nlist)), NProbe).
    * round(sqrt(·)) agrees across engines: IEEE-correct sqrt, and
    * half-up == half-away-from-zero for positives (an exact .5 would
    * need sqrt(int) = x.5, impossible).
    */
  private lazy val dialCtes: String =
    s"""dial AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    GREATEST(CAST(${VectorOps.NList} AS BIGINT),
       |      CAST(round(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)) AS nlist
       |  FROM embeddings
       |),
       |dial2 AS (
       |  SELECT n, nlist,
       |    GREATEST(CAST(1 AS BIGINT),
       |      n // (${VectorOps.TrainPerCell} * nlist)) AS m,
       |    GREATEST(CAST(${VectorOps.NProbe} AS BIGINT),
       |      CAST(round(sqrt(CAST(nlist AS DOUBLE))) AS BIGINT)) AS np
       |  FROM dial
       |)""".stripMargin

  /** Mirror of VectorOps.ivfAutoDial — the 1-row dial gauge. */
  lazy val ivfAutoDial: String =
    s"""WITH $dialCtes
       |SELECT n AS n_vectors, nlist, m AS sample_mod, np AS nprobe
       |FROM dial2""".stripMargin

  /** Mirror of VectorOps.centroidVectorsAuto's training loop: seed
    * means over the id-stride SAMPLE grouped by the round-robin id
    * group, Lloyd re-assignment rounds over the sample only, final
    * full-corpus cranked from centroidSimsCtes — the centroidsCte
    * chain with the dial scalars in place of literals.
    */
  private lazy val centroidsAutoCte: String = {
    val seed = s"""cent0 AS (
                  |${meansSql("samp e, dial2 dl", "(e.vec_id // dl.m) % dl.nlist")}
                  |)""".stripMargin
    val rounds = (1 to VectorOps.LloydRounds).map { r =>
      val p = r - 1
      s"""cv$p AS (
         |  SELECT label AS c_label,
         |    list(CAST(centroid_sum AS DOUBLE) / $scale / n ORDER BY pos) AS centroid
         |  FROM cent$p GROUP BY label
         |),
         |cn$p AS (
         |  SELECT c_label, centroid, ${dot("centroid", "centroid")} AS cnrm FROM cv$p
         |),
         |asg$r AS (
         |  SELECT b.vec_id, c.c_label,
         |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |      ${dot("b.embedding", "c.centroid")} / (sqrt(b.nrm) * sqrt(c.cnrm)) DESC,
         |      c.c_label ASC) AS rn
         |  FROM samp b, cn$p c
         |),
         |cent$r AS (
         |${meansSql(s"asg$r a JOIN embeddings e ON e.vec_id = a.vec_id AND a.rn = 1", "a.c_label")}
         |)""".stripMargin
    }.mkString(",\n")
    s"""samp AS (
       |  SELECT b.* FROM base b, dial2 d WHERE b.vec_id % d.m = 0
       |),
       |$seed,
       |$rounds,
       |cent AS (SELECT * FROM cent${VectorOps.LloydRounds})""".stripMargin
  }

  /** Mirror of VectorOps.knnIvfAuto: the auto-trained codebook, the
    * full-corpus assignment, dial-width probes, candidate equi-join,
    * exact cosine top-k — knnIvf's chain on the derived dials.
    */
  lazy val knnIvfAuto: String = knnIvfAutoQueries(c => s"$c % $qm = 0")

  /** [[knnIvfAuto]] over an arbitrary query-id predicate (given the
    * qualified vec_id column ref) — the fixed-|Q| serving fixture's
    * mirror seam.
    */
  def knnIvfAutoQueries(qpred: String => String): String =
    s"""WITH $baseCte, $dialCtes,
       |$centroidsAutoCte,
       |$centroidSimsCtes,
       |assignments AS (
       |  SELECT vec_id AS neighbor_id, c_label AS assigned_label
       |  FROM cranked WHERE rn = 1
       |),
       |probes AS (
       |  SELECT c.vec_id AS query_id, c.c_label AS assigned_label
       |  FROM cranked c, dial2 d
       |  WHERE ${qpred("c.vec_id")} AND c.rn <= d.np
       |),
       |candidates AS (
       |  SELECT p.query_id, a.neighbor_id
       |  FROM probes p JOIN assignments a USING (assigned_label)
       |  WHERE a.neighbor_id <> p.query_id
       |),
       |qset AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE ${qpred("vec_id")}
       |),
       |sims AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${dot("nb.embedding", "q.qv")} / (sqrt(nb.nrm) * sqrt(q.qnrm)) AS sim
       |  FROM candidates c
       |  JOIN base nb ON nb.vec_id = c.neighbor_id
       |  JOIN qset q ON q.query_id = c.query_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin

  /** Mirror of VectorOps.ivfAutoRecall. */
  lazy val ivfAutoRecall: String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN ($knnIvfAuto) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  def ivfRecall(nlist: Int = VectorOps.NList,
      nprobe: Int = VectorOps.NProbe): String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN (${knnIvf(nlist, nprobe)}) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** Mirror of VectorOps.centroids: values scaled by 2^54 (every float
    * with |x| ≥ 2^-31 has ulp ≥ 2^-54) so the decimal cast is of an
    * exact integer — no rounding-mode divergence between engines;
    * sub-2^-31 magnitudes flushed to zero.
    */
  private val scale = VectorOps.Scale
  private val flush = VectorOps.Flush

  /** Decimal-exact (grp, pos) sums of embedding components for a
    * relation exposing (vec_id-joinable) group assignments — the
    * meansBy mirror, shared by the seed round and every Lloyd round.
    */
  private def meansSql(fromJoin: String, grp: String): String =
    s"""  SELECT $grp AS label, p.pos AS pos,
       |    sum(CAST(CASE WHEN abs(CAST(e.embedding[CAST(p.pos + 1 AS INT)] AS DOUBLE)) < $flush
       |             THEN 0.0
       |             ELSE CAST(e.embedding[CAST(p.pos + 1 AS INT)] AS DOUBLE)
       |             END * $scale AS DECIMAL(38,0))) AS centroid_sum,
       |    count(*) AS n
       |  FROM $fromJoin
       |  CROSS JOIN (SELECT unnest(range($dim)) AS pos) p
       |  GROUP BY $grp, p.pos""".stripMargin

  /** Mirror of VectorOps.centroidsRaw's Lloyd training loop, UNROLLED
    * (the pagerank device): cent0 is the label-seeded partition's
    * means; each round r builds the codebook vectors cv/cn from
    * cent(r-1), assigns every vector to its nearest centroid (cosine,
    * sim DESC / c_label ASC tiebreak — identical to the Spark window),
    * and recomputes the decimal-exact means as cent(r). The final
    * round is re-exposed as `cent` so the downstream CTEs
    * (centroidSimsCtes et al.) are unchanged.
    */
  def centroidsCte(nlist: Int = VectorOps.NList): String = {
    val seed = s"""cent0 AS (
                  |${meansSql("embeddings e", s"e.label % $nlist")}
                  |)""".stripMargin
    val rounds = (1 to VectorOps.LloydRounds).map { r =>
      val p = r - 1
      s"""cv$p AS (
         |  SELECT label AS c_label,
         |    list(CAST(centroid_sum AS DOUBLE) / $scale / n ORDER BY pos) AS centroid
         |  FROM cent$p GROUP BY label
         |),
         |cn$p AS (
         |  SELECT c_label, centroid, ${dot("centroid", "centroid")} AS cnrm FROM cv$p
         |),
         |asg$r AS (
         |  SELECT b.vec_id, c.c_label,
         |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |      ${dot("b.embedding", "c.centroid")} / (sqrt(b.nrm) * sqrt(c.cnrm)) DESC,
         |      c.c_label ASC) AS rn
         |  FROM base b, cn$p c
         |),
         |cent$r AS (
         |${meansSql(s"asg$r a JOIN embeddings e ON e.vec_id = a.vec_id AND a.rn = 1", "a.c_label")}
         |)""".stripMargin
    }.mkString(",\n")
    s"""$seed,
       |$rounds,
       |cent AS (SELECT * FROM cent${VectorOps.LloydRounds})""".stripMargin
  }

  /** centroid_sum leaves as its exact digit string (see
    * VectorOps.centroids: DECIMAL output rendering is the one
    * engine-divergent type in the driver's compare).
    */
  def centroids(nlist: Int = VectorOps.NList): String =
    s"""WITH $baseCte, ${centroidsCte(nlist)}
       |SELECT label, pos,
       |  CAST(centroid_sum AS VARCHAR) AS centroid_sum, n,
       |  CAST(centroid_sum AS DOUBLE) / $scale / n AS mean
       |FROM cent""".stripMargin

  /** Mirror of VectorOps.knnSq8: per-dim (min, max) codebook, int8
    * codes via the same all-double floor expression (DuckDB floor
    * returns DOUBLE where Spark returns BIGINT — the explicit CAST
    * aligns them), integer-dot approximate ranking, exact cosine
    * re-rank of the Sq8ReRank·K shortlist.
    */
  val knnSq8: String = {
    val rr = VectorOps.Sq8ReRank * k
    s"""WITH $baseCte,
       |st AS (
       |  SELECT u.pos AS pos,
       |    min(CAST(embedding[CAST(u.pos + 1 AS INT)] AS DOUBLE)) AS dmin,
       |    max(CAST(embedding[CAST(u.pos + 1 AS INT)] AS DOUBLE)) AS dmax
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(range($dim)) AS pos) u
       |  GROUP BY u.pos
       |),
       |sa AS (
       |  SELECT list(dmin ORDER BY pos) AS mins, list(dmax ORDER BY pos) AS maxs
       |  FROM st
       |),
       |coded AS (
       |  SELECT b.vec_id, b.embedding, b.nrm,
       |    list_transform(range(1, ${dim + 1}), i ->
       |      CASE WHEN s.maxs[CAST(i AS INT)] > s.mins[CAST(i AS INT)]
       |        THEN CAST(least(floor(((CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)
       |          - s.mins[CAST(i AS INT)])
       |          / (s.maxs[CAST(i AS INT)] - s.mins[CAST(i AS INT)])) * 256.0),
       |          255.0) AS BIGINT)
       |        ELSE 0 END) AS code
       |  FROM base b, sa s
       |),
       |dec AS (
       |  SELECT c.vec_id, c.embedding, c.nrm,
       |    list_transform(range(1, ${dim + 1}), i ->
       |      s.mins[CAST(i AS INT)] + ((CAST(c.code[CAST(i AS INT)] AS DOUBLE) + 0.5)
       |        * (s.maxs[CAST(i AS INT)] - s.mins[CAST(i AS INT)])) / 256.0) AS deq
       |  FROM coded c, sa s
       |),
       |dn AS (
       |  SELECT vec_id, embedding, nrm, deq,
       |    ${dot("deq", "deq")} AS dnrm
       |  FROM dec
       |),
       |qc AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE vec_id % $qm = 0
       |),
       |approx AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    c.embedding, c.nrm, q.qv, q.qnrm,
       |    ${dot("c.deq", "q.qv")} / (sqrt(c.dnrm) * sqrt(q.qnrm)) AS asim
       |  FROM dn c, qc q WHERE c.vec_id <> q.query_id
       |),
       |short AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY asim DESC, neighbor_id ASC) AS arank
       |  FROM approx
       |),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    ${dot("embedding", "qv")} / (sqrt(nrm) * sqrt(qnrm)) AS sim
       |  FROM short WHERE arank <= $rr
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin
  }

  /** Recall@K of SQ8 vs exact, composing the two query oracles. */
  val sq8Recall: String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN ($knnSq8) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** Mirror of VectorOps.knnBq: the 64-plane sign code (the knnLsh
    * code string — char-wise Hamming equals the word-wise popcount of
    * the conv'd halves), approximate Hamming-similarity rank with the
    * id tiebreak, exact cosine re-rank of the BqReRank·K shortlist.
    */
  val knnBq: String = {
    val rr = VectorOps.BqReRank * k
    val d = VectorOps.Dim
    s"""WITH $baseCte, ${codeCte(d)},
       |qc AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm, code AS qcode
       |  FROM coded WHERE vec_id % $qm = 0
       |),
       |approx AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    c.embedding, c.nrm, q.qv, q.qnrm,
       |    CAST($d - len(list_filter(range(1, ${d + 1}), i ->
       |      substring(c.code, CAST(i AS INT), 1) <>
       |      substring(q.qcode, CAST(i AS INT), 1))) AS DOUBLE) AS asim
       |  FROM coded c, qc q WHERE c.vec_id <> q.query_id
       |),
       |short AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY asim DESC, neighbor_id ASC) AS arank
       |  FROM approx
       |),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    ${dot("embedding", "qv")} / (sqrt(nrm) * sqrt(qnrm)) AS sim
       |  FROM short WHERE arank <= $rr
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin
  }

  /** Recall@K of the binary-quantized index vs exact. */
  val bqRecall: String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN ($knnBq) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** Recall@K of LSH vs exact, composing the two query oracles. */
  def lshRecall(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits, probeBits: Int = 0): String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN (${knnLsh(numPlanes, bandBits, probeBits)}) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** Shared: per-vector centroid similarities, ranked. */
  private val centroidSimsCtes: String =
    s"""cvec AS (
       |  SELECT label AS c_label,
       |    array_agg(CAST(centroid_sum AS DOUBLE) / $scale / n ORDER BY pos) AS centroid
       |  FROM cent GROUP BY label
       |),
       |cnorm AS (
       |  SELECT c_label, centroid, ${dot("centroid", "centroid")} AS cnrm FROM cvec
       |),
       |csims AS (
       |  SELECT b.vec_id, b.label, c.c_label,
       |    ${dot("b.embedding", "c.centroid")} / (sqrt(b.nrm) * sqrt(c.cnrm)) AS sim
       |  FROM base b, cnorm c
       |),
       |cranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY sim DESC, c_label ASC) AS rn
       |  FROM csims
       |)""".stripMargin

  /** Mirror of QueryDsl.knnCandidates + the exact re-rank: the
    * compiled approximate `knn` (`num_candidates`) — similarity-
    * ordered cell walk over the trained IVF codebook, cells kept until
    * the running inverted-list total reaches `nc`, exact cosine over
    * the surviving candidates only. The literal query-vector text is
    * shared with the Spark side (exact binary fractions).
    */
  def knnCandidateWalk(qv: Seq[Double], k: Int, nc: Int,
      nlist: Int = VectorOps.NList): String = {
    val qvArr = qv.map(d => s"CAST($d AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |$centroidSimsCtes,
       |assignments AS (
       |  SELECT vec_id AS neighbor_id, c_label AS assigned_label
       |  FROM cranked WHERE rn = 1
       |),
       |sizes AS (
       |  SELECT assigned_label, count(*) AS cnt
       |  FROM assignments GROUP BY assigned_label
       |),
       |qvec AS (SELECT $qvArr AS v),
       |qsims AS (
       |  SELECT c.c_label AS assigned_label,
       |    ${dot("c.centroid", "q.v")} / (sqrt(c.cnrm)
       |      * sqrt(${dot("q.v", "q.v")})) AS csim
       |  FROM cnorm c, qvec q
       |),
       |walk AS (
       |  SELECT assigned_label FROM (
       |    SELECT s.assigned_label, s.cnt,
       |      sum(s.cnt) OVER (ORDER BY qs.csim DESC, qs.assigned_label ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM qsims qs JOIN sizes s USING (assigned_label))
       |  WHERE cum - cnt < $nc
       |),
       |cands AS (
       |  SELECT a.neighbor_id
       |  FROM assignments a JOIN walk w USING (assigned_label)
       |)
       |SELECT b.vec_id,
       |  ${dot("b.embedding", "q.v")} / (sqrt(${dot("b.embedding", "b.embedding")})
       |    * sqrt(${dot("q.v", "q.v")})) AS score
       |FROM base b JOIN cands c ON c.neighbor_id = b.vec_id, qvec q
       |ORDER BY score DESC, vec_id ASC
       |LIMIT $k""".stripMargin
  }

  /** [[knnCandidateWalk]] over the AUTO-SIZED index mirror: the dial
    * CTEs derive nlist from count(*) and the codebook comes from the
    * sample-seeded auto training loop ([[knnIvfAuto]]'s device) — the
    * mirror of a DSL env built on [[graft.operators.VectorOps
    * .ivfAssignAuto]]/[[graft.operators.VectorOps
    * .centroidVectorsAuto]]. The walk itself is unchanged: cells in
    * query-similarity order until the running list total reaches
    * `nc`, exact cosine over the survivors.
    */
  def knnCandidateWalkAuto(qv: Seq[Double], k: Int, nc: Int): String = {
    val qvArr = qv.map(d => s"CAST($d AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH $baseCte, $dialCtes,
       |$centroidsAutoCte,
       |$centroidSimsCtes,
       |assignments AS (
       |  SELECT vec_id AS neighbor_id, c_label AS assigned_label
       |  FROM cranked WHERE rn = 1
       |),
       |sizes AS (
       |  SELECT assigned_label, count(*) AS cnt
       |  FROM assignments GROUP BY assigned_label
       |),
       |qvec AS (SELECT $qvArr AS v),
       |qsims AS (
       |  SELECT c.c_label AS assigned_label,
       |    ${dot("c.centroid", "q.v")} / (sqrt(c.cnrm)
       |      * sqrt(${dot("q.v", "q.v")})) AS csim
       |  FROM cnorm c, qvec q
       |),
       |walk AS (
       |  SELECT assigned_label FROM (
       |    SELECT s.assigned_label, s.cnt,
       |      sum(s.cnt) OVER (ORDER BY qs.csim DESC, qs.assigned_label ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM qsims qs JOIN sizes s USING (assigned_label))
       |  WHERE cum - cnt < $nc
       |),
       |cands AS (
       |  SELECT a.neighbor_id
       |  FROM assignments a JOIN walk w USING (assigned_label)
       |)
       |SELECT b.vec_id,
       |  ${dot("b.embedding", "q.v")} / (sqrt(${dot("b.embedding", "b.embedding")})
       |    * sqrt(${dot("q.v", "q.v")})) AS score
       |FROM base b JOIN cands c ON c.neighbor_id = b.vec_id, qvec q
       |ORDER BY score DESC, vec_id ASC
       |LIMIT $k""".stripMargin
  }

  def ivfAssign(nlist: Int = VectorOps.NList): String =
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |$centroidSimsCtes
       |SELECT vec_id, label, c_label AS assigned_label, sim
       |FROM cranked WHERE rn = 1""".stripMargin

  /** Mirror of VectorOps.knnLabelPartitioned: composite (label, cell)
    * inverted lists, per-query similarity-ordered cell walk with a
    * running candidate total (cranked's rn IS the walk order), stop at
    * the LabelPartMinCands floor, exact cosine + top-k.
    */
  def knnLabelPartitioned(nlist: Int = VectorOps.NList): String = {
    val t = VectorOps.LabelPartMinCands
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |$centroidSimsCtes,
       |assignments AS (
       |  SELECT vec_id AS neighbor_id, c_label AS assigned_label
       |  FROM cranked WHERE rn = 1
       |),
       |lists AS (
       |  SELECT a.neighbor_id, a.assigned_label, b.label AS plabel
       |  FROM assignments a JOIN base b ON b.vec_id = a.neighbor_id
       |),
       |lsizes AS (
       |  SELECT plabel, assigned_label, count(*) AS cnt
       |  FROM lists GROUP BY plabel, assigned_label
       |),
       |qlab AS (
       |  SELECT vec_id AS query_id, label AS plabel
       |  FROM base WHERE vec_id % $qm = 0
       |),
       |qcells AS (
       |  SELECT vec_id AS query_id, c_label AS assigned_label, rn
       |  FROM cranked WHERE vec_id % $qm = 0
       |),
       |probes AS (
       |  SELECT query_id, plabel, assigned_label FROM (
       |    SELECT q.query_id, ql.plabel, q.assigned_label, l.cnt,
       |      sum(l.cnt) OVER (PARTITION BY q.query_id ORDER BY q.rn
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM qcells q
       |    JOIN qlab ql USING (query_id)
       |    JOIN lsizes l
       |      ON l.plabel = ql.plabel AND l.assigned_label = q.assigned_label)
       |  WHERE cum - cnt < $t
       |),
       |candidates AS (
       |  SELECT p.query_id, li.neighbor_id
       |  FROM probes p JOIN lists li
       |    ON li.plabel = p.plabel AND li.assigned_label = p.assigned_label
       |  WHERE li.neighbor_id <> p.query_id
       |),
       |qset AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE vec_id % $qm = 0
       |),
       |sims AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${dot("nb.embedding", "q.qv")} / (sqrt(nb.nrm) * sqrt(q.qnrm)) AS sim
       |  FROM candidates c
       |  JOIN base nb ON nb.vec_id = c.neighbor_id
       |  JOIN qset q ON q.query_id = c.query_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin
  }

  def knnIvf(nlist: Int = VectorOps.NList,
      nprobe: Int = VectorOps.NProbe, filtered: Boolean = false): String = {
    // filtered variant: the label predicate joins into the CANDIDATE
    // set, mirroring VectorOps.knnIvfFiltered's pre-scoring filter
    val candJoins =
      if (filtered)
        """
          |  JOIN base nb0 ON nb0.vec_id = a.neighbor_id
          |  JOIN base qb0 ON qb0.vec_id = p.query_id""".stripMargin
      else ""
    val candFilter = if (filtered) " AND nb0.label = qb0.label" else ""
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |$centroidSimsCtes,
       |assignments AS (
       |  SELECT vec_id AS neighbor_id, c_label AS assigned_label
       |  FROM cranked WHERE rn = 1
       |),
       |probes AS (
       |  SELECT vec_id AS query_id, c_label AS assigned_label
       |  FROM cranked WHERE vec_id % $qm = 0 AND rn <= $nprobe
       |),
       |candidates AS (
       |  SELECT p.query_id, a.neighbor_id
       |  FROM probes p JOIN assignments a USING (assigned_label)$candJoins
       |  WHERE a.neighbor_id <> p.query_id$candFilter
       |),
       |qset AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE vec_id % $qm = 0
       |),
       |sims AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${dot("nb.embedding", "q.qv")} / (sqrt(nb.nrm) * sqrt(q.qnrm)) AS sim
       |  FROM candidates c
       |  JOIN base nb ON nb.vec_id = c.neighbor_id
       |  JOIN qset q ON q.query_id = c.query_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin
  }

  // --- Product quantization mirrors -------------------------------------

  private val psd = VectorOps.PqSubDim

  /** In-order dot fold over the PQ subspace width (1-based). */
  private def dotSub(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${psd + 1}),
       |  i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)),
       |  (acc, v) -> acc + v)""".stripMargin

  /** Training cell of subspace m over a `sub` column — the same
    * plane-literal sign code as VectorOps.pqTrainCellExpr.
    */
  private def pqCellSql(m: Int): String =
    (0 until VectorOps.PqBits).map { j =>
      val w = (0 until psd).map(VectorOps.pqPlaneWeight(m, j, _))
        .mkString("[", ",", "]")
      s"""(CASE WHEN list_reduce(list_transform(range(1, ${psd + 1}),
         |  i -> $w[CAST(i AS INT)] * CAST(sub[CAST(i AS INT)] AS DOUBLE)),
         |  (acc, v) -> acc + v) > 0 THEN ${1 << j} ELSE 0 END)""".stripMargin
    }.mkString(" + ")

  /** Mirror of VectorOps.pqSubs/pqCodebook/pqCodes: subvector explode
    * (one UNION ALL arm per subspace), decimal-exact cell means, dense
    * slot ids, argmin-L2 encoding, in-m-order reconstruction norms.
    */
  private val pqCtes: String = {
    val arms = (0 until VectorOps.PqM).map { m =>
      s"""SELECT vec_id, m, (${pqCellSql(m)}) AS cell, sub
         |FROM (SELECT vec_id, CAST($m AS BIGINT) AS m,
         |      embedding[${m * psd + 1}:${(m + 1) * psd}] AS sub FROM base)"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""subs AS (
       |$arms
       |),
       |pcent AS (
       |  SELECT m, cell, p.pos AS pos,
       |    sum(CAST(CASE WHEN abs(CAST(sub[CAST(p.pos + 1 AS INT)] AS DOUBLE)) < $flush
       |             THEN 0.0
       |             ELSE CAST(sub[CAST(p.pos + 1 AS INT)] AS DOUBLE)
       |             END * $scale AS DECIMAL(38,0))) AS csum,
       |    count(*) AS n
       |  FROM subs
       |  CROSS JOIN (SELECT unnest(range($psd)) AS pos) p
       |  GROUP BY m, cell, p.pos
       |),
       |cb AS (
       |  SELECT m, cell,
       |    list(CAST(csum AS DOUBLE) / $scale / n ORDER BY pos) AS centroid
       |  FROM pcent GROUP BY m, cell
       |),
       |cbn AS (
       |  SELECT m, cell, centroid, ${dotSub("centroid", "centroid")} AS cnrm,
       |    CAST(row_number() OVER (ORDER BY m, cell) - 1 AS BIGINT) AS slot
       |  FROM cb
       |),
       |enc AS (
       |  SELECT s.vec_id, s.m, c.cell, c.slot, c.cnrm,
       |    list_reduce(list_transform(range(1, ${psd + 1}), i ->
       |      (CAST(s.sub[CAST(i AS INT)] AS DOUBLE) - c.centroid[CAST(i AS INT)])
       |      * (CAST(s.sub[CAST(i AS INT)] AS DOUBLE) - c.centroid[CAST(i AS INT)])),
       |      (acc, v) -> acc + v) AS d2
       |  FROM subs s JOIN cbn c ON s.m = c.m
       |),
       |best AS (
       |  SELECT vec_id, m, slot, cnrm, row_number() OVER (
       |    PARTITION BY vec_id, m ORDER BY d2 ASC, cell ASC) AS rn
       |  FROM enc
       |),
       |pqcodes AS (
       |  SELECT vec_id,
       |    list(slot ORDER BY m) AS codes,
       |    list_reduce(list(cnrm ORDER BY m), (acc, v) -> acc + v) AS rnrm
       |  FROM best WHERE rn = 1 GROUP BY vec_id
       |)""".stripMargin
  }

  /** Mirror of VectorOps.knnPq: per-query slot-indexed LUT of
    * subvector·centroid dots, ADC fold over the 8 codes, exact cosine
    * re-rank of the PqReRank·K shortlist.
    */
  /** Shared PQ query-side CTEs: qset, the per-(query, slot) dots, and
    * the slot-ordered LUT (mirror of VectorOps.pqQueryLut).
    */
  private val pqLutCtes: String =
    s"""qset AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE vec_id % $qm = 0
       |),
       |qd AS (
       |  SELECT q.query_id, c.slot,
       |    list_reduce(list_transform(range(1, ${psd + 1}), i ->
       |      CAST(q.qv[CAST(c.m * $psd + i AS INT)] AS DOUBLE)
       |      * CAST(c.centroid[CAST(i AS INT)] AS DOUBLE)),
       |      (acc, v) -> acc + v) AS qd
       |  FROM qset q CROSS JOIN cbn c
       |),
       |qlut AS (
       |  SELECT query_id, list(qd ORDER BY slot) AS lut FROM qd GROUP BY query_id
       |)""".stripMargin

  /** Mirror of VectorOps.pqAdcExpr over aliased codes/lut relations. */
  private def pqAdcSql(ca: String, l: String): String =
    s"""list_reduce(list_transform(range(${VectorOps.PqM}), m ->
       |      $l.lut[CAST($ca.codes[CAST(m + 1 AS INT)] + 1 AS INT)]),
       |      (acc, v) -> acc + v)""".stripMargin

  /** Shared exact-re-rank tail over an `approx` CTE carrying
    * (query_id, neighbor_id, embedding, nrm, qv, qnrm, asim).
    */
  private def reRankTail(rr: Int): String =
    s"""short AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY asim DESC, neighbor_id ASC) AS arank
       |  FROM approx
       |),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    ${dot("embedding", "qv")} / (sqrt(nrm) * sqrt(qnrm)) AS sim
       |  FROM short WHERE arank <= $rr
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k"""
      .stripMargin

  val knnPq: String =
    s"""WITH $baseCte, $pqCtes,
       |$pqLutCtes,
       |approx AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id,
       |    b.embedding, b.nrm, q.qv, q.qnrm,
       |    ${pqAdcSql("ca", "l")}
       |      / (sqrt(ca.rnrm) * sqrt(q.qnrm)) AS asim
       |  FROM pqcodes ca
       |  JOIN base b ON b.vec_id = ca.vec_id
       |  CROSS JOIN qlut l
       |  JOIN qset q ON q.query_id = l.query_id
       |  WHERE b.vec_id <> q.query_id
       |),
       |${reRankTail(VectorOps.PqReRank * k)}""".stripMargin

  // --- Residual IVF-PQ mirrors ------------------------------------------

  private val qsetCte: String =
    s"""qset AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |  FROM base WHERE vec_id % $qm = 0
       |)""".stripMargin

  /** Mirror of VectorOps.ivfResiduals/pqrCodebook/pqrCodes: residuals
    * vs the assigned TRAINED centroid, grid-floored codebook means
    * (ResGrid — doubles, so the 2^54 float trick doesn't apply; see
    * VectorOps), dense slots, argmin-L2 codes, reconstruction
    * v̂ = centroid + concat(sub-centroids) with its in-order norm.
    */
  private val pqrCtes: String = {
    val grid = VectorOps.ResGrid
    val arms = (0 until VectorOps.PqM).map { m =>
      s"""SELECT vec_id, assigned_label, m, (${pqCellSql(m)}) AS cell, sub
         |FROM (SELECT vec_id, assigned_label, CAST($m AS BIGINT) AS m,
         |      res[${m * psd + 1}:${(m + 1) * psd}] AS sub FROM resid)"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""resid AS (
       |  SELECT a.vec_id, a.c_label AS assigned_label,
       |    list_transform(range(1, ${dim + 1}), i ->
       |      CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - c.centroid[CAST(i AS INT)]) AS res
       |  FROM cranked a
       |  JOIN embeddings e ON e.vec_id = a.vec_id
       |  JOIN cnorm c ON c.c_label = a.c_label
       |  WHERE a.rn = 1
       |),
       |rsubs AS (
       |$arms
       |),
       |rcent AS (
       |  SELECT m, cell, p.pos AS pos,
       |    sum(CAST(CAST(floor(sub[CAST(p.pos + 1 AS INT)] * $grid) AS BIGINT)
       |        AS DECIMAL(38,0))) AS csum,
       |    count(*) AS n
       |  FROM rsubs
       |  CROSS JOIN (SELECT unnest(range($psd)) AS pos) p
       |  GROUP BY m, cell, p.pos
       |),
       |rcb AS (
       |  SELECT m, cell, list(CAST(csum AS DOUBLE) / $grid / n ORDER BY pos) AS centroid
       |  FROM rcent GROUP BY m, cell
       |),
       |rcbn AS (
       |  SELECT m, cell, centroid,
       |    CAST(row_number() OVER (ORDER BY m, cell) - 1 AS BIGINT) AS slot
       |  FROM rcb
       |),
       |renc AS (
       |  SELECT s.vec_id, s.assigned_label, s.m, c.cell, c.slot, c.centroid,
       |    list_reduce(list_transform(range(1, ${psd + 1}), i ->
       |      (CAST(s.sub[CAST(i AS INT)] AS DOUBLE) - c.centroid[CAST(i AS INT)])
       |      * (CAST(s.sub[CAST(i AS INT)] AS DOUBLE) - c.centroid[CAST(i AS INT)])),
       |      (acc, v) -> acc + v) AS d2
       |  FROM rsubs s JOIN rcbn c ON s.m = c.m
       |),
       |rbest AS (
       |  SELECT vec_id, assigned_label, m, slot, centroid, row_number() OVER (
       |    PARTITION BY vec_id, m ORDER BY d2 ASC, cell ASC) AS rn
       |  FROM renc
       |),
       |rflat AS (
       |  SELECT vec_id, assigned_label,
       |    list(slot ORDER BY m) AS codes,
       |    flatten(list(centroid ORDER BY m)) AS recon
       |  FROM rbest WHERE rn = 1 GROUP BY vec_id, assigned_label
       |),
       |rcn AS (
       |  -- vhat[i] = c[i] + recon[i] inlined in both the array and the
       |  -- norm fold (one IEEE add then multiply — bit-equal to Spark's
       |  -- materialized zip_with + dot); DuckDB's binder rejects the
       |  -- LATERAL correlation that would share the array
       |  SELECT r.vec_id, r.assigned_label, r.codes,
       |    list_transform(range(1, ${dim + 1}), i ->
       |      c.centroid[CAST(i AS INT)] + r.recon[CAST(i AS INT)]) AS vhat,
       |    list_reduce(list_transform(range(1, ${dim + 1}), i ->
       |      (c.centroid[CAST(i AS INT)] + r.recon[CAST(i AS INT)])
       |      * (c.centroid[CAST(i AS INT)] + r.recon[CAST(i AS INT)])),
       |      (acc, v) -> acc + v) AS rnrm
       |  FROM rflat r JOIN cnorm c ON c.c_label = r.assigned_label
       |),
       |rqd AS (
       |  SELECT q.query_id, c.slot,
       |    list_reduce(list_transform(range(1, ${psd + 1}), i ->
       |      CAST(q.qv[CAST(c.m * $psd + i AS INT)] AS DOUBLE)
       |      * CAST(c.centroid[CAST(i AS INT)] AS DOUBLE)),
       |      (acc, v) -> acc + v) AS qd
       |  FROM qset q CROSS JOIN rcbn c
       |),
       |rqlut AS (
       |  SELECT query_id, list(qd ORDER BY slot) AS lut FROM rqd GROUP BY query_id
       |)""".stripMargin
  }

  /** Mirror of VectorOps.knnIvfPq (residual variant): IVF bucket
    * pruning from the trained coarse quantizer, ADC = <q, c_probe> +
    * LUT fold over residual codes, shared exact re-rank tail.
    */
  def knnIvfPq(nlist: Int = VectorOps.NList,
      nprobe: Int = VectorOps.NProbe): String =
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |$centroidSimsCtes,
       |$qsetCte,
       |$pqrCtes,
       |assignments AS (
       |  SELECT vec_id AS neighbor_id, c_label AS assigned_label
       |  FROM cranked WHERE rn = 1
       |),
       |probes AS (
       |  SELECT p.vec_id AS query_id, p.c_label AS assigned_label,
       |    ${dot("q.qv", "c.centroid")} AS qcdot
       |  FROM cranked p
       |  JOIN cnorm c ON c.c_label = p.c_label
       |  JOIN qset q ON q.query_id = p.vec_id
       |  WHERE p.vec_id % $qm = 0 AND p.rn <= $nprobe
       |),
       |candidates AS (
       |  SELECT p.query_id, a.neighbor_id, p.qcdot
       |  FROM probes p JOIN assignments a USING (assigned_label)
       |  WHERE a.neighbor_id <> p.query_id
       |),
       |approx AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    b.embedding, b.nrm, q.qv, q.qnrm,
       |    (c.qcdot + ${pqAdcSql("ca", "l")})
       |      / (sqrt(ca.rnrm) * sqrt(q.qnrm)) AS asim
       |  FROM candidates c
       |  JOIN rcn ca ON ca.vec_id = c.neighbor_id
       |  JOIN base b ON b.vec_id = c.neighbor_id
       |  JOIN rqlut l ON l.query_id = c.query_id
       |  JOIN qset q ON q.query_id = c.query_id
       |),
       |${reRankTail(VectorOps.PqReRank * k)}""".stripMargin

  /** Mirror of VectorOps.pqMse: reconstruction MSE of raw PQ vs
    * residual IVF-PQ at the same code budget, averaged on the ResGrid
    * integer grid (order-free). The raw reconstruction is rebuilt from
    * the raw codebook with the centroid arrays carried through.
    */
  def pqMse(nlist: Int = VectorOps.NList): String = {
    val grid = VectorOps.ResGrid
    def mseTail(recRel: String, variant: String): String =
      s"""SELECT '$variant' AS variant,
         |  CAST(sum(CAST(CAST(floor(e2 * $grid) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE)
         |    / $grid / count(*) AS mse,
         |  count(*) AS n
         |FROM (
         |  SELECT list_reduce(list_transform(range(1, ${dim + 1}), i ->
         |    (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - r.vhat[CAST(i AS INT)])
         |    * (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - r.vhat[CAST(i AS INT)])),
         |    (acc, v) -> acc + v) AS e2
         |  FROM embeddings e JOIN $recRel r ON r.vec_id = e.vec_id
         |)""".stripMargin
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |$centroidSimsCtes,
       |$qsetCte,
       |$pqrCtes,
       |$pqCtes,
       |enc2 AS (
       |  SELECT s.vec_id, s.m, c.cell, c.centroid,
       |    list_reduce(list_transform(range(1, ${psd + 1}), i ->
       |      (CAST(s.sub[CAST(i AS INT)] AS DOUBLE) - c.centroid[CAST(i AS INT)])
       |      * (CAST(s.sub[CAST(i AS INT)] AS DOUBLE) - c.centroid[CAST(i AS INT)])),
       |      (acc, v) -> acc + v) AS d2
       |  FROM subs s JOIN cbn c ON s.m = c.m
       |),
       |best2 AS (
       |  SELECT vec_id, m, centroid, row_number() OVER (
       |    PARTITION BY vec_id, m ORDER BY d2 ASC, cell ASC) AS rn
       |  FROM enc2
       |),
       |rawrec AS (
       |  SELECT vec_id, flatten(list(centroid ORDER BY m)) AS vhat
       |  FROM best2 WHERE rn = 1 GROUP BY vec_id
       |)
       |${mseTail("rawrec", "pq_raw")}
       |UNION ALL
       |${mseTail("rcn", "ivfpq_residual")}""".stripMargin
  }

  /** Recall@K of IVF-PQ vs exact, composing the two query oracles. */
  def ivfPqRecall(nprobe: Int = VectorOps.NProbe): String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN (${knnIvfPq(nprobe = nprobe)}) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** Recall@K of PQ vs exact, composing the two query oracles. */
  val pqRecall: String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN ($knnPq) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  // --- Matryoshka (prefix-dimension) mirrors -----------------------------

  /** In-order dot fold over the matryoshka prefix width (1-based). */
  private def dotPref(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${VectorOps.MrlDim + 1}),
       |  i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)),
       |  (acc, v) -> acc + v)""".stripMargin

  /** Mirror of VectorOps.knnMrl: truncated-prefix cosine for the
    * approximate pass, full-width exact re-rank of the MrlReRank·K
    * shortlist.
    */
  val knnMrl: String = {
    val rr = VectorOps.MrlReRank * k
    val md = VectorOps.MrlDim
    s"""WITH $baseCte,
       |pb AS (
       |  SELECT vec_id, embedding, nrm, embedding[1:$md] AS pv
       |  FROM base
       |),
       |pn AS (
       |  SELECT vec_id, embedding, nrm, pv, ${dotPref("pv", "pv")} AS pnrm
       |  FROM pb
       |),
       |qset AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm,
       |    pv AS qpv, pnrm AS qpnrm
       |  FROM pn WHERE vec_id % $qm = 0
       |),
       |approx AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id,
       |    b.embedding, b.nrm, q.qv, q.qnrm,
       |    ${dotPref("b.pv", "q.qpv")} / (sqrt(b.pnrm) * sqrt(q.qpnrm)) AS asim
       |  FROM pn b, qset q WHERE b.vec_id <> q.query_id
       |),
       |short AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY asim DESC, neighbor_id ASC) AS arank
       |  FROM approx
       |),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    ${dot("embedding", "qv")} / (sqrt(nrm) * sqrt(qnrm)) AS sim
       |  FROM short WHERE arank <= $rr
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin
  }

  /** Recall@K of matryoshka truncation vs exact. */
  val mrlRecall: String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN ($knnMrl) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  private def dotRp(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${VectorOps.RpDim + 1}),
       |  i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE)),
       |  (acc, v) -> acc + v)""".stripMargin

  /** Mirror of VectorOps.knnRp: the same ±1 LCG planes as a literal,
    * real-valued projection, projected-space cosine, exact re-rank of
    * the RpReRank·K shortlist.
    */
  val knnRp: String = {
    val rr = VectorOps.RpReRank * k
    val planes = VectorOps.planesLitDuck(VectorOps.RpDim)
    s"""WITH $baseCte,
       |pb AS (
       |  SELECT vec_id, embedding, nrm,
       |    list_transform($planes, p ->
       |      list_reduce(list_transform(range(1, ${dim + 1}),
       |        i -> CAST(p[CAST(i AS INT)] AS DOUBLE)
       |             * CAST(embedding[CAST(i AS INT)] AS DOUBLE)),
       |        (acc, v) -> acc + v)) AS pv
       |  FROM base
       |),
       |pn AS (
       |  SELECT vec_id, embedding, nrm, pv, ${dotRp("pv", "pv")} AS pnrm
       |  FROM pb
       |),
       |qset AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm,
       |    pv AS qpv, pnrm AS qpnrm
       |  FROM pn WHERE vec_id % $qm = 0
       |),
       |approx AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id,
       |    b.embedding, b.nrm, q.qv, q.qnrm,
       |    ${dotRp("b.pv", "q.qpv")} / (sqrt(b.pnrm) * sqrt(q.qpnrm)) AS asim
       |  FROM pn b, qset q WHERE b.vec_id <> q.query_id
       |),
       |short AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY asim DESC, neighbor_id ASC) AS arank
       |  FROM approx
       |),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    ${dot("embedding", "qv")} / (sqrt(nrm) * sqrt(qnrm)) AS sim
       |  FROM short WHERE arank <= $rr
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT query_id, neighbor_id, "rank", sim FROM ranked WHERE "rank" <= $k""".stripMargin
  }

  /** Recall@K of JL projection vs exact. */
  val rpRecall: String =
    s"""SELECT e.query_id,
       |  CAST(count(l."rank") AS DOUBLE) / $k AS recall_at_k,
       |  count(*) AS n_exact
       |FROM ($knnExact) e
       |LEFT JOIN ($knnRp) l
       |  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  /** Mirror of VectorOps.semDedup: trained-cluster assignment, exact
    * cosine within clusters only, duplicate = some smaller-id
    * same-cluster neighbor above the threshold.
    */
  def semDedup(nlist: Int = VectorOps.NList,
      threshold: Double = VectorOps.DupThreshold): String =
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |$centroidSimsCtes,
       |assign AS (SELECT vec_id, c_label FROM cranked WHERE rn = 1),
       |j AS (
       |  SELECT a.vec_id, a.c_label, b.embedding, b.nrm
       |  FROM assign a JOIN base b USING (vec_id)
       |),
       |dups AS (
       |  SELECT DISTINCT y.vec_id
       |  FROM j x JOIN j y ON x.c_label = y.c_label AND x.vec_id < y.vec_id
       |  WHERE ${dot("x.embedding", "y.embedding")} / (sqrt(x.nrm) * sqrt(y.nrm))
       |        >= $threshold
       |)
       |SELECT a.vec_id, a.c_label AS cluster,
       |  CAST(d.vec_id IS NOT NULL AS BIGINT) AS is_dup
       |FROM assign a LEFT JOIN dups d USING (vec_id)""".stripMargin

  /** Mirror of VectorOps.clusterSample: per-cluster md5-of-id rank cut. */
  def clusterSample(nlist: Int = VectorOps.NList,
      n: Int = VectorOps.ClusterSampleN): String =
    s"""WITH $baseCte, ${centroidsCte(nlist)},
       |$centroidSimsCtes,
       |assign AS (SELECT vec_id, c_label FROM cranked WHERE rn = 1),
       |r AS (
       |  SELECT c_label, vec_id, row_number() OVER (
       |    PARTITION BY c_label ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |  FROM assign
       |)
       |SELECT c_label AS cluster, vec_id, rn FROM r WHERE rn <= $n""".stripMargin

  /** Mirror of VectorOps.embCuration: the semDedup mirror wrapped with
    * the survivors' md5-of-id rank and the keep bit.
    */
  def embCuration(): String = {
    val n = VectorOps.ClusterSampleN
    s"""WITH sd AS (
       |${semDedup()}
       |),
       |r AS (
       |  SELECT vec_id, row_number() OVER (
       |    PARTITION BY cluster ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |  FROM sd WHERE is_dup = 0
       |)
       |SELECT sd.vec_id, sd.cluster, sd.is_dup,
       |  COALESCE(r.rn, 0) AS sample_rank,
       |  CAST(CASE WHEN sd.is_dup = 0 AND r.rn <= $n THEN 1 ELSE 0 END AS BIGINT)
       |    AS kept
       |FROM sd LEFT JOIN r USING (vec_id)""".stripMargin
  }

  /** Mirror of VectorOps.kCenter: all KcK farthest-point steps
    * unrolled as (argmax pick, min-distance update) CTE pairs — the
    * sentinel-2.0 initialization makes step 1 a uniform member of the
    * loop (all-equal d ties break to the minimum vec_id).
    */
  val kCenter: String = {
    val kk = VectorOps.KcK
    val steps = (1 to kk).map { t =>
      val prev = s"d${t - 1}"
      val pick =
        s"""p$t AS (
           |  SELECT vec_id, d FROM $prev ORDER BY d DESC, vec_id ASC LIMIT 1
           |)""".stripMargin
      val upd =
        s"""d$t AS (
           |  SELECT x.vec_id, x.embedding, x.nrm,
           |    least(x.d, 1.0 - ${dot("x.embedding", "s.embedding")} /
           |      (sqrt(x.nrm) * sqrt(s.nrm))) AS d
           |  FROM $prev x, base s, p$t WHERE s.vec_id = p$t.vec_id
           |)""".stripMargin
      if (t < kk) s"$pick,\n$upd" else pick
    }.mkString(",\n")
    val sel = (1 to kk)
      .map(t => s"SELECT CAST($t AS BIGINT) AS pick_order, vec_id, d AS covered_d FROM p$t")
      .mkString("\nUNION ALL\n")
    s"""WITH $baseCte,
       |d0 AS (SELECT vec_id, embedding, nrm, CAST(2.0 AS DOUBLE) AS d FROM base),
       |$steps
       |$sel""".stripMargin
  }

  /** Shared band CTE body (all vectors) — mirror of the sign_bands
    * posexplode every banded operator opens with. MATERIALIZED: it is
    * referenced more than once downstream and DuckDB 1.0 inlines
    * non-materialized CTE references (the EMFILE gotcha).
    */
  private def bandsCte(numPlanes: Int, bandBits: Int): String =
    s"""bands AS MATERIALIZED (
       |  SELECT vec_id,
       |    b.b AS band_idx,
       |    substring(code, CAST(b.b * $bandBits + 1 AS INT), $bandBits) AS band_key
       |  FROM coded CROSS JOIN (SELECT unnest(range(${numPlanes / bandBits})) AS b) b
       |)""".stripMargin

  /** Mirror of VectorOps.knnGraph: directed banded candidates, exact
    * cosine, per-source rank cut at GraphK.
    */
  def knnGraph(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String =
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |${bandsCte(numPlanes, bandBits)},
       |und AS (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.vec_id < b.vec_id
       |),
       |cands AS (
       |  SELECT src, dst FROM und
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM und
       |),
       |sims AS (
       |  SELECT c.src AS vec_id, c.dst AS neighbor_id,
       |    ${dot("ba.embedding", "bb.embedding")} / (sqrt(ba.nrm) * sqrt(bb.nrm)) AS sim
       |  FROM cands c
       |  JOIN base ba ON ba.vec_id = c.src
       |  JOIN base bb ON bb.vec_id = c.dst
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM sims
       |)
       |SELECT vec_id, neighbor_id, "rank", sim FROM ranked
       |WHERE "rank" <= ${VectorOps.GraphK}""".stripMargin

  /** Expanded-candidate CTE chain shared by knnGraphExpand and
    * graphRecall: LSH seeds ∪ one graph hop, re-ranked exact top-k.
    */
  private def graphExpandCtes(numPlanes: Int, bandBits: Int): String =
    s"""${bandsCte(numPlanes, bandBits)},
       |seeds AS MATERIALIZED (
       |  SELECT DISTINCT qb.vec_id AS query_id, db.vec_id AS seed_id
       |  FROM bands db JOIN bands qb USING (band_idx, band_key)
       |  WHERE qb.vec_id % $qm = 0 AND db.vec_id <> qb.vec_id
       |),
       |gund AS (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.vec_id < b.vec_id
       |),
       |gcands AS (
       |  SELECT src, dst FROM gund
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM gund
       |),
       |gsims AS (
       |  SELECT c.src, c.dst,
       |    ${dot("ba.embedding", "bb.embedding")} / (sqrt(ba.nrm) * sqrt(bb.nrm)) AS sim
       |  FROM gcands c
       |  JOIN base ba ON ba.vec_id = c.src
       |  JOIN base bb ON bb.vec_id = c.dst
       |),
       |graph AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY src ORDER BY sim DESC, dst ASC) AS rn
       |    FROM gsims
       |  ) WHERE rn <= ${VectorOps.GraphK}
       |),
       |expanded AS MATERIALIZED (
       |  SELECT DISTINCT query_id, neighbor_id FROM (
       |    SELECT query_id, seed_id AS neighbor_id FROM seeds
       |    UNION ALL
       |    SELECT s.query_id, g.dst AS neighbor_id
       |    FROM seeds s JOIN graph g ON g.src = s.seed_id
       |  ) WHERE neighbor_id <> query_id
       |),
       |esims AS (
       |  SELECT e.query_id, e.neighbor_id,
       |    ${dot("db.embedding", "qb.embedding")} / (sqrt(db.nrm) * sqrt(qb.nrm)) AS sim
       |  FROM expanded e
       |  JOIN base db ON db.vec_id = e.neighbor_id
       |  JOIN base qb ON qb.vec_id = e.query_id
       |),
       |eranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM esims
       |)""".stripMargin

  /** Mirror of VectorOps.knnGraphExpand. */
  def knnGraphExpand(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String =
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |${graphExpandCtes(numPlanes, bandBits)}
       |SELECT query_id, neighbor_id, "rank", sim FROM eranked
       |WHERE "rank" <= $k""".stripMargin

  /** Beam-round unroll extending [[graphExpandCtes]]: v1 is the scored
    * exhaustive-first-hop set (esims); each round takes the BeamWidth
    * best NEW candidates per query, follows the graph, anti-joins the
    * visited set, scores the fresh ones. MATERIALIZED round CTEs — the
    * multi-reference inlining rule (see kCore's Scaladoc).
    */
  private def beamCtes(numPlanes: Int, bandBits: Int): String = {
    val rounds = (2 to VectorOps.BeamRounds).map { r =>
      val pn = if (r == 2) "v1" else s"new_${r - 1}"
      val pv = if (r == 2) "v1" else s"visited_${r - 1}"
      s"""beam_$r AS (
         |  SELECT query_id, neighbor_id AS seed_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
         |    FROM $pn
         |  ) WHERE rn <= ${VectorOps.BeamWidth}
         |),
         |cand_$r AS (
         |  SELECT DISTINCT b.query_id, g.dst AS neighbor_id
         |  FROM beam_$r b JOIN graph g ON g.src = b.seed_id
         |  WHERE g.dst <> b.query_id
         |    AND NOT EXISTS (SELECT 1 FROM $pv v
         |                    WHERE v.query_id = b.query_id
         |                      AND v.neighbor_id = g.dst)
         |),
         |new_$r AS MATERIALIZED (
         |  SELECT c.query_id, c.neighbor_id,
         |    ${dot("db.embedding", "qb.embedding")} / (sqrt(db.nrm) * sqrt(qb.nrm)) AS sim
         |  FROM cand_$r c
         |  JOIN base db ON db.vec_id = c.neighbor_id
         |  JOIN base qb ON qb.vec_id = c.query_id
         |),
         |visited_$r AS MATERIALIZED (
         |  SELECT * FROM $pv UNION ALL SELECT * FROM new_$r
         |)""".stripMargin
    }.mkString(",\n")
    s"""${graphExpandCtes(numPlanes, bandBits)},
       |v1 AS MATERIALIZED (SELECT query_id, neighbor_id, sim FROM esims),
       |$rounds,
       |branked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS "rank"
       |  FROM visited_${VectorOps.BeamRounds}
       |)""".stripMargin
  }

  /** Mirror of VectorOps.knnGraphBeam. */
  def knnGraphBeam(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String =
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |${beamCtes(numPlanes, bandBits)}
       |SELECT query_id, neighbor_id, "rank", sim FROM branked
       |WHERE "rank" <= $k""".stripMargin

  /** Mirror of VectorOps.beamRecall: exact baseline vs the beam top-k,
    * one-hop expansion top-k as the gauge.
    */
  def beamRecall(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String =
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |${beamCtes(numPlanes, bandBits)},
       |beam_hits AS (
       |  SELECT query_id, neighbor_id FROM branked WHERE "rank" <= $k
       |),
       |expand_hits AS (
       |  SELECT query_id, neighbor_id FROM eranked WHERE "rank" <= $k
       |),
       |exact AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY
       |      ${dot("b.embedding", "q.qv")} / (sqrt(b.nrm) * sqrt(q.qnrm)) DESC,
       |      b.vec_id ASC) AS rn
       |  FROM base b, (SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |                FROM base WHERE vec_id % $qm = 0) q
       |  WHERE b.vec_id <> q.query_id
       |)
       |SELECT e.query_id,
       |  CAST(count(bh.neighbor_id) AS DOUBLE) / $k AS recall_at_k,
       |  CAST(count(eh.neighbor_id) AS DOUBLE) / $k AS expand_recall_at_k,
       |  CAST(count(*) AS BIGINT) AS n_exact
       |FROM (SELECT query_id, neighbor_id FROM exact WHERE rn <= $k) e
       |LEFT JOIN beam_hits bh USING (query_id, neighbor_id)
       |LEFT JOIN expand_hits eh USING (query_id, neighbor_id)
       |GROUP BY e.query_id""".stripMargin

  /** Mirror of VectorOps.graphRecall: exact baseline joined against
    * the expanded search AND the bare LSH-seed top-k gauge.
    */
  def graphRecall(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String =
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |${graphExpandCtes(numPlanes, bandBits)},
       |expand_hits AS (
       |  SELECT query_id, neighbor_id FROM eranked WHERE "rank" <= $k
       |),
       |ssims AS (
       |  SELECT s.query_id, s.seed_id AS neighbor_id,
       |    ${dot("db.embedding", "qb.embedding")} / (sqrt(db.nrm) * sqrt(qb.nrm)) AS sim
       |  FROM seeds s
       |  JOIN base db ON db.vec_id = s.seed_id
       |  JOIN base qb ON qb.vec_id = s.query_id
       |),
       |seed_hits AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
       |    FROM ssims
       |  ) WHERE rn <= $k
       |),
       |exact AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY
       |      ${dot("b.embedding", "q.qv")} / (sqrt(b.nrm) * sqrt(q.qnrm)) DESC,
       |      b.vec_id ASC) AS rn
       |  FROM base b, (SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |                FROM base WHERE vec_id % $qm = 0) q
       |  WHERE b.vec_id <> q.query_id
       |)
       |SELECT e.query_id,
       |  CAST(count(eh.neighbor_id) AS DOUBLE) / $k AS recall_at_k,
       |  CAST(count(sh.neighbor_id) AS DOUBLE) / $k AS seed_recall_at_k,
       |  CAST(count(*) AS BIGINT) AS n_exact
       |FROM (SELECT query_id, neighbor_id FROM exact WHERE rn <= $k) e
       |LEFT JOIN expand_hits eh USING (query_id, neighbor_id)
       |LEFT JOIN seed_hits sh USING (query_id, neighbor_id)
       |GROUP BY e.query_id""".stripMargin

  /** Mirror of VectorOps.bitextMine: cross-parity banded candidates,
    * fused-fold cosines, 2^40-grid penalty sums over (sim DESC, id)
    * top-k windows, one-division margin, total-order top-N.
    */
  def bitextMine(numPlanes: Int = VectorOps.NumPlanes,
      bandBits: Int = VectorOps.BandBits): String =
    s"""WITH $baseCte, ${codeCte(numPlanes)},
       |${bandsCte(numPlanes, bandBits)},
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
       |),
       |pairs AS MATERIALIZED (
       |  SELECT c.a_id, c.b_id,
       |    ${dot("ba.embedding", "bb.embedding")} / (sqrt(ba.nrm) * sqrt(bb.nrm)) AS sim,
       |    CAST(floor((1.0 + ${dot("ba.embedding", "bb.embedding")}
       |        / (sqrt(ba.nrm) * sqrt(bb.nrm))) * 1099511627776.0) AS BIGINT) AS g
       |  FROM cands c
       |  JOIN base ba ON ba.vec_id = c.a_id
       |  JOIN base bb ON bb.vec_id = c.b_id
       |),
       |pen_a AS (
       |  SELECT a_id, CAST(sum(g) AS BIGINT) AS pen_a,
       |    CAST(count(*) AS BIGINT) AS cnt_a
       |  FROM (SELECT *, row_number() OVER (
       |          PARTITION BY a_id ORDER BY sim DESC, b_id ASC) AS rn
       |        FROM pairs)
       |  WHERE rn <= ${VectorOps.BitextK} GROUP BY a_id
       |),
       |pen_b AS (
       |  SELECT b_id, CAST(sum(g) AS BIGINT) AS pen_b,
       |    CAST(count(*) AS BIGINT) AS cnt_b
       |  FROM (SELECT *, row_number() OVER (
       |          PARTITION BY b_id ORDER BY sim DESC, a_id ASC) AS rn
       |        FROM pairs)
       |  WHERE rn <= ${VectorOps.BitextK} GROUP BY b_id
       |),
       |scored AS (
       |  SELECT p.a_id, p.b_id, p.sim,
       |    ((1.0 + p.sim) * CAST(2199023255552 * pa.cnt_a * pb.cnt_b AS DOUBLE))
       |      / CAST(pa.pen_a * pb.cnt_b + pb.pen_b * pa.cnt_a AS DOUBLE) AS margin
       |  FROM pairs p
       |  JOIN pen_a pa USING (a_id)
       |  JOIN pen_b pb USING (b_id)
       |)
       |SELECT row_number() OVER (ORDER BY margin DESC, a_id ASC, b_id ASC)
       |    AS "rank",
       |  a_id, b_id, sim, margin
       |FROM scored
       |ORDER BY margin DESC, a_id ASC, b_id ASC
       |LIMIT ${VectorOps.BitextTopN}""".stripMargin
}

