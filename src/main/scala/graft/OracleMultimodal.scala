package graft

import graft.operators.MultimodalOps

/** DuckDB oracle SQL for [[graft.operators.MultimodalOps]]. The fixture
  * payload is the documents text encoded as UTF-8 — pure ASCII — so
  * byte-level Spark BINARY ops are mirrored here in VARCHAR space with
  * identical results (substring offsets, lengths, and md5 digests all
  * agree byte-for-byte; DuckDB 1.0 lacks BLOB substring/md5).
  */
object OracleMultimodal {

  private val fb = MultimodalOps.FrameBytes

  val mediaCte: String =
    s"""media AS (
       |  SELECT doc_id AS media_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image'
       |         WHEN doc_id % 3 = 1 THEN 'audio'
       |         ELSE 'video' END AS media_type,
       |    text AS payload,
       |    CAST(16 + doc_id % 64 AS INT) AS width,
       |    CAST(16 + doc_id % 48 AS INT) AS height,
       |    CAST(ceil(length(text) / $fb.0) AS INT) AS n_frames
       |  FROM documents
       |)""".stripMargin

  val metadata: String =
    s"""WITH $mediaCte
       |SELECT media_id, media_type,
       |  CAST(length(payload) AS BIGINT) AS n_bytes,
       |  width, height, CAST(n_frames AS BIGINT) AS n_frames
       |FROM media""".stripMargin

  val frames: String =
    s"""WITH $mediaCte,
       |sampled AS (
       |  SELECT media_id, payload,
       |    unnest(list_filter(range(n_frames), i -> i % 2 = 0)) AS frame_idx
       |  FROM media
       |)
       |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  md5(substring(payload, CAST(frame_idx * $fb + 1 AS INT), $fb)) AS frame_md5
       |FROM sampled""".stripMargin

  val features: String =
    s"""WITH $mediaCte,
       |exploded AS (
       |  SELECT media_id, payload, unnest(range(n_frames)) AS frame_idx
       |  FROM media
       |),
       |feat AS (
       |  SELECT media_id,
       |    list_reduce(list_transform(range(1, 9),
       |      i -> CAST(strpos('0123456789abcdef', substring(
       |             md5(substring(payload, CAST(frame_idx * $fb + 1 AS INT), $fb)),
       |             CAST(i AS INT), 1)) - 1 AS BIGINT)),
       |      (a, d) -> a * 16 + d) % 256 AS f
       |  FROM exploded
       |)
       |SELECT media_id, count(*) AS n_frames_scanned,
       |  CAST(sum(f) AS DOUBLE) / count(*) AS mean_feature
       |FROM feat GROUP BY media_id""".stripMargin

  /** Mirror of MultimodalOps.mediaAhash: same per-frame feature fold,
    * frame-ordered list, cross-multiplied above-mean bits.
    */
  val ahash: String =
    s"""WITH $mediaCte,
       |exploded AS (
       |  SELECT media_id, payload, unnest(range(n_frames)) AS frame_idx
       |  FROM media
       |),
       |feat AS (
       |  SELECT media_id, frame_idx,
       |    list_reduce(list_transform(range(1, 9),
       |      i -> CAST(strpos('0123456789abcdef', substring(
       |             md5(substring(payload, CAST(frame_idx * $fb + 1 AS INT), $fb)),
       |             CAST(i AS INT), 1)) - 1 AS BIGINT)),
       |      (a, d) -> a * 16 + d) % 256 AS f
       |  FROM exploded
       |),
       |agg AS (
       |  SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
       |    CAST(sum(f) AS BIGINT) AS fsum,
       |    list(f ORDER BY frame_idx) AS fs
       |  FROM feat GROUP BY media_id
       |),
       |bits AS (
       |  SELECT media_id, n_frames,
       |    CAST(len(list_filter(fs, x -> x * n_frames > fsum)) AS BIGINT)
       |      AS n_ones,
       |    array_to_string(list_transform(fs,
       |      x -> CASE WHEN x * n_frames > fsum THEN '1' ELSE '0' END), '')
       |      AS ahash
       |  FROM agg
       |)
       |SELECT media_id, n_frames, n_ones, ahash, md5(ahash) AS ahash_md5
       |FROM bits""".stripMargin

  /** Mirror of MultimodalOps.mediaDedupExact. */
  val dedupExact: String =
    s"""WITH $mediaCte
       |SELECT md5(payload) AS content_hash,
       |  min(media_id) AS canonical_media_id,
       |  count(*) AS n_copies
       |FROM media GROUP BY md5(payload)""".stripMargin

  /** Mirror of MultimodalOps.mediaDedupNear: MinHash over per-frame
    * digests, banded LSH, signature-agreement estimate (shares
    * OracleText's rotLong fold and band shape).
    */
  val dedupNear: String = {
    val nh = graft.operators.TextOps.NumHashes
    val bs = graft.operators.TextOps.BandSize
    val mins = (0 until nh)
      .map(s => s"min(${OracleText.rotLong("h", s * 3)})").mkString("[", ", ", "]")
    s"""WITH $mediaCte,
       |exploded AS (
       |  SELECT media_id, payload, unnest(range(n_frames)) AS frame_idx
       |  FROM media
       |),
       |hashed AS (
       |  SELECT media_id,
       |    md5(substring(payload, CAST(frame_idx * $fb + 1 AS INT), $fb)) AS h
       |  FROM exploded
       |),
       |sigs AS (
       |  SELECT media_id, $mins AS sig FROM hashed GROUP BY media_id
       |),
       |bands AS (
       |  SELECT media_id, sig, b.b AS band_idx,
       |    array_to_string(list_transform(list_slice(sig, b.b * $bs + 1, b.b * $bs + $bs),
       |                                   x -> CAST(x AS VARCHAR)), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range(${nh / bs})) AS b) b
       |)
       |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |  CAST(len(list_filter(range(1, ${nh + 1}),
       |    i -> a.sig[CAST(i AS INT)] = b.sig[CAST(i AS INT)])) AS DOUBLE) / $nh
       |    AS est_jaccard
       |FROM bands a JOIN bands b USING (band_idx, band_key)
       |WHERE a.media_id < b.media_id""".stripMargin
  }

  /** Mirror of MultimodalOps.mediaSemdedup: exact-digest star edges,
    * the thresholded frame-MinHash candidates ([[dedupNear]] nested),
    * the embedding near-dups (OracleVectors.dedupEmbedding nested),
    * union → symmetrize → the shared CcRounds min-label unroll
    * (MATERIALIZED: the nested generators are whole query chains),
    * signal flags, keep = cluster minimum.
    */
  val semdedup: String = {
    val rounds = (1 to graft.operators.TextOps.CcRounds).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS MATERIALIZED (
         |  SELECT n.node,
         |    least(n.label, COALESCE(m.nbr, n.label)) AS label
         |  FROM $prev n LEFT JOIN (
         |    SELECT e.doc_a AS node, min(x.label) AS nbr
         |    FROM edges e JOIN $prev x ON x.node = e.doc_b
         |    GROUP BY e.doc_a
         |  ) m USING (node)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $mediaCte,
       |exact_edges AS MATERIALIZED (
       |  SELECT canon AS media_a, media_id AS media_b FROM (
       |    SELECT media_id,
       |      min(media_id) OVER (PARTITION BY md5(payload)) AS canon
       |    FROM media)
       |  WHERE media_id <> canon
       |),
       |near_edges AS MATERIALIZED (
       |  SELECT media_a, media_b FROM (${dedupNear})
       |  WHERE est_jaccard >= ${MultimodalOps.MediaDupEst}
       |),
       |payload_edges AS MATERIALIZED (
       |  SELECT * FROM exact_edges UNION ALL SELECT * FROM near_edges
       |),
       |sem_edges AS MATERIALIZED (
       |  SELECT vec_a AS media_a, vec_b AS media_b
       |  FROM (${OracleVectors.dedupEmbedding()})
       |),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT media_a AS doc_a, media_b AS doc_b FROM (
       |    SELECT * FROM payload_edges UNION ALL SELECT * FROM sem_edges)
       |),
       |edges AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
       |),
       |nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$rounds,
       |pflag AS (
       |  SELECT DISTINCT media_id FROM (
       |    SELECT media_a AS media_id FROM payload_edges
       |    UNION ALL SELECT media_b FROM payload_edges)
       |),
       |sflag AS (
       |  SELECT DISTINCT media_id FROM (
       |    SELECT media_a AS media_id FROM sem_edges
       |    UNION ALL SELECT media_b FROM sem_edges)
       |)
       |SELECT m.media_id,
       |  COALESCE(l.label, m.media_id) AS cluster_id,
       |  p.media_id IS NOT NULL AS payload_signal,
       |  s.media_id IS NOT NULL AS semantic_signal,
       |  m.media_id = COALESCE(l.label, m.media_id) AS keep
       |FROM media m
       |LEFT JOIN l${graft.operators.TextOps.CcRounds} l ON l.node = m.media_id
       |LEFT JOIN pflag p ON p.media_id = m.media_id
       |LEFT JOIN sflag s ON s.media_id = m.media_id""".stripMargin
  }

  val resize: String =
    s"""WITH $mediaCte
       |SELECT media_id,
       |  CAST(floor(width / 2) AS INT) AS width,
       |  CAST(floor(height / 2) AS INT) AS height,
       |  CAST(length(substring(payload, 1, CAST(floor(length(payload) / 2) AS INT)))
       |    AS BIGINT) AS n_bytes,
       |  md5(substring(payload, 1, CAST(floor(length(payload) / 2) AS INT))) AS checksum
       |FROM media""".stripMargin

  /** Mirror of MultimodalOps.mediaDecode ∘ mediaPpm: rebuilds the PPM
    * payload's RASTER section (the same rpad-cycled ASCII text) and
    * recomputes what the JVM parser extracts — dims, maxval, raster
    * byte count, byte-sum brightness (`ord` over the 1-based char
    * walk; ASCII ⇒ chars are bytes). Header parsing itself is the
    * JVM's job; the oracle checks its OUTPUT against the ground truth
    * the construction implies.
    */
  val decode: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    8 + doc_id % 16 AS w,
       |    8 + doc_id % 12 AS h,
       |    coalesce(nullif(text, ''), ' ') AS t
       |  FROM documents
       |),
       |p AS (
       |  SELECT media_id, w, h, rpad(t, CAST(w * h * 3 AS INT), t) AS pix FROM m
       |)
       |SELECT media_id,
       |  CAST(w AS INT) AS dec_width,
       |  CAST(h AS INT) AS dec_height,
       |  CAST(255 AS INT) AS dec_maxval,
       |  CAST(w * h * 3 AS BIGINT) AS n_pixel_bytes,
       |  CAST(list_sum(list_transform(range(1, CAST(length(pix) + 1 AS INT)),
       |    i -> ord(pix[CAST(i AS INT)]))) AS BIGINT) AS brightness
       |FROM p""".stripMargin
}
