package graft

import graft.operators.TextOps

/** DuckDB oracle SQL for the text-analysis / dedup operators in
  * [[graft.operators.TextOps]]. Shared determinism contract: whitespace
  * tokenization (`string_split` ≡ Spark `split`), lowercase-hex `md5`
  * (identical digests in both engines), integer folds, and IEEE double
  * division of exact integers — so every value is bit-equal across
  * engines and the driver's hash compare is exact.
  */
object OracleText {

  private val nh = TextOps.NumHashes
  private val bs = TextOps.BandSize
  private val nBands = nh / bs

  /** Mirror of TextOps.withWords. */
  val wordsCte: String =
    """docs AS (
      |  SELECT doc_id, text, lang, string_split(text, ' ') AS words
      |  FROM documents
      |)""".stripMargin

  /** First 15 hex chars of the digest rotated left by `r`, parsed to a
    * 60-bit BIGINT by positional fold (mirror of TextOps.rotLong;
    * DuckDB has no base-16 conv, so the fold is explicit).
    */
  private[graft] def rotLong(h: String, r: Int): String = {
    val prefix15 =
      if (r <= 17) s"substring($h, ${r + 1}, 15)"
      else s"(substring($h, ${r + 1}, ${32 - r}) || substring($h, 1, ${r - 17}))"
    s"""list_reduce(list_transform(range(1, 16),
       |      i -> CAST(strpos('0123456789abcdef',
       |             substring($prefix15, CAST(i AS INT), 1)) - 1 AS BIGINT)),
       |      (a, d) -> a * 16 + d)""".stripMargin
  }

  /** Mirror of TextOps.withShingles + minhashSignatures: one md5 per
    * shingle, NumHashes min-of-rotation aggregates.
    */
  val sigCte: String = {
    val mins = (0 until nh)
      .map(s => s"min(${rotLong("h", s * 3)})").mkString("[", ", ", "]")
    s"""sh AS (
       |  SELECT doc_id, words,
       |    CASE WHEN len(words) >= 3
       |         THEN list_transform(range(len(words) - 2),
       |                i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))
       |         ELSE CAST([] AS VARCHAR[]) END AS shingles
       |  FROM docs
       |),
       |hashed AS (
       |  SELECT doc_id, md5(unnest(shingles)) AS h
       |  FROM sh WHERE len(words) >= 3
       |),
       |sigs AS (
       |  SELECT doc_id, $mins AS sig
       |  FROM hashed GROUP BY doc_id
       |)""".stripMargin
  }

  val tokens: String =
    s"""WITH $wordsCte
       |SELECT doc_id,
       |  CAST(len(words) AS BIGINT) AS n_tokens_ws,
       |  CAST(list_sum(list_transform(words,
       |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens_bpe
       |FROM docs""".stripMargin

  /** Mirror of TextOps.tokensBpe: FAITHFUL merge-order BPE counts.
    * DuckDB lambdas cannot fold an array-typed accumulator
    * (`list_reduce` seeds with the element type), so the encoder runs
    * as a WITH RECURSIVE orbit over the DISTINCT corpus words — the
    * same dictionary device as the old greedy march, now carrying the
    * token sequence as a '|'-delimited STRING ('|t|h|e|'; no corpus
    * word contains '|', spec-asserted). Step: apply merge `mi` as
    * `replace(s, '|a|b|', '|ab|')` — leftmost non-overlapping
    * occurrences, exactly the Spark fold's left-to-right pass — and
    * advance to merge mi+1 only once the string stops changing
    * (consecutive (a,b)(a,b) occurrences share a delimiter, so one
    * replace round can leave the odd ones un-fused; the fixpoint
    * completes them — equivalence with the single-pass Spark fold
    * needs a ≠ b for every merge, spec-asserted). Terminates because
    * each step either strictly shortens s or advances mi; the row
    * with mi = |merges| has no join partner and exits the recursion.
    * Piece count = delimiter count − 1 (empty word → '|' → 0).
    */
  val tokensBpe: String = {
    val mergeRows = TextOps.BpeMerges.zipWithIndex
      .map { case ((a, b), r) => s"($r, '$a', '$b')" }.mkString(", ")
    val nm = TextOps.BpeMerges.size
    s"""WITH RECURSIVE $wordsCte,
       |wm AS (
       |  SELECT doc_id, unnest(words) AS w FROM docs
       |),
       |uw AS (SELECT DISTINCT w FROM wm),
       |merges(rk, a, b) AS (SELECT * FROM (VALUES $mergeRows) v(rk, a, b)),
       |bpe(w, mi, s) AS (
       |  SELECT w, 0, '|' || regexp_replace(w, '(.)', '\\1|', 'g') FROM uw
       |  UNION ALL
       |  SELECT b.w,
       |    CASE WHEN replace(b.s, '|' || m.a || '|' || m.b || '|',
       |                      '|' || m.a || m.b || '|') = b.s
       |         THEN b.mi + 1 ELSE b.mi END,
       |    replace(b.s, '|' || m.a || '|' || m.b || '|',
       |            '|' || m.a || m.b || '|')
       |  FROM bpe b JOIN merges m ON m.rk = b.mi
       |),
       |pieces AS (
       |  SELECT w,
       |    CAST(length(s) - length(replace(s, '|', '')) - 1 AS BIGINT) AS np
       |  FROM bpe WHERE mi = $nm
       |)
       |SELECT m.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(p.np) AS BIGINT) AS n_pieces,
       |  CAST(sum(p.np) AS DOUBLE) / count(*) AS pieces_per_word
       |FROM wm m JOIN pieces p ON p.w = m.w
       |GROUP BY m.doc_id""".stripMargin
  }

  /** Mirror of TextOps.nbClassifier: the same (doc, word, tf) table,
    * per-class HUGEINT counts cast back to BIGINT, identical third-bit
    * integer-log2 scores (TextOps.b3Duck — the same exact integer map
    * as the Spark side's b3Spark), greatest + first-match argmax with
    * the same alphabetical tiebreak.
    */
  val nbClassifier: String = {
    val cs = TextOps.NbClasses
    val m = TextOps.NbTrainMod
    def b3(x: String): String = TextOps.b3Duck(x)
    val wsCols = cs.map(c =>
      s"CAST(sum(CASE WHEN lang = '$c' THEN tf ELSE 0 END) AS BIGINT) AS c_$c")
      .mkString(",\n       |    ")
    val totCols = cs.map(c => s"CAST(sum(c_$c) AS BIGINT) AS n_$c")
      .mkString(",\n       |    ")
    val priCols = cs.map(c =>
      s"CAST(sum(CASE WHEN lang = '$c' THEN 1 ELSE 0 END) AS BIGINT) AS d_$c")
      .mkString(",\n       |    ")
    val pdCols = cs.map(c =>
      s"CAST(sum(tf * ${b3(s"c_$c + 1")}) AS BIGINT) AS b_$c")
      .mkString(",\n       |    ")
    val scoreCols = cs.map(c =>
      s"""CAST(COALESCE(b_$c, 0) - COALESCE(n_tokens, 0) * ${b3(s"COALESCE(n_$c, 0) + v")}
         |      + ${b3(s"COALESCE(d_$c, 0) + 1")} - ${b3(s"d + ${cs.size}")} AS BIGINT) AS s_$c"""
        .stripMargin).mkString(",\n       |    ")
    val predCase = cs.map(c => s"WHEN s_$c = mx THEN '$c'").mkString(" ")
    val sList = cs.map(c => s"s_$c").mkString(", ")
    s"""WITH $wordsCte,
       |tfc AS (
       |  SELECT doc_id, lang, word, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, lang, unnest(words) AS word FROM docs)
       |  GROUP BY doc_id, lang, word
       |),
       |tr AS (SELECT * FROM tfc WHERE doc_id % $m <> 0),
       |ws AS (
       |  SELECT word,
       |    $wsCols
       |  FROM tr GROUP BY word
       |),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS v,
       |    $totCols
       |  FROM ws
       |),
       |pri AS (
       |  SELECT CAST(count(*) AS BIGINT) AS d,
       |    $priCols
       |  FROM documents WHERE doc_id % $m <> 0
       |),
       |pd AS (
       |  SELECT doc_id,
       |    $pdCols
       |  FROM tfc JOIN ws USING (word) GROUP BY doc_id
       |),
       |tok AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens
       |  FROM tfc GROUP BY doc_id
       |),
       |sc AS (
       |  SELECT dd.doc_id, dd.lang, dd.doc_id % $m <> 0 AS is_train,
       |    $scoreCols
       |  FROM documents dd
       |  LEFT JOIN pd USING (doc_id)
       |  LEFT JOIN tok USING (doc_id), tot, pri
       |)
       |SELECT doc_id, lang, is_train,
       |  CASE $predCase END AS pred_lang,
       |  $sList
       |FROM (SELECT *, greatest($sList) AS mx FROM sc)""".stripMargin
  }

  /** Mirror of TextOps.vocabCoverage: the tokensBpe recursive-march
    * dictionary (`bpe` CTE) joined back to the per-source occurrence
    * stream; ratios are single IEEE divisions of exact integers.
    */
  val vocabCoverage: String = {
    val mergeRows = TextOps.BpeMerges.zipWithIndex
      .map { case ((a, b), r) => s"($r, '$a', '$b')" }.mkString(", ")
    val nm = TextOps.BpeMerges.size
    s"""WITH RECURSIVE docs AS (
       |  SELECT doc_id, text, source, string_split(text, ' ') AS words
       |  FROM documents
       |),
       |wm AS (
       |  SELECT source, unnest(words) AS w FROM docs
       |),
       |uw AS (SELECT DISTINCT w FROM wm),
       |merges(rk, a, b) AS (SELECT * FROM (VALUES $mergeRows) v(rk, a, b)),
       |bpe(w, mi, s) AS (
       |  SELECT w, 0, '|' || regexp_replace(w, '(.)', '\\1|', 'g') FROM uw
       |  UNION ALL
       |  SELECT b.w,
       |    CASE WHEN replace(b.s, '|' || m.a || '|' || m.b || '|',
       |                      '|' || m.a || m.b || '|') = b.s
       |         THEN b.mi + 1 ELSE b.mi END,
       |    replace(b.s, '|' || m.a || '|' || m.b || '|',
       |            '|' || m.a || m.b || '|')
       |  FROM bpe b JOIN merges m ON m.rk = b.mi
       |),
       |pieces AS (
       |  SELECT w,
       |    CAST(length(s) - length(replace(s, '|', '')) - 1 AS BIGINT) AS np,
       |    CAST(length(w) AS BIGINT) AS wlen
       |  FROM bpe WHERE mi = $nm
       |),
       |agg AS (
       |  SELECT m.source,
       |    CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(p.np) AS BIGINT) AS n_pieces,
       |    CAST(sum(p.wlen) AS BIGINT) AS n_chars,
       |    CAST(sum(CASE WHEN p.np = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_piece
       |  FROM wm m JOIN pieces p ON p.w = m.w
       |  GROUP BY m.source
       |)
       |SELECT source, n_words, n_pieces, n_chars,
       |  CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE) AS pieces_per_word,
       |  CAST(n_chars AS DOUBLE) / CAST(n_pieces AS DOUBLE) AS chars_per_piece,
       |  CAST(n_single_piece AS DOUBLE) / CAST(n_words AS DOUBLE) AS single_piece_share
       |FROM agg""".stripMargin
  }

  /** Mirror of TextOps.bpeTrain: the same type-dictionary training
    * loop, unrolled as MATERIALIZED CTE rounds (the OracleGraph.kCore
    * device — each round's token table is referenced by both the pair
    * count and the fuse, so inlining would double the chain per
    * round). Token sequences ride the tokensBpe '|'-delimited STRING;
    * pair extraction splits it back to a list and zips adjacent
    * elements; the round's fuse applies the learned pair as
    * `replace('|a|b|','|ab|')` nested 5 deep — non-overlapping
    * leftmost replacement fuses alternate occurrences of a
    * consecutive chain per application, so 5 applications reach the
    * fixpoint for chains up to 2^5 pair occurrences (64-char words;
    * corpus words are an order of magnitude shorter), and at fixpoint
    * the result equals the Spark fold's single left-to-right pass for
    * every a ≠ b pair — the a = b case both engines exclude.
    */
  val bpeTrain: String = {
    val pat = "'|' || a || '|' || b || '|'"
    val rep = "'|' || a || b || '|'"
    def rounds = (1 to TextOps.BpeTrainRounds).map { i =>
      val prev = s"t${i - 1}"
      val fused = (1 to 5).foldLeft("s") { (acc, _) =>
        s"replace($acc, $pat, $rep)"
      }
      s"""p$i AS MATERIALIZED (
         |  SELECT pr.a AS a, pr.b AS b, CAST(sum(f) AS BIGINT) AS cnt FROM (
         |    SELECT f, unnest(list_transform(range(1, len(tk)),
         |      j -> {'a': tk[j], 'b': tk[j + 1]})) AS pr
         |    FROM (SELECT f, string_split(trim(s, '|'), '|') AS tk FROM $prev)
         |  ) WHERE pr.a <> pr.b GROUP BY 1, 2
         |),
         |b$i AS MATERIALIZED (
         |  SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
         |),
         |t$i AS MATERIALIZED (
         |  SELECT f, $fused AS s FROM $prev, b$i
         |)""".stripMargin
    }.mkString(",\n")
    val selects = (1 to TextOps.BpeTrainRounds).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS "rank", a, b, cnt AS pair_count FROM b$i"""
    }.mkString("\nUNION ALL\n")
    s"""WITH $wordsCte,
       |wm AS MATERIALIZED (SELECT unnest(words) AS w FROM docs),
       |wf AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM wm GROUP BY w
       |),
       |t0 AS MATERIALIZED (
       |  SELECT f, '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s FROM wf
       |),
       |$rounds
       |$selects""".stripMargin
  }

  /** Mirror of TextOps.unigramTrain: the SAME plan-time composition
    * literal (rendered as VALUES from TextOps.unigramPartRows — one
    * generator, zero drift), the same third-bit integer-log2 scores
    * (TextOps.b3Duck), EM rounds unrolled as MATERIALIZED CTEs with
    * the window-rank form of the Spark side's struct-min argmax
    * (identical selection under the same (score DESC, comp_id ASC)
    * order on exact integers).
    */
  /** The shared WITH-chain of the unigram family (through the final
    * vocabulary CTE `v{UnigramRounds}`) — one definition consumed by
    * [[unigramTrain]] and the encoder mirror [[tokensUnigram]]. */
  private val unigramCtes: String = {
    def b3(x: String): String = TextOps.b3Duck(x)
    val partsVals = TextOps.unigramPartRows
      .map { case (wl, cid, np, ps, pl) => s"($wl,$cid,$np,$ps,$pl)" }
      .mkString(", ")
    def pruneCtes(src: String, k: Int, out: String): String =
      s"""${out}_t AS MATERIALIZED (
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt,
         |      row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
         |    FROM $src) WHERE rk <= $k
         |),
         |$out AS MATERIALIZED (
         |  SELECT piece, cnt FROM ${out}_t
         |  UNION ALL
         |  SELECT a.piece, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
         |  FROM alpha a
         |  LEFT JOIN $src c ON c.piece = a.piece
         |  WHERE a.piece NOT IN (SELECT piece FROM ${out}_t)
         |)""".stripMargin
    def round(i: Int): String = {
      val prev = s"v${i - 1}"
      s"""z$i AS MATERIALIZED (
         |  SELECT ${b3("ctot + v")} AS z FROM (
         |    SELECT CAST(sum(cnt) AS BIGINT) AS ctot,
         |           CAST(count(*) AS BIGINT) AS v FROM $prev)
         |),
         |seg$i AS MATERIALIZED (
         |  SELECT c.w, c.f, c.comp_id,
         |    CAST(sum(${b3("vv.cnt + 1")}) AS BIGINT)
         |      - c.n_parts * (SELECT z FROM z$i) AS score
         |  FROM (SELECT d.w, d.f, p.comp_id, p.n_parts,
         |          substring(d.w, p.pstart, p.plen) AS piece
         |        FROM wf d JOIN parts p ON length(d.w) = p.wlen) c
         |  JOIN $prev vv ON vv.piece = c.piece
         |  GROUP BY c.w, c.f, c.comp_id, c.n_parts
         |  HAVING count(*) = c.n_parts
         |),
         |best$i AS MATERIALIZED (
         |  SELECT w, f, comp_id FROM (
         |    SELECT w, f, comp_id, row_number() OVER (
         |      PARTITION BY w ORDER BY score DESC, comp_id ASC) AS rk
         |    FROM seg$i) WHERE rk = 1
         |),
         |cnt$i AS MATERIALIZED (
         |  SELECT substring(b.w, p.pstart, p.plen) AS piece,
         |    CAST(sum(b.f) AS BIGINT) AS cnt
         |  FROM best$i b JOIN parts p
         |    ON length(b.w) = p.wlen AND b.comp_id = p.comp_id
         |  GROUP BY 1
         |),
         |${pruneCtes(s"cnt$i", TextOps.UnigramVocab, s"v$i")}"""
    }
    s"""$wordsCte,
       |wm AS MATERIALIZED (SELECT unnest(words) AS w FROM docs),
       |wf AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM wm
       |  WHERE length(w) BETWEEN 1 AND ${TextOps.UnigramMaxWord} GROUP BY w
       |),
       |alpha AS MATERIALIZED (
       |  SELECT DISTINCT unnest(list_transform(range(1, length(w) + 1),
       |    i -> substring(w, i, 1))) AS piece FROM wf
       |),
       |parts(wlen, comp_id, n_parts, pstart, plen) AS MATERIALIZED (
       |  VALUES $partsVals
       |),
       |seed AS MATERIALIZED (
       |  SELECT piece, CAST(sum(f) AS BIGINT) AS cnt FROM (
       |    SELECT f, unnest(flatten(list_transform(range(1, length(w) + 1),
       |      i -> list_transform(
       |        range(i, least(length(w), i + ${TextOps.UnigramMaxPiece - 1}) + 1),
       |        j -> substring(w, i, j - i + 1))))) AS piece
       |    FROM wf)
       |  GROUP BY 1
       |),
       |${pruneCtes("seed", TextOps.UnigramSeedVocab, "v0")},
       |${(1 to TextOps.UnigramRounds).map(round).mkString(",\n")}""".stripMargin
  }

  val unigramTrain: String =
    s"""WITH $unigramCtes
       |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC) AS BIGINT)
       |    AS "rank",
       |  piece, cnt
       |FROM v${TextOps.UnigramRounds}""".stripMargin

  /** Mirror of TextOps.tokensUnigram: one more E-step over the FINAL
    * vocabulary (the same seg/best shape as the training rounds),
    * piece counts left-joined onto the occurrence stream with the
    * character fallback for words beyond the cap.
    */
  val tokensUnigram: String = {
    def b3(x: String): String = TextOps.b3Duck(x)
    val vf = s"v${TextOps.UnigramRounds}"
    s"""WITH $unigramCtes,
       |zf AS MATERIALIZED (
       |  SELECT ${b3("ctot + v")} AS z FROM (
       |    SELECT CAST(sum(cnt) AS BIGINT) AS ctot,
       |           CAST(count(*) AS BIGINT) AS v FROM $vf)
       |),
       |segf AS MATERIALIZED (
       |  SELECT c.w, c.comp_id, c.n_parts,
       |    CAST(sum(${b3("vv.cnt + 1")}) AS BIGINT)
       |      - c.n_parts * (SELECT z FROM zf) AS score
       |  FROM (SELECT d.w, p.comp_id, p.n_parts,
       |          substring(d.w, p.pstart, p.plen) AS piece
       |        FROM wf d JOIN parts p ON length(d.w) = p.wlen) c
       |  JOIN $vf vv ON vv.piece = c.piece
       |  GROUP BY c.w, c.comp_id, c.n_parts
       |  HAVING count(*) = c.n_parts
       |),
       |bestf AS MATERIALIZED (
       |  SELECT w, n_parts AS bnp FROM (
       |    SELECT w, n_parts, row_number() OVER (
       |      PARTITION BY w ORDER BY score DESC, comp_id ASC) AS rk
       |    FROM segf) WHERE rk = 1
       |),
       |wmd AS (SELECT doc_id, unnest(words) AS w FROM docs)
       |SELECT m.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(COALESCE(b.bnp, length(m.w))) AS BIGINT) AS n_pieces,
       |  CAST(sum(COALESCE(b.bnp, length(m.w))) AS DOUBLE) / count(*)
       |    AS pieces_per_word
       |FROM wmd m LEFT JOIN bestf b ON b.w = m.w
       |GROUP BY m.doc_id""".stripMargin
  }

  val quality: String =
    s"""WITH $wordsCte
       |SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(words) AS BIGINT) AS n_words,
       |  CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS uniq_ratio,
       |  CAST(len(list_filter(words, w -> list_contains(
       |    ['the','a','of','and','to','in','is','it','on','for'], w))) AS DOUBLE)
       |    / len(words) AS stopword_ratio,
       |  CAST(length(text) AS DOUBLE) / len(words) AS avg_token_len
       |FROM docs""".stripMargin

  private def score(words: String): String =
    s"CAST(len(list_filter(words, w -> list_contains([$words], w))) AS BIGINT)"

  val langid: String =
    s"""WITH $wordsCte,
       |scored AS (
       |  SELECT doc_id, lang,
       |    ${score("'the','a','of','and','to','is'")} AS score_en,
       |    ${score("'el','la','de','y','que','en'")} AS score_es,
       |    ${score("'der','die','und','das','ist','ein'")} AS score_de,
       |    ${score("'le','les','et','des','un','une'")} AS score_fr
       |  FROM docs
       |)
       |SELECT doc_id, lang, score_en, score_es, score_de, score_fr,
       |  CASE WHEN score_en >= score_es AND score_en >= score_de
       |            AND score_en >= score_fr THEN 'en'
       |       WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
       |       WHEN score_de >= score_fr THEN 'de'
       |       ELSE 'fr' END AS lang_pred
       |FROM scored""".stripMargin

  val fingerprint: String =
    s"""WITH $wordsCte
       |SELECT doc_id,
       |  md5(array_to_string(list_sort(list_distinct(words)), ' ')) AS fingerprint
       |FROM docs""".stripMargin

  val dedupExact: String =
    """SELECT md5(text) AS content_hash,
      |  min(doc_id) AS canonical_doc_id,
      |  count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)""".stripMargin

  val minhash: String =
    s"""WITH $wordsCte, $sigCte
       |SELECT doc_id,
       |  array_to_string(list_transform(sig, x -> CAST(x AS VARCHAR)), '|') AS sig
       |FROM sigs""".stripMargin

  /** Banded LSH candidate pairs — band the signature, bucket-join,
    * estimate Jaccard from signature agreement (mirror of
    * TextOps.dedupMinhashLsh; sig index is 1-based here, 0-based in Spark).
    */
  val dedupMinhashLsh: String =
    s"""WITH $wordsCte, $sigCte,
       |bands AS (
       |  SELECT doc_id, sig, b.b AS band_idx,
       |    array_to_string(list_transform(list_slice(sig, b.b * $bs + 1, b.b * $bs + $bs),
       |                                   x -> CAST(x AS VARCHAR)), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range($nBands)) AS b) b
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_filter(range(1, ${nh + 1}),
       |    i -> a.sig[CAST(i AS INT)] = b.sig[CAST(i AS INT)])) AS DOUBLE) / $nh
       |    AS est_jaccard
       |FROM bands a JOIN bands b USING (band_idx, band_key)
       |WHERE a.doc_id < b.doc_id""".stripMargin

  val dedupNgramJaccard: String =
    s"""WITH $wordsCte, $sigCte,
       |bands AS (
       |  SELECT doc_id, sig, b.b AS band_idx,
       |    array_to_string(list_transform(list_slice(sig, b.b * $bs + 1, b.b * $bs + $bs),
       |                                   x -> CAST(x AS VARCHAR)), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range($nBands)) AS b) b
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.doc_id < b.doc_id
       |),
       |shsets AS (
       |  SELECT doc_id, list_distinct(shingles) AS shset FROM sh
       |)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(len(list_intersect(sa.shset, sb.shset)) AS DOUBLE) /
       |    (len(sa.shset) + len(sb.shset) - len(list_intersect(sa.shset, sb.shset)))
       |    AS jaccard
       |FROM pairs p
       |JOIN shsets sa ON sa.doc_id = p.doc_a
       |JOIN shsets sb ON sb.doc_id = p.doc_b""".stripMargin

  /** Mirror of TextOps.dupSpans — stride-1 window hashes, corpus
    * duplicate-frequency filter, gaps-and-islands merge (aligned
    * double-unnest zips starts with hashes).
    */
  val dupSpans: String = {
    val w = TextOps.DupSpanLen
    val f = TextOps.DupSpanFreq
    s"""WITH $wordsCte,
       |wins AS (
       |  SELECT doc_id,
       |    unnest(range(len(words) - $w + 1)) AS "start",
       |    md5(unnest(list_transform(range(len(words) - $w + 1),
       |      i -> array_to_string(list_slice(words, i + 1, i + $w), ' ')))) AS h
       |  FROM docs WHERE len(words) >= $w
       |),
       |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= $f),
       |marked AS (SELECT doc_id, "start" FROM wins JOIN dup USING (h)),
       |lagged AS (
       |  SELECT doc_id, "start",
       |    lag("start") OVER (PARTITION BY doc_id ORDER BY "start") AS prev
       |  FROM marked
       |),
       |isl AS (
       |  SELECT doc_id, "start",
       |    sum(CASE WHEN prev IS NULL OR "start" - prev > $w THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY "start") AS grp
       |  FROM lagged
       |)
       |SELECT doc_id, min("start") AS span_start, max("start") + $w AS span_end,
       |  count(*) AS n_dup_windows
       |FROM isl GROUP BY doc_id, grp""".stripMargin
  }

  /** Mirror of TextOps.corpusScorecard — exact integer sums per
    * source, digest-frequency dup flags, terminal IEEE divisions.
    */
  val corpusScorecard: String =
    """WITH d AS (
      |  SELECT doc_id, source, lang, text,
      |    string_split(text, ' ') AS words, md5(text) AS digest
      |  FROM documents
      |),
      |dup AS (
      |  SELECT digest, 1 AS isdup FROM d
      |  WHERE digest IS NOT NULL GROUP BY digest HAVING count(*) >= 2
      |),
      |agg AS (
      |  SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |    CAST(sum(len(words)) AS BIGINT) AS n_tokens,
      |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
      |    CAST(sum(len(list_distinct(words))) AS BIGINT) AS n_uniq_tokens,
      |    CAST(sum(len(list_filter(words, w -> list_contains(
      |      ['the','a','of','and','to','in','is','it','on','for'], w))))
      |      AS BIGINT) AS n_stopwords,
      |    CAST(sum(CASE WHEN dup.isdup IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_dup_docs
      |  FROM d LEFT JOIN dup USING (digest)
      |  GROUP BY source
      |)
      |SELECT source, n_docs, n_langs, n_tokens, n_chars,
      |  CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_doc_tokens,
      |  CAST(n_uniq_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_token_share,
      |  CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_share,
      |  CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_doc_share
      |FROM agg""".stripMargin

  /** Mirror of TextOps.dsir — add-one integer-log2 unigram log-ratio,
    * BIGINT-cast sums (DuckDB integer sums widen to HUGEINT otherwise).
    */
  val dsir: String = {
    val t = TextOps.DsirTargetLang
    s"""WITH $wordsCte,
       |tfc AS (
       |  SELECT doc_id, lang, word, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, lang, unnest(words) AS word FROM docs)
       |  GROUP BY doc_id, lang, word
       |),
       |ws AS (
       |  SELECT word,
       |    CAST(sum(CASE WHEN lang = '$t' THEN tf ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(sum(CASE WHEN lang <> '$t' THEN tf ELSE 0 END) AS BIGINT) AS cs
       |  FROM tfc GROUP BY word
       |),
       |tot AS (
       |  SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cs) AS BIGINT) AS ss
       |  FROM ws
       |),
       |scored AS (
       |  SELECT word,
       |    CAST((length(bin(ss)) - length(bin(cs + 1))) -
       |         (length(bin(tt)) - length(bin(ct + 1))) AS BIGINT) AS wbits
       |  FROM ws, tot
       |),
       |pd AS (
       |  SELECT doc_id,
       |    CAST(sum(tf * wbits) AS BIGINT) AS dsir_bits,
       |    CAST(sum(tf) AS BIGINT) AS n_words
       |  FROM tfc JOIN scored USING (word) GROUP BY doc_id
       |)
       |SELECT d.doc_id, d.lang,
       |  COALESCE(pd.n_words, 0) AS n_words,
       |  COALESCE(pd.dsir_bits, 0) AS dsir_bits,
       |  CASE WHEN COALESCE(pd.n_words, 0) > 0
       |       THEN CAST(pd.dsir_bits AS DOUBLE) / CAST(pd.n_words AS DOUBLE)
       |       ELSE 0.0 END AS mean_bits
       |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin
  }

  /** Mirror of TextOps.fuzzyJoin — the LSH band join with the
    * cross-side predicate in the candidate stream, exact shingle
    * Jaccard verify, threshold filter.
    */
  val fuzzyJoin: String =
    s"""WITH $wordsCte, $sigCte,
       |sides AS (
       |  SELECT doc_id, CAST(substring(source, 4, 8) AS INT) % 2 AS side
       |  FROM documents
       |),
       |bands AS (
       |  SELECT doc_id, sig, b.b AS band_idx,
       |    array_to_string(list_transform(list_slice(sig, b.b * $bs + 1, b.b * $bs + $bs),
       |                                   x -> CAST(x AS VARCHAR)), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range($nBands)) AS b) b
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  JOIN sides sa ON sa.doc_id = a.doc_id
       |  JOIN sides sb ON sb.doc_id = b.doc_id
       |  WHERE sa.side = 0 AND sb.side = 1
       |),
       |shsets AS (
       |  SELECT doc_id, list_distinct(shingles) AS shset FROM sh
       |)
       |SELECT left_id, right_id, jaccard FROM (
       |  SELECT p.left_id, p.right_id,
       |    CAST(len(list_intersect(sa.shset, sb.shset)) AS DOUBLE) /
       |      (len(sa.shset) + len(sb.shset) - len(list_intersect(sa.shset, sb.shset)))
       |      AS jaccard
       |  FROM pairs p
       |  JOIN shsets sa ON sa.doc_id = p.left_id
       |  JOIN shsets sb ON sb.doc_id = p.right_id
       |) WHERE jaccard >= ${TextOps.FuzzyJoinThreshold}""".stripMargin

  /** Mirror of TextOps.simhash — one md5 per exploded word, 32 integer
    * sum aggregates, sign bits concatenated.
    */
  val simhashCte: String = {
    val sums = (0 until 32).map { j =>
      s"""sum(2 * ((strpos('0123456789abcdef',
         |        substring(h, ${j + 1}, 1)) - 1) % 2) - 1) AS b$j""".stripMargin
    }.mkString(",\n")
    val bits = (0 until 32)
      .map(j => s"CASE WHEN b$j > 0 THEN '1' ELSE '0' END")
      .mkString(" || ")
    s"""wordhash AS (
       |  SELECT doc_id, md5(unnest(words)) AS h FROM docs
       |),
       |bitsums AS (
       |  SELECT doc_id,
       |$sums
       |  FROM wordhash GROUP BY doc_id
       |),
       |simhashed AS (
       |  SELECT doc_id, $bits AS simhash FROM bitsums
       |)""".stripMargin
  }

  val simhash: String =
    s"""WITH $wordsCte, $simhashCte
       |SELECT doc_id, simhash FROM simhashed""".stripMargin

  val dedupSimhash: String =
    s"""WITH $wordsCte, $simhashCte
       |SELECT simhash, min(doc_id) AS canonical_doc_id,
       |  count(*) AS cluster_size
       |FROM simhashed
       |GROUP BY simhash
       |HAVING count(*) > 1""".stripMargin

  /** Mirror of TextOps.split90_5_5 (hex fold = Spark conv base 16). */
  val split: String =
    s"""WITH b AS (
       |  SELECT doc_id,
       |    list_reduce(list_transform(range(1, 16),
       |      i -> CAST(strpos('0123456789abcdef', substring(
       |             md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT)),
       |      (a, d) -> a * 16 + d) % 100 AS bucket
       |  FROM documents
       |)
       |SELECT doc_id, bucket,
       |  CASE WHEN bucket < 90 THEN 'train'
       |       WHEN bucket < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b""".stripMargin

  /** Mirror of TextOps.normalize (ASCII-only regex — Java and RE2
    * agree).
    */
  val normalize: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS text_clean,
      |  CAST(length(text) AS BIGINT) AS n_chars_raw,
      |  CAST(length(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS n_chars_clean
      |FROM documents""".stripMargin

  /** Mirror of TextOps.dedupClusters: the same CcRounds unrolled
    * min-label propagation over the LSH pair graph.
    */
  val dedupClusters: String = {
    val rounds = (1 to TextOps.CcRounds).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS (
         |  SELECT n.node,
         |    least(n.label, COALESCE(m.nbr, n.label)) AS label
         |  FROM $prev n LEFT JOIN (
         |    SELECT e.doc_a AS node, min(x.label) AS nbr
         |    FROM edges e JOIN $prev x ON x.node = e.doc_b
         |    GROUP BY e.doc_a
         |  ) m USING (node)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $wordsCte, $sigCte,
       |bands AS (
       |  SELECT doc_id, sig, b.b AS band_idx,
       |    array_to_string(list_transform(list_slice(sig, b.b * $bs + 1, b.b * $bs + $bs),
       |                                   x -> CAST(x AS VARCHAR)), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range($nBands)) AS b) b
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.doc_id < b.doc_id
       |),
       |edges AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
       |),
       |nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$rounds
       |SELECT node AS doc_id, label AS cluster_id,
       |  count(*) OVER (PARTITION BY label) AS cluster_size
       |FROM l${TextOps.CcRounds}""".stripMargin
  }

  /** Mirror of TextOps.dedupFuzzyEdit: levenshtein only on LSH
    * candidates.
    */
  val dedupFuzzyEdit: String =
    s"""WITH $wordsCte, $sigCte,
       |bands AS (
       |  SELECT doc_id, sig, b.b AS band_idx,
       |    array_to_string(list_transform(list_slice(sig, b.b * $bs + 1, b.b * $bs + $bs),
       |                                   x -> CAST(x AS VARCHAR)), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range($nBands)) AS b) b
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.doc_id < b.doc_id
       |)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
       |  CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len
       |FROM pairs p
       |JOIN documents da ON da.doc_id = p.doc_a
       |JOIN documents db ON db.doc_id = p.doc_b""".stripMargin

  /** Mirror of TextOps.corpusCuration: quality gate → exact-dup keep →
    * near-dup-loser drop → per-language stats (same cluster rounds as
    * dedupClusters).
    */
  val corpusCuration: String = {
    val rounds = (1 to TextOps.CcRounds).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS (
         |  SELECT n.node,
         |    least(n.label, COALESCE(m.nbr, n.label)) AS label
         |  FROM $prev n LEFT JOIN (
         |    SELECT e.doc_a AS node, min(x.label) AS nbr
         |    FROM edges e JOIN $prev x ON x.node = e.doc_b
         |    GROUP BY e.doc_a
         |  ) m USING (node)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $wordsCte, $sigCte,
       |bands AS (
       |  SELECT doc_id, sig, b.b AS band_idx,
       |    array_to_string(list_transform(list_slice(sig, b.b * $bs + 1, b.b * $bs + $bs),
       |                                   x -> CAST(x AS VARCHAR)), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range($nBands)) AS b) b
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.doc_id < b.doc_id
       |),
       |edges AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
       |),
       |nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$rounds,
       |near_dup_losers AS (
       |  SELECT node AS doc_id FROM l${TextOps.CcRounds} WHERE node <> label
       |),
       |q AS (
       |  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words
       |  FROM docs
       |  WHERE len(words) >= ${TextOps.MinWords}
       |    AND CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
       |          >= ${TextOps.MinUniqRatio}
       |),
       |exact_canonical AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
       |),
       |kept AS (
       |  SELECT q.doc_id, q.n_words FROM q
       |  WHERE q.doc_id IN (SELECT doc_id FROM exact_canonical)
       |    AND q.doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
       |)
       |SELECT d.lang,
       |  count(*) AS n_docs,
       |  CAST(sum(k.n_words) AS BIGINT) AS n_words_total,
       |  min(k.doc_id) AS first_doc,
       |  max(k.doc_id) AS last_doc
       |FROM kept k JOIN documents d USING (doc_id)
       |GROUP BY d.lang""".stripMargin
  }

  /** Shared staged-CTE chain for the corpus-export mirrors: the
    * corpusCuration gates (quality, exact-canonical, near-dup losers
    * via the same unrolled label propagation), the decontaminate keep
    * set, then the mixture downsampling (√(T_min/T_s) basis-point
    * rates — the same int/int-in-double + IEEE-sqrt discipline as
    * mixWeights). Every stage CTE is MATERIALIZED: the stages query
    * references each one twice and s5 references s4 three times — left
    * to DuckDB's default inlining, each copy would re-expand the
    * 2^CcRounds propagation chain (the OracleGraph.kCore EMFILE
    * lesson).
    */
  private def exportCte: String = {
    val rounds = (1 to TextOps.CcRounds).map { i =>
      val prev = s"l${i - 1}"
      s"""l$i AS (
         |  SELECT n.node,
         |    least(n.label, COALESCE(m.nbr, n.label)) AS label
         |  FROM $prev n LEFT JOIN (
         |    SELECT e.doc_a AS node, min(x.label) AS nbr
         |    FROM edges e JOIN $prev x ON x.node = e.doc_b
         |    GROUP BY e.doc_a
         |  ) m USING (node)
         |)""".stripMargin
    }.mkString(",\n")
    val n = TextOps.ContamNgram
    val m = TextOps.EvalStride
    s"""WITH $wordsCte, $sigCte,
       |bands AS (
       |  SELECT doc_id, sig, b.b AS band_idx,
       |    array_to_string(list_transform(list_slice(sig, b.b * $bs + 1, b.b * $bs + $bs),
       |                                   x -> CAST(x AS VARCHAR)), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest(range($nBands)) AS b) b
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b USING (band_idx, band_key)
       |  WHERE a.doc_id < b.doc_id
       |),
       |edges AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
       |),
       |nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$rounds,
       |near_dup_losers AS MATERIALIZED (
       |  SELECT node AS doc_id FROM l${TextOps.CcRounds} WHERE node <> label
       |),
       |g8 AS (
       |  SELECT doc_id,
       |    CASE WHEN len(words) >= $n
       |         THEN list_transform(range(len(words) - ${n - 1}),
       |                i -> md5(array_to_string(list_slice(words, i + 1, i + $n), ' ')))
       |         ELSE CAST([] AS VARCHAR[]) END AS grams
       |  FROM docs
       |),
       |evalg AS MATERIALIZED (
       |  SELECT DISTINCT unnest(grams) AS g FROM g8 WHERE doc_id % $m = 0
       |),
       |decon_keep AS MATERIALIZED (
       |  SELECT doc_id FROM g8 WHERE doc_id % $m <> 0 AND doc_id NOT IN (
       |    SELECT DISTINCT doc_id FROM (
       |      SELECT doc_id, unnest(grams) AS g FROM g8 WHERE doc_id % $m <> 0)
       |    WHERE g IN (SELECT g FROM evalg))
       |),
       |base AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ${rotLong("md5(text)", 0)} % ${TextOps.ExportRateBp} AS bucket,
       |    ${rotLong("md5(text)", 0)} % ${TextOps.NumShards} AS shard
       |  FROM documents
       |),
       |q AS MATERIALIZED (
       |  SELECT doc_id FROM docs
       |  WHERE len(words) >= ${TextOps.MinWords}
       |    AND CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
       |          >= ${TextOps.MinUniqRatio}
       |),
       |s1 AS MATERIALIZED (
       |  SELECT * FROM base WHERE doc_id IN (SELECT doc_id FROM q)
       |),
       |s2 AS MATERIALIZED (
       |  SELECT * FROM s1 WHERE doc_id IN (
       |    SELECT min(doc_id) FROM documents GROUP BY md5(text))
       |),
       |s3 AS MATERIALIZED (
       |  SELECT * FROM s2
       |  WHERE doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
       |),
       |s4 AS MATERIALIZED (
       |  SELECT * FROM s3 WHERE doc_id IN (SELECT doc_id FROM decon_keep)
       |),
       |persrc AS MATERIALIZED (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_s
       |  FROM s4 GROUP BY source
       |),
       |rates AS MATERIALIZED (
       |  SELECT source,
       |    CAST(floor(sqrt(CAST(t.t_min AS DOUBLE) / CAST(t_s AS DOUBLE))
       |      * ${TextOps.ExportRateBp}) AS BIGINT) AS rate_bp
       |  FROM persrc, (SELECT min(t_s) AS t_min FROM persrc) t
       |),
       |s5 AS MATERIALIZED (
       |  SELECT s4.* FROM s4 JOIN rates USING (source)
       |  WHERE bucket < rate_bp
       |)""".stripMargin
  }

  /** Mirror of TextOps.corpusExport: shard manifest over the final
    * survivor set.
    */
  val corpusExport: String = {
    val b = TextOps.PackBudget
    s"""$exportCte
       |SELECT shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST((CAST(sum(n_tokens) AS BIGINT) + ${b - 1}) // $b AS BIGINT)
       |    AS n_seqs
       |FROM s5 GROUP BY shard""".stripMargin
  }

  /** Mirror of TextOps.corpusExportStages: per-stage attrition rows. */
  val corpusExportStages: String = {
    val names = Seq("base", "s1", "s2", "s3", "s4", "s5")
    val labels = Seq("quality", "dedup_exact", "dedup_near",
      "decontaminate", "mix_sample")
    val rows = labels.zipWithIndex.map { case (nm, i) =>
      s"""SELECT CAST(${i + 1} AS BIGINT) AS stage_ord, '$nm' AS stage,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ${names(i)}) AS docs_in,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ${names(i + 1)}) AS docs_kept,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ${names(i)})
         |    - (SELECT CAST(count(*) AS BIGINT) FROM ${names(i + 1)})
         |    AS docs_dropped""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$exportCte
       |$rows""".stripMargin
  }

  /** Mirror of TextOps.tfidf (log-free idf ratio; see that Scaladoc). */
  val tfidf: String =
    s"""WITH $wordsCte,
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |tc AS (
       |  SELECT doc_id, unnest(words) AS word FROM docs
       |),
       |termcounts AS (
       |  SELECT doc_id, word, count(*) AS tf FROM tc GROUP BY doc_id, word
       |),
       |docfreq AS (
       |  SELECT word, count(*) AS df FROM termcounts GROUP BY word
       |),
       |scored AS (
       |  SELECT t.doc_id, t.word, t.tf,
       |    t.tf * ((n.n_docs + 1.0) / (d.df + 1.0)) AS tfidf
       |  FROM termcounts t JOIN docfreq d USING (word), n
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS "rank"
       |  FROM scored
       |)
       |SELECT doc_id, "rank", word, tf, tfidf FROM ranked WHERE "rank" <= 3""".stripMargin

  /** Mirror of TextOps.decontaminate — and of decontaminateBloom: the
    * Bloom pre-filter is followed by an exact verify, so both variants
    * produce this same relation (the differential proof).
    */
  val decontaminate: String = {
    val n = TextOps.ContamNgram
    val m = TextOps.EvalStride
    s"""WITH $wordsCte,
       |g8 AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN len(words) >= $n
       |         THEN list_transform(range(len(words) - ${n - 1}),
       |                i -> md5(array_to_string(list_slice(words, i + 1, i + $n), ' ')))
       |         ELSE CAST([] AS VARCHAR[]) END AS grams
       |  FROM docs
       |),
       |evalg AS (
       |  SELECT DISTINCT unnest(grams) AS g FROM g8 WHERE doc_id % $m = 0
       |),
       |traing AS (
       |  SELECT doc_id, unnest(grams) AS g FROM g8 WHERE doc_id % $m <> 0
       |),
       |hits AS (
       |  SELECT doc_id, count(DISTINCT g) AS n_hit_ngrams
       |  FROM traing WHERE g IN (SELECT g FROM evalg)
       |  GROUP BY doc_id
       |)
       |SELECT t.doc_id, t.lang,
       |  COALESCE(h.n_hit_ngrams, 0) AS n_hit_ngrams,
       |  COALESCE(h.n_hit_ngrams, 0) = 0 AS keep
       |FROM (SELECT doc_id, lang FROM g8 WHERE doc_id % $m <> 0) t
       |LEFT JOIN hits h USING (doc_id)""".stripMargin
  }

  /** Mirror of TextOps.decontaminateMulti: both filter mirrors nested
    * as subqueries, one doc-keyed join, identical flag arithmetic. */
  val decontaminateMulti: String =
    s"""SELECT s.doc_id, s.lang, s.n_hit_ngrams,
       |  s.n_hit_ngrams > 0 AS surface_hit,
       |  e.n_hits AS n_sem_hits, e.max_sim,
       |  e.n_hits > 0 AS semantic_hit,
       |  NOT (s.n_hit_ngrams > 0) AND NOT (e.n_hits > 0) AS keep
       |FROM ($decontaminate) s
       |JOIN (${OracleVectors.embDecontaminate()}) e ON e.vec_id = s.doc_id""".stripMargin

  /** Mirror of TextOps.pack: per-bucket running token sum, integer
    * division into sequence slots.
    */
  val pack: String = {
    val budget = TextOps.PackBudget
    val buckets = TextOps.PackBuckets
    s"""WITH $wordsCte,
       |toks AS (
       |  SELECT doc_id, doc_id % $buckets AS bucket,
       |    CAST(len(words) AS BIGINT) AS n_tokens
       |  FROM docs
       |),
       |runs AS (
       |  SELECT doc_id, bucket, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS start_off
       |  FROM toks
       |)
       |SELECT doc_id, bucket, n_tokens,
       |  CAST(start_off // $budget AS BIGINT) AS seq_id,
       |  -- start_off is HUGEINT (DuckDB windowed SUM over BIGINT); % would
       |  -- surface as DOUBLE in pandas without the explicit cast
       |  CAST(start_off % $budget AS BIGINT) AS seq_offset
       |FROM runs""".stripMargin
  }

  /** Mirror of TextOps.sampleStratified: the md5-prefix 60-bit hash
    * bucket (rotLong's positional fold at rotation 0) against the
    * per-language keep rates.
    */
  val sampleStratified: String = {
    val rateCase = TextOps.SampleRates.foldRight(
      s"${TextOps.SampleDefaultRate}") {
      case ((l, r), acc) => s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }
    s"""WITH hashed AS (
       |  SELECT doc_id, lang,
       |    ${rotLong("md5(text)", 0)} % 100 AS sample_bucket
       |  FROM documents
       |)
       |SELECT doc_id, lang, sample_bucket
       |FROM hashed
       |WHERE sample_bucket < $rateCase""".stripMargin
  }

  /** Mirror of TextOps.repetition: duplicate-word fraction and the
    * top word-bigram's token share.
    */
  val repetition: String =
    s"""WITH $wordsCte,
       |base AS (
       |  SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(len(words) - len(list_distinct(words)) AS BIGINT) AS n_dup_words,
       |    CASE WHEN len(words) >= 2
       |         THEN list_transform(range(len(words) - 1),
       |                i -> array_to_string(list_slice(words, i + 1, i + 2), ' '))
       |         ELSE CAST([] AS VARCHAR[]) END AS bigrams
       |  FROM docs
       |),
       |grams AS (
       |  SELECT doc_id, unnest(bigrams) AS bg FROM base
       |),
       |cnt AS (
       |  SELECT doc_id, bg, count(*) AS c FROM grams GROUP BY doc_id, bg
       |),
       |top AS (
       |  SELECT doc_id, max(c) AS top_bigram_n FROM cnt GROUP BY doc_id
       |)
       |SELECT b.doc_id, b.n_words, b.n_dup_words,
       |  CAST(b.n_dup_words AS DOUBLE) / b.n_words AS dup_word_frac,
       |  COALESCE(t.top_bigram_n, 0) AS top_bigram_n,
       |  CASE WHEN b.n_words >= 2
       |       THEN CAST(COALESCE(t.top_bigram_n, 0) AS DOUBLE) / (b.n_words - 1)
       |       ELSE 0.0 END AS top_bigram_frac
       |FROM base b LEFT JOIN top t USING (doc_id)""".stripMargin

  /** Mirror of TextOps.dedupSegments: non-overlapping SegLen-word
    * windows, corpus-frequency filter on the segment md5, ordered
    * reconstruction. DuckDB zips the two same-length `unnest`s
    * positionally, which is exactly Spark's posexplode.
    */
  val dedupSegments: String = {
    val L = TextOps.SegLen
    val f = TextOps.SegDupFreq
    s"""WITH $wordsCte,
       |segd AS (
       |  SELECT doc_id,
       |    list_transform(range((len(words) - 1) // $L + 1),
       |      i -> array_to_string(list_slice(words, CAST(i * $L + 1 AS INT),
       |             CAST(i * $L + $L AS INT)), ' ')) AS segs
       |  FROM docs
       |),
       |base AS (
       |  SELECT doc_id,
       |    unnest(range(len(segs))) AS seg_idx,
       |    unnest(segs) AS seg
       |  FROM segd
       |),
       |hashed AS (
       |  SELECT doc_id, seg_idx, seg, md5(seg) AS seg_hash FROM base
       |),
       |freq AS (
       |  SELECT seg_hash, count(*) AS seg_freq FROM hashed GROUP BY seg_hash
       |)
       |SELECT h.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_segs,
       |  CAST(sum(CASE WHEN f.seg_freq < $f THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_segs_kept,
       |  COALESCE(string_agg(h.seg, ' ' ORDER BY h.seg_idx)
       |    FILTER (WHERE f.seg_freq < $f), '') AS text_kept
       |FROM hashed h JOIN freq f USING (seg_hash)
       |GROUP BY h.doc_id""".stripMargin
  }

  /** Mirror of TextOps.shard: md5-prefix 60-bit bucket (rotLong fold ≡
    * Spark conv base 16) modulo NumShards, plus per-shard window stats
    * (integer sums — order-free, so exact across engines).
    */
  val shard: String =
    s"""WITH $wordsCte,
       |a AS (
       |  SELECT doc_id,
       |    ${rotLong("md5(text)", 0)} % ${TextOps.NumShards} AS shard,
       |    CAST(len(words) AS BIGINT) AS n_tokens
       |  FROM docs
       |)
       |SELECT doc_id, shard, n_tokens,
       |  CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS shard_docs,
       |  CAST(sum(n_tokens) OVER (PARTITION BY shard) AS BIGINT) AS shard_tokens
       |FROM a""".stripMargin

  /** Mirror of TextOps.ngramStats: trigram counts with document reach,
    * deterministic (count DESC, ngram ASC) top-k cutoff.
    */
  val ngramStats: String =
    s"""WITH $wordsCte,
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(words) >= 3
       |         THEN list_transform(range(len(words) - 2),
       |                i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))
       |         ELSE CAST([] AS VARCHAR[]) END AS shingles
       |  FROM docs
       |),
       |ex AS (
       |  SELECT doc_id, unnest(shingles) AS ngram FROM sh
       |)
       |SELECT ngram,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM ex GROUP BY ngram
       |ORDER BY n_occurrences DESC, ngram
       |LIMIT ${TextOps.NgramTopK}""".stripMargin

  /** Mirror of TextOps.rareTerms: same 4-word shingle space, same
    * per-doc-distinct df count, same (df asc, term asc) bottom-k.
    */
  val rareTerms: String =
    s"""WITH $wordsCte,
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(words) >= 4
       |         THEN list_distinct(list_transform(range(len(words) - 3),
       |                i -> array_to_string(list_slice(words, i + 1, i + 4), ' ')))
       |         ELSE CAST([] AS VARCHAR[]) END AS grams
       |  FROM docs
       |),
       |df AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS doc_count
       |  FROM (SELECT unnest(grams) AS term FROM sh)
       |  GROUP BY term
       |)
       |SELECT term, doc_count FROM df
       |WHERE doc_count <= ${TextOps.RareMaxDocCount}
       |ORDER BY doc_count ASC, term ASC
       |LIMIT ${TextOps.RareTermsK}""".stripMargin

  /** Mirror of TextOps.scrub: deny-list token filter with removal
    * count; empty scrub result coalesces to '' (DuckDB's
    * array_to_string of an empty list is NULL, Spark's concat_ws is '').
    */
  val scrub: String = {
    val deny = TextOps.ScrubDenyList.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH $wordsCte
       |SELECT doc_id,
       |  COALESCE(array_to_string(
       |    list_filter(words, w -> NOT list_contains($deny, w)), ' '), '')
       |    AS text_scrubbed,
       |  CAST(len(list_filter(words, w -> list_contains($deny, w))) AS BIGINT)
       |    AS n_removed
       |FROM docs""".stripMargin
  }

  /** Mirror of TextOps.redact: the SAME pattern-family constants (the
    * Java∩RE2 regex subset — see TextOps.RedactEmail Scaladoc), the
    * same doc_id-derived planted PII span, the same email → key →
    * phone → IP replace chain ('g' flag: DuckDB's regexp_replace
    * defaults to first-match-only where Spark replaces all), counts
    * off the pre-redaction text, null text → null with zero counts.
    */
  val redact: String = {
    def cnt(pat: String, as: String): String =
      s"CAST(COALESCE(len(regexp_extract_all(ptext, '$pat')), 0) AS BIGINT) AS $as"
    s"""WITH base AS (
       |  SELECT doc_id,
       |    text || ' ' ||
       |    CASE doc_id % 4
       |      WHEN 0 THEN 'user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |      WHEN 1 THEN '555-123-' ||
       |        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      WHEN 2 THEN '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
       |      ELSE 'AKIA' || upper(substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))
       |    END AS ptext
       |  FROM documents
       |)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(ptext,
       |    '${TextOps.RedactEmail}', '<EMAIL>', 'g'),
       |    '${TextOps.RedactKey}', '<KEY>', 'g'),
       |    '${TextOps.RedactPhone}', '<PHONE>', 'g'),
       |    '${TextOps.RedactIpv4}', '<IP>', 'g') AS text_redacted,
       |  ${cnt(TextOps.RedactEmail, "n_email")},
       |  ${cnt(TextOps.RedactKey, "n_key")},
       |  ${cnt(TextOps.RedactPhone, "n_phone")},
       |  ${cnt(TextOps.RedactIpv4, "n_ip")},
       |  CAST(COALESCE(len(regexp_extract_all(ptext, '${TextOps.RedactEmail}')), 0)
       |     + COALESCE(len(regexp_extract_all(ptext, '${TextOps.RedactKey}')), 0)
       |     + COALESCE(len(regexp_extract_all(ptext, '${TextOps.RedactPhone}')), 0)
       |     + COALESCE(len(regexp_extract_all(ptext, '${TextOps.RedactIpv4}')), 0)
       |    AS BIGINT) AS n_redacted
       |FROM base""".stripMargin
  }

  /** Mirror of TextOps.mixWeights: exact-integer token mass per source,
    * sqrt-temperature weight floored onto a 2^40 grid so the
    * normalizing sum is an exact integer sum (float sums are
    * engine-order-defined; grid sums are not).
    */
  val mixWeights: String =
    s"""WITH docsrc AS (
       |  SELECT source, string_split(text, ' ') AS words FROM documents
       |),
       |per AS (
       |  SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(words)) AS BIGINT) AS n_tokens
       |  FROM docsrc GROUP BY source
       |),
       |sh AS (
       |  SELECT source, n_docs, n_tokens,
       |    CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS BIGINT)
       |      AS share
       |  FROM per
       |),
       |g AS (
       |  SELECT source, n_docs, n_tokens, share,
       |    CAST(floor(sqrt(share) * 1099511627776) AS BIGINT) AS w_grid
       |  FROM sh
       |)
       |SELECT source, n_docs, n_tokens, share,
       |  CAST(w_grid AS DOUBLE) / CAST(sum(w_grid) OVER () AS BIGINT)
       |    AS mix_weight
       |FROM g""".stripMargin

  /** Mirror of TextOps.novelty: per-doc distinct shingle hashes,
    * corpus frequency per hash, unique-fraction ratio.
    */
  val novelty: String =
    s"""WITH $wordsCte,
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(words) >= 3
       |         THEN list_transform(range(len(words) - 2),
       |                i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))
       |         ELSE CAST([] AS VARCHAR[]) END AS shingles
       |  FROM docs
       |),
       |hashed AS (
       |  SELECT doc_id, md5(unnest(shingles)) AS h FROM sh
       |),
       |g AS (
       |  SELECT DISTINCT doc_id, ${rotLong("h", 0)} AS gh FROM hashed
       |),
       |freq AS (SELECT gh, count(*) AS gram_docs FROM g GROUP BY gh)
       |SELECT g.doc_id,
       |  count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN f.gram_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unique,
       |  CAST(sum(CASE WHEN f.gram_docs = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS novelty
       |FROM g JOIN freq f USING (gh)
       |GROUP BY g.doc_id""".stripMargin

  /** Mirror of TextOps.sourceOverlap: distinct (source, 60-bit shingle
    * hash) sets, pairwise intersection + Jaccard.
    */
  val sourceOverlap: String =
    s"""WITH d AS (
       |  SELECT source, string_split(text, ' ') AS words FROM documents
       |),
       |sh AS (
       |  SELECT source,
       |    CASE WHEN len(words) >= 3
       |         THEN list_transform(range(len(words) - 2),
       |                i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))
       |         ELSE CAST([] AS VARCHAR[]) END AS shingles
       |  FROM d
       |),
       |hashed AS (
       |  SELECT source, md5(unnest(shingles)) AS h FROM sh
       |),
       |g AS (
       |  SELECT DISTINCT source, ${rotLong("h", 0)} AS gh FROM hashed
       |),
       |sizes AS (SELECT source, count(*) AS n FROM g GROUP BY source),
       |inter AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS overlap
       |  FROM g a JOIN g b USING (gh)
       |  WHERE a.source < b.source
       |  GROUP BY a.source, b.source
       |)
       |SELECT i.src_a, i.src_b, i.overlap, sa.n AS n_a, sb.n AS n_b,
       |  CAST(i.overlap AS DOUBLE) / CAST(sa.n + sb.n - i.overlap AS DOUBLE)
       |    AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.source = i.src_a
       |JOIN sizes sb ON sb.source = i.src_b""".stripMargin

  /** Mirror of TextOps.sigTerms — same distinct (doc, source, term)
    * base, doc-frequency counts, and the one-tree JLH ratio score.
    */
  val sigTerms: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS words FROM documents
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
       |  SELECT source, count(*) AS fg_total FROM documents GROUP BY source
       |),
       |n AS (SELECT count(*) AS bg_total FROM documents),
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
       |SELECT source, "rank", term, CAST(fg AS BIGINT) AS fg,
       |  CAST(bg AS BIGINT) AS bg, jlh
       |FROM ranked WHERE "rank" <= ${TextOps.SigTermsTopK}""".stripMargin

  /** Mirror of TextOps.phrasePrefixSearch: the phrase mirror with the
    * final slot expanded through the capped prefix index (term-ASC
    * row_number ≤ MppMaxExpansions — ES's index-term-order
    * truncation) and unioned into the workload.
    */
  val phrasePrefixSearch: String = {
    val cap = TextOps.CompletionMaxPrefix
    val fvals = TextOps.MppQueries.flatMap { case (q, ts, _) =>
      ts.zipWithIndex.map { case (t, o) =>
        s"(CAST($q AS BIGINT), CAST($o AS BIGINT), '$t', CAST(${ts.length + 1} AS BIGINT))"
      }
    }.mkString(", ")
    val pvals = TextOps.MppQueries.map { case (q, ts, p) =>
      s"(CAST($q AS BIGINT), CAST(${ts.length} AS BIGINT), '$p', " +
        s"CAST(${ts.length + 1} AS BIGINT), substr('$p', 1, $cap))"
    }.mkString(", ")
    s"""WITH $wordsCte,
       |pp AS (
       |  SELECT doc_id, u.p AS pos, u.t AS term FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
       |      i -> {'p': CAST(i AS BIGINT), 't': words[i]})) AS u
       |    FROM docs)
       |),
       |fq(query_id, off, term, plen) AS (VALUES $fvals),
       |pr(query_id, off, prefix, plen, key) AS (VALUES $pvals),
       |vk AS (
       |  SELECT term, unnest(list_transform(
       |    range(1, least(length(term), $cap) + 1),
       |    i -> substr(term, 1, i))) AS key
       |  FROM (SELECT DISTINCT term FROM pp)
       |),
       |ex AS (
       |  SELECT query_id, off, term, plen FROM (
       |    SELECT p.query_id, p.off, v.term, p.plen,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY v.term ASC) AS rk
       |    FROM vk v JOIN pr p USING (key)
       |    WHERE substr(v.term, 1, length(p.prefix)) = p.prefix)
       |  WHERE rk <= ${TextOps.MppMaxExpansions}
       |),
       |q AS (SELECT * FROM fq UNION ALL SELECT * FROM ex),
       |g AS (
       |  SELECT q.query_id, q.plen, pp.doc_id, pp.pos - q.off AS start,
       |    count(DISTINCT q.off) AS n_hit
       |  FROM pp JOIN q ON q.term = pp.term
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT query_id, doc_id,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(min(start) AS BIGINT) AS first_pos
       |FROM g WHERE n_hit = plen
       |GROUP BY query_id, doc_id""".stripMargin
  }

  /** Mirror of TextOps.phraseSearch: the same positional-postings
    * relation (1-based struct unnest), the same literal workload as a
    * VALUES table, the same start = pos − offset grouping with a
    * DISTINCT-offset completeness count.
    */
  val phraseSearch: String = {
    val qvals = TextOps.PhraseQueries.flatMap { case (q, ts) =>
      ts.zipWithIndex.map { case (t, o) =>
        s"(CAST($q AS BIGINT), CAST($o AS BIGINT), '$t', CAST(${ts.length} AS BIGINT))"
      }
    }.mkString(", ")
    s"""WITH $wordsCte,
       |pp AS (
       |  SELECT doc_id, u.p AS pos, u.t AS term FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
       |      i -> {'p': CAST(i AS BIGINT), 't': words[i]})) AS u
       |    FROM docs)
       |),
       |q(query_id, off, term, plen) AS (VALUES $qvals),
       |g AS (
       |  SELECT q.query_id, q.plen, pp.doc_id, pp.pos - q.off AS start,
       |    count(DISTINCT q.off) AS n_hit
       |  FROM pp JOIN q ON q.term = pp.term
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT query_id, doc_id,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(min(start) AS BIGINT) AS first_pos
       |FROM g WHERE n_hit = plen
       |GROUP BY query_id, doc_id""".stripMargin
  }

  /** Mirror of TextOps.bm25 — same rational-idf BM25 with the same
    * fixed expression tree (every double op IEEE-correctly-rounded and
    * identically ordered), per-term contributions floored onto the
    * 2^40 grid before the per-(query, doc) sum. The query table is the
    * same literal VALUES list.
    */
  val bm25: String = {
    val qvals = TextOps.bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"(CAST($q AS BIGINT), '$t')") }
      .mkString(", ")
    bm25Sql(s"q(query_id, term) AS (VALUES $qvals)", excludeSelf = false)
  }

  /** The BM25 SQL chain behind [[bm25]] and OracleRetrieval — `qCte`
    * supplies the q(query_id, term) relation (mirror of
    * TextOps.bm25Ranked's queries parameter).
    */
  private[graft] def bm25Sql(qCte: String, excludeSelf: Boolean): String =
    s"""WITH ${bm25Ctes(qCte, excludeSelf)}
       |SELECT query_id, "rank", doc_id, score, n_matched
       |FROM ranked WHERE "rank" <= ${TextOps.Bm25TopK}""".stripMargin

  /** The WITH-body of [[bm25Sql]] up through the `ranked` relation —
    * the seam composite mirrors ([[moreLikeThis]] feeding a derived
    * query table in, [[highlight]] reading the ranking back out)
    * splice their own CTEs around.
    */
  private[graft] def bm25Ctes(qCte: String, excludeSelf: Boolean): String = {
    val selfFilter = if (excludeSelf) "WHERE c3.doc_id <> q.query_id " else ""
    s"""$wordsCte,
       |$qCte,
       |dl AS (SELECT doc_id, len(words) AS dl FROM docs),
       |stats AS (
       |  SELECT count(dl) AS n_docs, sum(dl) AS dl_sum FROM dl
       |),
       |tc AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(words) AS term FROM docs) t
       |  WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY doc_id, term
       |),
       |dfq AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
       |c1 AS (
       |  SELECT tc.doc_id, tc.term, tc.tf, dfq.df, dl.dl,
       |    stats.n_docs, stats.dl_sum
       |  FROM tc JOIN dfq USING (term) JOIN dl USING (doc_id), stats
       |),
       |c2 AS (
       |  SELECT doc_id, term, tf, dl,
       |    CAST(dl_sum AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl,
       |    (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
       |      (CAST(df AS DOUBLE) + 0.5) + 1.0 AS idf
       |  FROM c1
       |),
       |c3 AS (
       |  SELECT doc_id, term,
       |    CAST(floor(idf * ((CAST(tf AS DOUBLE) * 2.2) /
       |      (CAST(tf AS DOUBLE) + 1.2 *
       |        (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) *
       |      1099511627776.0) AS BIGINT) AS cg
       |  FROM c2
       |),
       |scored AS (
       |  SELECT q.query_id, c3.doc_id,
       |    CAST(sum(c3.cg) AS BIGINT) AS score, count(*) AS n_matched
       |  FROM c3 JOIN q USING (term) ${selfFilter}GROUP BY q.query_id, c3.doc_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS "rank"
       |  FROM scored
       |)""".stripMargin
  }

  /** Mirror of TextOps.moreLikeThis: the same two index phases — a
    * full-vocabulary (doc, term, tf) relation feeds seed-term
    * selection (tf · (N+1)/(df+1), the log-free tfidf ratio, df ≥
    * MltMinDocFreq, top MltMaxTerms by (score DESC, term ASC)) — and
    * the selected terms ARE the `q` table of the standard BM25 chain
    * with the seed doc excluded.
    */
  val moreLikeThis: String = {
    val seedVals = TextOps.MltSeeds
      .map(s => s"(CAST($s AS BIGINT))").mkString(", ")
    val qCte =
      s"""seeds(query_id) AS (VALUES $seedVals),
         |ptf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(words) AS term FROM docs) t
         |  GROUP BY doc_id, term
         |),
         |mdf AS (SELECT term, count(*) AS df FROM ptf GROUP BY term),
         |mn AS (
         |  SELECT count(dl) AS n_docs
         |  FROM (SELECT len(words) AS dl FROM docs) d
         |),
         |mscore AS (
         |  SELECT s.query_id, p.term,
         |    CAST(p.tf AS DOUBLE) *
         |      (CAST(mn.n_docs + 1 AS DOUBLE) / CAST(mdf.df + 1 AS DOUBLE))
         |      AS mlt_score
         |  FROM ptf p
         |  JOIN seeds s ON p.doc_id = s.query_id
         |  JOIN mdf USING (term), mn
         |  WHERE mdf.df >= ${TextOps.MltMinDocFreq}
         |),
         |mrank AS (
         |  SELECT query_id, term, row_number() OVER (
         |    PARTITION BY query_id ORDER BY mlt_score DESC, term ASC) AS r
         |  FROM mscore
         |),
         |q AS (SELECT query_id, term FROM mrank WHERE r <= ${TextOps.MltMaxTerms})"""
        .stripMargin
    bm25Sql(qCte, excludeSelf = true)
  }

  /** Mirror of TextOps.suggest: the same deletion-1 key blocking
    * (term itself + one-char-removed variants, distinct), key
    * equi-join, exact `levenshtein` verify (both engines ship the
    * classic integer DP), and (dist ASC, freq DESC, term ASC)
    * ranking. `sum(tf)` widens to HUGEINT in DuckDB — cast back.
    */
  val suggest: String = {
    val inVals = TextOps.SuggestInputs.map(s => s"('$s')").mkString(", ")
    def delKeys(c: String): String =
      s"""list_distinct(list_concat([$c],
         |    list_transform(range(1, length($c) + 1),
         |      i -> substr($c, 1, i - 1) || substr($c, i + 1))))""".stripMargin
    s"""WITH $wordsCte,
       |ptf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(words) AS term FROM docs) t
       |  GROUP BY doc_id, term
       |),
       |vocab AS (
       |  SELECT term, CAST(sum(tf) AS BIGINT) AS freq FROM ptf GROUP BY term
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
       |  FROM scored WHERE dist <= ${TextOps.SuggestMaxEdits}
       |)
       |SELECT input_term, CAST(r AS BIGINT) AS "rank", term AS suggestion,
       |  dist, freq
       |FROM ranked WHERE r <= ${TextOps.SuggestTopK}""".stripMargin
  }

  /** Mirror of TextOps.fuzzyQuery: the suggester's deletion-1 candidate
    * chain joined back onto the postings, per-(input, doc) summary. */
  val fuzzyQuery: String = {
    val inVals = TextOps.SuggestInputs.map(s => s"('$s')").mkString(", ")
    def delKeys(c: String): String =
      s"""list_distinct(list_concat([$c],
         |    list_transform(range(1, length($c) + 1),
         |      i -> substr($c, 1, i - 1) || substr($c, i + 1))))""".stripMargin
    s"""WITH $wordsCte,
       |ptf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(words) AS term FROM docs) t
       |  GROUP BY doc_id, term
       |),
       |vocab AS (SELECT DISTINCT term FROM ptf),
       |vkeys AS (
       |  SELECT term, unnest(${delKeys("term")}) AS key FROM vocab
       |),
       |ikeys AS (
       |  SELECT input_term, unnest(${delKeys("input_term")}) AS key
       |  FROM (VALUES $inVals) t(input_term)
       |),
       |cands AS (
       |  SELECT input_term, term,
       |    CAST(levenshtein(input_term, term) AS BIGINT) AS dist
       |  FROM (SELECT DISTINCT input_term, term
       |        FROM vkeys JOIN ikeys USING (key))
       |  WHERE levenshtein(input_term, term) <= ${TextOps.SuggestMaxEdits}
       |)
       |SELECT c.input_term, p.doc_id,
       |  CAST(count(DISTINCT c.term) AS BIGINT) AS n_terms_matched,
       |  CAST(sum(p.tf) AS BIGINT) AS total_tf,
       |  CAST(min(c.dist) AS BIGINT) AS min_dist
       |FROM cands c JOIN ptf p USING (term)
       |GROUP BY 1, 2""".stripMargin
  }

  /** Mirror of TextOps.boolPrefixSearch: the same literal workload,
    * capped prefix expansion of the final slot (term-ASC truncation),
    * bool-OR postings probe, both-roles double-count preserved.
    */
  val boolPrefixSearch: String = {
    val cap = TextOps.CompletionMaxPrefix
    val fvals = TextOps.MppQueries.flatMap { case (q, ts, _) =>
      ts.map(t => s"(CAST($q AS BIGINT), '$t', 0)")
    }.mkString(", ")
    val pvals = TextOps.MppQueries.map { case (q, _, p) =>
      s"(CAST($q AS BIGINT), '$p', substr('$p', 1, $cap))"
    }.mkString(", ")
    s"""WITH $wordsCte,
       |ptf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(words) AS term FROM docs) t
       |  GROUP BY doc_id, term
       |),
       |fq(query_id, term, is_prefix) AS (VALUES $fvals),
       |pr(query_id, prefix, key) AS (VALUES $pvals),
       |vk AS (
       |  SELECT term, unnest(list_transform(
       |    range(1, least(length(term), $cap) + 1),
       |    i -> substr(term, 1, i))) AS key
       |  FROM (SELECT DISTINCT term FROM ptf)
       |),
       |ex AS (
       |  SELECT query_id, term, 1 AS is_prefix FROM (
       |    SELECT p.query_id, v.term,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY v.term ASC) AS rk
       |    FROM vk v JOIN pr p USING (key)
       |    WHERE substr(v.term, 1, length(p.prefix)) = p.prefix)
       |  WHERE rk <= ${TextOps.MppMaxExpansions}
       |),
       |q AS (SELECT * FROM fq UNION ALL SELECT * FROM ex)
       |SELECT q.query_id, p.doc_id,
       |  CAST(count(DISTINCT CASE WHEN q.is_prefix = 0 THEN q.term END) AS BIGINT)
       |    AS n_terms_matched,
       |  CAST(count(DISTINCT CASE WHEN q.is_prefix = 1 THEN q.term END) AS BIGINT)
       |    AS n_prefix_terms,
       |  CAST(sum(p.tf) AS BIGINT) AS total_tf
       |FROM q JOIN ptf p USING (term)
       |GROUP BY 1, 2""".stripMargin
  }

  /** Mirror of TextOps.wildcardSearch: forward and reversed capped
    * prefix indexes, starts-with verification, per-pattern resolved
    * term dictionary with document/occurrence mass. */
  val wildcardSearch: String = {
    val cap = TextOps.CompletionMaxPrefix
    val preVals = TextOps.WildcardQueries.filter(_.endsWith("*"))
      .map(p => s"('$p', '${p.stripSuffix("*")}')").mkString(", ")
    val sufVals = TextOps.WildcardQueries.filter(_.startsWith("*"))
      .map(p => s"('$p', '${p.stripPrefix("*").reverse}')").mkString(", ")
    def sideSql(patCte: String, keyExpr: String): String =
      s"""SELECT p.pattern, s.term, s.n_docs, s.total_tf FROM (
         |  SELECT term, n_docs, total_tf, unnest(list_transform(
         |    range(1, least(length(term), $cap) + 1),
         |    i -> substr($keyExpr, 1, i))) AS key
         |  FROM stats) s
         |JOIN (SELECT pattern, body, substr(body, 1, $cap) AS key
         |      FROM $patCte) p USING (key)
         |WHERE substr($keyExpr, 1, length(p.body)) = p.body""".stripMargin
    s"""WITH $wordsCte,
       |ptf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(words) AS term FROM docs) t
       |  GROUP BY doc_id, term
       |),
       |stats AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(tf) AS BIGINT) AS total_tf
       |  FROM ptf GROUP BY term
       |),
       |prepat(pattern, body) AS (VALUES $preVals),
       |sufpat(pattern, body) AS (VALUES $sufVals)
       |${sideSql("prepat", "term")}
       |UNION ALL
       |${sideSql("sufpat", "reverse(term)")}""".stripMargin
  }

  /** Mirror of TextOps.suggestCompletion: the same postings-derived
    * vocabulary, prefix keys to the same cap, the same starts-with
    * verification and (freq DESC, term ASC) ranking.
    */
  val suggestCompletion: String = {
    val inVals = TextOps.CompletionInputs.map(s => s"('$s')").mkString(", ")
    val cap = TextOps.CompletionMaxPrefix
    s"""WITH $wordsCte,
       |ptf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(words) AS term FROM docs) t
       |  GROUP BY doc_id, term
       |),
       |vocab AS (
       |  SELECT term, CAST(sum(tf) AS BIGINT) AS freq FROM ptf GROUP BY term
       |),
       |pfx AS (
       |  SELECT term, freq, unnest(list_transform(
       |    range(1, least(length(term), $cap) + 1),
       |    i -> substr(term, 1, i))) AS key
       |  FROM vocab
       |),
       |ikeys AS (
       |  SELECT input_prefix, substr(input_prefix, 1, $cap) AS key
       |  FROM (VALUES $inVals) t(input_prefix)
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
       |FROM ranked WHERE r <= ${TextOps.CompletionTopK}""".stripMargin
  }

  /** Mirror of TextOps.highlight: the BM25 CTE chain (same literal
    * workload), ranked top-[[TextOps.HlTopK]] joined back to the docs
    * relation, first match position = min over query terms of
    * `list_position` (NULL-absent filtered), the same ±HlWindow slice
    * with per-word `<em>` wrapping. All integer/string ops — no float
    * crosses the compare.
    */
  val highlight: String = {
    val qvals = TextOps.bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"(CAST($q AS BIGINT), '$t')") }
      .mkString(", ")
    val hw = TextOps.HlWindow
    s"""WITH ${bm25Ctes(s"q(query_id, term) AS (VALUES $qvals)", excludeSelf = false)},
       |qa AS (
       |  SELECT query_id, list(DISTINCT term ORDER BY term) AS qterms
       |  FROM q GROUP BY query_id
       |),
       |hl AS (
       |  SELECT r.query_id, r."rank", r.doc_id, d.words, qa.qterms
       |  FROM ranked r
       |  JOIN docs d ON r.doc_id = d.doc_id
       |  JOIN qa ON r.query_id = qa.query_id
       |  WHERE r."rank" <= ${TextOps.HlTopK}
       |),
       |pos AS (
       |  SELECT query_id, "rank", doc_id, words, qterms,
       |    CAST(list_aggregate(list_filter(
       |      list_transform(qterms, t -> list_position(words, t)),
       |      p -> p IS NOT NULL), 'min') AS BIGINT) AS first_pos
       |  FROM hl
       |),
       |fr AS (
       |  SELECT query_id, "rank", doc_id, words, qterms, first_pos,
       |    greatest(CAST(1 AS BIGINT), first_pos - $hw) AS frag_start
       |  FROM pos
       |)
       |SELECT query_id, "rank", doc_id, first_pos, frag_start,
       |  array_to_string(list_transform(
       |    list_slice(words, frag_start, first_pos + $hw),
       |    w -> CASE WHEN list_contains(qterms, w)
       |      THEN '<em>' || w || '</em>' ELSE w END), ' ') AS fragment
       |FROM fr""".stripMargin
  }

  /** Mirror of TextOps.ragRetrieve: the chunk CTE chain, keeper
    * dedup by min packed id per content hash, the BM25 formula over
    * chunk postings (cid plays doc_id), packed-key decode at the edge.
    */
  val ragRetrieve: String = {
    val (w, s0) = (TextOps.ChunkWindow, TextOps.ChunkStride)
    val radix = TextOps.ChunkPackRadix
    val qvals = TextOps.bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"(CAST($q AS BIGINT), '$t')") }
      .mkString(", ")
    s"""WITH cdocs AS (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |),
       |sized AS (
       |  SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n FROM cdocs
       |),
       |idx AS (
       |  SELECT doc_id, words, n,
       |    unnest(range(0, CAST(ceil(n / CAST($s0 AS DOUBLE)) AS BIGINT))) AS chunk_id
       |  FROM sized
       |),
       |cut AS (
       |  SELECT doc_id, chunk_id,
       |    array_to_string(list_slice(words,
       |      CAST(chunk_id * $s0 + 1 AS INT), CAST(chunk_id * $s0 + $w AS INT)), ' ')
       |      AS chunk_text
       |  FROM idx
       |),
       |ck AS (
       |  SELECT CAST(doc_id AS HUGEINT) * $radix + chunk_id AS cid,
       |    doc_id AS src_doc, chunk_id AS src_chunk, chunk_text,
       |    md5(chunk_text) AS chunk_hash
       |  FROM cut
       |),
       |keep AS (SELECT chunk_hash, min(cid) AS cid FROM ck GROUP BY chunk_hash),
       |kept AS (
       |  SELECT ck.cid, ck.chunk_text FROM ck
       |  JOIN keep ON ck.chunk_hash = keep.chunk_hash AND ck.cid = keep.cid
       |),
       |q(query_id, term) AS (VALUES $qvals),
       |cdl AS (SELECT cid, len(string_split(chunk_text, ' ')) AS dl FROM kept),
       |stats AS (SELECT count(dl) AS n_docs, sum(dl) AS dl_sum FROM cdl),
       |tc AS (
       |  SELECT cid, term, count(*) AS tf FROM (
       |    SELECT cid, unnest(string_split(chunk_text, ' ')) AS term FROM kept) t
       |  WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY cid, term
       |),
       |dfq AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
       |c1 AS (
       |  SELECT tc.cid, tc.term, tc.tf, dfq.df, cdl.dl,
       |    stats.n_docs, stats.dl_sum
       |  FROM tc JOIN dfq USING (term) JOIN cdl USING (cid), stats
       |),
       |c2 AS (
       |  SELECT cid, term, tf, dl,
       |    CAST(dl_sum AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl,
       |    (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
       |      (CAST(df AS DOUBLE) + 0.5) + 1.0 AS idf
       |  FROM c1
       |),
       |c3 AS (
       |  SELECT cid, term,
       |    CAST(floor(idf * ((CAST(tf AS DOUBLE) * 2.2) /
       |      (CAST(tf AS DOUBLE) + 1.2 *
       |        (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) *
       |      1099511627776.0) AS BIGINT) AS cg
       |  FROM c2
       |),
       |scored AS (
       |  SELECT q.query_id, c3.cid,
       |    CAST(sum(c3.cg) AS BIGINT) AS score, count(*) AS n_matched
       |  FROM c3 JOIN q USING (term) GROUP BY q.query_id, c3.cid
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, cid ASC) AS "rank"
       |  FROM scored
       |)
       |SELECT r.query_id, r."rank", ck.src_doc AS doc_id,
       |  ck.src_chunk AS chunk_id, r.score, r.n_matched
       |FROM ranked r JOIN ck ON ck.cid = r.cid
       |WHERE r."rank" <= ${TextOps.Bm25TopK}""".stripMargin
  }

  /** Mirror of TextOps.nearSearch: the positional-postings relation,
    * the same a-position explode onto its ≤ slop+1 admissible
    * b-positions (range() is end-exclusive — pos+2+slop matches
    * Spark's inclusive sequence), exact (doc, pos, term) equi-join.
    */
  val nearSearch: String = {
    val qvals = TextOps.NearQueries.map { case (id, a, b, s) =>
      s"(CAST($id AS BIGINT), '$a', '$b', CAST($s AS BIGINT))"
    }.mkString(", ")
    s"""WITH $wordsCte,
       |pp AS (
       |  SELECT doc_id, u.p AS pos, u.t AS term FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
       |      i -> {'p': CAST(i AS BIGINT), 't': words[i]})) AS u
       |    FROM docs)
       |),
       |q(query_id, term_a, term_b, slop) AS (VALUES $qvals),
       |a AS (
       |  SELECT q.query_id, pp.doc_id, pp.pos AS p1, q.term_b,
       |    unnest(range(pp.pos + 1, pp.pos + 2 + q.slop)) AS p2
       |  FROM pp JOIN q ON pp.term = q.term_a
       |)
       |SELECT a.query_id, a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(min(a.p1) AS BIGINT) AS first_pos
       |FROM a JOIN pp b
       |  ON b.doc_id = a.doc_id AND b.pos = a.p2 AND b.term = a.term_b
       |GROUP BY a.query_id, a.doc_id""".stripMargin
  }

  /** Mirror of TextOps.suggestPhrase: the term suggester's candidate
    * chain per slot, within-phrase candidate cross, the surprisal
    * bigram counts as the LM, the same all-integer ranking key.
    */
  val suggestPhrase: String = {
    val inputs = TextOps.PhraseSuggestInputs
      .flatMap { case (_, a, b) => Seq(a, b) }.distinct
    val inVals = inputs.map(s => s"('$s')").mkString(", ")
    val phVals = TextOps.PhraseSuggestInputs.map { case (id, a, b) =>
      s"(CAST($id AS BIGINT), '$a', '$b')"
    }.mkString(", ")
    def delKeys(c: String): String =
      s"""list_distinct(list_concat([$c],
         |    list_transform(range(1, length($c) + 1),
         |      i -> substr($c, 1, i - 1) || substr($c, i + 1))))""".stripMargin
    s"""WITH $wordsCte,
       |ptf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(words) AS term FROM docs) t
       |  GROUP BY doc_id, term
       |),
       |vocab AS (SELECT term FROM ptf GROUP BY term),
       |vkeys AS (
       |  SELECT term, unnest(${delKeys("term")}) AS key FROM vocab
       |),
       |ikeys AS (
       |  SELECT input_term, unnest(${delKeys("input_term")}) AS key
       |  FROM (VALUES $inVals) t(input_term)
       |),
       |cands AS (
       |  SELECT DISTINCT input_term, term FROM vkeys JOIN ikeys USING (key)
       |),
       |sc AS (
       |  SELECT input_term, term,
       |    CAST(levenshtein(input_term, term) AS BIGINT) AS dist
       |  FROM cands
       |  WHERE levenshtein(input_term, term) <= ${TextOps.SuggestMaxEdits}
       |),
       |ph(query_id, in_a, in_b) AS (VALUES $phVals),
       |pairs AS (
       |  SELECT ph.query_id, a.term AS cand_a, a.dist AS dist_a,
       |    b.term AS cand_b, b.dist AS dist_b
       |  FROM ph
       |  JOIN sc a ON a.input_term = ph.in_a
       |  JOIN sc b ON b.input_term = ph.in_b
       |),
       |bgr AS (
       |  SELECT words[CAST(i AS INT)] AS w1, words[CAST(i + 1 AS INT)] AS w2
       |  FROM docs, unnest(range(1, len(words))) t(i)
       |  WHERE len(words) >= 2
       |),
       |bgc AS (SELECT w1, w2, count(*) AS c_bg FROM bgr GROUP BY w1, w2),
       |scored AS (
       |  SELECT p.query_id, p.cand_a, p.cand_b,
       |    CAST(COALESCE(bgc.c_bg, 0) AS BIGINT) AS bg_count,
       |    p.dist_a + p.dist_b AS dist_sum
       |  FROM pairs p
       |  LEFT JOIN bgc ON bgc.w1 = p.cand_a AND bgc.w2 = p.cand_b
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY bg_count DESC, dist_sum ASC, cand_a ASC, cand_b ASC) AS r
       |  FROM scored
       |)
       |SELECT query_id, CAST(r AS BIGINT) AS "rank",
       |  cand_a AS suggestion_a, cand_b AS suggestion_b, bg_count, dist_sum
       |FROM ranked WHERE r <= ${TextOps.PhraseSuggestTopK}""".stripMargin
  }

  /** Mirror of TextOps.percolate: distinct (doc, term) pairs joined to
    * the literal stored-query table, DISTINCT-matched-term count per
    * (doc, query), conjunction test in the HAVING.
    */
  val percolate: String = {
    val qvals = TextOps.bm25Queries.flatMap { case (id, ts) =>
      val d = ts.distinct
      d.map(t => s"(CAST($id AS BIGINT), '$t', CAST(${d.length} AS BIGINT))")
    }.mkString(", ")
    s"""WITH $wordsCte,
       |q(query_id, term, n_terms) AS (VALUES $qvals),
       |tc AS (
       |  SELECT doc_id, term FROM (
       |    SELECT doc_id, unnest(words) AS term FROM docs) t
       |  GROUP BY doc_id, term
       |)
       |SELECT tc.doc_id, q.query_id,
       |  CAST(count(DISTINCT q.term) AS BIGINT) AS n_matched
       |FROM tc JOIN q USING (term)
       |GROUP BY tc.doc_id, q.query_id, q.n_terms
       |HAVING count(DISTINCT q.term) = q.n_terms""".stripMargin
  }

  /** Mirror of TextOps.functionScore: the BM25 CTE chain's top window
    * joined to the documents base table, the same integer CASE
    * weights, integer linear-decay numerator, and `//`-floored score
    * shift (≡ Spark `div` on positives).
    */
  val functionScore: String = {
    val qvals = TextOps.bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"(CAST($q AS BIGINT), '$t')") }
      .mkString(", ")
    val srcs = TextOps.FsBoostSources.map(s => s"'$s'").mkString(", ")
    s"""WITH ${bm25Ctes(s"q(query_id, term) AS (VALUES $qvals)", excludeSelf = false)},
       |fs AS (
       |  SELECT r.query_id, r.doc_id, r.score,
       |    CAST(CASE WHEN d.source IN ($srcs) THEN 3 ELSE 1 END *
       |      CASE WHEN d.lang = '${TextOps.FsBoostLang}' THEN 2 ELSE 1 END
       |      AS BIGINT) AS weight,
       |    CAST(greatest(0, ${TextOps.FsDecayScale} -
       |      abs(d.n_chars - ${TextOps.FsDecayOrigin})) AS BIGINT) AS decay_num
       |  FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
       |  WHERE r."rank" <= ${TextOps.Bm25TopK}
       |),
       |rescored AS (
       |  SELECT query_id, doc_id, score AS base_score, weight, decay_num,
       |    CAST((score // ${TextOps.FsScoreShift}) * weight * decay_num
       |      AS BIGINT) AS final_score
       |  FROM fs
       |),
       |rr AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY final_score DESC, doc_id ASC) AS r2
       |  FROM rescored
       |)
       |SELECT query_id, CAST(r2 AS BIGINT) AS "rank", doc_id, base_score,
       |  weight, decay_num, final_score
       |FROM rr WHERE r2 <= ${TextOps.FsTopK}""".stripMargin
  }

  /** Mirror of TextOps.surprisal: same bigram counts, context totals
    * off the bigram aggregate, integer-log2 via `length(bin(n))`
    * (identical unpadded binary rendering in both engines), one IEEE
    * division.
    */
  val surprisal: String =
    s"""WITH $wordsCte,
       |bgr AS (
       |  SELECT doc_id,
       |    words[CAST(i AS INT)] AS w1, words[CAST(i + 1 AS INT)] AS w2
       |  FROM docs, unnest(range(1, len(words))) t(i)
       |  WHERE len(words) >= 2
       |),
       |bgc AS (SELECT w1, w2, count(*) AS c_bg FROM bgr GROUP BY w1, w2),
       |ctx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx FROM bgc GROUP BY w1),
       |bits AS (
       |  SELECT doc_id,
       |    CAST(length(bin(c_ctx)) - length(bin(c_bg)) AS BIGINT) AS bits
       |  FROM bgr JOIN bgc USING (w1, w2) JOIN ctx USING (w1)
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(sum(bits) AS BIGINT) AS total_bits,
       |  CAST(sum(bits) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_bits
       |FROM bits GROUP BY doc_id""".stripMargin

  /** Mirror of TextOps.pplBuckets: the surprisal mirror as a subquery
    * (nested-WITH device), lang joined back, the identical ntile(3)
    * over the (mean_bits, doc_id) total order.
    */
  lazy val pplBuckets: String =
    s"""WITH sp AS ($surprisal),
       |j AS (
       |  SELECT sp.doc_id, d.lang, sp.n_bigrams, sp.total_bits, sp.mean_bits
       |  FROM sp JOIN documents d ON d.doc_id = sp.doc_id
       |),
       |t AS (
       |  SELECT *, CAST(ntile(3) OVER (PARTITION BY lang
       |    ORDER BY mean_bits ASC, doc_id ASC) AS BIGINT) AS tercile
       |  FROM j
       |)
       |SELECT doc_id, lang, n_bigrams, total_bits, mean_bits, tercile,
       |  CASE WHEN tercile = 1 THEN 'head'
       |       WHEN tercile = 2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM t""".stripMargin

  /** Mirror of TextOps.langidCng: same trigram rank profiles,
    * out-of-place displacement sum, argmin with language tiebreak.
    */
  val langidCng: String = {
    val k = TextOps.CngK
    s"""WITH grams AS (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(1, length(text) - 1),
       |      i -> substring(text, CAST(i AS INT), 3))) AS g
       |  FROM documents WHERE length(text) >= 3
       |),
       |dc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt
       |       FROM grams GROUP BY doc_id, g),
       |dt AS (SELECT * FROM (
       |  SELECT doc_id, g, CAST(row_number() OVER (PARTITION BY doc_id
       |    ORDER BY cnt DESC, g ASC) AS BIGINT) AS dr FROM dc) WHERE dr <= $k),
       |lc AS (SELECT lang AS plang, g, CAST(count(*) AS BIGINT) AS cnt
       |       FROM grams GROUP BY lang, g),
       |lt AS (SELECT * FROM (
       |  SELECT plang, g, CAST(row_number() OVER (PARTITION BY plang
       |    ORDER BY cnt DESC, g ASC) AS BIGINT) AS lr FROM lc) WHERE lr <= $k),
       |langs AS (SELECT DISTINCT plang FROM lt),
       |dist AS (
       |  SELECT d.doc_id, l.plang,
       |    CAST(sum(COALESCE(abs(d.dr - p.lr), $k)) AS BIGINT) AS dist
       |  FROM dt d CROSS JOIN langs l
       |  LEFT JOIN lt p ON p.plang = l.plang AND p.g = d.g
       |  GROUP BY d.doc_id, l.plang
       |),
       |best AS (SELECT * FROM (
       |  SELECT doc_id, plang, dist, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY dist ASC, plang ASC) AS rn FROM dist) WHERE rn = 1)
       |SELECT b.doc_id, d.lang, b.plang AS lang_pred, b.dist,
       |  d.lang = b.plang AS correct
       |FROM best b JOIN documents d ON d.doc_id = b.doc_id""".stripMargin
  }

  /** Mirror of TextOps.gopherRules: identical integer cross-multiplied
    * thresholds, distinct-stopword filter, (doc, bigram) max/sum pair.
    */
  val gopherRules: String = {
    val stop = "['the','a','of','and','to','in','is','it','on','for']"
    s"""WITH $wordsCte,
       |pw AS (
       |  SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
       |    CAST(list_sum(list_transform(words, w -> CAST(length(w) AS BIGINT)))
       |      AS BIGINT) AS sum_len,
       |    CAST(len(list_distinct(list_filter(words,
       |      w -> list_contains($stop, w)))) AS BIGINT) AS n_stop
       |  FROM docs
       |),
       |bgr AS (
       |  SELECT doc_id,
       |    words[CAST(i AS INT)] || ' ' || words[CAST(i + 1 AS INT)] AS b
       |  FROM docs, unnest(range(1, len(words))) t(i)
       |  WHERE len(words) >= 2
       |),
       |bg AS (
       |  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_bg,
       |    CAST(sum(c) AS BIGINT) AS n_bg
       |  FROM (SELECT doc_id, b, count(*) AS c FROM bgr GROUP BY doc_id, b)
       |  GROUP BY doc_id
       |)
       |SELECT p.doc_id, p.n_words,
       |  p.n_words >= 50 AND p.n_words <= 100000 AS r_word_count,
       |  p.sum_len >= p.n_words * 3 AND p.sum_len <= p.n_words * 10
       |    AS r_mean_word_len,
       |  p.n_stop >= 2 AS r_stopwords,
       |  COALESCE(bg.max_bg * 5 <= bg.n_bg, true) AS r_top_bigram,
       |  (p.n_words - p.n_distinct) * 10 <= p.n_words * 3 AS r_dup_words,
       |  (p.n_words >= 50 AND p.n_words <= 100000)
       |    AND (p.sum_len >= p.n_words * 3 AND p.sum_len <= p.n_words * 10)
       |    AND p.n_stop >= 2
       |    AND COALESCE(bg.max_bg * 5 <= bg.n_bg, true)
       |    AND (p.n_words - p.n_distinct) * 10 <= p.n_words * 3 AS keep
       |FROM pw p LEFT JOIN bg ON bg.doc_id = p.doc_id""".stripMargin
  }

  /** Mirror of TextOps.winnowing: same k-gram hash stream, the same
    * backward-min / forward-max two-window selection, FILTERed
    * distinct fingerprint digest.
    */
  val winnowing: String = {
    val k = TextOps.WinnowK
    val w = TextOps.WinnowW
    s"""WITH grams0 AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |    substring(text, CAST(i AS INT), $k) AS g
       |  FROM documents, unnest(range(1, length(text) - ${k - 2})) t(i)
       |  WHERE length(text) >= $k
       |),
       |-- hash staged on a COLUMN: rotLong's fold lambda binds `i`, so
       |-- inlining the correlated unnest variable would be shadowed
       |grams AS (
       |  SELECT doc_id, pos, ${rotLong("md5(g)", 0)} AS h FROM grams0
       |),
       |wm AS (
       |  SELECT doc_id, pos, h,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS m
       |  FROM grams
       |),
       |sel AS (
       |  SELECT doc_id, h,
       |    max(m) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) = h AS s
       |  FROM wm
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS density,
       |  md5(array_to_string(list_transform(
       |    list_sort(list(DISTINCT h) FILTER (WHERE s)),
       |    x -> CAST(x AS VARCHAR)), ',')) AS fp_digest
       |FROM sel GROUP BY doc_id""".stripMargin
  }

  /** Mirror of TextOps.collocations: same bigram margins, exact
    * integer-product lift ratio, one division, full-tiebreak top-k.
    */
  val collocations: String =
    s"""WITH $wordsCte,
       |bgr AS (
       |  SELECT words[CAST(i AS INT)] AS w1, words[CAST(i + 1 AS INT)] AS w2
       |  FROM docs, unnest(range(1, len(words))) t(i)
       |  WHERE len(words) >= 2
       |),
       |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
       |       FROM bgr GROUP BY w1, w2),
       |m1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bg GROUP BY w1),
       |m2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM bg GROUP BY w2),
       |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bigrams FROM bg)
       |SELECT w1, w2, c12, c1, c2, n_bigrams,
       |  CAST(c12 * n_bigrams AS DOUBLE) / CAST(c1 * c2 AS DOUBLE) AS pmi_ratio
       |FROM bg JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN n
       |WHERE c12 >= ${TextOps.CollocMinCount}
       |ORDER BY pmi_ratio DESC, w1 ASC, w2 ASC
       |LIMIT ${TextOps.CollocTopK}""".stripMargin

  /** Mirror of TextOps.chunkDedup: the chunks mirror as a subquery,
    * one GROUP BY on the content hash, the same packed-integer
    * keeper arg-min (`//` ≡ Spark `div` on non-negative operands).
    */
  // lazy: `chunks` initializes later in this object — an eager val
  // here would interpolate null
  lazy val chunkDedup: String =
    s"""SELECT chunk_hash, n_occurrences, n_docs, keeper_doc,
       |  CAST(keeper_packed % ${TextOps.ChunkPackRadix} AS BIGINT)
       |    AS keeper_chunk,
       |  n_tokens
       |FROM (
       |  SELECT chunk_hash,
       |    CAST(count(*) AS BIGINT) AS n_occurrences,
       |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |    min(doc_id) AS keeper_doc,
       |    min(CAST(doc_id AS HUGEINT) * ${TextOps.ChunkPackRadix}
       |      + chunk_id) AS keeper_packed,
       |    min(n_tokens) AS n_tokens
       |  FROM ($chunks) ch
       |  GROUP BY chunk_hash
       |)
       |WHERE n_occurrences > 1""".stripMargin

  /** Mirror of TextOps.dedupContainment: identical pipeline — distinct
    * (doc, 60-bit shingle digest), SAME rare-shingle blocking (so
    * blocking recall cancels out of the differential), exact
    * candidate-only intersections, size-then-id role assignment, the
    * integer-space threshold, one IEEE division of exact integers.
    */
  /** Mirror of TextOps.dedupEval: the same df-capped shingle-blocked
    * exact truth (containment's shs CTE), the LSH candidate mirror as
    * a subquery, integer-threshold confusion counts.
    */
  val dedupEval: String = {
    val rot = rotLong("md5(sg)", 0)
    val (num, den) = (TextOps.EvalJacNum, TextOps.EvalJacDen)
    val bw = TextOps.ContainBlockWidth
    s"""WITH $wordsCte,
       |shs AS (
       |  SELECT DISTINCT doc_id, $rot AS h
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(words) - 2),
       |      i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))) AS sg
       |    FROM docs WHERE len(words) >= 3)
       |),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
       |blocks AS (
       |  SELECT DISTINCT doc_id, $rot AS h
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(words) - ${bw - 1}),
       |      i -> array_to_string(list_slice(words, i + 1, i + $bw), ' '))) AS sg
       |    FROM docs WHERE len(words) >= $bw)
       |),
       |rare AS (
       |  SELECT doc_id, h FROM blocks
       |  WHERE h IN (SELECT h FROM blocks GROUP BY h
       |              HAVING count(*) >= 2 AND count(*) <= ${TextOps.ContainMaxDf})
       |),
       |cand AS (
       |  SELECT DISTINCT ra.doc_id AS a, rb.doc_id AS b
       |  FROM rare ra JOIN rare rb ON ra.h = rb.h AND ra.doc_id < rb.doc_id
       |),
       |inter AS (
       |  SELECT c.a, c.b, count(*) AS inter
       |  FROM cand c
       |  JOIN shs sa ON sa.doc_id = c.a
       |  JOIN shs sb ON sb.doc_id = c.b AND sb.h = sa.h
       |  GROUP BY c.a, c.b
       |),
       |truth AS (
       |  SELECT i.a, i.b, CAST(1 AS BIGINT) AS t
       |  FROM inter i
       |  JOIN sizes za ON za.doc_id = i.a
       |  JOIN sizes zb ON zb.doc_id = i.b
       |  WHERE i.inter * ${num + den} >= (za.n + zb.n) * $num
       |),
       |pred AS (
       |  SELECT doc_a AS a, doc_b AS b, CAST(1 AS BIGINT) AS p
       |  FROM ($dedupMinhashLsh)
       |),
       |conf AS (
       |  SELECT
       |    CAST(sum(COALESCE(t, 0)) AS BIGINT) AS n_true_pairs,
       |    CAST(sum(COALESCE(p, 0)) AS BIGINT) AS n_cand_pairs,
       |    CAST(sum(COALESCE(t, 0) * COALESCE(p, 0)) AS BIGINT) AS n_tp
       |  FROM truth FULL OUTER JOIN pred USING (a, b)
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

  val dedupContainment: String = {
    val rot = rotLong("md5(sg)", 0)
    val bw = TextOps.ContainBlockWidth
    s"""WITH $wordsCte,
       |shs AS (
       |  SELECT DISTINCT doc_id, $rot AS h
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(words) - 2),
       |      i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))) AS sg
       |    FROM docs WHERE len(words) >= 3)
       |),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
       |blocks AS (
       |  SELECT DISTINCT doc_id, $rot AS h
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(words) - ${bw - 1}),
       |      i -> array_to_string(list_slice(words, i + 1, i + $bw), ' '))) AS sg
       |    FROM docs WHERE len(words) >= $bw)
       |),
       |rare AS (
       |  SELECT doc_id, h FROM blocks
       |  WHERE h IN (SELECT h FROM blocks GROUP BY h
       |              HAVING count(*) <= ${TextOps.ContainMaxDf})
       |),
       |cand AS (
       |  SELECT DISTINCT ra.doc_id AS a, rb.doc_id AS b
       |  FROM rare ra JOIN rare rb ON ra.h = rb.h AND ra.doc_id < rb.doc_id
       |),
       |inter AS (
       |  SELECT c.a, c.b, count(*) AS inter
       |  FROM cand c
       |  JOIN shs x ON x.doc_id = c.a
       |  JOIN shs y ON y.doc_id = c.b AND y.h = x.h
       |  GROUP BY c.a, c.b
       |),
       |scored AS (
       |  SELECT
       |    CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND i.a > i.b)
       |         THEN i.a ELSE i.b END AS contained_id,
       |    CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND i.a > i.b)
       |         THEN i.b ELSE i.a END AS container_id,
       |    least(sa.n, sb.n) AS n_contained,
       |    greatest(sa.n, sb.n) AS n_container,
       |    i.inter
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.a
       |  JOIN sizes sb ON sb.doc_id = i.b
       |)
       |SELECT contained_id, container_id, n_contained, n_container, inter,
       |  CAST(inter AS DOUBLE) / CAST(n_contained AS DOUBLE) AS containment
       |FROM scored
       |WHERE inter * ${TextOps.ContainDen} >= n_contained * ${TextOps.ContainNum}""".stripMargin
  }

  /** Mirror of TextOps.chunks: the same ceil(n / stride) window
    * starts, list_slice ≡ Spark slice (both clamp at the array end,
    * both 1-based), array_to_string ≡ array_join, md5 identical.
    */
  val chunks: String = {
    val (w, s) = (TextOps.ChunkWindow, TextOps.ChunkStride)
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |),
       |sized AS (
       |  SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n FROM docs
       |),
       |idx AS (
       |  SELECT doc_id, words, n,
       |    unnest(range(0, CAST(ceil(n / CAST($s AS DOUBLE)) AS BIGINT))) AS chunk_id
       |  FROM sized
       |),
       |cut AS (
       |  SELECT doc_id, chunk_id, n,
       |    array_to_string(list_slice(words,
       |      CAST(chunk_id * $s + 1 AS INT), CAST(chunk_id * $s + $w AS INT)), ' ')
       |      AS chunk_text
       |  FROM idx
       |)
       |SELECT doc_id, chunk_id, chunk_id * $s AS start_token,
       |  least(CAST($w AS BIGINT), n - chunk_id * $s) AS n_tokens,
       |  chunk_text, md5(chunk_text) AS chunk_hash
       |FROM cut""".stripMargin
  }
}
