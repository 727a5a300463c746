package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, VectorOps}

/** Hybrid RRF fusion over the real sf0.001 fixture: the fused score
  * must be exactly the integer-grid RRF of the emitted component
  * ranks, the vector component must agree with knnExact, ranking must
  * be dense per query with the documented tiebreak, and both
  * single-system and dual-system hits must occur (the fusion is
  * genuinely combining two lists, not echoing one).
  */
class RetrievalSpec extends SparkSpec {

  private val grid = 1099511627776L

  test("hybridRrf: score is the exact integer-grid RRF of the emitted ranks") {
    val rows = Retrieval.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val vec = if (r.isNullAt(5)) None else Some(r.getLong(5))
      val want = lex.map(x => grid / (Retrieval.RrfK + x)).getOrElse(0L) +
        vec.map(x => grid / (Retrieval.RrfK + x)).getOrElse(0L)
      assert(r.getLong(3) === want, s"row $r")
      assert(lex.nonEmpty || vec.nonEmpty, s"row $r has no source rank")
    }
  }

  test("hybridRrf: vector components agree with knnExact; ranking is dense and tiebroken") {
    val rows = Retrieval.hybridRrf(spark, sfDir).collect()
    val exact = VectorOps.knnExact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.filterNot(_.isNullAt(5)).foreach { r =>
      assert(exact((r.getLong(0), r.getLong(2))) === r.getLong(5), s"row $r")
    }
    // per query: ranks dense 1..n, ordered by (score desc, doc_id asc)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rs.length).toSeq, s"query $q")
      val key = sorted.map(r => (-r.getLong(3), r.getLong(2))).toSeq
      assert(key === key.sorted, s"query $q order")
      assert(rs.length <= Retrieval.RrfTopK)
    }
    // fusion genuinely merges: hits from one system only AND from both
    assert(rows.exists(r => !r.isNullAt(4) && !r.isNullAt(5)))
    assert(rows.exists(r => r.isNullAt(4) ^ r.isNullAt(5)))
    // the lexical self-hit is excluded
    assert(!rows.exists(r => r.getLong(0) == r.getLong(2)))
  }

  test("hybridRrfAnn: vector components agree with knnIvfAuto; recall gauge is sane") {
    val rows = Retrieval.hybridRrfAnn(spark, sfDir).collect()
    val ivf = VectorOps.knnIvfAuto(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.filterNot(_.isNullAt(5)).foreach { r =>
      assert(ivf((r.getLong(0), r.getLong(2))) === r.getLong(5), s"row $r")
    }
    // the lex tower is SHARED with the exact twin, verbatim
    val exactLex = Retrieval.hybridRrf(spark, sfDir).collect()
      .filterNot(_.isNullAt(4))
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(4)).toMap
    rows.filterNot(_.isNullAt(4)).foreach { r =>
      assert(exactLex.get((r.getLong(0), r.getLong(2)))
        .forall(_ == r.getLong(4)), s"row $r")
    }
    // recall of the fused page against the exact-vec twin: in (0, 1],
    // one row per stride query, n_exact = the page size
    val rec = Retrieval.hybridRrfAnnRecall(spark, sfDir).collect()
    assert(rec.nonEmpty)
    rec.foreach { r =>
      assert(r.getDouble(1) > 0.0 && r.getDouble(1) <= 1.0, s"recall $r")
      assert(r.getLong(2) === Retrieval.RrfTopK.toLong, s"n_exact $r")
    }
  }

  test("mmrRerank: greedy trace matches a driver-side replay of the λ-trade") {
    // output columns: (query_id, doc_id, pick_order, rel, max_div, mmr)
    val out = Retrieval.mmrRerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    val cands = VectorOps.knnExact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val embs = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // the same in-order IEEE fold both engines run
    def dotF(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (embs(a), embs(b))
      dotF(va, vb) / (math.sqrt(dotF(va, va)) * math.sqrt(dotF(vb, vb)))
    }
    val lam = Retrieval.MmrLambda; val oml = 1 - Retrieval.MmrLambda
    cands.groupBy(_._1).foreach { case (q, cs) =>
      val rel = cs.map(c => c._2 -> c._3).toMap
      var picked = Vector.empty[Long]
      val expected = (1 to Retrieval.MmrK).flatMap { t =>
        val remaining = rel.keySet -- picked
        if (remaining.isEmpty) None else {
          val scored = remaining.toSeq.map { d =>
            val md = if (picked.isEmpty) 0.0 else picked.map(cos(d, _)).max
            val m = if (picked.isEmpty) lam * rel(d) else lam * rel(d) - oml * md
            (d, md, m)
          }
          val (d, md, m) = scored.minBy { case (d, _, m) => (-m, d) }
          picked :+= d
          Some((q, t.toLong, d, rel(d), md, m))
        }
      }
      val got = out.filter(_._1 == q).sortBy(_._2).toSeq
      assert(got === expected, s"query $q greedy trace diverges")
    }
    // the diversity term genuinely reorders at least one query's list
    val relOrder = cands.groupBy(_._1).map { case (q, cs) =>
      q -> cs.sortBy(c => (-c._3, c._2)).take(Retrieval.MmrK).map(_._2).toSeq
    }
    val mmrOrder = out.groupBy(_._1).map { case (q, rs) =>
      q -> rs.sortBy(_._2).map(_._3).toSeq
    }
    assert(mmrOrder.exists { case (q, o) => relOrder(q) != o },
      "MMR never diverged from pure relevance — fixture lost its near-dups")
  }

  test("clusterCards: per-cluster top terms come from member docs, jlh-ordered") {
    val cards = Retrieval.clusterCards(spark, sfDir).collect()
    assert(cards.nonEmpty)
    val members = VectorOps.ivfAssign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> s"cluster_${r.getAs[Int]("assigned_label")}")
    val clusterOf = members.toMap
    // every assigned cluster that has any non-null-text member emits cards
    cards.groupBy(_.getString(0)).foreach { case (cl, rs) =>
      assert(members.exists(_._2 == cl), s"unknown cluster $cl")
      assert(rs.length <= graft.operators.TextOps.SigTermsTopK)
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rs.length).toSeq)
      val key = sorted.map(r => (-r.getDouble(5), r.getString(2))).toSeq
      assert(key === key.sorted, s"cluster $cl order")
    }
    // each card's term occurs in at least one member doc of its cluster
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    cards.foreach { r =>
      val cl = r.getString(0); val term = r.getString(2)
      val hit = docs.exists { case (id, text) =>
        clusterOf.get(id).contains(cl) && text.split(" ").contains(term)
      }
      assert(hit, s"term '$term' not found in cluster $cl members")
    }
  }

  test("termsError: the bound IS an upper bound on the true error for every emitted term") {
    val got = Retrieval.termsError(spark, sfDir).collect()
    assert(got.nonEmpty)
    val exact = graft.operators.TextOps.postingsIndex(spark, sfDir)
      .groupBy(col("term")).agg(count(lit(1)).as("true_cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val (term, dc, bound) = (r.getString(0), r.getLong(1), r.getLong(2))
      val truth = exact(term)
      assert(dc <= truth, s"$term: merged $dc exceeds true $truth")
      assert(truth <= dc + bound,
        s"$term: true $truth above merged $dc + bound $bound")
      assert(bound >= 0L)
    }
  }

  test("termsError: synthetic 2-shard case reproduces the ES bound exactly") {
    val s = spark; import s.implicits._
    // shard = doc_id % 2. Shard 0 (even docs): x in {0,2,4}, y in {0,2}.
    // Shard 1 (odd docs): y in {1,3,5}, x in {1,3}. With k=1 each shard
    // returns only its winner (shard0: x cnt 3; shard1: y cnt 3), so the
    // merged x count is 3 (true 5) and its bound is shard1's kth = 3.
    val docTerms = Seq(
      0L -> "x", 2L -> "x", 4L -> "x", 0L -> "y", 2L -> "y",
      1L -> "y", 3L -> "y", 5L -> "y", 1L -> "x", 3L -> "x"
    ).toDF("doc_id", "term")
    val out = Retrieval.termsErrorFrom(docTerms, 2, 1).collect()
    assert(out.length === 1) // k=1 final cut; (3,"x") beats (3,"y") on term
    assert(out(0).getString(0) === "x")
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getLong(2) === 3L)
  }

  test("termsError: a shard that returns its whole term list contributes zero bound") {
    val s = spark; import s.implicits._
    // shard 1 (docs 1,3) has ONE distinct term only; with k=2 it returns
    // everything (no rn==k row) — terms it lacks must get bound 0 from it
    val docTerms = Seq(
      0L -> "a", 2L -> "a", 0L -> "b", 1L -> "c", 3L -> "c"
    ).toDF("doc_id", "term")
    val out = Retrieval.termsErrorFrom(docTerms, 2, 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "a": returned by shard0 (cnt 2), absent from shard1's FULL list →
    // bound 0; "c": returned by shard1 (cnt 2), absent from shard0 whose
    // kth (rn=2) count is 1 → bound 1
    assert(out("a") === ((2L, 0L)))
    assert(out("c") === ((2L, 1L)))
  }

  // ---- shared driver-side corpus replay for the search-feature specs ----

  /** (doc_id, words) for every non-null-text doc, driver-side. */
  private lazy val corpusWords: Seq[(Long, Array[String])] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap(r => Option(r.getString(1)).map(t => (r.getLong(0), t.split(" "))))
      .toSeq

  /** Full BM25 replay (the TextOps integer-grid formula) for a given
    * (query → terms) workload — returns (query, doc) → (score, nMatched).
    */
  private def bm25Replay(workload: Map[Long, Seq[String]], excludeSelf: Boolean)
      : Map[Long, Seq[(Long, Long, Long)]] = {
    val qvocab = workload.values.flatten.toSet
    val tf = corpusWords.flatMap { case (d, ws) =>
      ws.filter(qvocab).groupBy(identity).map { case (t, o) => ((d, t), o.length.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val nDocs = corpusWords.size.toLong
    val dlSum = corpusWords.map(_._2.length.toLong).sum
    val avgdl = dlSum.toDouble / nDocs.toDouble
    val dl = corpusWords.map { case (d, ws) => d -> ws.length.toLong }.toMap
    def cg(d: Long, t: String): Long = {
      val idf = (nDocs.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5) + 1.0
      val norm = 0.25 + 0.75 * (dl(d).toDouble / avgdl)
      math.floor(idf * ((tf((d, t)).toDouble * 2.2) /
        (tf((d, t)).toDouble + 1.2 * norm)) * 1099511627776.0).toLong
    }
    workload.map { case (q, ts) =>
      val scored = corpusWords.map(_._1)
        .filter(d => !excludeSelf || d != q)
        .flatMap { d =>
          val hit = ts.filter(t => tf.contains((d, t)))
          if (hit.isEmpty) None
          else Some((d, hit.map(t => cg(d, t)).sum, hit.size.toLong))
        }
      q -> scored.sortBy { case (d, s, _) => (-s, d) }
        .take(operators.TextOps.Bm25TopK)
        .map { case (d, s, m) => (d, s, m) }
    }
  }

  test("moreLikeThis: full two-phase driver replay reproduces every row") {
    // phase 1: seed-term selection
    val n = corpusWords.size.toLong
    val dfAll = corpusWords.flatMap { case (_, ws) => ws.distinct }
      .groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val byDoc = corpusWords.toMap
    val workload = operators.TextOps.MltSeeds.map { s =>
      val tf = byDoc(s).groupBy(identity).map { case (t, o) => t -> o.length.toLong }
      val terms = tf.toSeq
        .filter { case (t, _) => dfAll(t) >= operators.TextOps.MltMinDocFreq }
        .map { case (t, f) =>
          (t, f.toDouble * ((n + 1L).toDouble / (dfAll(t) + 1L).toDouble)) }
        .sortBy { case (t, sc) => (-sc, t) }
        .take(operators.TextOps.MltMaxTerms).map(_._1)
      s -> terms
    }.toMap
    // phase 2: BM25 with the seed excluded
    val want = bm25Replay(workload, excludeSelf = true)
    val got = operators.TextOps.moreLikeThis(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(got.keySet === operators.TextOps.MltSeeds.toSet)
    operators.TextOps.MltSeeds.foreach { s =>
      val rows = got(s).sortBy(_._2)
      assert(rows.map(_._2).toSeq === (1L to rows.length).toSeq, s"seed $s ranks")
      assert(rows.map { case (_, _, d, sc, m) => (d, sc, m) }.toSeq === want(s),
        s"seed $s result drift")
      assert(!rows.exists(_._3 == s), s"seed $s returned itself")
    }
  }

  test("suggest: blocking finds EXACTLY the brute-force edit-1 vocabulary hits") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val freq = corpusWords.flatMap(_._2).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    val got = operators.TextOps.suggest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    operators.TextOps.SuggestInputs.foreach { in =>
      val want = freq.keys.toSeq.map(t => (t, lev(in, t)))
        .filter(_._2 <= operators.TextOps.SuggestMaxEdits)
        .map { case (t, d) => (d.toLong, -freq(t), t) }.sorted
        .take(operators.TextOps.SuggestTopK)
        .map { case (d, nf, t) => (t, d, -nf) }
      val rows = got.filter(_._1 == in).sortBy(_._2)
      assert(rows.map(_._2).toSeq === (1L to rows.length).toSeq, s"$in ranks")
      assert(rows.map { case (_, _, t, d, f) => (t, d, f) }.toSeq === want,
        s"$in suggestions drift")
    }
    // the fixture exercises all three cases
    val byIn = got.groupBy(_._1)
    assert(byIn("ordr").head._3 === "order")
    assert(byIn("key").head._4 === 0L)   // exact-match distance 0
    assert(!byIn.contains("zebra"))      // out-of-vocabulary negative
  }

  test("highlight: fragments rebuild exactly from the raw text around the first hit") {
    val byDoc = corpusWords.toMap
    val qterms = operators.TextOps.bm25Queries
      .map { case (q, ts) => q -> ts.distinct.toSet }.toMap
    val rows = operators.TextOps.highlight(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // (query, doc) pairs are exactly the BM25 top-HlTopK
    val want = bm25Replay(
      operators.TextOps.bm25Queries.toMap.map { case (q, ts) => q -> ts },
      excludeSelf = false)
      .toSeq.flatMap { case (q, rs) =>
        rs.take(operators.TextOps.HlTopK).map(r => (q, r._1)) }.toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSet === want)
    rows.foreach { r =>
      val (q, doc) = (r.getLong(0), r.getLong(2))
      val words = byDoc(doc)
      val ts = qterms(q)
      val first = words.indexWhere(ts) + 1
      assert(first > 0, s"($q,$doc) no term present")
      assert(r.getLong(3) === first.toLong, s"($q,$doc) first_pos")
      val start = math.max(1, first - operators.TextOps.HlWindow)
      val end = math.min(words.length, first + operators.TextOps.HlWindow)
      val frag = words.slice(start - 1, end)
        .map(w => if (ts(w)) s"<em>$w</em>" else w).mkString(" ")
      assert(r.getLong(4) === start.toLong, s"($q,$doc) frag_start")
      assert(r.getString(5) === frag, s"($q,$doc) fragment")
      assert(r.getString(5).contains("<em>"), s"($q,$doc) no highlight")
    }
    // every query with any match is represented
    assert(rows.map(_.getLong(0)).distinct.length ===
      operators.TextOps.bm25Queries.size)
  }

  test("ragRetrieve: scores the deduped chunk corpus; keys decode; dedup is load-bearing") {
    val T = operators.TextOps
    val rows = T.ragRetrieve(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // full driver replay: chunk, dedup to keeper occurrences, BM25
    val radix = T.ChunkPackRadix
    val chunks = corpusWords.flatMap { case (d, ws) =>
      val n = (ws.length + T.ChunkStride - 1) / T.ChunkStride
      (0 until math.max(n, if (ws.length == 0) 0 else 1)).map { i =>
        val text = ws.slice(i * T.ChunkStride,
          math.min(ws.length, i * T.ChunkStride + T.ChunkWindow)).mkString(" ")
        (d * radix + i, text)
      }
    }
    val kept = chunks.groupBy(_._2).map { case (_, occ) => occ.minBy(_._1) }.toSeq
    val keptWords = kept.map { case (cid, text) => (cid, text.split(" ")) }
    // reuse the BM25 replay shape over the chunk corpus
    val qvocab = operators.TextOps.bm25Queries.flatMap(_._2).toSet
    val tf = keptWords.flatMap { case (c, ws) =>
      ws.filter(qvocab).groupBy(identity).map { case (t, o) => ((c, t), o.length.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val nDocs = keptWords.size.toLong
    val dlSum = keptWords.map(_._2.length.toLong).sum
    val avgdl = dlSum.toDouble / nDocs.toDouble
    val dl = keptWords.map { case (c, ws) => c -> ws.length.toLong }.toMap
    def cg(c: Long, t: String): Long = {
      val idf = (nDocs.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5) + 1.0
      val norm = 0.25 + 0.75 * (dl(c).toDouble / avgdl)
      math.floor(idf * ((tf((c, t)).toDouble * 2.2) /
        (tf((c, t)).toDouble + 1.2 * norm)) * 1099511627776.0).toLong
    }
    val want = operators.TextOps.bm25Queries.map { case (q, ts) =>
      q -> keptWords.map(_._1).flatMap { c =>
        val hit = ts.filter(t => tf.contains((c, t)))
        if (hit.isEmpty) None
        else Some((c, hit.map(t => cg(c, t)).sum, hit.size.toLong))
      }.sortBy { case (c, s, _) => (-s, c) }.take(operators.TextOps.Bm25TopK)
    }.toMap
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val got = rs.sortBy(_.getLong(1))
        .map(r => (r.getLong(2) * radix + r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSeq
      assert(got === want(q), s"query $q chunk ranking")
    }
    // the dedup stage genuinely dropped occurrences
    assert(kept.size < chunks.size, "fixture has no duplicate chunks — dedup untested")
  }

  test("nearSearch: ordered-proximity pairs replay; OOV pair stays empty") {
    val rows = operators.TextOps.nearSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val want = (for {
      (q, a, b, slop) <- operators.TextOps.NearQueries
      (d, ws) <- corpusWords
      pairs = for {
        i <- ws.indices if ws(i) == a
        j <- ws.indices if ws(j) == b && j - i >= 1 && j - i <= 1 + slop
      } yield (i + 1, j + 1)
      if pairs.nonEmpty
    } yield (q, d) -> ((pairs.length.toLong, pairs.map(_._1).min.toLong))).toMap
    assert(rows === want)
    assert(rows.nonEmpty)
    assert(!rows.keys.exists(_._1 == 2L), "OOV pair matched")
    assert(rows.keys.exists(_._1 == 3L), "repeated-term pair never matched")
  }

  test("suggestCompletion: blocking finds EXACTLY the brute-force prefix hits; OOV yields nothing") {
    val freq = corpusWords.flatMap(_._2).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    val got = operators.TextOps.suggestCompletion(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    operators.TextOps.CompletionInputs.foreach { in =>
      val want = freq.keys.toSeq.filter(_.startsWith(in))
        .map(t => (-freq(t), t)).sorted
        .take(operators.TextOps.CompletionTopK)
        .map { case (nf, t) => (t, -nf) }
      val rows = got.filter(_._1 == in).sortBy(_._2)
      assert(rows.map(_._2).toSeq === (1L to rows.length).toSeq, s"$in ranks")
      assert(rows.map { case (_, _, t, f) => (t, f) }.toSeq === want,
        s"$in completions drift")
    }
    val byIn = got.groupBy(_._1)
    assert(!byIn.contains("zeb"), "OOV prefix produced a completion")
    assert(byIn("join").exists(_._3 == "join"),
      "a full vocabulary word is a completion of itself")
    assert(byIn("s").length === operators.TextOps.CompletionTopK,
      "a fertile single-char prefix must fill the budget")
  }

  test("fuzzyQuery: docs match exactly the brute-force edit-1 expansion") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val got = operators.TextOps.fuzzyQuery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val vocab = corpusWords.flatMap(_._2).distinct
    val want = (for {
      in <- operators.TextOps.SuggestInputs
      variants = vocab.map(t => t -> lev(in, t).toLong)
        .filter(_._2 <= operators.TextOps.SuggestMaxEdits).toMap
      if variants.nonEmpty
      (doc, ws) <- corpusWords
      hits = ws.filter(variants.contains)
      if hits.nonEmpty
    } yield (in, doc) -> ((hits.distinct.length.toLong, hits.length.toLong,
      hits.map(variants).min))).toMap
    assert(got === want, s"got ${got.size} vs want ${want.size}")
  }

  test("wildcardSearch: both anchors resolve exactly the brute-force term sets") {
    val tf = corpusWords.flatMap { case (d, ws) => ws.map(w => (d, w)) }
    val stats = tf.groupBy(_._2).map { case (t, xs) =>
      t -> ((xs.map(_._1).distinct.length.toLong, xs.length.toLong))
    }
    val got = operators.TextOps.wildcardSearch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val want = (for {
      p <- operators.TextOps.WildcardQueries
      t <- stats.keys
      if (p.endsWith("*") && t.startsWith(p.stripSuffix("*"))) ||
        (p.startsWith("*") && t.endsWith(p.stripPrefix("*")))
    } yield (p, t) -> stats(t)).toMap
    assert(got === want, s"got ${got.keySet} vs want ${want.keySet}")
    assert(got.keys.exists(_._1 == "*er") && got.keys.exists(_._1 == "ord*"),
      "both anchor directions must resolve")
    assert(!got.keys.exists(k => k._1 == "zeb*" || k._1 == "*xx"),
      "OOV patterns must resolve to nothing")
  }

  test("phrasePrefixSearch: brute-force window replay; bare-prefix, OOV, and self-matching-fixed cases") {
    val got = operators.TextOps.phrasePrefixSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val want = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    operators.TextOps.MppQueries.foreach { case (q, fixed, prefix) =>
      corpusWords.foreach { case (doc, ws) =>
        val n = fixed.length + 1
        val starts = (0 to ws.length - n).filter { s =>
          fixed.zipWithIndex.forall { case (t, i) => ws(s + i) == t } &&
            ws(s + n - 1).startsWith(prefix)
        }
        if (starts.nonEmpty)
          want((q, doc)) = (starts.length.toLong, starts.head.toLong + 1)
      }
    }
    assert(got === want.toMap, s"got ${got.size} vs want ${want.size}")
    // fixture exercises the cases: bare prefix matches, OOV is empty,
    // and the fixed-term-also-matches-prefix query returns something
    assert(got.keys.exists(_._1 == 2L), "bare-prefix query matched nothing")
    assert(!got.keys.exists(_._1 == 3L), "OOV prefix produced matches")
    assert(got.keys.exists(_._1 == 4L), "self-matching-fixed query matched nothing")
  }

  test("boolPrefixSearch: brute-force bool-OR replay incl. the overlap double-count") {
    import operators.TextOps.{MppMaxExpansions, MppQueries}
    val got = operators.TextOps.boolPrefixSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val vocab = corpusWords.flatMap(_._2).distinct.sorted
    val want = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long, Long)]
    MppQueries.foreach { case (q, fixed, prefix) =>
      val expanded = vocab.filter(_.startsWith(prefix)).take(MppMaxExpansions)
      corpusWords.foreach { case (doc, ws) =>
        val tf = ws.groupBy(identity).view.mapValues(_.length.toLong).toMap
        val fullHit = fixed.distinct.filter(tf.contains)
        val prefHit = expanded.filter(tf.contains)
        if (fullHit.nonEmpty || prefHit.nonEmpty)
          // a term present as BOTH a fixed clause and an expansion
          // contributes its tf twice — two should clauses, ES-style
          want((q, doc)) = (fullHit.length.toLong, prefHit.length.toLong,
            fullHit.map(tf).sum + prefHit.map(tf).sum)
      }
    }
    assert(got === want.toMap, s"got ${got.size} vs want ${want.size}")
    // the 'order'/'or*' query exercises the both-roles double-count
    assert(got.keys.exists(_._1 == 4L))
    // the OOV prefix query still matches through its fixed term (OR,
    // unlike phrase_prefix's conjunction which returns nothing for it)
    assert(got.keys.exists(_._1 == 3L), "bool-OR must survive an OOV prefix")
  }

  test("suggestPhrase: per-slot candidates × bigram LM replay; OOV slot yields nothing") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = corpusWords.flatMap(_._2).distinct
    val bg = corpusWords.flatMap { case (_, ws) => ws.zip(ws.drop(1)) }
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    def cands(in: String) = vocab.map(t => (t, lev(in, t).toLong))
      .filter(_._2 <= operators.TextOps.SuggestMaxEdits)
    val got = operators.TextOps.suggestPhrase(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    operators.TextOps.PhraseSuggestInputs.foreach { case (q, ia, ib) =>
      val want = (for ((ca, da) <- cands(ia); (cb, db) <- cands(ib))
        yield (ca, cb, bg.getOrElse((ca, cb), 0L), da + db))
        .sortBy { case (ca, cb, c, ds) => (-c, ds, ca, cb) }
        .take(operators.TextOps.PhraseSuggestTopK)
      val rows = got.filter(_._1 == q).sortBy(_._2)
      assert(rows.map(_._2).toSeq === (1L to rows.length).toSeq, s"query $q ranks")
      assert(rows.map { case (_, _, a, b, c, ds) => (a, b, c, ds) }.toSeq === want,
        s"query $q suggestions")
    }
    // the LM is doing work: the top correction is a real adjacent bigram
    val top0 = got.filter(r => r._1 == 0L && r._2 == 1L).head
    assert((top0._3, top0._4) === (("order", "scan")))
    assert(top0._5 > 0L)
    assert(!got.exists(_._1 == 2L), "OOV slot produced a suggestion")
  }

  test("percolate: matches are exactly the docs containing EVERY query term") {
    val rows = operators.TextOps.percolate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for {
      (d, ws) <- corpusWords
      set = ws.toSet
      (q, ts) <- operators.TextOps.bm25Queries
      dts = ts.distinct
      if dts.forall(set)
    } yield (d, q) -> dts.length.toLong).toMap
    assert(rows === want)
    assert(rows.nonEmpty)
    // the conjunction is doing work: some doc matches one query but not all
    val byDoc = rows.keys.groupBy(_._1).values.map(_.size)
    assert(byDoc.exists(_ < operators.TextOps.bm25Queries.size))
  }

  test("functionScore: weights, decay, and ranking replay exactly from doc metadata") {
    val T = operators.TextOps
    val meta = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "lang", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    val base = T.bm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val rows = T.functionScore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(2))
      val (src, lang, nc) = meta(d)
      val w = (if (T.FsBoostSources.contains(src)) 3L else 1L) *
        (if (lang == T.FsBoostLang) 2L else 1L)
      val dec = math.max(0L, T.FsDecayScale - math.abs(nc - T.FsDecayOrigin))
      assert(r.getLong(3) === base((q, d)), s"($q,$d) base score drift")
      assert(r.getLong(4) === w, s"($q,$d) weight")
      assert(r.getLong(5) === dec, s"($q,$d) decay")
      assert(r.getLong(6) === (base((q, d)) / T.FsScoreShift) * w * dec,
        s"($q,$d) final")
    }
    // per query: the emitted window is the exact top-FsTopK of the
    // rescored base window, dense ranks, (final DESC, doc ASC) order
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === base.keySet.map(_._1))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rs.length).toSeq)
      val want = base.collect { case ((`q`, d), sc) =>
        val (src, lang, nc) = meta(d)
        val w = (if (T.FsBoostSources.contains(src)) 3L else 1L) *
          (if (lang == T.FsBoostLang) 2L else 1L)
        val dec = math.max(0L, T.FsDecayScale - math.abs(nc - T.FsDecayOrigin))
        (d, (sc / T.FsScoreShift) * w * dec)
      }.toSeq.sortBy { case (d, f) => (-f, d) }.take(T.FsTopK)
      assert(sorted.map(r => (r.getLong(2), r.getLong(6))).toSeq === want,
        s"query $q window")
    }
    // the boost genuinely reorders at least one query vs base rank
    val reordered = rows.exists { r =>
      val (q, d) = (r.getLong(0), r.getLong(2))
      val baseRank = base.collect { case ((`q`, d2), sc) => (d2, sc) }
        .toSeq.sortBy { case (d2, sc) => (-sc, d2) }
        .indexWhere(_._1 == d) + 1
      baseRank != r.getLong(1)
    }
    assert(reordered, "function_score never changed any ranking — fixture too weak")
  }

  test("rank_eval: per-query metrics replay and the summary row is the decimal mean") {
    import graft.operators.{Retrieval => R, VectorOps => V}
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val knn = V.knnExact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows = R.rankEval(spark, sfDir).collect()
    val (summ, per) = rows.partition(_.getLong(0) == -1L)
    assert(summ.length === 1)
    assert(per.map(_.getLong(0)).toSet === knn.map(_._1).toSet)
    val perMap = per.map(r => r.getLong(0) -> r).toMap
    knn.groupBy(_._1).foreach { case (q, ns) =>
      val ql = labels(q)
      val rel = ns.filter(n => labels(n._2) == ql)
      val r = perMap(q)
      assert(r.getLong(1) === rel.length.toLong, s"q$q rel_at_k")
      assert(r.getLong(2) === labels.values.count(_ == ql).toLong - 1L,
        s"q$q n_rel")
      if (rel.isEmpty) assert(r.isNullAt(3) && r.getDouble(6) === 0.0)
      else {
        assert(r.getLong(3) === rel.map(_._3).min, s"q$q first_rank")
        assert(r.getDouble(6) === 1.0 / rel.map(_._3).min, s"q$q rr")
      }
      assert(r.getDouble(4) === rel.length.toDouble / V.K, s"q$q p_at_k")
      assert(r.getDouble(5) === rel.length.toDouble / r.getLong(2), s"q$q recall")
      // NDCG replay with the same code-gen decimal weights
      val dcg = rel.map(n => R.dcgWeight(n._3.toInt))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      val m = math.min(r.getLong(2), V.K.toLong).toInt
      val idcg = (1 to m).map(R.dcgWeight)
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      assert(r.getDouble(7) === dcg.doubleValue / idcg.doubleValue, s"q$q ndcg")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
    }
    // summary: exact decimal means of the per-query columns
    def dmean(vs: Seq[Double]): Double =
      vs.map(v => BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / vs.length.toDouble
    val s = summ.head
    assert(s.getLong(1) === per.map(_.getLong(1)).sum)
    assert(s.getLong(2) === per.map(_.getLong(2)).sum)
    assert(s.isNullAt(3))
    assert(s.getDouble(4) === dmean(per.map(_.getDouble(4)).toSeq))
    assert(s.getDouble(5) === dmean(per.map(_.getDouble(5)).toSeq))
    assert(s.getDouble(6) === dmean(per.map(_.getDouble(6)).toSeq))
    assert(s.getDouble(7) === dmean(per.map(_.getDouble(7)).toSeq))
  }

  test("rank_eval_ivf: the harness replays exactly over the ANN run") {
    import graft.operators.{Retrieval => R, VectorOps => V}
    // NOTE: the IVF run's metrics are NOT bounded by the exact run's —
    // cosine-optimal is not label-optimal, so an approximate list can
    // legitimately score higher on label relevance (observed on this
    // fixture: IVF p@k 0.14 vs exact 0.12). The invariant is the
    // harness itself: identical metric math over whichever run.
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val run = V.knnIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val per = R.rankEvalIvf(spark, sfDir)
      .where(col("query_id") >= 0).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(per.keySet === run.map(_._1).toSet)
    run.groupBy(_._1).foreach { case (q, ns) =>
      val rel = ns.filter(n => labels(n._2) == labels(q))
      val r = per(q)
      assert(r.getLong(1) === rel.length.toLong, s"q$q rel_at_k")
      assert(r.getDouble(4) === rel.length.toDouble / V.K, s"q$q p_at_k")
      val dcg = rel.map(n => R.dcgWeight(n._3.toInt))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      val m = math.min(r.getLong(2), V.K.toLong).toInt
      val idcg = (1 to m).map(R.dcgWeight)
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      assert(r.getDouble(7) === dcg.doubleValue / idcg.doubleValue, s"q$q ndcg")
    }
  }
}
