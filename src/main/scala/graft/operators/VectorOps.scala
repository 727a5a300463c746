package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding similarity search over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  *
  * Generalization layer (builder brief): the reference has no vector
  * operators, so these are designed Spark-first for the 100 TB shape:
  *   - [[knnExact]] — brute-force cosine top-k for a small query set:
  *     broadcast the queries, never shuffle the big side. The correctness
  *     baseline; O(N·|Q|) compute but a single scan.
  *   - [[knnLsh]] — random-hyperplane sign-LSH: band the bit code and
  *     bucket-join queries to candidates (same scale-safe shape as
  *     TextOps.dedupMinhashLsh — never all-pairs), then exact cosine only
  *     on candidates.
  *   - [[centroids]] / [[ivfAssign]] — the IVF building block: per-label
  *     centroids via decimal-accumulated (order-independent, hence
  *     cross-engine deterministic) element sums, then nearest-centroid
  *     assignment against a broadcast centroid table.
  *
  * Cross-engine float determinism contract (shared with
  * [[graft.OracleVectors]]):
  *   - every dot product / norm is a SEQUENTIAL left fold over dims in
  *     index order, in DOUBLE; DuckDB's `list_reduce` seeds with the
  *     first element, Spark's `aggregate` with 0.0 — identical because
  *     0.0 + x == x;
  *   - float→decimal casts always go through DOUBLE (float→decimal
  *     directly rounds differently in DuckDB);
  *   - group sums that cross a shuffle are DECIMAL (exact, order-
  *     independent), converted to double only once at the end.
  */
object VectorOps {

  /** Fixture embedding dimensionality. */
  val Dim = 64

  /** Top-k neighbors returned per query. */
  val K = 10

  /** Query-set selector: every 100th vector is a query point. */
  val QueryMod = 100

  /** Sign-LSH banding parameters — OPERATOR PARAMETERS, not fixture
    * constants, because they are the scale dial of the whole family: a
    * band self-join on near-random codes produces
    * `≈ C(N,2) · nBands / 2^bandBits` candidate pairs, so `bandBits`
    * must grow with log2(N) to hold expected candidates LINEAR in N
    * (pick `bandBits ≈ log2(N · nBands / c)` for ~`c·N/2` candidates).
    * Round-3 defaults (16 planes / 4-bit bands = 64 buckets corpus-wide)
    * degenerated to ~all-pairs on a large corpus; the defaults below
    * (64 planes / 8-bit bands → 8 bands × 256 keys) are sized for the
    * test fixtures (≤2k vectors, near-dup sims 0.35–0.6), and a 10⁹-
    * vector deployment at a 0.95 dup threshold would run e.g.
    * `bandBits = 16–24` with more planes via these parameters.
    */
  val NumPlanes = 64
  val BandBits = 8
  val NumBands: Int = NumPlanes / BandBits // 8 bands of 8 bits

  /** Deterministic ±1 hyperplane weights from a Knuth-style LCG over the
    * flat (plane, dim) index — reproducible in plain SQL-free arithmetic
    * on both engines, embedded as a literal on both sides.
    */
  def planeWeight(p: Int, d: Int): Int = {
    val i = p.toLong * Dim + d
    val x = (i * 2654435761L + 1013904223L) % 4294967296L
    if (((x >> 16) & 1L) == 1L) 1 else -1
  }

  def planesFor(numPlanes: Int): IndexedSeq[IndexedSeq[Int]] =
    IndexedSeq.tabulate(numPlanes, Dim)(planeWeight)

  val planes: IndexedSeq[IndexedSeq[Int]] = planesFor(NumPlanes)

  /** Spark SQL literal `array(array(1,-1,...), ...)`. */
  def planesLitSpark(numPlanes: Int = NumPlanes): String =
    planesFor(numPlanes).map(_.mkString("array(", ",", ")")).mkString("array(", ",", ")")

  /** DuckDB literal `[[1,-1,...], ...]` (see OracleVectors). */
  def planesLitDuck(numPlanes: Int = NumPlanes): String =
    planesFor(numPlanes).map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** Sequential in-order dot-product fold of two array columns, in
    * double. Codegen'd higher-order functions — no UDF.
    */
  def dot(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  /** `numPlanes`-bit sign code: bit p = sign of <plane_p, v>. */
  def codeExpr(numPlanes: Int = NumPlanes): String =
    s"""concat_ws('', transform(${planesLitSpark(numPlanes)}, p ->
       |  CASE WHEN aggregate(zip_with(p, embedding, (w, x) -> w * CAST(x AS DOUBLE)),
       |    CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN '1' ELSE '0' END))""".stripMargin

  /** Band keys computed directly from each band's own plane slice —
    * `numPlanes / bandBits` keys of `bandBits` sign bits each, equal to
    * `substring(codeExpr, b·bandBits+1, bandBits)` but with every
    * plane's sign evaluated exactly ONCE per row: banding over a
    * separate `code` column lets CollapseProject inline the full
    * numPlanes fold into every band lambda (numBands× recompute — the
    * same trap the minhash pipeline dodges by hashing before explode).
    */
  def bandKeysExpr(numPlanes: Int, bandBits: Int): String =
    s"""transform(sequence(0, ${numPlanes / bandBits - 1}), b ->
       |  concat_ws('', transform(slice(${planesLitSpark(numPlanes)}, b * $bandBits + 1, $bandBits), p ->
       |    CASE WHEN aggregate(zip_with(p, embedding, (w, x) -> w * CAST(x AS DOUBLE)),
       |      CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN '1' ELSE '0' END)))""".stripMargin

  /** Embeddings with their (not-quite-1.0) squared norms precomputed once. */
  private[operators] def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"), col("embedding"),
      expr(dot("embedding", "embedding")).as("nrm"))

  private def cosine: org.apache.spark.sql.Column =
    (expr(dot("embedding", "qv")) / (sqrt(col("nrm")) * sqrt(col("qnrm")))).as("sim")

  /** Final per-query cut via the native bounded-heap aggregate
    * ([[graft.functions.TopKBySim]]): identical rows to the
    * `row_number() OVER (ORDER BY sim DESC, neighbor_id)` + filter
    * form (same strict total order — every oracle stays the window
    * formulation, which is the standing differential proof), but the
    * scored pairs reduce to ≤ K per query on the map side instead of
    * all shuffling into a window sort.
    */
  private def topK(sims: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.register(sims.sparkSession)
    sims.groupBy(col("query_id"))
      .agg(expr(s"topk_by_sim(neighbor_id, sim, $K)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("nb.sim").as("sim"))
  }

  /** Shortlist cut for the approximate passes: the rr best
    * (asim DESC, neighbor_id ASC) candidates per query as bare
    * (query_id, neighbor_id) pairs — payload columns rejoin AFTER the
    * cut, so the pre-exchange stream carries 16 bytes per scored pair
    * instead of two embeddings + norms per row, and the window the
    * `arank` form would sort N·|Q| rows through disappears.
    */
  private def shortlistIds(approx: DataFrame, rr: Int): DataFrame = {
    graft.plans.GraftExtensions.register(approx.sparkSession)
    approx.groupBy(col("query_id"))
      .agg(expr(s"topk_by_sim(neighbor_id, asim, $rr)").as("tk"))
      .select(col("query_id"),
        explode(expr("transform(tk, t -> t.neighbor_id)")).as("neighbor_id"))
  }

  /** Exact top-k via the native codegen [[graft.functions.CosineSimilarity]]
    * expression — one fused loop per pair instead of three lambda folds.
    * Same oracle as [[knnExact]]: the fused accumulators are bit-equal
    * to the composed form (see the expression's Scaladoc), so this
    * doubles as the expression's differential correctness proof.
    */
  def knnExactNative(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val q = base.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    topK(
      base.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          expr("cosine_sim(embedding, qv)").as("sim")))
  }

  /** Exact top-k via the native bounded-heap aggregate
    * [[graft.functions.TopKBySim]] — the scale form of the KNN cut: the
    * window variants shuffle every scored pair (N·|Q| rows) before
    * ranking, while `topk_by_sim` runs under partial aggregation, so
    * each map task reduces its slice to ≤ k rows per query and the
    * exchange carries |tasks|·|Q|·k entries. Scores come from the
    * native codegen cosine; ranks are array positions. Same DuckDB
    * oracle as [[knnExact]] — row-identical output is the differential
    * proof that the heap's (sim DESC, id ASC) cut equals the window's
    * `row_number` semantics.
    */
  def knnExactTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val q = base.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    base.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("cosine_sim(embedding, qv)").as("sim"))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_by_sim(neighbor_id, sim, $K)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("nb.sim").as("sim"))
  }

  /** Exact cosine top-k: broadcast-nested-loop against the tiny query
    * set; the embedding corpus is scanned once and never shuffled (the
    * only shuffle is the per-query window over N·|Q| pre-filtered rows).
    *
    * Memoized: six recall gauges ([[lshRecall]], [[ivfRecall]],
    * [[sq8Recall]], [[pqRecall]], [[mrlRecall]], [[ivfPqRecall]])
    * consume this as their ground truth, and at real scale the exact
    * baseline is the EXPENSIVE half of recall evaluation — build it
    * once per session like the codebooks, not once per gauge. The
    * result is deterministic (ties broken by neighbor_id in topK), so
    * caching cannot change any consumer's output.
    */
  def knnExact(spark: SparkSession, dir: String): DataFrame =
    TextOps.memoized(spark, dir, "knn_exact") {
      val base = withNorm(spark, dir)
      val q = base.where(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("nrm").as("qnrm"))
      topK(
        base.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"), cosine))
    }

  /** Metadata-filtered exact KNN — the ES filtered-kNN shape: the
    * predicate participates in the SEARCH, it doesn't post-trim. Each
    * query retrieves its top-k among corpus vectors passing the filter
    * (here: same `label` as the query — the tenant/category/language
    * gate of a real deployment), so the result always carries k true
    * filtered neighbors; filtering an UNFILTERED top-k afterwards
    * returns however few survived — the recall cliff filtered kNN
    * exists to avoid (at 10 balanced labels, post-filtering k=10
    * keeps ~1 hit per query).
    *
    * The predicate sits BEFORE the scoring projection, so pruned
    * pairs cost an integer comparison, never the 64-dim dot product —
    * at 100 TB the same predicate composes with an IVF/LSH candidate
    * stream (filter the bucket join) or, better, with label-
    * partitioned storage where the filter becomes partition pruning
    * and the scan itself shrinks ([[graft.sources.Layout]]'s lever).
    */
  def knnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    val q = base.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qv"), col("nrm").as("qnrm"))
    topK(
      base.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id") && col("label") === col("qlabel"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), cosine))
  }

  /** Semi-hard margin (FaceNet's α): a negative is semi-hard when it
    * sits within α of the anchor's closest positive — farther than the
    * positive, but close enough to produce gradient. Literal on both
    * engines (the identical decimal literal parses to the identical
    * double).
    */
  val HnMargin = "0.05"

  /** Contrastive hard-negative mining — the training-data op an
    * embedding-model pipeline runs between curation and training: for
    * each anchor (the query subset), the top-k most similar vectors of
    * a DIFFERENT label ([[knnFiltered]] with the predicate inverted —
    * the same pre-scoring filter placement), annotated with the
    * anchor's closest-positive similarity and the FaceNet semi-hard
    * flag (pos_sim − α < sim < pos_sim). The flag is a CASE over
    * doubles both engines compute from the identical expression tree —
    * no new float enters the compare. Corpus-side work is the one
    * broadcast-nested-loop scan the exact-KNN family pays; the
    * positive reference is a per-query max over the same scored
    * stream (no second corpus pass at scale — one conditional split
    * of one scan).
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    val q = base.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qv"), col("nrm").as("qnrm"))
    val scored = base.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
    val negs = topK(scored.where(col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cosine))
    val pos = scored.where(col("label") === col("qlabel"))
      .select(col("query_id"), cosine)
      .groupBy(col("query_id")).agg(max(col("sim")).as("pos_sim"))
    negs.join(pos, Seq("query_id"), "left")
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"),
        col("pos_sim"),
        expr(s"""CAST(CASE WHEN pos_sim IS NOT NULL AND sim < pos_sim
                 |AND sim + $HnMargin > pos_sim THEN 1 ELSE 0 END AS BIGINT)"""
          .stripMargin).as("semi_hard"))
  }

  /** Silhouette grid: 2^20 — s ∈ [−1, 1] needs no 2^40 headroom. */
  val SilGrid = 1048576L

  /** Per-cluster SIMPLIFIED silhouette over the trained IVF codebook —
    * the clustering-quality readout that prices the `nlist` dial
    * (collapsing silhouette ⇒ centroids too close; the metric k-means
    * elbow charts plot). Simplified = centroid-based (Hruschka et al.):
    * a = cosine distance to own centroid, b = to the nearest OTHER
    * centroid, s = (b − a)/max(a, b) — the classic pairwise form is
    * O(N²) and never runs at corpus scale. Mechanics: one corpus ×
    * broadcast-codebook scan, top-2 centroids per vector via the
    * bounded-heap aggregate (map-side, no vec-keyed window shuffle),
    * s floored onto the 2^20 grid per vector (IEEE-deterministic
    * inputs → deterministic floor), order-free BIGINT grid sums per
    * cluster, ONE double division at the edge. Shares the memoized
    * codebook with the whole IVF family.
    */
  def silhouette(spark: SparkSession, dir: String, nlist: Int = NList): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val sims = withNorm(spark, dir)
      .crossJoin(broadcast(centroidVectors(spark, dir, nlist)))
      .select(col("vec_id"), col("c_label").cast("long").as("c_label"),
        (expr(dot("embedding", "centroid")) /
          (sqrt(col("nrm")) * sqrt(col("cnrm")))).as("sim"))
    val top2 = sims.groupBy(col("vec_id"))
      .agg(expr("topk_by_sim(c_label, sim, 2)").as("tk"))
      .where(size(col("tk")) === 2)
      .select(col("vec_id"),
        expr("tk[0].neighbor_id").as("cluster"),
        expr("tk[0].sim").as("sim1"), expr("tk[1].sim").as("sim2"))
    top2
      .select(col("cluster"), expr(
        s"""CAST(CASE WHEN greatest(1.0D - sim1, 1.0D - sim2) = 0.0D THEN 0
           |ELSE floor((sim1 - sim2) / greatest(1.0D - sim1, 1.0D - sim2)
           |  * CAST($SilGrid AS DOUBLE)) END AS BIGINT)""".stripMargin).as("s_grid"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("s_grid")).as("s_grid_sum"))
      .select(col("cluster"), col("n"), col("s_grid_sum"),
        (col("s_grid_sum").cast("double") /
          (col("n").cast("double") * lit(SilGrid.toDouble))).as("mean_silhouette"))
  }

  /** Query-side multi-probe expansion: the band key itself plus every
    * Hamming-1 variant when `probeBits = 1` — the standard recall
    * lever at FIXED band entropy (wider bands keep collision rates
    * scale-safe; probing ±1-bit buckets recovers the near neighbors a
    * single exact-key lookup misses). Probe count per band is
    * `1 + bandBits`, so cost stays O(bucket lookups), never all-pairs.
    * The flipped keys are pairwise distinct from the original and each
    * other, so plain concat needs no dedup.
    */
  private def probeKeysExpr(bandBits: Int): String =
    s"""concat(array(band_key), transform(sequence(1, $bandBits), i ->
       |  concat(substring(band_key, 1, i - 1),
       |         CASE WHEN substring(band_key, i, 1) = '1' THEN '0' ELSE '1' END,
       |         substring(band_key, i + 1, $bandBits - i))))""".stripMargin

  /** ANN via banded sign-LSH: corpus → `numPlanes`-bit code →
    * `numPlanes / bandBits` band keys; candidates are vectors sharing
    * ≥1 band with a query (bucket equi-join on (band_idx, band_key) —
    * O(collisions), the 100 TB path, with bandBits as the collision-
    * rate dial — see the banding-parameters note above); exact cosine
    * + top-k only on candidates. `probeBits = 1` turns on Hamming-1
    * multi-probe on the query side (see [[probeKeysExpr]]).
    */
  def knnLsh(spark: SparkSession, dir: String,
      numPlanes: Int = NumPlanes, bandBits: Int = BandBits,
      probeBits: Int = 0): DataFrame = {
    require(probeBits == 0 || probeBits == 1,
      s"probeBits must be 0 (exact buckets) or 1 (Hamming-1 multi-probe), got $probeBits")
    // banding runs the native fused sign_bands expression — one codegen
    // loop per row; profiled ~12µs per plane with the compositional
    // interpreted-lambda form, which bandKeysExpr retains as the
    // differential reference (SignBandKeysSpec asserts equality)
    graft.plans.GraftExtensions.register(spark)
    val base = withNorm(spark, dir)
    val bands = base.select(
      col("vec_id"),
      posexplode(expr(s"sign_bands(embedding, $numPlanes, $bandBits)"))
        .as(Seq("band_idx", "band_key")))
    val qBandsExact = bands.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("band_idx"), col("band_key"))
    val qBands =
      if (probeBits == 0) qBandsExact
      else qBandsExact.select(col("query_id"), col("band_idx"),
        explode(expr(probeKeysExpr(bandBits))).as("band_key"))
    val candidates = bands.join(broadcast(qBands), Seq("band_idx", "band_key"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val sims = candidates
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"), col("nrm")),
        Seq("neighbor_id"))
      .join(broadcast(
        base.where(col("vec_id") % QueryMod === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qnrm"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine)
    topK(sims)
  }

  /** Cosine threshold above which a candidate pair counts as a near
    * duplicate. Fixture-tuned (the synthetic embeddings are spread, max
    * pairwise sim ≈ 0.51); a production text-embedding corpus runs this
    * at ~0.95+. A parameter of the operator, not of its shape.
    */
  val DupThreshold = 0.35

  /** Embedding-cosine near-duplicate pairs — the vector-space member of
    * the dedup family (TextOps has the token-space ones): band the
    * sign-LSH code of EVERY vector, self-join buckets on (band_idx,
    * band_key) for candidates — O(collisions), never all-pairs, the
    * same 100 TB shape as [[graft.operators.TextOps.dedupMinhashLsh]] —
    * then exact cosine only on candidates and keep pairs above
    * [[DupThreshold]]. Downstream "keep one per near-dup set" composes
    * this with the same min-label clustering TextOps.dedupClusters
    * runs over its pair graph.
    */
  def dedupEmbedding(spark: SparkSession, dir: String,
      numPlanes: Int = NumPlanes, bandBits: Int = BandBits): DataFrame = {
    // The candidate set is the big side here (all bucket collisions,
    // not one query set's) — millions of pairs at sf0.1 — so the exact
    // re-rank runs the fused native cosine_sim expression (one codegen
    // loop per pair) rather than the three interpreted lambda folds;
    // bit-equal to the composed form per CosineSimilarity's contract,
    // so the DuckDB oracle is unchanged. Skipping the precomputed-norm
    // columns also halves the enrichment joins' payload width.
    graft.plans.GraftExtensions.register(spark)
    val bands = Tables.embeddings(spark, dir).select(
      col("vec_id"),
      posexplode(expr(s"sign_bands(embedding, $numPlanes, $bandBits)"))
        .as(Seq("band_idx", "band_key")))
    val a = bands.select(col("vec_id").as("vec_a"), col("band_idx"), col("band_key"))
    val b = bands.select(col("vec_id").as("vec_b"), col("band_idx"), col("band_key"))
    val candidates = a.join(b, Seq("band_idx", "band_key"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct()
    candidates
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), Seq("vec_a"))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        expr("cosine_sim(emb_a, emb_b)").as("sim"))
      .where(col("sim") >= DupThreshold)
  }

  /** Sample stride for [[embDedupEval]]'s quadratic truth pass. */
  val DedupEvalMod = 4L

  /** Dedup-quality evaluation for the VECTOR side —
    * [[graft.operators.TextOps.dedupEval]]'s twin: score the sign-LSH
    * candidate generator ([[dedupEmbedding]]) against EXACT cosine
    * ground truth (all pairs ≥ [[DupThreshold]]) on a deterministic
    * 1-in-[[DedupEvalMod]] sample, and emit the confusion counts with
    * precision/recall. The truth pass is quadratic BY DEFINITION (it
    * is the thing the banded generator exists to avoid), so it runs on
    * the sampled stride — the eval-budget dial — as one broadcast
    * nested-loop over the sample only. Both sides score with the same
    * fused `cosine_sim`, so recall measures exactly the BANDING's
    * misses, nothing else — and precision is 1.0 BY CONSTRUCTION
    * ([[dedupEmbedding]] emits post-verification pairs), which the
    * spec pins as the "verified generator" property. Measured on the
    * fixture: recall 4/15 at τ = 0.35 over near-random vectors — the
    * quantified form of the [[DupThreshold]] Scaladoc's warning that
    * the default banding is sized for high-sim dup corpora, exactly
    * what this eval exists to surface before a production run.
    */
  def embDedupEval(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val sample = Tables.embeddings(spark, dir)
      .where(col("vec_id") % DedupEvalMod === 0)
      .select(col("vec_id"), col("embedding"))
    val truth = sample
      .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      .crossJoin(broadcast(sample
        .select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))))
      .where(col("vec_a") < col("vec_b") &&
        expr("cosine_sim(emb_a, emb_b)") >= DupThreshold)
      .select(col("vec_a"), col("vec_b"), lit(1L).as("t"))
    val pred = dedupEmbedding(spark, dir)
      .where(col("vec_a") % DedupEvalMod === 0 &&
        col("vec_b") % DedupEvalMod === 0)
      .select(col("vec_a"), col("vec_b"), lit(1L).as("p"))
    truth.join(pred, Seq("vec_a", "vec_b"), "full_outer")
      .agg(sum(coalesce(col("t"), lit(0L))).as("n_true_pairs"),
        sum(coalesce(col("p"), lit(0L))).as("n_cand_pairs"),
        sum(coalesce(col("t"), lit(0L)) * coalesce(col("p"), lit(0L)))
          .as("n_tp"))
      .select(col("n_true_pairs"), col("n_cand_pairs"), col("n_tp"),
        when(col("n_cand_pairs") > 0L,
          col("n_tp").cast("double") / col("n_cand_pairs").cast("double"))
          .as("precision"),
        when(col("n_true_pairs") > 0L,
          col("n_tp").cast("double") / col("n_true_pairs").cast("double"))
          .as("recall"))
  }

  /** The deterministic eval-set stride for [[embDecontaminate]] —
    * the embedding-side analog of TextOps.EvalStride (coprime to the
    * LSH query stride so the two roles don't coincide). At scale the
    * eval set is its own table; the stride is the fixture stand-in.
    */
  val EvalMod = 13

  /** Embedding-space eval-set decontamination — the semantic
    * counterpart of [[graft.operators.TextOps.decontaminate]]: where
    * the n-gram filter catches verbatim benchmark leakage, this one
    * catches paraphrases and translations that share no surface
    * n-gram but embed next to an eval item (the reason modern
    * pipelines run BOTH filters). A training vector is contaminated
    * when its cosine to ANY eval vector reaches [[DupThreshold]]
    * (fixture-tuned like the near-dup bar; production text embeddings
    * run ~0.9+). Emits every corpus vector with its hit count, max
    * eval similarity, and keep flag — the curation table a pipeline
    * filters by, same contract as the text-side decontaminate.
    *
    * Shape at 100 TB: the eval side is tiny by construction, so its
    * Hamming-1-expanded band probes BROADCAST (the multi-probe side
    * sits on the small relation — recall lever costs no corpus work);
    * the corpus streams through the bucket equi-join, exact cosine
    * runs on candidates only, and the final left join keys on vec_id
    * (one corpus-sized shuffle). Never all-pairs.
    */
  def embDecontaminate(spark: SparkSession, dir: String,
      numPlanes: Int = NumPlanes, bandBits: Int = BandBits): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val bands = emb.select(
      col("vec_id"),
      posexplode(expr(s"sign_bands(embedding, $numPlanes, $bandBits)"))
        .as(Seq("band_idx", "band_key")))
    val corpusBands = bands.where(col("vec_id") % EvalMod =!= 0)
    val evalProbes = bands.where(col("vec_id") % EvalMod === 0)
      .select(col("vec_id").as("eval_id"), col("band_idx"),
        explode(expr(probeKeysExpr(bandBits))).as("band_key"))
    val candidates = corpusBands
      .join(broadcast(evalProbes), Seq("band_idx", "band_key"))
      .select(col("vec_id"), col("eval_id"))
      .distinct()
    val hits = candidates
      .join(emb.select(col("vec_id"), col("embedding").as("emb_c")), Seq("vec_id"))
      .join(broadcast(emb.where(col("vec_id") % EvalMod === 0)
        .select(col("vec_id").as("eval_id"), col("embedding").as("emb_e"))),
        Seq("eval_id"))
      .select(col("vec_id"), expr("cosine_sim(emb_c, emb_e)").as("sim"))
      .where(col("sim") >= DupThreshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("sim")).as("max_sim"))
    emb.select(col("vec_id")).where(col("vec_id") % EvalMod =!= 0)
      .join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("max_sim"),
        (coalesce(col("n_hits"), lit(0L)) === 0).as("keep"))
  }

  /** Near-duplicate CLUSTERS over the embedding pair graph — the
    * "keep one per near-dup set" composition [[dedupEmbedding]]'s
    * Scaladoc promises: the same bounded min-label propagation as
    * [[graft.operators.TextOps.dedupClusters]] (and the same round
    * count, so the unrolled DuckDB oracle mirrors it exactly), run
    * over the thresholded cosine pair graph. The symmetrized edge set
    * is memoized through TextOps' registry — iteration-invariant
    * inputs of an iterative algorithm must be pinned, and the shared
    * lifecycle (release/sweep) applies unchanged.
    */
  def dedupEmbeddingClusters(spark: SparkSession, dir: String,
      numPlanes: Int = NumPlanes, bandBits: Int = BandBits): DataFrame = {
    val edges = TextOps.memoized(spark, dir, "emb_lsh_edges") {
      val pairs = dedupEmbedding(spark, dir, numPlanes, bandBits)
        .select(col("vec_a"), col("vec_b"))
      pairs.unionAll(
        pairs.select(col("vec_b").as("vec_a"), col("vec_a").as("vec_b")))
    }
    // the propagated labels are a shared artifact too (mirrors the
    // text family's cc_labels): memoizing caps the unrolled rounds'
    // lineage at one computation per session
    val labels = TextOps.memoized(spark, dir, "emb_cc_labels") {
      val nodes = edges.select(col("vec_a").as("node")).distinct()
      var l = nodes.withColumn("label", col("node"))
      for (_ <- 1 to TextOps.CcRounds) {
        val nbrMin = edges
          .join(l.select(col("node").as("vec_b"), col("label")), Seq("vec_b"))
          .groupBy(col("vec_a").as("node"))
          .agg(min(col("label")).as("nbr_label"))
        l = l.join(nbrMin, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      }
      l
    }
    labels.select(
      col("node").as("vec_id"),
      col("label").as("cluster_id"),
      count(lit(1)).over(Window.partitionBy(col("label"))).as("cluster_size"))
  }

  /** Recall@K of the IVF index against the exact baseline — the same
    * evaluation loop as [[lshRecall]] for the bucket-probe index:
    * per query, the fraction of true top-K neighbors recovered given
    * `nprobe` probed buckets out of `nlist`. `nprobe` is the recall
    * dial (see the measurement note on [[LloydRounds]]): the registry
    * gauges both the default ([[NProbe]], `emb_ivf_recall`) and the
    * widened probe set (nprobe=4, `emb_ivf_mp_recall`) — the same
    * default/multi-probe pairing the LSH and IVF-PQ families expose.
    */
  def ivfRecall(spark: SparkSession, dir: String, nlist: Int = NList,
      nprobe: Int = NProbe): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnIvf(spark, dir, nlist, nprobe)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  /** nprobe sweep for [[ivfRecallCurve]]. */
  val RecallCurveProbes: Seq[Int] = Seq(1, 2, 4, 8)

  /** The IVF OPERATING CURVE: per-query recall at every
    * [[RecallCurveProbes]] nprobe in one frame — the recall-vs-cost
    * artifact an index operator reads before picking the production
    * dial (each nprobe multiplies scanned cells, so this IS the cost
    * axis). Composes the memoized exact baseline and the memoized IVF
    * index; each sweep point is one [[ivfRecall]] run labeled with its
    * nprobe. Recall must be monotone non-decreasing in nprobe per
    * query (probing strictly more cells can only add hits) — the spec
    * pins that.
    */
  def ivfRecallCurve(spark: SparkSession, dir: String): DataFrame = {
    // Probe sets are NESTED in nprobe (topk_by_sim's deterministic
    // (sim DESC, label ASC) order makes the top-np cells a prefix of
    // the top-max(np) cells), so sweep point np's candidate set is
    // exactly `probe_rn <= np` of the widest point's. Score the widest
    // candidate set ONCE (with the probe rank attached) and let each
    // sweep point re-cut it, instead of re-running the probe + bucket
    // join + cosine pipeline per point — the old form scored
    // 1+2+4+8 = 15 cell-sets of candidates where the union needs 8
    // (guide §2.3: don't compute things you throw away). Materialized
    // because all four sweep branches read it. Rows per point are
    // bit-identical to ivfRecall(np): same candidates, same cosine
    // expression, same topK cut.
    val maxNp = RecallCurveProbes.max
    val assignments = ivfAssign(spark, dir, NList)
      .select(col("vec_id").as("neighbor_id"), col("assigned_label"))
    val probes = nearestCentroids(
      withNorm(spark, dir).where(col("vec_id") % QueryMod === 0),
      centroidVectors(spark, dir, NList), maxNp)
      .select(col("vec_id").as("query_id"),
        col("c_label").as("assigned_label"), col("rn").as("probe_rn"))
    val base = withNorm(spark, dir)
    val sims = probes.join(assignments, Seq("assigned_label"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("probe_rn"))
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(
        base.where(col("vec_id") % QueryMod === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qnrm"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("probe_rn"), cosine)
      .localCheckpoint()
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    RecallCurveProbes.map { np =>
      val approx = topK(sims.where(col("probe_rn") <= np)
        .select(col("query_id"), col("neighbor_id"), col("sim")))
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
          count(lit(1)).as("n_exact"))
        .select(lit(np.toLong).as("nprobe"), col("query_id"),
          col("recall_at_k"), col("n_exact"))
    }.reduce(_.unionAll(_))
  }

  /** Per-label centroids in long format (label, pos, centroid_sum, n,
    * mean). Element sums accumulate in DECIMAL so the result is
    * independent of partitioning/order — the same property the decimal
    * money sums rely on — and convert to double exactly once. The
    * explode shuffles (label, pos) pairs, i.e. rows × dim — at scale
    * this is the standard IVF training layout (partial aggregation
    * map-side keeps the shuffle at |labels|·dim per partition).
    *
    * The double→decimal cast is made EXACT by scaling each value by
    * 2^54 first (power-of-two scaling only shifts the exponent): a
    * float with |x| ≥ 2^-31 has ulp ≥ 2^-54, so x·2^54 is an integer
    * and no decimal rounding mode is ever exercised (Spark HALF_UP vs
    * DuckDB diverge on exact halves, which non-integers can hit).
    * Values under 2^-31 are flushed to zero on both sides.
    */
  val Scale: String = "18014398509481984.0"     // 2^54
  val Flush: String = "(1.0 / 2147483648.0)"    // 2^-31

  /** Number of coarse IVF buckets (the k-means `k` / `nlist`). The
    * fixture's 10 labels SEED the codebook (`label % nlist` is round
    * zero's partition, identical in Spark and DuckDB for the
    * non-negative labels); [[LloydRounds]] k-means rounds then train
    * the actual centroids. nlist is THE scale dial of IVF: each probe
    * scans ~N·nprobe/nlist candidates, so a real deployment sizes
    * nlist ≈ √N (10⁹ vectors → ~32k buckets → ~60k candidates per
    * probe) — it must grow with the corpus, which is why it is an
    * operator parameter and not a constant.
    */
  val NList = 10

  /** Lloyd (k-means) refinement rounds applied to the label-seeded
    * codebook — a small fixed constant because the DuckDB oracle unrolls
    * each round as CTEs (the pagerank device: deterministic iteration
    * counts are the price of a cross-engine differential check). Three
    * rounds, chosen by MEASUREMENT (r8): recall@10 at nprobe=2 moves
    * 0.48 → 0.54 (sf0.01) / 0.43 → 0.47 (sf0.1) going 2 → 3 rounds,
    * then plateaus — rounds 4–8, k-means++-style farthest-point
    * seeding, and spherical (normalized-mean) k-means all land within
    * ±0.01 of the 3-round codebook. The residual gap to the verdict's
    * 0.6 aspiration is STRUCTURAL, not a training deficit: ~90% of a
    * query's true top-10 live outside its own cell on this corpus, and
    * even the per-query OPTIMAL 2-cell probe set (an oracle no index
    * can beat at nprobe=2, measured by exhaustive cell-pair search)
    * caps at ≈0.60. The lever that actually buys recall is the probe
    * WIDTH: nprobe=4 reaches 0.74/0.665 ([[ivfRecall]]'s multi-probe
    * registry gauge `emb_ivf_mp_recall`) at 2× the candidate cost —
    * the standard IVF trade. A production job would iterate Lloyd to a
    * movement threshold with the identical per-round plan.
    */
  val LloydRounds = 3

  /** Decimal-exact per-(group, dimension) means over an arbitrary
    * grouping: input (grp, embedding), output the long-format codebook
    * (label, pos, centroid_sum, n, mean). One explode + one partial-
    * aggregated shuffle of (grp, pos) keys — rows × dim map-side,
    * |groups| × dim reduce-side. See the Scale/Flush note above
    * [[Scale]] for why the sums are exact integers in DECIMAL.
    */
  private def meansBy(grouped: DataFrame): DataFrame =
    grouped
      .select(col("grp").as("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(
        sum(expr(s"""CAST(CASE WHEN abs(CAST(val AS DOUBLE)) < $Flush THEN 0.0
                     ELSE CAST(val AS DOUBLE) END * $Scale AS DECIMAL(38,0))"""))
          .as("centroid_sum"),
        count(lit(1)).as("n"))
      .withColumn("mean",
        col("centroid_sum").cast("double") / expr(Scale) / col("n"))

  /** (c_label, centroid array, squared norm) from a long-format
    * codebook — the broadcastable form every assignment pass consumes.
    */
  private def vectorsFromMeans(means: DataFrame): DataFrame =
    means.groupBy(col("label").as("c_label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, mean))), t -> t.mean)")
        .as("centroid"))
      .select(col("c_label"), col("centroid"),
        expr(dot("centroid", "centroid")).as("cnrm"))

  /** Per-vector cosine against every centroid of `cvecs` — the scored
    * stream every assignment/probe cut runs over. Broadcast codebook:
    * the corpus never shuffles.
    */
  private def centroidScores(base: DataFrame, cvecs: DataFrame): DataFrame =
    base.crossJoin(broadcast(cvecs))
      .select(col("vec_id"), col("label"), col("c_label"),
        (expr(dot("embedding", "centroid")) / (sqrt(col("nrm")) * sqrt(col("cnrm"))))
          .as("sim"))

  /** The `nearest` best centroids per vector, best-first, via the
    * bounded-heap aggregate — identical rows to ranking the scores
    * with a `(sim DESC, c_label ASC)` window and keeping `rn ≤
    * nearest` (same strict total order), but the N·nlist scored rows
    * reduce map-side to one array per vector instead of all shuffling
    * into a window sort — the cut that matters when the ASSIGNMENT
    * (the corpus-wide IVF partitioner) is the operator.
    */
  private def nearestCentroids(base: DataFrame, cvecs: DataFrame,
      nearest: Int): DataFrame = {
    graft.plans.GraftExtensions.register(base.sparkSession)
    centroidScores(base, cvecs)
      .groupBy(col("vec_id"), col("label"))
      .agg(expr(s"topk_by_sim(CAST(c_label AS BIGINT), sim, $nearest)").as("tk"))
      .select(col("vec_id"), col("label"),
        posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col("vec_id"), col("label"),
        col("nb.neighbor_id").cast("int").as("c_label"),
        col("nb.sim").as("sim"),
        (col("pos") + 1).as("rn"))
  }


  /** The TRAINED IVF codebook in long format: `label % nlist` seeds the
    * initial partition (the fixture's labels are a structured seed —
    * k-means++ would be the from-nothing alternative), then
    * [[LloydRounds]] rounds of nearest-centroid assignment (cosine,
    * label-ascending tiebreak) + decimal-exact mean update. Every
    * arithmetic step is the cross-engine-deterministic kind (in-order
    * double folds, exact decimal group sums), so the whole training
    * loop is DuckDB-oracle-checkable with the rounds unrolled as CTEs
    * (OracleVectors.centroidsCte). A cluster that loses all members
    * simply drops out of the codebook — both engines agree. Memoized:
    * training scans the corpus 2·rounds+1 times; every IVF-family query
    * shares the one artifact (at scale the codebook is written out
    * once by an offline training job).
    */
  def centroidsRaw(spark: SparkSession, dir: String, nlist: Int = NList): DataFrame =
    TextOps.memoized(spark, dir, s"ivf_means_$nlist") {
      trainMeans(Tables.embeddings(spark, dir), nlist)
    }

  /** The Lloyd training loop of [[centroidsRaw]] over an ARBITRARY
    * (vec_id, label, embedding) relation — the seam the streaming
    * index's codebook REFRESH retrains through
    * ([[graft.streaming.StreamingVectors.refreshCodebook]]): identical
    * seeding, rounds, and decimal-exact means, so a refresh over the
    * ingested union equals the batch-trained codebook row for row.
    */
  private[graft] def trainMeans(vecs: DataFrame, nlist: Int): DataFrame =
    trainMeansSeeded(vecs, pmod(col("label"), lit(nlist)))

  /** [[trainMeans]] with an ARBITRARY seed-group column — the
    * auto-sized index needs id-derived seeding because `label % nlist`
    * degenerates when nlist exceeds the label cardinality (only
    * |labels| cells would ever form).
    */
  private[graft] def trainMeansSeeded(vecs: DataFrame, seedGrp: Column): DataFrame = {
    val base = vecs.select(col("vec_id"), col("label"), col("embedding"),
      expr(dot("embedding", "embedding")).as("nrm"))
    val seed = vecs.select(seedGrp.as("grp"), col("embedding"))
    var means = meansBy(seed)
    for (_ <- 1 to LloydRounds) {
      val assigned = nearestCentroids(base, vectorsFromMeans(means), nearest = 1)
        .select(col("vec_id"), col("c_label").as("grp"))
      means = meansBy(assigned
        .join(vecs.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(col("grp"), col("embedding")))
    }
    // lineage cut: the training chain (2 rounds of windows over
    // crossJoins) otherwise re-enters Catalyst in EVERY consumer's
    // logical plan — measured seconds of pure planning per IVF query
    means.localCheckpoint()
  }

  /** Broadcastable (c_label, centroid, cnrm) codebook from a
    * long-format means table — [[vectorsFromMeans]] exposed for the
    * streaming refresh path.
    */
  private[graft] def codebookFromMeans(means: DataFrame): DataFrame =
    vectorsFromMeans(means)

  /** [[centroidsRaw]] with the decimal sum serialized to its exact
    * integer-digit string: DECIMAL is the one output type whose
    * engine-side rendering diverges in the driver's compare (Spark
    * parquet decimal128 vs DuckDB HUGEINT-backed decimal — round-2's
    * only vector hash miss), while the digit string is identical by
    * construction. The double `mean` is emitted as-is: it is
    * bit-equal across engines (proven transitively by the ivf queries'
    * hash-green sims, which are derived from every mean).
    */
  def centroids(spark: SparkSession, dir: String, nlist: Int = NList): DataFrame =
    centroidsRaw(spark, dir, nlist)
      .select(col("label"), col("pos"),
        col("centroid_sum").cast("string").as("centroid_sum"),
        col("n"), col("mean"))

  /** Centroid vectors (label, centroid array, squared norm) rebuilt
    * from the long-format [[centroids]] output.
    */
  private[graft] def centroidVectors(spark: SparkSession, dir: String, nlist: Int): DataFrame =
    // memoized: the trained codebook is the IVF family's shared
    // artifact (assign, search, recall all broadcast it) — ≤nlist rows,
    // the in-session analog of writing the codebook out once at scale
    TextOps.memoized(spark, dir, s"ivf_centroids_$nlist") {
      vectorsFromMeans(centroidsRaw(spark, dir, nlist))
    }

  /** Per-cell training budget for the AUTO-SIZED index: the Lloyd
    * rounds train on a deterministic id-stride sample of
    * ≈[[TrainPerCell]]·nlist vectors (the max_points_per_centroid
    * convention every production IVF build uses — full-corpus k-means
    * at nlist=√N would be N^1.5 training work, worse than the search
    * it optimizes). The FULL corpus is still assigned once to the
    * trained codebook (the one-time N·nlist index build, memoized).
    */
  val TrainPerCell = 64

  /** The scale rule [[centroidsRaw]]'s Scaladoc names, IMPLEMENTED:
    * nlist = max(√N, [[NList]]) so each probe scans ~√N candidates,
    * nprobe = max(√nlist, [[NProbe]]) so probe width grows with cell
    * granularity (recall held as cells get finer), and the training
    * sample stride from [[TrainPerCell]]. All integer/IEEE-sqrt
    * arithmetic, so the DuckDB oracle derives the identical dials
    * from count(*).
    */
  private[graft] def autoDials(n: Long): (Int, Long, Int) = {
    val nlist = math.max(NList, math.round(math.sqrt(n.toDouble)).toInt)
    val sampleMod = math.max(1L, n / (TrainPerCell.toLong * nlist))
    val nprobe = math.max(NProbe, math.round(math.sqrt(nlist.toDouble)).toInt)
    (nlist, sampleMod, nprobe)
  }

  /** The corpus count behind the dials — one planning-scale action
    * (parquet footer row counts), memoized per session like the
    * Layout file index.
    */
  private val dialCache = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private def corpusCount(spark: SparkSession, dir: String): Long =
    dialCache.computeIfAbsent(dir, _ => Tables.embeddings(spark, dir).count())

  /** The chosen dials as a 1-row gauge (n_vectors, nlist, sample_mod,
    * nprobe) — the observable contract of the auto-sizing rule, so a
    * dial drift across SFs or engines is a hash miss, not a silent
    * recall change.
    */
  def ivfAutoDial(spark: SparkSession, dir: String): DataFrame = {
    val n = corpusCount(spark, dir)
    val (nlist, m, nprobe) = autoDials(n)
    import spark.implicits._
    Seq((n, nlist.toLong, m, nprobe.toLong))
      .toDF("n_vectors", "nlist", "sample_mod", "nprobe")
  }

  /** The auto nlist for `dir`'s corpus — the dial every SERVING
    * composition (hybrid operator, DSL `Env.ann`, streaming store)
    * sizes its index with, so "production" requests ride the same
    * √N rule the standalone [[knnIvfAuto]] proved out.
    */
  private[graft] def autoNList(spark: SparkSession, dir: String): Int =
    autoDials(corpusCount(spark, dir))._1

  /** The auto-sizing training recipe over an ARBITRARY
    * (vec_id, label, embedding) relation — the seam the streaming
    * DSL store's served index trains through, so a drained store
    * produces the batch-identical codebook: id-stride sample from the
    * [[TrainPerCell]] budget, round-robin id-group seeding, Lloyd
    * rounds with decimal-exact means. `n` is the relation's row count
    * (passed in: the caller owns the count action / its memoization).
    */
  private[graft] def centroidVectorsAutoFrom(vecs: DataFrame, n: Long): DataFrame = {
    val (nlist, m, _) = autoDials(n)
    val sample = vecs.where(pmod(col("vec_id"), lit(m)) === 0)
    vectorsFromMeans(trainMeansSeeded(sample,
      pmod(expr(s"vec_id div CAST($m AS BIGINT)"), lit(nlist.toLong))))
  }

  /** The auto-sized trained codebook: Lloyd rounds over the id-stride
    * sample, seeded by the round-robin id group (labels cannot seed
    * more cells than the label cardinality). Memoized like
    * [[centroidVectors]].
    */
  private[graft] def centroidVectorsAuto(spark: SparkSession, dir: String): DataFrame = {
    val n = corpusCount(spark, dir)
    TextOps.memoized(spark, dir, "ivf_auto_centroids") {
      centroidVectorsAutoFrom(Tables.embeddings(spark, dir), n)
    }
  }

  /** Full-corpus assignment to the auto-sized codebook — the one-time
    * N·nlist index build (memoized; at deploy scale this is the
    * offline indexing job every ANN store runs).
    */
  def ivfAssignAuto(spark: SparkSession, dir: String): DataFrame =
    TextOps.memoized(spark, dir, "ivf_auto_assign") {
      nearestCentroids(withNorm(spark, dir),
        centroidVectorsAuto(spark, dir), nearest = 1)
        .select(col("vec_id"), col("label"),
          col("c_label").as("assigned_label"), col("sim"))
        .localCheckpoint() // plan-size cut, same device as ivfAssign
    }

  /** [[knnIvf]] on the AUTO-SIZED index: each probe scans ~√N
    * candidates instead of N/[[NList]], so the per-query search cost
    * stops growing linearly with the corpus — the measured sf1 cost
    * of the pinned dial (emb_knn_ivf 16× for 10× data) is what this
    * variant removes. [[ivfAutoRecall]] proves the recall holds.
    */
  def knnIvfAuto(spark: SparkSession, dir: String): DataFrame =
    knnIvfAutoQueries(spark, dir, col("vec_id") % QueryMod === 0)

  /** [[knnIvfAuto]] over an ARBITRARY query-id predicate — the seam
    * the fixed-|Q| serving fixture ([[Retrieval.hybridRrfServing]])
    * selects its bounded query page through; the house stride is just
    * the default predicate.
    */
  private[graft] def knnIvfAutoQueries(spark: SparkSession, dir: String,
      qpred: Column): DataFrame = {
    val (_, _, nprobe) = autoDials(corpusCount(spark, dir))
    val assignments = ivfAssignAuto(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("assigned_label"))
    val probes = nearestCentroids(
      withNorm(spark, dir).where(qpred),
      centroidVectorsAuto(spark, dir), nprobe)
      .select(col("vec_id").as("query_id"), col("c_label").as("assigned_label"))
    val candidates = probes.join(assignments, Seq("assigned_label"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
    val base = withNorm(spark, dir)
    val sims = candidates
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"), col("nrm")),
        Seq("neighbor_id"))
      .join(broadcast(
        base.where(qpred)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qnrm"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine)
    topK(sims)
  }

  /** Recall@K of the auto-sized index against the exact baseline —
    * the evidence the √N rule holds recall while cutting candidates
    * (nlist alone would starve a fixed probe count; the √nlist probe
    * growth is the compensation).
    */
  def ivfAutoRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnIvfAuto(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  /** Per-vector candidate budget `c` in the banding rule the
    * [[NumPlanes]] Scaladoc names (`bandBits ≈ log2(N·nBands/c)`) —
    * at a fixed budget, band entropy must grow with the corpus or
    * collisions (and the exact-cosine verify behind them) grow
    * linearly.
    */
  val LshCandPerVec = 16

  /** bandBits cap for the auto-sized LSH (8 bands × 24 bits = 192
    * planes — the "real deployments run bandBits 16–24" ceiling the
    * banding note documents).
    */
  val MaxAutoBandBits = 24

  /** The banding rule IMPLEMENTED: `bandBits = clamp(⌈log2(N·nBands/
    * c)⌉, [[BandBits]], [[MaxAutoBandBits]])` — computed as integer
    * BIT-LENGTH (no libm log ever enters a plan; DuckDB mirrors with
    * `length(bin(x-1))`), so both engines derive the identical dial.
    */
  private[graft] def autoBandBits(n: Long): Int = {
    val x = math.max(1L, n * NumBands / LshCandPerVec)
    val ceilLog2 =
      if (x <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1)
    math.min(MaxAutoBandBits, math.max(BandBits, ceilLog2))
  }

  /** The chosen LSH dial as a 1-row gauge — the [[ivfAutoDial]]
    * convention for the banding family.
    */
  def lshAutoDial(spark: SparkSession, dir: String): DataFrame = {
    val n = corpusCount(spark, dir)
    val bb = autoBandBits(n)
    import spark.implicits._
    Seq((n, bb.toLong, (NumBands * bb).toLong))
      .toDF("n_vectors", "band_bits", "num_planes")
  }

  /** [[knnLsh]] at the AUTO-SIZED band entropy: same [[NumBands]]
    * bands (the recall lever), each `autoBandBits` wide, so per-band
    * bucket population stays ~[[LshCandPerVec]] as N grows instead of
    * the pinned dial's N/2^8 — WITH Hamming-1 multi-probe on (the
    * compensation lever wide bands need: bb+1 probed keys per band,
    * still bucket-bounded). [[lshAutoRecall]] prices the trade.
    */
  def knnLshAuto(spark: SparkSession, dir: String): DataFrame = {
    val bb = autoBandBits(corpusCount(spark, dir))
    knnLsh(spark, dir, numPlanes = NumBands * bb, bandBits = bb, probeBits = 1)
  }

  /** Recall@K of the auto-banded LSH against the exact baseline. */
  def lshAutoRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnLshAuto(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  /** The `nprobe` nearest trained centroids for each QUERY vector
    * only — the probe set of the IVF searches, computed on the query
    * subset (filtering before scoring: the old form scored the whole
    * corpus and then threw away 99% of the rows). `nprobe` is the
    * recall-at-fixed-cost lever of the whole IVF family (candidate
    * count scales as N·nprobe/nlist) — the mirror of the LSH side's
    * `probeBits` multi-probe dial.
    */
  private def queryProbes(spark: SparkSession, dir: String, nlist: Int,
      nprobe: Int = NProbe): DataFrame =
    nearestCentroids(
      withNorm(spark, dir).where(col("vec_id") % QueryMod === 0),
      centroidVectors(spark, dir, nlist), nprobe)
      .select(col("vec_id").as("query_id"), col("c_label").as("assigned_label"))

  /** Nearest-centroid assignment (the IVF partitioner): `nlist`
    * centroids broadcast against the corpus; cosine against each;
    * argmax via the bounded-heap aggregate (the corpus-wide assignment
    * is exactly the cut [[nearestCentroids]] exists for). Output keeps
    * the true label for a train-style purity readout. Memoized: the
    * assignment IS the inverted lists — the index artifact a
    * deployment stores next to the codebook — and four queries
    * (knnIvf, ivfRecall, knnIvfPq's candidates, the residual encoder)
    * would otherwise each re-run the corpus-wide argmax.
    */
  def ivfAssign(spark: SparkSession, dir: String, nlist: Int = NList): DataFrame =
    TextOps.memoized(spark, dir, s"ivf_assign_$nlist") {
      nearestCentroids(withNorm(spark, dir), centroidVectors(spark, dir, nlist),
        nearest = 1)
        .select(col("vec_id"), col("label"),
          col("c_label").as("assigned_label"), col("sim"))
        .localCheckpoint() // plan-size cut, same device as centroidsRaw
    }

  /** Recall@K of the sign-LSH ANN against the exact baseline — the
    * evaluation loop any ANN deployment needs: per query, the fraction
    * of true top-K neighbors the approximate index recovered.
    */
  def lshRecall(spark: SparkSession, dir: String, probeBits: Int = 0): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnLsh(spark, dir, probeBits = probeBits)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  /** How many centroid buckets each query probes. */
  val NProbe = 2

  /** Full IVF search: queries probe their [[NProbe]] nearest centroid
    * buckets, candidates are the corpus vectors ASSIGNED to those
    * buckets, and exact cosine re-ranks only the candidates — the
    * standard inverted-file ANN. At scale the assignment is the
    * partitioning key (bucket-pruned scan); here it is an equi-join on
    * the bucket label. Approximate by construction: a true neighbor
    * assigned to an unprobed bucket is missed — [[knnExact]] is the
    * recall baseline.
    */
  /** Exact-re-rank shortlist size (× K) for [[knnSq8]]. */
  val Sq8ReRank = 4

  /** Per-dimension scalar-quantization stats (min, max) as one
    * broadcastable row of two dim-length arrays. Memoized: the stats
    * row is the SQ codebook — train once per session, the analog of
    * persisting it next to the index at scale.
    */
  private def sq8Stats(spark: SparkSession, dir: String): DataFrame =
    TextOps.memoized(spark, dir, "sq8_stats") {
      Tables.embeddings(spark, dir)
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("pos"))
        .agg(min(col("v").cast("double")).as("dmin"),
          max(col("v").cast("double")).as("dmax"))
        .groupBy()
        .agg(
          expr("transform(array_sort(collect_list(struct(pos, dmin))), t -> t.dmin)")
            .as("mins"),
          expr("transform(array_sort(collect_list(struct(pos, dmax))), t -> t.dmax)")
            .as("maxs"))
    }

  /** int8 codes: `floor((x - min_d) / (max_d - min_d) · 256)` clamped
    * to 255 (monotone per dimension, all-double IEEE ops — bit-equal
    * across engines; a constant dimension codes to 0).
    */
  private def sq8CodeExpr(src: String): String =
    s"""transform($src, (x, i) ->
       |  CASE WHEN element_at(maxs, i + 1) > element_at(mins, i + 1)
       |    THEN least(floor(((CAST(x AS DOUBLE) - element_at(mins, i + 1))
       |      / (element_at(maxs, i + 1) - element_at(mins, i + 1))) * 256.0), 255L)
       |    ELSE 0L END)""".stripMargin

  /** Midpoint dequantization of a code cell: `min_d + (c + 0.5) ·
    * (max_d - min_d) / 256`. The expression SHAPE (parenthesization)
    * is shared verbatim with the oracle — every op is one IEEE double
    * op, so the decode is bit-equal across engines.
    */
  private def sq8DeqExpr: String =
    s"""transform(code, (c, i) ->
       |  element_at(mins, i + 1) + ((CAST(c AS DOUBLE) + 0.5)
       |    * (element_at(maxs, i + 1) - element_at(mins, i + 1))) / 256.0)""".stripMargin

  /** Corpus with SQ8 codes, dequantized vectors and their norms
    * attached (memoized — the compressed index). At scale only `code`
    * is STORED (64 bytes/vector, ¼ of the floats); `deq`/`dnrm` are
    * register-resident decode work inside the scan, carried as columns
    * here because the in-session memo stands in for that scan.
    */
  private def sq8Codes(spark: SparkSession, dir: String): DataFrame =
    TextOps.memoized(spark, dir, "sq8_codes") {
      withNorm(spark, dir)
        .crossJoin(broadcast(sq8Stats(spark, dir)))
        .withColumn("code", expr(sq8CodeExpr("embedding")))
        .withColumn("deq", expr(sq8DeqExpr))
        .withColumn("dnrm", expr(dot("deq", "deq")))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("code"), col("deq"), col("dnrm"))
    }

  /** ANN via int8 scalar quantization — the memory-compression scale
    * path: vectors are stored as 64 one-byte codes (¼ the bytes of the
    * float vectors; at scale the brute-force scan is memory-bandwidth-
    * bound, so compression IS the speedup). The approximate pass scores
    * the FLOAT query against each dequantized corpus vector (FAISS-
    * style asymmetric distance — the query loses no precision), keeps
    * the top [[Sq8ReRank]]·K per query, and re-ranks only that
    * shortlist with exact cosine. Same broadcast-queries /
    * corpus-never-shuffles shape as [[knnExact]]; approximate by
    * construction ([[sq8Recall]] is the evaluation loop).
    */
  def knnSq8(spark: SparkSession, dir: String): DataFrame = {
    val coded = sq8Codes(spark, dir)
    val q = coded.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), col("nrm").as("qnrm"))
    // the approximate stream carries only (query, neighbor, score):
    // float payloads rejoin after the shortlist cut (see shortlistIds)
    val approx = coded
      .select(col("vec_id"), col("deq"), col("dnrm"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr(dot("deq", "qv")) / (sqrt(col("dnrm")) * sqrt(col("qnrm"))))
          .as("asim"))
    val shortlist = shortlistIds(approx, Sq8ReRank * K)
      .join(coded.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
    topK(shortlist.select(col("query_id"), col("neighbor_id"), cosine))
  }

  /** Recall@K of the SQ8 index against the exact baseline. */
  def sq8Recall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnSq8(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  // --- Binary quantization (1-bit codes, Hamming shortlist) -------------

  /** Exact-re-rank shortlist size (× K) for [[knnBq]] — wider than
    * SQ8's because 64-level Hamming similarity is coarse (many ties;
    * the deterministic id tiebreak picks among them, the re-rank
    * recovers the order).
    */
  val BqReRank = 8

  /** Per-vector 64-bit sign code as two 32-bit words (BIGINT-safe
    * halves of the [[graft.functions.SignBandKeys]] bit string). The
    * SAME projection the LSH index bands (NumPlanes = Dim = 64 planes
    * of the planeWeight stream): binary quantization and sign-LSH
    * store ONE code; they differ only in search strategy — bucket
    * collision ([[knnLsh]]) vs full Hamming scan (here). Memoized: at
    * scale the 8-byte code is written next to the vector at ingest.
    */
  private def bqCodes(spark: SparkSession, dir: String): DataFrame =
    TextOps.memoized(spark, dir, "bq_codes") {
      graft.plans.GraftExtensions.register(spark)
      withNorm(spark, dir)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          expr(s"CAST(conv(element_at(sign_bands(embedding, $Dim, 32), 1), 2, 10) AS BIGINT)")
            .as("c0"),
          expr(s"CAST(conv(element_at(sign_bands(embedding, $Dim, 32), 2), 2, 10) AS BIGINT)")
            .as("c1"))
    }

  /** ANN via binary quantization — the memory-compression END of the
    * quantized-index family (SQ8 ¼, PQ 1/43, this 1/256: one BIT per
    * dimension, 8 bytes per vector): the approximate pass ranks by
    * Hamming similarity `64 − popcount(c ⊕ qc)` — two XORs + two
    * POPCNTs per candidate, the cheapest possible scan, which is why
    * every vector store ships exactly this as its pre-filter tier —
    * then exact cosine re-ranks the `reRank`·K shortlist. Sign codes
    * approximate ANGLE (P[bit agrees] = 1 − θ/π, the
    * Goemans-Williamson bound LSH is built on), so Hamming order
    * tracks cosine order in expectation — BETWEEN clusters. WITHIN a
    * tight cluster the codes tie (members differ by sub-threshold
    * noise that flips no sign), the id tiebreak picks arbitrarily
    * among the tied candidates, and recall@k degrades toward
    * reRank·k / |cluster| — measured directly in the scale probe.
    * `reRank` is therefore the dial: production binary-quantization
    * tiers (e.g. ES/Lucene BBQ, Qdrant BQ) ship exactly this
    * oversample-then-rescore loop, with oversampling sized to the
    * expected tie-set. Same broadcast-queries / corpus-never-shuffles
    * shape as [[knnExact]]; [[bqRecall]] is the evaluation loop.
    */
  def knnBq(spark: SparkSession, dir: String,
      reRank: Int = BqReRank): DataFrame = {
    val coded = bqCodes(spark, dir)
    val q = coded.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("c0").as("qc0"), col("c1").as("qc1"))
    val approx = coded.select(col("vec_id"), col("c0"), col("c1"))
      .crossJoin(broadcast(q.select(col("query_id"), col("qc0"), col("qc1"))))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(s"CAST($Dim - bit_count(c0 ^ qc0) - bit_count(c1 ^ qc1) AS DOUBLE)")
          .as("asim"))
    val shortlist = shortlistIds(approx, reRank * K)
      .join(coded.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qnrm"))),
        Seq("query_id"))
    topK(shortlist.select(col("query_id"), col("neighbor_id"), cosine))
  }

  /** Recall@K of the binary-quantized index against the exact baseline. */
  def bqRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnBq(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  def knnIvf(spark: SparkSession, dir: String, nlist: Int = NList,
      nprobe: Int = NProbe): DataFrame = {
    val assignments = ivfAssign(spark, dir, nlist)
      .select(col("vec_id").as("neighbor_id"), col("assigned_label"))
    val probes = queryProbes(spark, dir, nlist, nprobe)
    val candidates = probes.join(assignments, Seq("assigned_label"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
    val base = withNorm(spark, dir)
    val sims = candidates
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"), col("nrm")),
        Seq("neighbor_id"))
      .join(broadcast(
        base.where(col("vec_id") % QueryMod === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qnrm"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine)
    topK(sims)
  }

  /** [[knnIvf]] with the filtered-kNN predicate composed into the
    * CANDIDATE stream — the scale path of [[knnFiltered]]: the
    * brute-force form evaluates the predicate on N·|Q| pairs, this
    * one filters the ~N·nprobe/nlist bucket candidates BEFORE any
    * dot product, so the filter makes the approximate search
    * CHEAPER, not just the result smaller (the composition ES's
    * filtered ANN and every vector store's metadata-filtered HNSW
    * perform). The recall caveat is the standard one and is left
    * visible rather than absorbed: probing stays label-blind
    * (nprobe buckets of the unfiltered index), so a highly selective
    * filter starves candidates and the production fix is a
    * label-partitioned index (one IVF per tenant/label — the
    * [[graft.sources.Layout]] move applied to index layout).
    */
  def knnIvfFiltered(spark: SparkSession, dir: String, nlist: Int = NList,
      nprobe: Int = NProbe): DataFrame = {
    val labels = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val assignments = ivfAssign(spark, dir, nlist)
      .select(col("vec_id").as("neighbor_id"), col("assigned_label"))
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("nlabel")), Seq("neighbor_id"))
    // only QUERY labels ship — broadcasting the unfiltered labels
    // table would be an N-sized broadcast at the scale this operator
    // targets (the knnFiltered pattern: ~N/QueryMod rows survive)
    val probes = queryProbes(spark, dir, nlist, nprobe)
      .join(broadcast(labels.where(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("query_id"),
          col("label").as("qlabel"))), Seq("query_id"))
    val candidates = probes.join(assignments, Seq("assigned_label"))
      .where(col("neighbor_id") =!= col("query_id") &&
        col("nlabel") === col("qlabel"))
      .select(col("query_id"), col("neighbor_id"))
    val base = withNorm(spark, dir)
    val sims = candidates
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"), col("nrm")),
        Seq("neighbor_id"))
      .join(broadcast(
        base.where(col("vec_id") % QueryMod === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qnrm"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine)
    topK(sims)
  }

  /** Candidate floor for [[knnLabelPartitioned]]'s per-query dynamic
    * probing: cells accumulate until at least this many same-label
    * candidates are in hand (4·[[K]] + the query itself). The recall/
    * cost dial of the label-partitioned index — raising it approaches
    * exact-within-partition.
    */
  val LabelPartMinCands: Int = 4 * K + 1

  /** Label-PARTITIONED filtered ANN — the production fix
    * [[knnIvfFiltered]]'s Scaladoc names: the index stores inverted
    * lists under COMPOSITE (label, cell) keys (per-tenant IVF — the
    * [[graft.sources.Layout]] partition-pruning move applied to index
    * layout), so the filter prunes the index instead of starving the
    * candidate stream. Where the stream-filter variant probes nprobe
    * label-BLIND buckets and visibly returns < k under a selective
    * filter, here each query walks ITS OWN PARTITION's cells in
    * centroid-similarity order and stops once [[LabelPartMinCands]]
    * candidates accumulate (a per-query dynamic nprobe, decided from
    * the |labels|·nlist-row list-size metadata — planning-scale data,
    * like bloom file skipping): ≥ min(4k, |partition|−1) true
    * same-label candidates, so k results are guaranteed whenever the
    * partition holds k+1 vectors, degrading to exact-within-partition
    * on small partitions. Exact cosine scores the candidates (same
    * oracle-checkable arithmetic as [[knnIvf]]). Scale shape: the
    * corpus-side join is a broadcast equi-join on the composite key
    * (probes are ≤ |Q|·nlist rows), the corpus never shuffles, and
    * candidates stay ~|Q|·max(T, bucket) — never all-pairs, never
    * label-blind.
    */
  def knnLabelPartitioned(spark: SparkSession, dir: String,
      nlist: Int = NList): DataFrame = {
    val labels = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    // the composite-key inverted lists: (partition label, cell) → members
    val lists = ivfAssign(spark, dir, nlist)
      .select(col("vec_id").as("neighbor_id"), col("assigned_label"))
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("plabel")), Seq("neighbor_id"))
    val listSizes = lists.groupBy(col("plabel"), col("assigned_label"))
      .agg(count(lit(1)).as("cnt"))
    // every cell of the query's own partition, walked in similarity
    // order (nearestCentroids' rn), with a running candidate total
    val qlab = labels.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("label").as("plabel"))
    val qcells = nearestCentroids(
      withNorm(spark, dir).where(col("vec_id") % QueryMod === 0),
      centroidVectors(spark, dir, nlist), nearest = nlist)
      .select(col("vec_id").as("query_id"),
        col("c_label").cast("int").as("assigned_label"), col("rn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val probes = qcells
      .join(broadcast(qlab), Seq("query_id"))
      .join(broadcast(listSizes), Seq("plabel", "assigned_label"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .where(col("cum") - col("cnt") < LabelPartMinCands)
      .select(col("query_id"), col("plabel"), col("assigned_label"))
    val candidates = broadcast(probes).join(lists, Seq("plabel", "assigned_label"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
    val base = withNorm(spark, dir)
    val sims = candidates
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(
        base.where(col("vec_id") % QueryMod === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qnrm"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine)
    topK(sims)
  }

  // --- Product quantization (PQ) ---------------------------------------

  /** PQ subspace count: the vector splits into [[PqM]] contiguous
    * [[PqSubDim]]-dim subvectors, each coded independently. With
    * [[PqBits]]-bit cells a vector compresses to PqM·PqBits bits
    * (here [[PqM]]=8 codes of [[PqBits]]=6 bits = 6 bytes — ~1/43 of
    * the float vector, vs SQ8's 1/4): PQ is the memory-compression
    * end-game of the ANN
    * family, and at scale the approximate scan is pure LUT lookups —
    * no float math per candidate at all.
    */
  val PqM = 8
  val PqSubDim: Int = Dim / PqM
  /** Bits per PQ code → up to 2^PqBits codebook cells per subspace. */
  val PqBits = 6
  val PqCells: Int = 1 << PqBits
  /** Exact-re-rank shortlist size (× K) for [[knnPq]]. */
  val PqReRank = 8
  /** Plane-index offset decorrelating PQ training planes from the
    * sign-LSH planes (both derive from [[planeWeight]]'s LCG stream).
    */
  private val PqPlaneBase = 128

  /** Training hyperplane weight j of subspace m, local dim d. */
  def pqPlaneWeight(m: Int, j: Int, d: Int): Int =
    planeWeight(PqPlaneBase + m * PqBits + j, d)

  private def pqSubExpr(m: Int, src: String = "embedding"): String =
    s"slice($src, ${m * PqSubDim + 1}, $PqSubDim)"

  /** Training cell of subspace m: the [[PqBits]]-bit sign code of the
    * subvector against this subspace's hyperplanes. K-means would need
    * an iterative, order-sensitive refinement; a fixed random-hyperplane
    * partition is the deterministic one-pass stand-in — cells still
    * carve the subspace into locality buckets, which is all the codebook
    * needs (cell means are trained from the data either way).
    */
  private def pqTrainCellExpr(m: Int, sub: String): String =
    (0 until PqBits).map { j =>
      val w = (0 until PqSubDim).map(pqPlaneWeight(m, j, _))
        .mkString("array(", ",", ")")
      s"""(CASE WHEN aggregate(zip_with($w, $sub, (w, x) -> w * CAST(x AS DOUBLE)),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN ${1 << j} ELSE 0 END)"""
        .stripMargin
    }.mkString(" + ")

  /** One row per (vector, subspace): the subvector and its training
    * cell. The per-m expressions carry their plane literals, so the
    * whole explode is generated codegen'd projection — no UDF.
    */
  private def pqSubs(spark: SparkSession, dir: String): DataFrame = {
    val arms = (0 until PqM).map { m =>
      s"""struct(CAST($m AS BIGINT) AS m,
         |  CAST(${pqTrainCellExpr(m, pqSubExpr(m))} AS BIGINT) AS cell,
         |  ${pqSubExpr(m)} AS sub)""".stripMargin
    }.mkString("array(", ",\n", ")")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), explode(expr(arms)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.cell").as("cell"),
        col("s.sub").as("sub"))
  }

  /** The trained PQ codebook: per (subspace, cell) the decimal-exact
    * mean subvector (same Scale/Flush discipline as [[centroidsRaw]]),
    * its squared norm, and a dense `slot` id (row_number over (m, cell)
    * — cells with no training member simply don't exist, and the dense
    * slots keep the query-side LUT indexable). ≤ PqM·PqCells rows, so
    * the unpartitioned slot window is a non-issue; memoized and
    * broadcast everywhere it's used — the in-session analog of writing
    * the codebook artifact once.
    */
  private[graft] def pqCodebook(spark: SparkSession, dir: String): DataFrame =
    TextOps.memoized(spark, dir, "pq_codebook") {
      val sums = pqSubs(spark, dir)
        .select(col("m"), col("cell"), posexplode(col("sub")).as(Seq("pos", "val")))
        .groupBy(col("m"), col("cell"), col("pos"))
        .agg(
          sum(expr(s"""CAST(CASE WHEN abs(CAST(val AS DOUBLE)) < $Flush THEN 0.0
                       ELSE CAST(val AS DOUBLE) END * $Scale AS DECIMAL(38,0))"""))
            .as("csum"),
          count(lit(1)).as("n"))
        .withColumn("mean", col("csum").cast("double") / expr(Scale) / col("n"))
      val w = Window.orderBy(col("m"), col("cell"))
      sums.groupBy(col("m"), col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, mean))), t -> t.mean)")
          .as("centroid"))
        .select(col("m"), col("cell"), col("centroid"),
          expr(dot("centroid", "centroid")).as("cnrm"))
        .withColumn("slot", (row_number().over(w) - 1).cast("long"))
        .localCheckpoint() // plan-size cut, same device as centroidsRaw
    }

  /** PQ-coded corpus: per vector the 8 slot codes (in subspace order),
    * the reconstruction's squared norm (in-order fold over m — the
    * cross-engine-deterministic sum), and the reconstruction `vhat`
    * itself. Encoding is true argmin-L2 against the codebook
    * (broadcast join + min-of-struct partial aggregation — one shuffle
    * of (vec_id, m) rows, never a window). At scale `codes` and `rnrm`
    * are STORED next to the vector (written once at ingest, ~6 bytes/
    * vector), so [[knnPq]]'s approximate pass is a single code-column
    * scan; `vhat` is encode-time scratch persisted for the [[pqMse]]
    * gauge (a diagnostic a deployment would reconstruct from codes ×
    * codebook — a slot join, never a re-run of the argmin); the
    * memoized frame and the vec_id join back to the float vectors
    * stand in for that storage layout in-session.
    */
  private[graft] def pqCodes(spark: SparkSession, dir: String): DataFrame =
    TextOps.memoized(spark, dir, "pq_codes") {
      val l2 =
        """aggregate(zip_with(sub, centroid, (x, y) ->
          |  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin
      pqSubs(spark, dir)
        .drop("cell") // the training cell is irrelevant at encode time
        .join(broadcast(pqCodebook(spark, dir)), Seq("m"))
        .select(col("vec_id"), col("m"),
          struct(expr(l2).as("d2"), col("cell"), col("slot"), col("cnrm"),
            col("centroid")).as("cand"))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(col("cand")).as("best"))
        .groupBy(col("vec_id"))
        .agg(
          expr("transform(array_sort(collect_list(struct(m, best.slot))), t -> t.slot)")
            .as("codes"),
          expr("""aggregate(transform(array_sort(collect_list(struct(m, best.cnrm))),
            t -> t.cnrm), CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("rnrm"),
          expr("""flatten(transform(array_sort(collect_list(struct(m, best.centroid))),
            t -> t.centroid))""").as("vhat"))
        .localCheckpoint() // plan-size cut, same device as centroidsRaw
    }

  /** ANN via product quantization: the approximate pass scores each
    * corpus vector with PqM LUT lookups — `adc = Σ_m lut[codes[m]]`
    * where `lut[slot] = <q_m, centroid_slot>` is computed ONCE per
    * query against the ≤ PqM·PqCells = 512-row codebook (FAISS's
    * asymmetric distance
    * computation). Candidates never touch float vectors until the exact
    * re-rank of the [[PqReRank]]·K shortlist. Same broadcast-queries /
    * corpus-never-shuffles shape as [[knnExact]]; [[pqRecall]] is the
    * evaluation loop.
    */
  /** Per-query slot-indexed LUT of subvector·centroid dots — the ADC
    * precomputation both PQ searches share. Carries qv/qnrm for the
    * exact re-rank.
    */
  private def pqQueryLut(spark: SparkSession, dir: String): DataFrame = {
    val q = withNorm(spark, dir).where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    q.crossJoin(broadcast(pqCodebook(spark, dir)))
      .select(col("query_id"),
        col("slot"),
        expr(s"""aggregate(zip_with(
            slice(qv, CAST(m * $PqSubDim + 1 AS INT), $PqSubDim), centroid,
            (x, y) -> CAST(x AS DOUBLE) * y),
          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("qd"))
      .groupBy(col("query_id"))
      .agg(expr("transform(array_sort(collect_list(struct(slot, qd))), t -> t.qd)")
        .as("lut"))
      .join(q, Seq("query_id"))
  }

  /** `adc = Σ_m lut[codes[m]]` — the pure-lookup approximate dot. */
  private val pqAdcExpr: String =
    s"""aggregate(sequence(0, ${PqM - 1}), CAST(0 AS DOUBLE),
      (acc, m) -> acc + element_at(lut, CAST(element_at(codes, m + 1) + 1 AS INT)))"""

  def knnPq(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    val q = base.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    // ADC never touches float vectors, and neither does the shortlist
    // stream: codes × broadcast LUT → (query, neighbor, asim) only
    val approx = pqCodes(spark, dir)
      .crossJoin(broadcast(pqQueryLut(spark, dir)
        .select(col("query_id"), col("lut"), col("qnrm"))))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr(pqAdcExpr) / (sqrt(col("rnrm")) * sqrt(col("qnrm")))).as("asim"))
    val shortlist = shortlistIds(approx, PqReRank * K)
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
    topK(shortlist.select(col("query_id"), col("neighbor_id"), cosine))
  }

  // --- Residual IVF-PQ ---------------------------------------------------

  /** Integer grid (2^40) for residual-codebook means. Residuals are
    * general DOUBLES (float minus a trained-centroid mean), so the 2^54
    * float-ulp trick behind [[Scale]] does not apply — a residual's ulp
    * can sit below 2^-54 and the decimal cast would exercise the
    * engines' divergent rounding. Instead each summed component is
    * FLOORED onto this grid first (floor of identical doubles is
    * identical; |res| ≤ 2 keeps res·2^40 well inside exact-double and
    * BIGINT range), and the exact integers accumulate in DECIMAL —
    * the pagerank/mixWeights device. The 2^-40 per-component bias is
    * orders of magnitude under the PQ cells' own quantization error.
    */
  val ResGrid: String = "1099511627776.0" // 2^40

  /** Per-vector residual against the assigned coarse centroid — the
    * quantity real IVF-PQ encodes: residual norms are much smaller than
    * vector norms, so the same 48-bit PQ budget spends its cells on a
    * tighter distribution (measurably lower reconstruction error —
    * [[pqMse]] is the gauge). Memoized: codebook training and encoding
    * both scan it.
    */
  private def ivfResiduals(spark: SparkSession, dir: String, nlist: Int): DataFrame =
    TextOps.memoized(spark, dir, s"ivfpq_residuals_$nlist") {
      ivfAssign(spark, dir, nlist)
        .select(col("vec_id"), col("assigned_label"))
        .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
          Seq("vec_id"))
        .join(broadcast(centroidVectors(spark, dir, nlist)
          .select(col("c_label").as("assigned_label"), col("centroid"))),
          Seq("assigned_label"))
        .select(col("vec_id"), col("assigned_label"),
          expr("zip_with(embedding, centroid, (x, y) -> CAST(x AS DOUBLE) - y)")
            .as("res"))
        .localCheckpoint() // plan-size cut, same device as centroidsRaw
    }

  /** One row per (vector, subspace) of the residual: training cell from
    * the same sign planes as [[pqSubs]] (the cells only need to carve
    * locality buckets; the means are trained either way), subvector of
    * the residual.
    */
  private def pqrSubs(spark: SparkSession, dir: String, nlist: Int): DataFrame = {
    val arms = (0 until PqM).map { m =>
      s"""struct(CAST($m AS BIGINT) AS m,
         |  CAST(${pqTrainCellExpr(m, pqSubExpr(m, "res"))} AS BIGINT) AS cell,
         |  ${pqSubExpr(m, "res")} AS sub)""".stripMargin
    }.mkString("array(", ",\n", ")")
    ivfResiduals(spark, dir, nlist)
      .select(col("vec_id"), col("assigned_label"), explode(expr(arms)).as("s"))
      .select(col("vec_id"), col("assigned_label"),
        col("s.m").as("m"), col("s.cell").as("cell"), col("s.sub").as("sub"))
  }

  /** The residual PQ codebook: per (subspace, cell) the grid-floored
    * mean residual subvector (see [[ResGrid]]) and a dense slot id —
    * same shape and slot contract as [[pqCodebook]], trained on
    * residual space.
    */
  private[graft] def pqrCodebook(spark: SparkSession, dir: String, nlist: Int = NList): DataFrame =
    TextOps.memoized(spark, dir, s"pqr_codebook_$nlist") {
      val sums = pqrSubs(spark, dir, nlist)
        .select(col("m"), col("cell"), posexplode(col("sub")).as(Seq("pos", "val")))
        .groupBy(col("m"), col("cell"), col("pos"))
        .agg(
          sum(expr(s"CAST(CAST(floor(val * $ResGrid) AS BIGINT) AS DECIMAL(38,0))"))
            .as("csum"),
          count(lit(1)).as("n"))
        .withColumn("mean", col("csum").cast("double") / expr(ResGrid) / col("n"))
      val w = Window.orderBy(col("m"), col("cell"))
      sums.groupBy(col("m"), col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, mean))), t -> t.mean)")
          .as("centroid"))
        .select(col("m"), col("cell"), col("centroid"))
        .withColumn("slot", (row_number().over(w) - 1).cast("long"))
        .localCheckpoint() // plan-size cut, same device as centroidsRaw
    }

  /** Residual-coded corpus: per vector the 8 slot codes, plus the full
    * reconstruction `v̂ = centroid_assigned + concat_m(codebook[m][code])`
    * and its squared norm — ADC's denominator. At scale only codes (and
    * rnrm) are stored; v̂ is encode-time scratch.
    */
  private[graft] def pqrCodes(spark: SparkSession, dir: String, nlist: Int = NList): DataFrame =
    TextOps.memoized(spark, dir, s"pqr_codes_$nlist") {
      val l2 =
        """aggregate(zip_with(sub, centroid, (x, y) ->
          |  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin
      pqrSubs(spark, dir, nlist)
        .drop("cell")
        .join(broadcast(pqrCodebook(spark, dir, nlist)), Seq("m"))
        .select(col("vec_id"), col("assigned_label"), col("m"),
          struct(expr(l2).as("d2"), col("cell"), col("slot"), col("centroid")).as("cand"))
        .groupBy(col("vec_id"), col("assigned_label"), col("m"))
        .agg(min(col("cand")).as("best"))
        .groupBy(col("vec_id"), col("assigned_label"))
        .agg(
          expr("transform(array_sort(collect_list(struct(m, best.slot))), t -> t.slot)")
            .as("codes"),
          expr("""flatten(transform(array_sort(collect_list(struct(m, best.centroid))),
            t -> t.centroid))""").as("recon"))
        .join(broadcast(centroidVectors(spark, dir, nlist)
          .select(col("c_label").as("assigned_label"), col("centroid").as("ccent"))),
          Seq("assigned_label"))
        .withColumn("vhat", expr("zip_with(ccent, recon, (x, y) -> x + y)"))
        .withColumn("rnrm", expr(dot("vhat", "vhat")))
        .select(col("vec_id"), col("assigned_label"), col("codes"),
          col("vhat"), col("rnrm"))
        .localCheckpoint() // plan-size cut, same device as centroidsRaw
    }

  /** Per-query slot LUT over the RESIDUAL codebook (mirror of
    * [[pqQueryLut]]); carries qv/qnrm for the exact re-rank.
    */
  private def pqrQueryLut(spark: SparkSession, dir: String, nlist: Int): DataFrame = {
    val q = withNorm(spark, dir).where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    q.crossJoin(broadcast(pqrCodebook(spark, dir, nlist)))
      .select(col("query_id"),
        col("slot"),
        expr(s"""aggregate(zip_with(
            slice(qv, CAST(m * $PqSubDim + 1 AS INT), $PqSubDim), centroid,
            (x, y) -> CAST(x AS DOUBLE) * y),
          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("qd"))
      .groupBy(col("query_id"))
      .agg(expr("transform(array_sort(collect_list(struct(slot, qd))), t -> t.qd)")
        .as("lut"))
      .join(q, Seq("query_id"))
  }

  /** IVF-PQ: the two-level index every billion-vector deployment runs —
    * IVF's coarse quantizer prunes the corpus to `nprobe` buckets
    * (~N·nprobe/nlist candidates), then PQ's LUT-only ADC scores just
    * those candidates, and exact cosine re-ranks the [[PqReRank]]·K
    * shortlist. RESIDUAL variant: codes quantize vector−centroid, so
    * `<q, v̂> = <q, c_assigned> + Σ_m lut[codes[m]]` — the per-(query,
    * probed-centroid) dot is one extra term next to the same LUT fold,
    * and the candidate's assigned centroid IS the probe's centroid (the
    * bucket join guarantees it), so the term costs one broadcast join
    * on the ≤nlist probe rows. Scale shape: candidates are a keyed
    * bucket join (never all-pairs), ADC never touches float vectors,
    * and the per-candidate state is 6 bytes of codes + one double.
    */
  def knnIvfPq(spark: SparkSession, dir: String,
      nlist: Int = NList, nprobe: Int = NProbe): DataFrame = {
    val assignments = ivfAssign(spark, dir, nlist)
      .select(col("vec_id").as("neighbor_id"), col("assigned_label"))
    val base = withNorm(spark, dir)
    val q = base.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val probes = queryProbes(spark, dir, nlist, nprobe)
      .join(broadcast(centroidVectors(spark, dir, nlist)
        .select(col("c_label").as("assigned_label"), col("centroid"))),
        Seq("assigned_label"))
      .join(broadcast(q.select(col("query_id"), col("qv"))), Seq("query_id"))
      .select(col("query_id"), col("assigned_label"),
        expr(dot("qv", "centroid")).as("qcdot"))
    val candidates = probes.join(assignments, Seq("assigned_label"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qcdot"))
    val approx = candidates
      .join(pqrCodes(spark, dir, nlist)
        .select(col("vec_id").as("neighbor_id"), col("codes"), col("rnrm")),
        Seq("neighbor_id"))
      .join(broadcast(pqrQueryLut(spark, dir, nlist)
        .select(col("query_id"), col("lut"), col("qnrm"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        ((col("qcdot") + expr(pqAdcExpr)) / (sqrt(col("rnrm")) * sqrt(col("qnrm"))))
          .as("asim"))
    val shortlist = shortlistIds(approx, PqReRank * K)
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qnrm"))),
        Seq("query_id"))
    topK(shortlist.select(col("query_id"), col("neighbor_id"), cosine))
  }

  /** Reconstruction MSE of the two 48-bit PQ variants — THE gauge where
    * residual encoding shows its win (recall at this fixture is bounded
    * by IVF's bucket pruning, which both variants share): per vector
    * the squared L2 error of the reconstruction, averaged corpus-wide
    * on the [[ResGrid]] integer grid (order-free, oracle-checkable).
    * Raw PQ reconstructs concat_m(codebook[m][code]); residual IVF-PQ
    * reconstructs centroid + residual codes. Same PqM·PqBits budget.
    */
  def pqMse(spark: SparkSession, dir: String, nlist: Int = NList): DataFrame = {
    // both reconstructions come off the memoized encode artifacts
    // (pqCodes/pqrCodes persist vhat) — re-deriving raw-PQ's recon
    // here would re-run the 64-cell argmin per (vec, m) that encoding
    // already paid for, N·M·64 interpreted lambdas for a gauge
    val rawRecon = pqCodes(spark, dir).select(col("vec_id"), col("vhat"))
    val err =
      """aggregate(zip_with(embedding, vhat, (x, y) ->
        |  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin
    def mseOf(recon: DataFrame, variant: String): DataFrame =
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
        .join(recon, Seq("vec_id"))
        .select(expr(err).as("e2"))
        .agg(
          (sum(expr(s"CAST(CAST(floor(e2 * $ResGrid) AS BIGINT) AS DECIMAL(38,0))"))
            .cast("double") / expr(ResGrid) / count(lit(1))).as("mse"),
          count(lit(1)).as("n"))
        .select(lit(variant).as("variant"), col("mse"), col("n"))
    mseOf(rawRecon, "pq_raw")
      .unionAll(mseOf(
        pqrCodes(spark, dir, nlist).select(col("vec_id"), col("vhat")),
        "ivfpq_residual"))
  }

  /** Recall@K of the IVF-PQ index against the exact baseline. With
    * this fixture recall is pruning-bound (both PQ variants share IVF's
    * bucket cut), so `nprobe` — not the code budget — is the lever
    * that moves it; the registry runs this at the default and at
    * `nprobe = 4` (emb_ivfpq_mp_recall) to expose the trade.
    */
  def ivfPqRecall(spark: SparkSession, dir: String,
      nprobe: Int = NProbe): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnIvfPq(spark, dir, nprobe = nprobe)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  /** Recall@K of the PQ index against the exact baseline. */
  def pqRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnPq(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  // --- Matryoshka (prefix-dimension) search -----------------------------

  /** Prefix width for the truncated-dimension approximate pass. */
  val MrlDim = 32
  /** Exact-re-rank shortlist size (× K) for [[knnMrl]]. */
  val MrlReRank = 4

  /** ANN via dimension truncation (the matryoshka-embedding serving
    * pattern): the approximate pass scores cosine on only the first
    * [[MrlDim]] of [[Dim]] dims — with a columnar prefix layout that is
    * a scan of MrlDim/Dim (here 1/2) of the vector bytes and flops, no
    * training, no index build — then re-ranks the [[MrlReRank]]·K
    * shortlist with full-width exact cosine. Useful exactly when the
    * embedding model front-loads information (MRL-trained models);
    * [[mrlRecall]] is the evaluation loop that tells you whether yours
    * does.
    */
  def knnMrl(spark: SparkSession, dir: String): DataFrame = {
    val pref = s"slice(embedding, 1, $MrlDim)"
    val base = withNorm(spark, dir)
      .withColumn("pv", expr(pref))
      .withColumn("pnrm", expr(dot("pv", "pv")))
    val q = base.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("pv").as("qpv"), col("pnrm").as("qpnrm"))
    // the truncated pass streams only prefixes and scores; full-width
    // payloads rejoin after the shortlist cut
    val approx = base
      .select(col("vec_id"), col("pv"), col("pnrm"))
      .crossJoin(broadcast(q.select(col("query_id"), col("qpv"), col("qpnrm"))))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr(dot("pv", "qpv")) / (sqrt(col("pnrm")) * sqrt(col("qpnrm"))))
          .as("asim"))
    val shortlist = shortlistIds(approx, MrlReRank * K)
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qnrm"))),
        Seq("query_id"))
    topK(shortlist.select(col("query_id"), col("neighbor_id"), cosine))
  }

  /** Recall@K of the truncated-prefix index against the exact baseline. */
  def mrlRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnMrl(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  // --- Johnson–Lindenstrauss random-projection search -------------------

  /** Projection width and exact-re-rank shortlist size (× K) for
    * [[knnRp]].
    */
  val RpDim = 16
  val RpReRank = 8

  /** ANN via Johnson–Lindenstrauss random projection (±1 hyperplanes —
    * Achlioptas 2003's database-friendly JL family, and the SAME
    * deterministic LCG planes the sign-LSH/BQ index quantizes — kept
    * REAL-VALUED here): every vector projects to [[RpDim]] dims
    * (`y_j = <plane_j, x>`), the approximate pass scores cosine in
    * projected space (RpDim/Dim of the flops and bytes), exact cosine
    * re-ranks the [[RpReRank]]·K shortlist. The family contrast this
    * tier completes: MRL truncation bets the MODEL front-loads
    * information into prefix dims; JL preserves distances within
    * 1 ± ε for ANY embedding (RpDim ~ log N / ε² — dial RpDim, not
    * model properties); BQ is these same projections cut to 1 bit.
    * [[rpRecall]] measures what the real corpus pays at this RpDim.
    *
    * Same scale shape as the quantized family: projections are a
    * per-row map (at ingest they'd be a stored column), the corpus
    * never shuffles, queries broadcast, full-width payloads rejoin
    * only after the shortlist cut.
    */
  def knnRp(spark: SparkSession, dir: String, rpDim: Int = RpDim,
      reRank: Int = RpReRank): DataFrame = {
    val proj =
      s"""transform(${planesLitSpark(rpDim)}, p ->
         |  aggregate(zip_with(p, embedding, (w, x) -> w * CAST(x AS DOUBLE)),
         |    CAST(0 AS DOUBLE), (acc, v) -> acc + v))""".stripMargin
    val base = withNorm(spark, dir)
      .withColumn("pv", expr(proj))
      .withColumn("pnrm", expr(dot("pv", "pv")))
    val q = base.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("pv").as("qpv"), col("pnrm").as("qpnrm"))
    val approx = base
      .select(col("vec_id"), col("pv"), col("pnrm"))
      .crossJoin(broadcast(q.select(col("query_id"), col("qpv"), col("qpnrm"))))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr(dot("pv", "qpv")) / (sqrt(col("pnrm")) * sqrt(col("qpnrm"))))
          .as("asim"))
    val shortlist = shortlistIds(approx, reRank * K)
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qnrm"))),
        Seq("query_id"))
    topK(shortlist.select(col("query_id"), col("neighbor_id"), cosine))
  }

  /** Recall@K of the JL projection index against the exact baseline. */
  def rpRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = knnRp(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("hit")).cast("double") / K).as("recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  // --- Semantic dedup + cluster-stratified sampling ---------------------

  /** Cluster-then-pairwise semantic dedup (the SemDeDup recipe, Abbas
    * et al. 2023): candidates are pairs sharing a TRAINED IVF cluster
    * ([[ivfAssign]]), exact cosine runs only within clusters, and a
    * vector is a duplicate iff some SAME-cluster neighbor with a
    * smaller vec_id clears the family dup threshold (deterministic
    * keep-lowest-id policy — the min-id canonical rule every graft
    * dedup uses). Complements [[dedupEmbedding]]: LSH bands catch
    * near-dups across the whole corpus; the cluster cut is the
    * paper's trade — cheaper (no banding pass, candidates are
    * Σ|cluster|² not bucket collisions) and blind to pairs the
    * clustering separates.
    *
    * 100 TB shape: the codebook broadcasts; the corpus shuffles ONCE on
    * assigned cluster; per-cluster work is |cluster|² — `nlist` is the
    * dial (paper runs ~100k clusters) that keeps clusters
    * memory-bounded, exactly like [[centroidsRaw]]'s `nlist ≈ √N` note.
    * Emits EVERY vector with its cluster and flag (the curation table a
    * pipeline filters by), not just survivors.
    */
  def semDedup(spark: SparkSession, dir: String, nlist: Int = NList,
      threshold: Double = DupThreshold): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val assign = ivfAssign(spark, dir, nlist)
      .select(col("vec_id"), col("assigned_label"))
    val emb = assign.join(
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      Seq("vec_id"))
    val dups = emb.select(col("assigned_label"), col("vec_id").as("vec_a"),
        col("embedding").as("emb_a"))
      .join(emb.select(col("assigned_label"), col("vec_id").as("vec_b"),
        col("embedding").as("emb_b")), Seq("assigned_label"))
      .where(col("vec_a") < col("vec_b"))
      .where(expr("cosine_sim(emb_a, emb_b)") >= threshold)
      .select(col("vec_b").as("vec_id"))
      .distinct()
    assign
      .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("assigned_label").as("cluster"),
        // 0/1 long, not boolean: every hash-green query sticks to the
        // driver-compare-proven type surface (bigint/varchar/double)
        coalesce(col("dup"), lit(false)).cast("long").as("is_dup"))
  }

  /** Vectors kept per cluster by [[clusterSample]]. */
  val ClusterSampleN = 5

  /** Cluster-stratified corpus sampling — the diversity-balanced
    * downsample an LLM data pipeline runs after clustering: per trained
    * IVF cluster, keep the [[ClusterSampleN]] first vectors in
    * md5-of-id order (the same deterministic pseudo-random device as
    * [[graft.operators.TextOps.sampleStratified]]'s buckets, so both
    * engines agree bit-for-bit). Uniform sampling keeps the head
    * domains' share; per-cluster quotas keep the tail REPRESENTED —
    * that is the whole point of sampling by cluster.
    *
    * Shape: one shuffle on cluster id into a rank-limited window —
    * Spark plans a partial WindowGroupLimit, so each map task forwards
    * at most n rows per cluster and the exchange carries
    * O(clusters·n), not the corpus (same physical cut as the
    * collapse operator, PlanAuditSpec:243).
    */
  def clusterSample(spark: SparkSession, dir: String, nlist: Int = NList,
      perCluster: Int = ClusterSampleN): DataFrame = {
    val w = Window.partitionBy(col("assigned_label"))
      .orderBy(expr("md5(CAST(vec_id AS STRING))"), col("vec_id"))
    ivfAssign(spark, dir, nlist)
      .select(col("vec_id"), col("assigned_label"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= perCluster)
      .select(col("assigned_label").as("cluster"), col("vec_id"), col("rn"))
  }

  /** Composed embedding-side curation — the vector mirror of
    * [[graft.operators.TextOps.corpusCuration]]'s text pipeline:
    * cluster ([[ivfAssign]]) → semantic dedup within clusters
    * ([[semDedup]]) → cluster-stratified diversity sample over the
    * SURVIVORS ([[clusterSample]]'s md5-of-id quota). One decision row
    * per vector: its cluster, dup flag, sample rank among its
    * cluster's survivors, and the final keep bit — the curation table
    * a 100 TB embedding pipeline writes before training-set export.
    * Composes the memoized IVF artifacts; the only new work is the
    * survivors' rank window (partial WindowGroupLimit cut).
    */
  def embCuration(spark: SparkSession, dir: String,
      nlist: Int = NList): DataFrame = {
    val sd = semDedup(spark, dir, nlist)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(expr("md5(CAST(vec_id AS STRING))"), col("vec_id"))
    val ranked = sd.where(col("is_dup") === 0L)
      .withColumn("rn", row_number().over(w).cast("long"))
    sd.join(ranked.select(col("vec_id"), col("rn")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("is_dup"),
        coalesce(col("rn"), lit(0L)).as("sample_rank"),
        when(col("is_dup") === 0L && col("rn") <= ClusterSampleN, 1L)
          .otherwise(0L).as("kept"))
  }

  /** Number of farthest-point picks for [[kCenter]]. */
  val KcK = 10

  /** k-center coreset selection by farthest-point (Gonzalez 1985)
    * greedy: repeatedly pick the vector FARTHEST (max min-cosine-
    * distance) from everything picked so far — the classic 2-approx
    * k-center cover, and the diversity-first subset selection a
    * curation pipeline runs to seed a labeling budget or a validation
    * panel ([[clusterSample]] samples *within* structure; this op
    * finds the corpus's extremes — outliers, rare modes — first).
    *
    * Sequentiality is inherent (pick t depends on picks 1..t−1), so
    * the loop runs ON THE DRIVER but moves only SCALARS: per step one
    * TakeOrdered(1) job returns the (vec_id, d) pair of the winner,
    * the pick's embedding rejoins by id as a broadcast one-row frame,
    * and the corpus-wide min-distance column updates in place
    * (`least(d, dist-to-new-pick)`) — the standard distributed FPS:
    * k corpus passes, nothing resembling the corpus ever collected.
    * Lineage is cut per step (the d-frame feeds both the argmax and
    * its own update — uncut, the plan would double per step).
    *
    * Determinism/oracle: distance is `1.0 − cos` with the house
    * in-order dot fold, every pick tiebroken (d DESC, vec_id ASC);
    * the d-column starts at the sentinel 2.0 (> any cosine distance),
    * which makes pick 1 the minimum vec_id and lets the DuckDB mirror
    * unroll all [[KcK]] steps uniformly as CTE pairs (argmax → d
    * update), bit-equal at every step.
    */
  def kCenter(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
      .select(col("vec_id"), col("embedding"), col("nrm"))
    var d = base.withColumn("d", lit(2.0))
    val picks = Seq.newBuilder[(Long, Long, Double)]
    var exhausted = false
    for (t <- 1 to KcK if !exhausted) {
      // collect(), not head(): an EMPTY corpus (cold index, fresh
      // cluster) must yield an empty selection, not a crash
      val rows = d.orderBy(col("d").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("d")).collect()
      if (rows.isEmpty) exhausted = true
      else {
        val top = rows(0)
        picks += ((t.toLong, top.getLong(0), top.getDouble(1)))
        if (t < KcK) {
          val pv = broadcast(base.where(col("vec_id") === top.getLong(0))
            .select(col("embedding").as("pv"), col("nrm").as("pnrm")))
          d = TextOps.cutLineage(d.crossJoin(pv).select(
            col("vec_id"), col("embedding"), col("nrm"),
            least(col("d"),
              lit(1.0) - expr(dot("embedding", "pv")) /
                (sqrt(col("nrm")) * sqrt(col("pnrm")))).as("d")))
        }
      }
    }
    import spark.implicits._
    picks.result().toDF("pick_order", "vec_id", "covered_d")
  }

  // --- kNN graph (the graph-based ANN family) -------------------------

  /** Out-degree of the kNN graph — the `M` of an HNSW/NSW layer. */
  val GraphK = 8

  /** Approximate kNN GRAPH over the corpus — the index artifact of the
    * graph-ANN family (NSW/HNSW's base layer): per vector, its
    * [[GraphK]] best neighbors among the sign-LSH banded candidates
    * (the [[dedupEmbedding]] candidate stream, both orientations),
    * exact-cosine ranked. Approximate by construction: a true neighbor
    * sharing no band is invisible — the same contract as every
    * LSH-seeded structure here, and the reason [[graphRecall]] gauges
    * the EXPANDED search, not the bare graph.
    *
    * Memoized: the graph is consumed by [[knnGraphExpand]] and
    * [[graphRecall]] in the same session (at scale: written next to
    * the index like the IVF codebook).
    *
    * Shape at 100 TB: band self-join (O(collisions)), fused-cosine
    * scoring on candidate pairs only, and the per-source cut rides the
    * bounded-heap `topk_by_sim` aggregate — ≤ GraphK rows per vector
    * cross the final shuffle, never a global window sort.
    */
  def knnGraph(spark: SparkSession, dir: String,
      numPlanes: Int = NumPlanes, bandBits: Int = BandBits): DataFrame =
    TextOps.memoized(spark, dir, "knn_graph") {
      graft.plans.GraftExtensions.register(spark)
      val bands = Tables.embeddings(spark, dir).select(
        col("vec_id"),
        posexplode(expr(s"sign_bands(embedding, $numPlanes, $bandBits)"))
          .as(Seq("band_idx", "band_key")))
      val und = bands.select(col("vec_id").as("src"), col("band_idx"), col("band_key"))
        .join(bands.select(col("vec_id").as("dst"), col("band_idx"), col("band_key")),
          Seq("band_idx", "band_key"))
        .where(col("src") < col("dst"))
        .select(col("src"), col("dst")).distinct()
      val cands = und.unionAll(und.select(col("dst").as("src"), col("src").as("dst")))
      val sims = cands
        .join(Tables.embeddings(spark, dir)
          .select(col("vec_id").as("src"), col("embedding").as("emb_s")), Seq("src"))
        .join(Tables.embeddings(spark, dir)
          .select(col("vec_id").as("dst"), col("embedding").as("emb_d")), Seq("dst"))
        .select(col("src").as("query_id"), col("dst").as("neighbor_id"),
          expr("cosine_sim(emb_s, emb_d)").as("sim"))
      sims.groupBy(col("query_id"))
        .agg(expr(s"topk_by_sim(neighbor_id, sim, $GraphK)").as("tk"))
        .select(col("query_id").as("vec_id"), posexplode(col("tk")).as(Seq("pos", "nb")))
        .select(col("vec_id"), col("nb.neighbor_id").as("neighbor_id"),
          (col("pos") + 1).cast("long").as("rank"), col("nb.sim").as("sim"))
    }

  /** Graph-expanded ANN search — the query-time half of the graph
    * index: seed candidates from the exact-bucket LSH join (the
    * [[knnLsh]] stream), expand ONE hop through [[knnGraph]]
    * (neighbors-of-seeds — NSW's "follow the edges of whatever you
    * found"), exact-cosine re-rank the union. The expansion recovers
    * true neighbors that share no band with the query but sit next to
    * something that does — [[graphRecall]] measures exactly that
    * recovery over the raw-seed baseline.
    *
    * Shape at 100 TB: seeds are the banded equi-join (queries
    * broadcast); the hop is an equi-join of the seed pairs against the
    * ≤ GraphK-wide graph on the seed key; re-rank touches
    * |seeds|·(1+GraphK) candidates per query, and the final cut is the
    * bounded-heap aggregate. No corpus-sized shuffle beyond the band
    * join every LSH query already pays.
    */
  def knnGraphExpand(spark: SparkSession, dir: String,
      numPlanes: Int = NumPlanes, bandBits: Int = BandBits): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val base = withNorm(spark, dir)
    val bands = base.select(
      col("vec_id"),
      posexplode(expr(s"sign_bands(embedding, $numPlanes, $bandBits)"))
        .as(Seq("band_idx", "band_key")))
    val qBands = bands.where(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("band_idx"), col("band_key"))
    val seeds = bands.join(broadcast(qBands), Seq("band_idx", "band_key"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("seed_id"))
      .distinct()
    val hop = seeds.join(
      knnGraph(spark, dir, numPlanes, bandBits)
        .select(col("vec_id").as("seed_id"), col("neighbor_id")),
      Seq("seed_id"))
      .select(col("query_id"), col("neighbor_id"))
    val expanded = seeds.select(col("query_id"), col("seed_id").as("neighbor_id"))
      .unionAll(hop)
      .where(col("neighbor_id") =!= col("query_id"))
      .distinct()
    val sims = expanded
      .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("nrm")), Seq("neighbor_id"))
      .join(broadcast(base.where(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("nrm").as("qnrm"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine)
    topK(sims)
  }

  /** Recall@K of the graph-expanded search against the exact baseline,
    * with the bare-seed (no-expansion) recall as a gauge column — the
    * one-hop expansion must buy recall the raw LSH buckets don't have,
    * and this query is where that claim is measured (the spec pins the
    * ≥ direction; golden freezes the achieved values).
    */
  def graphRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val expand = knnGraphExpand(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("ghit"))
    val seed = knnLsh(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("shit"))
    exact
      .join(expand, Seq("query_id", "neighbor_id"), "left")
      .join(seed, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("ghit")).cast("double") / K).as("recall_at_k"),
        (count(col("shit")).cast("double") / K).as("seed_recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  /** Beam width for the multi-hop graph descent — candidates expanded
    * per query per round after the exhaustive first hop.
    */
  val BeamWidth = 8

  /** Total hops of [[knnGraphBeam]]: hop 1 is the exhaustive seed
    * expansion (the [[knnGraphExpand]] candidate set, so beam recall is
    * ≥ one-hop recall BY CONSTRUCTION — the spec pins that invariant
    * fixture-independently); hops 2..BeamRounds are beam-bounded.
    */
  val BeamRounds = 3

  /** Graph-ANN BEAM search — the multi-hop NSW descent
    * [[knnGraphExpand]] gestures at: after the exhaustive first hop,
    * each round follows the graph edges of only the [[BeamWidth]] best
    * NEW candidates per query (greedy beam), skips everything already
    * visited (anti-join — the closure device's frontier discipline),
    * exact-scores the fresh candidates, and the final top-k re-ranks
    * the full visited set. Every scored sim is exact cosine, so
    * "re-rank" is a bounded-heap cut, never a rescore.
    *
    * Shape at 100 TB: the first hop is what [[knnGraphExpand]] already
    * pays (banded seed join + one graph hop); each further round
    * touches ≤ |Q|·BeamWidth·GraphK candidate ids — query-sized, not
    * corpus-sized — joined against the ≤ GraphK-wide memoized graph on
    * the frontier key. Rounds are lineage-cut so the loop's plan stays
    * flat (the propagateToFixpoint discipline).
    */
  def knnGraphBeam(spark: SparkSession, dir: String,
      numPlanes: Int = NumPlanes, bandBits: Int = BandBits,
      rounds: Int = BeamRounds): DataFrame =
    TextOps.memoized(spark, dir, s"knn_graph_beam_$rounds") {
      graft.plans.GraftExtensions.register(spark)
      val base = withNorm(spark, dir)
      val queries = broadcast(base.where(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("nrm").as("qnrm")))
      def score(cands: DataFrame): DataFrame = cands
        .join(base.select(col("vec_id").as("neighbor_id"), col("embedding"),
          col("nrm")), Seq("neighbor_id"))
        .join(queries, Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), cosine)
      val graph = knnGraph(spark, dir, numPlanes, bandBits)
        .select(col("vec_id").as("seed_id"), col("neighbor_id").as("next_id"))
      // hop 1: the exhaustive seed + one-hop expansion (knnGraphExpand's set)
      val bands = base.select(
        col("vec_id"),
        posexplode(expr(s"sign_bands(embedding, $numPlanes, $bandBits)"))
          .as(Seq("band_idx", "band_key")))
      val qBands = bands.where(col("vec_id") % QueryMod === 0)
        .select(col("vec_id").as("query_id"), col("band_idx"), col("band_key"))
      val seeds = bands.join(broadcast(qBands), Seq("band_idx", "band_key"))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("seed_id"))
        .distinct()
      val hop1 = seeds.select(col("query_id"), col("seed_id").as("neighbor_id"))
        .unionAll(seeds.join(graph, Seq("seed_id"))
          .select(col("query_id"), col("next_id").as("neighbor_id")))
        .where(col("neighbor_id") =!= col("query_id"))
        .distinct()
      var fresh = TextOps.cutLineage(score(hop1))
      var visited = fresh
      for (_ <- 2 to rounds) {
        val beam = fresh.groupBy(col("query_id"))
          .agg(expr(s"topk_by_sim(neighbor_id, sim, $BeamWidth)").as("tk"))
          .select(col("query_id"),
            explode(expr("transform(tk, t -> t.neighbor_id)")).as("seed_id"))
        val next = beam.join(graph, Seq("seed_id"))
          .select(col("query_id"), col("next_id").as("neighbor_id"))
          .where(col("neighbor_id") =!= col("query_id"))
          .distinct()
          .join(visited.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"), "left_anti")
        fresh = TextOps.cutLineage(score(next))
        visited = TextOps.cutLineage(visited.unionAll(fresh))
      }
      topK(visited)
    }

  /** Recall@K of the beam descent vs the exact baseline, with the
    * one-hop [[knnGraphExpand]] recall as the gauge column: the deeper
    * hops must only ever ADD true neighbors (the superset construction
    * makes ≥ an invariant; the golden freezes how much the beam buys).
    */
  def beamRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = knnExact(spark, dir).select(col("query_id"), col("neighbor_id"))
    val beam = knnGraphBeam(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("bhit"))
    val expand = knnGraphExpand(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("ehit"))
    exact
      .join(beam, Seq("query_id", "neighbor_id"), "left")
      .join(expand, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg((count(col("bhit")).cast("double") / K).as("recall_at_k"),
        (count(col("ehit")).cast("double") / K).as("expand_recall_at_k"),
        count(lit(1)).as("n_exact"))
  }

  // --- Margin-based bitext mining ------------------------------------

  /** CSLS penalty neighborhood size (Conneau et al. 2018; Artetxe &
    * Schwenk 2019 use the same k-NN mean in the ratio margin).
    */
  val BitextK = 4

  /** Mined pairs kept (top-N by margin). */
  val BitextTopN = 50

  /** Margin-based bitext mining (Artetxe & Schwenk 2019): find
    * translation-pair candidates between two corpora embedded in one
    * space by scoring cross-side cosine AGAINST each endpoint's local
    * neighborhood — `margin(x,y) = (1+cos(x,y)) / mean_k((1+cos))` over
    * the two endpoints' k-NN penalty sets — so a pair only scores high
    * when the two vectors are each other's outstanding match, not
    * merely residents of a dense region (the hubness fix plain cosine
    * thresholds lack). Sides here are the deterministic `vec_id`
    * parity split (the fixture stand-in for an actual two-language
    * corpus pair). The affine `1+cos` shift keeps every penalty
    * positive for sims spanning negative values — a monotone variant
    * of the published ratio margin.
    *
    * Determinism: pairwise cosines are the fused in-order fold;
    * penalty sums leave float space — each candidate sim quantizes to
    * the 2^40 integer grid (`⌊(1+sim)·2^40⌋`), the k-NN penalty is an
    * order-free BIGINT sum over the (sim DESC, id ASC) top-k, and the
    * margin is ONE IEEE division of a product chain whose every factor
    * is exact (`(1+sim)·2^41·ka·kb / (pa·kb + pb·ka)` — all integer
    * factors < 2^53). A float mean of penalties would wobble with
    * summation order; the grid cannot.
    *
    * Shape at 100 TB: the cross-side candidate stream is the banded
    * equi-join (never all-pairs); penalty windows ride (side-keyed)
    * WindowGroupLimit cuts over candidate pairs only; the final top-N
    * is a TakeOrdered over pairs that already carry their margins.
    */
  def bitextMine(spark: SparkSession, dir: String,
      numPlanes: Int = NumPlanes, bandBits: Int = BandBits): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    val bands = Tables.embeddings(spark, dir).select(
      col("vec_id"),
      posexplode(expr(s"sign_bands(embedding, $numPlanes, $bandBits)"))
        .as(Seq("band_idx", "band_key")))
    val cands = bands.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("band_idx"), col("band_key"))
      .join(bands.where(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("b_id"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .select(col("a_id"), col("b_id")).distinct()
    val pairs = cands
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("a_id"), col("embedding").as("emb_a")), Seq("a_id"))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("b_id"), col("embedding").as("emb_b")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("cosine_sim(emb_a, emb_b)").as("sim"))
      .withColumn("g", floor((lit(1.0d) + col("sim")) * lit(1099511627776.0d))
        .cast("long"))
    val byA = Window.partitionBy(col("a_id"))
      .orderBy(col("sim").desc, col("b_id").asc)
    val byB = Window.partitionBy(col("b_id"))
      .orderBy(col("sim").desc, col("a_id").asc)
    val penA = pairs.withColumn("rn", row_number().over(byA))
      .where(col("rn") <= BitextK)
      .groupBy(col("a_id"))
      .agg(sum(col("g")).as("pen_a"), count(lit(1)).as("cnt_a"))
    val penB = pairs.withColumn("rn", row_number().over(byB))
      .where(col("rn") <= BitextK)
      .groupBy(col("b_id"))
      .agg(sum(col("g")).as("pen_b"), count(lit(1)).as("cnt_b"))
    val scored = pairs
      .join(penA, Seq("a_id"))
      .join(penB, Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("sim"),
        (((lit(1.0d) + col("sim")) *
          (lit(2199023255552L) * col("cnt_a") * col("cnt_b")).cast("double")) /
          (col("pen_a") * col("cnt_b") + col("pen_b") * col("cnt_a"))
            .cast("double")).as("margin"))
    // total-order TakeOrderedAndProject cut (the q15 device) — a global
    // rank window here would sort EVERY candidate pair through one
    // partition; the rank is re-derived over the 50 survivors only
    val byMargin = Window.orderBy(col("margin").desc, col("a_id").asc,
      col("b_id").asc)
    scored
      .orderBy(col("margin").desc, col("a_id").asc, col("b_id").asc)
      .limit(BitextTopN)
      .withColumn("rank", row_number().over(byMargin).cast("long"))
      .select(col("rank"), col("a_id"), col("b_id"), col("sim"), col("margin"))
  }
}
