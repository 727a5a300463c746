package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: lexical (BM25) and vector (exact cosine KNN)
  * rankings fused by Reciprocal Rank Fusion (Cormack, Clarke &
  * Buettcher 2009) — the standard two-tower serving shape (the
  * reference's substrate ships exactly this pairing as ES "hybrid
  * search": a `match` query plus a kNN clause, fused by RRF).
  */
object Retrieval {

  /** RRF's rank-damping constant (the paper's k = 60). */
  val RrfK = 60

  /** Top-k rows emitted per query after fusion. */
  val RrfTopK = 10

  private val Grid = 1099511627776L // 2^40

  /** Query-by-document hybrid retrieval over the aligned
    * documents/embeddings id space: every doc whose id is on the
    * exact-KNN query stride ([[VectorOps.QueryMod]]) retrieves
    *   - lexically: BM25 ([[TextOps.bm25Ranked]]) with the query
    *     doc's top-3 TF-IDF terms as the query string (the classic
    *     query-formulation step, already an operator — and the stride
    *     filter sits on the tfidf window's PARTITION key, so it
    *     pushes below the window: only query docs pay the ranking),
    *     self-hit excluded;
    *   - semantically: [[VectorOps.knnExact]] (which uses the same
    *     stride for its query set) over the doc's embedding.
    * The two top-k lists full-outer-join per (query, doc) and fuse as
    *   rrf = Σ_list ⌊2^40 / (60 + rank)⌋
    * — INTEGER division on the 2^40 grid, so the fused score is an
    * exact long on both engines (no reciprocal-sum float order to
    * worry about); a doc missing from one list contributes 0 from it,
    * rank ties break on doc_id. Emits (query_id, rank, doc_id,
    * rrf_score, lex_rank, vec_rank) — nullable ranks say WHICH system
    * surfaced the hit, the triage column hybrid-search debugging
    * lives on.
    *
    * Shape at 100 TB: both input rankings are top-k-per-query tables
    * (k·|Q| rows), so the fusion join and final window are
    * query-keyed small-data ops; the heavy lifting is inside the two
    * retrieval operators, which keep their own documented scale
    * shapes. The stride query set is the fixture stand-in for a
    * serving workload (same assumption [[VectorOps.knnExact]]
    * already makes).
    */
  /** Topic cards for the embedding clusters — the "what is THIS
    * cluster about" readout corpus curation runs before pruning or
    * re-weighting semantic clusters (the cluster-level companion of
    * [[graft.operators.TextOps.sigTerms]]'s per-source view): assign
    * each embedded document to its IVF cluster
    * ([[graft.operators.VectorOps.ivfAssign]] — the memoized index
    * artifact), then score each cluster's member terms with the same
    * JLH significance engine, foreground = the cluster, background =
    * the embedded corpus. Composes three memoized artifacts (IVF
    * assignment, postings index) with zero new heavy passes: the only
    * non-index work is the doc-keyed source attach and the
    * vocabulary-sized fg/bg aggregation — the sig-terms scale shape
    * unchanged.
    */
  def clusterCards(spark: SparkSession, dir: String): DataFrame = {
    val clusters = VectorOps.ivfAssign(spark, dir)
      .select(col("vec_id").as("doc_id"),
        concat(lit("cluster_"), col("assigned_label").cast("string")).as("source"))
    val docTerms = TextOps.postingsIndex(spark, dir)
      .select(col("doc_id"), col("term"))
      .join(clusters, Seq("doc_id"))
    TextOps.sigTermsFrom(docTerms, clusters)
      .select(col("source").as("cluster"), col("rank"), col("term"),
        col("fg"), col("bg"), col("jlh"))
  }

  /** MMR trade-off weight λ and number of diversified picks. */
  val MmrLambda = 0.7
  val MmrK = 5

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998)
    * — the serving-side diversity pass over a retrieved top-k list:
    * greedily pick [[MmrK]] of each query's [[VectorOps.knnExact]]
    * candidates, each next pick maximizing
    * `λ·rel − (1−λ)·max_sim_to_already_picked`, so near-duplicate
    * hits stop crowding the page (the redundancy problem dedup solves
    * at ingest, solved again at serving time for what survives).
    *
    * Determinism/oracle: rel is the exact cosine, the diversity term
    * a max over exact pairwise cosines of CANDIDATES (k² per query —
    * 100 rows, never corpus-sized), every double op a fixed IEEE
    * expression tree, ties broken on doc_id — so the greedy trace is
    * bit-reproducible and the DuckDB mirror unrolls the same
    * [[MmrK]]-step selection as CTEs (the Lloyd-rounds device). The
    * `1 − λ` coefficient is computed ONCE in Scala and interpolated
    * into both engines, because `1 − 0.7` and a literal `0.3` are
    * different doubles.
    *
    * Scale shape: inputs are top-k-per-query tables; the only
    * corpus-touching work is fetching the k·|Q| candidate embeddings
    * (broadcast candidate ids against the vector store — at scale a
    * point-lookup); the greedy loop itself runs on k²·|Q| rows.
    */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val oml = 1 - MmrLambda
    val cands = VectorOps.knnExact(spark, dir)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("sim").as("rel"))
      .localCheckpoint() // 5 greedy steps re-read this k·|Q|-row frame
    val vecs = VectorOps.withNorm(spark, dir)
    val pairs = cands.select(col("query_id"), col("doc_id").as("a"))
      .join(cands.select(col("query_id"), col("doc_id").as("b")), Seq("query_id"))
      .where(col("a") =!= col("b"))
      .join(vecs.select(col("vec_id").as("a"), col("embedding").as("ea"),
        col("nrm").as("na")), Seq("a"))
      .join(vecs.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb")), Seq("b"))
      .select(col("query_id"), col("a"), col("b"),
        (expr(VectorOps.dot("ea", "eb")) / (sqrt(col("na")) * sqrt(col("nb"))))
          .as("psim"))
      .localCheckpoint()
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val wMmr = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr").desc, col("doc_id").asc)
    var selected = cands
      .withColumn("rk", row_number().over(wRel)).where(col("rk") === 1)
      .select(col("query_id"), col("doc_id"), lit(1L).as("pick_order"),
        col("rel"), lit(0.0).as("max_div"),
        (lit(MmrLambda) * col("rel")).as("mmr"))
    for (t <- 2 to MmrK) {
      val maxdiv = pairs
        .join(selected.select(col("query_id"), col("doc_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a"))
        .agg(max(col("psim")).as("max_div"))
        .withColumnRenamed("a", "doc_id")
      val pick = cands
        .join(selected.select(col("query_id"), col("doc_id")),
          Seq("query_id", "doc_id"), "left_anti")
        .join(maxdiv, Seq("query_id", "doc_id"))
        .withColumn("mmr",
          lit(MmrLambda) * col("rel") - lit(oml) * col("max_div"))
        .withColumn("rk", row_number().over(wMmr)).where(col("rk") === 1)
        .select(col("query_id"), col("doc_id"), lit(t.toLong).as("pick_order"),
          col("rel"), col("max_div"), col("mmr"))
      selected = selected.unionByName(pick)
    }
    selected
  }

  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val queries = TextOps.tfidf(spark, dir)
      .where(col("doc_id") % VectorOps.QueryMod === 0)
      .select(col("doc_id").as("query_id"), col("word").as("term"))
    val lex = TextOps.bm25Ranked(spark, dir, queries, excludeSelf = true)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val vec = VectorOps.knnExact(spark, dir)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"$Grid div ($RrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"$Grid div ($RrfK + vec_rank)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= RrfTopK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_score"), col("lex_rank"), col("vec_rank"))
  }
}
