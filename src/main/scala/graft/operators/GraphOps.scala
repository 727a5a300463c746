package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over relationally-derived edge lists.
  *
  * The reference's asset documents carry a property graph as per-row
  * adjacency lists (`asset.parents`/`children`/`references`,
  * reference types.ts:7-9) — [[Assets.containerGraph]]/[[Assets.nodeGraph]]
  * build those edges. This module is the generalization layer on top:
  * the whole-graph analytics a user runs once edges exist. Edges here
  * derive from the TPC-H star (who buys from whom, nation to nation)
  * so the operators are driver-verifiable against the DuckDB oracle.
  *
  * Scale shape: an edge list is just a DataFrame keyed by (src, dst);
  * every iteration is one keyed join + one partial-aggregated groupBy —
  * the same two-shuffle round as [[TextOps.propagateToFixpoint]], and
  * like there the iteration count is fixed and small, so lineage stays
  * bounded without checkpoints.
  *
  * Cross-engine determinism: PageRank mass lives on an integer grid
  * (scaled to 10^9, floor division per edge) — integer sums commute
  * exactly under any partitioning, where a double Σ(pr/deg) would be
  * summation-order dependent (the same device as TextOps.mixWeights'
  * 2^40 grid). Production variants run doubles; the grid costs ~1e-9
  * relative precision per term and buys bit-identical results on both
  * engines and under any shuffle.
  */
object GraphOps {

  /** PageRank iterations (unrolled identically in the oracle). */
  val PrRounds = 5

  /** Integer mass grid: initial rank per node. */
  val PrScale = 1000000000L

  /** Damping 0.85 as an exact integer ratio. */
  val PrDampNum = 85L
  val PrDampDen = 100L

  /** Nation-to-nation trade edges: customer nation → supplier nation,
    * weighted by lineitem count. Dimension joins broadcast; the one
    * big-side shuffle is the (src, dst) aggregation.
    */
  private[graft] def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")), // fact-to-fact: keyed shuffle join, AQE sizes it
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** Weighted degree centrality: per nation the out/in edge and weight
    * totals over the trade graph — the one-shuffle warm-up graph stat.
    */
  def degreeCentrality(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"), sum(col("w")).as("out_w"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"), sum(col("w")).as("in_w"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("out_w"), lit(0L)).as("out_w"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("in_w"), lit(0L)).as("in_w"))
  }

  /** Bounded upward reachability over the ASSET graph — the traversal a
    * user of the reference runs on its own data model: every asset's
    * parents/children/references EAN edge lists
    * (reference types.ts:7-9) flattened to (src, dst) pairs pointing up
    * the hierarchy (children inverted), then joined out to
    * [[ReachDepth]] hops with the MINIMUM depth kept. On the fixture
    * this surfaces service → container → pod → node/cluster chains that
    * exist in no single asset document. Each hop is one keyed
    * equi-join; the edge set is derived once from
    * [[Assets.assetsAll]]'s canonical '|'-joined edge scalars.
    */
  val ReachDepth = 3

  def assetReachability(spark: SparkSession, dir: String): DataFrame = {
    // memoized: the edge set re-derives the whole 4-pipeline assets_all
    // view, which every hop join would otherwise recompute — the same
    // build-once-per-session policy as the dedup/IVF/PQ artifacts
    val up = TextOps.memoized(spark, dir, "asset_up_edges") {
      val aa = Assets.assetsAll(spark, dir)
        .select(col("asset_ean"), col("asset_parents"),
          col("asset_children"), col("asset_references"))
      def nonEmpty(c: String) = col(c).isNotNull && col(c) =!= ""
      aa.where(nonEmpty("asset_parents"))
        .select(col("asset_ean").as("src"),
          explode(split(col("asset_parents"), "\\|")).as("dst"))
        .union(aa.where(nonEmpty("asset_children"))
          .select(explode(split(col("asset_children"), "\\|")).as("src"),
            col("asset_ean").as("dst")))
        .union(aa.where(nonEmpty("asset_references"))
          .select(col("asset_ean").as("src"),
            explode(split(col("asset_references"), "\\|")).as("dst")))
        .distinct()
    }
    val hops = Iterator.iterate(up.withColumn("depth", lit(1L))) { prev =>
      prev.alias("a").join(up.alias("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"),
          (col("a.depth") + 1L).as("depth"))
    }.take(ReachDepth).toSeq
    hops.reduce(_ unionAll _)
      .groupBy(col("src"), col("dst"))
      .agg(min(col("depth")).as("depth"))
      .select(col("src").as("asset_ean"), col("dst").as("reached_ean"),
        col("depth"))
  }

  /** Depth guard for [[assetClosure]]'s recursion — a correctness
    * backstop against cycles, far above the asset hierarchy's diameter.
    */
  val ClosureMaxDepth = 10

  /** Full transitive closure of the asset graph via Spark 4's
    * WITH RECURSIVE — the unbounded-depth complement to
    * [[assetReachability]]'s fixed hop unrolling: the recursion runs
    * until no new rows appear (or the depth guard trips), so it needs
    * no diameter assumption. Shares the memoized upward edge set; on
    * any graph with diameter ≤ [[ReachDepth]] the two queries agree
    * row-for-row (spec-asserted — a differential proof of both).
    */
  def assetClosure(spark: SparkSession, dir: String): DataFrame = {
    assetReachability(spark, dir) // ensures the memoized edge set exists
    TextOps.memoized(spark, dir, "asset_up_edges") {
      sys.error("edge set must already be memoized")
    }.createOrReplaceTempView("graft_closure_edges")
    spark.sql(
      s"""WITH RECURSIVE reach(src, dst, depth) AS (
         |  SELECT src, dst, CAST(1 AS BIGINT) FROM graft_closure_edges
         |  UNION ALL
         |  SELECT r.src, e.dst, r.depth + 1
         |  FROM reach r JOIN graft_closure_edges e ON r.dst = e.src
         |  WHERE r.depth < $ClosureMaxDepth
         |)
         |SELECT src AS asset_ean, dst AS reached_ean,
         |  CAST(min(depth) AS BIGINT) AS depth
         |FROM reach GROUP BY src, dst""".stripMargin)
  }

  /** Weighted PageRank over the trade graph, [[PrRounds]] fixed
    * iterations on the integer grid:
    * `pr'(v) = 0.15·S + Σ_{u→v} ⌊pr(u)·85·w(u,v) / (100·wout(u))⌋`.
    * Every iteration is a broadcast join of ranks onto edges plus one
    * partial-aggregated groupBy(dst) — at scale ranks are the small
    * side only when nodes ≪ edges (true for nation graphs; a web-scale
    * graph would make the rank join a keyed shuffle instead, same
    * plan shape minus the broadcast hint).
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextOps.memoized(spark, dir, "trade_edges") {
      val e = tradeEdges(spark, dir)
      val wout = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
      e.join(wout, Seq("src"))
    }
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val base = PrScale * (PrDampDen - PrDampNum) / PrDampDen
    var pr = nodes.withColumn("pr", lit(PrScale))
    for (_ <- 1 to PrRounds) {
      val contrib = edges
        .join(broadcast(pr), col("src") === col("node"))
        .select(col("dst"),
          expr(s"(pr * $PrDampNum * w) div ($PrDampDen * wout)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      pr = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("contrib"), lit(0L))).as("pr"))
        // lineage cut per round (same device as propagateToFixpoint):
        // without it round R replans an R-deep join stack and the loop
        // pays quadratic planning time — measured 5.0s → the data work
        // itself is one tiny join+agg per round
        .localCheckpoint()
    }
    pr
  }
}
