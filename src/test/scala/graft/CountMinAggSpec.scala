package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CountMinAgg

/** Count-Min sketch aggregate: exact-regime equality (what the q46
  * oracle relies on), the one-sided overcount guarantee in the
  * approximate regime, and bit-identical sketches across
  * partitionings (cell-wise addition commutes — the property MG only
  * has inside its exact regime).
  */
class CountMinAggSpec extends SparkSpec {

  private def estimates(df: DataFrame, depth: Int, width: Int,
      probes: Seq[Long]): Map[Long, Long] = {
    graft.plans.GraftExtensions.register(spark)
    val sk = df.agg(expr(s"cms_sketch(k, $depth, $width)").as("sk"))
    val p = {
      import spark.implicits._
      probes.toDF("k")
    }
    p.crossJoin(broadcast(sk))
      .select(col("k"),
        expr(CountMinAgg.lookupExpr("sk", "k", depth, width)).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def rawSketch(df: DataFrame, depth: Int, width: Int): Seq[Long] = {
    graft.plans.GraftExtensions.register(spark)
    df.agg(expr(s"cms_sketch(k, $depth, $width)").as("sk"))
      .select(explode(col("sk")).as("c")).collect().map(_.getLong(0)).toSeq
  }

  /** value v ∈ [1, 50] appears 40·v times, shuffled deterministically. */
  private def skewed: DataFrame = {
    import spark.implicits._
    val rows = for { v <- 1L to 50L; _ <- 1L to 40 * v } yield v
    val mixed = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003 }.map(_._1)
    mixed.toDF("k")
  }

  private val trueCounts: Map[Long, Long] = (1L to 50L).map(v => v -> 40 * v).toMap

  test("exact regime: width > key domain reproduces exact counts, 0 for absent") {
    val est = estimates(skewed, 4, 64, 0L to 60L)
    (1L to 50L).foreach(v => assert(est(v) === trueCounts(v), s"key $v"))
    (Seq(0L) ++ (51L to 60L)).foreach(v => assert(est(v) === 0L, s"absent key $v"))
  }

  test("estimates never undercount, in any width (one-sided guarantee)") {
    for (width <- Seq(8, 16, 64)) {
      val est = estimates(skewed, 4, width, 1L to 50L)
      trueCounts.foreach { case (k, c) =>
        assert(est(k) >= c, s"width $width undercounts key $k: ${est(k)} < $c")
      }
    }
  }

  test("sketch is bit-identical across partitionings (cell-wise merge commutes)") {
    for ((depth, width) <- Seq((4, 64), (3, 8))) {
      val base = rawSketch(skewed.repartition(1), depth, width)
      for (p <- Seq(3, 7, 13))
        assert(rawSketch(skewed.repartition(p), depth, width) === base,
          s"depth $depth width $width diverges at $p partitions")
    }
  }

  test("deeper sketches only tighten estimates (min over more rows)") {
    val wide = estimates(skewed, 1, 16, 1L to 50L)
    val deep = estimates(skewed, 4, 16, 1L to 50L)
    (1L to 50L).foreach(v => assert(deep(v) <= wide(v), s"key $v"))
  }

  test("q46 runs in the exact regime at every test scale factor") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val est = graft.operators.Relational.q46CmsCounts(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = graft.sources.Tables.events(spark, sf)
        .where(col("user_id").isNotNull).groupBy(col("user_id")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 200L).foreach { u =>
        assert(est(u) === exact.getOrElse(u, 0L), s"$sf user $u")
      }
    }
  }
}
