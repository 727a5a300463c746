package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters aggregate: exact-regime equality (what the
  * q44 oracle relies on), the classic frequency bound in the
  * approximate regime, and partitioning-invariance where the contract
  * promises it.
  */
class MisraGriesAggSpec extends SparkSpec {

  private def sketch(df: DataFrame, capacity: Int): Map[Long, Long] = {
    graft.plans.GraftExtensions.register(spark)
    df.agg(expr(s"misra_gries(k, $capacity)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
  private val n: Long = trueCounts.values.sum

  test("exact regime: capacity >= distinct keys reproduces exact counts") {
    assert(sketch(skewed, 64) === trueCounts)
  }

  test("exact regime is partitioning-invariant") {
    val base = sketch(skewed.repartition(1), 64)
    for (p <- Seq(3, 7, 13))
      assert(sketch(skewed.repartition(p), 64) === base)
  }

  test("approximate regime: MG frequency bound holds under partial aggregation") {
    for (p <- Seq(1, 4, 11); k <- Seq(8, 16)) {
      val est = sketch(skewed.repartition(p), k)
      assert(est.size <= k)
      val err = n / (k + 1)
      est.foreach { case (item, c) =>
        val truth = trueCounts(item)
        assert(c <= truth, s"k=$k p=$p item=$item overestimates: $c > $truth")
        assert(truth - c <= err,
          s"k=$k p=$p item=$item error ${truth - c} exceeds n/(k+1)=$err")
      }
      // every sufficiently heavy item must be retained
      trueCounts.filter(_._2 > err).keys.foreach(item =>
        assert(est.contains(item), s"k=$k p=$p heavy item $item missing"))
    }
  }

  test("nulls are ignored, empty input yields an empty summary") {
    import spark.implicits._
    val withNulls = Seq[Option[Long]](Some(1L), None, Some(1L), None)
      .toDF("k")
    assert(sketch(withNulls, 4) === Map(1L -> 2L))
    assert(sketch(Seq.empty[Long].toDF("k"), 4) === Map.empty)
  }

  test("q44 runs in the exact regime at every test scale factor") {
    // the oracle is a plain GROUP BY — only valid while distinct
    // user_id stays under the registered capacity (4096); probe the
    // largest local fixture so a testdata regen that breaks the
    // premise fails here, not in the driver
    val distinct = graft.sources.Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(distinct <= 4096, s"fixture distinct users $distinct exceeds capacity")
  }
}
