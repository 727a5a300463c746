package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** The native bounded-heap top-k aggregate: equivalence with the
  * sort-based reference under any partitioning, tie handling, and the
  * analysis-time contracts.
  */
class TopKBySimSpec extends SparkSpec {

  private def viaAgg(rows: Seq[(Long, Long, Double)], k: Int, parts: Int): Map[Long, Seq[(Long, Double)]] = {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    spark.createDataset(rows).toDF("grp", "id", "sim")
      .repartition(parts)
      .groupBy(col("grp"))
      .agg(expr(s"topk_by_sim(id, sim, $k)").as("tk"))
      .select(col("grp"), col("tk"))
      .collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getDouble(1))).toSeq
      }.toMap
  }

  private def reference(rows: Seq[(Long, Long, Double)], k: Int): Map[Long, Seq[(Long, Double)]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3))
        .sortBy { case (id, sim) => (-sim, id) }.take(k).toSeq
    }

  test("equals the sort-based top-k on seeded random data at every partitioning") {
    val rnd = new scala.util.Random(42)
    // duplicated sims force tie-breaks; duplicated (id, sim) pairs force
    // the interchangeable-entries case
    val rows = Seq.tabulate(2000) { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(300).toLong,
        (rnd.nextInt(50) / 10.0))
    }
    val want = reference(rows, 10)
    for (parts <- Seq(1, 3, 32)) {
      val got = viaAgg(rows, 10, parts)
      assert(got.keySet === want.keySet)
      // sims and order must agree exactly; ids agree except where an
      // identical (sim, id) duplicate is interchangeable — (sim DESC,
      // id ASC) is a total order over distinct pairs, so full equality
      // holds on the deduplicated view
      got.foreach { case (g, seq) =>
        assert(seq === want(g), s"group $g at parts=$parts")
      }
    }
  }

  test("k larger than the group returns the whole group, ordered") {
    val rows = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9))
    val got = viaAgg(rows, 100, 2)
    assert(got(1L) === Seq((11L, 0.9), (12L, 0.9), (10L, 0.5)))
  }

  test("rejects non-literal k and wrong argument types at analysis time") {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    val df = Seq((1L, 1L, 0.5)).toDF("grp", "id", "sim")
    intercept[Exception] {
      df.groupBy(col("grp")).agg(expr("topk_by_sim(id, sim, id)")).collect()
    }
    intercept[Exception] {
      df.groupBy(col("grp")).agg(expr("topk_by_sim(sim, sim, 5)")).collect()
    }
  }
}
