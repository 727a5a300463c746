package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Temporal-join semantics on the sf0.001 fixture. */
class RelationalSpec extends SparkSpec {

  test("asof join: matched view is the latest at-or-before the purchase") {
    val out = Relational.q28AsofJoin(spark, sfDir)
    assert(out.count() > 0)
    // every matched view is not in the future
    assert(out.where(col("asof_view_ts") > col("ts")).count() === 0)
    // a purchase with NO prior-or-equal view must be null-matched
    val ev = graft.sources.Tables.events(spark, sfDir)
    val firstView = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("first_view_ts"))
    val j = out.join(firstView, Seq("user_id"), "left")
    assert(j.where(col("asof_view_ts").isNull &&
      col("first_view_ts").isNotNull && col("first_view_ts") <= col("ts"))
      .count() === 0)
    assert(j.where(col("asof_view_ts").isNotNull &&
      (col("first_view_ts").isNull || col("first_view_ts") > col("ts")))
      .count() === 0)
  }

  test("asof join: no view after the match but at-or-before the purchase") {
    val out = Relational.q28AsofJoin(spark, sfDir)
      .where(col("asof_view_ts").isNotNull)
    val views = graft.sources.Tables.events(spark, sfDir)
      .where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    // there is no view strictly between the matched one and the purchase
    val gap = out.join(views, Seq("user_id"))
      .where(col("vts") > col("asof_view_ts") && col("vts") <= col("ts"))
    assert(gap.count() === 0)
  }

  test("range join keeps zero-activity purchases with count 0 and null sum") {
    val out = Relational.q29RangeJoin(spark, sfDir)
    val purchases = graft.sources.Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
    assert(out.count() === purchases.count())
    val zeros = out.where(col("n_prior_views") === 0)
    assert(zeros.where(col("prior_view_value").isNotNull).count() === 0)
  }
}
