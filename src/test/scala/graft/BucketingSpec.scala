package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketed co-located join: pre-partitioning both sides on the join
  * key at WRITE time removes the join-time shuffle entirely — the
  * storage-layout lever for repeatedly-joined 100 TB fact tables.
  */
class BucketingSpec extends SparkSpec {

  test("matching bucket layouts join with zero exchanges") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS t_orders_bucketed")
    s.sql("DROP TABLE IF EXISTS t_customer_bucketed")
    Tables.orders(s, sfDir)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("t_orders_bucketed")
    Tables.customer(s, sfDir)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("t_customer_bucketed")

    // force the sort-merge path so the bucket layout (not a broadcast)
    // is what eliminates the exchanges
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("t_orders_bucketed")
        .join(s.table("t_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // the join itself must read buckets directly: no exchange may
      // partition on either join key (the groupBy exchange on
      // c_mktsegment is expected and fine)
      val joinKeyExchanges = plan.split("\n").count(l =>
        l.contains("Exchange hashpartitioning(o_custkey") ||
          l.contains("Exchange hashpartitioning(c_custkey"))
      assert(joinKeyExchanges === 0,
        s"expected bucket join without join-side shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"))
      assert(joined.agg(sum("n")).head().getLong(0) ===
        Tables.orders(s, sfDir).count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS t_orders_bucketed")
      s.sql("DROP TABLE IF EXISTS t_customer_bucketed")
    }
  }
}
