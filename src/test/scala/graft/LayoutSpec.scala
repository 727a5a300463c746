package graft

import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Storage-layout operators: read-side plan shape (the whole point of
  * the layouts) plus result equivalence against the layout-free form.
  */
class LayoutSpec extends SparkSpec {

  test("q45: co-bucketed join plans with zero join-side exchanges") {
    val df = Layout.q45BucketedJoin(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("Bucketed: true"), plan.take(2000))
    val joinKeyExchanges = plan.split("\n").count(l =>
      l.contains("Exchange hashpartitioning(o_orderkey") ||
        l.contains("Exchange hashpartitioning(l_orderkey"))
    assert(joinKeyExchanges === 0,
      s"bucket layout should remove join-side shuffles:\n$plan")
  }

  test("q45: bucketed result equals the layout-free join") {
    val bucketed = Layout.q45BucketedJoin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("lines"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(bucketed === plain)
  }

  test("evt_partition_pruned: the date window binds as a partition filter") {
    val df = Layout.evtPartitionPruned(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      plan.take(2000))
    assert(plan.contains("event_date"), plan.take(2000))
    // the window predicate must NOT appear as a post-scan data filter:
    // partition pruning happens at file listing, before any row is read
    assert(!plan.contains("PushedFilters: [IsNotNull(event_date"),
      s"event_date should be a partition column, not a data column:\n$plan")
  }

  test("evt_partition_pruned: scan reads only the 7 in-window day directories") {
    // input_file_name() sees the files the PRUNED scan actually reads
    // (Dataset.inputFiles would report the relation's full listing)
    val (path, schema) = Layout.partitionedEvents(spark, sfDir)
    val days = spark.read.schema(schema).parquet(path)
      .where(col("event_date").between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .select(input_file_name().as("f")).distinct().collect()
      .flatMap(_.getString(0).split("/").find(_.startsWith("event_date=")))
      .toSet
    assert(days.size === 7, days.mkString(", "))
    assert(days.forall { d =>
      val day = d.stripPrefix("event_date=")
      day >= "2024-01-08" && day <= "2024-01-14"
    }, days.mkString(", "))
  }

  test("evt_partition_pruned: result equals the unpartitioned predicate") {
    val pruned = Layout.evtPartitionPruned(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val plain = Tables.events(spark, sfDir)
      .where(to_date(col("ts")).between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(pruned === plain && pruned.nonEmpty)
  }
}
