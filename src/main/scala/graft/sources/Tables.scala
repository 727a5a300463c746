package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source layer: named parquet tables + the "signal document" view.
  *
  * Mirrors the reference's source layer (SURVEY.md §2.1): the ES search
  * source with pushed-down projection (`_source:false` + `fields`,
  * reference lib/collectServicesFromSummaries.ts:23-28) becomes a plain
  * parquet scan — Catalyst's ColumnPruning + parquet predicate pushdown
  * subsume the hand-written pushdown. Multi-index selection
  * (reference constants.ts:1-21) becomes multi-path `spark.read.parquet`.
  *
  * Scale note: each loader is a bare scan — no caching, no collect — so
  * at 100 TB the only thing that matters is that filters/projections
  * stay above these scans in the plan and get pushed down (verified via
  * .explain in the test suite).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and convert to
    * micros — matching DuckDB's own ns→µs truncation, so the oracle sees
    * identical values. The conversion is a codegen'd projection on the
    * scan; pushdown on `ts` still works via the long column's row-group
    * stats before conversion is applied to surviving rows.
    */
  /** ns→µs conversion over an already-loaded raw events scan (used by
    * multi-path sources that assemble their own scan, see
    * [[SourceRegistry]]).
    */
  def eventsFrom(raw: DataFrame): DataFrame =
    raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsFrom(table(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** ECS-like signal view over the `events` table.
    *
    * The reference consumes observability signal documents with fields
    * `service.name`, `service.environment`, `container.id`,
    * `kubernetes.pod.uid`, `host.name`, `host.hostname`,
    * `kubernetes.node.name`, `cloud.provider`,
    * `orchestrator.cluster.name` (reference
    * lib/collectServicesFromSummaries.ts:186-197, lib/collectPods.ts:23-34).
    * The harness has no such table, so we derive those columns
    * deterministically from `events` (FIXTURES.md §3 mapping guidance:
    * event_type ≈ metricset.name, user_id ≈ entity key, props JSON for
    * parent fields). The same derivation is written in ANSI SQL at
    * [[graft.Oracle.signalsCte]] so DuckDB sees identical data.
    *
    * All derivations are pure per-row projections — no shuffle, fully
    * codegen'd, and cost nothing at 100 TB beyond the scan itself.
    */
  def signals(spark: SparkSession, dir: String): DataFrame =
    signalsFrom(events(spark, dir))

  /** Signal view over any events-shaped DataFrame (single- or
    * multi-path). The `service_tags` array mirrors the ES `fields` API
    * semantic that every field may arrive multi-valued (SURVEY.md P3,
    * reference lib/collectServicesFromSummaries.ts:114-119) — including
    * the empty-array case (k % 11).
    */
  def signalsFrom(e: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    e.select(
      col("event_id"),
      col("ts"),
      col("user_id"),
      col("event_type"),
      col("value"),
      k.as("k"),
      concat(lit("svc-"), (col("user_id") % 20).cast("string")).as("service_name"),
      when(col("user_id") % 2 === 0, lit("prod")).otherwise(lit("dev"))
        .as("service_environment"),
      when(k % 3 === 0, concat(lit("c-"), (k % 7).cast("string"))).as("container_id"),
      when(k % 2 === 1, concat(lit("p-"), (k % 5).cast("string")))
        .as("kubernetes_pod_uid"),
      when(k % 4 === 0, concat(lit("h-"), (k % 6).cast("string"))).as("host_name"),
      when(k % 9 =!= 8, concat(lit("hh-"), (k % 9).cast("string"))).as("host_hostname"),
      when(k % 5 =!= 2, concat(lit("n-"), (k % 4).cast("string")))
        .as("kubernetes_node_name"),
      when(k % 5 === 0, lit("aws")).as("cloud_provider"),
      when(k % 7 === 0, concat(lit("cl-"), (k % 2).cast("string")))
        .as("orchestrator_cluster_name"),
      when(k % 11 === 0, expr("CAST(array() AS array<string>)"))
        .otherwise(array(
          concat(lit("t-"), (k % 3).cast("string")),
          concat(lit("t-"), (k % 5).cast("string"))))
        .as("service_tags")
    )
  }

  /** Time-range filter relative to the dataset's own max timestamp — the
    * Spark form of the reference's ES date math `now-10m`/`now-1h`
    * (reference lib/collectServicesFromSummaries.ts:35,204;
    * lib/collectPods.ts:41). `now` is pinned to `max(ts)` so the query is
    * deterministic for the DuckDB oracle. The 1-row max aggregate is
    * broadcast — a 2-stage plan with no full shuffle, which holds at any
    * scale (the agg is partial→final over the scan's partitions).
    */
  def trailing(df: DataFrame, tsCol: String, interval: String): DataFrame = {
    val maxTs = df.agg(max(col(tsCol)).as("__window_max_ts"))
    df.crossJoin(broadcast(maxTs))
      .where(col(tsCol) >= col("__window_max_ts") - expr(s"INTERVAL $interval"))
      .drop("__window_max_ts")
  }
}
