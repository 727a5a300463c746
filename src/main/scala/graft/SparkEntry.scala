package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Assets

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a scale-factor directory; `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL for the driver's differential check.
  * Column names are aligned between both sides (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The two-phase collectServicesFromSummaries pipeline (SURVEY.md §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    Assets.servicesFromSummaries(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference-parity asset pipelines (SURVEY.md §3)
    "svc_summaries"   -> ((s, d) => Assets.servicesFromSummaries(s, d)),
    "svc_latest"      -> ((s, d) => Assets.servicesLatest(s, d)),
    "svc_collapse"    -> ((s, d) => Assets.servicesCollapse(s, d)),
    "container_graph" -> ((s, d) => Assets.containerGraph(s, d)),
    "pods_collapse"   -> ((s, d) => Assets.podsCollapse(s, d)),
    "node_graph"      -> ((s, d) => Assets.nodeGraph(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "svc_summaries"   -> OracleAssets.svcSummaries,
    "svc_latest"      -> OracleAssets.svcLatest,
    "svc_collapse"    -> OracleAssets.svcCollapse,
    "container_graph" -> OracleAssets.containerGraph,
    "pods_collapse"   -> OracleAssets.podsCollapse,
    "node_graph"      -> OracleAssets.nodeGraph,
  )
}
