package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named source registry — the Spark analog of the reference's
  * dual-cluster client plus config-driven cluster map
  * (reference lib/es_client.ts:12-32; run.ts:28-39 validates `--read`/
  * `--write` names against `config.clusters`). A [[SourceRef]] names one
  * or MORE paths: multi-path refs are the reference's comma-separated
  * index patterns (`constants.ts:1-5`), e.g. `collectPods` reading the
  * union of logs and APM indices (`lib/collectPods.ts:13`).
  *
  * Scale note: a multi-path read is a single partitioned scan over the
  * union of the files — Spark lists all paths into one FileScan, so
  * filters/pruning push into every path; no per-path driver loop.
  */
final case class SourceRef(name: String, paths: Seq[String]) {
  require(paths.nonEmpty, s"source '$name' has no paths")
}

final class SourceRegistry(sources: Map[String, SourceRef]) {

  /** Resolve by name; unknown names fail fast listing valid ones,
    * mirroring run.ts:28-34.
    */
  def resolve(name: String): SourceRef =
    sources.getOrElse(name, throw new IllegalArgumentException(
      s"unknown source '$name'; valid sources: ${sources.keys.toSeq.sorted.mkString(", ")}"))

  def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(resolve(name).paths: _*)

  def names: Seq[String] = sources.keys.toSeq.sorted
}

object SourceRegistry {

  def apply(refs: SourceRef*): SourceRegistry =
    new SourceRegistry(refs.map(r => r.name -> r).toMap)

  /** Default layout over a scale-factor dir. `signals_apm` and
    * `signals_logs` both resolve to the fixture's single physical
    * signal stream (the harness ships one events table), exactly as
    * the reference's `apm*` and `logs-*` patterns address overlapping
    * document streams; `signals_all` is their union — the
    * `collectPods` read shape.
    */
  def forDir(dir: String): SourceRegistry = SourceRegistry(
    SourceRef("signals_apm", Seq(s"$dir/events.parquet")),
    SourceRef("signals_logs", Seq(s"$dir/events.parquet")),
    SourceRef("signals_all", Seq(s"$dir/events.parquet", s"$dir/events.parquet")),
    SourceRef("documents", Seq(s"$dir/documents.parquet")),
    SourceRef("embeddings", Seq(s"$dir/embeddings.parquet"))
  )
}
