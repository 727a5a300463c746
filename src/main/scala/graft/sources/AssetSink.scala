package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, lit, substring}
import org.apache.spark.sql.types._

/** The `asset.type` literal union (`'service' | 'container' |
  * 'k8s.pod' | 'k8s.node'` plus the cluster EAN prefix — reference
  * usage sites lib/collectServices.ts:6-7, lib/collectPods.ts:6-7)
  * as a sealed ADT for the typed Dataset side (SURVEY.md §1.4).
  */
sealed abstract class AssetType(val name: String)
object AssetType {
  case object Service extends AssetType("service")
  case object Container extends AssetType("container")
  case object K8sPod extends AssetType("k8s.pod")
  case object K8sNode extends AssetType("k8s.node")
  case object K8sCluster extends AssetType("k8s.cluster")

  val all: Seq[AssetType] = Seq(Service, Container, K8sPod, K8sNode, K8sCluster)

  def fromString(s: String): Option[AssetType] = all.find(_.name == s)

  /** Type prefix of an EAN ("service:opbeans" → Service). */
  def ofEan(ean: String): Option[AssetType] =
    fromString(ean.takeWhile(_ != ':'))
}

/** Typed asset output document — `SimpleAsset<T>` (reference
  * types.ts:1-13) re-expressed for Spark: dotted ES keys become
  * snake_case columns; the graph-edge string arrays
  * (`asset.parents/children/references`, types.ts:7-9) are carried as
  * canonical sorted '|'-joined scalars (see Assets.edgeList).
  */
final case class Asset(
    asset_ts: java.sql.Timestamp,
    asset_ean: String,
    asset_type: String,
    asset_id: String,
    asset_name: Option[String],
    asset_parents: Option[String],
    asset_children: Option[String],
    asset_references: Option[String],
    service_environment: Option[String],
    cloud_provider: Option[String],
    orchestrator_cluster_name: Option[String])

/** Fixed output schema + write path — the Spark analog of the assets
  * index template and bulk sink (reference assets_index_template.ts:3-32:
  * `assets*` pattern, `subobjects:false` flat keys, dynamic
  * strings→keyword, `@timestamp:date`; sink method es_client.ts:29-31).
  * Where the template coerces dynamically, Spark is schema-first: every
  * asset pipeline is conformed to this StructType before writing, so
  * downstream readers see one stable shape regardless of which pipeline
  * produced the row.
  */
object AssetSchema {

  val schema: StructType = StructType(Seq(
    StructField("asset_ts", TimestampType, nullable = false),
    StructField("asset_ean", StringType, nullable = false),
    StructField("asset_type", StringType, nullable = false),
    StructField("asset_id", StringType, nullable = false),
    StructField("asset_name", StringType, nullable = true),
    StructField("asset_parents", StringType, nullable = true),
    StructField("asset_children", StringType, nullable = true),
    StructField("asset_references", StringType, nullable = true),
    StructField("service_environment", StringType, nullable = true),
    StructField("cloud_provider", StringType, nullable = true),
    StructField("orchestrator_cluster_name", StringType, nullable = true)))

  /** The reference template maps every dynamic string to `keyword`
    * with `ignore_above: 1024` (assets_index_template.ts:14-24): ES
    * refuses to INDEX longer values (they'd sit unsearchable in
    * `_source`). The parquet sink's analog is a write-boundary cap so
    * nothing lands that the ES-backed sink couldn't serve. The cap
    * lives in [[AssetSink.write]], NOT in [[conform]]: conform is also
    * the query-path normalizer whose outputs are oracle-checked, and a
    * silent mid-EAN truncation there would diverge from the untruncated
    * DuckDB mirrors on any >1024-char edge list.
    */
  val MaxKeywordLen = 1024

  /** String fields capped at the template's keyword limit — the
    * write-boundary step (see [[MaxKeywordLen]]).
    */
  def capKeywords(df: DataFrame): DataFrame =
    df.select(schema.fields.toSeq.map { f =>
      f.dataType match {
        case StringType => substring(col(f.name), 1, MaxKeywordLen).as(f.name)
        case _ => col(f.name)
      }
    }: _*)

  /** Project any asset-pipeline output onto the fixed schema: missing
    * optional columns become typed nulls, order is canonical, types are
    * cast. Fails fast if a REQUIRED column is absent.
    */
  def conform(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val required = Seq("asset_ts", "asset_ean", "asset_type", "asset_id")
    val missing = required.filterNot(present.contains)
    require(missing.isEmpty, s"asset output missing required columns: $missing")
    val cols: Seq[Column] = schema.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  def asDataset(spark: SparkSession, df: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    conform(df).as[Asset]
  }
}

/** Bulk write path (reference es_client.ts:29-31, intended call site
  * run.ts:15). Partitioned by asset_type — the analog of the `assets*`
  * index family — so per-type readers prune at the directory level.
  */
object AssetSink {
  def write(df: DataFrame, path: String): Unit =
    AssetSchema.capKeywords(AssetSchema.conform(df))
      .write.mode("append").partitionBy("asset_type").parquet(path)

  /** The ES `_bulk` WIRE FORMAT itself — the exact NDJSON body
    * `esClient.bulk` (es_client.ts:29-31) would put on the wire for the
    * reference's `// TBA` write step (run.ts:12-16): per asset one
    * action line `{"index":{"_index":…,"_id":<ean>}}` (the EAN is the
    * upsert identity — the same key the asset_upsert queries collapse
    * on) followed by the source document under the reference's OWN
    * field names (types.ts:1-13): dotted flat keys per the template's
    * `subobjects: false`, `@timestamp` as ISO-8601 UTC, and the graph
    * edges back as string ARRAYS (the '|'-joined scalars are this
    * library's internal canonical form; the wire format restores the
    * reference's `string[]`). Optional fields that are null are ABSENT
    * from the JSON, as an ES document would have them.
    *
    * Both lines are built with `to_json` (proper escaping) and emitted
    * via `explode` of a 2-element array, so the action line immediately
    * precedes its document within every partition — no shuffle sits
    * between the projection and the sink, which is what keeps the
    * pairing stable. At scale each written partition file is one valid
    * `_bulk` body (ES bulk requests are size-capped anyway, so the
    * file-per-partition split IS the request batching).
    */
  def toBulkNdjson(df: DataFrame, index: String = "assets"): DataFrame = {
    import org.apache.spark.sql.functions._
    val conformed = AssetSchema.capKeywords(AssetSchema.conform(df))
    def edges(c: String) =
      when(col(c).isNotNull && col(c) =!= "", split(col(c), "\\|"))
    val action = to_json(struct(
      struct(lit(index).as("_index"), col("asset_ean").as("_id")).as("index")))
    // date_format renders wall-clock in the SESSION timezone; the wire
    // format hardcodes the 'Z' suffix, so shift the instant to UTC
    // wall-clock first — without this the body is only honest when the
    // caller's session already runs spark.sql.session.timeZone=UTC
    // (true for this repo's entrypoints, not enforceable on external
    // callers). to_utc_timestamp is the identity under a UTC session.
    val sessionTz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val doc = to_json(struct(
      date_format(to_utc_timestamp(col("asset_ts"), sessionTz),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("@timestamp"),
      col("asset_ean").as("asset.ean"),
      col("asset_type").as("asset.type"),
      col("asset_id").as("asset.id"),
      col("asset_name").as("asset.name"),
      edges("asset_parents").as("asset.parents"),
      edges("asset_children").as("asset.children"),
      edges("asset_references").as("asset.references"),
      col("cloud_provider").as("cloud.provider"),
      col("orchestrator_cluster_name").as("orchestrator.cluster.name"),
      col("service_environment").as("service.environment")))
    conformed.select(explode(array(action, doc)).as("line"))
  }

  /** Write the `_bulk` NDJSON bodies as text files (one valid bulk body
    * per partition file).
    */
  def writeBulkNdjson(df: DataFrame, path: String, index: String = "assets"): Unit =
    toBulkNdjson(df, index).write.mode("append").text(path)

  /** The index-template request body the reference installs at client
    * creation (`putIndexTemplate(assetsIndexTemplateConfig)`,
    * es_client.ts:48; template assets_index_template.ts:3-32) — the
    * other half of the ES wire surface next to [[toBulkNdjson]]:
    * `assets*` pattern, `subobjects: false` (why the bulk docs carry
    * dotted FLAT keys), dynamic strings→keyword capped at
    * [[AssetSchema.MaxKeywordLen]] (the same constant the parquet write
    * boundary enforces — spec-asserted so the two can't drift), and
    * `@timestamp` as a date.
    */
  def indexTemplateJson: String =
    s"""{"name":"assets","index_patterns":["assets*"],"priority":100,""" +
      s""""template":{"settings":{},"mappings":{"subobjects":false,""" +
      s""""dynamic_templates":[{"strings_as_keywords":{"mapping":""" +
      s"""{"ignore_above":${AssetSchema.MaxKeywordLen},"type":"keyword"},""" +
      s""""match_mapping_type":"string"}}],""" +
      s""""properties":{"@timestamp":{"type":"date"}}}}}"""
}
