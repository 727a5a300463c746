package graft

import org.apache.spark.sql.functions._

import graft.operators.Assets
import graft.sources.{AssetSchema, AssetSink, SourceRegistry}

/** Source registry, multi-path union, fixed asset schema, and sink. */
class SourcesSpec extends SparkSpec {

  test("registry resolves names and fails fast on unknown ones") {
    val reg = SourceRegistry.forDir(sfDir)
    assert(reg.resolve("signals_all").paths.length === 2)
    val e = intercept[IllegalArgumentException](reg.resolve("nope"))
    assert(e.getMessage.contains("signals_apm"))
  }

  test("multi-path pod collection is idempotent over overlapping sources") {
    val single = Assets.podsCollapse(spark, sfDir).collect().toSet
    val multi = Assets.podsMultiSource(spark, sfDir).collect().toSet
    assert(multi === single)
    assert(multi.nonEmpty)
  }

  test("conform produces the fixed schema regardless of input pipeline") {
    for (df <- Seq(
        Assets.servicesCollapse(spark, sfDir),
        Assets.containerGraph(spark, sfDir),
        Assets.podsCollapse(spark, sfDir),
        Assets.nodeGraph(spark, sfDir))) {
      val c = AssetSchema.conform(df)
      assert(c.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
        AssetSchema.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    }
  }

  test("conform rejects outputs missing required columns") {
    val e = intercept[IllegalArgumentException](
      AssetSchema.conform(Assets.servicesCollapse(spark, sfDir).drop("asset_ean")))
    assert(e.getMessage.contains("asset_ean"))
  }

  test("assetsAll rows = sum of the four pipelines; typed Dataset[Asset] works") {
    val all = Assets.assetsAll(spark, sfDir)
    val expected = Seq(
      Assets.servicesCollapse(spark, sfDir),
      Assets.containerGraph(spark, sfDir),
      Assets.podsCollapse(spark, sfDir),
      Assets.nodeGraph(spark, sfDir)).map(_.count()).sum
    assert(all.count() === expected)
    val ds = AssetSchema.asDataset(spark, all)
    assert(ds.filter(_.asset_ean.nonEmpty).count() === expected)
  }

  test("AssetSink writes asset_type-partitioned parquet readable at the fixed schema") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/assets"
    AssetSink.write(Assets.assetsAll(spark, sfDir), out)
    val back = spark.read.parquet(out)
    assert(back.count() === Assets.assetsAll(spark, sfDir).count())
    // partition pruning by asset_type hits the directory layout
    assert(back.where(col("asset_type") === "service").count() ===
      Assets.servicesCollapse(spark, sfDir).count())
    assert(back.columns.toSet === AssetSchema.schema.fieldNames.toSet)
  }

  test("AssetType ADT round-trips every emitted asset_type and EAN prefix") {
    import graft.sources.AssetType
    val types = Assets.assetsAll(spark, sfDir)
      .select("asset_type").distinct().collect().map(_.getString(0))
    assert(types.nonEmpty)
    types.foreach(t => assert(AssetType.fromString(t).isDefined, t))
    val eans = Assets.assetsAll(spark, sfDir)
      .select("asset_ean").collect().map(_.getString(0))
    eans.foreach(e => assert(AssetType.ofEan(e).isDefined, e))
    assert(AssetType.fromString("nope").isEmpty)
  }

  test("multi-valued unwrap: first tag or null on empty (P3 singleItem)") {
    val out = Assets.svcMultivalued(spark, sfDir)
    assert(out.where(col("n_tags") === 0 && col("primary_tag").isNotNull).count() === 0)
    assert(out.where(col("n_tags") > 0 && col("primary_tag").isNull).count() === 0)
    assert(out.where(col("n_tags") === 0).count() > 0) // empty case exercised
    assert(out.where(col("n_tags") === 2).count() > 0)
  }

  test("connector seam: a non-parquet format ref is a config entry, not a code change") {
    import graft.sources.SourceRef
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    spark.range(3).selectExpr("id", "concat('svc-', id) AS name")
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$dir/t.csv")
    val reg = SourceRegistry(
      SourceRef("t_csv", Seq(s"$dir/t.csv"), format = "csv",
        options = Map("header" -> "true", "inferSchema" -> "true")))
    val back = reg.read(spark, "t_csv")
    assert(back.count() === 3)
    assert(back.columns.toSet === Set("id", "name"))
    // an Elasticsearch-backed ref is the same shape with
    // format = "org.elasticsearch.spark.sql" — resolvable without code:
    val es = SourceRef("signals_es", Seq("assets-*"),
      format = "org.elasticsearch.spark.sql",
      options = Map("es.nodes" -> "example:9200"))
    assert(SourceRegistry(es).resolve("signals_es").format
      === "org.elasticsearch.spark.sql")
  }

  test("layout selection: ccs fans every source across two distinct dirs (ES_IS_CCS analog)") {
    val local = SourceRegistry.layout("local", "/a")
    assert(local.resolve("signals_apm").paths === Seq("/a/events.parquet"))
    val ccs = SourceRegistry.layout("ccs", "/a", "/b")
    assert(ccs.resolve("signals_apm").paths ===
      Seq("/a/events.parquet", "/b/events.parquet"))
    assert(ccs.resolve("documents").paths.toSet ===
      Set("/a/documents.parquet", "/b/documents.parquet"))
    intercept[IllegalArgumentException](SourceRegistry.layout("ccs", "/a"))
    val e = intercept[IllegalArgumentException](SourceRegistry.layout("nope", "/a"))
    assert(e.getMessage.contains("local"))
  }

  test("the sink write boundary caps string fields at the template's keyword limit") {
    import spark.implicits._
    val longId = "x" * 3000
    val df = Seq((java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        "service:" + longId, "service", longId))
      .toDF("asset_ts", "asset_ean", "asset_type", "asset_id")
    // conform (the oracle-checked query path) must NOT truncate —
    // a silent mid-EAN cut there would diverge from the DuckDB mirrors
    assert(AssetSchema.conform(df).collect()(0)
      .getAs[String]("asset_id").length === 3000)
    // the WRITE path applies ignore_above-1024: nothing lands that an
    // ES-backed sink couldn't index
    val out = java.nio.file.Files.createTempDirectory("graft-cap").toString + "/a"
    AssetSink.write(df, out)
    val row = spark.read.parquet(out).collect()(0)
    assert(row.getAs[String]("asset_id").length === AssetSchema.MaxKeywordLen)
    assert(row.getAs[String]("asset_ean").length === AssetSchema.MaxKeywordLen)
    assert(row.getAs[String]("asset_name") === null) // null survives the cap
  }

  test("selectFamily projects a wildcard column family (host.* analog) and prunes the scan") {
    import graft.sources.Tables
    val fam = Tables.selectFamily(Tables.signals(spark, sfDir), "event_id", "host_")
    assert(fam.columns.toSeq ===
      Seq("event_id", "host_name", "host_hostname", "host_aliases"))
    assert(fam.count() > 0)
    intercept[IllegalArgumentException](
      Tables.selectFamily(Tables.signals(spark, sfDir), "nope_"))
    // pruning: the optimized scan reads only the family's source columns
    val scanSchema = fam.queryExecution.executedPlan.collectLeaves()
      .map(_.schema.fieldNames.toSet).reduce(_ ++ _)
    assert(!scanSchema.contains("value"))
  }
}
