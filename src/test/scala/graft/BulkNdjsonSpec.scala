package graft

import org.apache.spark.sql.functions._

import graft.operators.Assets
import graft.sources.AssetSink

/** The ES `_bulk` wire format (AssetSink.toBulkNdjson): alternating
  * action/document lines, reference field names (types.ts:1-13), EAN
  * as the upsert `_id`, edge arrays restored from the canonical
  * '|'-joined scalars, null optionals absent.
  */
class BulkNdjsonSpec extends SparkSpec {

  test("bulk NDJSON: action/doc pairing, reference field names, value round-trip") {
    val assets = Assets.assetsAll(spark, sfDir)
    val lines = AssetSink.toBulkNdjson(assets).collect().map(_.getString(0))
    val n = assets.count()
    assert(lines.length.toLong === 2 * n)

    // alternating structure: even lines are index actions, odd are docs
    val (actions, docs) = lines.zipWithIndex.partition(_._2 % 2 == 0)
    assert(actions.forall(_._1.startsWith("""{"index":{"_index":"assets","_id":""")))
    assert(docs.forall(!_._1.contains(""""_index"""")))

    // each action's _id is the EAN of the doc that follows it
    val s = spark; import s.implicits._
    val actDf = spark.read.json(actions.map(_._1).toSeq.toDS())
    val docDf = spark.read.json(docs.map(_._1).toSeq.toDS())
    val ids = actDf.select(col("index._id")).collect().map(_.getString(0))
    val eans = docDf.select(col("`asset.ean`")).collect().map(_.getString(0))
    assert(ids.toSeq === eans.toSeq)

    // document keys are exactly the reference's SimpleAsset fields
    // (types.ts:1-13) — nothing internal leaks onto the wire
    val allowed = Set("@timestamp", "asset.ean", "asset.type", "asset.id",
      "asset.name", "asset.parents", "asset.children", "asset.references",
      "cloud.provider", "orchestrator.cluster.name", "service.environment")
    assert(docDf.columns.toSet.subsetOf(allowed),
      s"unexpected wire fields: ${docDf.columns.toSet -- allowed}")

    // @timestamp is ISO-8601 UTC
    val tsRe = """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z"""
    docDf.select(col("`@timestamp`")).collect()
      .foreach(r => assert(r.getString(0).matches(tsRe), r.getString(0)))

    // edge arrays round-trip the '|'-joined scalars, and a null scalar
    // means the key is ABSENT from the JSON line (ES-document shape)
    val srcEdges = assets
      .select(col("asset_ean"), col("asset_parents")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1)).filter(_.nonEmpty)).toMap
    val docLines = docs.map(_._1)
    val parentsBack = docDf
      .select(col("`asset.ean`"), col("`asset.parents`")).collect()
      .map(r => r.getString(0) ->
        Option(r.getSeq[String](1)).map(_.mkString("|"))).toMap
    srcEdges.foreach { case (ean, want) =>
      assert(parentsBack(ean) === want, s"edge mismatch for $ean")
      if (want.isEmpty)
        assert(!docLines.find(_.contains(s""""asset.ean":"$ean"""")).get
          .contains("asset.parents"))
    }
  }

  test("index template body mirrors the reference's config and the write-boundary cap") {
    val s = spark; import s.implicits._
    val t = spark.read.json(Seq(AssetSink.indexTemplateJson).toDS())
    assert(t.select(col("name")).head().getString(0) === "assets")
    assert(t.select(col("index_patterns")).head().getSeq[String](0) === Seq("assets*"))
    assert(t.select(col("priority")).head().getLong(0) === 100L)
    assert(t.select(col("template.mappings.subobjects")).head().getBoolean(0) === false)
    assert(t.select(col("`template`.`mappings`.`properties`.`@timestamp`.`type`"))
      .head().getString(0) === "date")
    // the template's keyword cap IS the parquet write boundary's cap —
    // one constant, so the two sinks cannot drift apart
    val cap = t.select(
      col("template.mappings.dynamic_templates")(0)
        .getField("strings_as_keywords").getField("mapping")
        .getField("ignore_above")).head().getLong(0)
    assert(cap === graft.sources.AssetSchema.MaxKeywordLen.toLong)
  }

  test("writeBulkNdjson lands text files whose lines reparse as the same stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bulk").toString + "/out"
    val assets = Assets.assetsAll(spark, sfDir)
    AssetSink.writeBulkNdjson(assets, dir)
    val back = spark.read.text(dir).count()
    assert(back === 2 * assets.count())
  }
}
