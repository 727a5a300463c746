package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Assets
import graft.sources.{AssetSchema, AssetSink, EsShapedSink, EsShapedSource}

/** [[graft.sources.EsShapedSink]] — the connector's WRITE side: the
  * reference's bulk-upsert boundary (template bootstrap at writer
  * construction, EAN-keyed idempotent upsert, generation snapshots
  * behind an atomic pointer), spec-proven batch AND through
  * `foreachBatch` (the replay discipline at the writer).
  */
class EsShapedSinkSpec extends SparkSpec {

  private val fmt = classOf[EsShapedSource].getName

  private def tmp(): String =
    Files.createTempDirectory("es-sink").toString + "/index"

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("template bootstrap at writer construction (the es_client.ts:48 ordering)") {
    val path = tmp()
    import spark.implicits._
    EsShapedSink.publish(Seq((1L, "a")).toDF("id", "v"), path)
    val tplFile = new java.io.File(path, EsShapedSink.TemplateFile)
    assert(tplFile.exists(), "template must land with the first write")
    val tpl = new String(java.nio.file.Files.readAllBytes(tplFile.toPath))
    assert(tpl === AssetSink.indexTemplateJson)
    // the pointer names the live generation; staged dirs are invisible
    assert(new java.io.File(path, EsShapedSink.LatestPointer).exists())
    assert(EsShapedSink.read(spark, path).count() === 1L)
  }

  test("asset_upsert through the connector equals the engine's upsert result") {
    val sig = graft.sources.Tables.signals(spark, sfDir)
    val bound = graft.sources.Tables.maxBound(sig, "ts")
    val state = AssetSchema.conform(Assets.serviceAssetProjection(
      Assets.collapsedServiceSignalsFrom(sig, "21 DAY", bound), Assets.batchTs))
    val batch = AssetSchema.conform(Assets.serviceAssetProjection(
      Assets.collapsedServiceSignalsFrom(sig, "7 DAY", bound),
      lit(Assets.BatchTs2).cast("timestamp")))
    val path = tmp()
    EsShapedSink.publish(state, path)             // yesterday's bulk
    EsShapedSink.upsertInto(batch, path, "asset_ean") // today's bulk
    val viaConnector = EsShapedSink.read(spark, path)
    val engine = graft.SparkEntry.queries("asset_upsert")(spark, sfDir)
    // connector columns are all-nullable by wire contract; names/types
    // and every value must match the engine output exactly
    assert(viaConnector.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === engine.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(same(viaConnector, engine),
      "connector bulk-upsert state must equal the engine's asset_upsert")
    assert(viaConnector.count() > 0)
  }

  test("upsert replay is a state no-op (idempotence), and appends fail fast") {
    val sig = graft.sources.Tables.signals(spark, sfDir)
    val bound = graft.sources.Tables.maxBound(sig, "ts")
    val batch = AssetSchema.conform(Assets.serviceAssetProjection(
      Assets.collapsedServiceSignalsFrom(sig, "7 DAY", bound), Assets.batchTs))
    val path = tmp()
    EsShapedSink.upsertInto(batch, path, "asset_ean") // bootstrap upsert
    val once = EsShapedSink.read(spark, path).collect().toSet
    EsShapedSink.upsertInto(batch, path, "asset_ean") // the REPLAY
    val twice = EsShapedSink.read(spark, path).collect().toSet
    assert(once === twice, "replaying the same bulk must not change state")
    assert(once.nonEmpty)
    // a raw append into the non-empty index would shadow live docs
    val e = intercept[Exception] {
      batch.write.format(fmt).mode("append").save(path)
    }
    assert(e.getMessage.contains("es-shaped append") ||
      Option(e.getCause).exists(_.getMessage.contains("es-shaped append")),
      e.getMessage)
    // duplicate ids in one bulk have no deterministic last-wins order
    val dup = batch.limit(1).unionAll(batch.limit(1))
    val e2 = intercept[IllegalArgumentException] {
      EsShapedSink.upsertInto(dup, path, "asset_ean")
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
  }

  test("foreachBatch drives the upsert (streaming bulk with replay discipline)") {
    val srcDir = Files.createTempDirectory("es-sink-src").toString
    val sig = graft.sources.Tables.signals(spark, sfDir)
    val bound = graft.sources.Tables.maxBound(sig, "ts")
    val batch = AssetSchema.conform(Assets.serviceAssetProjection(
      Assets.collapsedServiceSignalsFrom(sig, "7 DAY", bound), Assets.batchTs))
    batch.write.parquet(s"$srcDir/assets")
    val path = tmp()
    def drain(): Unit = {
      val q = spark.readStream
        .schema(batch.schema).parquet(s"$srcDir/assets")
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          EsShapedSink.upsertInto(df, path, "asset_ean")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("es-sink-ckpt").toString)
        .start()
      q.awaitTermination(120000)
      ()
    }
    drain()
    val once = EsShapedSink.read(spark, path).collect().toSet
    drain() // fresh checkpoint: the whole source replays — same state
    val twice = EsShapedSink.read(spark, path).collect().toSet
    assert(once === twice)
    assert(once === batch.collect().toSet)
  }

  test("array columns survive the writer round-trip (wire arrays, not just reads)") {
    val path = tmp()
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    EsShapedSink.publish(embs, path)
    val back = EsShapedSink.read(spark, path)
    assert(back.schema === embs.schema)
    assert(same(back, embs))
    // and assets_all (the reference's own output shape) round-trips
    val assets = graft.SparkEntry.queries("assets_all")(spark, sfDir)
    val path2 = tmp()
    EsShapedSink.publish(assets, path2)
    assert(same(EsShapedSink.read(spark, path2), assets))
  }
}
