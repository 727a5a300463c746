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

  test("upsert is an O(batch) delta append; compaction folds the chain") {
    val path = tmp()
    import spark.implicits._
    val conf = graft.sources.EsShaped.sessionConf()
    def chain() = graft.sources.EsShaped.liveGenerations(path, conf)._1
    def genDirs() = Option(new java.io.File(path).listFiles())
      .map(_.toSeq.filter(f => f.isDirectory && f.getName.startsWith("gen-")))
      .getOrElse(Nil)
    def dirBytes(g: Int) = Option(new java.io.File(path,
      s"gen-$g").listFiles()).map(_.map(_.length()).sum).getOrElse(0L)
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    EsShapedSink.publish(base, path)
    assert(chain().size === 1)
    val baseGen = chain().head
    // MaxDeltaSlices upserts: each lands as ONE delta slice of exactly
    // the batch's rows — never a state rewrite
    (1 to EsShapedSink.MaxDeltaSlices).foreach { k =>
      val batch = Seq((k.toLong, s"new$k"), (100L + k, s"add$k"))
        .toDF("id", "v")
      EsShapedSink.upsertInto(batch, path, "id")
      assert(chain().size === 1 + k, s"after upsert $k")
      val deltaGen = chain().last
      assert(spark.read.format(fmt).load(s"$path/gen-$deltaGen").count() === 2L,
        "a delta slice holds the batch rows only")
      assert(dirBytes(deltaGen) < dirBytes(baseGen),
        "delta write I/O must be O(batch), not O(state)")
    }
    // the collapsed read: replaced ids take the newest slice, adds land
    val expect = (1 to EsShapedSink.MaxDeltaSlices).flatMap(k =>
      Seq((k.toLong, s"new$k"), (100L + k, s"add$k"))) ++
      ((EsShapedSink.MaxDeltaSlices + 1) to 100).map(i => (i.toLong, s"v$i"))
    assert(EsShapedSink.read(spark, path).as[(Long, String)].collect().toSet
      === expect.toSet)
    // one more upsert breaches the slice budget → compaction: a single
    // base generation again, unreferenced slices vacuumed
    EsShapedSink.upsertInto(Seq((200L, "tail")).toDF("id", "v"), path, "id")
    assert(chain().size === 1)
    assert(genDirs().size === 1, "vacuum must drop compacted-away slices")
    assert(EsShapedSink.read(spark, path).count() === 105L)
    assert(!new java.io.File(path, "_latest.tmp").exists())
    // a null id can never be replaced on a later upsert — fail fast
    val e = intercept[IllegalArgumentException] {
      EsShapedSink.upsertInto(Seq((Option.empty[java.lang.Long], "x"))
        .toDF("id", "v"), path, "id")
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("commit publishes only committed task files (orphans are dropped)") {
    // the commit-side prune seam: a task attempt that died WITHOUT
    // abort() (executor crash, retry under a new taskId) leaves an
    // orphan part file next to the retried attempt's committed one —
    // commit() must publish only the files its commit messages name
    val conf = graft.sources.EsShaped.sessionConf()
    val stage = java.nio.file.Files.createTempDirectory("es-stage")
    val committed = stage.resolve("part-00003-58.parquet")
    val orphan = stage.resolve("part-00003-57.parquet")
    java.nio.file.Files.write(committed, "good".getBytes)
    java.nio.file.Files.write(orphan, "junk".getBytes)
    graft.sources.EsShaped.pruneStage(
      new org.apache.hadoop.fs.Path(stage.toString),
      Set("part-00003-58.parquet"), conf)
    assert(java.nio.file.Files.exists(committed))
    assert(!java.nio.file.Files.exists(orphan),
      "an uncommitted part file must not be published with the generation")
    // and a zero-writer commit still yields a valid (empty) snapshot dir
    val empty = new org.apache.hadoop.fs.Path(stage.toString, "gen-9")
    graft.sources.EsShaped.pruneStage(empty, Set.empty, conf)
    assert(new java.io.File(stage.toFile, "gen-9").isDirectory)
  }

  test("the generation log is a streaming SOURCE (readStream over published slices)") {
    val path = tmp()
    import spark.implicits._
    EsShapedSink.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ckpt = Files.createTempDirectory("es-src-ckpt").toString
    def drain(): Unit = {
      val q = spark.readStream.format(fmt).load(path)
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          got.synchronized { got ++= df.as[(Long, String)].collect() }; ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination(120000)
      ()
    }
    drain()
    assert(got.toSet === Set((1L, "a"), (2L, "b")),
      "the base snapshot is the stream's first slice")
    EsShapedSink.upsertInto(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"),
      path, "id")
    drain() // SAME checkpoint: only the newly published slice arrives
    assert(got.size === 4,
      "a resumed drain must read the delta slice only, never re-read the base")
    assert(got.toSet === Set((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c")),
      "the stream is the segment log: replaced ids appear once per slice")
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
