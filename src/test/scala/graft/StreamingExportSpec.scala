package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.streaming.StreamingExport

/** Incremental corpus export: the merged store's manifest and
  * attrition equal the batch pipeline's bit for bit over the ingested
  * corpus, under an uneven batch split; replay discipline holds in
  * both directions (same-id overwrite idempotent, fresh-id
  * double-counts — the counter-family algebra).
  */
class StreamingExportSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def manifestRows(df: DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def stageRows(df: DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("drained manifest + attrition ≡ batch corpus_export; replay discipline") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val srcDir = tmp("graft-export-src") + "/docs"
    val store = tmp("graft-export-store") + "/store"
    val ckpt = tmp("graft-export-ckpt")

    // the fixture arrives as two uneven drains (the second adds the
    // docs that re-canonicalize / re-cluster / contaminate the first)
    docs.where(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingExport.startExportIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)
    docs.where(col("doc_id") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingExport.startExportIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)

    val batchManifest = manifestRows(TextOps.corpusExport(spark, sfDir))
    val batchStages = stageRows(TextOps.corpusExportStages(spark, sfDir))
    assert(batchManifest.nonEmpty && batchStages.nonEmpty)
    assert(manifestRows(StreamingExport.globalExport(spark, store))
      === batchManifest, "drained manifest diverged from batch")
    assert(stageRows(StreamingExport.globalExportStages(spark, store))
      === batchStages, "drained attrition diverged from batch")

    // the public frame-level entry is the same chain: one definition
    assert(manifestRows(TextOps.corpusExportFrom(docs)) === batchManifest,
      "corpusExportFrom diverged from the (spark, dir) operator")

    // same-id replay (crash after store write, before checkpoint
    // commit): overwriting batch 0's own partitions changes nothing
    StreamingExport.writeBatch(docs.where(col("doc_id") % 3 === 0), 0L, store)
    assert(manifestRows(StreamingExport.globalExport(spark, store))
      === batchManifest, "same-id replay changed the manifest")

    // fresh-id replay double-counts: the corpus stage sees the
    // duplicated docs (overwrite-own-batchId is load-bearing)
    val nDocs = docs.count()
    StreamingExport.writeBatch(docs.where(col("doc_id") % 3 === 0), 99L, store)
    val corpusIn = StreamingExport.globalExportStages(spark, store)
      .where(col("stage") === "quality").select(col("docs_in"))
      .collect().head.getLong(0)
    assert(corpusIn === nDocs + docs.where(col("doc_id") % 3 === 0).count(),
      s"fresh-id replay must double-count (corpus stage saw $corpusIn)")
  }

  test("a later batch revokes earlier survivors (global stages re-decide)") {
    val s = spark; import s.implicits._
    def df(rows: Seq[(Long, String)]) =
      rows.map { case (i, t) => (i, t, "en", "src_0000000" + (i % 2), t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val store = tmp("graft-export-revoke") + "/store"
    // batch 0: doc 20 passes quality (40 distinct words) and is its
    // content's canonical copy
    val longText = (1 to 40).map(i => s"w$i").mkString(" ")
    StreamingExport.writeBatch(df(Seq((20L, longText))), 0L, store)
    val before = StreamingExport.storedStages(spark, store)
      .last._2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(before.contains(20L), s"doc 20 must survive alone: $before")
    // batch 1: the SAME text under a smaller doc_id steals the
    // canonical crown — doc 20 must drop out of the export without
    // batch 0 ever being rewritten
    StreamingExport.writeBatch(df(Seq((6L, longText))), 1L, store)
    val after = StreamingExport.storedStages(spark, store)
      .last._2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!after.contains(20L) && after.contains(6L),
      s"new smaller-id copy must re-canonicalize doc 20 away: $after")
  }
}
