package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps
import graft.streaming.StreamingMedia

/** Incremental media dedup state: the merged fingerprint store
  * answers both dedup reads bit-identically to the batch operators
  * over the ingested corpus, under an uneven batch split; counter
  * replay discipline holds in both directions.
  */
class StreamingMediaSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def exactRows(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def nearRows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("drained fingerprints answer exact and near dedup ≡ batch; replay discipline") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val srcDir = tmp("graft-media-src") + "/docs"
    val store = tmp("graft-media-store") + "/store"
    val ckpt = tmp("graft-media-ckpt")

    docs.where(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingMedia.startMediaIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)
    docs.where(col("doc_id") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingMedia.startMediaIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)

    val batchExact = exactRows(MultimodalOps.mediaDedupExact(spark, sfDir))
    val batchNear = nearRows(MultimodalOps.mediaDedupNear(spark, sfDir))
    assert(batchExact.nonEmpty && batchNear.nonEmpty)
    assert(exactRows(StreamingMedia.globalDedupExact(spark, store))
      === batchExact, "drained exact dedup diverged from batch")
    assert(nearRows(StreamingMedia.globalDedupNear(spark, store))
      === batchNear, "drained near dedup diverged from batch")

    // same-id replay is a no-op; a fresh id double-counts copies
    StreamingMedia.writeBatch(docs.where(col("doc_id") % 3 === 0), 0L, store)
    assert(exactRows(StreamingMedia.globalDedupExact(spark, store))
      === batchExact, "same-id replay changed the exact groups")
    StreamingMedia.writeBatch(docs.where(col("doc_id") % 3 === 0), 99L, store)
    val inflated = StreamingMedia.globalDedupExact(spark, store)
      .agg(sum(col("n_copies"))).collect().head.getLong(0)
    val sliceN = docs.where(col("doc_id") % 3 === 0).count()
    assert(inflated === docs.count() + sliceN,
      s"fresh-id replay must double-count the slice's copies: $inflated")
  }
}
