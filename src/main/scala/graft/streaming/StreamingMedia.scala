package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.MultimodalOps

/** Incremental MEDIA dedup state — the streaming twin of the
  * multimodal dedup pair ([[MultimodalOps.mediaDedupExact]] /
  * [[MultimodalOps.mediaDedupNear]]), closing the last operator
  * family without one: media items arrive in micro-batches, each
  * batch reduces to its per-item FINGERPRINT slice — content digest
  * plus the frame-digest MinHash signature, both per-item derivations
  * computed through the batch seams ([[MultimodalOps.mediaFrom]] →
  * [[MultimodalOps.mediaFrameSigsFrom]]) — and the payload bytes are
  * never stored and never rescanned (the [[StreamingCorpus]]
  * economics: the fingerprint store is orders smaller than the
  * media).
  *
  * Read sides re-derive the batch answers from the merged slices
  * through the same shared definitions: exact-dup groups are a
  * digest groupBy over the union (a later batch with a smaller id
  * re-canonicalizes), near-dup candidates are the banded signature
  * pairs ([[MultimodalOps.mediaNearPairsFrom]]) — both bit-identical
  * to the batch operators over the ingested corpus under any split.
  *
  * Merge algebra: slices are DISJOINT by construction (an item lives
  * in exactly one batch) and exact-dup copy counts are row counts,
  * so this is a COUNTER-family store — overwrite-own-batchId is
  * load-bearing; same-id replay rewrites identical rows, fresh-id
  * replay double-counts copies (spec proves both directions).
  */
object StreamingMedia {

  /** One micro-batch reduced to its fingerprint slice. */
  private[graft] def writeBatch(batch: DataFrame, batchId: Long,
      storePath: String): Unit = {
    val m = MultimodalOps.mediaFrom(batch)
    m.select(col("media_id"), md5(col("payload")).as("digest"))
      .join(MultimodalOps.mediaFrameSigsFrom(m), Seq("media_id"), "left")
      .write.mode("overwrite").parquet(s"$storePath/fp/batch_id=$batchId")
  }

  /** Drain a documents directory into the media fingerprint store. */
  def startMediaIngest(spark: SparkSession, docsPath: String,
      storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    StreamingCorpus.docStream(spark, docsPath)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, storePath)
      }
      .start()

  private def fp(spark: SparkSession, storePath: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$storePath/fp")),
      s"empty media store: $storePath")
    spark.read.parquet(s"$storePath/fp")
  }

  /** Exact-dup groups over everything ingested —
    * ≡ [[MultimodalOps.mediaDedupExact]] on the same corpus. */
  def globalDedupExact(spark: SparkSession, storePath: String): DataFrame =
    fp(spark, storePath)
      .groupBy(col("digest").as("content_hash"))
      .agg(min(col("media_id")).as("canonical_media_id"),
        count(lit(1)).as("n_copies"))

  /** Near-dup candidates over everything ingested —
    * ≡ [[MultimodalOps.mediaDedupNear]] on the same corpus. */
  def globalDedupNear(spark: SparkSession, storePath: String): DataFrame =
    MultimodalOps.mediaNearPairsFrom(
      fp(spark, storePath).where(col("sig").isNotNull)
        .select(col("media_id"), col("sig")))
}
