package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Relational

/** Streaming QUANTILE-sketch maintenance — the incremental twin of
  * [[graft.operators.Relational.q50SampleQuantiles]], completing the
  * sketch-store family (CMS/HLL/KMV/MG) with the one summary those
  * four don't give: order statistics.
  *
  * Why THIS sketch streams exactly: the bottom-k-by-hash sample is a
  * SET — merge is union + re-take bottom k, which is associative,
  * commutative, and (with the distinct) idempotent, so micro-batch
  * boundaries, replays, and merge order can't move a single output
  * bit. A GK/KLL compactor's state depends on arrival order — its
  * drained result could never equal its batch twin bit-for-bit, which
  * is why q35 is rows-only while this store is spec-proven
  * drain ≡ batch.
  *
  * Store shape: each micro-batch reduces to ≤ |types|·k sample rows
  * ([[graft.operators.Relational.bottomKSample]] — the IDENTICAL code
  * the batch query runs), written under its own `ingest_batch=<id>`
  * directory (overwrite-own-batch, [[StreamingVectors]]'s at-least-
  * once device). The read side re-takes bottom k over the union of
  * stored samples — `batches × types × k` rows, never the event
  * stream — and hands the winner set to the same quantile readout the
  * batch query uses.
  */
object StreamingQuantiles {

  val K: Int = Relational.SqK

  /** One micro-batch reduced to its per-type bottom-k sample. */
  def sampleBatch(batch: DataFrame, k: Int = K): DataFrame =
    Relational.bottomKSample(
      batch.select(col("event_type"), col("event_id"), col("value")), k)

  /** Per-batch sink write, idempotent on `batchId` (overwrite own
    * directory — a crash replay rewrites identical bytes).
    */
  def writeBatch(batch: DataFrame, storePath: String, batchId: Long,
      k: Int = K): Unit =
    sampleBatch(batch, k)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain an events directory into the sample store (AvailableNow —
    * the restartable incremental unit).
    */
  def startIngest(spark: SparkSession, srcPath: String, storePath: String,
      checkpoint: String, k: Int = K): StreamingQuery =
    StreamingAssets.eventStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, storePath, batchId, k)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The merged sample: set-union of every batch's sample rows
    * (`distinct` makes union a true SET union — an event delivered in
    * two different batches contributes once), bottom k re-taken per
    * type off the STORED hashes (no md5 recompute on the read path).
    */
  def globalSample(spark: SparkSession, storePath: String, k: Int = K): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("h").asc, col("event_id").asc)
    spark.read.parquet(storePath)
      .select(col("event_type"), col("event_id"), col("value"), col("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("event_type"), col("event_id"), col("value"), col("h"))
  }

  /** Quantiles off the accumulated store — bit-equal to the batch
    * [[graft.operators.Relational.q50SampleQuantiles]] over the same
    * ingested events (spec-proven).
    */
  def globalQuantiles(spark: SparkSession, storePath: String, k: Int = K): DataFrame =
    Relational.sampleQuantiles(globalSample(spark, storePath, k))
}
