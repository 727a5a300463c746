package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.VectorOps

/** Incremental vector-index maintenance under streaming ingest — the
  * embedding-side analog of [[StreamingCorpus]]: new vectors arrive as
  * micro-batches and must land in the right IVF bucket without
  * retraining or rescanning the corpus.
  *
  * Design (the shape a 100 TB vector store runs):
  *   - the coarse codebook is a FROZEN artifact (trained offline —
  *     here [[VectorOps.centroidVectors]]'s decimal-exact means),
  *     broadcast to every batch; ingest never mutates it;
  *   - each micro-batch computes nearest-centroid assignments for its
  *     vectors only (batch × broadcast codebook — no shuffle of
  *     anything but the batch), and lands in a store PARTITIONED BY
  *     (ingest batch, assigned bucket), so searches prune to probed
  *     buckets at the file-listing level;
  *   - `foreachBatch` is only AT-LEAST-ONCE: if the process dies after
  *     the sink write but before the checkpoint commits the offsets,
  *     the restarted query re-delivers the same batch. The write is
  *     therefore made IDEMPOTENT ON batchId — each batch OVERWRITES its
  *     own `ingest_batch=<id>` directory, and since the assignment is
  *     deterministic (frozen codebook, fixed tiebreak) the replay
  *     rewrites identical rows instead of appending duplicates
  *     (spec-asserted via a direct double-delivery of one batchId).
  */
object StreamingVectors {

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def embeddingStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(embeddingsSchema).parquet(path)

  /** Nearest-centroid assignment of ONE batch against the broadcast
    * codebook — identical math and tiebreak to [[VectorOps.ivfAssign]]
    * (cosine argmax, label-ascending tiebreak), so batch and streaming
    * paths agree row-for-row.
    */
  def assignBatch(batch: DataFrame, codebook: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("c_label").asc)
    batch
      .withColumn("nrm", expr(VectorOps.dot("embedding", "embedding")))
      .crossJoin(broadcast(codebook))
      .select(col("vec_id"), col("label"), col("embedding"), col("c_label"),
        (expr(VectorOps.dot("embedding", "centroid")) /
          (sqrt(col("nrm")) * sqrt(col("cnrm")))).as("sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("embedding"),
        col("c_label").as("assigned_label"), col("sim"))
  }

  /** The per-batch sink write, idempotent on `batchId`: the batch
    * OVERWRITES its own `ingest_batch=<id>` partition directory, so an
    * at-least-once re-delivery (crash between sink write and offset
    * commit) replaces the directory with the identical deterministic
    * rows — the store never holds duplicates. Readers see the standard
    * two-level partition layout (ingest_batch, then assigned_label).
    */
  def writeBatch(batch: DataFrame, codebook: DataFrame,
      storePath: String, batchId: Long): Unit =
    assignBatch(batch, codebook)
      .write.mode("overwrite")
      .partitionBy("assigned_label")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain the source directory into the bucket-partitioned store.
    * AvailableNow: processes exactly the files not yet committed to the
    * checkpoint, then stops — the restartable incremental-ingest unit.
    */
  def startIvfIngest(spark: SparkSession, srcPath: String,
      codebook: DataFrame, storePath: String, checkpoint: String): StreamingQuery =
    embeddingStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, codebook, storePath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
