package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** Incremental TOKENIZER-TRAINING state — the streaming twin of the
  * trainer pair ([[TextOps.bpeTrain]] / [[TextOps.unigramTrain]]):
  * both trainers are dictionary-driven by construction (the
  * type-vs-token device — the corpus is scanned once for the
  * word-frequency aggregate; every training round after that is
  * vocabulary-sized), so the ONLY state a continuously-ingesting
  * pipeline needs is the (word, count) dictionary, maintained here as
  * per-batch count slices. Re-training after new crawl batches
  * re-aggregates counts and re-runs the dictionary-bound rounds —
  * the corpus is never rescanned.
  *
  * Read sides feed the merged dictionary through the SHARED trainer
  * cores ([[TextOps.bpeTrainFromDict]] /
  * [[TextOps.unigramTrainFromDict]]), so the drained stores train
  * bit-identically to the batch operators over the ingested union
  * (word counts are exact integer sums under any batch split).
  *
  * Merge algebra: counter ADDITION (the StreamingCounters class) —
  * overwrite-own-batchId is load-bearing; a same-id replay rewrites
  * identical rows, a fresh-id replay double-counts its words
  * (spec-proven both directions on the dictionary itself, the state
  * the algebra governs).
  */
object StreamingVocab {

  /** One micro-batch reduced to its word-frequency slice. The
    * tokenizer is [[TextOps.words]] — the SAME definition the batch
    * trainers scan with, so drain≡batch cannot silently break on a
    * tokenizer change (the module's one-definition invariant).
    */
  private[graft] def writeBatch(batch: DataFrame, batchId: Long,
      storePath: String): Unit =
    batch.select(explode(TextOps.words).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .write.mode("overwrite").parquet(s"$storePath/wf/batch_id=$batchId")

  /** Drain a documents directory into the vocabulary store. */
  def startVocabIngest(spark: SparkSession, docsPath: String,
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

  /** The merged (w, f) dictionary over everything ingested so far. */
  private[graft] def mergedDict(spark: SparkSession,
      storePath: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$storePath/wf")),
      s"empty vocab store: $storePath")
    spark.read.parquet(s"$storePath/wf")
      .groupBy(col("w")).agg(sum(col("f")).as("f"))
  }

  /** BPE merge table over everything ingested —
    * ≡ [[TextOps.bpeTrain]] on the same corpus. */
  def globalBpeTrain(spark: SparkSession, storePath: String): DataFrame =
    TextOps.bpeTrainFromDict(mergedDict(spark, storePath))

  /** Unigram-LM vocabulary over everything ingested —
    * ≡ [[TextOps.unigramTrain]] on the same corpus. */
  def globalUnigramTrain(spark: SparkSession, storePath: String): DataFrame =
    TextOps.unigramTrainFromDict(mergedDict(spark, storePath))
}
