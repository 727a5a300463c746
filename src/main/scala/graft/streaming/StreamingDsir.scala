package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** Incremental DSIR importance weighting — the streaming form of
  * [[graft.operators.TextOps.dsir]]: as documents arrive, each
  * micro-batch reduces to its own (doc_id, lang, word, tf)
  * term-frequency slice plus a (doc_id, lang) sidecar, written under
  * overwrite-own-batchId. The vocabulary statistics the importance
  * weights need (target/source counts per word, corpus totals) are
  * sums over the merged slices — exact integers, so the read side
  * ([[globalDsir]]) scores bit-identically to the batch operator over
  * everything ingested, under ANY batch split (the spec's
  * differential). The text itself is never stored and never rescanned:
  * the tf slices are the only state, and they are the vocabulary-
  * compressed form (Zipf: |doc|·|vocab-per-doc| ≪ corpus bytes).
  *
  * Why incremental DSIR matters: importance weights move as the
  * reference corpus grows — every new batch shifts p̂_target/p̂_source
  * for every document scored so far. Batch DSIR would rescan the
  * corpus per refresh; this store re-aggregates counts only.
  *
  * Merge algebra: batch slices are DISJOINT by construction (a doc
  * lives in exactly one batch), so the union-merge is idempotent
  * given overwrite-own-batchId — a replayed batch overwrites its own
  * partition with identical rows (spec-proven both directions).
  */
object StreamingDsir {

  /** One micro-batch reduced to its tf slice + doc sidecar. */
  private[graft] def writeBatch(batch: DataFrame, batchId: Long,
      storePath: String): Unit = {
    TextOps.dsirTfFrom(batch)
      .write.mode("overwrite").parquet(s"$storePath/tf/batch_id=$batchId")
    batch.select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$storePath/docs/batch_id=$batchId")
  }

  /** Drain a documents directory into the DSIR store (AvailableNow —
    * the restartable incremental unit).
    */
  def startDsirIngest(spark: SparkSession, docsPath: String,
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

  /** Importance weights over everything ingested so far, scored
    * through the batch engine ([[TextOps.dsirFrom]]) against the
    * merged store — bit-identical to batch [[TextOps.dsir]] on the
    * same corpus.
    */
  def globalDsir(spark: SparkSession, storePath: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$storePath/tf")), s"empty DSIR store: $storePath")
    val tf = spark.read.parquet(s"$storePath/tf")
      .select(col("doc_id"), col("lang"), col("word"), col("tf"))
    val docs = spark.read.parquet(s"$storePath/docs")
      .select(col("doc_id"), col("lang"))
    TextOps.dsirFrom(tf, docs)
  }
}
