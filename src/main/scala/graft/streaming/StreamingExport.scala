package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** Incremental training-set EXPORT — the streaming twin of the
  * composed curation pipeline ([[TextOps.corpusExport]] /
  * [[TextOps.corpusExportStages]]): crawl batches arrive, each one is
  * reduced to the per-document FEATURE slice every export gate needs
  * (token count, sampling bucket, shard, quality verdict, content
  * digest, MinHash signature) plus its decontamination n-gram slice,
  * and the read side replays the batch stage chain — quality →
  * exact-dup canonical keep → near-dup cluster-loser drop →
  * decontamination → temperature mixture — over the merged slices.
  * The text itself is never stored and never rescanned.
  *
  * Every gate decision that is PER-DOC (quality, digest, signature,
  * n-gram set, bucket, shard) is computed batch-locally through the
  * SAME TextOps seams the batch operator uses
  * ([[TextOps.exportBaseFrom]], [[TextOps.qualityFrom]],
  * [[TextOps.minhashSignaturesFrom]], [[TextOps.contamDocGramsFrom]]);
  * every decision that is GLOBAL (the exact-dup canonical min, the
  * LSH cluster labels, the eval-gram hit set, the per-source mixture
  * masses) is re-derived on the read side from the merged slices via
  * the same shared definitions ([[TextOps.lshBandPairsFrom]],
  * [[TextOps.propagateBounded]], [[TextOps.mixSampleFrom]],
  * [[TextOps.exportManifestFrom]], [[TextOps.exportAttritionFrom]]).
  * One definition per derivation ⇒ the drained manifest and attrition
  * are the batch operator's BIT FOR BIT over the ingested union
  * (StreamingExportSpec's differential), under any batch split.
  *
  * Why global stages cannot be sliced: a new batch can canonicalize
  * an OLD doc away (smaller doc_id, same content), re-cluster old
  * near-dups, contaminate old docs (a new eval doc's grams), and
  * shift every source's mixture rate. Incremental maintenance
  * therefore keeps per-doc evidence and re-aggregates decisions —
  * counts over slices, never the corpus — exactly the
  * [[StreamingDsir]] shape at the pipeline level.
  *
  * Merge algebra: batch slices are DISJOINT by construction (a doc
  * lives in exactly one batch) and the read side aggregates them by
  * union, so the store is a COUNTER-family store:
  * overwrite-own-batchId is load-bearing, a same-id replay rewrites
  * identical rows (idempotent), and a replayed batch under a FRESH id
  * double-counts its docs (spec proves both directions).
  *
  * Scale shape at 100 TB: the feature slice is ~100 bytes/doc and the
  * gram slice is the vocabulary-compressed n-gram form — both 4-6
  * orders smaller than the corpus; the read side's joins are the
  * audited batch shapes (hash semi/anti joins on doc_id, the banded
  * LSH equi-join, a broadcast eval-gram probe, per-source broadcast
  * rates). A production deployment additionally snapshots the derived
  * survivor sets per refresh so downstream readers don't re-propagate
  * clusters per query — the same write-each-stage-once move the batch
  * Scaladoc names.
  */
object StreamingExport {

  /** Per-batch sink write, idempotent on `batchId` (overwrite-own-
    * partition: the Structured Streaming sink contract without a
    * transactional table format). The feature slice is
    * [[TextOps.exportFeaturesFrom]] — the [[TextOps.exportBaseFrom]]
    * columns + quality verdict + content digest + MinHash signature
    * (null for short docs, which can never near-match — the
    * [[StreamingCorpus]] convention).
    */
  private[graft] def writeBatch(batch: DataFrame, batchId: Long,
      storePath: String): Unit = {
    TextOps.exportFeaturesFrom(batch)
      .write.mode("overwrite").parquet(s"$storePath/feat/batch_id=$batchId")
    TextOps.contamDocGramsFrom(batch)
      .write.mode("overwrite").parquet(s"$storePath/grams/batch_id=$batchId")
  }

  /** Drain a documents directory into the export store (AvailableNow —
    * the restartable incremental unit).
    */
  def startExportIngest(spark: SparkSession, docsPath: String,
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

  /** The stage chain replayed over the merged store — same names,
    * same frames (by value) as [[TextOps.exportStages]] over the
    * ingested union: [[TextOps.exportStagesFrom]] over the merged
    * slices. The global re-decisions live there — exact-dup canonical
    * = min doc_id per digest over the UNION (a later batch with a
    * smaller id takes the crown away), cluster losers re-propagate
    * over the merged signatures, eval grams from ALL batches
    * contaminate, mixture rates re-derive from the union masses.
    */
  private[graft] def storedStages(spark: SparkSession,
      storePath: String): Seq[(String, DataFrame)] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$storePath/feat")),
      s"empty export store: $storePath")
    TextOps.exportStagesFrom(
      spark.read.parquet(s"$storePath/feat"),
      spark.read.parquet(s"$storePath/grams"))
  }

  /** The shard manifest over everything ingested so far —
    * ≡ [[TextOps.corpusExport]] on the same corpus.
    */
  def globalExport(spark: SparkSession, storePath: String): DataFrame =
    TextOps.exportManifestFrom(storedStages(spark, storePath).last._2)

  /** Per-stage attrition over everything ingested so far —
    * ≡ [[TextOps.corpusExportStages]] on the same corpus.
    */
  def globalExportStages(spark: SparkSession, storePath: String): DataFrame =
    TextOps.exportAttritionFrom(storedStages(spark, storePath))
}
