package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.TextOps

/** Incremental corpus deduplication — the streaming form of the
  * training-data dedup family: documents arrive in micro-batches, each
  * batch is judged against the ACCUMULATED corpus (exact digest match,
  * then MinHash-LSH near-match), and only novel documents' signatures
  * enter the store. This is the shape a continuously-ingesting
  * pretraining pipeline runs: the signature store (73 bytes/doc —
  * 5-6 orders smaller than the corpus) is the only state that grows,
  * never the text.
  *
  * Scale/correctness notes:
  *   - The store is batch-partitioned parquet
  *     (`store/batch_id=N/`): each micro-batch OVERWRITES its own
  *     partition, so a replayed batch (crash before checkpoint commit)
  *     is idempotent — the Structured Streaming sink contract without
  *     a transactional table format.
  *   - The batch-vs-store near-match is the same banded LSH equi-join
  *     as the batch operator ([[TextOps.dedupMinhashLsh]]'s band keys,
  *     shared code) — O(collisions), never batch × store.
  *   - Exact dups WITHIN a batch collapse to the smallest doc_id
  *     (matching [[TextOps.dedupExact]]'s canonical rule); intra-batch
  *     NEAR dups are deliberately left to the batch operators — both
  *     docs are novel vs the corpus-so-far, and re-curating the
  *     accumulated store is a batch job ([[TextOps.corpusCuration]]).
  */
object StreamingCorpus {

  /** documents-table schema for the file stream source. */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Signature agreement fraction at or above which a band-collision
    * candidate counts as a near duplicate of a stored doc. With 9
    * hashes in 3 bands, a candidate already shares one full band;
    * 5/9 keeps single-band chance collisions out while catching the
    * high-Jaccard pairs the dedup family targets.
    */
  val NearDupEst: Double = 5.0 / 9

  def docStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(docsSchema).parquet(path)

  /** Start the incremental dedup: per micro-batch, decide
    * new | exact_dup | near_dup per document (written to
    * `decisionsPath/batch_id=N/`) and append novel signatures to the
    * store. `Trigger.AvailableNow` drains-and-stops (the cron analog).
    */
  def startDedupStream(
      spark: SparkSession,
      docsPath: String,
      storePath: String,
      decisionsPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream(spark, docsPath)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storePath, decisionsPath)
      }
      .start()

  /** One micro-batch: judge `batch` against the store, write decisions
    * and novel signatures into this batch's own partitions (replay-
    * idempotent overwrite). Package-visible so tests drive it without
    * a running stream.
    */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, storePath: String, decisionsPath: String): Unit = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val store: DataFrame =
      if (fs.exists(new Path(storePath)) && fs.listStatus(new Path(storePath)).nonEmpty)
        // a REPLAYED batch (crash after the store write, before the
        // checkpoint commit) finds its own partition already present —
        // excluding it keeps the decisions identical on replay instead
        // of the doc exact-matching its own prior write
        spark.read.parquet(storePath).where(col("batch_id") =!= lit(batchId))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", LongType),
          StructField("digest", StringType),
          StructField("sig", ArrayType(LongType)))))

    // one compute of the batch slice shared by digesting, signing, and
    // both writes (it arrives as an in-memory micro-batch, but the
    // derivations below branch several times)
    val docs = batch.select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val digests = docs.select(col("doc_id"), md5(col("text")).as("digest"))
      // short docs (<3 words) have no signature: left join keeps them
      // (exact dedup still applies; they can never near-match)
      val enriched = digests
        .join(TextOps.minhashSignaturesFrom(docs), Seq("doc_id"), "left")

      // exact vs store, and exact WITHIN the batch (canonical = min id)
      val exactStore = enriched
        .join(store.select(col("digest"), col("doc_id").as("store_doc")), Seq("digest"))
        .groupBy(col("doc_id")).agg(min(col("store_doc")).as("dup_of"))
      val intraCanon = enriched
        .groupBy(col("digest")).agg(min(col("doc_id")).as("canon"))
      val exactIntra = enriched.join(intraCanon, Seq("digest"))
        .where(col("doc_id") =!= col("canon"))
        .select(col("doc_id"), col("canon").as("dup_of"))
      val exact = exactStore.unionByName(exactIntra)
        .groupBy(col("doc_id")).agg(min(col("dup_of")).as("dup_of"))
        .withColumn("status", lit("exact_dup"))

      // near vs store: banded equi-join, agreement-fraction verify
      val batchBands = enriched.where(col("sig").isNotNull).select(
        col("doc_id"), col("sig"),
        posexplode(expr(TextOps.sigBandKeysExpr)).as(Seq("band_idx", "band_key")))
      val storeBands = store.where(col("sig").isNotNull).select(
        col("doc_id").as("store_doc"), col("sig").as("store_sig"),
        posexplode(expr(TextOps.sigBandKeysExpr)).as(Seq("band_idx", "band_key")))
      val near = batchBands.join(storeBands, Seq("band_idx", "band_key"))
        .select(col("doc_id"), col("store_doc"),
          (expr(s"""size(filter(sequence(1, ${TextOps.NumHashes}),
                    i -> sig[i - 1] = store_sig[i - 1]))""").cast("double")
            / TextOps.NumHashes).as("est"))
        .where(col("est") >= NearDupEst)
        .groupBy(col("doc_id")).agg(min(col("store_doc")).as("dup_of"))
        .withColumn("status", lit("near_dup"))

      val dupDecisions = exact.unionByName(near)
        // exact beats near when both match (deterministic precedence)
        .withColumn("rank", when(col("status") === "exact_dup", 0).otherwise(1))
        .groupBy(col("doc_id"))
        .agg(min(struct(col("rank"), col("status"), col("dup_of"))).as("best"))
        .select(col("doc_id"), col("best.status").as("status"),
          col("best.dup_of").as("dup_of"))
      val decisions = enriched.join(dupDecisions, Seq("doc_id"), "left")
        .select(col("doc_id"), col("digest"),
          coalesce(col("status"), lit("new")).as("status"), col("dup_of"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        decisions.write.mode("overwrite")
          .parquet(s"$decisionsPath/batch_id=$batchId")
        // only novel docs' signatures enter the store
        enriched.join(decisions.where(col("status") === "new")
            .select(col("doc_id")), Seq("doc_id"))
          .select(col("doc_id"), col("digest"), col("sig"))
          .write.mode("overwrite").parquet(s"$storePath/batch_id=$batchId")
      } finally decisions.unpersist(blocking = false)
    } finally docs.unpersist(blocking = false)
  }
}
