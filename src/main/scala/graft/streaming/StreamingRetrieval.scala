package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** Incremental retrieval-index maintenance — the streaming mirror of
  * [[graft.operators.TextOps.bm25]], the way StreamingCounters mirrors
  * evt_anomaly: documents arrive in micro-batches and each batch adds
  * its slice of the inverted index — (doc, term, tf) postings and
  * (doc, dl) lengths, both pure per-document derivations. The READ
  * side rebuilds the two relations from the accumulated store and
  * feeds them through [[TextOps.bm25RankedFrom]], so a drained stream
  * scores bit-identically to the batch operator over the same corpus
  * (df/idf/avgdl are recomputed from the store at query time — they
  * are corpus-wide ratios no per-batch state could finalize early).
  *
  * Merge algebra / replay: both stores are ADDITIVE with per-document
  * rows, so the overwrite-own-batchId discipline makes crash-replay
  * idempotent exactly as in [[StreamingCorpus]] (a replayed batch
  * overwrites its own partition and nothing else). The upstream
  * contract is one batch per document — the corpus-dedup stream IS
  * that upstream (novel docs only); re-ingesting a doc under a new
  * batch id is an upstream bug this index would faithfully
  * double-count, the same contract every search engine's indexer has.
  *
  * Scale: per batch the work is one tokenize + one (doc, term)
  * partial-aggregated groupBy over JUST the batch; the accumulated
  * postings store is the only thing that grows, it never rewrites
  * (each batch owns its partition), and the read side's joins are the
  * batch operator's own shapes (broadcast query vocabulary, term-keyed
  * df join).
  */
object StreamingRetrieval {

  def docStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(StreamingCorpus.docsSchema).parquet(path)

  /** Start the index-maintenance stream: per micro-batch, write the
    * batch's postings and lengths into its own partitions.
    * `Trigger.AvailableNow` drains-and-stops (the cron analog).
    */
  def startIndexStream(
      spark: SparkSession,
      docsPath: String,
      indexPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream(spark, docsPath)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, indexPath)
      }
      .start()

  /** One micro-batch: tokenize (the exact batch-operator expressions —
    * whitespace split, size() lengths with null-text rows kept as null
    * dl so read-side count(dl) skips them, explode dropping null
    * arrays) and write this batch's index slice. Package-visible so
    * tests drive it without a running stream.
    */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, indexPath: String): Unit = {
    val docs = batch
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("words"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // lens doubles as the per-doc metadata sidecar (source rides
      // along for the significant-terms read side)
      docs.select(col("doc_id"), col("source"), size(col("words")).as("dl"))
        .write.mode("overwrite").parquet(s"$indexPath/lens/batch_id=$batchId")
      docs.select(col("doc_id"), explode(col("words")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(s"$indexPath/postings/batch_id=$batchId")
    } finally docs.unpersist(blocking = false)
  }

  /** Query the accumulated index: restrict postings to the workload's
    * vocabulary (broadcast semi-join — the batch operator's own first
    * move) and score through the shared [[TextOps.bm25RankedFrom]]
    * engine. Equal to `TextOps.bm25` over the union of all ingested
    * batches.
    */
  def bm25Search(spark: SparkSession, indexPath: String,
      workload: Seq[(Long, Seq[String])] = TextOps.bm25Queries): DataFrame = {
    val s = spark; import s.implicits._
    val queries = workload
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val qterms = queries.select(col("term")).distinct()
    val postings = spark.read.parquet(s"$indexPath/postings")
      .join(broadcast(qterms), Seq("term"), "left_semi")
      .select(col("doc_id"), col("term"), col("tf"))
    val lens = spark.read.parquet(s"$indexPath/lens")
      .select(col("doc_id"), col("dl"))
    TextOps.bm25RankedFrom(postings, lens, queries, excludeSelf = false)
  }

  /** The compacted segment's partition id — below every real batch id,
    * so compaction output and live batch partitions never collide.
    */
  val SegmentId: Long = -1L

  /** Compact the accumulated index: fold every batch partition with
    * `batch_id ≤ upToBatch` (plus any earlier compacted segment) into
    * ONE segment partition per store — the small-files maintenance
    * every micro-batch-partitioned store needs (a year of 5-minute
    * batches is ~100k tiny partitions; scan cost and NameNode/listing
    * pressure grow with file count, not data size). Read results are
    * IDENTICAL by construction: both stores are additive row sets and
    * compaction only moves rows between partitions.
    *
    * Contract: run beyond the stream's replay horizon (checkpoint-
    * committed batches only) — a replayed batch id that was already
    * folded into the segment would re-create its partition and
    * double-count, the same horizon rule every log-compacted store
    * has. Crash-safety here is write-tmp → delete-olds → rename (a
    * crash between the last two steps can leave duplicates for a
    * re-run of compact to fix); a production deployment puts a
    * manifest commit (Delta/Iceberg) around exactly this boundary.
    */
  def compactIndex(spark: SparkSession, indexPath: String,
      upToBatch: Long): Unit = {
    require(upToBatch >= 0, s"upToBatch must be a real batch id, got $upToBatch")
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    for (sub <- Seq("postings", "lens")) {
      val root = new Path(s"$indexPath/$sub")
      if (fs.exists(root)) {
        val src = spark.read.parquet(root.toString)
        val dataCols = src.columns.filter(_ != "batch_id").map(col(_))
        val tmp = new Path(s"$indexPath/${sub}_compact_tmp")
        src.where(col("batch_id") <= upToBatch) // includes a prior segment
          .select(dataCols: _*)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.listStatus(root)
          .filter { st =>
            val n = st.getPath.getName
            n.startsWith("batch_id=") &&
              n.stripPrefix("batch_id=").toLong <= upToBatch
          }
          .foreach(st => fs.delete(st.getPath, true))
        fs.rename(tmp, new Path(s"$indexPath/$sub/batch_id=$SegmentId"))
      }
    }
  }

  /** Significant terms over the accumulated index — the second read
    * side the one store supports (the batch operator's own relations:
    * postings rows ARE the distinct (doc, term) pairs; the lens
    * sidecar carries per-doc source and doubles as the doc-count
    * table). Equal to `TextOps.sigTerms` over the union of all
    * ingested batches.
    */
  def sigTermsSearch(spark: SparkSession, indexPath: String): DataFrame = {
    val docTerms = spark.read.parquet(s"$indexPath/postings")
      .select(col("doc_id"), col("term"))
      .join(spark.read.parquet(s"$indexPath/lens")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
    val docSources = spark.read.parquet(s"$indexPath/lens")
      .select(col("doc_id"), col("source"))
    TextOps.sigTermsFrom(docTerms, docSources)
  }

  /** Completion suggestions off the accumulated index: the vocabulary
    * (term, Σtf) aggregates over the merged postings slices and feeds
    * the shared prefix engine ([[TextOps.suggestCompletionFrom]]) —
    * equal to the batch `txt_suggest_completion` over the union of
    * all ingested batches (frequencies are corpus-wide sums no
    * per-batch state could finalize early, the bm25 df/avgdl
    * argument). Search-as-you-type served straight from the same
    * store the ranking reads.
    */
  def completionSearch(spark: SparkSession, indexPath: String,
      inputs: Seq[String] = TextOps.CompletionInputs): DataFrame =
    TextOps.suggestCompletionFrom(
      spark.read.parquet(s"$indexPath/postings")
        .groupBy(col("term")).agg(sum(col("tf")).as("freq")),
      inputs)

  /** ES `fuzzy` query over the accumulated postings — the fourth read
    * surface of the store: term expansion blocks on the merged
    * vocabulary's deletion-1 keys, the doc probe runs on the same
    * accumulated postings ≡ [[TextOps.fuzzyQuery]] over the union of
    * all ingested batches.
    */
  def fuzzySearch(spark: SparkSession, indexPath: String,
      inputs: Seq[String] = TextOps.SuggestInputs): DataFrame =
    TextOps.fuzzyQueryFrom(
      spark.read.parquet(s"$indexPath/postings")
        .select(col("term"), col("doc_id"), col("tf")),
      inputs)

  /** ES `wildcard` query (both anchors) over the accumulated postings
    * — forward and reversed-term prefix indexes build from the merged
    * term dictionary ≡ [[TextOps.wildcardSearch]] over the ingested
    * union.
    */
  def wildcardSearch(spark: SparkSession, indexPath: String): DataFrame =
    TextOps.wildcardSearchFrom(
      spark.read.parquet(s"$indexPath/postings")
        .select(col("term"), col("doc_id"), col("tf")))
}
