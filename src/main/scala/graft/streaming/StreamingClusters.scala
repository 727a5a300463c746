package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{GraphOps, TextOps}

/** Incremental near-dup CLUSTERING — the global-cluster-id completion
  * of [[StreamingCorpus]] (which only decides new/dup per doc): as
  * document batches arrive, each batch contributes the LSH pair-graph
  * EDGES whose later endpoint arrived in it — its docs band-joined
  * against the full signature store plus themselves. A pair is
  * emitted by exactly ONE batch (the one its later member arrives in),
  * so the slices are disjoint and the union over batches IS the batch
  * operator's complete pair graph — which makes the read side
  * ([[globalClusters]], star contraction over the merged edges)
  * bit-identical to batch [[TextOps.dedupClustersStar]] over
  * everything ingested (the spec's differential).
  *
  * State: the signature store (73 bytes/doc) and the edge slices
  * (16 bytes/pair) — never text. Both written under
  * overwrite-own-batchId; a replayed batch excludes its own partition
  * from the store read, so it re-derives the identical slice
  * (spec-proven). The label pass itself is [[GraphOps.starContract]] —
  * O(log² n) rounds at read time; at scale you re-run it per
  * maintenance window over the accumulated edges, which is exactly
  * how incremental CC systems batch their label refreshes.
  */
object StreamingClusters {

  /** One micro-batch: sign the docs, emit this batch's edge slice
    * (batch × (store ∪ batch) band collisions, normalized a < b,
    * distinct), append signatures. Package-visible for the spec.
    */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, storePath: String): Unit = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val sigs = TextOps.minhashSignaturesFrom(
      batch.select(col("doc_id"), col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sigsPath = s"$storePath/sigs"
      val prior: DataFrame =
        if (fs.exists(new Path(sigsPath)) && fs.listStatus(new Path(sigsPath)).nonEmpty)
          spark.read.parquet(sigsPath).where(col("batch_id") =!= lit(batchId))
            .select(col("doc_id"), col("sig"))
        else sigs.limit(0).select(col("doc_id"), col("sig"))
      def bands(df: DataFrame, side: String) = df.select(
        col("doc_id").as(side),
        posexplode(expr(TextOps.sigBandKeysExpr)).as(Seq("band_idx", "band_key")))
      val slice = bands(sigs, "doc_b")
        .join(bands(prior.unionByName(sigs.select(col("doc_id"), col("sig"))), "doc_a"),
          Seq("band_idx", "band_key"))
        .where(col("doc_a") =!= col("doc_b"))
        .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        .distinct()
        // normalize slice ownership: intra-batch pairs surface twice
        // (once per orientation of the self-join) — distinct handles
        // that; pairs whose BOTH members are prior-batch docs cannot
        // appear (one side always comes from this batch's sigs)
      slice.write.mode("overwrite").parquet(s"$storePath/edges/batch_id=$batchId")
      sigs.write.mode("overwrite").parquet(s"$sigsPath/batch_id=$batchId")
    } finally sigs.unpersist(blocking = false)
  }

  /** Drain a documents directory into the cluster store. */
  def startClusterIngest(spark: SparkSession, docsPath: String,
      storePath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    StreamingCorpus.docStream(spark, docsPath)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storePath)
      }
      .start()

  /** Cluster labels over everything ingested — star contraction over
    * the merged edge slices, identical output shape (and, per the
    * disjoint-slices argument above, identical CONTENT) to batch
    * [[TextOps.dedupClustersStar]] on the same corpus.
    */
  def globalClusters(spark: SparkSession, storePath: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$storePath/edges")),
      s"empty cluster store: $storePath")
    val pairs = spark.read.parquet(s"$storePath/edges")
      .select(col("doc_a"), col("doc_b"))
    val sym = pairs.unionAll(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val (labels, _) = GraphOps.starContract(sym)
    labels.select(
      col("node").as("doc_id"),
      col("label").as("cluster_id"),
      count(lit(1)).over(Window.partitionBy(col("label"))).as("cluster_size"))
  }
}
