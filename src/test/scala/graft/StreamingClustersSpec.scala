package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.streaming.StreamingClusters

/** Incremental near-dup clustering: the union of per-batch LSH edge
  * slices is the batch operator's complete pair graph, so the read-side
  * star contraction labels everything identically to
  * [[TextOps.dedupClustersStar]] over the ingested corpus.
  */
class StreamingClustersSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("drained cluster labels ≡ batch dedupClustersStar; replay is idempotent") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val srcDir = tmp("graft-clu-src") + "/docs"
    val store = tmp("graft-clu-store") + "/store"
    val ckpt = tmp("graft-clu-ckpt")

    // three uneven batches: near-dup pairs land across batch boundaries
    docs.where(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingClusters.startClusterIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)
    docs.where(col("doc_id") % 3 === 1)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingClusters.startClusterIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)
    docs.where(col("doc_id") % 3 === 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingClusters.startClusterIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)

    def labelsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = labelsOf(StreamingClusters.globalClusters(spark, store))
    val batch = labelsOf(TextOps.dedupClustersStar(spark, sfDir))
    assert(batch.nonEmpty)
    assert(streamed === batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")

    // the edge slices are DISJOINT (each pair owned by the batch of
    // its later member): the merged store holds every pair exactly once
    val edges = spark.read.parquet(s"$store/edges")
      .select(col("doc_a"), col("doc_b"))
    assert(edges.count() === edges.distinct().count(), "slice overlap")

    // replay batch 1: excluding its own partitions from the store read
    // re-derives the identical slice — labels unchanged
    StreamingClusters.processBatch(spark,
      docs.where(col("doc_id") % 3 === 1), 1L, store)
    assert(labelsOf(StreamingClusters.globalClusters(spark, store)) === batch,
      "replay changed the cluster labels")
  }
}
