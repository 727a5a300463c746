package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.VectorOps
import graft.streaming.StreamingVectors

/** Incremental IVF ingest: streamed assignments must equal the batch
  * assignment over the same rows, arrive bucket-partitioned, and be
  * replay-idempotent across query restarts.
  */
class StreamingVectorsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("two-batch drain equals batch ivfAssign; restart replays nothing") {
    val src = tmp("graft-vec-src")
    val store = tmp("graft-vec-store") + "/index"
    val ckpt = tmp("graft-vec-ckpt")
    // frozen codebook trained on the full fixture (offline artifact)
    val codebook = VectorOps.centroidVectors(spark, sfDir, VectorOps.NList)
    val all = graft.sources.Tables.embeddings(spark, sfDir)

    // batch 1: first half of the corpus
    all.where(col("vec_id") % 2 === 0).write.mode("append").parquet(src)
    val q1 = StreamingVectors.startIvfIngest(spark, src, codebook, store, ckpt)
    q1.awaitTermination(120000)
    val afterB1 = spark.read.parquet(store).count()

    // batch 2: second half lands as new files; the checkpoint must skip
    // everything batch 1 committed
    all.where(col("vec_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = StreamingVectors.startIvfIngest(spark, src, codebook, store, ckpt)
    q2.awaitTermination(120000)

    val streamed = spark.read.parquet(store)
      .select(col("vec_id"), col("assigned_label"), col("sim")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(streamed.size.toLong > afterB1, "batch 2 must add rows")

    val batch = VectorOps.ivfAssign(spark, sfDir)
      .select(col("vec_id"), col("assigned_label"), col("sim")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(streamed === batch)

    // replay idempotency: a third run with no new files adds nothing
    val q3 = StreamingVectors.startIvfIngest(spark, src, codebook, store, ckpt)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(store).count() === streamed.size.toLong)

    // the store is physically partitioned (ingest batch, then bucket) —
    // searches prune to probed buckets at the file-listing level
    val batchDirs = new java.io.File(store).listFiles()
      .filter(_.isDirectory)
    assert(batchDirs.nonEmpty && batchDirs.forall(_.getName.startsWith("ingest_batch=")))
    assert(batchDirs.forall(_.listFiles().filter(_.isDirectory)
      .forall(_.getName.startsWith("assigned_label="))))
  }

  test("refreshing ingest: versioned re-trains, pinned reads, final read equals batch ivfAssign; replaying the re-train batch changes nothing") {
    val src = tmp("graft-vecr-src")
    val store = tmp("graft-vecr-store") + "/index"
    val ckpt = tmp("graft-vecr-ckpt")
    val all = graft.sources.Tables.embeddings(spark, sfDir)
    def part(b: Int) = all.where(pmod(col("vec_id"), lit(4)) === b)
    for (b <- 0 to 3) {
      part(b).write.mode("append").parquet(src)
      val q = StreamingVectors.startRefreshingIngest(spark, src, store, ckpt)
      q.awaitTermination(180000)
      if (b == 2) {
        // mid-drain: refresh fired on batch 1 only; reads pin to assign
        // version=1 and batch 2 rides as a delta under codebook v1
        val versions = new java.io.File(s"$store/assign").listFiles()
          .map(_.getName).sorted
        assert(versions === Array("version=1"))
        val read = StreamingVectors.readAssignments(spark, store)
        assert(read.count() ===
          all.where(pmod(col("vec_id"), lit(4)) <= 2).count())
      }
    }
    // batch 0 arrived before any codebook existed (cold start): only
    // batch 2 ever produced a delta; refreshes on 1 and 3 covered the rest
    assert(new java.io.File(s"$store/delta").listFiles().map(_.getName).toSeq
      === Seq("ingest_batch=2"))
    assert(new java.io.File(s"$store/codebook").listFiles().map(_.getName).sorted
      === Array("version=1", "version=3"))
    // the final refresh (batch 3) re-trained and re-assigned EVERYTHING:
    // the read side must equal batch ivfAssign over the identical union
    val streamed = StreamingVectors.readAssignments(spark, store)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("assigned_label"), r.getAs[Double]("sim")))).toMap
    val unionDir = tmp("graft-vecr-union")
    all.write.parquet(s"$unionDir/embeddings.parquet")
    val batch = VectorOps.ivfAssign(spark, unionDir)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("assigned_label"), r.getAs[Double]("sim")))).toMap
    assert(streamed === batch,
      "refreshed read side diverges from batch ivfAssign over the union")
    // crash window on the RE-TRAIN batch: re-deliver batchId 3 directly;
    // vectors, codebook and assignment all overwrite their own version
    // with identical deterministic rows
    StreamingVectors.writeRefreshingBatch(spark, part(3), store, 3L)
    val replayed = StreamingVectors.readAssignments(spark, store)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("assigned_label"), r.getAs[Double]("sim")))).toMap
    assert(replayed === streamed, "replayed re-train batch must be a no-op")
  }

  test("a re-delivered batch overwrites itself: at-least-once becomes exactly-once") {
    // foreachBatch re-runs a batch when the process dies after the sink
    // write but before the offset commit; simulate that crash window by
    // delivering the SAME (batch, batchId) twice directly
    val store = tmp("graft-vec-replay") + "/index"
    val codebook = VectorOps.centroidVectors(spark, sfDir, VectorOps.NList)
    val batch = graft.sources.Tables.embeddings(spark, sfDir)
      .where(col("vec_id") % 2 === 0)
    StreamingVectors.writeBatch(batch, codebook, store, batchId = 7L)
    val once = spark.read.parquet(store).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("assigned_label"))).sorted
    StreamingVectors.writeBatch(batch, codebook, store, batchId = 7L)
    val twice = spark.read.parquet(store).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("assigned_label"))).sorted
    assert(twice === once, "replayed batch must not change the store")
    // a DIFFERENT batchId with the same rows is a new delivery, not a
    // replay — it lands in its own partition (the at-least-once
    // contract is idempotence per batchId, not content dedup)
    StreamingVectors.writeBatch(batch, codebook, store, batchId = 8L)
    assert(spark.read.parquet(store).count() === 2L * once.length)
  }
}
