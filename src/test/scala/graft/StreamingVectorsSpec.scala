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

    // the store is physically bucket-partitioned (partition dirs exist)
    val dirs = new java.io.File(store).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("assigned_label=")))
  }
}
