package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingPercolate

/** Streaming percolator: the drained match store must equal the batch
  * percolate over all ingested docs, survive restarts, and — unlike the
  * additive counter/session stores — absorb a replayed batch under a
  * FRESH id (set-union merge is idempotent).
  */
class StreamingPercolateSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("drained matches equal batch percolate; fresh-id replay is absorbed") {
    val src = tmp("graft-perc-src")
    val store = tmp("graft-perc-store") + "/matches"
    val ckpt = tmp("graft-perc-ckpt")
    val all = spark.read.parquet(s"$sfDir/documents.parquet")

    all.where(col("doc_id") % 2 === 0).write.mode("append").parquet(src)
    val q1 = StreamingPercolate.startPercolateIngest(spark, src, store, ckpt)
    q1.awaitTermination(120000)
    all.where(col("doc_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = StreamingPercolate.startPercolateIngest(spark, src, store, ckpt)
    q2.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = rows(graft.operators.TextOps.percolate(spark, sfDir))
    assert(want.nonEmpty, "fixture must trigger at least one stored query")
    assert(rows(StreamingPercolate.globalMatches(spark, store)) === want)

    // restart with no new files: checkpoint skips everything
    val n = spark.read.parquet(store).count()
    val q3 = StreamingPercolate.startPercolateIngest(spark, src, store, ckpt)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(store).count() === n)

    // idempotent-merge class: overwriting batch 0's own directory is a
    // no-op AND the same docs under a fresh id change nothing — the
    // distinct union absorbs re-assertion (contrast: the counter and
    // session stores inflate under a fresh-id replay)
    StreamingPercolate.writeMatchBatch(
      all.where(col("doc_id") % 2 === 0), store, 0L)
    assert(rows(StreamingPercolate.globalMatches(spark, store)) === want)
    StreamingPercolate.writeMatchBatch(
      all.where(col("doc_id") % 2 === 0), store, 99L)
    assert(rows(StreamingPercolate.globalMatches(spark, store)) === want,
      "set-union merge must absorb a duplicate fragment set")
  }
}
