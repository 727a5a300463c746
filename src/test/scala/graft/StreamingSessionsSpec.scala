package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingSessions

/** Streaming session maintenance: the interval-merge read must equal
  * the batch sessionizer under an interleaved-in-time batch split (the
  * hard case — fragments of one true session arrive in different
  * batches and must fuse), survive restarts, and expose the additive
  * count's replay sensitivity.
  */
class StreamingSessionsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("drained sessions equal the batch sessionizer; replay discipline holds") {
    val src = tmp("graft-sess-src")
    val store = tmp("graft-sess-store") + "/sessions"
    val ckpt = tmp("graft-sess-ckpt")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")

    // event_id parity split: both batches carry fragments of most
    // sessions, so nearly every merged session crosses batches
    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    val q1 = StreamingSessions.startSessionIngest(spark, src, store, ckpt)
    q1.awaitTermination(120000)
    all.where(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = StreamingSessions.startSessionIngest(spark, src, store, ckpt)
    q2.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
    val want = rows(graft.operators.Relational.q30Sessionize(spark, sfDir))
    assert(rows(StreamingSessions.globalSessions(spark, store)) === want)
    // the split genuinely fragmented sessions: the store holds more
    // preliminary rows than there are true sessions
    assert(spark.read.parquet(store).count() > want.size.toLong)

    // restart with no new files: checkpoint skips everything
    val n = spark.read.parquet(store).count()
    val q3 = StreamingSessions.startSessionIngest(spark, src, store, ckpt)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(store).count() === n)

    // at-least-once replay: overwriting batch 0's own directory is a
    // no-op; the SAME fragments under a fresh id double-count n_events
    StreamingSessions.writeSessionBatch(
      all.where(col("event_id") % 2 === 0), store, 0L)
    assert(rows(StreamingSessions.globalSessions(spark, store)) === want)
    StreamingSessions.writeSessionBatch(
      all.where(col("event_id") % 2 === 0), store, 99L)
    val inflated = StreamingSessions.globalSessions(spark, store)
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(inflated > want.values.map(_._1).sum,
      "a duplicate fragment set under a fresh id must inflate counts")
  }
}
