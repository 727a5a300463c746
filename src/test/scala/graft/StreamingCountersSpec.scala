package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingCounters

/** Streaming daily-counter maintenance: a drained store must answer the
  * batch monitoring pair (evt_anomaly, evt_date_histogram) row for row
  * without rescanning events, survive restarts, and expose the additive
  * merge's replay sensitivity exactly like the CMS/MG stores.
  */
class StreamingCountersSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("drained counters answer the batch monitoring pair; replay discipline holds") {
    val src = tmp("graft-ctr-src")
    val store = tmp("graft-ctr-store") + "/counters"
    val ckpt = tmp("graft-ctr-ckpt")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")

    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    val q1 = StreamingCounters.startCounterIngest(spark, src, store, ckpt)
    q1.awaitTermination(120000)
    all.where(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = StreamingCounters.startCounterIngest(spark, src, store, ckpt)
    q2.awaitTermination(120000)

    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getDate(1).toString)
    def anomaly(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => key(r) -> ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    def histo(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => key(r) -> ((r.getLong(2), r.getDouble(3)))).toMap

    val batchAnomaly = anomaly(graft.operators.Relational.evtAnomaly(spark, sfDir))
    val batchHisto = histo(graft.operators.Relational.evtDateHistogram(spark, sfDir))
    assert(anomaly(StreamingCounters.globalAnomaly(spark, store)) === batchAnomaly)
    assert(histo(StreamingCounters.globalHistogram(spark, store)) === batchHisto)

    // the EWMA read surface: decimal day totals commute under the batch
    // split, so the dyadic fold must equal the batch operator row for row
    def ewma(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(ewma(StreamingCounters.globalEwma(spark, store)) ===
      ewma(graft.operators.Relational.evtEwma(spark, sfDir)))

    // restart with no new files: checkpoint skips everything
    val n = spark.read.parquet(store).count()
    val q3 = StreamingCounters.startCounterIngest(spark, src, store, ckpt)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(store).count() === n)

    // at-least-once replay: overwriting batch 0's own directory is a
    // no-op; the SAME grid appended under a fresh id double-counts —
    // the additive-merge class, overwrite discipline load-bearing
    StreamingCounters.writeCounterBatch(
      all.where(col("event_id") % 2 === 0), store, 0L)
    assert(anomaly(StreamingCounters.globalAnomaly(spark, store)) === batchAnomaly)
    StreamingCounters.writeCounterBatch(
      all.where(col("event_id") % 2 === 0), store, 99L)
    val doubled = StreamingCounters.globalDaily(spark, store)
      .agg(sum(col("n"))).head().getLong(0)
    assert(doubled > batchHisto.values.map(_._1).sum,
      "a duplicate grid under a fresh id must inflate counts")
  }
}
