package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingQuantiles

/** The quantile store's contract: a two-batch drain answers BIT-EQUAL
  * to the batch q50 sample-quantile query over the same events
  * (union + re-take bottom-k is associative), restarts and replays add
  * nothing, and — stronger than the counting sketches — even a
  * duplicate sample APPENDED under a fresh batch id is absorbed,
  * because the merge is a set union, not an addition.
  */
class StreamingQuantilesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("drain ≡ batch q50; replay and even cross-id duplicates are absorbed") {
    val src = tmp("graft-sq-src")
    val store = tmp("graft-sq-store") + "/sample"
    val ckpt = tmp("graft-sq-ckpt")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")

    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    StreamingQuantiles.startIngest(spark, src, store, ckpt)
      .awaitTermination(120000)
    all.where(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    StreamingQuantiles.startIngest(spark, src, store, ckpt)
      .awaitTermination(120000)

    def fp(df: org.apache.spark.sql.DataFrame): Seq[Row] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
        .sortBy(_._1).toSeq
    type Row = (String, Long, Double, Double, Double, Double, Double)

    val want = fp(graft.operators.Relational.q50SampleQuantiles(spark, sfDir))
    val got = fp(StreamingQuantiles.globalQuantiles(spark, store))
    assert(got === want, "drained store diverges from the batch sketch")

    // restart with no new files: nothing new lands
    val nFiles = spark.read.parquet(store).count()
    StreamingQuantiles.startIngest(spark, src, store, ckpt)
      .awaitTermination(120000)
    assert(spark.read.parquet(store).count() === nFiles)

    // at-least-once double delivery of batch 0: overwrite-own-directory
    StreamingQuantiles.writeBatch(
      all.where(col("event_id") % 2 === 0), store, 0L)
    assert(fp(StreamingQuantiles.globalQuantiles(spark, store)) === want)

    // the SAME sample under a FRESH id: the set-union read absorbs it
    // (the property the additive CMS store provably lacks)
    StreamingQuantiles.writeBatch(
      all.where(col("event_id") % 2 === 0), store, 99L)
    assert(fp(StreamingQuantiles.globalQuantiles(spark, store)) === want)
  }

  test("within-batch sample is the batch-side bottom-k of that slice") {
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")
    val half = all.where(col("event_id") % 2 === 0)
    val viaStream = StreamingQuantiles.sampleBatch(half)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaBatch = graft.operators.Relational.bottomKSample(half)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaStream === viaBatch)
    assert(viaStream.nonEmpty)
  }
}
