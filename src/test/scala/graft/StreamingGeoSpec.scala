package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingGeo

/** Streaming geo grid: the merged store must reproduce the batch
  * geohash_grid answer bit for bit (integer/decimal sums commute under
  * the split; centroid divisions happen once, at the read edge), and
  * expose the additive merge's replay sensitivity.
  */
class StreamingGeoSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("drained grid equals batch geoGrid; replay discipline holds") {
    val src = tmp("graft-geo-src")
    val store = tmp("graft-geo-store") + "/grid"
    val ckpt = tmp("graft-geo-ckpt")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")

    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    val q1 = StreamingGeo.startGridIngest(spark, src, store, ckpt)
    q1.awaitTermination(120000)
    all.where(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = StreamingGeo.startGridIngest(spark, src, store, ckpt)
    q2.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val want = rows(graft.operators.GeoOps.geoGrid(spark, sfDir))
    assert(rows(StreamingGeo.globalGrid(spark, store)) === want)

    // restart with no new files: checkpoint skips everything
    val n = spark.read.parquet(store).count()
    val q3 = StreamingGeo.startGridIngest(spark, src, store, ckpt)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(store).count() === n)

    // overwrite-own-id is a no-op; a fresh id double-counts
    StreamingGeo.writeGridBatch(all.where(col("event_id") % 2 === 0), store, 0L)
    assert(rows(StreamingGeo.globalGrid(spark, store)) === want)
    StreamingGeo.writeGridBatch(all.where(col("event_id") % 2 === 0), store, 99L)
    val inflated = StreamingGeo.globalGrid(spark, store)
      .agg(sum(col("doc_count"))).head().getLong(0)
    assert(inflated > want.map(_._2).sum,
      "a duplicate grid under a fresh id must inflate counts")
  }
}
