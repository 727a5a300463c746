package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.GeoOps

/** Streaming maintenance of the geohash-cell counter grid — the
  * artifact behind [[graft.operators.GeoOps.geoGrid]]'s heat-map
  * answer, kept incrementally: each micro-batch reduces to its own
  * per-cell (count, decimal value mass, integer coordinate sums) grid
  * and the read side merges `batches × cells-touched` rows, never the
  * event corpus. The cell key and the microdegree coordinate sums are
  * the SAME integer derivations the batch operator uses (shared code),
  * so the merged read reproduces it bit for bit.
  *
  * Merge algebra: counter ADDITION on all four measures (counts,
  * DECIMAL sums, two integer coordinate sums) — the
  * StreamingCounters class, so overwrite-own-batchId is load-bearing
  * and a replayed batch under a fresh id double-counts (spec proves
  * both directions).
  */
object StreamingGeo {

  /** One micro-batch reduced to its geohash-cell grid. Coordinate
    * attachment is [[GeoOps.attachCoords]] — the SAME code the batch
    * operator runs, not a re-inlined copy.
    */
  def gridBatch(batch: DataFrame): DataFrame =
    GeoOps.attachCoords(batch)
      .withColumn("cell", expr(GeoOps.geohashSql(GeoOps.GeohashPrecision)))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("value_dec"),
        sum(col("lon_micro")).as("slon"), sum(col("lat_micro")).as("slat"))

  /** Per-batch sink write, idempotent on `batchId`. */
  def writeGridBatch(batch: DataFrame, storePath: String, batchId: Long): Unit =
    gridBatch(batch)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain an events directory into the grid store. */
  def startGridIngest(spark: SparkSession, srcPath: String,
      storePath: String, checkpoint: String): StreamingQuery =
    StreamingAssets.eventStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeGridBatch(batch, storePath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The batch [[GeoOps.geoGrid]] answer read off the store: identical
    * top-k rows — counts, decimal-exact value mass, and the centroid
    * divisions replayed over the SUMMED integers (addition commutes
    * under any batch split, and the one-division-at-the-edge discipline
    * means the merged quotient equals the batch quotient exactly).
    */
  def globalGrid(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(col("cell"))
      .agg(sum(col("n")).as("doc_count"),
        sum(col("value_dec")).cast("double").as("value_sum"),
        sum(col("slon")).as("slon"), sum(col("slat")).as("slat"))
      .select(col("cell"), col("doc_count"), col("value_sum"),
        (col("slon").cast("double") / col("doc_count").cast("double") /
          1000000.0d - 180.0d).as("centroid_lon"),
        (col("slat").cast("double") / col("doc_count").cast("double") /
          1000000.0d - 90.0d).as("centroid_lat"))
      .orderBy(col("doc_count").desc, col("cell").asc)
      .limit(GeoOps.GridTopK)
}
