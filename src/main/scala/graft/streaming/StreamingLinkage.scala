package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** Incremental fuzzy JOIN — the streaming form of
  * [[graft.operators.TextOps.fuzzyJoin]]'s entity resolution: a fixed
  * CURATED corpus (the right side — signatures + shingle sets indexed
  * once at stream start) is continuously linked against arriving
  * micro-batches of crawl documents (the left side). Each batch's docs
  * are signed, band-joined against the curated index (the same
  * O(collisions) LSH bucket join as the batch operator — never
  * batch × store), candidates are verified with exact shingle Jaccard,
  * and accepted pairs land in `matchesPath/batch_id=N/`.
  *
  * Replay/idempotence: each batch OVERWRITES its own partition (the
  * [[StreamingCorpus]] discipline), and the curated side is static, so
  * a replayed batch rewrites byte-identical pairs and the drained
  * matches equal the batch [[TextOps.fuzzyJoin]] over everything that
  * arrived — the differential proof StreamingLinkageSpec runs.
  *
  * Contrast with [[StreamingCorpus]]: that stream DEDUPS the arriving
  * corpus against its own accumulating store (state grows, decisions
  * per doc); this one LINKS arrivals against a fixed reference
  * (state constant, verified match PAIRS with scores — the "which
  * curated docs does this crawl increment duplicate" readout).
  */
object StreamingLinkage {

  /** The curated-side index: signatures and shingle sets, derived once
    * (at cluster scale this is a written table; here a per-call
    * derivation the caller reuses across batches).
    */
  private[graft] def curatedIndex(curated: DataFrame): (DataFrame, DataFrame) = {
    val sigs = TextOps.minhashSignaturesFrom(curated)
    val bands = sigs.select(col("doc_id").as("right_id"),
      posexplode(expr(TextOps.sigBandKeysExpr)).as(Seq("band_idx", "band_key")))
    val sh = TextOps.shingleSetsFrom(curated)
      .select(col("doc_id").as("right_id"), col("sh").as("sh_r"))
    (bands, sh)
  }

  /** One micro-batch: link `batch` (left side) against the curated
    * index, write verified pairs into this batch's own partition.
    * Package-visible so the spec drives it without a running stream.
    */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      curatedBands: DataFrame, curatedSh: DataFrame,
      matchesPath: String): Unit = {
    val docs = batch.select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bands = TextOps.minhashSignaturesFrom(docs)
        .select(col("doc_id").as("left_id"),
          posexplode(expr(TextOps.sigBandKeysExpr)).as(Seq("band_idx", "band_key")))
      val cands = bands.join(curatedBands, Seq("band_idx", "band_key"))
        .select(col("left_id"), col("right_id")).distinct()
      val shL = TextOps.shingleSetsFrom(docs)
        .select(col("doc_id").as("left_id"), col("sh").as("sh_l"))
      cands
        .join(shL, Seq("left_id"))
        .join(curatedSh, Seq("right_id"))
        .select(col("left_id"), col("right_id"),
          (size(array_intersect(col("sh_l"), col("sh_r"))).cast("double") /
            (size(col("sh_l")) + size(col("sh_r")) -
              size(array_intersect(col("sh_l"), col("sh_r")))))
            .as("jaccard"))
        .where(col("jaccard") >= TextOps.FuzzyJoinThreshold)
        .write.mode("overwrite").parquet(s"$matchesPath/batch_id=$batchId")
    } finally docs.unpersist(blocking = false)
  }

  /** Start the incremental linkage over a parquet directory stream of
    * left-side documents ([[StreamingCorpus.docsSchema]] layout).
    * `Trigger.AvailableNow` drains-and-stops (the cron analog).
    */
  def startLinkageStream(
      spark: SparkSession,
      docsPath: String,
      curated: DataFrame,
      matchesPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val (bands, sh) = curatedIndex(curated)
    // the index is reused by every micro-batch: persist both halves
    // (the in-session analog of the written curated index table)
    val pb = bands.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val psh = sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    StreamingCorpus.docStream(spark, docsPath)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, pb, psh, matchesPath)
      }
      .start()
  }

  /** All matches drained so far (the accumulated linkage table). */
  def matches(spark: SparkSession, matchesPath: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(matchesPath)) &&
        fs.listStatus(new Path(matchesPath)).nonEmpty)
      spark.read.parquet(matchesPath)
        .select(col("left_id"), col("right_id"), col("jaccard"))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("left_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("right_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("jaccard",
            org.apache.spark.sql.types.DoubleType))))
  }
}
