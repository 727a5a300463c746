package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.CountMinAgg

/** Streaming frequency-sketch maintenance — the reason mergeable
  * sketches earn their place in a pipeline: each micro-batch reduces
  * to ONE fixed-size Count-Min grid, the store accumulates one grid
  * row per batch, and the corpus-wide sketch is the cell-wise SUM of
  * whatever grids exist — no reprocessing, no per-key state, state
  * size `batches × depth × width` longs regardless of how many events
  * streamed through.
  *
  * The idempotency device is [[StreamingVectors]]'s applied to a
  * sketch artifact: `foreachBatch` is at-least-once, so each batch
  * OVERWRITES its own `ingest_batch=<id>` directory with its
  * deterministic grid — a crash-replay rewrites identical bytes
  * instead of double-counting (the failure mode sketch pipelines
  * actually hit, since cell-wise addition would silently absorb a
  * duplicate grid; spec-asserted via direct double-delivery).
  *
  * Read side ([[globalEstimates]]) is pure relational algebra over the
  * store: posexplode each grid to (cell, count), sum per cell — the
  * mergeable-summaries merge as a groupBy — then probe keys against
  * the summed cells with the same hash arithmetic
  * [[CountMinAgg.lookupExpr]] uses, as a broadcast join on cell index.
  * At scale the store read is `batches × depth × width` longs — for a
  * year of hourly batches at the default grid, ~570 MB — and the
  * estimate query never touches the event stream itself.
  */
object StreamingSketch {

  val Depth = 4
  val Width = 2048

  /** One micro-batch reduced to its sketch grid (a single row). */
  def sketchBatch(batch: DataFrame, depth: Int = Depth, width: Int = Width): DataFrame = {
    graft.plans.GraftExtensions.register(batch.sparkSession)
    batch.agg(expr(s"cms_sketch(user_id, $depth, $width)").as("sk"))
  }

  /** Per-batch sink write, idempotent on `batchId` (overwrite-own-
    * directory; see object Scaladoc).
    */
  def writeBatch(batch: DataFrame, storePath: String, batchId: Long,
      depth: Int = Depth, width: Int = Width): Unit =
    sketchBatch(batch, depth, width)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain an events directory into the sketch store. AvailableNow:
    * processes exactly the files not yet committed to the checkpoint,
    * then stops — the restartable incremental unit.
    */
  def startCmsIngest(spark: SparkSession, srcPath: String,
      storePath: String, checkpoint: String,
      depth: Int = Depth, width: Int = Width): StreamingQuery =
    StreamingAssets.eventStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, storePath, batchId, depth, width)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The corpus-wide sketch as (cell, cnt) rows: cell-wise sum of
    * every batch grid in the store.
    */
  def globalCells(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .select(posexplode(col("sk")).as(Seq("cell", "c")))
      .groupBy(col("cell"))
      .agg(sum(col("c")).as("cnt"))

  /** Frequency estimates for a probe-key frame (one `user_id` column)
    * against the accumulated store: each key joins its `depth` cells
    * (broadcast of probes × depth — the corpus-sized side never
    * reshuffles), min over rows. Same hash family as the batch
    * aggregate, so a drained store answers exactly like one
    * [[CountMinAgg]] over all events (spec-asserted).
    */
  def globalEstimates(spark: SparkSession, storePath: String,
      probes: DataFrame, depth: Int = Depth, width: Int = Width): DataFrame = {
    val cellOf = (d: Int) =>
      s"CAST($d * $width + pmod(pmod(${CountMinAgg.aOf(d)}L * pmod(user_id, ${CountMinAgg.P}L) " +
        s"+ ${CountMinAgg.bOf(d)}L, ${CountMinAgg.P}L), ${width}L) AS INT)"
    val wanted = probes.select(col("user_id"),
      explode(expr((0 until depth).map(cellOf).mkString("array(", ", ", ")")))
        .as("cell"))
    globalCells(spark, storePath)
      .join(broadcast(wanted), Seq("cell"))
      .groupBy(col("user_id"))
      // every grid cell exists in the store (posexplode of the full
      // array), so each probe key meets all `depth` of its cells and
      // min is the standard CMS estimate — 0 for absent keys. An
      // EMPTY store (no drained batch yet) yields no rows at all.
      .agg(min(col("cnt")).as("events_est"))
  }

  // ---- HyperLogLog maintenance -------------------------------------
  //
  // The cardinality complement of the CMS store above, with ONE
  // structural upgrade: [[graft.functions.HyperLogLogAgg]]'s merge is
  // element-wise MAX, which is IDEMPOTENT — a replayed or duplicated
  // register file changes nothing. The CMS path NEEDS the
  // overwrite-own-batchId discipline (additive merge double-counts a
  // duplicate grid; the spec proves it); the HLL path keeps the same
  // write discipline for uniformity but would be correct without it —
  // spec-asserted by APPENDING a duplicate file under a fresh id and
  // watching the answer not move. That robustness is why
  // max-mergeable sketches are the default choice for at-least-once
  // ingestion paths.

  /** HLL precision of the streaming store (m = 2^p registers). */
  val HllP = 12

  /** One micro-batch reduced to its register file (a single row). */
  def hllBatch(batch: DataFrame, p: Int = HllP): DataFrame = {
    graft.plans.GraftExtensions.register(batch.sparkSession)
    batch.agg(expr(s"hll_sketch(user_id, $p)").as("regs"))
  }

  /** Per-batch sink write — same idempotent overwrite shape as
    * [[writeBatch]] (uniform store layout; not load-bearing here, see
    * the section note).
    */
  def writeHllBatch(batch: DataFrame, storePath: String, batchId: Long,
      p: Int = HllP): Unit =
    hllBatch(batch, p)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain an events directory into the HLL store (AvailableNow — the
    * restartable incremental unit, as [[startCmsIngest]]).
    */
  def startHllIngest(spark: SparkSession, srcPath: String,
      storePath: String, checkpoint: String, p: Int = HllP): StreamingQuery =
    StreamingAssets.eventStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeHllBatch(batch, storePath, batchId, p)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The corpus-wide register file as (bucket, r) rows: element-wise
    * max of every batch file in the store — the mergeable-summaries
    * merge as a groupBy, `batches × m` longs read, the event stream
    * never touched.
    */
  def globalRegisters(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .select(posexplode(col("regs")).as(Seq("bucket", "r")))
      .groupBy(col("bucket"))
      .agg(max(col("r")).as("r"))

  /** One-row distinct-cardinality estimate from the accumulated store:
    * the same integer-scaled harmonic sum + single-division estimate
    * as `q47_hll_distinct` (bit-equal ingredients — a drained store
    * answers exactly like one batch sketch over all events,
    * spec-asserted).
    */
  def globalDistinct(spark: SparkSession, storePath: String,
      p: Int = HllP): DataFrame = {
    val maxRank = 60 - p + 1
    globalRegisters(spark, storePath)
      .agg(
        sum(expr(s"shiftleft(1L, $maxRank - CAST(r AS INT))")).as("hll_s"),
        sum(when(col("r") === 0L, 1L).otherwise(0L)).as("hll_zero"))
      .select(col("hll_s"), col("hll_zero"),
        (lit(graft.functions.HyperLogLogAgg.estimatorK(p)) /
          col("hll_s").cast("double")).as("hll_est"))
  }

  // ---- KMV maintenance ---------------------------------------------
  //
  // The bottom-k complement: [[graft.functions.KmvAgg]]'s merge is
  // sorted-set union truncated to k — idempotent like HLL's max (a
  // duplicated batch sketch re-inserts hashes already present), so
  // this store shares HLL's structural replay immunity, and adds what
  // neither CMS nor HLL can give a streaming consumer: the
  // accumulated sketch is a uniform hash-ordered SAMPLE of the
  // distinct keys seen so far, so two stores (two streams, two
  // tenants) compose for overlap estimates with plain set algebra.

  /** KMV capacity of the streaming store. */
  val KmvK = 256

  /** One micro-batch reduced to its bottom-k hash array (single row). */
  def kmvBatch(batch: DataFrame, k: Int = KmvK): DataFrame = {
    graft.plans.GraftExtensions.register(batch.sparkSession)
    batch.agg(expr(s"kmv_sketch(user_id, $k)").as("ks"))
  }

  /** Per-batch sink write — same idempotent overwrite shape as
    * [[writeBatch]] (uniform store layout; like HLL, not load-bearing:
    * the union-merge absorbs duplicates by construction).
    */
  def writeKmvBatch(batch: DataFrame, storePath: String, batchId: Long,
      k: Int = KmvK): Unit =
    kmvBatch(batch, k)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain an events directory into the KMV store (AvailableNow — the
    * restartable incremental unit, as [[startCmsIngest]]).
    */
  def startKmvIngest(spark: SparkSession, srcPath: String,
      storePath: String, checkpoint: String, k: Int = KmvK): StreamingQuery =
    StreamingAssets.eventStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeKmvBatch(batch, storePath, batchId, k)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The accumulated bottom-k as (h) rows: distinct hashes across
    * every batch array, k smallest — the sorted-union merge as
    * distinct + ordered limit, which plans as TakeOrderedAndProject
    * (map-side partial top-k; `batches × k` longs read, the event
    * stream never touched).
    */
  def globalKmv(spark: SparkSession, storePath: String,
      k: Int = KmvK): DataFrame =
    spark.read.parquet(storePath)
      .select(explode(col("ks")).as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)

  /** One-row distinct-cardinality estimate from the accumulated store:
    * the same regime split + single-division estimate as
    * `q48_kmv_distinct` (a drained store answers exactly like one
    * batch sketch over all events, spec-asserted).
    */
  def globalKmvDistinct(spark: SparkSession, storePath: String,
      k: Int = KmvK): DataFrame =
    globalKmv(spark, storePath, k)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kmv_kth"))
      .select(col("n_kept"), col("kmv_kth"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(graft.functions.KmvAgg.estimatorNum(k)) /
            col("kmv_kth").cast("double")).as("kmv_est"))

  // ---- Misra-Gries maintenance -------------------------------------
  //
  // The heavy-hitter complement, completing the sketch-store quartet
  // (CMS: "how often does THIS key occur", HLL: "how many distinct",
  // KMV: "give me a composable sample", MG: "WHICH keys are heavy").
  // The merge is counter ADDITION over the union of tracked items —
  // summing per-batch MG summaries yields a valid MG summary whose
  // undercount bound is the sum of the batches' n_b/(k+1) bounds
  // (Agarwal et al., "Mergeable Summaries", PODS'12) — so like CMS
  // and unlike HLL/KMV this store is NOT replay-idempotent by
  // algebra: the overwrite-own-batchId discipline is load-bearing,
  // and the spec proves it the same way (append a duplicate summary
  // under a fresh id → counts inflate; overwrite the same id → not).

  /** MG counter capacity of the streaming store (the batch q44 dial:
    * above the per-batch distinct-key count the summaries are exact).
    */
  val MgCapacity = 4096

  /** Heavy hitters reported by [[globalHeavyHitters]]. */
  val MgTopK = 20

  /** One micro-batch reduced to its MG summary (a single row of
    * ≤ capacity counters).
    */
  def mgBatch(batch: DataFrame, capacity: Int = MgCapacity): DataFrame = {
    graft.plans.GraftExtensions.register(batch.sparkSession)
    batch.agg(expr(s"misra_gries(user_id, $capacity)").as("hh"))
  }

  /** Per-batch sink write, idempotent on `batchId` (overwrite-own-
    * directory — load-bearing for the additive merge, as for CMS).
    */
  def writeMgBatch(batch: DataFrame, storePath: String, batchId: Long,
      capacity: Int = MgCapacity): Unit =
    mgBatch(batch, capacity)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain an events directory into the MG store (AvailableNow — the
    * restartable incremental unit, as [[startCmsIngest]]).
    */
  def startMgIngest(spark: SparkSession, srcPath: String,
      storePath: String, checkpoint: String,
      capacity: Int = MgCapacity): StreamingQuery =
    StreamingAssets.eventStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeMgBatch(batch, storePath, batchId, capacity)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Accumulated heavy hitters: counter sum per item across every
    * batch summary (the mergeable-summaries merge as a partial-
    * aggregated groupBy over `batches × capacity` rows — the event
    * stream never touched), top [[MgTopK]] by (count desc, item asc)
    * via TakeOrderedAndProject. Same output shape as the batch
    * `q44_heavy_hitters`, and in the exact regime (capacity above the
    * per-batch distinct-key count) identical to it row for row —
    * spec-asserted.
    */
  def globalHeavyHitters(spark: SparkSession, storePath: String,
      topK: Int = MgTopK): DataFrame =
    spark.read.parquet(storePath)
      .select(explode(col("hh")).as("e"))
      .groupBy(col("e.item").as("user_id"))
      .agg(sum(col("e.cnt")).as("events"))
      .orderBy(col("events").desc, col("user_id").asc)
      .limit(topK)
}
