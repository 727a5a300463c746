package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Assets
import graft.sources.{AssetSchema, Tables}

/** Structured Streaming form of the reference's implicitly-incremental
  * contract (SURVEY.md §2.8): each run processes a trailing window of
  * signals, dedups to latest state per entity, and upserts into the
  * assets store keyed by EAN — re-runs over overlapping windows are
  * idempotent. The reference achieves this by cron-ing the batch job;
  * here it is `readStream` → watermark + `dropDuplicatesWithinWatermark`
  * (overlap dedup) → `foreachBatch` merge-upsert (the bulk-sink analog,
  * es_client.ts:29-31).
  *
  * Scale notes: the file source lists new files incrementally (no
  * re-scan of consumed data); watermark bounds the dedup state store;
  * the upsert itself is the batch [[Assets.upsertAssets]] — one shuffle
  * on asset_ean per micro-batch. Cross-batch graph-edge accumulation
  * (children lists growing forever) is deliberately NOT kept in
  * streaming state — it would be unbounded (SURVEY.md §7.4 risk 6);
  * the merge happens against the persisted asset store instead.
  */
object StreamingAssets {

  /** Raw events schema for the file stream source under the NANOS-long
    * encoding (ts as raw parquet NANOS long — session must set
    * spark.sql.legacy.parquet.nanosAsLong; see Verify/Bench bootstrap).
    * The fallback when a directory is empty at stream start; populated
    * directories resolve their ACTUAL encoding via [[schemaOf]].
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The directory's actual events schema: the file-stream source
    * requires an explicit schema, and the generator's ts encoding has
    * varied across rounds (nanos long vs micros NTZ —
    * [[Tables.eventsFrom]] adapts to either). One batch footer read
    * resolves it; an empty directory falls back to [[eventsSchema]].
    */
  private def schemaOf(spark: SparkSession, path: String): StructType =
    try spark.read.parquet(path).schema
    catch {
      // Fall back ONLY for the two "nothing there yet" shapes (missing
      // path, schema-less empty dir) — a populated directory whose read
      // fails for any other reason (permissions, corrupt footer) must
      // ERROR, not silently stream under the wrong schema.
      case e: org.apache.spark.sql.AnalysisException
          if {
            val c = Option(e.getCondition).getOrElse("")
            c.contains("PATH_NOT_FOUND") || c.contains("UNABLE_TO_INFER_SCHEMA")
          } =>
        eventsSchema
    }

  /** Streaming signal view over an events parquet DIRECTORY (the file
    * stream source requires a directory/glob, not a bare file).
    */
  def signalStream(spark: SparkSession, path: String): DataFrame =
    Tables.signalsFrom(Tables.eventsFrom(
      spark.readStream.schema(schemaOf(spark, path)).parquet(path)))

  /** Overlap dedup: watermarked exact-once per event_id within the
    * watermark horizon — re-delivered signal docs (overlapping trailing
    * windows) collapse before asset derivation.
    */
  def dedupedSignals(sig: DataFrame, watermark: String = "15 minutes"): DataFrame =
    sig.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Raw events stream over an events parquet directory (same raw →
    * timestamp normalization as the batch loader).
    */
  def eventStream(spark: SparkSession, path: String): DataFrame =
    Tables.eventsFrom(spark.readStream.schema(schemaOf(spark, path)).parquet(path))

  /** Stream-stream interval join — the streaming twin of
    * Relational.q29RangeJoin's inner core: each purchase joins the same
    * user's views in the trailing hour, both sides watermarked so the
    * join state evicts rows older than the interval + watermark slack
    * (bounded state on unbounded streams — Spark refuses the query
    * without the event-time bound, by design). Append-mode only, like
    * every stream-stream join.
    */
  def purchasesWithPriorViews(ev: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", watermark)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    purchases.join(views,
      col("user_id") === col("v_user_id") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("p_ts"),
        col("view_id"), col("v_ts"))
  }

  /** Event-time sessionization — the streaming twin of
    * Relational.q30Sessionize, via the built-in gap-merging
    * `session_window` aggregation: a session is a run of per-user
    * events each within `gap` of the previous, closed when event time
    * passes watermark + gap. State is per (user, open session) in the
    * state store, evicted on close — bounded by active users, not
    * history (the 100 TB requirement for an unbounded stream).
    * `session_start`/`n_events` match the batch query exactly;
    * `session_end` here is last-event + gap (the window's close
    * boundary) where the batch reports the last event itself.
    */
  def sessionizedEvents(ev: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    ev.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Replace the asset state dir with the merged result via a
    * crash-safe three-step swap: write tmp → move current state aside →
    * promote tmp → drop the aside copy. A crash at ANY point leaves at
    * least one complete copy on disk (tmp, aside, or state), and the
    * recovery branch at the top restores an aside copy whose promote
    * never happened — unlike a delete-then-rename, which has a window
    * where the only copy is gone and the committed checkpoint would
    * never replay the lost batch.
    */
  private def mergeIntoState(spark: SparkSession, assets: DataFrame, statePath: String): Unit = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val state = new Path(statePath)
    val tmp = new Path(statePath + "__tmp")
    val aside = new Path(statePath + "__old")
    // Hadoop rename/delete report failure by RETURNING FALSE, not by
    // throwing: every step below is require-checked so a silent failure
    // aborts the batch (foreachBatch error → checkpoint does NOT commit
    // → the batch replays) instead of committing a batch whose merged
    // state never landed.
    // recovery: a previous crash between move-aside and promote left no
    // live state — the aside copy is the last complete one
    if (!fs.exists(state) && fs.exists(aside))
      require(fs.rename(aside, state), s"state recovery rename failed: $aside -> $state")
    if (fs.exists(tmp))
      require(fs.delete(tmp, true), s"failed to clear stale tmp dir $tmp")
    val existing =
      if (fs.exists(state)) spark.read.parquet(statePath)
      else AssetSchema.conform(assets).limit(0)
    Assets.upsertAssets(existing, assets)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(aside))
      require(fs.delete(aside, true), s"failed to drop stale aside copy $aside")
    if (fs.exists(state))
      require(fs.rename(state, aside), s"move-aside rename failed: $state -> $aside")
    require(fs.rename(tmp, state), s"promote rename failed: $tmp -> $state")
    // only after a VERIFIED promote is the aside copy redundant
    fs.delete(aside, true)
  }

  /** The flagship collection as an incremental stream: per micro-batch,
    * derive service assets from the (deduped) batch slice and
    * merge-upsert them into the asset store. `Trigger.AvailableNow`
    * drains everything currently present then stops — the cron-run
    * analog; pass a processing-time trigger for a long-lived stream.
    */
  def startServiceAssetStream(
      spark: SparkSession,
      eventsPath: String,
      statePath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    dedupedSignals(signalStream(spark, eventsPath))
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val assets = Assets.serviceAssetProjection(
          Assets.collapsedServiceSignalsFrom(batch, "21 DAY"),
          Assets.batchTs)
        mergeIntoState(spark, assets, statePath)
      }
      .start()

  /** Watermarked tumbling-window aggregation — per-service signal
    * volume per day, the SURVEY §2.8 "windowed aggs" contract. State
    * store holds only windows newer than the watermark; append mode
    * emits each window once it is final.
    */
  def windowedServiceCounts(sig: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    sig.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"), col("service_name"))
      .agg(count(lit(1)).as("n_signals"))
      .select(col("window.start").as("window_start"),
        col("service_name"), col("n_signals"))

  /** Per-service tracked state for [[serviceStateStream]]. */
  final case class ServiceObs(service_name: String, ts: java.sql.Timestamp)
  final case class ServiceState(latest: java.sql.Timestamp, n_seen: Long)
  final case class ServiceUpdate(
      service_name: String, latest_ts: java.sql.Timestamp,
      n_seen: Long, newly_seen: Boolean)

  /** Custom cross-batch state via mapGroupsWithState: tracks the latest
    * observation and lifetime count per service, emitting an update row
    * per service per micro-batch — the genuinely stateful operator the
    * reference's cross-run "children lists grow over time" contract
    * implies (SURVEY.md §2.8/§7.3). Processing-time timeout bounds
    * state for services that stop reporting.
    */
  /** The per-group state transition, extracted so the timeout branch is
    * unit-testable (via TestGroupState) without driving a real stream.
    */
  private[graft] def updateServiceState(
      name: String, obs: Iterator[ServiceObs],
      state: GroupState[ServiceState]): ServiceUpdate = {
    val batch = obs.toSeq
    if (state.hasTimedOut || batch.isEmpty) {
      // Timed-out (or spuriously empty) group: the iterator has NO
      // rows, so the maxBy below would throw and kill the stream.
      // Emit a final tombstone-style update carrying the last known
      // state, then drop the state — the service stopped reporting
      // for the whole timeout horizon.
      val last = state.getOption
      state.remove()
      ServiceUpdate(name,
        last.map(_.latest).orNull, last.map(_.n_seen).getOrElse(0L),
        newly_seen = false)
    } else {
      val newest = batch.map(_.ts).maxBy(_.getTime)
      val prior = state.getOption
      val next = prior match {
        case Some(s) => ServiceState(
          if (newest.after(s.latest)) newest else s.latest,
          s.n_seen + batch.size)
        case None => ServiceState(newest, batch.size.toLong)
      }
      state.update(next)
      state.setTimeoutDuration("30 days")
      ServiceUpdate(name, next.latest, next.n_seen, prior.isEmpty)
    }
  }

  def serviceStateStream(spark: SparkSession, sig: DataFrame): Dataset[ServiceUpdate] = {
    import spark.implicits._
    sig.select(col("service_name"), col("ts")).as[ServiceObs]
      .groupByKey(_.service_name)
      .mapGroupsWithState[ServiceState, ServiceUpdate](
        GroupStateTimeout.ProcessingTimeTimeout)(updateServiceState)
  }
}
