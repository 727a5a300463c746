package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of the daily-counter table — the artifact the
  * batch monitoring pair ([[graft.operators.Relational.evtAnomaly]],
  * [[graft.operators.Relational.evtDateHistogram]]) reads: per-(type,
  * day) event counts and DECIMAL-exact value totals. Every
  * observability stack materializes exactly this table; maintaining it
  * incrementally means the monitoring queries NEVER rescan the event
  * corpus — each micro-batch reduces to its own tiny counter grid and
  * the read side merges `batches × |types| × |days-touched|` rows.
  *
  * Merge algebra: counter ADDITION (counts and decimal sums are both
  * additive), the CMS/Misra-Gries class — NOT idempotent, so the
  * overwrite-own-batchId discipline is load-bearing here exactly as it
  * is for those stores (a replayed batch appended under a fresh id
  * double-counts; the spec proves both directions). Decimal value
  * totals stay DECIMAL(18,2) in the store and convert to double only
  * at the read edge, so merged totals are bit-equal to the batch
  * operator under any batch split.
  *
  * Read surfaces reproduce the batch pair exactly (spec-asserted):
  * [[globalDaily]] = the summed counter table, [[globalAnomaly]]
  * applies the same exact-integer z² rule, and [[globalHistogram]]
  * gap-fills the same calendar frame.
  */
object StreamingCounters {

  /** One micro-batch reduced to its (type, day) counter grid. */
  def counterBatch(batch: DataFrame): DataFrame =
    batch.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("value_dec"))

  /** Per-batch sink write, idempotent on `batchId` (overwrite-own-
    * directory — load-bearing for the additive merge).
    */
  def writeCounterBatch(batch: DataFrame, storePath: String, batchId: Long): Unit =
    counterBatch(batch)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain an events directory into the counter store (AvailableNow —
    * the restartable incremental unit).
    */
  def startCounterIngest(spark: SparkSession, srcPath: String,
      storePath: String, checkpoint: String): StreamingQuery =
    StreamingAssets.eventStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeCounterBatch(batch, storePath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The merged daily-counter table: counter sums per (type, day) —
    * identical rows to the batch operators' first aggregate over all
    * drained events (decimal sums commute under any batch split).
    */
  def globalDaily(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("n"), sum(col("value_dec")).as("value_dec"))

  /** The batch [[graft.operators.Relational.evtAnomaly]] answer read
    * off the store: same exact-integer z² flag, same one IEEE division
    * — never rescans the event corpus.
    */
  def globalAnomaly(spark: SparkSession, storePath: String): DataFrame = {
    val z2 = graft.operators.Relational.AnomalyZ * graft.operators.Relational.AnomalyZ
    val byType = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    // DECIMAL(38,0) products, mirroring the batch operator's overflow
    // hardening (see evtAnomaly's Scaladoc: n ~ 1e12/day wraps LONG)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    globalDaily(spark, storePath)
      .withColumn("d", count(lit(1)).over(byType))
      .withColumn("s", sum(col("n")).over(byType))
      .withColumn("ss", sum(dec(col("n")) * dec(col("n"))).over(byType))
      .select(col("event_type"), col("day"), col("n"),
        (col("s").cast("double") / col("d").cast("double")).as("mean_daily"),
        ((dec(col("d")) * dec(col("n")) - dec(col("s"))) *
          (dec(col("d")) * dec(col("n")) - dec(col("s"))) >
          lit(z2).cast("decimal(19,0)") *
            (dec(col("d")) * col("ss") - dec(col("s")) * dec(col("s"))))
          .as("is_anomaly"))
  }

  /** The batch [[graft.operators.Relational.evtEwma]] answer read off
    * the store: day totals are exact-decimal sums over (type, batch)
    * cells — commutative under any split — quantized to the identical
    * integer cents, then the SAME dyadic fold
    * ([[graft.operators.Relational.ewmaOverDaily]], shared code).
    */
  def globalEwma(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Relational.ewmaOverDaily(
      spark.read.parquet(storePath)
        .groupBy(col("day"))
        .agg((sum(col("value_dec")) * 100).cast("long").as("cents")))

  /** The batch [[graft.operators.Relational.evtDateHistogram]] answer
    * read off the store: the same gap-filled calendar frame over the
    * span of OBSERVED days, zero-filled, decimal totals to double at
    * the edge.
    */
  def globalHistogram(spark: SparkSession, storePath: String): DataFrame = {
    val daily = globalDaily(spark, storePath)
      .select(col("event_type"), col("day"), col("n"),
        col("value_dec").cast("double").as("value_sum"))
    val days = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val types = daily.select(col("event_type")).distinct()
    days.crossJoin(broadcast(types))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("value_sum"), lit(0.0d)).as("value_sum"))
  }
}
