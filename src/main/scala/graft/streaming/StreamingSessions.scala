package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of the session table — the artifact the batch
  * sessionizer ([[graft.operators.Relational.q30Sessionize]]) computes
  * by rescanning the full event corpus. Each micro-batch reduces to its
  * own PRELIMINARY sessions (the identical gap rule run inside the
  * batch), and the read side merges preliminary session INTERVALS, not
  * events — `batches × sessions-touched` rows instead of the corpus.
  *
  * Merge algebra: interval union under the 30-minute gap tolerance.
  * The merge is EXACT, not an approximation, by this argument: a
  * preliminary session's events chain with gaps ≤ 30 min covering its
  * [start, end] span, so for ANY instant within 30 min of that span
  * there is a member event within 30 min (the chain has no hole wider
  * than the tolerance); hence two preliminary intervals within the
  * tolerance of each other are genuinely connected through real
  * events, and conversely a sorted-start interval whose start exceeds
  * the running max end by more than the gap has NO event inside the
  * gap (any session owning one would have sorted earlier and pushed
  * the running max past it). So merged intervals = the true sessions
  * under any batch split — the drain≡batch property the spec pins.
  *
  * Counts are additive across fragments, so replay discipline is the
  * counter-store class: overwrite-own-batchId is load-bearing (a
  * replayed batch under a fresh id would double-count n_events and
  * could NOT corrupt the interval structure — but the count damage
  * alone makes idempotent overwrite mandatory; the spec proves both
  * directions).
  *
  * Read surface [[globalSessions]] reproduces the batch operator's
  * exact output grain: (user_id, session_id, n_events, session_start,
  * session_end) with the same running-sum session numbering.
  */
object StreamingSessions {

  /** One micro-batch reduced to its preliminary sessions (the batch
    * sessionizer verbatim — same gap rule, same grain).
    */
  def sessionBatch(batch: DataFrame): DataFrame =
    graft.operators.Relational.sessionizeEvents(batch)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))

  /** Per-batch sink write, idempotent on `batchId`. */
  def writeSessionBatch(batch: DataFrame, storePath: String, batchId: Long): Unit =
    sessionBatch(batch)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain an events directory into the session store (AvailableNow —
    * the restartable incremental unit).
    */
  def startSessionIngest(spark: SparkSession, srcPath: String,
      storePath: String, checkpoint: String): StreamingQuery =
    StreamingAssets.eventStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeSessionBatch(batch, storePath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The merged session table: gaps-and-islands over preliminary
    * intervals sorted by start, boundary when the start clears the
    * RUNNING MAX of prior ends by more than the gap (running max, not
    * lag: fragments from different batches may nest). Identical rows
    * to the batch sessionizer over all drained events.
    */
  def globalSessions(spark: SparkSession, storePath: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("session_start").asc, col("session_end").asc,
        col("n_events").asc)
    val prior = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.read.parquet(storePath)
      .withColumn("prev_end", max(col("session_end")).over(prior))
      .withColumn("new_session",
        when(col("session_start") - col("prev_end") <=
          expr("INTERVAL 30 MINUTES"), lit(0)).otherwise(lit(1)))
      .withColumn("session_id", sum(col("new_session")).over(runSum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(sum(col("n_events")).as("n_events"),
        min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"))
  }
}
