package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** Streaming percolator — the ES alerting pattern run as a store:
  * stored queries are the (static, broadcast) index, every arriving
  * document batch is probed against them inside its own micro-batch,
  * and the per-batch MATCH rows (doc, query, matched-term count) land
  * under overwrite-own-batchId. The read side is a distinct union —
  * the percolate answer for everything ingested so far, maintained
  * without ever rescanning the corpus (each doc is percolated exactly
  * once, in the batch that carried it).
  *
  * Merge algebra: SET UNION of match rows — IDEMPOTENT, the opposite
  * end of the replay spectrum from the additive counter/session
  * stores: a replayed batch under a FRESH id merely re-asserts the
  * same rows and the distinct read absorbs it (the spec proves the
  * contrast explicitly). Idempotence holds because a match row is a
  * pure function of (doc text, stored queries) and each doc's text
  * rides entirely inside one batch.
  *
  * Read ≡ batch: [[globalMatches]] equals
  * [[graft.operators.TextOps.percolate]] over all drained docs —
  * same distinct (doc, term) cut, same broadcast query-term join,
  * same conjunction test, just per-batch.
  */
object StreamingPercolate {

  /** One micro-batch percolated against the stored query set — the
    * batch operator's exact mechanics on a frame instead of a dir.
    */
  def matchBatch(batch: DataFrame,
      workload: Seq[(Long, Seq[String])] = TextOps.bm25Queries): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val q = workload.flatMap { case (id, ts) =>
      ts.distinct.map(t => (id, t, ts.distinct.length.toLong))
    }.toDF("query_id", "term", "n_terms")
    batch
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(q), Seq("term"))
      .groupBy(col("doc_id"), col("query_id"), col("n_terms"))
      .agg(countDistinct(col("term")).as("n_matched"))
      .where(col("n_matched") === col("n_terms"))
      .select(col("doc_id"), col("query_id"), col("n_matched"))
  }

  /** Per-batch sink write, idempotent on `batchId`. */
  def writeMatchBatch(batch: DataFrame, storePath: String, batchId: Long): Unit =
    matchBatch(batch)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest_batch=$batchId")

  /** Drain a documents directory into the match store (AvailableNow —
    * the restartable incremental unit).
    */
  def startPercolateIngest(spark: SparkSession, srcPath: String,
      storePath: String, checkpoint: String): StreamingQuery =
    StreamingCorpus.docStream(spark, srcPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeMatchBatch(batch, storePath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** All matches so far — the distinct union that makes replay under
    * any id a no-op (the idempotent-merge class).
    */
  def globalMatches(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .select(col("doc_id"), col("query_id"), col("n_matched"))
      .distinct()
}
