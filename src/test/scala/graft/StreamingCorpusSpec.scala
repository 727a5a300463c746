package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamingCorpus

/** Incremental corpus dedup (SURVEY.md §2.8 + the dedup family): each
  * micro-batch is judged against the accumulated signature store —
  * exact digest, then LSH near-match — and only novel docs enter it.
  */
class StreamingCorpusSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (id, t) => (id, t, "en", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("incremental dedup: decisions and store evolve across micro-batches") {
    val srcDir = tmp("graft-corpus-src") + "/docs"
    val store = tmp("graft-corpus-store") + "/store"
    val decisions = tmp("graft-corpus-dec") + "/decisions"
    val ckpt = tmp("graft-corpus-ckpt")
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearVariant = base.replace("w30", "w99") // 25/31 shingle Jaccard
    val other = "completely different content entirely p q r s t u v w x y"

    // batch 0: two novel docs + an intra-batch exact copy of doc 1
    docsDf(Seq((1L, base), (2L, other), (6L, base)))
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingCorpus.startDedupStream(spark, srcDir, store, decisions, ckpt)
      .awaitTermination(120000)
    def decisionsAt(batch: Int): Map[Long, (String, Option[Long])] =
      spark.read.parquet(decisions).where(col("batch_id") === batch)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("status"),
            Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong)))).toMap
    val d0 = decisionsAt(0)
    assert(d0(1L) === (("new", None)))
    assert(d0(2L) === (("new", None)))
    assert(d0(6L) === (("exact_dup", Some(1L)))) // intra-batch canonical
    assert(spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))

    // batch 1: exact dup of 1, near dup of 1 (one word changed), novel
    docsDf(Seq((3L, base), (4L, nearVariant),
        (5L, "fresh unseen totally novel text padded out to some length")))
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingCorpus.startDedupStream(spark, srcDir, store, decisions, ckpt)
      .awaitTermination(120000)
    val d1 = decisionsAt(1)
    assert(d1(3L) === (("exact_dup", Some(1L))))
    assert(d1(4L) === (("near_dup", Some(1L))))
    assert(d1(5L)._1 === "new")
    // store grew by exactly the novel doc; dups never entered it
    assert(spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 5L))
  }

  test("batch replay is idempotent: reprocessing overwrites its own partitions") {
    val store = tmp("graft-replay-store") + "/store"
    val decisions = tmp("graft-replay-dec") + "/decisions"
    val batch = docsDf(Seq((1L, (1 to 30).map(i => s"w$i").mkString(" "))))
    StreamingCorpus.processBatch(spark, batch, 0L, store, decisions)
    // a crash before checkpoint commit replays the same batch id
    StreamingCorpus.processBatch(spark, batch, 0L, store, decisions)
    assert(spark.read.parquet(store).count() === 1)
    assert(spark.read.parquet(decisions).count() === 1)
    // and the replayed doc is still judged against OTHER batches only,
    // not against its own prior write: status stays 'new'
    assert(spark.read.parquet(decisions).head().getAs[String]("status") === "new")
  }
}
