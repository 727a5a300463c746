package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.streaming.StreamingVocab

/** Incremental tokenizer-training state: the merged word-count store
  * re-trains BOTH tokenizer families bit-identically to the batch
  * operators over the ingested corpus, under an uneven batch split;
  * the counter algebra's replay discipline holds in both directions.
  */
class StreamingVocabSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def bpeRows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSet

  private def uniRows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("drained dictionary re-trains BPE and unigram ≡ batch; replay discipline") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val srcDir = tmp("graft-vocab-src") + "/docs"
    val store = tmp("graft-vocab-store") + "/store"
    val ckpt = tmp("graft-vocab-ckpt")

    docs.where(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingVocab.startVocabIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)
    docs.where(col("doc_id") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingVocab.startVocabIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)

    val batchBpe = bpeRows(TextOps.bpeTrain(spark, sfDir))
    val batchUni = uniRows(TextOps.unigramTrain(spark, sfDir))
    assert(batchBpe.nonEmpty && batchUni.nonEmpty)
    assert(bpeRows(StreamingVocab.globalBpeTrain(spark, store)) === batchBpe,
      "drained BPE training diverged from batch")
    assert(uniRows(StreamingVocab.globalUnigramTrain(spark, store)) === batchUni,
      "drained unigram training diverged from batch")

    // replay discipline on the governed state (the dictionary): a
    // same-id rewrite is a no-op; a fresh id double-counts its words
    def totalF: Long = StreamingVocab.globalBpeTrain(spark, store)
      .sparkSession.read.parquet(s"$store/wf")
      .agg(sum(col("f"))).collect().head.getLong(0)
    val before = totalF
    StreamingVocab.writeBatch(docs.where(col("doc_id") % 3 === 0), 0L, store)
    assert(totalF === before, "same-id replay changed the dictionary")
    assert(bpeRows(StreamingVocab.globalBpeTrain(spark, store)) === batchBpe)
    val sliceWords = docs.where(col("doc_id") % 3 === 0)
      .select(explode(split(col("text"), " "))).count()
    StreamingVocab.writeBatch(docs.where(col("doc_id") % 3 === 0), 99L, store)
    assert(totalF === before + sliceWords,
      "fresh-id replay must double-count the slice's words")
  }
}
