package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.streaming.StreamingDsir

/** Incremental DSIR: the merged tf store scores bit-identically to the
  * batch operator over the ingested corpus, under any batch split.
  */
class StreamingDsirSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def collectScores(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSet

  test("drained store scores ≡ batch dsir; replay is idempotent") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val srcDir = tmp("graft-dsir-src") + "/docs"
    val store = tmp("graft-dsir-store") + "/store"
    val ckpt = tmp("graft-dsir-ckpt")

    // the fixture arrives as three uneven micro-batches
    docs.where(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingDsir.startDsirIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)
    docs.where(col("doc_id") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingDsir.startDsirIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)

    val streamed = collectScores(StreamingDsir.globalDsir(spark, store))
    val batch = collectScores(TextOps.dsir(spark, sfDir))
    assert(batch.nonEmpty)
    assert(streamed === batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")

    // replay: re-writing batch 0's slice overwrites its own partition
    StreamingDsir.writeBatch(docs.where(col("doc_id") % 3 === 0), 0L, store)
    assert(collectScores(StreamingDsir.globalDsir(spark, store)) === batch,
      "replay changed the merged scores")
  }

  test("vocabulary drift: a new source batch re-orders already-scored docs") {
    val s = spark; import s.implicits._
    def df(rows: Seq[(Long, String, String)]) =
      rows.map { case (i, t, l) => (i, t, l, "spec", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val store = tmp("graft-dsir-drift") + "/store"
    // batch 0: two en docs with disjoint vocab, one de doc
    StreamingDsir.writeBatch(df(Seq(
      (0L, "alpha beta", "en"), (4L, "delta epsilon", "en"),
      (1L, "eins zwei drei", "de"))), 0L, store)
    val before = StreamingDsir.globalDsir(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // batch 1: a de doc that heavily uses doc 4's vocabulary. Under
    // add-one counts, growing the source corpus raises log(S/(c_s+1))
    // for every word the new text does NOT use — so doc 0 (untouched
    // vocab) must gain distinctiveness RELATIVE to doc 4 (whose words
    // now also live on the source side): the gap between them widens.
    // An absolute-drop assertion would be wrong — that is the point of
    // maintaining the weights incrementally: the whole surface shifts.
    StreamingDsir.writeBatch(df(Seq(
      (2L, Seq.fill(8)("delta epsilon").mkString(" "), "de"))), 1L, store)
    val after = StreamingDsir.globalDsir(spark, store).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(after(0L) - after(4L) > before(0L) - before(4L),
      s"doc 0 vs doc 4 gap must widen when doc 4's vocab leaks to the " +
        s"source side: ${before(0L)}-${before(4L)} -> ${after(0L)}-${after(4L)}")
  }
}
