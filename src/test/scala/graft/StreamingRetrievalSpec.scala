package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.streaming.StreamingRetrieval

/** Incremental BM25 index maintenance (SURVEY.md §2.8 + the retrieval
  * family): per-batch postings/length slices accumulate under the
  * overwrite-own-batchId discipline; the drained index must score
  * bit-identically to the batch operator over the same corpus.
  */
class StreamingRetrievalSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
      r.getAs[Long]("n_matched"))).toSet

  test("drained index scores identically to batch bm25 over the same corpus") {
    val srcDir = tmp("graft-retr-src") + "/docs"
    val indexPath = tmp("graft-retr-idx") + "/index"
    val ckpt = tmp("graft-retr-ckpt")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // three micro-batches partitioning the real documents table; each
    // stream run drains the files appended since the last checkpoint
    (0 until 3).foreach { slice =>
      docs.where(pmod(col("doc_id"), lit(3)) === slice)
        .coalesce(1).write.mode("append").parquet(srcDir)
      StreamingRetrieval.startIndexStream(spark, srcDir, indexPath, ckpt)
        .awaitTermination(120000)
    }
    val streamed = resultSet(StreamingRetrieval.bm25Search(spark, indexPath))
    val batch = resultSet(TextOps.bm25(spark, sfDir))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the same store serves the second read side: significant terms
    def sigSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
        r.getAs[String]("term"), r.getAs[Long]("fg"), r.getAs[Long]("bg"),
        r.getAs[Double]("jlh"))).toSet
    val sigStreamed = sigSet(StreamingRetrieval.sigTermsSearch(spark, indexPath))
    assert(sigStreamed === sigSet(TextOps.sigTerms(spark, sfDir)))
    assert(sigStreamed.nonEmpty)
    // ...and the third: search-as-you-type completion off the same store
    def compSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    val compStreamed =
      compSet(StreamingRetrieval.completionSearch(spark, indexPath))
    assert(compStreamed === compSet(TextOps.suggestCompletion(spark, sfDir)))
    assert(compStreamed.nonEmpty)
    // ...the fourth: fuzzy term-level query off the same store
    def fuzzySet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("input_term"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms_matched"),
        r.getAs[Long]("total_tf"), r.getAs[Long]("min_dist"))).toSet
    val fuzzyStreamed = fuzzySet(StreamingRetrieval.fuzzySearch(spark, indexPath))
    assert(fuzzyStreamed === fuzzySet(TextOps.fuzzyQuery(spark, sfDir)))
    assert(fuzzyStreamed.nonEmpty)
    // ...and the fifth: wildcard, both anchors, off the same store
    def wcSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("pattern"),
        r.getAs[String]("term"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tf"))).toSet
    val wcStreamed = wcSet(StreamingRetrieval.wildcardSearch(spark, indexPath))
    assert(wcStreamed === wcSet(TextOps.wildcardSearch(spark, sfDir)))
    assert(wcStreamed.nonEmpty)
  }

  test("batch replay is idempotent: a reprocessed slice changes nothing") {
    val indexPath = tmp("graft-retr-replay") + "/index"
    val s = spark; import s.implicits._
    def docsDf(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "spec", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b0 = docsDf(Seq((1L, "spark join window"), (2L, "filter scan")))
    val b1 = docsDf(Seq((3L, "spark spark filter")))
    StreamingRetrieval.processBatch(spark, b0, 0L, indexPath)
    StreamingRetrieval.processBatch(spark, b1, 1L, indexPath)
    val once = resultSet(StreamingRetrieval.bm25Search(spark, indexPath))
    // crash before checkpoint commit replays batch 1: same partition,
    // overwritten in place — postings/lens row counts and scores hold
    StreamingRetrieval.processBatch(spark, b1, 1L, indexPath)
    assert(resultSet(StreamingRetrieval.bm25Search(spark, indexPath)) === once)
    assert(spark.read.parquet(s"$indexPath/lens").count() === 3)
    assert(spark.read.parquet(s"$indexPath/postings")
      .where(col("doc_id") === 3L).count() === 2) // spark, filter
    assert(once.nonEmpty)
  }

  test("compaction folds batch partitions into one segment; reads unchanged") {
    val indexPath = tmp("graft-retr-compact") + "/index"
    val docs = graft.sources.Tables.documents(spark, sfDir)
    (0 until 3).foreach { slice =>
      StreamingRetrieval.processBatch(spark,
        docs.where(pmod(col("doc_id"), lit(3)) === slice), slice.toLong, indexPath)
    }
    val before = resultSet(StreamingRetrieval.bm25Search(spark, indexPath))
    def partitions(sub: String): Set[String] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$indexPath/$sub"))
        .map(_.getPath.getName).filter(_.startsWith("batch_id=")).toSet
    }
    assert(partitions("postings") ===
      Set("batch_id=0", "batch_id=1", "batch_id=2"))
    // fold batches 0-1 into the segment; batch 2 stays live
    StreamingRetrieval.compactIndex(spark, indexPath, upToBatch = 1L)
    assert(partitions("postings") === Set("batch_id=-1", "batch_id=2"))
    assert(resultSet(StreamingRetrieval.bm25Search(spark, indexPath)) === before)
    // the stream keeps ingesting after compaction, and a SECOND
    // compaction folds the prior segment together with the new batches
    StreamingRetrieval.processBatch(spark,
      docs.limit(0), 3L, indexPath) // an empty late batch is harmless
    StreamingRetrieval.compactIndex(spark, indexPath, upToBatch = 3L)
    assert(partitions("postings") === Set("batch_id=-1"))
    assert(resultSet(StreamingRetrieval.bm25Search(spark, indexPath)) === before)
    assert(before.nonEmpty)
  }
}
