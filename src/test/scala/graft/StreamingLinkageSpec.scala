package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.streaming.StreamingLinkage

/** Incremental fuzzy join: arriving left-side batches linked against a
  * fixed curated right side; drained matches must equal the BATCH
  * fuzzyJoin over everything that arrived (the differential proof).
  */
class StreamingLinkageSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("drained stream matches ≡ batch fuzzyJoin; replay is idempotent") {
    // the batch operator's own side split on the real fixture: left =
    // even source index, right = odd
    val sideExpr = expr("CAST(substring(source, 4, 8) AS INT) % 2")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val left = docs.where(sideExpr === 0)
    val curated = docs.where(sideExpr === 1)

    val srcDir = tmp("graft-linkage-src") + "/docs"
    val matches = tmp("graft-linkage-out") + "/matches"
    val ckpt = tmp("graft-linkage-ckpt")

    // left side arrives as THREE micro-batches (uneven split by id)
    left.where(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingLinkage.startLinkageStream(spark, srcDir, curated, matches, ckpt)
      .awaitTermination(120000)
    left.where(col("doc_id") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingLinkage.startLinkageStream(spark, srcDir, curated, matches, ckpt)
      .awaitTermination(120000)

    val streamed = StreamingLinkage.matches(spark, matches).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = TextOps.fuzzyJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "fixture lost its cross-side near-dups")
    assert(streamed === batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")

    // replay: re-running a batch id overwrites its own partition and
    // the static curated side makes the pairs byte-identical
    val (bands, sh) = StreamingLinkage.curatedIndex(curated)
    StreamingLinkage.processBatch(
      left.where(col("doc_id") % 3 === 0), 0L, bands, sh, matches)
    val replayed = StreamingLinkage.matches(spark, matches).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(replayed === batch, "replay changed the accumulated matches")
  }

  test("empty curated side and shingle-less left docs link to nothing") {
    val s = spark; import s.implicits._
    val curated = Seq((100L, "totally different curated corpus text here", "en", "src1", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (bands, sh) = StreamingLinkage.curatedIndex(curated)
    val matches = tmp("graft-linkage-empty") + "/matches"
    // a too-short doc (no shingles) and an unrelated doc: no pairs
    val batch = Seq((1L, "too short", "en", "src0", 9L),
        (2L, "an unrelated crawl document with plenty of words inside", "en", "src0", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    StreamingLinkage.processBatch(batch, 0L, bands, sh, matches)
    assert(StreamingLinkage.matches(spark, matches).count() === 0)
  }
}
