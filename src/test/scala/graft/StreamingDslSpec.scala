package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DslQueries
import graft.plans.QueryDsl
import graft.streaming.StreamingDsl

/** DSL requests served from the stream-accumulated document store:
  * a real AvailableNow ingest in two uneven drains, then the compiled
  * scored / filter-context / compound-bool reads BIT-EQUAL to the
  * batch compile over the same corpus; replay discipline in both
  * directions — a same-id overwrite changes nothing, a fresh-id
  * replay corrupts BM25 scores corpus-wide (df/idf double-count),
  * which is exactly why overwrite-own-batchId is load-bearing for a
  * search store.
  */
class StreamingDslSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("served DSL reads ≡ batch compile; replay discipline both directions") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val srcDir = tmp("graft-dsl-src") + "/docs"
    val store = tmp("graft-dsl-store") + "/store"
    val ckpt = tmp("graft-dsl-ckpt")

    // two uneven drains through the real file-stream ingest
    docs.where(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingDsl.startDocIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)
    docs.where(col("doc_id") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    StreamingDsl.startDocIngest(spark, srcDir, store, ckpt)
      .awaitTermination(120000)

    val served = StreamingDsl.servedEnv(spark, store)
    val batch = DslQueries.docEnv(spark, sfDir)

    // scored read (the BM25 envelope: df/idf derive from the store)
    val scoredWant = rows(QueryDsl.search(batch, DslQueries.ScoreBody))
    assert(rows(QueryDsl.search(served, DslQueries.ScoreBody)) === scoredWant,
      "served scored read diverged from batch")
    // filter-context read
    assert(rows(QueryDsl.drain(served, DslQueries.MatchBody))
      === rows(QueryDsl.drain(batch, DslQueries.MatchBody)),
      "served filter read diverged from batch")
    // compound scored bool (must + boosted should + gates)
    assert(rows(QueryDsl.search(served, DslQueries.BoolScoredBody))
      === rows(QueryDsl.search(batch, DslQueries.BoolScoredBody)),
      "served scored bool diverged from batch")
    assert(scoredWant.nonEmpty)

    // same-id replay (crash before checkpoint commit): idempotent.
    // Materialize the slice first — the replay overwrites the very
    // partition it was read from.
    val slice0Src = spark.read.parquet(s"$store/docs/batch_id=0")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    val slice0 = spark.createDataFrame(
      spark.sparkContext.parallelize(slice0Src.collect().toSeq),
      slice0Src.schema)
    StreamingDsl.writeBatch(slice0, 0L, store)
    assert(rows(QueryDsl.search(StreamingDsl.servedEnv(spark, store),
      DslQueries.ScoreBody)) === scoredWant,
      "same-id replay changed the served scores")

    // fresh-id replay double-counts: not just duplicate hits — the
    // corpus-wide df/idf shift corrupts every score
    StreamingDsl.writeBatch(slice0, 99L, store)
    assert(rows(QueryDsl.search(StreamingDsl.servedEnv(spark, store),
      DslQueries.ScoreBody)) !== scoredWant,
      "a fresh-id replay must change BM25 scores (df/idf double-count)")
  }

  test("hybrid knn+query+rrf serves from stream state ≡ batch compile") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val embs = graft.sources.Tables.embeddings(spark, sfDir)
    val docSrc = tmp("graft-hyb-docsrc") + "/docs"
    val embSrc = tmp("graft-hyb-embsrc") + "/embs"
    val store = tmp("graft-hyb-store") + "/store"
    val ckptD = tmp("graft-hyb-ckpt-d")
    val ckptE = tmp("graft-hyb-ckpt-e")

    // two uneven drains on BOTH slices (doc and embedding ingest are
    // independent streams, like separate index-side pipelines)
    docs.where(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(docSrc)
    embs.where(col("vec_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(embSrc)
    StreamingDsl.startDocIngest(spark, docSrc, store, ckptD)
      .awaitTermination(120000)
    StreamingDsl.startEmbIngest(spark, embSrc, store, ckptE)
      .awaitTermination(120000)
    docs.where(col("doc_id") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(docSrc)
    embs.where(col("vec_id") % 3 =!= 0)
      .coalesce(1).write.mode("append").parquet(embSrc)
    StreamingDsl.startDocIngest(spark, docSrc, store, ckptD)
      .awaitTermination(120000)
    StreamingDsl.startEmbIngest(spark, embSrc, store, ckptE)
      .awaitTermination(120000)

    val got = rows(QueryDsl.search(
      StreamingDsl.servedHybridEnv(spark, store), DslQueries.HybridBody))
    val want = rows(QueryDsl.search(
      DslQueries.hybridEnv(spark, sfDir), DslQueries.HybridBody))
    assert(got === want, "served hybrid diverged from batch")
    assert(got.nonEmpty)

    // fresh-id replay of an embedding slice duplicates candidate rows:
    // the vec side's ranks (and so the fused RRF order) must shift —
    // the overwrite discipline is load-bearing on BOTH slices
    val emb0Src = spark.read.parquet(s"$store/embs/batch_id=0")
      .select(col("vec_id"), col("embedding"), col("label"))
    val emb0 = spark.createDataFrame(
      spark.sparkContext.parallelize(emb0Src.collect().toSeq),
      emb0Src.schema)
    StreamingDsl.writeEmbBatch(emb0, 0L, store)
    assert(rows(QueryDsl.search(
      StreamingDsl.servedHybridEnv(spark, store), DslQueries.HybridBody))
      === want, "same-id embedding replay changed the served hybrid")

    // the APPROXIMATE hybrid (num_candidates → the IVF candidate walk)
    // serves bit-equal too: the served env's index trains from the
    // drained store — decimal-exact means are accumulation-order-
    // independent, so the streamed index equals the batch-trained one
    val gotApprox = rows(QueryDsl.search(
      StreamingDsl.servedHybridEnv(spark, store), DslQueries.HybridApproxBody))
    val wantApprox = rows(QueryDsl.search(
      DslQueries.hybridEnv(spark, sfDir), DslQueries.HybridApproxBody))
    assert(gotApprox === wantApprox, "served approx hybrid diverged from batch")
    assert(gotApprox.nonEmpty)

    StreamingDsl.writeEmbBatch(emb0, 99L, store)
    assert(rows(QueryDsl.search(
      StreamingDsl.servedHybridEnv(spark, store), DslQueries.HybridBody))
      !== want, "a fresh-id embedding replay must perturb the fusion")
  }
}
