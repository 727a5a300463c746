package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.streaming.StreamingGraph

/** Streaming closure maintenance: the drained store must equal the
  * batch BFS over all edges seen, survive restarts without replay, and
  * absorb a re-delivered batch idempotently.
  */
class StreamingGraphSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def closureSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("two-batch drain equals the batch closure; restart replays nothing") {
    val src = tmp("graft-edge-src")
    val store = tmp("graft-closure-store") + "/closure"
    val ckpt = tmp("graft-closure-ckpt")
    val all = GraphOps.upwardEdges(spark, sfDir).localCheckpoint()
    val split = abs(hash(col("src"), col("dst"))) % 10

    all.where(split < 6).write.mode("append").parquet(src)
    val q1 = StreamingGraph.startClosureMaintenance(spark, src, store, ckpt)
    q1.awaitTermination(120000)
    val afterB1 = closureSet(StreamingGraph.latestClosure(spark, store))
    assert(afterB1 === closureSet(GraphOps.closureOf(all.where(split < 6))))

    all.where(split >= 6).write.mode("append").parquet(src)
    val q2 = StreamingGraph.startClosureMaintenance(spark, src, store, ckpt)
    q2.awaitTermination(120000)
    val drained = closureSet(StreamingGraph.latestClosure(spark, store))
    assert(drained === closureSet(GraphOps.closureOf(all)))

    // restart with no new files: nothing replays, the store is unchanged
    val q3 = StreamingGraph.startClosureMaintenance(spark, src, store, ckpt)
    q3.awaitTermination(120000)
    assert(closureSet(StreamingGraph.latestClosure(spark, store)) === drained)
  }

  test("a re-delivered batch overwrites its own version against the same predecessor") {
    val store = tmp("graft-closure-replay") + "/closure"
    val s = spark; import s.implicits._
    val b0 = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val b1 = Seq(("c", "d")).toDF("src", "dst")
    StreamingGraph.writeBatch(spark, b0, store, batchId = 0L)
    StreamingGraph.writeBatch(spark, b1, store, batchId = 1L)
    val once = closureSet(StreamingGraph.latestClosure(spark, store))
    // crash window: batch 1 re-delivered after its write committed —
    // it must relax version 0 again, not its own output, and the store
    // must not change
    StreamingGraph.writeBatch(spark, b1, store, batchId = 1L)
    assert(closureSet(StreamingGraph.latestClosure(spark, store)) === once)
    assert(once === closureSet(GraphOps.closureOf(
      Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst"))))
    assert(once(("a", "d", 3L)))
  }
}
