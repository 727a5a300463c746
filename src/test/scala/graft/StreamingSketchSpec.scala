package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.CountMinAgg
import graft.streaming.StreamingSketch

/** Streaming Count-Min maintenance: a drained store must answer
  * frequency queries exactly like one batch sketch over all events,
  * survive restarts without re-counting, and absorb an at-least-once
  * double delivery without double-counting (the failure mode additive
  * sketches actually hit).
  */
class StreamingSketchSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def estimates(store: String, keys: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    StreamingSketch.globalEstimates(spark, store, keys.toDF("user_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two-batch drain answers like one batch sketch; restart and replay add nothing") {
    val src = tmp("graft-cms-src")
    val store = tmp("graft-cms-store") + "/sketch"
    val ckpt = tmp("graft-cms-ckpt")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")

    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    val q1 = StreamingSketch.startCmsIngest(spark, src, store, ckpt)
    q1.awaitTermination(120000)

    all.where(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = StreamingSketch.startCmsIngest(spark, src, store, ckpt)
    q2.awaitTermination(120000)

    // the sketch runs in its exact regime (width > user domain at this
    // sf), so the drained store must reproduce exact per-user counts —
    // which also proves it equals the single batch sketch, cell for cell
    val keys = 0L until 20L
    val exact = all.where(col("user_id").isNotNull)
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = estimates(store, keys)
    keys.foreach(u => assert(est(u) === exact.getOrElse(u, 0L), s"user $u"))

    // restart with no new files: the checkpoint must skip everything
    val grids = spark.read.parquet(store).count()
    val q3 = StreamingSketch.startCmsIngest(spark, src, store, ckpt)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(store).count() === grids)
    assert(estimates(store, keys) === est)

    // at-least-once double delivery: re-running one batchId's write
    // OVERWRITES its own directory — cell-wise addition never sees a
    // duplicate grid, so estimates are unchanged
    StreamingSketch.writeBatch(
      all.where(col("event_id") % 2 === 0), store, 0L)
    assert(estimates(store, keys) === est)
    // whereas a duplicate grid APPENDED under a fresh batch id WOULD
    // double-count — proving the overwrite discipline is load-bearing
    StreamingSketch.writeBatch(
      all.where(col("event_id") % 2 === 0), store, 99L)
    val doubled = estimates(store, keys)
    assert(keys.filter(u => exact.contains(u))
      .exists(u => doubled(u) > est(u)),
      "appending the same grid under a new id must inflate counts")
  }

  test("HLL store: drain equals one batch sketch; duplicate grids are harmless WITHOUT overwrite") {
    val src = tmp("graft-hll-src")
    val store = tmp("graft-hll-store") + "/sketch"
    val ckpt = tmp("graft-hll-ckpt")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")

    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    val q1 = StreamingSketch.startHllIngest(spark, src, store, ckpt)
    q1.awaitTermination(120000)
    all.where(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = StreamingSketch.startHllIngest(spark, src, store, ckpt)
    q2.awaitTermination(120000)

    // drained store's merged registers must equal one batch sketch
    // over ALL events, register for register
    graft.plans.GraftExtensions.register(spark)
    val direct = all.agg(expr(s"hll_sketch(user_id, ${StreamingSketch.HllP})").as("regs"))
      .select(posexplode(col("regs")).as(Seq("bucket", "r")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def stored(): Map[Int, Long] =
      StreamingSketch.globalRegisters(spark, store)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stored() === direct)

    // the max-merge contrast with CMS: APPEND a duplicate batch file
    // under a FRESH id — the additive CMS store provably inflates in
    // this situation (previous test); the HLL answer must not move,
    // overwrite discipline or not
    StreamingSketch.writeHllBatch(
      all.where(col("event_id") % 2 === 0), store, 99L)
    assert(stored() === direct,
      "a duplicated register file must be absorbed by the max-merge")

    // estimate surface: same ingredients as q47 — S from the merged
    // registers, one division
    val est = StreamingSketch.globalDistinct(spark, store).head()
    val nExact = all.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(est.getAs[Long]("hll_zero") === direct.values.count(_ == 0L).toLong)
    // tiny-n regime at sf0.001: the raw estimate is not accuracy-bound
    // here (HllAggSpec pins accuracy at realistic n) — assert it is
    // finite, positive, and deterministic instead
    assert(est.getAs[Double]("hll_est") > 0.0 && nExact > 0)
  }

  test("store answers via the same hash family as the batch lookup expression") {
    val src = tmp("graft-cms-src2")
    val store = tmp("graft-cms-store2") + "/sketch"
    val ckpt = tmp("graft-cms-ckpt2")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")
    all.write.mode("append").parquet(src)
    val q = StreamingSketch.startCmsIngest(spark, src, store, ckpt)
    q.awaitTermination(120000)

    graft.plans.GraftExtensions.register(spark)
    val sk = all.agg(expr(
      s"cms_sketch(user_id, ${StreamingSketch.Depth}, ${StreamingSketch.Width})").as("sk"))
    val probes = spark.range(0, 30).select(col("id").as("user_id"))
    val direct = probes.crossJoin(broadcast(sk))
      .select(col("user_id"), expr(CountMinAgg.lookupExpr(
        "sk", "user_id", StreamingSketch.Depth, StreamingSketch.Width)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(estimates(store, 0L until 30L) === direct)
  }

  test("KMV store: drain equals one batch sketch; duplicate sketches are harmless WITHOUT overwrite") {
    val src = tmp("graft-kmv-src")
    val store = tmp("graft-kmv-store") + "/sketch"
    val ckpt = tmp("graft-kmv-ckpt")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")

    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    StreamingSketch.startKmvIngest(spark, src, store, ckpt).awaitTermination(120000)
    all.where(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    StreamingSketch.startKmvIngest(spark, src, store, ckpt).awaitTermination(120000)

    // drained store's merged bottom-k must equal one batch sketch over
    // ALL events, hash for hash
    graft.plans.GraftExtensions.register(spark)
    val direct = all.agg(expr(s"kmv_sketch(user_id, ${StreamingSketch.KmvK})").as("ks"))
      .select(explode(col("ks")).as("h")).collect().map(_.getLong(0)).toSeq
    def stored(): Seq[Long] =
      StreamingSketch.globalKmv(spark, store).collect().map(_.getLong(0)).toSeq
    assert(stored() === direct)

    // union-merge is idempotent: a duplicate sketch APPENDED under a
    // FRESH id (no overwrite protection at all) changes nothing —
    // HLL's replay-immunity class, where the additive CMS inflates
    StreamingSketch.writeKmvBatch(
      all.where(col("event_id") % 2 === 0), store, 99L)
    assert(stored() === direct)

    // estimate surface: same regime split + division as q48
    val est = StreamingSketch.globalKmvDistinct(spark, store).head()
    val nExact = all.select(countDistinct(col("user_id"))).head().getLong(0)
    val nKept = est.getAs[Long]("n_kept")
    assert(nKept <= StreamingSketch.KmvK)
    if (nKept < StreamingSketch.KmvK)
      // exact regime: kept = distinct hashes = distinct keys (no
      // 60-bit collision at fixture scale), estimate exact
      assert(nKept === nExact && est.getAs[Double]("kmv_est") === nExact.toDouble)
    else assert(est.getAs[Double]("kmv_est") > 0.0)
  }

  test("MG store: drain answers like the batch query; overwrite discipline load-bearing") {
    val src = tmp("graft-mg-src")
    val store = tmp("graft-mg-store") + "/sketch"
    val ckpt = tmp("graft-mg-ckpt")
    val all = graft.sources.Tables.events(spark, sfDir)
      .drop("__ts_nanos", "__ts_raw")

    all.where(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    val q1 = StreamingSketch.startMgIngest(spark, src, store, ckpt)
    q1.awaitTermination(120000)
    all.where(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = StreamingSketch.startMgIngest(spark, src, store, ckpt)
    q2.awaitTermination(120000)

    // exact regime (capacity ≫ distinct users at this sf): the summed
    // store must equal the batch q44 — same top-k rows, same counts
    def hitters(): Seq[(Long, Long)] =
      StreamingSketch.globalHeavyHitters(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batchTop = graft.operators.Relational
      .q44HeavyHitters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val drained = hitters()
    assert(drained === batchTop)

    // restart with no new files: checkpoint skips everything
    val n = spark.read.parquet(store).count()
    val q3 = StreamingSketch.startMgIngest(spark, src, store, ckpt)
    q3.awaitTermination(120000)
    assert(spark.read.parquet(store).count() === n && hitters() === drained)

    // at-least-once replay: overwriting batch 0's own directory is a
    // no-op; the SAME summary appended under a fresh id inflates —
    // the additive-merge class (CMS), proving overwrite is load-bearing
    StreamingSketch.writeMgBatch(
      all.where(col("event_id") % 2 === 0), store, 0L)
    assert(hitters() === drained)
    StreamingSketch.writeMgBatch(
      all.where(col("event_id") % 2 === 0), store, 99L)
    val doubled = hitters().toMap
    assert(drained.exists { case (u, c) => doubled.get(u).exists(_ > c) },
      "a duplicate summary under a fresh id must inflate counts")
  }
}
