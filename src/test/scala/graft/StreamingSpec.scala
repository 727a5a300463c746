package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Assets
import graft.streaming.StreamingAssets

/** Streaming smoke tests (SURVEY.md §2.8): one AvailableNow drain of
  * the fixture must produce the same asset state as the batch pipeline,
  * and the watermarked dedup must make re-delivered events idempotent.
  */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("one micro-batch drain equals the batch servicesCollapse result") {
    // file stream source requires a directory; stage one copy of events
    val srcDir = tmp("graft-stream-src")
    spark.read.parquet(s"$sfDir/events.parquet")
      .write.mode("append").parquet(s"$srcDir/events")
    val statePath = tmp("graft-stream-state") + "/assets"
    val q = StreamingAssets.startServiceAssetStream(
      spark, s"$srcDir/events", statePath, tmp("graft-stream-ckpt"))
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(statePath).collect().toSet
    val batch = graft.sources.AssetSchema
      .conform(Assets.servicesCollapse(spark, sfDir)).collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session windows equal the batch sessionization") {
    val srcDir = tmp("graft-sess-src")
    spark.read.parquet(s"$sfDir/events.parquet")
      .write.mode("append").parquet(s"$srcDir/events")
    val sessions = StreamingAssets.sessionizedEvents(
      StreamingAssets.eventStream(spark, s"$srcDir/events"))
    // complete mode: every session surfaces regardless of watermark
    val q = sessions.writeStream
      .format("memory").queryName("graft_sessions")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("graft_sessions")
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // the batch window query groups by the same 30-minute gap rule:
    // session starts and per-session event counts must agree exactly
    val batch = graft.operators.Relational.q30Sessionize(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // session_window's end boundary is last-event + gap: strictly after
    // the start, and never overlapping the user's next session
    val byUser = spark.table("graft_sessions").collect()
      .groupBy(_.getLong(0)).values
    byUser.foreach { rows =>
      val sorted = rows.sortBy(_.getTimestamp(1).getTime)
      sorted.foreach(r =>
        assert(r.getTimestamp(2).after(r.getTimestamp(1))))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.getTimestamp(2).after(b.getTimestamp(1)),
            s"overlapping sessions for user ${a.getLong(0)}")
        case _ => ()
      }
    }
  }

  test("stream-stream interval join equals the batch trailing-hour join") {
    val srcDir = tmp("graft-ssj-src")
    spark.read.parquet(s"$sfDir/events.parquet")
      .write.mode("append").parquet(s"$srcDir/events")
    val joined = StreamingAssets.purchasesWithPriorViews(
      StreamingAssets.eventStream(spark, s"$srcDir/events"))
    val q = joined.writeStream
      .format("memory").queryName("graft_ssj")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("graft_ssj")
      .select(col("purchase_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.sources.Tables.events(spark, sfDir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val batch = p.join(v, Seq("user_id"))
      .where(col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture must exercise the join")
  }

  test("re-delivered events dedup within the watermark: duplicated source, same state") {
    // a source dir holding TWO copies of the events file = full overlap
    val srcDir = tmp("graft-stream-dup")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.write.mode("append").parquet(s"$srcDir/events")
    raw.write.mode("append").parquet(s"$srcDir/events")
    val statePath = tmp("graft-stream-state2") + "/assets"
    val q = StreamingAssets.startServiceAssetStream(
      spark, s"$srcDir/events", statePath, tmp("graft-stream-ckpt2"))
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(statePath).collect().toSet
    val batch = graft.sources.AssetSchema
      .conform(Assets.servicesCollapse(spark, sfDir)).collect().toSet
    assert(streamed === batch)
  }

  test("windowed aggregation over the stream equals the batch window counts") {
    val srcDir = tmp("graft-stream-win")
    spark.read.parquet(s"$sfDir/events.parquet")
      .write.mode("append").parquet(s"$srcDir/events")
    val q = StreamingAssets.windowedServiceCounts(
      StreamingAssets.signalStream(spark, s"$srcDir/events"))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft-stream-winck"))
      .start()
    q.awaitTermination(120000)
    if (q.isActive) q.stop()
    val streamed = spark.table("win_counts").collect().toSet
    val batch = graft.sources.Tables.signals(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("service_name"))
      .agg(count(lit(1)).as("n_signals"))
      .select(col("window.start").as("window_start"),
        col("service_name"), col("n_signals"))
      .collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("mapGroupsWithState tracks latest ts and lifetime count per service") {
    val srcDir = tmp("graft-stream-state-src")
    spark.read.parquet(s"$sfDir/events.parquet")
      .write.mode("append").parquet(s"$srcDir/events")
    val updates = StreamingAssets.serviceStateStream(
      spark, StreamingAssets.signalStream(spark, s"$srcDir/events"))
    val q = updates.writeStream.format("memory").queryName("svc_state")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp("graft-stream-stateck"))
      .start()
    q.awaitTermination(120000)
    if (q.isActive) q.stop()
    val got = spark.table("svc_state")
      .groupBy("service_name")
      .agg(max("latest_ts").as("latest_ts"), sum("n_seen").as("n_seen_max"))
      .collect().map(r => r.getString(0) ->
        ((r.getTimestamp(1), r.getLong(2)))).toMap
    val want = graft.sources.Tables.signals(spark, sfDir)
      .groupBy("service_name")
      .agg(max("ts").as("latest"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getTimestamp(1), r.getLong(2)))).toMap
    assert(got.keySet === want.keySet)
    // single micro-batch: every service's state reflects the full input
    got.foreach { case (k, (ts, n)) =>
      assert(ts === want(k)._1, s"latest ts for $k")
      assert(n === want(k)._2, s"count for $k")
    }
  }

  test("upsertAssets: newest ts wins, batch wins ties, keys are distinct") {
    val s = spark; import s.implicits._
    def assets(rows: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
      rows.map { case (ean, ts) =>
        (java.sql.Timestamp.valueOf(ts), ean, "service", ean.split(":")(1))
      }.toDF("asset_ts", "asset_ean", "asset_type", "asset_id")
    val state = assets(Seq(
      ("service:a", "2024-02-01 00:00:00"),
      ("service:b", "2024-02-02 00:00:00"), // newer than the batch row
      ("service:c", "2024-02-01 00:00:00")))
    val batch = assets(Seq(
      ("service:a", "2024-02-03 00:00:00"), // newer → replaces
      ("service:b", "2024-02-01 00:00:00"), // older → state kept
      ("service:c", "2024-02-01 00:00:00"), // tie → batch wins
      ("service:d", "2024-02-01 00:00:00"))) // new key → inserted
    val out = Assets.upsertAssets(state, batch)
      .select("asset_ean", "asset_ts").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).toString).toMap
    assert(out === Map(
      "service:a" -> "2024-02-03 00:00:00.0",
      "service:b" -> "2024-02-02 00:00:00.0",
      "service:c" -> "2024-02-01 00:00:00.0",
      "service:d" -> "2024-02-01 00:00:00.0"))
  }

  test("mergeEdgeLists: commutative, idempotent, deduped, '' and null handled") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("b|c", "a|b"),
      ("", "x"),
      (null.asInstanceOf[String], "y|y2"),
      ("", "")
    ).toDF("a", "b")
    val out = df.select(
      Assets.mergeEdgeLists(col("a"), col("b")).as("ab"),
      Assets.mergeEdgeLists(col("b"), col("a")).as("ba")).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a|b|c", "x", "y|y2", ""))
    // commutative
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
    // idempotent
    val idem = df.select(Assets.mergeEdgeLists(
      Assets.mergeEdgeLists(col("a"), col("b")),
      Assets.mergeEdgeLists(col("a"), col("b"))).as("m")).collect()
    assert(idem.map(_.getString(0)).toSeq === Seq("a|b|c", "x", "y|y2", ""))
  }

  test("upsertAssetsMergeEdges unions edges while scalars follow the newest run") {
    val out = Assets.assetUpsertMerge(spark, sfDir).collect()
    assert(out.nonEmpty)
    val state = Assets.containerAssets(
      Assets.collapsedServiceSignalsFrom(
        graft.sources.Tables.signals(spark, sfDir), "21 DAY"), Assets.batchTs)
      .select(col("asset_ean"), col("asset_children")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val merged = Assets.assetUpsertMerge(spark, sfDir)
      .select(col("asset_ean"), col("asset_children")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // every state edge survives the merge (union semantics)
    state.foreach { case (ean, children) =>
      val got = merged(ean).split("\\|").toSet
      assert(children.split("\\|").toSet.subsetOf(got), s"edges lost for $ean")
    }
  }

  test("assetUpsert: recent services carry T2, stale ones keep T1") {
    val out = Assets.assetUpsert(spark, sfDir)
    assert(out.count() ===
      out.select("asset_ean").distinct().count())
    val tsVals = out.select(col("asset_ts").cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(tsVals.subsetOf(Set("2024-02-01 00:00:00", "2024-02-02 00:00:00")))
    assert(tsVals.contains("2024-02-02 00:00:00")) // at least one updated
  }

  test("state function: timed-out group emits tombstone and removes state (no crash)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamingAssets.{ServiceState, updateServiceState}
    val prior = ServiceState(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5L)
    // a timed-out group is invoked with an EMPTY iterator — the branch
    // that crashed the stream before the hasTimedOut check existed
    val timedOut = TestGroupState.create[ServiceState](
      Optional.of(prior), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    val out = updateServiceState("svc-1", Iterator.empty, timedOut)
    assert(out.latest_ts === prior.latest)
    assert(out.n_seen === 5L)
    assert(!out.newly_seen)
    assert(timedOut.isRemoved)
    // degenerate: no prior state AND empty batch still returns a row
    val empty = TestGroupState.create[ServiceState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    val out2 = updateServiceState("svc-2", Iterator.empty, empty)
    assert(out2.latest_ts === null && out2.n_seen === 0L)
  }

  test("state function: live batch updates state and flags first sight") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamingAssets.{ServiceObs, ServiceState, updateServiceState}
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val st = TestGroupState.create[ServiceState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val first = updateServiceState("svc-9",
      Iterator(ServiceObs("svc-9", t2), ServiceObs("svc-9", t1)), st)
    assert(first.newly_seen && first.n_seen === 2L && first.latest_ts === t2)
    assert(st.get.latest === t2)
    val second = updateServiceState("svc-9",
      Iterator(ServiceObs("svc-9", t1)), st)
    assert(!second.newly_seen && second.n_seen === 3L && second.latest_ts === t2)
  }
}
