package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.operators.Assets

/** Unit + property tests for the asset-derivation operators
  * (SURVEY.md §5 items 2-3): collapse tie-breaks, findParent priority,
  * EAN round-trip, graph edge symmetry.
  */
class AssetsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def signalDf(rows: Seq[(Long, String, String, String, String, String, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (id, t, name, c, p, hn, hh) =>
      (id, ts(t), name, Option(c), Option(p), Option(hn), Option(hh))
    }.toDF("event_id", "ts", "service_name", "container_id",
      "kubernetes_pod_uid", "host_name", "host_hostname")
  }

  test("collapseLatest keeps the newest row; ties break by event_id desc") {
    val df = signalDf(Seq(
      (1L, "2024-01-01 00:00:00", "svc-a", "c1", null, null, null),
      (2L, "2024-01-02 00:00:00", "svc-a", "c2", null, null, null),
      (3L, "2024-01-02 00:00:00", "svc-a", "c3", null, null, null), // tie on ts with id=2
      (4L, "2024-01-01 00:00:00", "svc-b", "c4", null, null, null)
    ))
    val out = Assets.collapseLatest(df, "service_name")
      .select("service_name", "event_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("svc-a" -> 3L, "svc-b" -> 4L))
  }

  test("collapseLatest property: exactly the max (ts, event_id) row per key") {
    val genRow = for {
      key <- Gen.choose(0, 4)
      day <- Gen.choose(1, 28)
      id <- Gen.choose(0L, 1000L)
    } yield (key, day, id)
    // distinct event_ids so the expected winner is unambiguous
    val genRows = Gen.listOfN(30, genRow)
      .map(_.distinctBy(_._3)).suchThat(_.nonEmpty)
    val prop = Prop.forAll(genRows) { rows =>
      val df = signalDf(rows.map { case (k, day, id) =>
        (id, f"2024-01-$day%02d 00:00:00", s"svc-$k", null, null, null, null)
      })
      val got = Assets.collapseLatest(df, "service_name")
        .select("service_name", "event_id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(t => s"svc-${t._1}").view
        .mapValues(_.maxBy(t => (t._2, t._3))._3).toMap
      got == want
    }
    checkScalaCheck(prop, minTests = 10)
  }

  test("findParent priority: container > k8s.pod > host.name > host.hostname") {
    val df = signalDf(Seq(
      (1L, "2024-01-01 00:00:00", "s", "c1", "p1", "h1", "hh1"),
      (2L, "2024-01-01 00:00:00", "s", null, "p1", "h1", "hh1"),
      (3L, "2024-01-01 00:00:00", "s", null, null, "h1", "hh1"),
      (4L, "2024-01-01 00:00:00", "s", null, null, null, "hh1"),
      (5L, "2024-01-01 00:00:00", "s", null, null, null, null)
    ))
    val out = df.select(col("event_id"), Assets.parentType.as("pt"), Assets.parentId.as("pi"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L) === ("container" -> "c1"))
    assert(out(2L) === ("k8s.pod" -> "p1"))
    assert(out(3L) === ("host.name" -> "h1"))
    assert(out(4L) === ("host.hostname" -> "hh1"))
    assert(out(5L) === ("unknown" -> "")) // reference fallback :150-153
  }

  test("EAN round-trips through split(ean, ':', 2)") {
    val genId = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(20, genId).map(_.distinct).suchThat(_.nonEmpty)) { ids =>
      val s = spark; import s.implicits._
      val got = ids.toDF("id")
        .select(expr("split(" + "concat('service:', id)" + ", ':', 2)[1]").as("back"))
        .collect().map(_.getString(0)).toSeq
      got == ids
    }
    checkScalaCheck(prop, minTests = 10)
  }

  test("edgeList is sorted, '|'-joined, and '' on the empty set") {
    val s = spark; import s.implicits._
    val out = Seq(
      (1, Seq("b", "a", "c")),
      (2, Seq.empty[String])
    ).toDF("id", "xs")
      .select(col("id"), Assets.edgeList(col("xs")).as("e"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) === "a|b|c")
    assert(out(2) === "")
  }

  test("container graph children mirror service parent edges (symmetry)") {
    // J2: every container->service child edge must match a
    // service->container parent edge derived from the same rows.
    val childEdges = Assets.containerGraph(spark, sfDir)
      .select(col("asset_ean").as("container_ean"),
        explode(split(col("asset_children"), "\\|")).as("svc_ean"))
    val parentEdges = Assets.servicesCollapse(spark, sfDir)
      .where(col("asset_parents").isNotNull)
      .select(col("asset_parents").as("container_ean"),
        col("asset_ean").as("svc_ean"))
    assert(childEdges.exceptAll(parentEdges).count() === 0)
    assert(parentEdges.exceptAll(childEdges).count() === 0)
    assert(childEdges.count() > 0)
  }

  test("node graph children mirror pod parent edges (symmetry)") {
    val childEdges = Assets.nodeGraph(spark, sfDir)
      .select(col("asset_ean").as("node_ean"),
        explode(split(col("asset_children"), "\\|")).as("pod_ean"))
    val parentEdges = Assets.podsCollapse(spark, sfDir)
      .select(col("asset_parents").as("node_ean"),
        col("asset_ean").as("pod_ean"))
    assert(childEdges.exceptAll(parentEdges).count() === 0)
    assert(parentEdges.exceptAll(childEdges).count() === 0)
  }

  test("servicesLatest keys are distinct and carry the max ts (A1)") {
    val out = Assets.servicesLatest(spark, sfDir)
    assert(out.count() ===
      out.select("service_name", "service_environment").distinct().count())
    // keep-latest: latest_ts equals the true max over the same slice
    // (purchase events within 7 days of the global max ts)
    val sig = graft.sources.Tables.signals(spark, sfDir)
    val hi = sig.agg(max("ts")).head().getTimestamp(0)
    val lo = Timestamp.from(hi.toInstant.minus(java.time.Duration.ofDays(7)))
    val trueMax = sig
      .where(col("event_type") === "purchase" && col("ts") >= lit(lo))
      .groupBy(col("service_name"), col("service_environment"))
      .agg(max("ts").as("true_max"))
    val joined = out.join(trueMax, Seq("service_name", "service_environment"), "full_outer")
    assert(joined.where(col("latest_ts").isNull || col("true_max").isNull ||
      col("latest_ts") =!= col("true_max")).count() === 0)
  }
}
