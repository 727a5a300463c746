package graft

import org.apache.spark.sql.functions._

import graft.operators.Assets
import graft.sources.DebugSink

class DebugSinkSpec extends SparkSpec {

  test("dumpRows emits JSON lines; dumpPlan shows the physical plan") {
    val df = Assets.servicesLatest(spark, sfDir)
    val rows = DebugSink.dumpRows(df, 3)
    assert(rows.linesIterator.size === 3)
    assert(rows.contains("\"service_name\""))
    val plan = DebugSink.dumpPlan(df)
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("Physical Plan"))
  }

  test("Verify failure path prints query name and formatted plan to stderr") {
    val outDir = java.nio.file.Files.createTempDirectory("graft-verify").toString
    val err = new java.io.ByteArrayOutputStream()
    val ok = Console.withErr(err) {
      // fails at ACTION time (assert_true(false) under ANSI), after the
      // plan exists — the searchAndPrintQueryOnError analog must dump it
      Verify.dumpQuery(spark, "boom",
        (s, _) => s.range(1).selectExpr("assert_true(id < 0) AS x"),
        sfDir, outDir)
    }
    val log = err.toString
    assert(!ok)
    assert(log.contains("[verify] boom failed"))
    assert(log.contains("[verify] boom plan:"))
    assert(log.contains("Physical Plan"))
    // the happy path stays silent and writes parquet
    val err2 = new java.io.ByteArrayOutputStream()
    val ok2 = Console.withErr(err2) {
      Verify.dumpQuery(spark, "fine",
        (s, _) => s.range(3).toDF("id"), sfDir, outDir)
    }
    assert(ok2 && err2.toString.isEmpty)
    assert(spark.read.parquet(s"$outDir/fine").count() === 3)
  }

  test("edgeList caps at MaxEdges keeping the smallest EANs") {
    val s = spark; import s.implicits._
    val many = (1 to Assets.MaxEdges + 50).map(i => f"e$i%04d")
    val out = Seq((1, many)).toDF("id", "xs")
      .select(Assets.edgeList(col("xs")).as("e"))
      .head().getString(0)
    val kept = out.split("\\|")
    assert(kept.length === Assets.MaxEdges)
    assert(kept.head === "e0001")
    assert(kept.last === f"e${Assets.MaxEdges}%04d")
  }
}
