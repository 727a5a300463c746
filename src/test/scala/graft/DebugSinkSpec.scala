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
