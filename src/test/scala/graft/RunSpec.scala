package graft

import java.nio.file.Files

/** End-to-end smoke of the CLI orchestration over both registry
  * layouts (S7 + the ES_IS_CCS config switch).
  */
class RunSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("run writes assets from the local layout and honors --read") {
    val out = tmp("graft-run-local") + "/assets"
    val written = Run.run(spark, Map(
      "read" -> "signals_all", "write" -> out, "data" -> sfDir))
    assert(written > 0)
    // signals_all is the doubled overlapping stream; the collapse dedup
    // makes it identical to the single-path pipelines' union
    assert(written === graft.operators.Assets.assetsAll(spark, sfDir).count())
    intercept[IllegalArgumentException](Run.run(spark, Map(
      "read" -> "nope", "write" -> out, "data" -> sfDir)))
  }

  test("ccs layout over an overlapping remote is idempotent with local") {
    val outLocal = tmp("graft-run-l") + "/assets"
    val outCcs = tmp("graft-run-c") + "/assets"
    val localRows = Run.run(spark, Map(
      "read" -> "signals_apm", "write" -> outLocal, "data" -> sfDir))
    // remote dir = same fixture → a fully overlapping second cluster;
    // the collapse dedup must make the union idempotent
    val ccsRows = Run.run(spark, Map(
      "read" -> "signals_apm", "write" -> outCcs, "data" -> sfDir,
      "sources" -> "ccs", "remote" -> sfDir))
    assert(ccsRows === localRows)
    // ccs without --remote fails fast
    intercept[IllegalArgumentException](Run.run(spark, Map(
      "read" -> "signals_apm", "write" -> outCcs, "data" -> sfDir,
      "sources" -> "ccs")))
  }

  test("--dsl runs a raw SearchRequest body end to end and writes the result") {
    val bodyPath = tmp("graft-run-dsl") + "/req.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bodyPath),
      graft.operators.DslQueries.SearchBody)
    val out = tmp("graft-run-dslout") + "/result"
    val written = Run.run(spark, Map(
      "dsl" -> bodyPath, "write" -> out, "data" -> sfDir))
    assert(written ===
      graft.operators.DslQueries.dslSearch(spark, sfDir).count())
    assert(spark.read.parquet(out).count() === written)
    assert(written > 0)
  }
}
