package graft.sources

import org.apache.spark.sql.DataFrame

/** Debug sink (SURVEY.md S8) — the engine-side analog of the
  * reference's `console.log(JSON.stringify(...))` result dumps and
  * per-query DSL dumps (run.ts:18-19; lib/collectServices.ts:83;
  * error dumps lib/collectServicesFromSummaries.ts:98-111).
  *
  * The reference prints the Query DSL it is about to send; the Spark
  * analog of "show me the query" is the optimized/physical plan, so
  * [[dumpPlan]] returns `explain`-style text, and [[dumpRows]] returns
  * the result sample as JSON lines. Both return strings rather than
  * printing so tests (and callers) can assert on them.
  */
object DebugSink {

  /** First `n` result rows as JSON lines (the result-dump analog). */
  def dumpRows(df: DataFrame, n: Int = 20): String =
    df.limit(n).toJSON.collect().mkString("\n")

  /** Formatted physical plan with codegen spans (the query-dump analog). */
  def dumpPlan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** Console convenience matching the reference's logging style. */
  def show(df: DataFrame, n: Int = 20): Unit = {
    println(dumpPlan(df))
    df.show(n, truncate = false)
  }
}
