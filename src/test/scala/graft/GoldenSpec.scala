package graft

import org.apache.spark.sql.functions._

/** End-to-end golden tests (SURVEY.md §5 item 4): the flagship pipeline
  * and the combined asset view on the frozen sf0.001 fixture must keep
  * producing byte-identical result sets. The fingerprint is an
  * order-insensitive XOR of per-row xxhash64 over every column, so any
  * value, schema, or cardinality drift trips it. (XOR, not sum: summing
  * 64-bit hashes overflows under ANSI mode.)
  */
class GoldenSpec extends SparkSpec {

  private def fingerprint(name: String): (Long, Long) = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val r = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)"), count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("golden: flagship svc_summaries output is frozen at sf0.001") {
    assert(fingerprint("svc_summaries") === ((1201948405762285216L, 402L)))
  }

  test("golden: combined assets_all output is frozen at sf0.001") {
    assert(fingerprint("assets_all") === ((7254692912342944435L, 23L)))
  }
}
