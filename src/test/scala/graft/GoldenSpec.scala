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

  test("golden: embedding near-dup pairs are frozen at sf0.001") {
    assert(fingerprint("dedup_embedding") === ((8674055004667387128L, 114L)))
  }

  test("golden: wildcard family projection is frozen at sf0.001") {
    assert(fingerprint("sig_host_family") === ((-430869522615299747L, 1000L)))
  }

  /** The determinism contract is partition-count independence: every
    * value must be identical at ANY parallelism (decimal/integer group
    * sums, in-order folds, deterministic tiebreaks — the rules in
    * VectorOps'/OracleText's Scaladoc). Exercised here by fingerprinting
    * a representative query per family under different shuffle
    * partitioning than the suite default.
    */
  test("partition-count invariance across the operator families") {
    val sample = Seq(
      "q1_pricing_summary",   // decimal money aggs
      "q30_sessionize",       // window + running sum
      "corpus_curation",      // composed dedup pipeline
      "dedup_clusters",       // iterative label propagation
      "dedup_embedding",      // LSH bucket join + native cosine
      "emb_centroids",        // scaled-decimal centroid sums
      "txt_tfidf",            // two-level agg + ratio scoring
      "assets_all")           // 4-way union of windowed collapses
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    def at(n: String): Map[String, (Long, Long)] = {
      // drop the memoized dedup artifacts: a cached signature/edge/label
      // table built under the previous partitioning would otherwise be
      // reused, silently exempting those stages from the invariance check
      graft.operators.TextOps.release(spark)
      conf.set("spark.sql.shuffle.partitions", n)
      try sample.map(q => q -> fingerprint(q)).toMap
      finally conf.set("spark.sql.shuffle.partitions", before)
    }
    val a = at("3")
    val b = at("7")
    sample.foreach(q => assert(a(q) === b(q), s"$q diverges across partitionings"))
  }
}
