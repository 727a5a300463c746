package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HyperLogLogAgg, KmvAgg}

/** KMV bottom-k sketch aggregate: exact-regime degradation (distinct
  * ≤ k ⇒ the sketch IS the distinct hash set), estimator accuracy in
  * the sketch regime, bit-identical sketches across partitionings,
  * idempotence of the sorted-union merge (replay-safe like HLL's max,
  * unlike CMS's additive grid), and the hash-sample property that
  * makes two groups' sketches composable for overlap estimates.
  */
class KmvAggSpec extends SparkSpec {

  private val k = 256

  private def sketch(df: DataFrame): Seq[Long] = {
    graft.plans.GraftExtensions.register(spark)
    df.agg(expr(s"kmv_sketch(k, $k)").as("ks"))
      .select(explode(col("ks")).as("h")).collect().map(_.getLong(0)).toSeq
  }

  private def keys(n: Long, seed: Int): DataFrame =
    spark.range(n).select(
      (hash(col("id"), lit(seed)).cast("long") * 1000000L + col("id")).as("k"))

  test("exact regime: below capacity the sketch is the full distinct hash set, ascending") {
    val ks = sketch(keys(100L, 1))
    val raw = keys(100L, 1).collect().map(_.getLong(0))
      .map(HyperLogLogAgg.hash60).distinct.sorted
    assert(ks === raw.toSeq)
    assert(ks === ks.sorted && ks.distinct.size === ks.size)
  }

  test("sketch regime: estimator within 10% on 50k distinct keys at k=256") {
    val ks = sketch(keys(50000L, 2))
    assert(ks.size === k)
    val est = KmvAgg.estimatorNum(k) / ks.last.toDouble
    assert(math.abs(est - 50000.0) / 50000.0 < 0.10, s"est $est")
  }

  test("sketch is bit-identical across partitionings") {
    val df = keys(20000L, 3)
    val a = sketch(df.repartition(1))
    val b = sketch(df.repartition(17, col("k")))
    val c = sketch(df.repartition(5))
    assert(a === b && b === c)
  }

  test("merge is idempotent: re-aggregating overlapping data changes nothing") {
    val df = keys(5000L, 4)
    val once = sketch(df)
    val doubled = sketch(df.union(df).union(df.limit(1234)))
    assert(once === doubled)
  }

  test("two groups' sketches compose: bottom-k of the union estimates overlap") {
    // same seed: keys(6000) is a strict subset of keys(7000), so the
    // true Jaccard of the two key sets is 6000/7000
    val sa = sketch(keys(6000L, 5)).toSet
    val sb = sketch(keys(7000L, 5)).toSet
    // bottom-k of the union, computed from the two sketches alone
    val unionK = (sa ++ sb).toSeq.sorted.take(k).toSet
    val inter = unionK.count(h => sa.contains(h) && sb.contains(h))
    val jacEst = inter.toDouble / k.toDouble
    val jacTrue = 6000.0 / 7000.0
    assert(math.abs(jacEst - jacTrue) < 0.15, s"jaccard est $jacEst vs $jacTrue")
  }

  test("null keys are skipped; all-null group yields the empty sketch") {
    val s = spark; import s.implicits._
    val df = Seq[java.lang.Long](null, null).toDF("k")
    assert(sketch(df).isEmpty)
  }
}
