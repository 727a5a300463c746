package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HyperLogLogAgg

/** HyperLogLog sketch aggregate: estimator accuracy in both regimes
  * (raw harmonic estimate at n ≫ 2.5m, linear counting at small n —
  * the `ln`-based correction lives HERE, off the hash-checked
  * surface), bit-identical register files across partitionings, and
  * the idempotence of the max-merge (re-aggregating overlapping data
  * changes nothing) that CMS's additive merge does not have.
  */
class HllAggSpec extends SparkSpec {

  private val p = 12
  private val m = 1 << p
  private val maxRank = 60 - p + 1

  private def registers(df: DataFrame): Seq[Long] = {
    graft.plans.GraftExtensions.register(spark)
    df.agg(expr(s"hll_sketch(k, $p)").as("regs"))
      .select(explode(col("regs")).as("r")).collect().map(_.getLong(0)).toSeq
  }

  /** The full corrected HLL estimator (Flajolet et al. 2007): raw
    * harmonic estimate, downgraded to linear counting when raw ≤ 2.5m
    * and zero registers exist.
    */
  private def estimate(regs: Seq[Long]): Double = {
    val s = regs.map(r => math.pow(2.0, -r.toDouble)).sum
    val raw = HyperLogLogAgg.alpha(m) * m.toDouble * m.toDouble / s
    val zeros = regs.count(_ == 0L)
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  private def keys(n: Long, seed: Int): DataFrame = {
    // hash-spread distinct keys so bucket occupancy is realistic
    spark.range(n).select((hash(col("id"), lit(seed)).cast("long") * 1000000L + col("id")).as("k"))
  }

  test("estimator within 5% on 100k distinct keys (raw regime)") {
    val regs = registers(keys(100000L, 1))
    val est = estimate(regs)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.05, s"est $est")
    // sanity: the scaled-integer S the query emits equals the double sum
    val sInt = regs.map(r => 1L << (maxRank - r.toInt)).sum
    assert(sInt.toDouble / math.pow(2.0, maxRank.toDouble) ===
      regs.map(r => math.pow(2.0, -r.toDouble)).sum)
  }

  test("estimator within 5% on 1k distinct keys (linear-counting regime)") {
    val regs = registers(keys(1000L, 2))
    val est = estimate(regs)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.05, s"est $est")
  }

  test("register file is bit-identical across partitionings") {
    val base = keys(20000L, 3)
    val a = registers(base.repartition(1))
    val b = registers(base.repartition(32))
    val c = registers(base.repartition(7, col("k")))
    assert(a === b)
    assert(a === c)
  }

  test("max-merge is idempotent: duplicated input yields the identical sketch") {
    val base = keys(5000L, 4)
    val once = registers(base)
    val tripled = registers(base.unionAll(base).unionAll(base))
    assert(once === tripled)
  }

  test("scala hash/rank match the SQL md5 device row-for-row") {
    // the cross-engine contract: hash60/rank must equal what the
    // DuckDB oracle computes with md5 + bin-string ops; mirror the
    // same expressions in Spark SQL and compare against the Scala side
    val s = spark; import s.implicits._
    val ks = Seq(0L, 1L, 42L, 99999L, 123456789L, -7L)
    val sql = ks.toDF("k").select(col("k"),
        expr("conv(substring(md5(CAST(k AS STRING)), 1, 15), 16, 10)").cast("long").as("h"))
      .withColumn("bucket", expr(s"h div ${1L << (60 - p)}").cast("long"))
      .withColumn("low", expr(s"h % ${1L << (60 - p)}"))
      .withColumn("rho", expr(
        s"CASE WHEN low = 0 THEN $maxRank ELSE instr(lpad(bin(low), ${60 - p}, '0'), '1') END")
        .cast("long"))
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("bucket"), r.getAs[Long]("rho")))).toMap
    ks.foreach { k =>
      val h = HyperLogLogAgg.hash60(k)
      assert(sql(k) === ((h >>> (60 - p), HyperLogLogAgg.rank(h, p).toLong)), s"key $k")
    }
  }
}
