package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, CountMinAgg, HyperLogLogAgg, KmvAgg, MisraGriesAgg, SignBandKeys, SimHashAgg, TopKBySim}

/** Engine extension point: registers graft's native Catalyst functions.
  *
  * Two installation paths:
  *   - builder-time: `SparkSession.builder.withExtensions(new
  *     GraftExtensions)` (or conf `spark.sql.extensions=graft.plans.
  *     GraftExtensions`) — the idiomatic deployment;
  *   - post-hoc: [[GraftExtensions.register]] on an existing session
  *     (the driver harness builds plain sessions), idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.simhashAggDescriptor)
    ext.injectFunction(GraftExtensions.signBandsDescriptor)
    ext.injectFunction(GraftExtensions.bloomAggDescriptor)
    ext.injectFunction(GraftExtensions.mightContainDescriptor)
    ext.injectFunction(GraftExtensions.topkBySimDescriptor)
    ext.injectFunction(GraftExtensions.misraGriesDescriptor)
    ext.injectFunction(GraftExtensions.cmsSketchDescriptor)
    ext.injectFunction(GraftExtensions.hllSketchDescriptor)
    ext.injectFunction(GraftExtensions.kmvSketchDescriptor)
  }
}

object GraftExtensions {

  private val cosineSimBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"cosine_sim expects 2 arguments, got ${exprs.length}")
    CosineSimilarity(exprs.head, exprs(1))
  }

  // the analyzer wraps a bare AggregateFunction in AggregateExpression
  // when the call site is an aggregation context, same as built-ins
  private val simhashAggBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"simhash_agg expects 1 argument, got ${exprs.length}")
    SimHashAgg(exprs.head)
  }

  // numPlanes/bandBits are case-class parameters, not child expressions,
  // so the generated code can inline them as compile-time constants —
  // the builder requires foldable int literals at the call site
  private val signBandsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"sign_bands expects (embedding, numPlanes, bandBits), got ${exprs.length} arguments")
    (exprs(1), exprs(2)) match {
      case (Literal(np: Int, IntegerType), Literal(bb: Int, IntegerType)) =>
        SignBandKeys(exprs.head, np, bb)
      case _ => throw new IllegalArgumentException(
        "sign_bands numPlanes/bandBits must be integer literals")
    }
  }

  // k is a case-class parameter (not a child expression) so the
  // bounded buffers allocate once per group — the builder requires a
  // foldable int literal at the call site, same as sign_bands
  private val topkBySimBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"topk_by_sim expects (id, sim, k), got ${exprs.length} arguments")
    exprs(2) match {
      case Literal(k: Int, IntegerType) => TopKBySim(exprs(0), exprs(1), k)
      case _ => throw new IllegalArgumentException(
        "topk_by_sim k must be an integer literal")
    }
  }

  // Spark ships a Bloom-filter sketch pair for its own runtime join
  // filters (BloomFilterAggregate / BloomFilterMightContain) but does
  // not register them as SQL functions; graft exposes them for
  // broadcast membership pre-filters (TextOps.decontaminateBloom).
  // Child is a 64-bit hash (xxhash64 at the call site), matching how
  // InjectRuntimeFilter feeds them internally.
  private val bloomAggBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"graft_bloom_agg expects (hash, estimatedNumItems, numBits), got ${exprs.length} arguments")
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      exprs(0), exprs(1), exprs(2))
  }

  private val mightContainBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_might_contain expects (bloomFilter, hash), got ${exprs.length} arguments")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      exprs(0), exprs(1))
  }

  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    cosineSimBuilder)

  val simhashAggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_agg"),
    new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
    simhashAggBuilder)

  val signBandsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sign_bands"),
    new ExpressionInfo(classOf[SignBandKeys].getName, "sign_bands"),
    signBandsBuilder)

  val bloomAggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "graft_bloom_agg"),
    bloomAggBuilder)

  val mightContainDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "graft_might_contain"),
    mightContainBuilder)

  // capacity is a case-class parameter (bounded buffers allocate once
  // per group) — foldable int literal required, same as topk_by_sim
  private val misraGriesBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"misra_gries expects (key, capacity), got ${exprs.length} arguments")
    exprs(1) match {
      case Literal(k: Int, IntegerType) => MisraGriesAgg(exprs(0), k)
      case _ => throw new IllegalArgumentException(
        "misra_gries capacity must be an integer literal")
    }
  }

  val misraGriesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("misra_gries"),
    new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
    misraGriesBuilder)

  // depth/width are case-class parameters (the counter grid allocates
  // once per group) — foldable int literals required, same as misra_gries
  private val cmsSketchBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      s"cms_sketch expects (key, depth, width), got ${exprs.length} arguments")
    (exprs(1), exprs(2)) match {
      case (Literal(d: Int, IntegerType), Literal(w: Int, IntegerType)) =>
        CountMinAgg(exprs.head, d, w)
      case _ => throw new IllegalArgumentException(
        "cms_sketch depth/width must be integer literals")
    }
  }

  val cmsSketchDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_sketch"),
    new ExpressionInfo(classOf[CountMinAgg].getName, "cms_sketch"),
    cmsSketchBuilder)

  // precision is a case-class parameter (the register file allocates
  // once per group) — foldable int literal required, same as cms_sketch
  private val hllSketchBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"hll_sketch expects (key, precision), got ${exprs.length} arguments")
    exprs(1) match {
      case Literal(p: Int, IntegerType) => HyperLogLogAgg(exprs.head, p)
      case _ => throw new IllegalArgumentException(
        "hll_sketch precision must be an integer literal")
    }
  }

  val hllSketchDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hll_sketch"),
    new ExpressionInfo(classOf[HyperLogLogAgg].getName, "hll_sketch"),
    hllSketchBuilder)

  // capacity is a case-class parameter (bounds the buffer) — foldable
  // int literal required, same as hll_sketch's precision
  private val kmvSketchBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"kmv_sketch expects (key, k), got ${exprs.length} arguments")
    exprs(1) match {
      case Literal(k: Int, IntegerType) => KmvAgg(exprs.head, k)
      case _ => throw new IllegalArgumentException(
        "kmv_sketch k must be an integer literal")
    }
  }

  val kmvSketchDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_sketch"),
    new ExpressionInfo(classOf[KmvAgg].getName, "kmv_sketch"),
    kmvSketchBuilder)

  val topkBySimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_by_sim"),
    new ExpressionInfo(classOf[TopKBySim].getName, "topk_by_sim"),
    topkBySimBuilder)

  /** Idempotent post-hoc registration on a live session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cosine_sim", cosineSimBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("simhash_agg", simhashAggBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("sign_bands", signBandsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_bloom_agg", bloomAggBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_might_contain", mightContainBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("topk_by_sim", topkBySimBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("misra_gries", misraGriesBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cms_sketch", cmsSketchBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("hll_sketch", hllSketchBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("kmv_sketch", kmvSketchBuilder, "built-in")
  }
}
