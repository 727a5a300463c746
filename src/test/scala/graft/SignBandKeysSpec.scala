package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._

import graft.functions.SignBandKeys
import graft.operators.VectorOps
import graft.plans.GraftExtensions

/** Differential proof for the native sign_bands expression: the fused
  * codegen loop must be bit-equal to the compositional
  * `bandKeysExpr` form (which the DuckDB oracle mirrors literally).
  */
class SignBandKeysSpec extends SparkSpec {

  test("sign_bands equals the compositional bandKeysExpr on real embeddings") {
    GraftExtensions.register(spark)
    for ((np, bb) <- Seq((64, 8), (64, 16), (16, 4))) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val diff = emb.select(
        col("vec_id"),
        expr(s"sign_bands(embedding, $np, $bb)").as("native"),
        expr(VectorOps.bandKeysExpr(np, bb)).as("composed"))
        .where(not(col("native") === col("composed")))
        .count()
      assert(diff === 0L, s"sign_bands($np, $bb) diverged from the compositional form")
    }
  }

  test("plane weights match VectorOps.planeWeight") {
    for (p <- 0 until 64; d <- 0 until SignBandKeys.Dim)
      assert(SignBandKeys.weight(p, d) === VectorOps.planeWeight(p, d).toDouble)
  }

  test("degenerate inputs (null element, wrong length) yield all-'0' keys like the SQL form") {
    def evalKeys(values: Array[java.lang.Float]): Seq[String] = {
      val expr = SignBandKeys(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          new GenericArrayData(values.asInstanceOf[Array[Any]]),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        numPlanes = 8, bandBits = 4)
      expr.eval(null).asInstanceOf[ArrayData].toObjectArray(
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    }
    // null element: every plane's fold is nulled in the composed form → '0' bits
    val withNull = Array.tabulate[java.lang.Float](SignBandKeys.Dim)(i => i.toFloat)
    withNull(7) = null
    assert(evalKeys(withNull) === Seq("0000", "0000"))
    // wrong length: zip_with pads with nulls in the composed form → '0' bits
    assert(evalKeys(Array.tabulate[java.lang.Float](8)(_.toFloat)) === Seq("0000", "0000"))
  }

  test("property: native equals compositional on arbitrary finite float vectors") {
    import org.scalacheck.{Gen, Prop}
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    // magnitudes from subnormal-ish to huge, both signs, exact zeros
    val component: Gen[Float] = Gen.oneOf(
      Gen.chooseNum(-1e6f, 1e6f),
      Gen.chooseNum(-1e-6f, 1e-6f),
      Gen.const(0.0f))
    val vec: Gen[Seq[Float]] = Gen.listOfN(SignBandKeys.Dim, component)
    checkScalaCheck(Prop.forAll(Gen.listOfN(8, vec)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      df.select(
          expr("sign_bands(embedding, 64, 8)").as("native"),
          expr(VectorOps.bandKeysExpr(64, 8)).as("composed"))
        .where(not(col("native") === col("composed")))
        .count() == 0L
    }, minTests = 10)
  }

  test("sign_bands rejects non-literal or invalid parameters") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    intercept[Exception] {
      emb.select(expr("sign_bands(embedding, 64, 7)")).head()  // 64 % 7 != 0
    }
    intercept[Exception] {
      emb.select(expr("sign_bands(embedding, vec_id, 8)")).head()  // non-literal
    }
  }
}
