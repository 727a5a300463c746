package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps
import graft.plans.GraftExtensions

/** Native codegen cosine_sim expression vs the composed fold form. */
class CosineSimilaritySpec extends SparkSpec {

  test("cosine_sim matches the composed zip_with/aggregate form bit-for-bit") {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f, 2.5f), Seq(0.5f, -1.0f, 2.5f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.2f, 0.1f)),
      (Seq(1.0f, 1.0f, 1.0f), Seq(1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
    val composed = expr(VectorOps.dot("a", "b")) /
      (sqrt(expr(VectorOps.dot("a", "a"))) * sqrt(expr(VectorOps.dot("b", "b"))))
    val out = df.select(
      expr("cosine_sim(a, b)").as("native"), composed.as("folded")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(math.abs(out(2).getDouble(0) - 1.0) < 1e-12)
  }

  test("cosine_sim null-propagates and rejects wrong input types") {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    val df = Seq((Option(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).head().isNullAt(0))
    val err = intercept[Exception](
      Seq((1, 2)).toDF("a", "b").select(expr("cosine_sim(a, b)")).collect())
    assert(err.getMessage.toLowerCase.contains("cosine_sim") ||
      err.getMessage.toLowerCase.contains("array<float>"))
  }

  test("null ELEMENTS null-propagate exactly like the composed form") {
    GraftExtensions.register(spark)
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(Option(1.0f), None, Option(2.0f)), Seq(Option(1.0f), Option(1.0f), Option(1.0f))),
      (Seq(Option(1.0f), Option(1.0f)), Seq(Option(1.0f), None)),
      (Seq(Option(1.0f), Option(2.0f)), Seq(Option(2.0f), Option(1.0f)))
    ).toDF("a", "b")
    val composed = expr(VectorOps.dot("a", "b")) /
      (sqrt(expr(VectorOps.dot("a", "a"))) * sqrt(expr(VectorOps.dot("b", "b"))))
    val out = df.select(
      expr("cosine_sim(a, b)").as("native"), composed.as("folded")).collect()
    // rows with a null element: BOTH forms yield null (getFloat would
    // otherwise silently read the slot as 0.0 in the native loop)
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    // null-free row still bit-equal
    assert(java.lang.Double.doubleToLongBits(out(2).getDouble(0)) ===
      java.lang.Double.doubleToLongBits(out(2).getDouble(1)))
  }

  test("null element in a NON-nullable array input still yields NULL, not 0.0") {
    GraftExtensions.register(spark)
    // literal arrays: the columns themselves are non-nullable, so the
    // expression's nullability must come from containsNull — round 3's
    // review caught this returning a fake 0.0 similarity
    val row = spark.sql(
      """SELECT cosine_sim(array(CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS s,
        |       coalesce(cosine_sim(array(CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT))),
        |                CAST(-99.0 AS DOUBLE)) AS marked
        |""".stripMargin).collect()(0)
    assert(row.isNullAt(0))
    assert(row.getDouble(1) === -99.0)
  }

  test("knnExactNative returns exactly knnExact's rows") {
    val dir = sfDir
    val a = VectorOps.knnExact(spark, dir).collect().toSet
    val b = VectorOps.knnExactNative(spark, dir).collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
