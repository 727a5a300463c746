package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen sign-LSH band keys over a float-embedding column:
  * `sign_bands(embedding, numPlanes, bandBits)` returns the
  * `numPlanes / bandBits` band-key strings of the embedding's
  * random-hyperplane sign code — the banding primitive of the vector
  * dedup/ANN family (VectorOps.knnLsh / dedupEmbedding).
  *
  * Why native: the compositional form (VectorOps.bandKeysExpr — a
  * `transform(slice(planes...))` over a 4096-literal plane matrix with
  * an `aggregate(zip_with(...))` fold per plane) runs every plane dot
  * through interpreted lambda evaluators; profiled at ~12µs per plane
  * fold, it dominates the LSH queries' runtime. This expression fuses
  * all numPlanes × dim multiply-adds into one whole-stage-codegen loop
  * and embeds no literal matrix: the ±1 plane weights are re-derived
  * from the same Knuth LCG as [[graft.operators.VectorOps.planeWeight]]
  * (flat index `p·64 + d`, so [[Dim]] here must equal VectorOps.Dim).
  *
  * Bit-compatibility contract with the compositional form (and thus
  * the DuckDB oracle, which evaluates the literal-matrix mirror):
  *   - each plane's accumulator adds `±1.0 * (double) x_d` in index
  *     order — identical double ops to `aggregate(zip_with(p, emb,
  *     (w, x) -> w * CAST(x AS DOUBLE)), 0D, +)`;
  *   - the sign bit is `acc > 0`;
  *   - a NULL array element, or an array whose length differs from
  *     [[Dim]], nulls every plane's fold in the compositional form
  *     (`zip_with` pads with nulls), whose `CASE WHEN NULL THEN`
  *     lands in `ELSE '0'` — so those rows yield all-'0' band keys,
  *     reproduced here by the degenerate branch.
  * Proven differentially: the registered LSH queries hash-match the
  * DuckDB oracle, and SignBandKeysSpec checks equality against the
  * compositional form row by row.
  */
case class SignBandKeys(child: Expression, numPlanes: Int, bandBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if numPlanes > 0 && bandBits > 0 && numPlanes % bandBits == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"sign_bands needs numPlanes divisible by bandBits, got ($numPlanes, $bandBits)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "sign_bands"

  private def numBands: Int = numPlanes / bandBits

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bits = new Array[Byte](numPlanes)
    var degenerate = n != SignBandKeys.Dim
    var d = 0
    while (!degenerate && d < n) {
      if (arr.isNullAt(d)) degenerate = true
      d += 1
    }
    if (degenerate) {
      java.util.Arrays.fill(bits, '0'.toByte)
    } else {
      var p = 0
      while (p < numPlanes) {
        var acc = 0.0
        var i = 0
        while (i < SignBandKeys.Dim) {
          acc += SignBandKeys.weight(p, i) * arr.getFloat(i).toDouble
          i += 1
        }
        bits(p) = if (acc > 0) '1'.toByte else '0'.toByte
        p += 1
      }
    }
    val keys = new Array[AnyRef](numBands)
    var b = 0
    while (b < numBands) {
      keys(b) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bits, b * bandBits, (b + 1) * bandBits))
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bits = ctx.freshName("bits")
      val degen = ctx.freshName("degen")
      val acc = ctx.freshName("acc")
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val b = ctx.freshName("b")
      val idx = ctx.freshName("idx")
      val x = ctx.freshName("x")
      val dim = SignBandKeys.Dim
      s"""
         |int $n = $a.numElements();
         |byte[] $bits = new byte[$numPlanes];
         |boolean $degen = ($n != $dim);
         |for (int $d = 0; !$degen && $d < $n; $d++) {
         |  if ($a.isNullAt($d)) $degen = true;
         |}
         |if ($degen) {
         |  java.util.Arrays.fill($bits, (byte) '0');
         |} else {
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      long $idx = $p * ${dim}L + $d;
         |      long $x = ($idx * 2654435761L + 1013904223L) & 4294967295L;
         |      $acc += (((($x >> 16) & 1L) == 1L) ? 1.0 : -1.0) * (double) $a.getFloat($d);
         |    }
         |    $bits[$p] = ($acc > 0) ? (byte) '1' : (byte) '0';
         |  }
         |}
         |Object[] $keys = new Object[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  $keys[$b] = org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |    java.util.Arrays.copyOfRange($bits, $b * $bandBits, ($b + 1) * $bandBits));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBandKeys =
    copy(child = newChild)
}

object SignBandKeys {

  /** Embedding dimensionality baked into the plane-weight LCG's flat
    * index — MUST equal [[graft.operators.VectorOps.Dim]], which
    * generates the literal matrix the DuckDB oracle evaluates.
    */
  val Dim = 64

  /** Same LCG as VectorOps.planeWeight, as a double (±1.0). */
  def weight(p: Int, d: Int): Double = {
    val i = p.toLong * Dim + d
    val x = (i * 2654435761L + 1013904223L) % 4294967296L
    if (((x >> 16) & 1L) == 1L) 1.0 else -1.0
  }
}
