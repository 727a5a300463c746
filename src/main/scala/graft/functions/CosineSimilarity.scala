package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen cosine similarity over two float-array columns.
  *
  * The composed form (`aggregate(zip_with(...))` dot product plus two
  * norm folds) walks each array three times through lambda-function
  * interpreters; this expression computes dot and both norms in ONE
  * fused loop inside whole-stage codegen — the §7.3 "custom pieces,
  * extension-only" case (SURVEY.md), justified for the KNN hot path
  * where the expression runs N·|Q| times per query.
  *
  * Bit-compatibility contract with the composed form and the DuckDB
  * oracle: each accumulator (dot, ‖x‖², ‖y‖²) adds float products
  * promoted to double in index order — exactly the in-order fold the
  * oracle runs — and the result is `dot / (sqrt(nx) * sqrt(ny))` with
  * the left operand's norm first, matching OracleVectors. Verified by
  * the `emb_knn_native` query hashing equal to `emb_knn_exact`'s
  * oracle.
  *
  * Mismatched lengths fold over the common prefix; null arrays are
  * null-propagated by the BinaryExpression contract, and a null
  * ELEMENT inside the common prefix null-propagates the whole result —
  * `getFloat` on a null slot would otherwise silently read 0.0, where
  * the composed `zip_with`/`aggregate` form yields a null sim; the
  * explicit `isNullAt` check keeps the two forms bit-compatible on
  * arrays containing nulls (parquet list elements are nullable by
  * default, so this path is reachable from every scan).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  /** Nullable whenever a null RESULT is reachable: null inputs OR null
    * elements (containsNull). Without this override the default
    * (children nullability only) marks e.g.
    * `cosine_sim(array(CAST(NULL AS FLOAT), ...), ...)` non-nullable,
    * and the null this expression returns for the null element is
    * silently coerced to 0.0 downstream — precisely the fake-zero the
    * null-propagation contract exists to prevent.
    */
  override def nullable: Boolean =
    left.nullable || right.nullable ||
      ((left.dataType, right.dataType) match {
        case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
        case _ => true
      })

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // when the expression is non-nullable, ev.isNull is the LITERAL
      // "false" — emitting an assignment to it would be invalid Java,
      // and the element-null branch is unreachable anyway (containsNull
      // is false on both sides)
      val nullCheck =
        if (nullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val assign =
        if (nullable)
          s"${ev.value} = ${ev.isNull} ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));"
        else
          s"${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $nx = 0.0;
         |double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
