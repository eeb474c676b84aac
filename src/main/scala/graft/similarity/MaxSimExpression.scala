package graft.similarity

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** ColBERT-style late-interaction MaxSim over m-way chunked sub-vectors as
  * ONE native codegen kernel: Σᵢ maxⱼ ⟨a[i·s..], b[j·s..]⟩ with s = dim/m.
  *
  * Replaces the r16 HOF tower in Ann.maxSimTopK — nested
  * `transform(sequence(...))` lambdas with 8 `slice` copies of the probe
  * and 64 `slice` copies of the candidate PER PAIR (every slice allocates
  * a fresh array), an `array_max`, and an `aggregate` fold — with a tight
  * triple loop over the two original ArrayData buffers, zero allocation.
  * (Guide §1.2 step 2 / the DotProductExpression precedent: the HOF path
  * evaluates interpreted lambdas per element.)
  *
  * Bit-exactness with the HOF formulation, which the DuckDB oracle mirrors:
  * each sub-dot accumulates in index order (the vec_dot sequence), the max
  * uses java.lang.Double.compare (Catalyst's array_max ordering: NaN
  * greatest, 0.0 > −0.0), and the outer sum folds left from 0.0 in i order
  * exactly like `aggregate(perQuery, 0.0, acc + x)`.
  */
case class MaxSimExpression(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_maxsim expects array<float|double>, got $other")
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(first, second).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }) && third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "vec_maxsim(a: array<float|double>, b: array<float|double>, m: int)")
  }

  override def nullSafeEval(a: Any, b: Any, m: Any): Any =
    VecOps.maxsim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m.asInstanceOf[Int], isFloat(first), isFloat(second))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, m) =>
      s"graft.similarity.VecOps.maxsim($a, $b, $m, ${isFloat(first)}, ${isFloat(second)})")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
