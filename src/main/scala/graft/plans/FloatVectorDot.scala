package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two numeric vector columns
  * (`array<float>` or `array<double>` on either side).
  *
  * Semantics are EXACTLY the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` — a
  * sequential left fold of the pairwise products in doubles, so results are
  * bit-identical to both the HOF plan and the DuckDB `list_reduce` oracle
  * (float→double widening is exact). What changes is the execution: the HOF
  * chain materializes an intermediate `array<double>` per row (zip_with)
  * and walks it through a generic fold; this expression is one fused loop
  * over the raw ArrayData with a scalar accumulator — no allocation,
  * whole-stage-codegen friendly. At 100 TB × 64-1024 dims the per-row
  * allocation difference is the similarity scan's hot spot.
  *
  * Extension-surface demo per SURVEY §7.5/§2.6-S9: custom scalar =
  * Catalyst `Expression` with `doGenCode`, registered through
  * `SparkSessionExtensions` (GraftExtensions), never a Scala UDF.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  // ExpectsInputTypes is off-limits outside org.apache.spark.sql
  // (AbstractDataType is private[sql]); the check is hand-rolled instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"fvec_dot requires array<float|double> arguments, got " +
          s"(${left.dataType}, ${right.dataType})")
    }

  override def dataType: DataType = DoubleType

  /** NULL-producing on edge inputs (below) even when both arrays are
    * non-null, so nullability cannot be derived from the children. */
  override def nullable: Boolean = true

  override def prettyName: String = "fvec_dot"

  private lazy val leftFloat = elemType(left.dataType).contains(FloatType)
  private lazy val rightFloat = elemType(right.dataType).contains(FloatType)

  /** Interpreted path (non-codegen fallback): same fold, same order.
    * Edge semantics match the HOF reference exactly: mismatched lengths
    * yield NULL (zip_with pads the shorter side with nulls, so the fold
    * result is null) and any null element yields NULL (null product
    * poisons the sum). */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, isFloat: Boolean): String =
        if (isFloat) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, leftFloat)} * ${get(b, rightFloat)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}
