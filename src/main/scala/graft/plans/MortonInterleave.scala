package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Native codegen'd Morton (Z-order) bit interleave of two integral
  * columns, `bits` bits each: bit i of x lands at position 2i, bit i of y
  * at 2i+1; inputs are masked to `bits` bits first.
  *
  * Semantics are EXACTLY `Layout.mortonKeyExpr` (the composed-builtin
  * form) — asserted bit-exact in ExpressionSpec. What changes is the
  * generated code: the builtin tree lowers to 2·bits AND/shift/multiply/add
  * expression nodes (a ~2-screen codegen block per reference), while this
  * expression emits ONE tight loop with a scalar accumulator. Same
  * extension-surface rationale as FloatVectorDot: custom scalar = Catalyst
  * `Expression` with `doGenCode`, registered through GraftExtensions,
  * never a Scala UDF.
  */
case class MortonInterleave(left: Expression, right: Expression,
                            bits: Int = 16) extends BinaryExpression {

  // IntegralType is private[sql]; enumerate the integral types instead.
  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType)
        && bits >= 1 && bits <= 32)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_interleave requires two integral arguments and bits in " +
        s"[1, 32], got (${left.dataType}, ${right.dataType}, bits=$bits)")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_interleave"

  private val mask = (1L << bits) - 1

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Number].longValue() & mask
    val y = b.asInstanceOf[Number].longValue() & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |final long $x = ((long) $a) & ${mask}L;
         |final long $y = ((long) $b) & ${mask}L;
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i) | (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}
