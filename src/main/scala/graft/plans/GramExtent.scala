package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `gram_extent(ha, pa, hb, pb) -> array<bigint> [l, r]` — the longest
  * common extension around an aligned anchor: with `pa`/`pb` 1-based
  * positions into the two hash arrays, `l` = the largest backward offset
  * with ha[pa−t] == hb[pb−t] for all t ≤ l, `r` = the largest forward
  * offset with ha[pa+t] == hb[pb+t] for all t ≤ r (bounds clamp at the
  * array ends). The l114 substring-dedup extension step.
  *
  * Why native (the PositionalGramHashes lesson): the HOF form —
  * `array_position(transform(sequence(1, bound), t -> ha[pa−t] !=
  * hb[pb−t]), true)` — runs interpreted, pays two array element lookups
  * plus expression-tree dispatch per step, and the `when(mism === 0, …)
  * .otherwise(mism − 1)` consumer references the transform twice, so the
  * whole scan evaluates twice per anchor. At sf0.1's 431k anchors the
  * l114 chain spent ~7 of its 8.5 s there; this expression is two tight
  * primitive loops per anchor. Values are pinned equal to the HOF twin
  * in ExpressionSpec; the DuckDB oracle replays the HOF form bit-for-bit
  * (same equality scans).
  *
  * Null: any null input → null. Out-of-range anchors (pa/pb < 1 or past
  * the array end) are caller bugs — positions come from winnow selection
  * which is in-range by construction — and clamp to l = r = 0.
  */
case class GramExtent(ha: Expression, pa: Expression,
                      hb: Expression, pb: Expression)
    extends QuaternaryExpression {

  override def first: Expression = ha
  override def second: Expression = pa
  override def third: Expression = hb
  override def fourth: Expression = pb

  override def checkInputDataTypes(): TypeCheckResult =
    (ha.dataType, pa.dataType, hb.dataType, pb.dataType) match {
      case (ArrayType(LongType, _), IntegerType, ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_extent requires (array<bigint>, int, array<bigint>, int), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_extent"

  override protected def nullSafeEval(haV: Any, paV: Any, hbV: Any, pbV: Any): Any =
    GramExtent.compute(haV.asInstanceOf[ArrayData], paV.asInstanceOf[Int],
      hbV.asInstanceOf[ArrayData], pbV.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p, b, q) =>
      s"${ev.value} = graft.plans.GramExtent.compute($a, $p, $b, $q);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): GramExtent =
    copy(ha = newFirst, pa = newSecond, hb = newThird, pb = newFourth)
}

object GramExtent {

  /** Two primitive equality scans; called from eval and generated code. */
  def compute(ha: ArrayData, pa: Int, hb: ArrayData, pb: Int): ArrayData = {
    val na = ha.numElements()
    val nb = hb.numElements()
    val maxBack = math.min(pa, pb) - 1
    val maxFwd = math.min(na - pa, nb - pb)
    var l = 0L
    var t = 1
    // 1-based positions -> 0-based indices: element p is at index p-1
    while (t <= maxBack && ha.getLong(pa - t - 1) == hb.getLong(pb - t - 1)) {
      l += 1; t += 1
    }
    var r = 0L
    t = 1
    while (t <= maxFwd && ha.getLong(pa + t - 1) == hb.getLong(pb + t - 1)) {
      r += 1; t += 1
    }
    new GenericArrayData(Array(l, r))
  }
}
