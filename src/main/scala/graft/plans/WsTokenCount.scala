package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace token count: `ws_token_count(s) = size(split(s, ' '))`
  * = number-of-spaces + 1, computed as one allocation-free byte scan over
  * the UTF8String inside whole-stage codegen.
  *
  * Why it exists (S9's measured lesson, DevUdfOverhead): the builtin chain
  * `size(split(...))` drives the full java.util.regex engine and
  * materializes every token as a throwaway UTF8String just to count them —
  * on this engine it times SLOWER than a black-box Scala UDF (whose
  * `String.split` single-char fast path skips the regex engine). The right
  * form is neither: counting requires no tokens at all. A 0x20 byte in
  * UTF-8 is always the space character (multi-byte sequences use only
  * bytes >= 0x80), so the byte scan is exact on any input.
  *
  * Semantics pin (ExpressionSpec, corpus + edges): equals `size(split(s, ' '))`
  * and the UDF twin everywhere — empty string is 1 token, leading/trailing/
  * repeated spaces produce empty tokens that all three count, null in →
  * null out. */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_token_count requires string, got $other")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "ws_token_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var count = 1
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) count += 1
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |final int $n = $s.numBytes();
         |int $cnt = 1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($s.getByte($i) == 0x20) { $cnt++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}
