package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `int8_pack(array<long>) -> binary` — pack int8 quantization codes
  * (range [-127, 127] by the symmetric-quantization construction; anything
  * in signed-byte range is accepted) into one byte each.
  *
  * This is the missing half of the l48 memory-bandwidth story: the coarse
  * rerank pass exists to scan SMALL integers, but an `array<long>` codes
  * column stores 8 bytes + offset metadata per code — the scan reads more
  * bytes than the float embedding it replaces. A `binary` column is 1 byte
  * per code: 8× less scan bandwidth, and (with `int8_packed_dot`) the dot
  * runs over the raw byte array with no per-element null/offset checks.
  *
  * A code outside signed-byte range returns NULL (conservative corrupt-
  * input answer, same policy as Int8QuantStats' null-element rule) — a
  * silent truncation would quietly corrupt every similarity downstream.
  */
case class Int8Pack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_pack requires array<bigint>, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_pack"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getLong(i)
      if (v < Byte.MinValue || v > Byte.MaxValue) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $arr.numElements();
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final long $v = $arr.getLong($i);
         |  if ($v < -128L || $v > 127L) { ${ev.isNull} = true; break; }
         |  $out[$i] = (byte) $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Pack =
    copy(child = newChild)
}

/** `int8_quant_pack(array<float|double>) -> struct<scale:double,
  * codes:binary>` — the FUSED quantize-and-pack: symmetric-int8 scale and
  * byte-packed codes in two allocation-free passes per row, entirely inside
  * whole-stage codegen.
  *
  * Why fused: building codes as `transform(e, ...)` and packing with
  * `int8_pack` leaves an ArrayTransform (interpreted HOF — no codegen) in
  * the projection, which ejects the WHOLE quantize stage from codegen and
  * materializes an 8-byte-per-code intermediate array per row — exactly the
  * interpreted-lambda tax Int8QuantStats eliminated for l25, paid again.
  * Value semantics are the l48/l25 formulation exactly:
  *   scale = max(abs(double(x))) / 127.0
  *   codes[i] = scale == 0 ? 0 : floor(x/scale + 0.5)  (∈ [-127,127])
  * Edge policy (same conservative rule as Int8QuantStats): empty vector →
  * (scale null is the HOF accident; here empty → null struct), null
  * element → null struct. The embeddings contract has non-empty, non-null
  * vectors; anything else is corrupt input and answers NULL.
  */
case class Int8QuantPack(child: Expression) extends UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_pack requires array<float|double>, got $other")
  }

  override def dataType: DataType = Int8QuantPack.schema
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quant_pack"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (elemFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(v)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = Int8Quant.scaleOf(maxAbs)
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val v = if (elemFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = Int8Quant.code(v, scale).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val v = ctx.freshName("v")
      val absV = ctx.freshName("absV")
      val out = ctx.freshName("out")
      val get =
        if (elemFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val rowCls =
        classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = $get;
         |  final double $absV = Math.abs($v);
         |  if ($absV > $maxAbs) { $maxAbs = $absV; }
         |}
         |if (!${ev.isNull}) {
         |  final double $scale = ${Int8Quant.scaleCall}($maxAbs);
         |  final byte[] $out = new byte[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $v = $get;
         |    $out[$i] = (byte) ${Int8Quant.codeCall}($v, $scale);
         |  }
         |  ${ev.value} = new $rowCls(new Object[] { $scale, $out });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QuantPack =
    copy(child = newChild)
}

object Int8QuantPack {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))
}

/** `int8_packed_dot(binary, binary) -> bigint` — integer dot product over
  * two `int8_pack`ed code vectors: Σ sign-extended(l[i]) · sign-extended(r[i]).
  *
  * The int8 coarse-pass kernel in its scan-native form: one tight loop over
  * two raw byte arrays inside whole-stage codegen — no ArrayData element
  * accessors, no per-element null checks (a packed vector is non-null
  * element-wise by construction), no boxing. The widest possible value is
  * 127·127·n — overflow-free in a long for any real embedding
  * dimensionality. Length mismatch returns NULL (dimension-corrupt input,
  * same conservative policy as Int8Pack).
  */
case class Int8PackedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int8_packed_dot requires (binary, binary), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_packed_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.length != b.length) return null
    var s = 0L
    var i = 0
    while (i < a.length) {
      s += a(i).toLong * b(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($l.length != $r.length) { ${ev.isNull} = true; }
         |else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $l.length; $i++) {
         |    $s += ((long) $l[$i]) * ((long) $r[$i]);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8PackedDot =
    copy(left = newLeft, right = newRight)
}
