package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd symmetric-int8 quantization summary over one vector
  * column (`array<float>` or `array<double>`), returning
  * `struct<n_dims:bigint, scale:double, code_min:bigint, code_max:bigint,
  * code_sum:bigint, recon_err:double>` in two fused passes per row.
  *
  * Semantics are EXACTLY the HOF formulation it replaces
  * (Similarity.quantizeInt8's previous body):
  *   e      = transform(v, x -> double(x))
  *   scale  = array_max(transform(e, abs)) / 127.0
  *   codes  = transform(e, x -> scale = 0 ? 0L : floor(x/scale + 0.5)::long)
  *   out    = (size(e), scale, min(codes), max(codes),
  *             fold-left(+ over codes), fold-left(+ over (x - c*scale)^2))
  * Both folds run left-to-right in declaration order, so the doubles are
  * bit-identical to the HOF plan and to DuckDB's `list_reduce` oracle.
  *
  * What changes is the execution: the HOF plan materialized two intermediate
  * arrays per row (`e`, `codes`) and walked the vector EIGHT times through
  * interpreted lambda evaluators split across four non-codegen Project
  * nodes; this expression is two allocation-free loops over the raw
  * ArrayData inside whole-stage codegen. At 100 TB × 64-1024 dims the
  * interpreted-lambda overhead dominates the quantization scan — this is
  * the same per-row-fusion argument as FloatVectorDot, applied to a
  * multi-output reduction (struct return instead of scalar).
  *
  * Edge semantics: a 0-length vector yields `(0, null, null, null, 0, 0.0)`
  * — exactly the HOF chain (array_max over an empty array is null, the
  * empty folds return their zero elements); an all-zero vector quantizes to
  * all-zero codes (scale-0 guard). ONE deliberate divergence: a null
  * ELEMENT yields a NULL struct here, where the HOF chain emits a
  * partially-null row (array_max silently skips null elements, so its
  * `scale` ignores the null while the folds poison to null) — the HOF
  * behavior is an accident of array_max's skip-null rule, not a spec;
  * the embeddings contract has non-null elements, and conservative NULL
  * is the honest answer for a corrupt vector. Reference analog: none —
  * beyond-reference LLM plane (SURVEY §2.7 L25).
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats requires array<float|double>, got $other")
  }

  override def dataType: DataType = Int8QuantStats.schema

  /** NULL on empty vectors / null elements even when the array itself is
    * non-null, so nullability cannot be derived from the child. */
  override def nullable: Boolean = true

  override def prettyName: String = "int8_quant_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0)
      return new GenericInternalRow(Array[Any](0L, null, null, null, 0L, 0.0))
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
    var cmin = Long.MaxValue
    var cmax = Long.MinValue
    var csum = 0L
    var err = 0.0
    i = 0
    while (i < n) {
      val v = if (elemFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val c = Int8Quant.code(v, scale)
      if (c < cmin) cmin = c
      if (c > cmax) cmax = c
      csum += c
      val d = v - c.toDouble * scale
      err += d * d
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, scale, cmin, cmax, csum, err))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val cmin = ctx.freshName("cmin")
      val cmax = ctx.freshName("cmax")
      val csum = ctx.freshName("csum")
      val err = ctx.freshName("err")
      val v = ctx.freshName("v")
      val absV = ctx.freshName("absV")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val get =
        if (elemFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val rowCls = classOf[GenericInternalRow].getName
      s"""
         |final int $n = $arr.numElements();
         |double $maxAbs = 0.0;
         |if ($n == 0) {
         |  ${ev.value} = new $rowCls(new Object[] {
         |    0L, null, null, null, 0L, 0.0 });
         |}
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = $get;
         |  final double $absV = Math.abs($v);
         |  if ($absV > $maxAbs) { $maxAbs = $absV; }
         |}
         |if (!${ev.isNull} && $n > 0) {
         |  final double $scale = ${Int8Quant.scaleCall}($maxAbs);
         |  long $cmin = Long.MAX_VALUE;
         |  long $cmax = Long.MIN_VALUE;
         |  long $csum = 0L;
         |  double $err = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $v = $get;
         |    final long $c = ${Int8Quant.codeCall}($v, $scale);
         |    if ($c < $cmin) { $cmin = $c; }
         |    if ($c > $cmax) { $cmax = $c; }
         |    $csum += $c;
         |    final double $d = $v - ((double) $c) * $scale;
         |    $err += $d * $d;
         |  }
         |  ${ev.value} = new $rowCls(new Object[] {
         |    (long) $n, $scale, $cmin, $cmax, $csum, $err });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object Int8QuantStats {
  /** Field order is the l25 output contract (minus vec_id). scale/min/max
    * are nullable because the empty-vector row carries nulls there. */
  val schema: StructType = StructType(Seq(
    StructField("n_dims", LongType, nullable = false),
    StructField("scale", DoubleType, nullable = true),
    StructField("code_min", LongType, nullable = true),
    StructField("code_max", LongType, nullable = true),
    StructField("code_sum", LongType, nullable = false),
    StructField("recon_err", DoubleType, nullable = false)))
}
