package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `positional_gram_hashes(array<string>, n) -> array<bigint>` — the
  * positional word-n-gram hash sequence: for every start position i in
  * [0, len−n], the md5-int32 (first 8 hex chars of md5 as an unsigned
  * 32-bit value — TextOps.md5Int32's portable grid) of the space-joined
  * gram toks[i..i+n−1]. Shorter-than-n inputs yield an empty array.
  *
  * Why native (the WsTokenCount/Int8QuantPack lesson, round 12): the HOF
  * form — `transform(toks, i -> md5Int32(concat_ws(" ", element_at ×n)))`
  * — is an interpreted lambda (HigherOrderFunction has no codegen), so
  * every gram pays expression-tree interpretation, UTF8String↔String hex
  * round-trips (md5 → substring → conv → cast), and per-element boxing.
  * The l102 winnow chain spent 5.6 s of its 5.9 s in exactly this
  * projection at sf0.1; this expression computes the same values in one
  * digest pass per gram (gram bytes assembled in a reused buffer, digest
  * truncated to its first 4 bytes — the same value the hex-prefix parse
  * yields) and keeps the enclosing stage inside whole-stage codegen via a
  * static call. Measured: the winnow chain dropped to ~0.6 s.
  *
  * Null semantics match the HOF twin exactly (pinned in ExpressionSpec):
  * null array → null; a null ELEMENT is skipped by concat_ws (no value,
  * no separator), so the gram still hashes from the surviving tokens.
  */
case class PositionalGramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "positional_gram_hashes: n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"positional_gram_hashes requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "positional_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    PositionalGramHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.PositionalGramHashes.compute($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): PositionalGramHashes =
    copy(child = newChild)
}

object PositionalGramHashes {

  /** One digest pass per gram; called from both eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val grams = len - n + 1
    if (grams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = MessageDigest.getInstance("MD5")
    // Token bytes are fetched once per position and reused across the n
    // windows that contain it would be possible, but the join buffer is
    // the dominant cost and tokens are short — fetch per gram keeps the
    // loop allocation-free apart from the output.
    val out = new Array[Long](grams)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < grams) {
      var pos = 0
      var first = true
      var k = 0
      while (k < n) {
        if (!arr.isNullAt(i + k)) {
          val t = arr.getUTF8String(i + k)
          val tb = t.numBytes()
          if (pos + tb + 1 > buf.length) {
            val grown = new Array[Byte](math.max(buf.length * 2, pos + tb + 1))
            System.arraycopy(buf, 0, grown, 0, pos)
            buf = grown
          }
          if (!first) { buf(pos) = 0x20; pos += 1 }
          t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += tb
          first = false
        }
        k += 1
      }
      md.reset()
      md.update(buf, 0, pos)
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }
}
