package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's SparkSessionExtensions entry point — custom Catalyst
  * surface is registered here (and ONLY here), activated by
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession sets
  * it; any foreign session can opt in the same way).
  *
  * Registered functions:
  *  - `fvec_dot(array<float>, array<float>) -> double` — see FloatVectorDot.
  *  - `morton_interleave(x, y[, bits]) -> long` — see MortonInterleave.
  *  - `int8_quant_stats(array<float>) -> struct` — see Int8QuantStats.
  *  - `ws_token_count(string) -> int` — see WsTokenCount.
  *  - `bounded_top_m(score, id, m) -> array<struct>` — see BoundedTopM.
  *  - `int8_pack(array<bigint>) -> binary` / `int8_packed_dot(binary,
  *    binary) -> bigint` — see Int8Packed (the l48b byte-packed codes path).
  *  - `positional_gram_hashes(array<string>, n) -> array<bigint>` — see
  *    PositionalGramHashes (the l102 winnowing hash sequence).
  *  - `gram_extent(ha, pa, hb, pb) -> array<bigint>` — see GramExtent
  *    (the l114 anchor extension).
  *
  * Registered optimizer rules:
  *  - RewriteHofDotToFvecDot — user-written `aggregate(zip_with(...))`
  *    dot-product chains execute as the fused fvec_dot loop (conf-gated
  *    via `spark.graft.rewriteHofDot`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rule: user-written HOF dot-product chains execute as the
    // fused fvec_dot loop (see RewriteHofDotToFvecDot; conf-gated).
    ext.injectOptimizerRule(_ => RewriteHofDotToFvecDot)
    ext.injectFunction((
      FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "fvec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "fvec_dot takes exactly 2 arguments")
        FloatVectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("morton_interleave"),
      new ExpressionInfo(classOf[MortonInterleave].getName, "morton_interleave"),
      (children: Seq[Expression]) => children match {
        case Seq(x, y) => MortonInterleave(x, y)
        case Seq(x, y, b) =>
          val bits = b match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case _ => throw new IllegalArgumentException(
              "morton_interleave: bits must be an integer literal")
          }
          MortonInterleave(x, y, bits)
        case _ => throw new IllegalArgumentException(
          "morton_interleave takes 2 or 3 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_quant_stats"),
      new ExpressionInfo(classOf[Int8QuantStats].getName, "int8_quant_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "int8_quant_stats takes exactly 1 argument")
        Int8QuantStats(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("ws_token_count"),
      new ExpressionInfo(classOf[WsTokenCount].getName, "ws_token_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "ws_token_count takes exactly 1 argument")
        WsTokenCount(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("bounded_top_m"),
      new ExpressionInfo(classOf[BoundedTopM].getName, "bounded_top_m"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "bounded_top_m takes exactly 3 arguments")
        BoundedTopM(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_pack"),
      new ExpressionInfo(classOf[Int8Pack].getName, "int8_pack"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "int8_pack takes exactly 1 argument")
        Int8Pack(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_quant_pack"),
      new ExpressionInfo(classOf[Int8QuantPack].getName, "int8_quant_pack"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "int8_quant_pack takes exactly 1 argument")
        Int8QuantPack(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("positional_gram_hashes"),
      new ExpressionInfo(classOf[PositionalGramHashes].getName,
        "positional_gram_hashes"),
      (children: Seq[Expression]) => children match {
        case Seq(toks, nExpr) =>
          val n = nExpr match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case _ => throw new IllegalArgumentException(
              "positional_gram_hashes: n must be an integer literal")
          }
          PositionalGramHashes(toks, n)
        case _ => throw new IllegalArgumentException(
          "positional_gram_hashes takes exactly 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("gram_extent"),
      new ExpressionInfo(classOf[GramExtent].getName, "gram_extent"),
      (children: Seq[Expression]) => {
        require(children.length == 4, "gram_extent takes exactly 4 arguments")
        GramExtent(children.head, children(1), children(2), children(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_packed_dot"),
      new ExpressionInfo(classOf[Int8PackedDot].getName, "int8_packed_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "int8_packed_dot takes exactly 2 arguments")
        Int8PackedDot(children.head, children(1))
      }))
  }
}
