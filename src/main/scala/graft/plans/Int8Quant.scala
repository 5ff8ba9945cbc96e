package graft.plans

/** The ONE symmetric-int8 element kernel shared by every quantizing
  * expression (round-12 directive #4): `Int8QuantStats` (the l25/l48
  * stats/unpacked form) and `Int8QuantPack` (the l48b fused
  * quantize-and-pack) previously each carried their own copy of the
  * scale/round arithmetic in BOTH execution modes — a future rounding
  * tweak would have had to land in four places to keep the
  * ExpressionSpec equality proofs honest. Now both interpreted evals
  * call these methods directly, and both codegen bodies emit calls to
  * the same methods through the object's static forwarders (`codeCall`/
  * `scaleCall` below) — trivially JIT-inlined, so the generated loop is
  * as tight as the previous inline arithmetic.
  *
  * Semantics (the l25/l48 formulation, bit-for-bit):
  *   scale    = max(abs(double(x))) / 127.0
  *   code(x)  = scale == 0 ? 0 : floor(x/scale + 0.5)   (∈ [-127, 127])
  */
object Int8Quant {

  /** Symmetric scale for a vector whose max |element| is `maxAbs`. */
  def scaleOf(maxAbs: Double): Double = maxAbs / 127.0

  /** The per-element code. The scale-0 guard makes the all-zero vector
    * quantize to all-zero codes instead of NaN-poisoning the row. */
  def code(v: Double, scale: Double): Long =
    if (scale == 0.0) 0L else math.floor(v / scale + 0.5).toLong

  /** Codegen call sites (static forwarders on the object's class). */
  val codeCall: String = "graft.plans.Int8Quant.code"
  val scaleCall: String = "graft.plans.Int8Quant.scaleOf"
}
