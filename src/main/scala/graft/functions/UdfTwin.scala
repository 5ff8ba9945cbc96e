package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** S9's UDF-overhead twin (SURVEY §2.6): ONE scalar computation expressed
  * two ways — a black-box Scala `udf()` and the codegen'd builtin chain —
  * so the cost of leaving whole-stage codegen is measurable on this exact
  * engine rather than folklore.
  *
  * The variants are semantically identical (equality-tested over the full
  * corpus, nulls included) so any timing difference is pure execution
  * mechanism. The measured result (DevUdfOverhead, recorded in README)
  * CONTRADICTS the folklore ranking: the `udf()` beat `size(split(...))`
  * ~2.5× here, because the builtin chain drives the general regex engine
  * and materializes every token as a throwaway UTF8String just to count
  * them, while the UDF's `String.split` takes the JVM's single-char
  * non-regex fast path — UTF8String→String conversion and boxing cost
  * less than the regex engine. Both lose ~4×/10× to the third form, the
  * native `ws_token_count` expression (plans.WsTokenCount), which counts
  * separator bytes in one codegen'd scan with no tokens at all.
  *
  * The library-design consequence stands, refined: hot-path scalars are
  * custom Catalyst expressions when the builtin chain would materialize
  * intermediates the query doesn't need (fvec_dot, int8_quant_stats,
  * ws_token_count); `udf()` remains the cold-path escape hatch — and
  * "builtin chain" is not automatically the fast lane; measure it.
  */
object UdfTwin {

  /** Whitespace token count as a Scala UDF. `split(" ", -1)` keeps trailing
    * empty strings — the same contract as SQL split's limit=-1 — and null
    * text maps to null, matching `size(split(NULL, ...))` under Spark 4's
    * default (non-legacy) sizeOfNull. */
  val tokensUdf: UserDefinedFunction = udf((s: String) =>
    Option(s).map(_.split(" ", -1).length))

  /** The codegen'd twin: identical semantics, never leaves Tungsten. */
  def tokensNative(c: Column): Column = size(split(c, " "))
}
