package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared text-pipeline column expressions over the `documents` corpus
  * (doc_id, text, lang, source, n_chars).
  *
  * Everything here is a pure, codegen-friendly column expression — token
  * and shingle construction happen inside the scan's projection with NO
  * join or shuffle (the naive alternative, a positional self-join of an
  * exploded token table, shuffles the whole corpus twice). Cross-engine
  * note: every hash used for dedup/fingerprinting is md5 (identical bytes
  * in any engine), never Spark-internal Murmur3, so the DuckDB oracles can
  * reproduce results bit-for-bit.
  */
object TextOps {

  /** Whitespace tokens. The corpus is single-space word salad; a literal
    * single-space split is deterministic and dialect-portable. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token COUNT without materializing the tokens — the native
    * `ws_token_count` expression (plans.WsTokenCount): one codegen'd byte
    * scan, no regex engine, no throwaway array. Equal to
    * `size(tokens(text))` on every input (pinned by ExpressionSpec's twin
    * tests and PropertySpec's unicode property); use it at every call site
    * that needs only the count. */
  def tokenCount(text: Column): Column = call_function("ws_token_count", text)

  /** Distinct word n-gram shingles from an ALREADY-MATERIALIZED token-array
    * column (positions are 0-based in the lambda, 1-based in element_at).
    *
    * `toks` must be a bound attribute, not an expression: the lambda reads
    * it ~3n times per row, and codegen re-evaluates expression arguments on
    * every reference — passing `split(text, " ")` here directly re-split
    * the text hundreds of times per row (measured 4× slowdown corpus-wide). */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n,
          concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))),
      x => x.isNotNull))

  /** Exploded (doc_id, shingle) pairs — the shared input of the Jaccard,
    * MinHash, and fingerprint operators. Tokenizes in a separate projection
    * so the array is computed once per row (see shinglesFromTokens). */
  def docShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(shinglesFromTokens(col("toks"), n)).as("s"))

  /** First 8 hex chars of md5 parsed as an unsigned 32-bit value in a LONG —
    * the portable "hash to int" used by SimHash/fingerprinting (DuckDB:
    * ('0x' || substr(md5(x),1,8))::BIGINT). */
  def md5Int32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** THE train/val/test split bucket in [0, 100): every operator that
    * derives split membership per row (stableSplit, both decontaminations,
    * the semantic variant) MUST use this one expression — if the split
    * discipline ever changes, train/eval membership must move in lockstep
    * across the n-gram and embedding paths or decontamination silently
    * diverges. DuckDB twin: ('0x' || substr(md5(id::VARCHAR),1,8))::BIGINT % 100. */
  def splitBucket(id: Column): Column =
    md5Int32(id.cast(StringType)) % 100

  /** THE train/val/test LABEL over splitBucket — the same lockstep rule
    * as the bucket itself: stableSplit, leakageSafeSplit (on the cluster
    * key), and the OOV audit all derive their labels here, so a cut
    * change (e.g. 90/5/5) moves every operator's membership together. */
  def splitLabel(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = splitBucket(id)
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Positional (overlapping) token-bigram occurrences from a BOUND token
    * array — the one bigram definition shared by the batch OOV audit
    * (TextAnalysis.oovRateAudit) and its streaming monitor
    * (StreamOps.oovRateStream): their batch/stream equivalence contract
    * depends on both reading this single expression. `toks` must be a
    * bound attribute (shinglesFromTokens' rule — lambdas re-evaluate
    * expression arguments on every reference). */
  def bigramOccurrences(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
}
