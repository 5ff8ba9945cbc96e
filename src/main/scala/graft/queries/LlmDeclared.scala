package graft.queries

import graft.Tables
import graft.llm.{Bpe, Dedup, Multimodal, Retrieval, Similarity, Sketches, TextAnalysis, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The LLM-training-data-pipeline declared queries (L1–L93 + the hex scalar
  * D29): dedup, similarity search, text analysis, multimodal plumbing,
  * splits/sampling/mixture scheduling, coverage and drift audits,
  * sketches/UDAF — each oracle-checked against DuckDB on the same parquet.
  *
  * Cross-engine determinism rules specific to this plane:
  *  - All content hashes are md5 (byte-identical in any engine) — never
  *    engine-internal hash functions.
  *  - Every floating-point similarity is a sequential left fold over
  *    doubles (`aggregate`/`zip_with` in Spark, `list_reduce`/`list_apply`
  *    in DuckDB): same values, same operation order ⇒ bit-identical
  *    doubles on both sides.
  *  - Ratios divide exact integers as doubles (one exact division each).
  *  - ROW_NUMBER ranks cast to BIGINT on the Spark side (DuckDB returns
  *    BIGINT).
  */
object LlmDeclared
    extends LlmDeclaredBase
    with LlmDeclaredDedup
    with LlmDeclaredSimilarity
    with LlmDeclaredRetrieval
    with LlmDeclaredText
    with LlmDeclaredSketch
    with LlmDeclaredMultimodal {


  /** D29 — hex encoding scalar (operator CDC6: the DMS `noHexPrefix:false`
    * 0x-prefixed binary rendering, as a portable scalar). */
  private val d29 = DeclaredQuery(
    "d29_hex_encode",
    (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          concat(lit("0x"), hex(col("c_name"))).as("hexname"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, '0x' || hex(c_name) AS hexname
      FROM customer ORDER BY c_custkey"""))

  val all: Seq[DeclaredQuery] = Seq(
    l01, l02, l03, l04, l05, l06, l07, l08, l09, l10,
    l11, l12, l13, l14, l15, l16, l17, l18, l19, l20,
    l21, l22, l23, l24, l25, l26, l27, l28, l29, l30,
    l31, l32, l33, l34, l35, l36, l37, l38, l39, l40,
    l41, l42, l43, l44, l45, l46, l47, l48, l48b, l49, l50,
    l51, l52, l53, l54, l55, l56, l57, l58, l59, l60, l61, l62, l63,
    l64, l65, l66, l67, l67b, l68, l69, l70, l71, l72, l73, l74, l75,
    l76, l77, l78, l79, l80, l81, l82, l83, l84, l85, l86, l87, l88,
    l89, l90, l91, l92, l93, l94, l95, l96, l97, l98, l99, l100,
    l101, l102, l103, l104, l105, l106, l107, l108, l109, l110, l111,
    l112, l113, l114, l115, l116, l117, l118, l119, l120, l121, l122,
    l123, l124, l125, l126, l127, l128, l129, l130, l131, l132, l133,
    l134, l135, l136, l137, l138, l139, l140, l141, l142, l143, l144,
    l145, l146, l147, l148, l149, l150, l151, l152, d29)
}
