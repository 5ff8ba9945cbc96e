package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.llm._

/** Shared fixture loader + DuckDB helper fragments for every LLM declared-query family trait.
  *
  * Mechanical split of the single LlmDeclared registry (round 13,
  * VERDICT directive #8) — every member moved verbatim; `LlmDeclared.all`
  * preserves the original declaration order, so bench sequence and
  * artifacts stay comparable round-over-round.
  */
private[queries] trait LlmDeclaredBase {

  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)


  /** DuckDB list-comprehension shingle CTE shared by the text oracles:
    * distinct word 3-grams per document. */
  protected val shingleCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, len(w) - 1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      |       FROM t)""".stripMargin


  /** DuckDB sequential-fold cosine over two float lists (bit-identical to
    * Spark's zip_with/aggregate fold — same values, same order). */
  protected def duckCosine(a: String, b: String): String =
    s"""list_reduce(list_apply(list_zip($a, $b),
       |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (x, y) -> x + y)
       |/ (sqrt(list_reduce(list_apply($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
       | * sqrt(list_reduce(list_apply($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))""".stripMargin


  // ---------------------------------------------------- text-analysis plane

  protected def duckList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")
}
