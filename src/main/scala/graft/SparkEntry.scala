package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Declared, LlmDeclared}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-equivalent SQL for every SQL-expressible
  * entry (same column names/types — the driver hash-compares values under
  * name-sorted columns).
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (TPC-H Q1 shape); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("d02_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** D1–D48 + D29 (relational plane) + L1–L51 (LLM-data-pipeline plane). */
  def allDeclared: Seq[graft.queries.DeclaredQuery] =
    Declared.all ++ LlmDeclared.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDeclared.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    allDeclared.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
