package graft.functions

import graft.schema.Schemas
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** VAL1 — enum/domain validation + quarantine.
  *
  * The reference declares enums in its DDL (setupTables.py:53,56) but its
  * generator inserts the out-of-enum 'NONMON' (updateTables.py:13,21), which
  * MySQL non-strict mode silently coerces to the empty-string error value.
  * This engine makes the violation explicit: rows are split into (valid,
  * quarantine) with a per-row violation list, never coerced.
  *
  * Pure column expressions — a single codegen'd pass; at scale this is one
  * map-side filter per branch with the same scan feeding both (Spark reuses
  * the exchange/scan under AQE when both branches are materialized in one
  * action).
  */
object Validation {

  /** Violation checks as (name, predicate-of-failure). varchar(3) length on
    * city is part of the DDL contract (setupTables.py:52). */
  private def violations: Seq[(String, Column)] = Seq(
    "city_domain" -> !col("city").isin(Schemas.cityDomain: _*),
    "city_len" -> (length(col("city")) > 3),
    "transaction_type_domain" ->
      !col("transaction_type").isin(Schemas.transactionTypeDomain: _*),
    "feature_domain" -> !col("feature_used").isin(Schemas.featureDomain: _*),
    "monetary_range" ->
      (col("monetary_value") < Schemas.monetaryMin.toDouble
        || col("monetary_value") > Schemas.monetaryMax.toDouble),
    "user_id_range" ->
      (col("user_id") < Schemas.idRangeStart || col("user_id") >= Schemas.idRangeEnd))

  /** Adds a `violation` array column listing every failed check (empty = valid). */
  def annotate(df: DataFrame): DataFrame = {
    val arr = array(violations.map { case (n, bad) =>
      when(bad, lit(n))
    }: _*)
    df.withColumn("violations", filter(arr, _.isNotNull))
  }

  /** Rows passing every domain check. */
  def valid(df: DataFrame): DataFrame =
    annotate(df).filter(size(col("violations")) === 0).drop("violations")

  /** Rows failing any check, with the violation list retained (the NONMON
    * quarantine of SURVEY §2.2 VAL1). */
  def quarantine(df: DataFrame): DataFrame =
    annotate(df).filter(size(col("violations")) > 0)
}
