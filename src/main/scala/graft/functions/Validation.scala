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
    * city is part of the DDL contract (setupTables.py:52).
    *
    * NULL handling (round-2 advice fix): `!isin(...)` and range predicates
    * evaluate to NULL for NULL input, and `when(NULL, lit)` yields NULL —
    * so without the explicit `isNull` legs, a NULL in a NOT NULL column
    * (e.g. a CDC delete image flattened and re-validated) would silently
    * pass as valid. Every column the DDL declares NOT NULL
    * (setupTables.py:49-59 — all but transaction_type) quarantines NULL
    * explicitly; transaction_type is nullable in the DDL, so NULL passes
    * but a non-NULL out-of-enum value ('NONMON') still fails. */
  private def violations: Seq[(String, Column)] = Seq(
    "city_domain" ->
      (col("city").isNull || !col("city").isin(Schemas.cityDomain: _*)),
    "city_len" -> (length(col("city")) > 3),
    "transaction_type_domain" ->
      (col("transaction_type").isNotNull
        && !col("transaction_type").isin(Schemas.transactionTypeDomain: _*)),
    "feature_domain" ->
      (col("feature_used").isNull
        || !col("feature_used").isin(Schemas.featureDomain: _*)),
    "monetary_range" ->
      (col("monetary_value").isNull
        || col("monetary_value") < Schemas.monetaryMin.toDouble
        || col("monetary_value") > Schemas.monetaryMax.toDouble),
    "user_id_range" ->
      (col("user_id").isNull
        || col("user_id") < Schemas.idRangeStart
        || col("user_id") >= Schemas.idRangeEnd),
    "timeinapp_null" -> col("timeinapp").isNull,
    "ts_null" -> col("ts").isNull)

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
