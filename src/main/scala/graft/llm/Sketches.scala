package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, ExpressionEncoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate sketches + the typed-UDAF extension surface (SURVEY §2.6 S9).
  *
  * - approx sketches: `approx_count_distinct` (HLL++) and
  *   `percentile_approx` — constant-memory per group at any scale, the
  *   sketches a 100 TB profile pass actually runs (exactness bounds
  *   asserted in LlmSpec against the exact twins).
  * - SumSquares: the canonical `Aggregator[IN, BUF, OUT]` — an exact
  *   decimal sum-of-squares. The buffer is a DECIMAL, not a double, so the
  *   result is independent of partitioning/merge order (fp addition is not
  *   associative; decimal addition is) — which is exactly what makes it
  *   DuckDB-oracle-checkable.
  */
object Sketches {

  /** Exact Σ value² over DECIMAL(18,2)-quantized inputs. Buffer DECIMAL(38,4):
    * square of (18,2) has scale 4, leaving 34 integer digits — 10^26 rows of
    * max-value (10^8) squares before overflow. (Encoders.DECIMAL would be the
    * system default (38,18) with only 20 integer digits — too tight at 100 TB,
    * and Spark nulls overflowing decimals silently.) */
  object SumSquares extends Aggregator[java.lang.Double, java.math.BigDecimal, Double] {
    private def quant(v: java.lang.Double): java.math.BigDecimal =
      new java.math.BigDecimal(v.doubleValue)
        .setScale(2, java.math.RoundingMode.HALF_UP)
    def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO.setScale(4)
    def reduce(b: java.math.BigDecimal, v: java.lang.Double): java.math.BigDecimal =
      if (v == null) b else { val q = quant(v); b.add(q.multiply(q)) }
    def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
      a.add(b)
    def finish(b: java.math.BigDecimal): Double = b.doubleValue
    def bufferEncoder: Encoder[java.math.BigDecimal] =
      ExpressionEncoder(
        AgnosticEncoders.JavaDecimalEncoder(DecimalType(38, 4),
          lenientSerialization = true))
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-group profile combining the exact twins with their sketches —
    * the exact columns are oracle-checked; the approx columns are bounds-
    * checked in LlmSpec (cross-engine sketch internals differ by design). */
  def profile(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id")).as("approx_users"),
      expr("percentile(value, array(0.25, 0.5, 0.9))").as("pct"),
      expr("percentile_approx(value, 0.5, 10000)").as("approx_p50"))
}
