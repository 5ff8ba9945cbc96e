package graft.rules

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch forms of the reference's 10 commented business rules
  * (setupTables.py:29-44) over `customeractivity` rows
  * (schema = graft.schema.Schemas.customerActivity).
  *
  * These are the *complete* rule semantics; the driver-oracle-checked
  * D-queries cover the same operator shapes on the driver corpus. Every
  * plan here is one key-partitioned shuffle (window or groupBy on user_id)
  * — no cartesian, no driver collect — and the one self-join (C1) is
  * hour-bucketed against key skew exactly like d09.
  */
object BatchRules {

  /** C1 — same account, different cities, within an hour
    * (setupTables.py:31). Bucketed interval self-join: pairs per task are
    * bounded by per-(user, hour) occupancy. */
  def cityHop(activity: DataFrame): DataFrame = {
    val ev = activity.select(col("user_id"), col("city"), col("ts"))
      .withColumn("bkt", floor(unix_timestamp(col("ts")) / 3600L))
    val a = ev.select(col("user_id"), col("city").as("city_a"), col("ts").as("ts_a"),
      explode(array(col("bkt"), col("bkt") + 1)).as("bkt"))
    val b = ev.select(col("user_id"), col("city").as("city_b"), col("ts").as("ts_b"),
      col("bkt"))
    a.join(b, Seq("user_id", "bkt"))
      .filter(col("city_a") =!= col("city_b")
        // simultaneous different-city events are the STRONGEST C1 signal
        // (physically impossible hop) and must not be dropped; the
        // city tiebreak emits each unordered simultaneous pair exactly
        // once (strict > alone lost them; >= alone emitted both orderings)
        && (col("ts_b") > col("ts_a")
          || (col("ts_b") === col("ts_a") && col("city_a") < col("city_b")))
        && col("ts_b") <= col("ts_a") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("city_a"), col("ts_a"), col("city_b"), col("ts_b"))
  }

  /** C2 — overlapping app sessions (setupTables.py:32): the previous
    * session (prev_ts + timeinapp seconds) is still open when the next row
    * starts. One per-user window. */
  def overlappingSessions(activity: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    activity
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("prev_len", lag(col("timeinapp"), 1).over(w))
      .filter(col("prev_ts").isNotNull
        && col("prev_ts") + (col("prev_len").cast(LongType) * expr("INTERVAL 1 SECOND")) > col("ts"))
      .select(col("user_id"), col("prev_ts"), col("prev_len"), col("ts"))
  }

  /** C3 — overdraft ⇒ 24 h freeze (setupTables.py:33-34), batch form.
    * Exact-cents running balance over (CREDIT, DEBIT); a DEBIT exceeding
    * the prior balance is a violation. The violation set is tiny relative
    * to activity, so flagged-while-frozen activity comes from a broadcast
    * join of activity against the violation windows.
    *
    * Note the deliberate delta vs the streaming form (StatefulRules): batch
    * computes the balance over ALL rows (violating debits included) in one
    * window pass — the sequential suppress-then-recover semantics need
    * per-event state and are exactly what S5 exists for. The scalatest
    * fixture pins both behaviors. */
  def overdraftFreeze(activity: DataFrame): (DataFrame, DataFrame) = {
    val cents = (col("monetary_value").cast(DecimalType(18, 2)) * 100).cast(LongType)
    val signed = when(col("transaction_type") === "CREDIT", cents)
      .when(col("transaction_type") === "DEBIT", -cents)
      .otherwise(lit(0L))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withBal = activity
      .withColumn("cents", cents)
      .withColumn("bal_after", sum(signed).over(w))
    val violations = withBal
      .filter(col("transaction_type") === "DEBIT" && col("bal_after") < 0)
      .select(col("user_id"), col("ts").as("viol_ts"), col("cents").as("attempted"))
    val flagged = activity.join(broadcast(violations), Seq("user_id"))
      .filter(col("ts") > col("viol_ts")
        && col("ts") <= col("viol_ts") + expr("INTERVAL 24 HOURS"))
      .select(col("user_id"), col("ts"), col("viol_ts"), col("feature_used"))
    (violations, flagged)
  }

  /** C4 — first-ever FOREX per account (setupTables.py:35-36). */
  def firstForex(activity: DataFrame): DataFrame =
    activity.filter(col("feature_used") === "FOREX")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_forex_ts"))

  /** C5 — UPI at/above the limit on 3 consecutive days (setupTables.py:37).
    * Daily max per user, then two lags over days. */
  def upiLimitStreak(activity: DataFrame,
                     limit: BigDecimal = BigDecimal("9000.00")): DataFrame = {
    val daily = activity
      .filter(col("feature_used") === "UPITRANSACTION")
      .groupBy(col("user_id"), col("ts").cast(DateType).as("d"))
      .agg(max(col("monetary_value")).as("day_max"))
      .filter(col("day_max") >= limit.toDouble)
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    daily
      .withColumn("d1", lag(col("d"), 1).over(w))
      .withColumn("d2", lag(col("d"), 2).over(w))
      .filter(col("d2").isNotNull
        && datediff(col("d"), col("d1")) === 1
        && datediff(col("d1"), col("d2")) === 1)
      .select(col("user_id"), col("d").as("third_day"))
  }

  /** P1 — repeat enquiries ⇒ purchase intent (setupTables.py:40). */
  def enquiryIntent(activity: DataFrame, k: Long = 3): DataFrame =
    activity.filter(col("feature_used") === "ENQUIRY")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_enquiries"))
      .filter(col("n_enquiries") >= k)

  /** Shared regularity shape (P2/P3/P5): users active with `feature` in ≥
    * `months` distinct calendar months. */
  private def regular(activity: DataFrame, feature: String, months: Long): DataFrame =
    activity.filter(col("feature_used") === feature)
      .groupBy(col("user_id"))
      .agg(countDistinct(date_trunc("month", col("ts"))).as("active_months"),
        sum(col("monetary_value").cast(DecimalType(18, 2))).as("total_value"))
      .filter(col("active_months") >= months)

  /** P2 — regular FOREX ⇒ scrutiny/RM (setupTables.py:41). */
  def regularForex(activity: DataFrame, months: Long = 3): DataFrame =
    regular(activity, "FOREX", months).select(col("user_id"), col("active_months"))

  /** P3 — regular MF investor AND high value (setupTables.py:42): the
    * regularity cohort plus a total-invested threshold — the leg round 1
    * left unwritten. */
  def regularMfHighValue(activity: DataFrame, months: Long = 3,
                         minTotal: BigDecimal = BigDecimal("20000.00")): DataFrame =
    regular(activity, "MF-INVEST", months)
      .filter(col("total_value") >= minTotal.bigDecimal)
      .select(col("user_id"), col("active_months"),
        col("total_value").cast(DoubleType).as("total_value"))

  /** P4 — top-k capital-market investors by total invested (setupTables.py:43). */
  def topCapitalInvestors(activity: DataFrame, k: Int = 10): DataFrame =
    activity.filter(col("feature_used") === "CAPITALMARKET-INVEST")
      .groupBy(col("user_id"))
      .agg(sum(col("monetary_value").cast(DecimalType(18, 2)))
        .cast(DoubleType).as("total_invested"))
      .orderBy(col("total_invested").desc, col("user_id"))
      .limit(k)

  /** P5 — regular pension investors NOT holding any other investment
    * product ⇒ cross-sell (setupTables.py:44): regularity + the anti-join
    * leg round 1 left unwritten. */
  def pensionCrossSell(activity: DataFrame, months: Long = 3): DataFrame = {
    val otherInvest: Column = col("feature_used")
      .isin("MF-INVEST", "CAPITALMARKET-INVEST", "FD-INVEST")
    regular(activity, "PENSIONFUND-INVEST", months)
      .select(col("user_id"), col("active_months"))
      .join(activity.filter(otherInvest).select(col("user_id")).distinct(),
        Seq("user_id"), "left_anti")
  }
}
