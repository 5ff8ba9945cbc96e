package graft

import graft.schema.{CustomerActivity, Schemas}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Micro-fixture builders (FIXTURES.md §C): tiny activity sets crafted to
  * sit on both sides of each rule boundary. */
object Fixtures {

  def row(user: Int, city: String, trx: String, amount: String, secs: Int,
          feature: String, at: String): CustomerActivity =
    CustomerActivity(user, city, trx,
      new java.math.BigDecimal(amount).setScale(2), secs.toShort, feature,
      java.sql.Timestamp.valueOf(at))

  def df(spark: SparkSession, rows: Seq[CustomerActivity]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(
        r.user_id, r.city, r.transaction_type, r.monetary_value,
        r.timeinapp, r.feature_used, r.ts)): _*),
      Schemas.customerActivity)

  /** C1 fixture: 100001 hops BOM→DEL within an hour (hit); 100002 hops
    * after 61 min (miss); 100003 stays in BOM (miss). */
  def c1(spark: SparkSession): DataFrame = df(spark, Seq(
    row(100001, "BOM", "CREDIT", "500.00", 120, "ENQUIRY", "2024-01-01 10:00:00"),
    row(100001, "DEL", "CREDIT", "500.00", 120, "ENQUIRY", "2024-01-01 10:59:00"),
    row(100002, "BOM", "CREDIT", "500.00", 120, "ENQUIRY", "2024-01-01 10:00:00"),
    row(100002, "DEL", "CREDIT", "500.00", 120, "ENQUIRY", "2024-01-01 11:01:00"),
    row(100003, "BOM", "CREDIT", "500.00", 120, "ENQUIRY", "2024-01-01 10:00:00"),
    row(100003, "BOM", "CREDIT", "500.00", 120, "ENQUIRY", "2024-01-01 10:30:00")))

  /** C2 fixture: 10:00+180 s session still open at 10:02 (overlap); clean
    * again by 10:04. */
  def c2(spark: SparkSession): DataFrame = df(spark, Seq(
    row(100001, "BOM", "NON_MONETARY", "100.00", 180, "ENQUIRY", "2024-01-01 10:00:00"),
    row(100001, "BOM", "NON_MONETARY", "100.00", 60, "ENQUIRY", "2024-01-01 10:02:00"),
    row(100001, "BOM", "NON_MONETARY", "100.00", 60, "ENQUIRY", "2024-01-01 10:04:00")))

  /** C3 fixture: credit 500, debit 600 (overdraft → freeze at 11:00),
    * flagged activity at +23 h, allowed again at +25 h. */
  def c3(spark: SparkSession): Seq[CustomerActivity] = Seq(
    row(100001, "BOM", "CREDIT", "500.00", 120, "FUNDTRANSFER", "2024-01-01 10:00:00"),
    row(100001, "BOM", "DEBIT", "600.00", 120, "FUNDTRANSFER", "2024-01-01 11:00:00"),
    row(100001, "BOM", "DEBIT", "100.00", 120, "FUNDTRANSFER", "2024-01-02 10:00:00"),
    row(100001, "BOM", "DEBIT", "100.00", 120, "FUNDTRANSFER", "2024-01-02 12:00:00"),
    // control account: same shape, never overdrafts
    row(100002, "BOM", "CREDIT", "500.00", 120, "FUNDTRANSFER", "2024-01-01 10:00:00"),
    row(100002, "BOM", "DEBIT", "400.00", 120, "FUNDTRANSFER", "2024-01-01 11:00:00"))

  /** C5 fixture: 100001 hits the UPI limit 3 consecutive days; 100002 has a
    * gap on day 3. */
  def c5(spark: SparkSession): DataFrame = df(spark,
    Seq("2024-01-01", "2024-01-02", "2024-01-03").map(d =>
      row(100001, "BOM", "DEBIT", "9500.00", 120, "UPITRANSACTION", s"$d 10:00:00")) ++
      Seq("2024-01-01", "2024-01-02", "2024-01-04").map(d =>
        row(100002, "BOM", "DEBIT", "9500.00", 120, "UPITRANSACTION", s"$d 10:00:00")))

  /** P1/P2/P3/P4/P5 fixture: 100001 = regular enquirer + 3-month MF investor
    * (high value); 100002 = pension-regular with no other products
    * (cross-sell hit); 100003 = pension-regular but holds MF (miss);
    * 100004 = big capital-market investor. */
  def marketing(spark: SparkSession): DataFrame = df(spark,
    // P1: 3 enquiries
    (1 to 3).map(i =>
      row(100001, "BOM", "NON_MONETARY", "100.00", 120, "ENQUIRY", s"2024-01-0$i 10:00:00")) ++
      // P2/P3: MF-INVEST in 3 distinct months, total 30k
      Seq("2024-01-15", "2024-02-15", "2024-03-15").map(d =>
        row(100001, "BOM", "DEBIT", "10000.00", 120, "MF-INVEST", s"$d 10:00:00")) ++
      // P5 hit: pension in 3 months, nothing else
      Seq("2024-01-10", "2024-02-10", "2024-03-10").map(d =>
        row(100002, "DEL", "DEBIT", "5000.00", 120, "PENSIONFUND-INVEST", s"$d 10:00:00")) ++
      // P5 miss: pension-regular but also MF
      Seq("2024-01-10", "2024-02-10", "2024-03-10").map(d =>
        row(100003, "DEL", "DEBIT", "5000.00", 120, "PENSIONFUND-INVEST", s"$d 10:00:00")) ++
      Seq(row(100003, "DEL", "DEBIT", "1000.00", 120, "MF-INVEST", "2024-01-20 10:00:00")) ++
      // P4: two capital-market investors, different totals
      Seq(row(100004, "BLR", "DEBIT", "9000.00", 120, "CAPITALMARKET-INVEST", "2024-01-05 10:00:00"),
        row(100005, "BLR", "DEBIT", "2000.00", 120, "CAPITALMARKET-INVEST", "2024-01-05 10:00:00")))
}
