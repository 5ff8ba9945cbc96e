package graft

import graft.rules.BatchRules

/** C1–C5 / P1–P5 batch rules on the FIXTURES.md §C micro-fixtures — each
  * fixture has rows on both sides of the rule boundary, expected outputs
  * hand-computed. */
class BatchRulesSpec extends SparkSpec {

  test("C1: city hop within an hour flags exactly the hopping account") {
    val hops = BatchRules.cityHop(Fixtures.c1(spark)).collect()
    assert(hops.length === 1)
    assert(hops.head.getInt(0) === 100001)
    assert(hops.head.getString(1) === "BOM" && hops.head.getString(3) === "DEL")
  }

  test("C1: simultaneous different-city events flag exactly once") {
    // the physically-impossible SAME-instant hop is the strongest C1
    // signal: strict ts_b > ts_a dropped it, >= emitted both orderings —
    // the city tiebreak emits the unordered pair exactly once
    val rows = Seq(
      Fixtures.row(7, "BOM", "CREDIT", "1.00", 100, "ENQUIRY", "2024-01-01 10:00:00"),
      Fixtures.row(7, "DEL", "CREDIT", "1.00", 100, "ENQUIRY", "2024-01-01 10:00:00"))
    val hops = BatchRules.cityHop(Fixtures.df(spark, rows)).collect()
    assert(hops.length === 1)
    assert(hops.head.getString(1) === "BOM" && hops.head.getString(3) === "DEL")
    // and the streaming twin agrees (same predicate)
    val streamedShape = graft.streaming.StatefulRules
      .cityHop(Fixtures.df(spark, rows), Fixtures.df(spark, rows)).collect()
    assert(streamedShape.length === 1)
  }

  test("C2: overlapping sessions detected, clean gap passes") {
    val overlaps = BatchRules.overlappingSessions(Fixtures.c2(spark)).collect()
    assert(overlaps.length === 1)
    assert(overlaps.head.getTimestamp(3) === ts("2024-01-01 10:02:00"))
  }

  test("C3 batch: overdraft debit flagged; activity in 24h window flagged") {
    val (violations, flagged) =
      BatchRules.overdraftFreeze(Fixtures.df(spark, Fixtures.c3(spark)))
    val v = violations.collect()
    assert(v.map(r => (r.getInt(0), r.getTimestamp(1))).toSet ===
      Set((100001, ts("2024-01-01 11:00:00")),
        // the +23h debit also lands below zero in the pure running balance
        (100001, ts("2024-01-02 10:00:00")),
        (100001, ts("2024-01-02 12:00:00"))))
    val f = flagged.select("user_id", "ts").collect().map(r => (r.getInt(0), r.getTimestamp(1))).toSet
    // both day-2 debits fall inside the first violation's 24 h window
    assert(f.contains((100001, ts("2024-01-02 10:00:00"))))
    assert(!f.exists(_._1 == 100002))
  }

  test("C4: first-ever forex per account") {
    val acts = Seq(
      Fixtures.row(100001, "BOM", "DEBIT", "200.00", 120, "FOREX", "2024-01-02 10:00:00"),
      Fixtures.row(100001, "BOM", "DEBIT", "200.00", 120, "FOREX", "2024-01-01 10:00:00"),
      Fixtures.row(100002, "BOM", "DEBIT", "200.00", 120, "ENQUIRY", "2024-01-01 10:00:00"))
    val first = BatchRules.firstForex(Fixtures.df(spark, acts)).collect()
    assert(first.length === 1)
    assert(first.head.getInt(0) === 100001)
    assert(first.head.getTimestamp(1) === ts("2024-01-01 10:00:00"))
  }

  test("C5: UPI limit on 3 consecutive days; a gap breaks the streak") {
    val hits = BatchRules.upiLimitStreak(Fixtures.c5(spark)).collect()
    assert(hits.length === 1)
    assert(hits.head.getInt(0) === 100001)
    assert(hits.head.getDate(1).toString === "2024-01-03")
  }

  test("P1: three enquiries cross the intent threshold") {
    val out = BatchRules.enquiryIntent(Fixtures.marketing(spark)).collect()
    assert(out.map(_.getInt(0)).toSet === Set(100001))
  }

  test("P3: regular MF investor passes only with the value threshold") {
    val m = Fixtures.marketing(spark)
    assert(BatchRules.regularMfHighValue(m).collect().map(_.getInt(0)).toSet === Set(100001))
    // raise the bar above the fixture's 30k total → empty
    assert(BatchRules.regularMfHighValue(m, minTotal = BigDecimal("50000.00")).count() === 0)
  }

  test("P4: top-k capital-market investors ranked by total") {
    val top = BatchRules.topCapitalInvestors(Fixtures.marketing(spark), k = 1).collect()
    assert(top.length === 1 && top.head.getInt(0) === 100004)
  }

  test("P5: pension regularity minus other-product holders") {
    val out = BatchRules.pensionCrossSell(Fixtures.marketing(spark)).collect()
    assert(out.map(_.getInt(0)).toSet === Set(100002)) // 100003 holds MF → excluded
  }
}
