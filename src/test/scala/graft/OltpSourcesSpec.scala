package graft

import graft.cdc.LatestState
import graft.sources.{CdcSource, Oltp}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DDL1/DML1/SRC1 (OLTP emulation) + SRC3/CDC1 (file-drop CDC transport):
  * table DDL, parameterized inserts, PK latest-state reads, and the
  * full-load-then-tail consumer pipeline.
  */
class OltpSourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("DDL1+DML1: create table, parameterized insert, read back") {
    Oltp.createActivityTable(spark, location = Some(tmp("graft_oltp") + "/t"))
    Oltp.insertActivity(spark,
      Fixtures.row(100001, "BOM", "CREDIT", "500.00", 120, "ENQUIRY", "2024-01-01 10:00:00"))
    Oltp.insertActivity(spark,
      Fixtures.row(100002, "DEL", "DEBIT", "99.99", 150, "FOREX", "2024-01-02 11:00:00"))
    val rows = spark.table("workshopdb.customeractivity").orderBy("user_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Int]("user_id") === 100001)
    assert(rows(0).getAs[java.math.BigDecimal]("monetary_value")
      .compareTo(new java.math.BigDecimal("500.00")) === 0)
    assert(rows(1).getAs[String]("feature_used") === "FOREX")
    assert(rows(1).getAs[java.sql.Timestamp]("ts") === ts("2024-01-02 11:00:00"))
  }

  test("DML1: a sub-millisecond ts round-trips the insert exactly " +
    "(microsecond rendering — parity with the DataFrame insert path)") {
    Oltp.createActivityTable(spark, table = "micros",
      location = Some(tmp("graft_oltp_us") + "/t"))
    // 999 µs of sub-millisecond digits: a .SSS rendering would truncate
    // this to 10:00:00.123, shifting the stored instant by up to 999 µs —
    // enough to flip latestView's equal-ts content-hash tiebreak between
    // insertActivity and insertWorkload images of the same row
    val fine = java.sql.Timestamp.valueOf("2024-01-01 10:00:00.123999")
    Oltp.insertActivity(spark, graft.schema.CustomerActivity(
      100007, "BOM", "CREDIT", money("5.00"), 10.toShort, "ENQUIRY", fine),
      table = "micros")
    val back = spark.table("workshopdb.micros").collect()(0)
      .getAs[java.sql.Timestamp]("ts")
    assert(back === fine)
  }

  test("DML1: ts is writer-stamped when absent (ON UPDATE CURRENT_TIMESTAMP analog)") {
    Oltp.createActivityTable(spark, table = "stamped",
      location = Some(tmp("graft_oltp_s") + "/t"))
    Oltp.insertActivity(spark, graft.schema.CustomerActivity(
      100003, "MAA", "CREDIT", money("10.00"), 100.toShort, "ENQUIRY", null),
      table = "stamped")
    val t = spark.table("workshopdb.stamped").collect()(0).getAs[java.sql.Timestamp]("ts")
    assert(t != null)
  }

  test("SRC1/PK: repeated activity for a user reads as ONE row via latestView") {
    Oltp.createActivityTable(spark, table = "pk_t",
      location = Some(tmp("graft_oltp_pk") + "/t"))
    Seq("2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-01 12:00:00")
      .zip(Seq("BOM", "DEL", "MAA")).foreach { case (at, city) =>
        Oltp.insertActivity(spark,
          Fixtures.row(100007, city, "CREDIT", "10.00", 100, "ENQUIRY", at),
          table = "pk_t")
      }
    val latest = Oltp.latestView(spark, table = "pk_t").collect()
    assert(latest.length === 1)
    assert(latest(0).getAs[String]("city") === "MAA")
    assert(spark.table("workshopdb.pk_t").count() === 3) // history retained
  }

  test("SRC3/CDC1: full-load envelopes + tail, consumed as one stream") {
    val drop = tmp("graft_cdc_drop")
    val load = Fixtures.df(spark, Seq(
      Fixtures.row(1, "BOM", "CREDIT", "100.00", 120, "ENQUIRY", "2024-01-01 10:00:00"),
      Fixtures.row(2, "DEL", "CREDIT", "200.00", 120, "ENQUIRY", "2024-01-01 10:00:00")))
    val tail = Fixtures.df(spark, Seq(
      Fixtures.row(1, "MAA", "DEBIT", "50.00", 110, "FOREX", "2024-01-01 11:00:00")))
    CdcSource.writeEnvelopes(load, "load", drop)
    CdcSource.writeEnvelopes(tail, "update", drop)

    val out = tmp("graft_cdc_sink")
    CdcSource.activityStream(spark, drop)
      .writeStream.format("memory").queryName("cdc_consumed")
      .option("checkpointLocation", out + "/ckpt")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination(60000)

    val consumed = spark.table("cdc_consumed")
    assert(consumed.count() === 3)
    assert(consumed.filter(col("operation") === "load").count() === 2)
    assert(consumed.filter(col("operation") === "update").count() === 1)
    // latest-state over the consumed stream = PK view of the source
    val state = LatestState.batch(consumed)
    assert(state.count() === 2)
    assert(state.filter(col("user_id") === 1).collect()(0)
      .getAs[String]("city") === "MAA")
  }

  test("SRC3 selection: foreign-schema envelopes are pruned at the source") {
    val drop = tmp("graft_cdc_foreign")
    val rows = Fixtures.df(spark, Seq(
      Fixtures.row(9, "BOM", "CREDIT", "1.00", 100, "ENQUIRY", "2024-01-01 10:00:00")))
    CdcSource.writeEnvelopes(rows, "insert", drop)
    CdcSource.activityStream(spark, drop, schemaName = "otherDb")
      .writeStream.format("memory").queryName("cdc_foreign")
      .option("checkpointLocation", tmp("graft_cdc_f_ck") + "/ckpt")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination(60000)
    assert(spark.table("cdc_foreign").count() === 0)
  }
}
