package graft

import graft.cdc.Envelope
import graft.lake.Silver
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Bronze→silver lake compaction (CDC8's analytics payoff) and the
  * malformed-envelope data-quality path. */
class LakeSpec extends SparkSpec {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("silver compaction: JSON bronze -> partitioned parquet, pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_silver").toString
    val rows = Seq(
      Fixtures.row(1, "BOM", "CREDIT", "100.00", 120, "ENQUIRY", "2024-01-01 10:05:00"),
      Fixtures.row(2, "DEL", "CREDIT", "200.00", 120, "FOREX", "2024-01-01 11:05:00"),
      Fixtures.row(3, "MAA", "DEBIT", "300.00", 120, "ENQUIRY", "2024-01-02 09:00:00"))
    val in = MemoryStream[graft.schema.CustomerActivity]
    in.addData(rows: _*)
    StreamOps.lakeSink(in.toDF(), dir + "/bronze", dir + "/ckpt",
      trigger = Trigger.AvailableNow()).start().awaitTermination(60000)

    Silver.compact(spark, dir + "/bronze", dir + "/silver")
    val silver = Silver.read(spark, dir + "/silver")
    assert(silver.count() === 3)
    // row fidelity through JSON -> parquet
    val back = silver.select("user_id", "city", "ts").orderBy("user_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2)))
    assert(back.toSeq === rows.sortBy(_.user_id)
      .map(r => (r.user_id, r.city, r.ts)))
    // partition pruning: a day filter must reach PartitionFilters
    val pruned = silver.filter(col("day") === "02")
    assert(pruned.count() === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan.take(800))
    // compaction is idempotent per partition (dynamic overwrite)
    Silver.compact(spark, dir + "/bronze", dir + "/silver")
    assert(Silver.read(spark, dir + "/silver").count() === 3)
  }

  test("decodeSplit: malformed envelopes keep raw bytes, good ones decode") {
    val good = Envelope.encode(
      Fixtures.df(spark, Seq(
        Fixtures.row(1, "BOM", "CREDIT", "100.00", 120, "ENQUIRY", "2024-01-01 10:00:00"))),
      lit("insert")).select("value")
    val junk = Seq("not json at all", "{\"wrong\": \"shape\"}", "{}")
      .toDF("value")
    val (ok, bad) = Envelope.decodeSplit(good.unionByName(junk))
    assert(ok.count() === 1)
    assert(ok.select("data.user_id").collect()(0).getInt(0) === 1)
    val raws = bad.collect().map(_.getString(0)).toSet
    assert(raws === Set("not json at all", "{\"wrong\": \"shape\"}", "{}"))
  }

  test("silver format breadth: ORC and CSV round-trip the activity schema") {
    // The silver layer's documented default is parquet; the reader/writer
    // surface must also carry the other columnar (ORC) and interchange
    // (CSV) formats without semantic drift. CSV needs the explicit schema
    // on read (it is text — no embedded types) and a timestamp format
    // pinned for cross-version stability.
    val rows = Seq(
      Fixtures.row(1, "BOM", "CREDIT", "100.00", 120, "ENQUIRY", "2024-01-01 10:05:00"),
      Fixtures.row(2, "DEL", "DEBIT", "2500.50", 150, "FOREX", "2024-01-02 11:00:00"))
    val df = Fixtures.df(spark, rows)
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    df.write.mode("overwrite").orc(s"$base/orc")
    val orcBack = spark.read.orc(s"$base/orc")
    // file formats surface everything as nullable on read; names and types
    // must round-trip exactly
    assert(orcBack.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(orcBack.except(df).isEmpty && df.except(orcBack).isEmpty)
    df.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(s"$base/csv")
    val csvBack = spark.read.schema(df.schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(s"$base/csv")
    assert(csvBack.except(df).isEmpty && df.except(csvBack).isEmpty)
  }
}
