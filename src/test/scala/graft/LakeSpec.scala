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

  test("bronze duplicate tolerance: a re-delivered lake object (the " +
    "Firehose at-least-once shape) leaves latest-state reads unaffected") {
    // Our own sink is exactly-once (checkpointed file sink — the
    // documented upgrade over Firehose, CDC7), but a reference-shaped
    // bronze IS at-least-once: Firehose retries can land the same buffer
    // as two S3 objects. Downstream readers must tolerate that without a
    // global pre-dedup: this injects a byte-identical duplicate object
    // into the landed bronze and asserts (a) compaction carries the
    // duplicate through honestly (bronze counts are NOT a row-count
    // oracle), (b) exact-duplicate collapse restores the logical rows,
    // and (c) the latest-state view — the read that feeds the OLTP-state
    // consumers — is value-identical with and without the duplicate (the
    // deterministic content-hash tiebreak makes the winner's IMAGE equal
    // either way).
    val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val rows = Seq(
      Fixtures.row(1, "BOM", "CREDIT", "100.00", 120, "ENQUIRY", "2024-01-01 10:05:00"),
      Fixtures.row(1, "DEL", "DEBIT", "250.00", 110, "FOREX", "2024-01-01 11:05:00"),
      Fixtures.row(2, "MAA", "DEBIT", "300.00", 120, "ENQUIRY", "2024-01-02 09:00:00"))
    val in = MemoryStream[graft.schema.CustomerActivity]
    in.addData(rows: _*)
    StreamOps.lakeSink(in.toDF(), dir + "/bronze", dir + "/ckpt",
      trigger = Trigger.AvailableNow()).start().awaitTermination(60000)
    def latest(df: org.apache.spark.sql.DataFrame) =
      graft.cdc.LatestState.batch(df.withColumn("operation", lit("insert")))
        .select("user_id", "city", "monetary_value", "ts")
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getDecimal(2).toPlainString, r.getTimestamp(3))).sortBy(_._1)
    Silver.compact(spark, dir + "/bronze", dir + "/silver")
    val clean = latest(Silver.read(spark, dir + "/silver"))
    // Build a FOREIGN-shaped bronze: our own sink's _spark_metadata log
    // makes Spark read only committed files (exactly-once by
    // construction — injecting next to it is invisible, itself worth
    // knowing), but a Firehose-landed bucket has no such log. Flat-copy
    // the landed objects into a log-free dir and re-deliver one.
    def findJson(f: java.io.File): Seq[java.io.File] =
      if (f.isFile && f.getName.endsWith(".json")) Seq(f)
      else Option(f.listFiles()).toSeq.flatten
        .filterNot(_.getName.startsWith("_")).flatMap(findJson)
    val objs = findJson(new java.io.File(dir + "/bronze"))
    assert(objs.nonEmpty)
    val bronze2 = new java.io.File(dir + "/bronze_firehose")
    bronze2.mkdirs()
    objs.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(bronze2, s"obj-$i.json").toPath)
    }
    java.nio.file.Files.copy(objs.head.toPath,
      new java.io.File(bronze2, "redelivered-obj-0.json").toPath)
    Silver.compact(spark, bronze2.toString, dir + "/silver")
    val silver = Silver.read(spark, dir + "/silver")
    // (a) the duplicate flows through — compaction does not silently dedup
    assert(silver.count() > 3)
    // (b) exact-duplicate collapse restores the logical row set
    assert(silver.drop("year", "month", "day", "hour").distinct().count() === 3)
    // (c) the latest-state read is value-identical under re-delivery
    assert(latest(silver) === clean)
    assert(clean.map(_._1).toSeq === Seq(1, 2))
    assert(clean.head._2 === "DEL") // user 1's newest image wins
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
