package graft.sources

import graft.schema.CustomerActivity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DDL1 / DML1 / SRC1 — the OLTP store, emulated Spark-first.
  *
  * The reference's store is Aurora MySQL (`lib/fin-transactions-stack.ts:
  * 46-60`) reached over JDBC; this offline environment has no database, so
  * the bronze table is a managed parquet table with the SAME declared
  * schema (setupTables.py:49-59) and the MySQL-isms mapped to Spark
  * contracts:
  *  - enum columns  → validation domains (functions.Validation) — Spark
  *    (like MySQL non-strict mode!) stores anything; we surface violations
  *    instead of coercing.
  *  - PRIMARY KEY   → the latest-state view (latestView / cdc.LatestState):
  *    at most one row per user_id when read through the view.
  *  - NOT NULL      → Validation's explicit null quarantine (v1 parquet
  *    tables don't enforce NOT NULL).
  *  - ON UPDATE CURRENT_TIMESTAMP → writer-stamped ts (datagen.DataGen).
  * On a cluster with a real MySQL endpoint, `spark.read.format("jdbc")`
  * replaces the parquet scan and nothing downstream changes.
  */
object Oltp {

  val defaultDb = "workshopdb"
  val defaultTable = "customeractivity"

  /** DDL1 — CREATE TABLE with the declared column types. `location` keeps
    * the warehouse out of the working directory in tests. */
  def createActivityTable(spark: SparkSession,
                          db: String = defaultDb,
                          table: String = defaultTable,
                          location: Option[String] = None): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val loc = location.map(p => s" LOCATION '$p'").getOrElse("")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $db.$table (
         |  user_id INT,
         |  city STRING,
         |  transaction_type STRING,
         |  monetary_value DECIMAL(8,2),
         |  timeinapp SMALLINT,
         |  feature_used STRING,
         |  ts TIMESTAMP
         |) USING parquet$loc""".stripMargin)
  }

  /** DML1 — the parameterized single-row INSERT (updateTables.py:18-23:
    * prepared statement, 6 bound columns, autocommit per row — here one
    * job per row, same durability point). `ts` is writer-stamped like the
    * reference's ON UPDATE CURRENT_TIMESTAMP column unless the row carries
    * one. */
  def insertActivity(spark: SparkSession, row: CustomerActivity,
                     db: String = defaultDb,
                     table: String = defaultTable): Unit =
    spark.sql(
      s"""INSERT INTO $db.$table VALUES (
         |  :user_id, :city, :trx,
         |  CAST(:amount AS DECIMAL(8,2)), CAST(:secs AS SMALLINT), :feature,
         |  coalesce(CAST(:at AS TIMESTAMP), current_timestamp()))""".stripMargin,
      Map(
        "user_id" -> row.user_id, "city" -> row.city,
        "trx" -> row.transaction_type, "amount" -> row.monetary_value.toString,
        "secs" -> row.timeinapp.toInt, "feature" -> row.feature_used,
        // UTC-rendered wall time: Timestamp.toString renders in the JVM
        // default timezone while CAST parses in the UTC session — on a
        // non-UTC host that round-trip would shift the stored instant by
        // the host offset (and disagree with insertWorkload's
        // instant-preserving DataFrame path). Full microsecond precision
        // (.SSSSSS): Spark timestamps carry micros, and a millisecond
        // truncation here could shift the instant by up to 999 µs — enough
        // to flip latestView's equal-ts content-hash tiebreak between the
        // two insert paths.
        "at" -> Option(row.ts).map(t => java.time.LocalDateTime
          .ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))).orNull))

  /** Bulk append (the batch form of the insert workload). */
  def insertWorkload(df: DataFrame, db: String = defaultDb,
                     table: String = defaultTable): Unit =
    df.write.mode("append").insertInto(s"$db.$table")

  /** The PRIMARY KEY read contract: newest image per user_id. Equal-ts
    * ties (routine at second-granularity writer stamps) break by a content
    * hash — an arbitrary but DETERMINISTIC winner, so the "current state"
    * read returns the same image run-to-run regardless of partition order
    * (the same discipline as LatestState.batch). */
  def latestView(spark: SparkSession, db: String = defaultDb,
                 table: String = defaultTable): DataFrame = {
    val t = spark.table(s"$db.$table")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, xxhash64(t.columns.map(col): _*).desc)
    t.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
