package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The reference's data model, re-declared as Spark schemas.
  *
  * `customeractivity` mirrors the MySQL DDL at
  * `resources/data/setupTables.py:49-59` (reference repo): int PK, varchar(3)
  * city, enum transaction type, decimal(8,2) money, smallint session length,
  * enum feature, writer-stamped timestamp. Spark enforces neither PK nor enum
  * — the PK becomes the latest-state contract (cdc.LatestState) and the enums
  * become validation domains (functions.Validation).
  */
final case class CustomerActivity(
    user_id: Int,
    city: String,
    transaction_type: String,
    monetary_value: java.math.BigDecimal,
    timeinapp: Short,
    feature_used: String,
    ts: Timestamp)

object Schemas {

  /** setupTables.py:49-59 — declared column types (§1.2 of SURVEY.md). */
  val customerActivity: StructType = StructType(Seq(
    StructField("user_id", IntegerType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("transaction_type", StringType, nullable = true),
    StructField("monetary_value", DecimalType(8, 2), nullable = false),
    StructField("timeinapp", ShortType, nullable = false),
    StructField("feature_used", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  /** Validation domains (VAL1). City list: setupTables.py:16; transaction
    * enum: setupTables.py:53 — note the generator's 'NONMON'
    * (updateTables.py:13) is deliberately NOT here: it is a documented
    * reference bug and must land in quarantine, not be coerced. Feature
    * enum: setupTables.py:56. */
  val cityDomain: Seq[String] = Seq(
    "BOM", "DEL", "BLR", "CAL", "MAA", "GOI", "COK",
    "HYD", "PNQ", "SXR", "TRV", "AMD", "ZER")
  val transactionTypeDomain: Seq[String] = Seq("CREDIT", "DEBIT", "NON_MONETARY")
  val featureDomain: Seq[String] = Seq(
    "FUNDTRANSFER", "UPITRANSACTION", "ENQUIRY", "FOREX",
    "MF-INVEST", "CAPITALMARKET-INVEST", "FD-INVEST", "PENSIONFUND-INVEST")

  /** Generator value ranges (updateTables.py:21, generatedata.py:10-12). */
  val idRangeStart = 100000L
  val idRangeEnd = 1000000L // exclusive
  val idUniverseSize = 500000L
  val monetaryMin = BigDecimal("100.00")
  val monetaryMax = BigDecimal("10000.00")
  val timeinappMin = 100
  val timeinappMax = 180

  /** DMS→Kinesis JSON envelope (lib/fin-transactions-stack.ts:130-141;
    * messageFormat JSON at :135). `data` fields are all nullable — delete
    * images carry keys only. Hyphenated metadata names are verbatim from the
    * public DMS envelope format. */
  val cdcData: StructType = StructType(customerActivity.fields.map(_.copy(nullable = true)))

  val cdcMetadata: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("record-type", StringType),
    StructField("operation", StringType), // load | insert | update | delete
    StructField("partition-key-type", StringType), // primary-key (:137)
    StructField("schema-name", StringType),
    StructField("table-name", StringType),
    StructField("transaction-id", LongType)))

  val cdcEnvelope: StructType = StructType(Seq(
    StructField("data", cdcData),
    StructField("metadata", cdcMetadata)))
}
