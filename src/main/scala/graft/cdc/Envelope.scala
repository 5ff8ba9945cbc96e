package graft.cdc

import graft.schema.Schemas
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC2–CDC4 — the DMS→Kinesis JSON envelope, Spark-first.
  *
  * Reference: DMS task with messageFormat JSON
  * (lib/fin-transactions-stack.ts:135) wraps each change as
  * {"data": {row}, "metadata": {operation, schema-name, table-name, ...}};
  * the table-selection rule (:164) includes schema 'workshopDb' and
  * table-name LIKE '%'. Encode/decode are pure expressions (to_json /
  * from_json with the declared envelope schema — never inference), so they
  * run inside whole-stage codegen in both batch and streaming plans.
  */
object Envelope {

  /** CDC3 — wrap activity rows into envelope JSON strings. `op` tags the
    * phase: "load" for full-load, "insert"/"update"/"delete" for the tail
    * (lib/fin-transactions-stack.ts:160-166). */
  def encode(df: DataFrame, op: Column,
             schemaName: String = "workshopDb",
             tableName: String = "customeractivity"): DataFrame = {
    val dataCols = Schemas.customerActivity.fieldNames.toSeq.map(col)
    // The 'Z' suffix asserts UTC, so the wall time must BE UTC regardless
    // of the session timezone: to_utc_timestamp shifts the instant by the
    // session zone's offset, and date_format (which renders session-local)
    // then emits the UTC wall clock. GraftSession pins UTC (identity
    // shift), but encode is also callable from foreign sessions
    // (GraftExtensions invites them) where a bare date_format would label
    // local time as Z — every downstream consumer then mis-shifts.
    val sessionTz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    df.select(
      to_json(struct(
        struct(dataCols: _*).as("data"),
        struct(
          date_format(to_utc_timestamp(col("ts"), sessionTz),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp"),
          lit("data").as("record-type"),
          op.as("operation"),
          lit("primary-key").as("partition-key-type"),
          lit(schemaName).as("schema-name"),
          lit(tableName).as("table-name"),
          (crc32(to_json(struct(dataCols: _*))) + col("user_id")).as("transaction-id"))
          .as("metadata"))).as("value"),
      // Kinesis partition key = the PK as a string
      // (partitionIncludeSchemaTable:false, lib/fin-transactions-stack.ts:137).
      col("user_id").cast("string").as("partitionKey"))
  }

  /** CDC4 — parse envelope JSON back to (data struct, metadata struct). */
  def decode(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.withColumn("env", from_json(col(valueCol), Schemas.cdcEnvelope))
      .select(col("env.data").as("data"), col("env.metadata").as("metadata"))

  /** CDC4 with the data-quality leg: split decoded records from malformed
    * ones. `from_json` yields a NULL struct for unparseable input (and a
    * struct of NULLs for parseable-but-wrong-shape input with no matching
    * fields); both classes keep the RAW line in the bad branch so a
    * replay/repair job has the original bytes — at-least-once transports
    * (the Firehose analog) WILL eventually deliver garbage, and silently
    * dropping it would look like data loss downstream. */
  def decodeSplit(df: DataFrame, valueCol: String = "value")
      : (DataFrame, DataFrame) = {
    // The two branches are separate plans over `parsed`: a caller that
    // executes BOTH (the replay/repair shape) parses the JSON twice. A
    // streaming source cannot be materialized between them
    // (localCheckpoint is batch-only), so the split stays lazy; a BATCH
    // caller consuming both branches should localCheckpoint the input —
    // or filter on `decodeFlagged` below, which parses once per plan and
    // lets one write carry both legs.
    val parsed = df.withColumn("env", from_json(col(valueCol), Schemas.cdcEnvelope))
    val ok = parsed
      .filter(col("env").isNotNull && col("env.metadata.operation").isNotNull)
      .select(col("env.data").as("data"), col("env.metadata").as("metadata"))
    val bad = parsed
      .filter(col("env").isNull || col("env.metadata.operation").isNull)
      .select(col(valueCol).as("raw"))
    (ok, bad)
  }

  /** decodeSplit's single-plan form: one parse, every row kept, with
    * `is_bad` + the raw line riding along. The shape for pipelines that
    * persist BOTH legs in one pass (write once, partitionBy("is_bad") or
    * filter downstream) — especially streaming sinks, where the two-branch
    * split cannot share a materialized parse. */
  def decodeFlagged(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.withColumn("env", from_json(col(valueCol), Schemas.cdcEnvelope))
      .select(
        col("env.data").as("data"), col("env.metadata").as("metadata"),
        col(valueCol).as("raw"),
        (col("env").isNull || col("env.metadata.operation").isNull).as("is_bad"))

  /** CDC2 — the DMS table-selection rule as a filter
    * (lib/fin-transactions-stack.ts:164: schema-name = 'workshopDb',
    * table-name LIKE '%', no row filters). Runs post-decode; at scale this
    * prunes foreign tables before any shuffle. */
  def selection(decoded: DataFrame,
                schemaName: String = "workshopDb",
                tableLike: String = "%"): DataFrame =
    decoded.filter(
      col("metadata.`schema-name`") === schemaName
        && col("metadata.`table-name`").like(tableLike))

  /** Flatten a decoded envelope to activity columns + operation (the lake
    * consumer's view). */
  def flatten(decoded: DataFrame): DataFrame =
    decoded.select(col("data.*"), col("metadata.operation").as("operation"))
}
