package graft.sources

import graft.cdc.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SRC3/SRC4/SRC5 + CDC1 — the change-stream transport, emulated as a
  * file-drop directory of envelope JSON lines.
  *
  * Mapping to the reference (`lib/fin-transactions-stack.ts`):
  *  - binlog→DMS→Kinesis (SRC3/SRC4) ≙ producers appending envelope JSON
  *    files to a directory; `readStream.text(dir)` tails it. On a cluster
  *    with Kafka/Kinesis connectors, only `tailStream` changes.
  *  - Kinesis consumer offset tracking (SRC5, :177-183) ≙ the stream's
  *    checkpoint — Spark provides it; nothing to build.
  *  - full-load-and-cdc (CDC1, :160-166) ≙ the snapshot written as
  *    `operation:"load"` envelopes into the SAME drop directory the tail
  *    then appends to: a consumer starting from offset zero sees exactly
  *    what a DMS target sees — the full load, then the tail.
  */
object CdcSource {

  /** CDC1 load phase / tail producers: append `op`-tagged envelope JSON
    * lines under `dir`. */
  def writeEnvelopes(activity: DataFrame, op: String, dir: String): Unit =
    Envelope.encode(activity, lit(op))
      .select("value")
      .write.mode("append").text(dir)

  /** SRC3/SRC4 — tail the drop directory as a raw envelope stream
    * (one `value` string column per change record). */
  def tailStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** The consumer-side pipeline: tail → decode → DMS selection rule →
    * flat activity columns + operation (ready for stateful ops keyed by
    * user_id — CDC5's per-key partitioning happens at the first stateful
    * shuffle). */
  def activityStream(spark: SparkSession, dir: String,
                     schemaName: String = "workshopDb",
                     tableLike: String = "%"): DataFrame =
    Envelope.flatten(
      Envelope.selection(Envelope.decode(tailStream(spark, dir)),
        schemaName, tableLike))
}
