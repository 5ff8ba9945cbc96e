package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry for the driver's parquet corpus (TESTDATA.md).
  *
  * The corpus is a TPC-H-ish star schema plus `events` (stream-shaped),
  * `documents` (text corpus) and `embeddings` (vector corpus). All engine
  * queries load through here so scale-sensitive read settings live in one
  * place. At 100 TB these would be partitioned/bucketed table paths; the
  * loader keeps that swap local.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at ANY scale factor (fixed cardinality:
    * region=5, nation=25 — dimension tables by construction). */
  val alwaysBroadcast: Set[String] = Set("region", "nation")

  /** `events.ts` has shipped in two physical forms across driver corpus
    * generations, normalized here to one engine-facing type (TimestampType,
    * session TZ pinned UTC) so every downstream query and oracle comparison
    * is generation-independent:
    *  - nanosecond-precision INT64 (early corpora): Spark 4 rejects ns
    *    timestamps ([PARQUET_TYPE_ILLEGAL]), so it is read as raw INT64
    *    (the `nanosAsLong` legacy conf, set at session build — GraftSession)
    *    and truncated to microseconds with integer division (DIV keeps full
    *    64-bit precision; a double roundtrip would corrupt ~1.7e18-scale
    *    values). Identical to DuckDB's ns→us floor for this post-1970 corpus.
    *  - microsecond timestamp[us] (round-11 regeneration): arrives as
    *    TIMESTAMP_NTZ; cast to TimestampType interprets the wall-clock in
    *    the UTC session zone — the same instants the ns path produced, and
    *    the same wall-clock strings DuckDB reads from the file.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every corpus table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
