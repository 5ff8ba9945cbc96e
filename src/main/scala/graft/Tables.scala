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

  /** `events.ts` is nanosecond-precision parquet, which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw INT64 (the `nanosAsLong`
    * legacy conf, set once at session build — GraftSession) and truncate to
    * microseconds — identical to DuckDB's ns→us floor for this post-1970
    * corpus, so oracle comparisons agree. Integer division (DIV) keeps full
    * 64-bit precision; a double roundtrip would corrupt ~1.7e18-scale values.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every corpus table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
