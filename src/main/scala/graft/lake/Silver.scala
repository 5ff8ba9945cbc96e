package graft.lake

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The silver layer: batch compaction of the raw JSON lake landing
  * (StreamOps.lakeSink's output — the Firehose-analog bronze) into
  * date-partitioned parquet.
  *
  * Why this job exists at 100 TB: the bronze landing is many small
  * row-oriented JSON objects (one per micro-batch flush per partition) —
  * cheap to ingest, terrible to scan. Compaction rewrites each date
  * partition columnar with a controlled file count, which is what makes
  * partition pruning + column pruning + predicate pushdown actually pay on
  * the analytics plane. Runs per-partition (idempotent overwrite of the
  * partitions present in the input), so a daily run compacts yesterday
  * without touching history.
  */
object Silver {

  /** The activity row schema as landed by the lake sink (activity columns
    * + the year/month/day/hour partition strings). */
  private val landedSchema = org.apache.spark.sql.types.StructType(
    Schemas.customerActivity.fields.map(_.copy(nullable = true)))

  /** Compact bronze JSON under `bronzePath` into parquet under
    * `silverPath`, partitioned by (year, month, day, hour). The repartition
    * clusters each hour's rows into one shuffle partition (≈1 output file
    * per hour dir) while keeping the task count at the session default —
    * NOT `repartition(1, …)`, which would funnel the whole compaction
    * through a single task. Dynamic partition overwrite: only partitions
    * present in this input are rewritten. */
  def compact(spark: SparkSession, bronzePath: String, silverPath: String): Unit =
    spark.read.schema(landedSchema).json(bronzePath)
      // partition dirs come back type-inferred; re-derive the partition
      // columns from ts so the silver layout is self-consistent
      .withColumn("year", date_format(col("ts"), "yyyy"))
      .withColumn("month", date_format(col("ts"), "MM"))
      .withColumn("day", date_format(col("ts"), "dd"))
      .withColumn("hour", date_format(col("ts"), "HH"))
      .repartition(col("year"), col("month"), col("day"), col("hour"))
      .write
      .partitionBy("year", "month", "day", "hour")
      .option("partitionOverwriteMode", "dynamic")
      // cap file size so a hot hour (skewed partition) still rolls to
      // multiple scannable files instead of one multi-GB parquet
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(silverPath)

  /** Row cap per output file — at ~1 KB/row this keeps files ≈1 GB-class
    * on a real lake; the local tests never hit it. */
  val maxRecordsPerFile: Long = 1000000L

  /** Read the silver table (partition-pruning friendly). */
  def read(spark: SparkSession, silverPath: String): DataFrame =
    spark.read.parquet(silverPath)
}
