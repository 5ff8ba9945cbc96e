package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession so every entry point (Verify,
  * Bench, tests) runs with identical semantics-bearing config:
  *
  *  - UTC session timezone: declared queries cast string literals to
  *    timestamps and timestamps to dates; a non-UTC host would silently
  *    change filter selectivity vs the DuckDB oracle.
  *  - `nanosAsLong` set once here, not as a side effect of reading a table
  *    (the events corpus is TIMESTAMP(NANOS) parquet, which Spark 4 otherwise
  *    rejects).
  *  - `spark.sql.shuffle.partitions` sized to the local core count (32-way
  *    local mode), not the 200 default — on a real cluster this would be
  *    AQE-coalesced anyway, but at test scale 200 partitions is pure
  *    scheduling overhead.
  *  - AQE on (default in Spark 4, pinned explicitly): runtime coalescing and
  *    skew-join splitting are part of the 100 TB story the plans rely on.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // ContextCleaner only reclaims dereferenced shuffles/broadcasts after
      // a GC; the 30 min default periodic GC is longer than an entire
      // Verify/Bench run, so hundreds of query executions' worth of state
      // accumulated until heap pressure forced full GCs mid-measurement
      // (the round-6 l16–l20 bench stall). One minute keeps reclamation
      // steady in these long single-JVM sequences at negligible cost.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
