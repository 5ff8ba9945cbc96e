package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of the 100 TB story.
  *
  * Multi-dimensional range queries (user × time, region × date) can only
  * prune files on ONE sort dimension with a plain ORDER BY layout. A
  * Z-order (Morton) key interleaves the bits of several dimensions so that
  * rows close in ANY dimension land in the same file neighborhood; min/max
  * parquet footer stats then prune on every interleaved dimension at once.
  * This is the same layout technique lakehouse OPTIMIZE ZORDER implements;
  * here it is a pure column expression + a range repartition, usable with
  * any `DataFrameWriter`.
  *
  * The key is exact integer arithmetic (shifts/masks on longs) — identical
  * in any engine, so the declared query d44 oracle-checks it bit-for-bit.
  */
object Layout {

  /** Morton (Z-order) interleave of two non-negative dimensions, `bits`
    * bits each (default 16 → a 32-bit key): bit i of x lands at position
    * 2i, bit i of y at 2i+1. Inputs are masked to `bits` bits first —
    * callers map raw values into that range (e.g. day numbers, bucketed
    * ids). Evaluates through the native `morton_interleave` expression
    * (plans.MortonInterleave): one codegen'd loop instead of the 2·bits
    * shift/add expression nodes of `mortonKeyExpr`. */
  def mortonKey(x: Column, y: Column, bits: Int = 16): Column =
    call_function("morton_interleave", x.cast("long"), y.cast("long"),
      lit(bits))

  /** The composed-builtin formulation of the same key — semantically
    * identical to `mortonKey` (asserted bit-exact in ExpressionSpec) and
    * usable in sessions without GraftExtensions registered. */
  def mortonKeyExpr(x: Column, y: Column, bits: Int = 16): Column = {
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftright(xm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ym, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Cluster a DataFrame for writing: range-repartition on the Z-key so
    * each output file covers a compact Z-range (→ tight min/max stats on
    * both interleaved dimensions), then sort within partitions so row
    * groups inside each file are tight too. `numFiles` sizes the output
    * (at 100 TB: target ~1 GiB files). The z column is dropped — it is a
    * layout device, not data. */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
                 numFiles: Int, bits: Int = 16): DataFrame =
    df.withColumn("__z", mortonKey(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
