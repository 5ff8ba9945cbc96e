package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC9 — latest-state materialization. The reference's PK + ON UPDATE
  * CURRENT_TIMESTAMP (setupTables.py:51,57-58) makes the OLTP table
  * latest-state while the lake holds full history; this module reconstructs
  * the former from the latter.
  *
  * Batch: one shuffle on the key, per-key ROW_NUMBER, drop deletes — the
  * canonical upsert-compaction job at any scale.
  *
  * Streaming: `foreachBatch` merge into a parquet target. With no
  * transactional table format in this offline env, the merge materializes
  * old∪new under the same dedup and swaps the directory atomically-enough
  * for tests; the documented scale path is MERGE INTO on a lakehouse table
  * (Delta/Iceberg), which this function's body would become verbatim.
  */
object LatestState {

  /** Batch compaction of a change log (activity columns + `operation` +
    * ordering column). Keeps the newest image per key; a delete as the
    * newest image removes the key. Ties on the ordering column break by
    * operation precedence delete > update > insert > load (a change beats
    * the snapshot it followed within the same timestamp). */
  def batch(changes: DataFrame, key: String = "user_id",
            orderCol: String = "ts"): DataFrame = {
    val prio = when(col("operation") === "delete", 3)
      .when(col("operation") === "update", 2)
      .when(col("operation") === "insert", 1)
      .otherwise(0)
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol).desc, prio.desc)
    changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("operation") =!= "delete")
      .drop("rn")
  }

  /** SCD2 (type-2 slowly-changing-dimension) HISTORY materialization — the
    * batch sibling of `batch` above: instead of keeping only each key's
    * newest image, emit EVERY image with its validity interval. This is the
    * standard silver-layer history table built from a CDC change log:
    * `valid_from` = the change's timestamp, `valid_to` = the next change's
    * timestamp for the same key (null = still current), `version` = 1-based
    * change ordinal per key.
    *
    * Scale: one shuffle on the key, one window pass (lead + row_number over
    * the same (key, ts, ord) sort — a single WindowExec, no join against
    * self; the naive "join each row to its successor" form shuffles twice
    * and breaks on duplicate timestamps). Ties order by `ord` (a unique
    * in-key sequence column, e.g. the event/transaction id). */
  def scd2History(changes: DataFrame, key: String = "user_id",
                  tsCol: String = "ts", ord: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(ord))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
  }

  /** Point-in-time lookup over an SCD2 history (`scd2History` output):
    * the state of every key as of `at` — the interval containing it.
    * With a history table partitioned/z-ordered on the key this is a
    * pruned scan + filter, no recomputation of the log. */
  def asOf(history: DataFrame, at: java.sql.Timestamp): DataFrame =
    history.filter(col("valid_from") <= lit(at)
      && (col("valid_to").isNull || col("valid_to") > lit(at)))

  /** SNAPSHOT DIFF — the table-level change detector: given two snapshots
    * with the same schema, emit one row per key that was inserted, deleted,
    * or updated between them (unchanged keys are suppressed). This is the
    * CDC bootstrap tool for sources with no binlog: diff yesterday's and
    * today's snapshot, get the change stream.
    *
    * Scale shape: each side reduces to (key, md5-of-payload) IN THE SCAN
    * PROJECTION, so the full-outer join shuffles 32-byte digests, never the
    * payload; change classification is a null/compare on the joined row.
    * Payload columns are the non-key columns COMMON to both snapshots,
    * compared as canonical strings with null sentinels. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   key: Seq[String] = Seq("user_id")): DataFrame = {
    val payload = oldSnap.columns.filter(newSnap.columns.contains)
      .filterNot(key.contains).sorted
    def fingerprint(name: String)(df: DataFrame): DataFrame =
      df.select(key.map(col) :+ md5(concat_ws("\u0001",
        payload.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
        .as(name): _*)
    fingerprint("h_old")(oldSnap)
      .join(fingerprint("h_new")(newSnap), key, "full_outer")
      .withColumn("change",
        when(col("h_old").isNull, "insert")
          .when(col("h_new").isNull, "delete")
          .when(col("h_old") =!= col("h_new"), "update"))
      .filter(col("change").isNotNull)
      .select(key.map(col) :+ col("change"): _*)
  }

  /** Streaming merge: apply each micro-batch of envelope-flattened changes
    * (activity columns + `operation`) onto the parquet state at
    * `targetPath`. Replays of the same micro-batch are idempotent — the
    * merged result is a pure function of (existing state, batch). */
  def foreachBatchMerge(spark: SparkSession, targetPath: String,
                        key: String = "user_id", orderCol: String = "ts")
      : (DataFrame, Long) => Unit = { (batchDf: DataFrame, _: Long) =>
    if (!batchDf.isEmpty) {
      val target = new java.io.File(targetPath)
      val existing =
        if (target.exists())
          // Existing state re-enters the merge as the lowest-precedence
          // image ("load"): a change in this batch with an equal timestamp
          // must win over the state it updates.
          Some(spark.read.parquet(targetPath).withColumn("operation", lit("load")))
        else None
      val all = existing.fold(batchDf)(batchDf.unionByName(_))
      val merged = batch(all, key, orderCol).drop("operation")
      val tmp = targetPath + ".tmp"
      merged.write.mode("overwrite").parquet(tmp)
      // Swap directories: the read above is fully materialized by the write.
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      if (target.exists()) rm(target)
      if (!new java.io.File(tmp).renameTo(target))
        throw new java.io.IOException(s"latest-state swap failed: $tmp -> $targetPath")
    }
  }
}
