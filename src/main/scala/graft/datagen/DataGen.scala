package graft.datagen

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synthetic-workload generators (GEN1–GEN3), re-expressed as declarative
  * column expressions so generation is itself a distributed Spark job — no
  * driver-side loops, seeded and deterministic at any scale.
  *
  * Reference behavior being modeled:
  *  - GEN1 `generatedata.py:10-12` — 500k account ids sampled without
  *    replacement from [100000, 1000000).
  *  - GEN2 `updateTables.py:12-14,21` — per row: random city (13), random
  *    transaction type (the generator's list includes the out-of-enum
  *    'NONMON' — reproduced faithfully so VAL1 has something to quarantine),
  *    uniform(100.00, 10000.00) rounded to 2dp, randint(100,180) session
  *    seconds, random feature (8).
  *  - GEN3 `updateTables.py:56-59` — paced emission, 1 row / 5 s over the
  *    first 1000 ids (streaming form lives in streaming.StreamOps).
  */
object DataGen {

  /** The generator's transaction-type list (updateTables.py:13) — includes
    * the out-of-enum 'NONMON' bug on purpose; see Schemas.transactionTypeDomain. */
  val generatorTrxTypes: Seq[String] = Seq("CREDIT", "DEBIT", "NONMON")

  /** GEN1 — distinct-sample id universe. `spark.range` over the full domain
    * + seeded shuffle + limit gives sampling WITHOUT replacement by
    * construction (every id appears exactly once before the limit). The
    * orderBy is a full sort of the 900k-row domain — constant work
    * regardless of engine scale, so fine even though it shuffles. */
  def idUniverse(spark: SparkSession, seed: Long = 42L,
                 n: Long = Schemas.idUniverseSize): Dataset[java.lang.Long] =
    spark.range(Schemas.idRangeStart, Schemas.idRangeEnd)
      .orderBy(rand(seed))
      .limit(n.toInt)
      .as(org.apache.spark.sql.Encoders.LONG)
      .map(identity)(org.apache.spark.sql.Encoders.LONG)

  /** Pick a random element of a string domain with an independent seed. */
  private def pick(domain: Seq[String], seed: Long): org.apache.spark.sql.Column =
    element_at(
      array(domain.map(lit): _*),
      (floor(rand(seed) * domain.size) + 1).cast(IntegerType))

  /** GEN2 — row synthesizer: `rows` activity rows over the first `idCount`
    * ids of the universe (updateTables.py uses lines[:1000]). Pure column
    * exprs — codegen'd, partition-parallel, deterministic per seed. */
  def activity(spark: SparkSession, rows: Long, seed: Long = 42L,
               idCount: Int = 1000,
               baseTs: String = "2024-01-01 00:00:00"): DataFrame = {
    // Index the (small) id slice deterministically: the window runs over
    // idCount rows only, never the full universe.
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
    val ids = idUniverse(spark, seed).limit(idCount).toDF("id")
      .withColumn("idx", row_number().over(w).cast(LongType) - 1)
    // Each generated row i maps to id (i mod idCount); the join broadcasts
    // the fixed-size id slice — no shuffle of the generated spine.
    spark.range(rows)
      .withColumnRenamed("id", "rowid")
      .withColumn("idx", col("rowid") % idCount)
      .join(broadcast(ids), "idx")
      .select(
        col("id").cast(IntegerType).as("user_id"),
        pick(Schemas.cityDomain, seed + 1).as("city"),
        pick(generatorTrxTypes, seed + 2).as("transaction_type"),
        round(rand(seed + 3) * (lit(Schemas.monetaryMax.toDouble) - lit(Schemas.monetaryMin.toDouble))
          + lit(Schemas.monetaryMin.toDouble), 2).cast(DecimalType(8, 2)).as("monetary_value"),
        (floor(rand(seed + 4) * (Schemas.timeinappMax - Schemas.timeinappMin + 1))
          + Schemas.timeinappMin).cast(ShortType).as("timeinapp"),
        pick(Schemas.featureDomain, seed + 5).as("feature_used"),
        // ts: writer-stamped in the reference (ON UPDATE CURRENT_TIMESTAMP,
        // setupTables.py:57). Deterministic synthetic stamp: one row / 5 s
        // from a fixed epoch mirrors the reference's pacing (GEN3).
        (lit(baseTs).cast(TimestampType)
          + make_dt_interval(lit(0), lit(0), lit(0), col("rowid") * 5)).as("ts"))
  }

  /** GEN1 sink/SNK2 — the flat-file id universe (one int per line,
    * generatedata.py:17-19). Read back with readIdFile, which trims — the
    * reference passes the raw line (trailing newline) to MySQL and relies on
    * implicit coercion (updateTables.py:56-58); we trim explicitly. */
  def writeIdFile(spark: SparkSession, path: String, seed: Long = 42L,
                  n: Long = Schemas.idUniverseSize): Unit =
    idUniverse(spark, seed, n).toDF("id")
      .select(col("id").cast(StringType))
      .write.mode("overwrite").text(path)

  def readIdFile(spark: SparkSession, path: String): Dataset[java.lang.Long] =
    spark.read.text(path)
      .select(trim(col("value")).cast(LongType).as("id"))
      .filter(col("id").isNotNull)
      .as(org.apache.spark.sql.Encoders.LONG)
}
