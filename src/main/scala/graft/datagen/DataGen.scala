package graft.datagen

import graft.schema.Schemas
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synthetic-workload generators (GEN1–GEN3), re-expressed as declarative
  * column expressions so generation is itself a distributed Spark job — no
  * driver-side loops, seeded and deterministic at any scale.
  *
  * Determinism contract (round-2 advice fix): every "random" value is a pure
  * function of ROW CONTENT (`hash(id, seed)` — Murmur3 of the id and the
  * seed), never `rand(seed)`. Spark seeds `rand` per PARTITION INDEX, and
  * partition counts differ between local[4] tests, local[32] prod, and any
  * real cluster — rand-generated corpora would silently differ by
  * deployment. Content-derived hashing is partition-layout-independent by
  * construction.
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

  /** The id domain under a seeded pseudo-random permutation: order by
    * Murmur3 of (id, seed) with the id itself as tie-break. A prefix of this
    * permutation is a distinct sample without replacement (every id appears
    * exactly once), and the SAME prefix on every partition layout. */
  private def permutedDomain(spark: SparkSession, seed: Long): DataFrame =
    spark.range(Schemas.idRangeStart, Schemas.idRangeEnd)
      .withColumn("h", hash(col("id"), lit(seed)))
      .orderBy(col("h"), col("id"))

  /** GEN1 — distinct-sample id universe (first `n` of the permutation). */
  def idUniverse(spark: SparkSession, seed: Long = 42L,
                 n: Long = Schemas.idUniverseSize): Dataset[java.lang.Long] = {
    // Spark's limit is Int-bounded; a silent n.toInt would WRAP for
    // n > Int.MaxValue (negative → runtime throw; 2^31..2^32 → a wrong
    // positive prefix) — fail loudly at the boundary instead
    require(n >= 0 && n <= Int.MaxValue,
      s"idUniverse: n ($n) must fit in Int (Spark limit bound)")
    permutedDomain(spark, seed)
      .limit(n.toInt)
      .select("id")
      .as(org.apache.spark.sql.Encoders.LONG)
  }

  /** The first `idCount` ids of the SAME permutation (the reference's
    * `lines[:1000]` slice of the id file, updateTables.py:56) — a prefix of
    * idUniverse, not an arbitrary limit over it. */
  def idSlice(spark: SparkSession, seed: Long, idCount: Int): DataFrame =
    permutedDomain(spark, seed).limit(idCount).select("id")

  /** Uniform [0,1) as a pure function of (key column, seed): Murmur3 int →
    * bucket in [0, 1e6) → scale. ~20 bits of resolution — ample for domain
    * picks and 2-decimal money. */
  def u(key: Column, seed: Long): Column =
    pmod(hash(key, lit(seed)), lit(1000000)).cast(DoubleType) / 1000000.0

  /** Pick a pseudo-random element of a string domain, derived from `key`. */
  def pick(domain: Seq[String], key: Column, seed: Long): Column =
    element_at(
      array(domain.map(lit): _*),
      (pmod(hash(key, lit(seed)), lit(domain.size)) + 1).cast(IntegerType))

  /** GEN2 — row synthesizer: `rows` activity rows over the first `idCount`
    * ids of the universe. Pure column exprs keyed by the generated row index
    * — codegen'd, partition-parallel, deterministic per seed on ANY
    * partition layout. */
  def activity(spark: SparkSession, rows: Long, seed: Long = 42L,
               idCount: Int = 1000,
               baseTs: String = "2024-01-01 00:00:00"): DataFrame = {
    // Index the (small) id slice deterministically: the window runs over
    // idCount rows only (≤ 1000 by the GEN3 contract), never the full
    // universe — the constant-valued (but non-foldable, else it's optimized
    // out) partition key states the single-partition move explicitly
    // instead of tripping WindowExec's global-window warn.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("id"), lit(1))).orderBy("id")
    val ids = idSlice(spark, seed, idCount)
      .withColumn("idx", row_number().over(w).cast(LongType) - 1)
    // Each generated row i maps to id (i mod idCount); the join broadcasts
    // the fixed-size id slice — no shuffle of the generated spine.
    spark.range(rows)
      .withColumnRenamed("id", "rowid")
      .withColumn("idx", col("rowid") % idCount)
      .join(broadcast(ids), "idx")
      .select(
        col("id").cast(IntegerType).as("user_id"),
        pick(Schemas.cityDomain, col("rowid"), seed + 1).as("city"),
        pick(generatorTrxTypes, col("rowid"), seed + 2).as("transaction_type"),
        round(u(col("rowid"), seed + 3)
          * (lit(Schemas.monetaryMax.toDouble) - lit(Schemas.monetaryMin.toDouble))
          + lit(Schemas.monetaryMin.toDouble), 2).cast(DecimalType(8, 2)).as("monetary_value"),
        (pmod(hash(col("rowid"), lit(seed + 4)),
          lit(Schemas.timeinappMax - Schemas.timeinappMin + 1))
          + Schemas.timeinappMin).cast(ShortType).as("timeinapp"),
        pick(Schemas.featureDomain, col("rowid"), seed + 5).as("feature_used"),
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
