package graft

import graft.datagen.DataGen
import graft.schema.Schemas
import graft.functions.Validation
import org.apache.spark.sql.functions._

/** GEN1–GEN2 + VAL1 invariants (SURVEY §5.4), mirroring generatedata.py:10-12
  * and updateTables.py:12-21. Checks run as Spark aggregations — the
  * properties hold over the full generated set, not a driver-side sample. */
class DataGenSpec extends SparkSpec {

  test("GEN1: id universe is 500k distinct ids within [100000, 1000000)") {
    val ids = DataGen.idUniverse(spark).toDF("id")
    val row = ids.agg(
      count(lit(1)).as("n"),
      countDistinct(col("id")).as("d"),
      min(col("id")).as("lo"),
      max(col("id")).as("hi")).head()
    assert(row.getLong(0) === Schemas.idUniverseSize)
    assert(row.getLong(1) === Schemas.idUniverseSize)
    assert(row.getLong(2) >= Schemas.idRangeStart)
    assert(row.getLong(3) < Schemas.idRangeEnd)
  }

  test("GEN1: generation is deterministic per seed") {
    val a = DataGen.idUniverse(spark, seed = 7, n = 1000).collect().toSet
    val b = DataGen.idUniverse(spark, seed = 7, n = 1000).collect().toSet
    val c = DataGen.idUniverse(spark, seed = 8, n = 1000).collect().toSet
    assert(a === b)
    assert(a !== c)
  }

  test("GEN2: synthesized rows respect every generator range") {
    val df = DataGen.activity(spark, rows = 5000).cache()
    try {
      assert(df.count() === 5000)
      assert(df.schema("monetary_value").dataType ===
        org.apache.spark.sql.types.DecimalType(8, 2))
      val bad = df.filter(
        !col("city").isin(Schemas.cityDomain: _*)
          || !col("transaction_type").isin(DataGen.generatorTrxTypes: _*)
          || !col("feature_used").isin(Schemas.featureDomain: _*)
          || col("monetary_value") < Schemas.monetaryMin.toDouble
          || col("monetary_value") > Schemas.monetaryMax.toDouble
          || col("timeinapp") < Schemas.timeinappMin
          || col("timeinapp") > Schemas.timeinappMax
          || col("user_id") < Schemas.idRangeStart
          || col("user_id") >= Schemas.idRangeEnd).count()
      assert(bad === 0)
      // 1000-id slice, 5000 rows → each id used exactly 5 times (round-robin)
      val perId = df.groupBy("user_id").count().select(max("count"), min("count")).head()
      assert(perId.getLong(0) === 5 && perId.getLong(1) === 5)
    } finally { df.unpersist(): Unit }
  }

  test("GEN2 reproduces the reference's NONMON bug; VAL1 quarantines it") {
    val df = DataGen.activity(spark, rows = 3000).cache()
    try {
      val nonmon = df.filter(col("transaction_type") === "NONMON").count()
      assert(nonmon > 0, "generator should emit out-of-enum NONMON rows (updateTables.py:13)")
      val quarantined = Validation.quarantine(df)
      assert(quarantined.count() === nonmon)
      val kinds = quarantined.select(explode(col("violations"))).distinct()
        .collect().map(_.getString(0)).toSet
      assert(kinds === Set("transaction_type_domain"))
      assert(Validation.valid(df).count() === 3000 - nonmon)
    } finally { df.unpersist(): Unit }
  }

  test("VAL1: NULLs in NOT NULL columns are quarantined, nullable enum passes") {
    val rows = Fixtures.df(spark, Seq(
      Fixtures.row(100001, "BOM", "CREDIT", "500.00", 120, "ENQUIRY", "2024-01-01 10:00:00")))
    // a CDC delete image: every data column except the key is NULL
    val deleteImage = rows.select(
      col("user_id"), lit(null).cast("string").as("city"),
      lit(null).cast("string").as("transaction_type"),
      lit(null).cast("decimal(8,2)").as("monetary_value"),
      lit(null).cast("smallint").as("timeinapp"),
      lit(null).cast("string").as("feature_used"),
      lit(null).cast("timestamp").as("ts"))
    val q = Validation.quarantine(deleteImage)
    assert(q.count() === 1, "NULL delete image must land in quarantine, not valid()")
    val kinds = q.select(explode(col("violations"))).collect().map(_.getString(0)).toSet
    assert(kinds.contains("city_domain") && kinds.contains("timeinapp_null")
      && kinds.contains("ts_null"))
    // transaction_type is nullable in the DDL: NULL alone is not a violation
    assert(!kinds.contains("transaction_type_domain"))
    assert(Validation.valid(rows).count() === 1)
  }

  test("SNK2: flat-file id universe round-trips (with trimming)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ids").toString + "/ids"
    DataGen.writeIdFile(spark, dir, seed = 7, n = 2000)
    val back = DataGen.readIdFile(spark, dir)
    val orig = DataGen.idUniverse(spark, seed = 7, n = 2000)
    assert(back.collect().toSet === orig.collect().toSet)
  }
}
