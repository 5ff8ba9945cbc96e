package graft

import graft.plans.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-mitigation operators: salting must change the shuffle graph and
  * NOTHING else — results equal the unsalted forms exactly, and the salt
  * actually spreads a hot key across partial-aggregation groups.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private lazy val skewed = (1L to 1000L).map { i =>
    (i, if (i <= 900) 7L else i % 50, BigDecimal(i).setScale(2))
  }.toDF("row_id", "k", "v")
    .withColumn("v", col("v").cast(DecimalType(18, 2)))

  test("saltedAggregate equals the plain groupBy exactly (decimal sums)") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(skewed, Seq("k"), Seq("v"),
        uniqueCol = "row_id", salts = 16)
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedAggregate actually spreads the hot key over many salt groups") {
    val partialGroups = skewed
      .withColumn("salt",
        pmod(conv(substring(md5(col("row_id").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType), lit(16L)))
      .filter(col("k") === 7L)
      .select("salt").distinct().count()
    assert(partialGroups >= 12L,
      s"hot key landed in only $partialGroups/16 salt groups")
  }

  test("saltedJoin equals the plain inner join exactly") {
    val dim = (0L until 50L).map(k => (k, s"attr$k")).toDF("dk", "attr")
    val plain = skewed.join(dim, skewed("k") === dim("dk"))
      .select("row_id", "k", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", "row_id", salts = 8)
      .select("row_id", "k", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("saltedJoin replicates the dim side exactly salts-fold") {
    val dim = (0L until 10L).map(k => (k, s"a$k")).toDF("dk", "attr")
    val rep = dim.withColumn("salt",
      explode(array((0 until 8).map(i => lit(i)): _*)))
    assert(rep.count() === 80L)
    assert(rep.select("dk", "salt").distinct().count() === 80L)
  }
}
