package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one local session per suite, UTC + nanosAsLong like
  * the production GraftSession, but 4-way to keep fixture-sized shuffles
  * cheap. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .appName(getClass.getSimpleName)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    // Managed-table tests (OltpSourcesSpec) must not litter the repo with
    // ./spark-warehouse; the session is shared JVM-wide so this applies once.
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()

  val sf001 = "/root/testdata/sf0.001"

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  def money(s: String): java.math.BigDecimal =
    new java.math.BigDecimal(s).setScale(2)

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}
