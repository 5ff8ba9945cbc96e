package graft
import org.apache.spark.sql.SparkSession

/** Dev-only profiling probe (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // warm-up
    SparkEntry.queries("d01_scan_count")(spark, sfDir).write.format("noop").mode("overwrite").save()

    for (q <- Seq("d20_strings", "d21_consecutive_days", "d22_math")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      time(q + " run1") { df.write.format("noop").mode("overwrite").save() }
      time(q + " run2") { df.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
