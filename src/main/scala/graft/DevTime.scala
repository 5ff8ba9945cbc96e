package graft

/** Dev tool: time named declared queries via the shared BenchTiming
  * discipline (warm run, min-of-2 timed, blocking cleanup, noop sink)
  * against SPARK_GRAFT_SF_DIR.
  * Usage: sbt "runMain graft.DevTime l16_dedup_clusters". */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("devtime")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      println(f"$n%-28s ${BenchTiming.steady(spark, n, dir)}%8.3f s")
    }
    spark.stop()
  }
}
