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
      // Print the warm run and both timed runs individually (not just the
      // min): bimodality diagnosis (round-12 l66 directive) needs every
      // sample, and the warm run's gap to steady state is itself a signal.
      val w = BenchTiming.runOnce(spark, n, dir)
      val a = BenchTiming.runOnce(spark, n, dir)
      val b = BenchTiming.runOnce(spark, n, dir)
      println(f"$n%-28s warm=$w%7.3f a=$a%7.3f b=$b%7.3f min=${math.min(a, b)}%7.3f s")
    }
    spark.stop()
  }
}
