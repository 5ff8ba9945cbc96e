package graft

/** Dev tool: time named declared queries (steady-state: one warm run, one
  * timed run, noop-sink execution — same protocol as Bench) against
  * SPARK_GRAFT_SF_DIR. Usage: sbt "runMain graft.DevTime l16_dedup_clusters". */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("devtime")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      val run = () => {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm: codegen + JIT
      println(f"$n%-28s ${run()}%8.3f s")
    }
    spark.stop()
  }
}
