package graft

/** Dev-only profiling probe (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-probe")
    val sf = "/root/testdata/sf0.001"
    graft.queries.LlmDeclared.all.foreach { q =>
      println(s"PROBE ${q.name} ${q.build(spark, sf).count()}")
    }
    spark.stop()
  }
}
