package graft
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      println(s"===== $n")
      val budget = sys.env.get("SPARK_GRAFT_EXPLAIN_CHARS").map(_.toInt).getOrElse(3500)
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString.take(budget))
    }
    spark.stop()
  }
}
