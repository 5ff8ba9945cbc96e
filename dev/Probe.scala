package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling probe (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe")
    import graft.llm.{TextAnalysis, TextOps}

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))

    val wt = TextAnalysis.winnowTable(planted, 3, 4).localCheckpoint()
    time("winnowTable count") { println("docs: " + wt.count()) }
    val posts = wt.select(col("doc_id"),
        explode(arrays_zip(col("sel_pos"), col("sel_h"))).as("z"))
      .select(col("doc_id"), col("z.sel_pos").as("p"), col("z.sel_h").as("h"))
      .localCheckpoint()
    time("posts count") { println("posts: " + posts.count()) }
    val anchors = posts.as("a").join(posts.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("a.p").as("pa"),
        col("b.doc_id").as("b_id"), col("b.p").as("pb"))
    time("anchors count") { println("anchors: " + anchors.count()) }
    time("anchor diag distinct") { println("diag: " + anchors
      .select(col("a_id"), col("b_id"), (col("pa") - col("pb")).as("d"))
      .distinct().count()) }
    time("full l114") {
      TextAnalysis.substringDedupApply(planted)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
