package graft
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Dev-only profiling probe (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-probe")
    val em = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val pairs = em.as("a").join(em.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 500)

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def run(d: org.apache.spark.sql.Column): Unit =
      pairs.select(d.as("d")).write.format("noop").mode("overwrite").save()

    run(Similarity.dot(col("a.embedding"), col("b.embedding")))     // warm
    run(Similarity.dotHof(col("a.embedding"), col("b.embedding"))) // warm
    time("native x3") { (1 to 3).foreach(_ => run(Similarity.dot(col("a.embedding"), col("b.embedding")))) }
    time("hof    x3") { (1 to 3).foreach(_ => run(Similarity.dotHof(col("a.embedding"), col("b.embedding")))) }
    spark.stop()
  }
}
