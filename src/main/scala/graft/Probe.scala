package graft
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Dev-only profiling probe (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-probe")
    val em = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = em.filter(col("vec_id") < 32)
    val exact = Similarity.bruteForceTopK(q, em, k = 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((p, t) <- Seq((8, 1), (4, 4), (4, 8), (3, 8), (4, 12))) {
      val ann = Similarity.annTopK(q, em, k = 1, planes = p, dim = 64, tables = t)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.count(ann.contains).toDouble / exact.size
      println(f"PROBE planes=$p tables=$t recall=$recall%.3f")
    }
    spark.stop()
  }
}
