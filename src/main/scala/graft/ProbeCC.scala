package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

// TEMPORARY dev probe — delete before commit. A/B of pair-generation forms.
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-cc")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = graft.llm.TextOps.docShingles(docs, 3).localCheckpoint()

    def commonJoin(sh: DataFrame): DataFrame =
      sh.as("x").join(sh.as("y"),
          col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_common"))

    def orderedPairs(ds: Column): Column =
      flatten(transform(ds, (x, i) =>
        transform(slice(ds, i + 2, size(ds)), y => struct(x.as("a"), y.as("b")))))

    def commonGrouped(sh: DataFrame): DataFrame =
      sh.groupBy(col("s")).agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(orderedPairs(array_sort(col("ds")))).as("p"))
        .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        .agg(count(lit(1)).as("n_common"))

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name $s%.3f s"); s
    }
    // warm both
    commonJoin(sh).write.format("noop").mode("overwrite").save()
    commonGrouped(sh).write.format("noop").mode("overwrite").save()
    def commonPruned(sh: DataFrame): DataFrame = {
      val multi = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("s"))
      val shf = sh.join(multi, Seq("s"), "left_semi")
      commonJoin(shf)
    }
    commonPruned(sh).write.format("noop").mode("overwrite").save()
    val as = (1 to 4).map(i => time(s"join    $i") {
      commonJoin(sh).write.format("noop").mode("overwrite").save() })
    val bs = (1 to 4).map(i => time(s"grouped $i") {
      commonGrouped(sh).write.format("noop").mode("overwrite").save() })
    val cs = (1 to 4).map(i => time(s"pruned  $i") {
      commonPruned(sh).write.format("noop").mode("overwrite").save() })
    // End-to-end jaccardPairs: current string form vs hashed-shingle form
    def jacE2E(hashed: Boolean): Unit = {
      val sh0 = graft.llm.TextOps.docShingles(docs, 3)
      val shX = (if (hashed) sh0.select(col("doc_id"),
          conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("s"))
        else sh0).localCheckpoint()
      val sizes = shX.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      commonJoin(shX)
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
        .withColumn("jaccard", col("n_common").cast("double")
          / (col("na") + col("nb") - col("n_common")))
        .filter(col("jaccard") >= 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    jacE2E(false); jacE2E(true)
    val es = (1 to 4).map(i => time(s"e2e-str  $i") { jacE2E(false) })
    val fs = (1 to 4).map(i => time(s"e2e-hash $i") { jacE2E(true) })
    println(f"PROBE min join=${as.min}%.3f grouped=${bs.min}%.3f pruned=${cs.min}%.3f e2estr=${es.min}%.3f e2ehash=${fs.min}%.3f")
    spark.stop()
  }
}
