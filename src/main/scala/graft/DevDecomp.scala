package graft

import org.apache.spark.sql.functions._

/** Dev tool (round 21): time the STAGES of the expensive query families in
  * isolation — which fraction of an operator's wall is fit vs encode vs
  * scan vs truth leg — via the shared BenchTiming discipline (cleanup
  * outside the clock, noop sink, min-of-2 after one warm run). Not part of
  * any declared query path. */
object DevDecomp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("devdecomp")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.llm._
    // job/stage/task-time counters: answers "is this operator bound by
    // fixed per-stage overhead or by task compute" from one run
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskMetrics != null)
            taskMs.addAndGet(t.taskMetrics.executorRunTime)
        }
      })
    def t(name: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      BenchTiming.steadyOf(spark, () => build) // warm + settle
      val (j0, s0, tm0, tk0) = (jobs.get, stages.get, taskMs.get, tasks.get)
      BenchTiming.cleanup(spark)
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"DECOMP $name%-28s $wall%7.3f s  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d tasks=${tasks.get - tk0}%5d taskTime=${(taskMs.get - tm0) / 1000.0}%7.2f s")
    }
    val which = if (args.isEmpty) Set("pq") else args.toSet

    if (which("pq")) {
      val vecs = Tables.load(spark, dir, "embeddings")
      // l95/l98 family
      t("pqFit(2 iters)") { Similarity.pqFit(vecs, 16, 16, 2, 64) }
      t("pqFit+encode") {
        val cb = Similarity.pqFit(vecs, 16, 16, 2, 64).localCheckpoint()
        Similarity.pqEncode(vecs, cb, 16, 64)
      }
      t("bruteForceTopK(qmod20)") {
        Similarity.bruteForceTopK(
          vecs.filter(col("vec_id") % 20 === 0), vecs, 3)
      }
      t("l95 full") { Similarity.pqRerankTopK(vecs) }
      t("l98 full") { Similarity.pqShortlistSweep(vecs) }
      // l119/l121 family
      t("fitCentroids(3it,q)") {
        Similarity.fitCentroids(vecs, 16, 3, quantum = Some(1000000L))
      }
      t("ivfPqFit index") {
        val (_, _, i) = Similarity.ivfPqFit(vecs, 16, 3, 16, 16, 2, 64)
        i
      }
      t("l119 full") { Similarity.ivfPqRerankTopK(vecs) }
      t("l121 full") { Similarity.ivfPqProbeSweep(vecs) }
    }
    spark.stop()
  }
}
