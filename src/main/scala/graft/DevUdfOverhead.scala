package graft

import graft.functions.UdfTwin
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev tool: measure scalar-UDF overhead against its codegen'd twins
  * (SURVEY §2.6 S9). Times the same whitespace-token-count semantics three
  * ways — the builtin chain `size(split(...))`, a black-box Scala `udf()`,
  * and the native `ws_token_count` expression — over the corpus text
  * replicated to ~1M rows (the sf0.1 corpus alone is too small to resolve
  * per-row cost above job-launch noise). Steady-state protocol as Bench:
  * warm run, then min-of-3 timed noop-sink runs; the input is
  * localCheckpointed so all paths read the same in-memory blocks.
  *
  * Result (this container, local[32], sf0.1 × 200 ≈ 1M rows) recorded in
  * README §"UDF overhead".
  */
object DevUdfOverhead {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("dev-udf-overhead")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(200)
    val docs = Tables.load(spark, dir, "documents")
      .crossJoin(spark.range(reps))   // broadcast 1-col replication, no skew
      .select(col("text"))
      .localCheckpoint()
    val n = docs.count()

    def time(c: Column): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        docs.select(c.as("n_tok")).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm: codegen + JIT
      (1 to 3).map(_ => once()).min
    }

    val splitChain = time(UdfTwin.tokensNative(col("text")))
    val viaUdf = time(UdfTwin.tokensUdf(col("text")))
    val native = time(call_function("ws_token_count", col("text")))
    println(f"""{"rows":$n,"split_chain_sec":$splitChain%.3f,"udf_sec":$viaUdf%.3f,"ws_token_count_sec":$native%.3f,"udf_over_expr":${viaUdf / native}%.2f,"split_over_expr":${splitChain / native}%.2f}""")
    spark.stop()
  }
}
