package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The custom-Expression surface: FloatVectorDot must be bit-identical to
  * the HOF reference formulation (same fold), survive codegen, and handle
  * nulls like any binary expression.
  */
class ExpressionSpec extends SparkSpec {

  import spark.implicits._

  test("fvec_dot == HOF zip_with/aggregate fold, bit-exact, on the corpus") {
    val em = Tables.load(spark, sf001, "embeddings")
    val pairs = em.as("a").join(em.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 30)
      .select(
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.dotHof(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() === 0)
    assert(pairs.count() > 0)
  }

  test("fvec_dot: hand-computed values and null propagation") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, -0.5f), Array(2.0f, 2.0f)))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), expr("fvec_dot(a, b)").as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(1L) === 32.0)
    assert(got(2L) === 0.0)
    val withNull = df.select(expr("fvec_dot(a, CAST(NULL AS ARRAY<FLOAT>))"))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("fvec_dot runs inside whole-stage codegen") {
    val em = Tables.load(spark, sf001, "embeddings")
    val df = em.select(Similarity.norm2(col("embedding")).as("n2"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("fvec_dot"), plan.take(500))
    // the projection containing it is codegen'd (a `*(n)` span)
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined, plan.take(800))
  }
}
