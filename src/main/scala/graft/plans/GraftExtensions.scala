package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's SparkSessionExtensions entry point — custom Catalyst
  * surface is registered here (and ONLY here), activated by
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession sets
  * it; any foreign session can opt in the same way).
  *
  * Registered functions:
  *  - `fvec_dot(array<float>, array<float>) -> double` — see FloatVectorDot.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "fvec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "fvec_dot takes exactly 2 arguments")
        FloatVectorDot(children.head, children(1))
      }))
  }
}
