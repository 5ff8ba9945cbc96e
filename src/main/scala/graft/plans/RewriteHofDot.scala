package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative HOF dot-product chain
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d,
  *             (acc, v) -> acc + v)
  *
  * into the fused native expression `fvec_dot(a, b)` (FloatVectorDot).
  *
  * Why a Rule and not a call-site change: the engine's own operators
  * already call fvec_dot directly, but a USER writing the idiomatic
  * DataFrame/SQL formulation above should get the fused loop (measured
  * 10.6× on the corpus scan — README's UDF-overhead table) without knowing
  * the extension function exists. This is the textbook use of
  * `injectOptimizerRule`: same semantics, better physical execution,
  * applied after analysis so lambda variables are bound and types known.
  *
  * The match is deliberately conservative — it fires ONLY when the rewrite
  * is provably bit-identical to FloatVectorDot's fold:
  *  - both inputs are array<float> or array<double> (never int arrays,
  *    whose cast-to-double product fvec_dot does not implement);
  *  - the zip lambda is a DOUBLE multiply of the two (possibly
  *    double-cast) lambda variables in order — a FLOAT multiply (no casts,
  *    float inputs) rounds differently and is left alone;
  *  - the fold seed is literal double 0.0 and the merge lambda is
  *    `acc + v` in doubles;
  *  - the finish lambda is the identity (the shape `functions.aggregate` /
  *    SQL `aggregate(...)` produces when no finish is given).
  * Null/length-mismatch edges need no guard: FloatVectorDot returns NULL
  * exactly where the HOF fold does (pinned by ExpressionSpec).
  *
  * Escape hatch: `SET spark.graft.rewriteHofDot=false` disables the rule —
  * the twin tests that prove native == HOF use it so the HOF side stays a
  * genuine HOF plan.
  */
object RewriteHofDotToFvecDot extends Rule[LogicalPlan] {

  private val FlagKey = "spark.graft.rewriteHofDot"

  private def vecType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The lambda-variable reference itself, or the variable under a single
    * cast-to-double (exact for float/double sources). */
  private def asVarToDouble(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId && nv.dataType == DoubleType
    case c: Cast if c.dataType == DoubleType => c.child match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def identityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) => isVar(body, arg)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FlagKey, "true").toBoolean) plan
    else plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mult: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(add: Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            finish)
          // raw-bits check, not `== 0.0`: a -0.0 seed survives an empty
          // array as -0.0 in the HOF fold but would become fvec_dot's +0.0
          if zero.isInstanceOf[java.lang.Double] &&
            java.lang.Double.doubleToRawLongBits(
              zero.asInstanceOf[java.lang.Double]) == 0L &&
            vecType(a.dataType) && vecType(b.dataType) &&
            mult.dataType == DoubleType &&
            asVarToDouble(mult.left, x) && asVarToDouble(mult.right, y) &&
            add.dataType == DoubleType &&
            isVar(add.left, acc) && isVar(add.right, v) &&
            identityFinish(finish) =>
        FloatVectorDot(a, b)
    }
}
