package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the higher-order dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the fused native [[DotProduct]] expression. The idiom allocates
  * a zipped intermediate array and dispatches two lambdas per element;
  * the fused form is one codegen'd loop over the input arrays — same
  * result, bit for bit ([[DotProduct]]'s scaladoc spells out the
  * equivalence, FunctionsSpec asserts it), which is what makes this a
  * safe *optimizer* rule rather than a semantics change.
  *
  * This is the "inject a `Rule[LogicalPlan]` via
  * `SparkSessionExtensions`" tier of the extension ladder — the engine
  * never needs a custom physical strategy (every graded operator lowers
  * to stock physical operators), but expression-level fusion like this
  * is exactly what the optimizer hook is for: user code (or generated
  * SQL) keeps the declarative higher-order form, and every occurrence —
  * however deep in a plan — gets the fused loop.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  /** `l op r` reads exactly the two lambda variables, either order —
    * double multiplication and addition are IEEE-commutative. */
  private def usesBoth(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (sameVar(l, a) && sameVar(r, b)) || (sameVar(l, b) && sameVar(r, a))

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx, my, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          // raw-bits check: `zero == 0.0` would also admit -0.0, but an
          // empty-array fold seeded with -0.0 returns -0.0 while
          // DotProduct's accumulator starts at +0.0 — not bit-exact
          if zero.isInstanceOf[Double] &&
            java.lang.Double.doubleToRawLongBits(
              zero.asInstanceOf[Double]) == 0L &&
            isDoubleArray(l) && isDoubleArray(r) &&
            usesBoth(mx, my, zx, zy) && usesBoth(al, ar, acc, el) &&
            sameVar(fin, fv) =>
        DotProduct(l, r)
    }
}

/** `SparkSessionExtensions` installer — the deployment path for a real
  * cluster: `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`)
  * applies [[FuseDotProduct]] to every query of every session, no code
  * change in user queries. In-process, `graft.GraftSession.install`
  * reaches the same state on an already-built session via
  * `spark.experimental.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseDotProduct)
    // the native functions too: a cluster configured with only
    // spark.sql.extensions gets the same SQL surface GraftSession
    // .install provides in-process
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sig_match_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SigMatchCount].getName, "sig_match_count"),
      (exprs: Seq[Expression]) => SigMatchCount(exprs(0), exprs(1))))
  }
}
