package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{CosineSimilarity, DotProduct, EuclideanDistance}

/** Optimizer rule: rewrite the interpreted higher-order-function
  * formulation of a vector dot product,
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[graft.functions.DotProduct]] expression.
  * Spark's HigherOrderFunctions are CodegenFallback — on a k-NN hot
  * path every pair pays interpreted-lambda overhead and the
  * WholeStageCodegen span splits. The rewrite preserves semantics
  * bit-for-bit on EVERY input, including the degenerate ones: both
  * sides accumulate left-to-right in double precision when lengths
  * match and no element is null, and both return NULL otherwise
  * (zip_with null-pads ragged arrays and a null element poisons the
  * aggregate; DotProduct reproduces exactly that — see its null
  * contract). The rule is injected into every GraftSession and may
  * rewrite arbitrary user SQL, so this equivalence is load-bearing
  * and pinned by ExtensionsSpec.
  *
  * This is the (c)-tier extension point of the build plan (SURVEY.md
  * §7.3): a `Rule[LogicalPlan]` registered through
  * `SparkSessionExtensions` — the idiomatic way to teach Catalyst a
  * domain-specific rewrite without touching query code.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  /** Matches `LambdaFunction` bodies of shape `x * y` / `acc + v`
    * over exactly the lambda's own variables. */
  private object BinaryLambda {
    def isMul(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
    def isAdd(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
    /** The implicit finish lambda `id -> id`. */
    def isIdentity(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        v.exprId == a.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, mul: LambdaFunction),
          Literal(0.0, DoubleType),
          merge: LambdaFunction,
          finish: LambdaFunction)
        if BinaryLambda.isMul(mul) && BinaryLambda.isAdd(merge) &&
          BinaryLambda.isIdentity(finish) =>
        DotProduct(a, b)
    }
}

/** Session extensions wiring for the graft engine: injects the
  * optimizer rule above and registers the native vector functions so
  * `SELECT dot_product(a, b)` / `cosine_sim(a, b)` parse in SQL.
  *
  * Enable with either
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)` on the session builder —
  * `graft.GraftSession.builder()` does both.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("l2_distance"),
        new ExpressionInfo(classOf[EuclideanDistance].getName, "l2_distance"),
        (exprs: Seq[Expression]) => EuclideanDistance(exprs(0), exprs(1))))
  }
}
