package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.Dot64

/** Optimizer rule: rewrite the interpreted higher-order dot-product
  * idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  *               (acc, z) -> acc + z) }}}
  *
  * to the codegen'd [[graft.functions.Dot64]] primitive (strict
  * variant). This is the pattern every hand-written cosine / L2 /
  * projection query reaches for first — and it runs the lambda
  * INTERPRETED per element: the engine's own q121 paid 1.8s for a
  * zero-shuffle narrow pass at sf0.1 (~10× the compiled form) before
  * its source was hand-switched to `dot64`. The rule closes that trap
  * for user SQL that nobody hand-switches.
  *
  * Rewrite safety (the [[graft.functions.AdcSum]] lesson — a rewrite
  * must never change what a query RETURNS):
  *
  *  - arithmetic: `Dot64.compute*` is the identical left-to-right
  *    index-order fold with a double accumulator — same IEEE ops, same
  *    order, bitwise-equal results;
  *  - malformed input: the strict variant returns NULL on length
  *    mismatch or null elements, exactly like the zip_with form (pads
  *    with null → null product → null sum);
  *  - commuted operands (`y * x`, `z + acc`) are accepted — IEEE
  *    multiplication and addition are bitwise commutative;
  *  - the fold's zero must be literal `+0.0` (a nonzero or `-0.0` seed
  *    changes the result: `-0.0 + (+0.0)` is `+0.0`, so an empty-array
  *    fold seeded with `-0.0` differs bitwise from Dot64's `0.0`);
  *  - only `array<double>` inputs match — integer/decimal folds have
  *    different overflow semantics and are left alone;
  *  - the finish lambda must be the identity.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule` (runs in
  * the user-provided batch, after the main optimization passes, on
  * every query of the session).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isPlusZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The two lambda-variable references are exactly the lambda's two
    * formal arguments, in either order (IEEE `*` and `+` are bitwise
    * commutative). */
  private def sameVars(refA: NamedLambdaVariable, refB: NamedLambdaVariable,
      args: Seq[Expression]): Boolean = args match {
    case Seq(p: NamedLambdaVariable, q: NamedLambdaVariable) =>
      (refA.exprId == p.exprId && refB.exprId == q.exprId) ||
        (refA.exprId == q.exprId && refB.exprId == p.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x: NamedLambdaVariable,
              y: NamedLambdaVariable, _), zipArgs, _)),
          zero,
          LambdaFunction(Add(m1: NamedLambdaVariable,
            m2: NamedLambdaVariable, _), mergeArgs, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(facc), _))
        if isPlusZero(zero) && isDoubleArray(a) && isDoubleArray(b) &&
          sameVars(x, y, zipArgs) && sameVars(m1, m2, mergeArgs) &&
          (facc match {
            case v: NamedLambdaVariable => fin.exprId == v.exprId
            case _ => false
          }) =>
        Dot64(a, b, strict = true)
    }
}
