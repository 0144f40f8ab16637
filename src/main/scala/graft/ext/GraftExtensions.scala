package graft.ext

import graft.expr.{VecDotF, VecDotQ}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Catalyst optimizer rule: rewrite the interpreted higher-order
  * dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)
  *
  * into the whole-stage-codegen kernel [[graft.expr.VecDotQ]] (measured
  * ~10× — the HOF chain is CodegenFallback: per-element closure dispatch
  * plus an allocated intermediate zip array per row).
  *
  * Soundness guards — the kernel's edge semantics deliberately differ from
  * the HOF form (see VecDotQ's scaladoc), so the rewrite fires only where
  * the two provably agree:
  *  - element types must be non-nullable BIGINT (the HOF form turns a null
  *    ELEMENT into a NULL result; the kernel skips it);
  *  - the rewrite emits `IF(size(a) = size(b), vec_dot_q(a, b), NULL)`:
  *    zip_with pads unequal lengths with nulls so the HOF result is NULL,
  *    and `size(NULL array)` is NULL, so both the unequal-length and the
  *    top-level-null behaviors match exactly;
  *  - the three lambdas must be literally multiply / add / identity over
  *    their own bound variables (checked by exprId, order-insensitive).
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def denseLongArray(t: org.apache.spark.sql.types.DataType) =
    t match {
      case ArrayType(LongType, containsNull) => !containsNull
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x: NamedLambdaVariable,
                                    y: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(Add(m1: NamedLambdaVariable,
                             m2: NamedLambdaVariable, _),
            Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
          LambdaFunction(fv: NamedLambdaVariable,
            Seq(fa: NamedLambdaVariable), _))
        if denseLongArray(a.dataType) && denseLongArray(b.dataType) &&
           Set(x.exprId, y.exprId) == Set(zx.exprId, zy.exprId) &&
           Set(m1.exprId, m2.exprId) == Set(acc.exprId, elem.exprId) &&
           fv.exprId == fa.exprId =>
        If(EqualTo(Size(a), Size(b)), VecDotQ(a, b),
           Literal(null, LongType))
    }
}

/** Session-extension entry point — the production registration path:
  *
  *   spark.sql.extensions=graft.ext.GraftExtensions
  *
  * Injects [[VecDotRewrite]] into the optimizer and registers the native
  * codegen kernels as SQL functions (`vec_dot`, `vec_dot_q`) — rung (c) of
  * the Catalyst extension ladder (SURVEY §7.3): expression + rule via
  * SparkSessionExtensions, no forked Spark. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VecDotRewrite)
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotF].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDotF(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot_q"),
      new ExpressionInfo(classOf[VecDotQ].getName, "vec_dot_q"),
      (children: Seq[Expression]) => VecDotQ(children(0), children(1))))
    // text-hash kernels for SQL users: simhash32/64(words),
    // minhash_bands(words, norm)
    ext.injectFunction((FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[graft.expr.SimHashN].getName, "simhash32"),
      (children: Seq[Expression]) => graft.expr.SimHashN(children(0), 32)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.expr.SimHashN].getName, "simhash64"),
      (children: Seq[Expression]) => graft.expr.SimHashN(children(0), 64)))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[graft.expr.MinHashBands].getName,
        "minhash_bands"),
      (children: Seq[Expression]) =>
        graft.expr.MinHashBands(children(0), children(1))))
    // Morton layout key for SQL writers: zorder2(x BIGINT, y BIGINT)
    ext.injectFunction((FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[graft.expr.ZOrder2].getName, "zorder2"),
      (children: Seq[Expression]) =>
        graft.expr.ZOrder2(children(0), children(1))))
  }
}
