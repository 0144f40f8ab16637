package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native float-vector dot product with whole-stage codegen.
  *
  * The built-in composition `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`
  * is semantically identical but runs as interpreted higher-order functions
  * (CodegenFallback: per-row closure dispatch + boxed Float intermediates +
  * an allocated zip array). This expression generates a tight primitive
  * loop over the two ArrayData buffers — the hot path for cosine top-k at
  * scale, per the Catalyst extension ladder (custom Expression before
  * custom physical operator).
  *
  * Accumulates in double in index order. Edge-case semantics (deliberately
  * NOT the HOF form's, which returns NULL for unequal lengths or any null
  * element): unequal-length inputs sum over the min-length prefix, and null
  * ELEMENTS contribute 0 (null top-level arrays still yield NULL). On dense
  * equal-length vectors the two forms agree bit-for-bit.
  */
case class VecDotF(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Static: unguarded tight loop when neither side can hold null elements. */
  private lazy val nullableElems =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!nullableElems || (!x.isNullAt(i) && !y.isNullAt(i)))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val add = s"$s += (double) $a.getFloat($i) * (double) $b.getFloat($i);"
      val step = if (nullableElems)
        s"if (!$a.isNullAt($i) && !$b.isNullAt($i)) { $add }"
      else add
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $step
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotF =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  /** Column-API surface for the native dot product (Spark 4 classic
    * Column↔Expression bridge). */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.toColumn(VecDotF(Bridge.toExpr(a), Bridge.toExpr(b)))

  /** Register `vec_dot` for SQL use in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "vec_dot",
      exprs => VecDotF(exprs.head, exprs(1)))
}
