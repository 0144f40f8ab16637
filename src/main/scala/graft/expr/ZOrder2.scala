package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Two-dimension Morton (Z-order) key: interleaves the low 16 bits of two
  * BIGINT dimensions into a 32-bit curve position (as LongType).
  *
  * The data-layout primitive behind multi-dimensional file skipping: sort or
  * range-partition a 100 TB table by `z(x, y)` at write time and each
  * parquet file's min/max footer covers a small rectangle in BOTH
  * dimensions, so point/range predicates on either column prune files —
  * a linear sort can only do that for its leading column. (Same layout
  * trick Delta/Iceberg expose as `OPTIMIZE ... ZORDER BY`; here it is a
  * plain Catalyst expression + `repartitionByRange`.)
  *
  * Bit-spreading uses the classic mask-shift cascade (public-domain
  * "Interleave bits by Binary Magic Numbers" bit hack) — branch-free,
  * codegen-friendly, exactly reproducible in any engine with integer
  * bitwise ops (the DuckDB oracle runs the same cascade in SQL).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 needs (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    spread(x.asInstanceOf[Long]) | (spread(y.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sp = ctx.freshName("spread")
      // addNewFunction returns the (possibly class-qualified) callable name
      val spCall = ctx.addNewFunction(sp,
        s"""private long $sp(long v) {
           |  v &= 0xFFFFL;
           |  v = (v | (v << 8)) & 0x00FF00FFL;
           |  v = (v | (v << 4)) & 0x0F0F0F0FL;
           |  v = (v | (v << 2)) & 0x33333333L;
           |  v = (v | (v << 1)) & 0x55555555L;
           |  return v;
           |}""".stripMargin)
      s"${ev.value} = $spCall($x) | ($spCall($y) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  def apply(x: Column, y: Column): Column =
    Bridge.toColumn(ZOrder2(Bridge.toExpr(x), Bridge.toExpr(y)))
}
