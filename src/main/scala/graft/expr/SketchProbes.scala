package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen probes over Spark's public sketch types
  * (`org.apache.spark.util.sketch`): the executor-side half of the classic
  * build-small / probe-huge runtime-filter pattern.
  *
  * The sketch is built once on the small side (driver-side
  * `DataFrameStatFunctions.bloomFilter` / `countMinSketch` — both public
  * API), then ships to executors as a `Broadcast` REFERENCE: the expression
  * tree serialized into every stage's task binary carries only the handle,
  * and the sketch bytes move once per executor over the torrent broadcast
  * path — not once per serialized plan copy. A 4M-key bloom at 1% fpp is
  * ~4.6 MB — broadcast-sized, NOT data-sized, which is what makes the
  * pattern viable when the probe side is 100 TB: the filter drops
  * non-matching rows inside the scan's WholeStageCodegen before any
  * shuffle.
  *
  * Both probes stay inside codegen via `ctx.addReferenceObj` — no UDF
  * boundary, no row-at-a-time serialization. The broadcast `.value` is
  * hoisted into a lazily-initialized local, so the per-row code touches a
  * plain field.
  *
  * Reference behavior: the reference engine (psycopg2 INSERT pipelines,
  * /root/reference/src/dags/ETL_logs_inc.py:135-142) has no analogue; these
  * exist for the 100 TB north star.
  */
case class BloomMightContainLong(child: Expression,
                                 bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom probe needs a BIGINT key, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast once per partition, not per row
    val local = ctx.addMutableState(classOf[BloomFilter].getName, "bloom",
      v => s"$v = (${classOf[BloomFilter].getName}) $bc.value();")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $local.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomMightContainLong {
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.toColumn(BloomMightContainLong(Bridge.toExpr(c), bloom))
}

/** Point estimate from a Count-Min sketch: upper-bounds the true frequency
  * (CMS never under-counts), so `CmsEstimateLong(k) >= T` yields a candidate
  * superset that an exact, semi-join-reduced aggregation then verifies —
  * exact heavy-hitters with the full-table shuffle replaced by a
  * sketch-filtered one. Same `Broadcast` transport as
  * [[BloomMightContainLong]]. */
case class CmsEstimateLong(child: Expression, cms: Broadcast[CountMinSketch])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"CMS probe needs a BIGINT key, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    cms.value.estimateCount(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("cmsBc", cms, classOf[Broadcast[_]].getName)
    val local = ctx.addMutableState(classOf[CountMinSketch].getName, "cms",
      v => s"$v = (${classOf[CountMinSketch].getName}) $bc.value();")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $local.estimateCount((Object) ($c));")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimateLong = copy(child = newChild)
}

object CmsEstimateLong {
  def apply(c: Column, cms: Broadcast[CountMinSketch]): Column =
    Bridge.toColumn(CmsEstimateLong(Bridge.toExpr(c), cms))
}
