package graft.expr

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
  * API), then rides to executors inside the serialized expression tree, the
  * same transport Spark's own `InjectRuntimeFilter` uses for its bloom
  * subquery results. A 1M-key bloom at 1% fpp is ~1.2 MB — broadcast-sized,
  * NOT data-sized, which is what makes the pattern viable when the probe
  * side is 100 TB: the filter drops non-matching rows inside the scan's
  * WholeStageCodegen before any shuffle.
  *
  * Both probes stay inside codegen via `ctx.addReferenceObj` — no UDF
  * boundary, no row-at-a-time serialization.
  *
  * Reference behavior: the reference engine (psycopg2 INSERT pipelines,
  * /root/reference/src/dags/ETL_logs_inc.py:135-142) has no analogue; these
  * exist for the 100 TB north star.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
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
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomMightContainLong {
  def apply(c: Column, bloom: BloomFilter): Column =
    Bridge.toColumn(BloomMightContainLong(Bridge.toExpr(c), bloom))
}

/** Point estimate from a Count-Min sketch: upper-bounds the true frequency
  * (CMS never under-counts), so `CmsEstimateLong(k) >= T` yields a candidate
  * superset that an exact, semi-join-reduced aggregation then verifies —
  * exact heavy-hitters with the full-table shuffle replaced by a
  * sketch-filtered one. */
case class CmsEstimateLong(child: Expression, cms: CountMinSketch)
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
    cms.estimateCount(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.estimateCount((Object) ($c));")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimateLong = copy(child = newChild)
}

object CmsEstimateLong {
  def apply(c: Column, cms: CountMinSketch): Column =
    Bridge.toColumn(CmsEstimateLong(Bridge.toExpr(c), cms))
}
