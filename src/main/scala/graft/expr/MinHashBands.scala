package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[MinHashBands]]: word-3-gram shingles → 8 seeded min-hash
  * signatures → 4 LSH band hashes, in one JVM loop per row. String-exact
  * with the SQL construction mirrored by the DuckDB oracle
  * (`md5(seed || '|' || shingle)` min per seed, `md5(sig0 || '|' || sig1)`
  * per band; lexicographic min over lowercase hex == byte order). */
object MinHashBandsImpl {

  private val HEX = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val h = SimHashImpl.digest(UTF8String.fromString(s))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((h(i) >>> 4) & 0xf)
      out(2 * i + 1) = HEX(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def bands(words: ArrayData, norm: UTF8String): ArrayData = {
    val n = words.numElements()
    // 3-word shingles; whole-doc fallback below 3 words (Dedup.shinglesOf)
    val shingles: Array[String] =
      if (n >= 3) {
        val arr = new Array[String](n - 2)
        var i = 0
        while (i < n - 2) {
          arr(i) = words.getUTF8String(i).toString + " " +
                   words.getUTF8String(i + 1).toString + " " +
                   words.getUTF8String(i + 2).toString
          i += 1
        }
        arr
      } else Array(norm.toString)
    val sigs = new Array[String](8)
    var seed = 0
    while (seed < 8) {
      var min: String = null
      var i = 0
      while (i < shingles.length) {
        val h = md5Hex(seed.toString + "|" + shingles(i))
        if (min == null || h.compareTo(min) < 0) min = h
        i += 1
      }
      sigs(seed) = min
      seed += 1
    }
    val out = new Array[AnyRef](4)
    var b = 0
    while (b < 4) {
      out(b) = UTF8String.fromString(
        md5Hex(sigs(2 * b) + "|" + sigs(2 * b + 1)))
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen MinHash LSH banding over (words, norm) — emits the four
  * band hashes as array<string>; one static call per row, keeping the
  * banding projection inside whole-stage codegen (the HOF form pays
  * interpreted lambda dispatch per shingle per seed). Row-identical to the
  * grouped signature pipeline (equivalence-tested in DedupSpec) and to the
  * oracle's `minhash_bands` CTE. */
case class MinHashBands(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(words: Any, norm: Any): Any =
    MinHashBandsImpl.bands(words.asInstanceOf[ArrayData],
                           norm.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, s) =>
      s"${ev.value} = graft.expr.MinHashBandsImpl.bands($w, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashBands =
    copy(left = newLeft, right = newRight)
}

object MinHashBands {
  def apply(words: Column, norm: Column): Column =
    Bridge.toColumn(MinHashBands(Bridge.toExpr(words), Bridge.toExpr(norm)))
}
