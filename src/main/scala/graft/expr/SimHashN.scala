package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared kernel for the native text-hash expressions: one tight JVM loop
  * per row instead of the interpreted higher-order expression chain
  * (aggregate/zip_with/transform are CodegenFallback — per-element closure
  * dispatch plus a fresh Catalyst array per lambda application). Bit-exact
  * with the HOF forms in [[graft.ops.Dedup]] (equivalence-tested there and
  * re-checked by every oracle row). */
object SimHashImpl {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** md5 of a UTF8String's bytes. */
  private[expr] def digest(
      w: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val md = md5.get()
    md.reset()
    md.digest(w.getBytes)
  }

  /** SimHash over the DISTINCT elements of `words`: vote +1/-1 per bit from
    * the word's md5 nibbles (hex char `bit/4`, bit `bit%4` — exactly the
    * `substring(md5(w), 1 + bit div 4, 1)` arithmetic of the SQL form),
    * majority vote (s > 0) sets the bit. For nBits = 64 the top bit lands
    * on the sign bit naturally (1L << 63 == Long.MinValue == the SQL
    * form's explicit bit-63 arm). */
  def hash(words: ArrayData, nBits: Int): Long = {
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]
    val votes = new Array[Int](nBits)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null && seen.add(w)) {
        val h = digest(w)
        var bit = 0
        while (bit < nBits) {
          val j = bit >> 2                     // hex char index
          val b = h(j >> 1) & 0xff
          val nib = if ((j & 1) == 0) (b >>> 4) & 0xf else b & 0xf
          votes(bit) += (if (((nib >> (bit & 3)) & 1) == 1) 1 else -1)
          bit += 1
        }
      }
      i += 1
    }
    var res = 0L
    var bit = 0
    while (bit < nBits) {
      if (votes(bit) > 0) res |= 1L << bit
      bit += 1
    }
    res
  }
}

/** Native codegen SimHash over an array<string> of words — the hot-path
  * form of `Dedup.simhashExpr` (same distinct-word majority-vote md5
  * construction, same oracle). Generated code is ONE static call per row,
  * so the projection stays inside whole-stage codegen. */
case class SimHashN(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits == 32 || nBits == 64, s"nBits must be 32 or 64, got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = s"simhash$nBits"

  override def nullSafeEval(words: Any): Any =
    java.lang.Long.valueOf(
      SimHashImpl.hash(words.asInstanceOf[ArrayData], nBits))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SimHashImpl.hash($c, $nBits);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashN = copy(child = newChild)
}

object SimHashN {
  def apply(words: Column, nBits: Int): Column =
    Bridge.toColumn(SimHashN(Bridge.toExpr(words), nBits))
}
