package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` producing a k=8 MinHash signature from a group of
  * shingles — the user-facing custom-aggregate surface (SURVEY §7.3: sketches
  * land as Aggregator / TypedImperativeAggregate).
  *
  * Semantics are identical to the expression pipeline in
  * [[graft.ops.Dedup.minhashOf]] (min over shingles of md5(seed||'|'||s) per
  * seed), verified by a cross-equivalence spec. The buffer is a fixed k-slot
  * array of the current minima — constant size per group, merge is
  * element-wise min, so partial aggregation (map-side combine) applies
  * exactly as with built-in aggregates.
  */
object MinHashAgg extends Aggregator[String, Array[String], Array[String]] {

  val k = 8
  /** Sorts after every md5 hex digest. */
  private val Top = "￿"

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  override def zero: Array[String] = Array.fill(k)(Top)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var j = 0
    while (j < k) {
      val h = md5hex(s"$j|$shingle")
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(r: Array[String]): Array[String] = r

  // ExpressionEncoder for BOTH buffer and output: the buffer crosses the
  // partial-aggregation shuffle once per group, and Java serialization
  // there costs ~10× the bytes and per-row ser/deser of the columnar
  // array encoding.
  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
