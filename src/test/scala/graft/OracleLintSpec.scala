package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint for the r11 HUGEINT class: DuckDB widens a window
  * `sum(BIGINT)` to INT128, which pandas renders `0.0`-style and the
  * driver's raw-stringify hasher then mismatches Spark's `0` even when
  * every value is equal. Every window sum in the oracle sources must
  * therefore be (a) wrapped in an explicit CAST, (b) an intermediate
  * alias that is CAST where it is consumed, or (c) a sum over a DECIMAL
  * operand (DuckDB keeps DECIMAL — no INT128 widening), which must be
  * declared on the allowlist below with its reason. A new uncast integer
  * window sum is a red build before it can reach the driver's hasher.
  */
class OracleLintSpec extends AnyFunSuite {

  private val files = Seq(
    "src/main/scala/graft/Oracle.scala",
    "src/main/scala/graft/DocsOracleSql.scala")

  /** Window-sum aliases over DECIMAL operands — safe uncast, because the
    * DuckDB result type is DECIMAL, not HUGEINT. Keep each entry's
    * justification current: the operand must trace to a DECIMAL column. */
  private val decimalSums: Map[String, String] = Map(
    "rev_7d"  -> "sum(day_revenue); day_revenue = sum(payment_amount) DECIMAL(14,2)",
    "cum_rev" -> "sum(day_rev); day_rev = sum(payment_amount) DECIMAL(14,2)")

  /** Index just past the matching ')' for the '(' at `open`. */
  private def closeOf(text: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < text.length) {
      text.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Is position `pos` (start of `sum`) inside an enclosing CAST( … )?
    * Walk backwards over ≤800 chars tracking paren depth; every paren
    * that opens AROUND pos is checked for a preceding CAST token
    * (COALESCE/greatest/arithmetic wrappers between CAST and the sum are
    * fine — the scan keeps walking outward). */
  private def insideCast(text: String, pos: Int): Boolean = {
    var depth = 0
    var i = pos - 1
    val floor = math.max(0, pos - 800)
    while (i >= floor) {
      text.charAt(i) match {
        case ')' => depth += 1
        case '(' =>
          if (depth == 0) {
            val head = text.substring(math.max(0, i - 10), i)
              .toUpperCase.replaceAll("\\s+$", "")
            if (head.endsWith("CAST")) return true
            // non-CAST enclosing call: keep scanning outward
          } else depth -= 1
        case _ =>
      }
      i -= 1
    }
    false
  }

  private case class Hit(file: String, line: Int, alias: String)

  private def lint(file: String): Seq[Hit] = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(file))
    def lineOf(pos: Int) = text.substring(0, pos).count(_ == '\n') + 1
    val sumRe = "(?i)\\bsum\\s*\\(".r
    sumRe.findAllMatchIn(text).flatMap { m =>
      val open = text.indexOf('(', m.start)
      val end = closeOf(text, open)
      if (end < 0) None
      else {
        val tail = text.substring(end)
        // window form: `) OVER (…)` or `) OVER w7` (named window)
        val overRe = "^\\s*OVER\\s*(\\(|\\w+)".r
        overRe.findFirstMatchIn(tail) match {
          case None => None // plain aggregate — DuckDB sum() on GROUP BY
                            // also widens, but those sites are all CAST
                            // already and the window form is the class
                            // the driver actually hit; see casts below
          case Some(ov) =>
            // find this window expression's alias: AS <name> after the
            // OVER clause (named window: right after the name)
            val afterOver =
              if (ov.group(1) == "(") {
                val wOpen = end + tail.indexOf('(')
                closeOf(text, wOpen)
              } else end + ov.end
            val aliasRe = "^\\s*AS\\s+(\\w+)".r
            val alias = aliasRe
              .findFirstMatchIn(text.substring(afterOver))
              .map(_.group(1)).getOrElse("<no-alias>")
            val safe =
              insideCast(text, m.start) ||
              decimalSums.contains(alias) ||
              // alias consumed inside a CAST downstream (e.g.
              // CAST(session_seq AS BIGINT), CAST(max(conc) AS BIGINT))
              ("(?is)CAST\\s*\\(.{0,80}?\\b" + alias + "\\b").r
                .findFirstIn(text).isDefined
            if (safe) None else Some(Hit(file, lineOf(m.start), alias))
        }
      }
    }.toSeq
  }

  test("every oracle window sum is CAST or a declared DECIMAL sum") {
    val hits = files.flatMap(lint)
    assert(hits.isEmpty,
      "uncast integer window sums (HUGEINT risk):\n  " +
        hits.map(h => s"${h.file}:${h.line} alias=${h.alias}")
          .mkString("\n  "))
  }

  test("plain GROUP BY integer sums are CAST too (sampled invariants)") {
    // DuckDB also widens non-window sum(BIGINT) to HUGEINT; the codebase
    // convention is CAST(sum(x) AS BIGINT) at every integer site. Spot-pin
    // the convention on the two workhorse columns so a regression in the
    // prevailing style is visible even though the window lint above is
    // the load-bearing check.
    val text = files.map(f =>
      java.nio.file.Files.readString(java.nio.file.Paths.get(f))).mkString
    val uncast = "(?i)sum\\((?:quantity|l_quantity)\\)(?!\\s*AS\\s+BIGINT)".r
      .findAllMatchIn(text)
      .filterNot(m => insideCast(text, m.start))
      .size
    assert(uncast == 0, s"$uncast uncast sum(quantity) sites")
  }
}
