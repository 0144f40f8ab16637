package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the multi-SF correctness gate: every query added this round
  * ([[SparkEntry.newThisRound]]) must carry a fully-green three-SF row in
  * the committed CORRECTNESS_multi.json — the automation of the
  * "sf0.01-only greens can be coincidental" rule. The artifact is produced
  * by `runMain graft.VerifyMulti /tmp/vmulti` +
  * `python3 tools/check_multi.py /tmp/vmulti CORRECTNESS_multi.json <round>`.
  */
class VerifyMultiSpec extends AnyFunSuite {

  private val artifactPath = java.nio.file.Paths.get("CORRECTNESS_multi.json")

  test("newThisRound names are registered queries") {
    val unknown = SparkEntry.newThisRound -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"newThisRound lists unregistered queries: $unknown")
  }

  test("every new query has a committed three-SF green row") {
    val fresh = SparkEntry.newThisRound
    if (fresh.isEmpty) cancel("no additions registered yet this round")
    assert(java.nio.file.Files.exists(artifactPath),
      "CORRECTNESS_multi.json missing: run VerifyMulti + tools/check_multi.py")
    val text = java.nio.file.Files.readString(artifactPath)
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    val missing = fresh.toSeq.sorted.flatMap { name =>
      // {"name": {"sf0.001": "ok", ...}} — block match, order-insensitive
      val block = ("\"" + java.util.regex.Pattern.quote(name) +
        "\"\\s*:\\s*\\{([^}]*)\\}").r
      block.findFirstMatchIn(text) match {
        case None => Some(s"$name: no row in CORRECTNESS_multi.json")
        case Some(m) =>
          val body = m.group(1)
          val bad = sfs.filterNot(sf => body.contains(s""""$sf": "ok""""))
          if (bad.isEmpty) None
          else Some(s"$name: not green at ${bad.mkString(", ")}")
      }
    }
    assert(missing.isEmpty,
      "multi-SF gate violations:\n  " + missing.mkString("\n  "))
  }
}
