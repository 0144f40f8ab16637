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

  test("the FULL registry carries a committed three-SF green row " +
       "(CORRECTNESS_multi_full.json, r14 verdict task 1)") {
    // rounds 1-12's queries were only ever correctness-checked at sf0.01
    // (the driver gate); this artifact is the one-time full-registry
    // three-SF run, kept in lockstep with the registry from round 15 on:
    // `runMain graft.VerifyMulti /tmp/vmulti_full ALL` +
    // `python3 tools/check_multi.py /tmp/vmulti_full CORRECTNESS_multi_full.json <round>`
    val path = java.nio.file.Paths.get("CORRECTNESS_multi_full.json")
    assert(java.nio.file.Files.exists(path),
      "CORRECTNESS_multi_full.json missing: run VerifyMulti ALL + check_multi")
    val text = java.nio.file.Files.readString(path)
    val rows = "\"(q_\\w+)\"\\s*:\\s*\\{([^}]*)\\}".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
    val live = SparkEntry.queries.keySet
    val missing = (live -- rows.keySet).toSeq.sorted
    assert(missing.isEmpty,
      s"registry queries without a full three-SF row: $missing " +
        "(new queries may ride CORRECTNESS_multi until the next full run; " +
        "merge their rows into CORRECTNESS_multi_full.json at round close)")
    val stale = (rows.keySet -- live).toSeq.sorted
    assert(stale.isEmpty, s"stale CORRECTNESS_multi_full.json rows: $stale")
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    val red = rows.collect { case (n, body)
        if sfs.exists(sf => !body.contains(s""""$sf": "ok"""")) => n }
    assert(red.isEmpty, s"non-green three-SF rows: ${red.toSeq.sorted}")
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
