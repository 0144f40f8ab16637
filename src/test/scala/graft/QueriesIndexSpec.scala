package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins queries_index.json (tools/gen_index.py) to the live registry:
  * adding or renaming a SparkEntry.queries entry without regenerating the
  * index is a red build, so the machine-readable coverage claim can never
  * silently drift from the code (VERDICT r12 task 2). `spec: null` rows
  * are oracle-only coverage — allowed; missing/extra KEYS are not.
  */
class QueriesIndexSpec extends AnyFunSuite {

  test("queries_index.json key set equals SparkEntry.queries") {
    val path = java.nio.file.Paths.get("queries_index.json")
    assert(java.nio.file.Files.exists(path),
      "queries_index.json missing: run python3 tools/gen_index.py")
    val text = java.nio.file.Files.readString(path)
    val indexed = "\"(q_\\w+)\"\\s*:\\s*\\{".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val live = SparkEntry.queries.keySet
    assert((live -- indexed).isEmpty,
      s"queries missing from queries_index.json (rerun tools/gen_index.py): " +
        (live -- indexed).toSeq.sorted.mkString(", "))
    assert((indexed -- live).isEmpty,
      s"stale queries_index.json entries (rerun tools/gen_index.py): " +
        (indexed -- live).toSeq.sorted.mkString(", "))
  }

  test("probe coverage is total: ratio or explicit exemption per query") {
    // r13 verdict task 4: queries_index.json carried exactly one silent
    // probe_ratio_8x null. A query must have a measured ratio, a
    // documented PROBE_EXEMPT marker (probe_exempt field), or be inside
    // the current round's newThisRound window (its probe runs at round
    // close) — a null outside those reads as coverage that isn't there.
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get("queries_index.json"))
    val gaps = "\"(q_\\w+)\"\\s*:\\s*\\{([^}]*)\\}".r
      .findAllMatchIn(text)
      .filter { m =>
        val name = m.group(1)
        val body = m.group(2)
        body.contains("\"probe_ratio_8x\": null") &&
          !body.contains("\"probe_exempt\":") &&
          !SparkEntry.newThisRound.contains(name)
      }
      .map(_.group(1)).toSeq.sorted
    assert(gaps.isEmpty,
      s"silent probe gaps (no ratio, no exemption, not new this round): " +
        gaps.mkString(", "))
  }

  test("every index row carries entry, impl and oracle anchors") {
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get("queries_index.json"))
    // the generator emits null only for spec/probe fields; entry/impl/
    // oracle must be real file:line anchors
    val bad = "\"(q_\\w+)\"\\s*:\\s*\\{([^}]*)\\}".r
      .findAllMatchIn(text)
      .filter { m =>
        val body = m.group(2)
        !Seq("entry", "impl", "oracle").forall { f =>
          s""""$f": "src/""".r.findFirstIn(body).isDefined
        }
      }
      .map(_.group(1)).toSeq
    assert(bad.isEmpty, s"index rows without full anchors: $bad")
  }
}
