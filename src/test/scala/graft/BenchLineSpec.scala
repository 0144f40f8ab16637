package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the compact driver-line invariants WITHOUT running Spark: the
  * driver captures only the final 2000 characters of stdout (measured from
  * the r3/r4 artifacts — `tail` is exactly 2000 chars and ends with sbt's
  * ~80-char `[success]` line), so the compact line must stay under ~1900
  * bytes and its abbreviated keys must stay collision-free. */
class BenchLineSpec extends AnyFunSuite {

  private val pipelineNames = SparkEntry.queries.keys.toSeq
  private val warehouseNames = Seq(
    "w_f_sales", "w_new_customers", "w_returned_customers",
    "w_refunded_customers", "w_retention_compact",
    "w_f_customer_retention_grain", "w_uol_v2_month", "w_daily_cycle")

  test("shortKey is injective over the pipeline and warehouse query names") {
    for (names <- Seq(pipelineNames, warehouseNames)) {
      val shorts = names.map(Bench.shortKey)
      assert(shorts.distinct.size == names.size,
        s"abbreviation collision: ${
          shorts.groupBy(identity).filter(_._2.size > 1).keys.mkString(",")}")
    }
  }

  test("r2 renders compact JSON numbers") {
    assert(Bench.r2(0.084) == "0.08")
    assert(Bench.r2(0.1) == "0.1")
    assert(Bench.r2(1.0) == "1")
    assert(Bench.r2(32.004) == "32")
    assert(Bench.r2(12.345) == "12.35")
    assert(Bench.r2(-1.0) == "-1")
  }

  test("worst-case compact line fits the driver's stdout tail window") {
    // every per-query value at the widest realistic rendering (###.##),
    // plus the daily-cycle field, worst-case suspect count, AND the
    // partial-run fields (value -1 + pval/cov + error COUNT — the r8 run
    // proved the error LIST cannot ride the compact line: 67 entries blew
    // the 2000-char tail window). Since round 11 the query count itself
    // cannot fit whole (~15 B/entry × 135+), so the renderer under test is
    // the adaptive compactQueryMap — the invariant is that for ANY input
    // (every query at the widest rendering) the assembled line fits.
    val pMin = pipelineNames.map(n => (n, 123.45))
    val (qmap, kept, qrest) = Bench.compactQueryMap(pMin)
    assert(qmap.length <= 1500, s"qmap ${qmap.length}B > 1500B budget")
    val line =
      s"""{"metric":"total","value":-1,"unit":"sec",""" +
      s""""pval":${Bench.r2(12345.67)},"cov":"100/${pipelineNames.size}",""" +
      s""""queries":$qmap,""" + qrest.map(_ + ",").getOrElse("") +
      s""""sf":"sf0.1",""" +
      s""""wh":{"mat":${Bench.r2(123.45)},"total":${Bench.r2(123.45)},""" +
      s""""dc":${Bench.r2(123.45)}},"vsp":"off","wspr":109,"sus":101,""" +
      s""""nerr":328}"""
    assert(line.length < 1900, s"compact line ${line.length}B >= 1900B")
    // at the widest rendering the map MUST have truncated — and the
    // truncation must be self-labeling and sum-preserving
    assert(kept < pipelineNames.size && qrest.isDefined)
    assert(qrest.get.startsWith("\"qrest\":{\"n\":" +
      (pipelineNames.size - kept)))
  }

  test("compactQueryMap: small inputs render whole, no qrest") {
    val pMin = Seq("q_a" -> 0.5, "q_b" -> 1.25)
    val (qmap, kept, qrest) = Bench.compactQueryMap(pMin)
    assert(kept == 2 && qrest.isEmpty)
    assert(qmap == s"""{"a":0.5,"b":1.25}""") // shortKey strips q_
  }

  test("compactQueryMap: truncation keeps failed + slowest, sums the rest") {
    // budget fits ~3 entries; the failed query must survive even though
    // -1 is the smallest value, and the dropped tail must sum exactly
    val pMin = Seq("q_fast1" -> 0.1, "q_slow" -> 9.0, "q_failed" -> -1.0,
                   "q_fast2" -> 0.2, "q_mid" -> 3.0)
    val (qmap, kept, qrest) = Bench.compactQueryMap(pMin, budget = 40)
    assert(kept == 3, s"$qmap")
    assert(qmap.contains("\"failed\":-1") && qmap.contains("\"slow\":9")
      && qmap.contains("\"mid\":3"))
    assert(qrest.contains(""""qrest":{"n":2,"sum":0.3}"""))
  }

  test("min/median of passes; failed pass poisons both to -1") {
    assert(Bench.minOf(Seq(2.0, 1.0, 3.0)) == 1.0)
    assert(Bench.medianOf(Seq(2.0, 1.0, 3.0)) == 2.0)
    assert(Bench.minOf(Seq(2.0, -1.0, 3.0)) == -1.0)
    assert(Bench.medianOf(Seq(2.0, -1.0, 3.0)) == -1.0)
    // even pass counts: true median (mean of the two middle elements),
    // not the upper-middle element — the name must hold if the series
    // ever moves off 3 passes
    assert(Bench.medianOf(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.medianOf(Seq(1.0, 2.0)) == 1.5)
  }

  test("pass_spread_gt5 labels load-contaminated rows; floor excludes noise") {
    val s = Seq(
      "q_contaminated" -> Seq(67.97, 1.61, 1.64), // the r7 driver-run shape
      "q_fine"         -> Seq(0.8, 0.7, 0.75),
      "q_tiny"         -> Seq(0.01, 0.09, 0.02),  // 9x but under the floor
      "q_failed"       -> Seq(-1.0, 9.9, 0.5))    // failed rows don't count
    assert(Bench.passSpreadGt5(s) == 1)
    assert(Bench.passSpreadGt5(Nil) == 0)
  }

  test("warm_spread_gt5 ignores the structural cold pass") {
    val s = Seq(
      // clean-run shape: >5x cold pass (codegen + memo-cache
      // materialization) with near-identical warm passes — structural,
      // counted by pass_spread_gt5 but NOT by warm_spread_gt5
      "q_cold_structural" -> Seq(11.93, 1.02, 1.08),
      // contaminated-run shape: load hit a warm pass (r7 driver run,
      // q_ann_kmeans_assign [3.36, 1.41, 16.25])
      "q_warm_hit"        -> Seq(3.36, 1.41, 16.25),
      // two-pass series has no warm pair to compare
      "q_two_pass"        -> Seq(9.0, 0.5))
    assert(Bench.passSpreadGt5(s) == 3)
    assert(Bench.warmSpreadGt5(s) == 1)
    assert(Bench.warmSpreadGt5(Nil) == 0)
  }

  test("any warehouse:* error forces the warehouse total to -1") {
    // the r9 ADVICE hole: a failed warehouse section left wh.total
    // summing survivors — the warehouse-side twin of the r8 partial-run
    // headline hazard
    assert(Bench.forcedWhTotal(11.0, Nil) == 11.0)
    assert(Bench.forcedWhTotal(11.0, Seq("warehouse:materialize:p2")) == -1.0)
    assert(Bench.forcedWhTotal(11.0, Seq("warehouse:daily_cycle:p1")) == -1.0)
    assert(Bench.forcedWhTotal(11.0, Seq("warehouse:w_f_sales:p3")) == -1.0)
    // pipeline and preflight errors do NOT force the warehouse total
    assert(Bench.forcedWhTotal(11.0,
      Seq("pipeline:q_x:p1", "preflight:events.ts")) == 11.0)
  }

  test("load preflight: clean first reading -> one attempt, no wait") {
    var slept = 0L
    val attempts = Bench.loadPreflight(read = () => 0.5,
      waitMs = 60000L, sleep = ms => slept += ms)
    assert(attempts == Seq(0.5) && slept == 0L)
  }

  test("load preflight: tripped reading waits the bounded interval and " +
       "retries exactly once, recording both attempts") {
    val readings = Iterator(7.0, 0.8)
    var slept = 0L
    val attempts = Bench.loadPreflight(read = () => readings.next(),
      waitMs = 1234L, sleep = ms => slept += ms)
    assert(attempts == Seq(7.0, 0.8) && slept == 1234L)
    assert(!Bench.contaminated(attempts.last)) // self-healed run
    // a host that STAYS loaded (well over the bar): second attempt
    // recorded, still stamped contaminated, and never a third read
    val stuck = Iterator(7.0, 6.5)
    val a2 = Bench.loadPreflight(read = () => stuck.next(),
      waitMs = 1L, sleep = _ => ())
    assert(a2 == Seq(7.0, 6.5) && Bench.contaminated(a2.last))
  }

  test("load preflight: a BORDERLINE post-wait reading (within 25% of " +
       "the bar) earns one extra bounded retry (r15: 2.03 vs 2.0)") {
    // decaying load: 5.4 -> 2.03 (marginal trip) -> 1.1 (clean third)
    val decaying = Iterator(5.4, 2.03, 1.1)
    var slept = 0L
    val a = Bench.loadPreflight(read = () => decaying.next(),
      waitMs = 700L, sleep = ms => slept += ms)
    assert(a == Seq(5.4, 2.03, 1.1) && slept == 1400L)
    assert(!Bench.contaminated(a.last))
    // the third reading is final even when still tripped: never a fourth
    val stubborn = Iterator(5.4, 2.03, 2.4)
    val b = Bench.loadPreflight(read = () => stubborn.next(),
      waitMs = 1L, sleep = _ => ())
    assert(b == Seq(5.4, 2.03, 2.4) && Bench.contaminated(b.last))
    // 2.6 is beyond the 25% margin: no second retry, fail promptly
    val loaded = Iterator(5.4, 2.6)
    val c = Bench.loadPreflight(read = () => loaded.next(),
      waitMs = 1L, sleep = _ => ())
    assert(c == Seq(5.4, 2.6) && Bench.contaminated(c.last))
  }

  test("loadAvg1 reads the host 1-minute load average") {
    // /proc/loadavg exists on every Linux host this bench runs on; the
    // -1 fallback is for non-proc filesystems only
    val l = Bench.loadAvg1()
    assert(l >= 0.0, s"loadavg unreadable: $l")
  }

  test("parseQueryMap reads a previous full line's flat sections") {
    val json = """{"metric":"total","value":61.5,"unit":"sec",""" +
      """"queries":{"q_a":1.5,"q_b":0.08},"sf":"/x/sf0.1",""" +
      """"warehouse":{"materialize_sec":28.9,"total":11.0,""" +
      """"queries":{"w_f_sales":0.62}},"errors":[]}"""
    assert(Bench.parseQueryMap(json, "queries") ==
      Map("q_a" -> 1.5, "q_b" -> 0.08))
    val wh = json.substring(json.indexOf("\"warehouse\""))
    assert(Bench.parseQueryMap(wh, "queries") == Map("w_f_sales" -> 0.62))
    assert(Bench.parseQueryMap("", "queries").isEmpty)
    assert(Bench.parseQueryMap("{}", "queries").isEmpty)
  }

  test("parseQueryMap survives the round-10 artifact shape") {
    // the vs-prev baseline must keep parsing after the full line grew
    // materialize/daily-cycle pass arrays, partial_total, and the
    // dataset fingerprint — the pipeline map is still the FIRST
    // "queries" section and the warehouse map the first after
    // "warehouse" (the dataset object carries no "queries" key)
    val json = """{"metric":"total","value":50.1,"unit":"sec",""" +
      """"queries":{"q_a":1.5,"q_b":0.08},"sf":"/x/sf0.1",""" +
      """"passes":{"q_a":[2.0,1.5,1.6],"q_b":[0.1,0.08,0.09]},""" +
      """"warehouse":{"materialize_sec":22.2,""" +
      """"materialize_passes":[48.5,28.6,22.2],"partial_total":5.1,""" +
      """"total":-1,"queries":{"w_f_sales":0.62},""" +
      """"daily_cycle_sec":1.94,"daily_cycle_passes":[3.6,2.2,1.94]},""" +
      """"dataset":{"orders":{"schema":"063b1b68","rows":15000}},""" +
      """"errors":["warehouse:daily_cycle:p2"]}"""
    assert(Bench.parseQueryMap(json, "queries") ==
      Map("q_a" -> 1.5, "q_b" -> 0.08))
    val wh = json.substring(json.indexOf("\"warehouse\""))
    assert(Bench.parseQueryMap(wh, "queries") == Map("w_f_sales" -> 0.62))
  }

  test("parseDatasetObj extracts the balanced fingerprint object") {
    val ds = """{"events":{"schema":"a1b2c3d4","rows":60000},""" +
      """"orders":{"schema":"063b1b68","rows":15000}}"""
    val json = s"""{"value":50.1,"dataset":$ds,"errors":[]}"""
    assert(Bench.parseDatasetObj(json).contains(ds))
    // absent (pre-r10 artifact) and unterminated shapes
    assert(Bench.parseDatasetObj("""{"value":50.1,"errors":[]}""").isEmpty)
    assert(Bench.parseDatasetObj("""{"dataset":{"orders":{"rows":1}""").isEmpty)
  }

  test("vs_prev gate: only a same-fingerprint prev artifact is a baseline") {
    val cur = """{"orders":{"schema":"063b1b68","rows":15000}}"""
    val prevSame = s"""{"value":41.1,"dataset":$cur,"errors":[]}"""
    val prevOther = """{"value":41.1,"dataset":""" +
      """{"orders":{"schema":"063b1b68","rows":99999}},"errors":[]}"""
    val prevOld = """{"value":58.6,"errors":[]}""" // pre-r10: no fingerprint
    assert(Bench.vsPrevStatus(prevSame, cur) == "checked")
    // the r8/pre-r10 scenario: a driver-side regeneration — cross-dataset
    // times must not fire (or mask) regression flags
    assert(Bench.vsPrevStatus(prevOther, cur) == "skipped:dataset_changed")
    assert(Bench.vsPrevStatus(prevOld, cur) == "skipped:prev_unfingerprinted")
    assert(Bench.vsPrevStatus("", cur) == "no_prev")
  }

  test("partialMin surfaces the surviving pass of a mixed series only") {
    // the r10 ADVICE shape: materialize pass 1 clean, warm pass failed —
    // minOf poisons the published value, partialMin keeps the survivor
    assert(Bench.partialMin(Seq(25.5, -1.0, -1.0)).contains(25.5))
    assert(Bench.partialMin(Seq(-1.0, 22.2, 28.1)).contains(22.2))
    // all-ok: no partial needed; all-failed: no survivor
    assert(Bench.partialMin(Seq(25.5, 22.2, 23.0)).isEmpty)
    assert(Bench.partialMin(Seq(-1.0, -1.0, -1.0)).isEmpty)
    assert(Bench.partialMin(Nil).isEmpty)
  }

  test("ScaleProbe covers every SparkEntry query exactly once") {
    // r10 verdict item 5: the scale claim was scoped to a 53-query
    // subset; the probe list must now track the full query set so a new
    // query cannot silently fall outside the "no super-linear" claim
    val probe = ScaleProbe.probeQueries
    assert(probe.distinct.size == probe.size,
      s"duplicate probe entries: ${probe.diff(probe.distinct).mkString(",")}")
    val all = SparkEntry.queries.keySet
    assert(probe.toSet == all,
      s"probe/query drift — missing: ${(all -- probe.toSet).mkString(",")}; " +
      s"unknown: ${(probe.toSet -- all).mkString(",")}")
  }

  test("contamination preflight: stamped above threshold, silent below") {
    // r13 verdict task 6: a loaded-host start must self-mark the artifact
    assert(Bench.contaminated(6.14))       // the r13 driver-run shape
    assert(!Bench.contaminated(0.31))      // quiet box
    assert(!Bench.contaminated(2.0))       // boundary: strictly above
    assert(!Bench.contaminated(-1.0))      // unreadable /proc/loadavg
  }

  test("suspect flags: warm>>cold and vs-prev regression") {
    val s = Seq(
      "q_loaded"  -> Seq(0.8, 20.5, 18.0),  // warm 25x cold: host load
      "q_fine"    -> Seq(0.8, 0.7, 0.75),
      "q_tiny"    -> Seq(0.01, 0.05, 0.04), // under the 0.05 s floor
      "q_regress" -> Seq(2.0, 1.9, 1.95),   // 10x the committed prev
      "q_failed"  -> Seq(-1.0, 0.5, 0.5))
    val prev = Map("q_regress" -> 0.19, "q_fine" -> 0.7)
    assert(Bench.suspectsOf(s, prev).toSet ==
      Set("q_loaded:warm_gt_cold", "q_regress:vs_prev"))
  }
}
