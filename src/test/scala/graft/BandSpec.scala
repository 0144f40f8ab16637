package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the band-merge artifact (r10 verdict item 2): the run summaries,
  * the `[min,max]` bands over clean values, and the dataset-consistency
  * label — all against fixture run lines in Bench's real output shape,
  * no Spark needed. */
class BandSpec extends AnyFunSuite {

  private val ds1 = """{"orders":{"schema":"063b1b68","rows":15000}}"""
  private val ds2 = """{"orders":{"schema":"063b1b68","rows":99999}}"""

  private def run(value: Double, mat: Double, whTotal: Double, dc: Double,
                  ds: String, errs: String = "[]"): String =
    s"""{"metric":"total","value":$value,"unit":"sec",""" +
    s""""queries":{"q_a":1.5},"sf":"/x/sf0.1",""" +
    s""""warehouse":{"materialize_sec":$mat,""" +
    s""""materialize_passes":[${mat + 9},$mat,${mat + 1}],""" +
    s""""total":$whTotal,"queries":{"w_f_sales":0.62},""" +
    s""""daily_cycle_sec":$dc,"daily_cycle_passes":[3.6,$dc,2.2]},""" +
    s""""dataset":$ds,"vs_prev":"checked",""" +
    s""""pass_spread_gt5":17,"warm_spread_gt5":0,""" +
    s""""loadavg_start":2.5,"loadavg_end":6.1,""" +
    s""""suspect":[],"errors":$errs}"""

  test("summarize lifts headline, per-section mins, load window and labels") {
    val s = Band.summarize(run(47.73, 22.2, 5.08, 1.94, ds1))
    assert(s.contains(""""value":47.73"""))
    assert(s.contains(""""materialize_sec":22.2"""))
    assert(s.contains(""""wh_total":5.08"""))
    assert(s.contains(""""daily_cycle_sec":1.94"""))
    assert(s.contains(""""loadavg":[2.5,6.1]"""))
    assert(s.contains(""""warm_spread_gt5":0"""))
    assert(s.contains(""""suspect":0"""))
    assert(s.contains(""""errors":0"""))
    assert(s.contains(""""vs_prev":"checked""""))
  }

  test("summarize must not shadow warehouse total with the pipeline headline") {
    // "value" and warehouse "total" are different numbers on purpose
    val s = Band.summarize(run(58.35, 31.0, 5.45, 2.41, ds1))
    assert(s.contains(""""value":58.35""") && s.contains(""""wh_total":5.45"""))
  }

  test("merge bands clean values and labels dataset consistency") {
    val merged = Band.merge(Seq(
      run(47.73, 22.2, 5.08, 1.94, ds1),
      run(48.79, 25.5, 5.2, 2.41, ds1),
      run(58.35, 31.0, 5.45, 2.2, ds1)))
    assert(merged.contains(""""n_runs":3"""))
    assert(merged.contains(""""value":[47.73,58.35]"""))
    assert(merged.contains(""""materialize_sec":[22.2,31]"""))
    assert(merged.contains(""""wh_total":[5.08,5.45]"""))
    assert(merged.contains(""""daily_cycle_sec":[1.94,2.41]"""))
    assert(merged.contains(""""dataset_consistent":true"""))
    assert(merged.contains(s""""dataset":$ds1"""))
  }

  test("a failed run rides the band visibly, not averaged in") {
    val merged = Band.merge(Seq(
      run(47.73, 22.2, 5.08, 1.94, ds1),
      run(-1, 22.9, -1, 2.0, ds1, errs = """["pipeline:q_x:p1"]""")))
    // the failed run's -1s are excluded from the band...
    assert(merged.contains(""""value":[47.73,47.73]"""))
    assert(merged.contains(""""wh_total":[5.08,5.08]"""))
    // ...but its summary keeps them, with the error count beside
    assert(merged.contains(""""value":-1"""))
    assert(merged.contains(""""errors":1"""))
  }

  test("cross-dataset runs are labeled inconsistent") {
    val merged = Band.merge(Seq(
      run(47.73, 22.2, 5.08, 1.94, ds1),
      run(41.11, 18.2, 4.6, 1.64, ds2)))
    assert(merged.contains(""""dataset_consistent":false"""))
  }

  test("scanner helpers degrade to -1/empty on malformed input") {
    assert(Band.scalar("{}", "value") == -1.0)
    assert(Band.str("{}", "vs_prev") == "")
    assert(Band.arrCount("{}", "suspect") == -1)
    assert(Band.arrCount("""{"suspect":[]}""", "suspect") == 0)
    assert(Band.arrCount("""{"suspect":["a","b"]}""", "suspect") == 2)
    assert(Band.bandOf(Seq(-1.0, -1.0)) == "[-1,-1]")
  }
}
