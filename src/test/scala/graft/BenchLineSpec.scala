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
    "w_f_customer_retention_grain", "w_uol_v2_month")

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
    // every per-query value at the widest realistic rendering (###.##)
    val qmap = pipelineNames.sorted
      .map(n => "\"" + Bench.shortKey(n) + "\":" + Bench.r2(123.45))
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${Bench.r2(1234.56)},"unit":"sec",""" +
      s""""queries":$qmap,"sf":"sf0.1",""" +
      s""""wh":{"mat":${Bench.r2(123.45)},"total":${Bench.r2(123.45)}}}"""
    assert(line.length < 1900, s"compact line ${line.length}B >= 1900B")
  }
}
