package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Fixture specs for rolling active users, the rolling z-score anomaly
  * detector, and the SCD2 point-in-time join. */
class RollingAnomalyPitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 12) =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("rolling active users: trailing-7d distinct, anchored on active days") {
    val events = Seq(
      (ts(1), 1L), (ts(1, 13), 1L), (ts(1), 2L), // day 1: users {1,2}
      (ts(2), 2L),                               // day 2: {2}
      (ts(9), 1L))                               // day 9: {1}
      .toDF("ts", "user_id")
    val got = Sessions.rollingActiveUsersOf(events)
      .as[(Timestamp, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (ts(1, 0), 2L, 2L, 1.0),   // window [Dec 26..Jan 1] = {1,2}
      (ts(2, 0), 1L, 2L, 0.5),   // window [Dec 27..Jan 2] = {1,2}
      (ts(9, 0), 1L, 1L, 1.0)))  // window [Jan 3..Jan 9] = {1}
    // days 3-8 have no own activity → not anchor days
  }

  test("revenue anomaly: rolling mean/std from whole-dollar ints, strict threshold") {
    // .70 cents prove the dollar-floor pin: z sees 1,2,3,10 while the
    // reported rev keeps the exact cents
    val orders = Seq(
      (ts(1), 1.70), (ts(2), 2.70), (ts(3), 3.70), (ts(4), 10.70))
      .toDF("o_orderdate", "o_totalprice")
    val got = Analytics.revenueAnomalyOf(orders,
        windowDays = 3, zThresh = 1.0, minDays = 2)
      .as[(Timestamp, Double, Long, Option[Double], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(ts(2, 0), ts(3, 0), ts(4, 0))) // day 1: warm-up
    assert(got.map(_._2) == Seq(2.70, 3.70, 10.70))
    val zs = got.map(_._4.get)
    assert(math.abs(zs(0) - 0.5 / math.sqrt(0.5)) < 1e-12)  // {1,2}
    assert(zs(1) == 1.0)                                    // {1,2,3}
    assert(math.abs(zs(2) - 5.0 / math.sqrt(19.0)) < 1e-12) // {2,3,10}
    // z == threshold is NOT an anomaly (strict >): day 3 stays false
    assert(got.map(_._5) == Seq(false, false, true))
  }

  test("SCD2 point-in-time: sale attributed to the 30-days-ago city") {
    val dec = (d: String) => new java.math.BigDecimal(d)
    val uolV2 = Seq(
      (1L, ts(1), dec("5.00")),   // pit Dec 2  → before history → NULL
      (2L, ts(2), dec("7.00")),   // customer with no SCD rows   → NULL
      (1L, ts(31), dec("10.00")), // pit Jan 1  → city 5 (first interval)
      (1L, ts(31, 13), dec("20.00"))) // same pit day → city 5 too
      .toDF("customer_id", "date_time", "payment_amount")
    val scd = Seq(
      (1L, 5, Some(ts(1, 0)), Some(ts(14, 0)), false),
      (1L, 6, Some(ts(15, 0)), None: Option[Timestamp], true))
      .toDF("customer_id", "city_id", "valid_from", "valid_to", "is_current")
    val got = Analytics.scdPointInTimeOf(uolV2, scd)
      .as[(Option[Int], Long, Double)].collect()
      .sortBy(_._1.getOrElse(-1)).toSeq
    assert(got == Seq(
      (None, 2L, 12.0),       // pre-history + unknown customer
      (Some(5), 2L, 30.0)))
  }

  test("SCD2 point-in-time: open-ended current interval matches late sales") {
    val uolV2 = Seq((1L, Timestamp.valueOf("2024-06-01 00:00:00"),
      new java.math.BigDecimal("3.00"))).toDF("customer_id", "date_time", "payment_amount")
    val scd = Seq((1L, 9, Some(ts(1, 0)), None: Option[Timestamp], true))
      .toDF("customer_id", "city_id", "valid_from", "valid_to", "is_current")
    val got = Analytics.scdPointInTimeOf(uolV2, scd)
      .as[(Option[Int], Long, Double)].collect().toSeq
    assert(got == Seq((Some(9), 1L, 3.0)))
  }
}
