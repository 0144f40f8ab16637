package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12f operators: Q4-shape late-order semi-join, Q13-shape order
  * distribution, RFM quintile segmentation. */
class Round12fOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("late orders: EXISTS dedups; window and lateness both enforced") {
    val orders = Seq(
      (1L, ts("1996-08-01"), "P1"), // two late lines -> counts ONCE
      (2L, ts("1996-08-01"), "P1"), // on-time line -> not counted
      (3L, ts("1995-01-01"), "P1")) // late line but outside the window
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lines = Seq(
      (1L, ts("1996-11-15")), (1L, ts("1996-12-01")),
      (2L, ts("1996-08-11")), (3L, ts("1995-06-01")))
      .toDF("l_orderkey", "l_shipdate")
    val r = Analytics.lateOrdersOf(orders, lines)
      .as[(String, Long)].collect().toMap
    assert(r == Map("P1" -> 1L))
  }

  test("cust order dist: zero-order customers land in the k=0 bucket") {
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((1L, 10L), (1L, 11L), (2L, 12L))
      .toDF("o_custkey", "o_orderkey")
    val r = Analytics.custOrderDistOf(cust, orders)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("rfm: five customers spread into five aligned quintiles") {
    // cust i: i orders of 100*i each on days 1..i => cust 5 is the most
    // recent, most frequent, highest spend -> segment (1,1,1); cust 1 ->
    // (5,5,5). Monetary sum = i * 100i = 100*i^2.
    val orders = (1 to 5).flatMap { i =>
      (1 to i).map(j => (i.toLong, ts(f"2020-01-0$j"), 100.0 * i))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = Analytics.customerRfmOf(orders)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3) -> ((t._4, t._5))).toMap
    (1 to 5).foreach { i =>
      val q = (6 - i).toLong
      assert(r((q, q, q)) == ((1L, 100L * i * i)), s"cust $i")
    }
  }
}
