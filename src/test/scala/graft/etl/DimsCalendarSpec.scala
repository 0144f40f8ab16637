package graft.etl

import graft.SparkSpec
import java.sql.Timestamp

class DimsCalendarSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("calendar: union-distinct of three feeds, attrs, dense ids (A1/P3/P4)") {
    val research = Seq(ts("2024-01-05 00:00:00")).toDF("date_id")
    val ual = Seq(ts("2024-01-05 00:00:00"), ts("2024-02-01 12:30:00"))
      .toDF("date_time")
    val uol = Seq(ts("2023-12-31 00:00:00")).toDF("date_time")
    val cal = Calendar.attrs(Calendar.dates(research, ual, uol))
      .orderBy("date_id")
      .select("date_id", "day_num", "month_num", "month_name", "year_num")
      .as[(Long, Int, Int, String, Int)].collect()
    assert(cal.toSeq == Seq(
      (1L, 31, 12, "dec", 2023),
      (2L, 5, 1, "jan", 2024),
      (3L, 1, 2, "feb", 2024)))
  }

  test("calendar: incremental extension continues ids (S15)") {
    val inc = Seq(ts("2024-03-01 00:00:00")).toDF("fact_date")
    val got = Calendar.attrs(inc, offset = 41L).select("date_id").as[Long].head()
    assert(got == 42L)
  }

  test("d_customer: pinned DISTINCT ON winner + max city within group (A2/H3)") {
    val uol = Seq(
      (7L, "Bob", "Smith", 3), (7L, "Bob", "Smith", 9), // same spelling, 2 cities
      (7L, "Alice", "Smith", 5),                        // earlier (fn,ln) wins
      (8L, "Zed", "Zed", 1))
      .toDF("customer_id", "first_name", "last_name", "city_id")
    val got = Dims.dCustomer(uol).orderBy("id")
      .select("id", "customer_id", "first_name", "city_id")
      .as[(Long, Int, String, Int)].collect()
    assert(got.toSeq == Seq((1L, 7, "Alice", 5), (2L, 8, "Zed", 1)))
  }

  test("d_item: one row per item, winner pinned by item_name (A3)") {
    val uol = Seq((1, "b-name"), (1, "a-name"), (2, "x"))
      .toDF("item_id", "item_name")
    val got = Dims.dItem(uol).orderBy("id")
      .select("id", "item_id", "item_name").as[(Long, Int, String)].collect()
    assert(got.toSeq == Seq((1L, 1, "a-name"), (2L, 2, "x")))
  }

  test("f_sales: calendar join resolves date_id; increment joins temp only") {
    val cal = Calendar.attrs(
      Seq(ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")).toDF("fact_date"))
    val uol = Seq(
      ("a-1", ts("2024-01-01 00:00:00"), 1, 10L, 5, 2L, BigDecimal("1.00")),
      ("a-2", ts("2024-01-02 00:00:00"), 1, 10L, 5, 1L, BigDecimal("2.00")))
      .toDF("uniq_id", "date_time", "city_id", "customer_id", "item_id",
            "quantity", "payment_amount")
    val fs = Sales.fSales(uol, cal).orderBy("id")
      .select("id", "date_id").as[(Long, Long)].collect()
    assert(fs.toSeq == Seq((1L, 1L), (2L, 2L)))

    // increment whose date is NOT a new calendar date is dropped (quirk)
    val calTemp = Calendar.attrs(
      Seq(ts("2024-01-03 00:00:00")).toDF("fact_date"), offset = 2L)
    val uolTemp = Seq(
      ("b-1", ts("2024-01-03 00:00:00"), 1, 10L, 5, 1L, BigDecimal("3.00"), "shipped"),
      ("b-2", ts("2024-01-01 00:00:00"), 1, 10L, 5, 1L, BigDecimal("4.00"), "refunded"))
      .toDF("uniq_id", "date_time", "city_id", "customer_id", "item_id",
            "quantity", "payment_amount", "status")
    val ft = Sales.fSalesTemp(uolTemp, calTemp, offset = 2L)
    val rows = ft.select("id", "date_id", "status").as[(Long, Long, String)].collect()
    assert(rows.toSeq == Seq((3L, 3L, "shipped"))) // b-2 dropped, id continues
  }

  test("SCD2 customer history: intervals close on change, last is current") {
    // customer 1 moves city 5 -> 7 -> 7 -> 9: three intervals; customer 2
    // never moves: one open interval
    val v2 = Seq(
      (1L, ts("2024-01-01 00:00:00"), 5),
      (1L, ts("2024-01-03 00:00:00"), 7),
      (1L, ts("2024-01-05 00:00:00"), 7), // no change -> no new interval
      (1L, ts("2024-01-08 00:00:00"), 9),
      (2L, ts("2024-01-02 00:00:00"), 4))
      .toDF("customer_id", "date_time", "city_id")
    val got = Dims.dCustomerScd(v2)
      .select("customer_id", "city_id", "valid_from", "valid_to", "is_current")
      .as[(Long, Int, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime)).toSeq
    assert(got == Seq(
      (1L, 5, ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")), false),
      (1L, 7, ts("2024-01-03 00:00:00"), Some(ts("2024-01-07 00:00:00")), false),
      (1L, 9, ts("2024-01-08 00:00:00"), None, true),
      (2L, 4, ts("2024-01-02 00:00:00"), None, true)))
  }
}
