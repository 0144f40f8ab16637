package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private lazy val uolFixture = Seq(
    (ts("2020-01-01"), 1, 10, new java.math.BigDecimal("10.00"), 1L),
    (ts("2020-01-02"), 1, 10, new java.math.BigDecimal("5.00"), 2L),
    (ts("2020-02-01"), 1, 20, new java.math.BigDecimal("7.00"), 1L),
    (ts("2021-01-01"), 2, 10, new java.math.BigDecimal("3.00"), 4L))
    .toDF("date_time", "city_id", "item_id", "payment_amount", "quantity")
    .withColumn("payment_amount", col("payment_amount").cast(DecimalType(14, 2)))

  test("hierarchical rollup equals Catalyst's rollup operator") {
    // on a clean frame the native rollup analyzes fine — use it as the
    // reference implementation for the re-aggregated form
    val native = uolFixture
      .select(year(col("date_time")).as("year_num"),
              month(col("date_time")).as("month_num"),
              col("payment_amount"), col("quantity"))
      .rollup("year_num", "month_num")
      .agg(sum(col("payment_amount")).cast("double").as("revenue"),
           sum(col("quantity")).as("qty"),
           count(lit(1)).as("n_rows"),
           grouping_id().as("gid"))
      .select(col("year_num"), col("month_num"), col("revenue"), col("qty"),
              col("n_rows"), expr("CAST(gid DIV 2 AS BIGINT)").as("g_year"),
              expr("CAST(gid % 2 AS BIGINT)").as("g_month"))
      .as[(Option[Int], Option[Int], Double, Long, Long, Long, Long)]
      .collect().sortBy(_.toString).toSeq
    val ours = Analytics.salesRollupOf(uolFixture)
      .withColumn("revenue", col("revenue").cast("double"))
      .select("year_num", "month_num", "revenue", "qty", "n_rows",
              "g_year", "g_month")
      .as[(Option[Int], Option[Int], Double, Long, Long, Long, Long)]
      .collect().sortBy(_.toString).toSeq
    assert(ours == native && ours.length == 6) // 3 (y,m) + 2 y + 1 total
  }

  test("status pivot: absent (month, status) combos are NULL") {
    val v2 = uolFixture.withColumn("status",
      when(col("date_time") === ts("2020-02-01"), "refunded")
        .otherwise("shipped"))
    val m = Analytics.salesStatusPivotOf(v2)
      .select(col("month"), col("shipped_qty"), col("refunded_qty"))
      .as[(java.sql.Timestamp, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(ts("2020-01-01")) == ((Some(3L), None)))
    assert(m(ts("2020-02-01")) == ((None, Some(1L))))
    assert(m(ts("2021-01-01")) == ((Some(4L), None)))
  }

  test("top items per city: rank order and tiebreak") {
    val top = Analytics.topItemsPerCityOf(uolFixture, k = 1)
      .select("city_id", "item_id", "rnk")
      .as[(Int, Int, Long)].collect().sorted.toSeq
    // city 1: item 10 revenue 15.00 beats item 20 at 7.00
    assert(top == Seq((1, 10, 1L), (2, 10, 1L)))
  }
}
