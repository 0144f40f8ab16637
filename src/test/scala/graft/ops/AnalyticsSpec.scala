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

  test("salesMom: signed ppm growth truncates toward zero; first month null") {
    import org.apache.spark.sql.functions.to_timestamp
    val uol = Seq(
      ("2024-01-05 00:00:00", "100.50"), // m1: rev_i 100
      ("2024-02-05 00:00:00", "50.25"),  // m2: rev_i 50 -> -500000
      ("2024-03-05 00:00:00", "75.00"),  // m3: rev_i 75 -> +500000
      ("2024-04-05 00:00:00", "76.00"))  // m4: rev_i 76 -> 1e6/75 = 13333
      .toDF("dt", "amt")
      .select(to_timestamp($"dt").as("date_time"),
              $"amt".cast("decimal(14,2)").as("payment_amount"))
    val r = Analytics.salesMomOf(uol).orderBy("month")
      .select("rev_i", "prev_rev_i", "growth_ppm")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(r == Seq(
      (100L, None, None),
      (50L, Some(100L), Some(-500000L)),
      (75L, Some(50L), Some(500000L)),
      (76L, Some(75L), Some(13333L))))
  }
}
