package graft.etl

import graft.Ids
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `mart.f_sales` / `mart.f_sales_v2` — the sales fact.
  *
  * Reference: /root/reference/src/dags/sql/update_mart_f_table.sql:4-12 (full
  * load: J1 join to d_calendar for the date surrogate, then f_sales_v2 CTAS +
  * ALTER ADD status) and load_inc_f_table.sql:2-10 (increment joined to
  * d_calendar_TEMP only — faithful quirk: increment rows whose date is not a
  * *new* calendar date are dropped by the inner join; UPDATE SET
  * status='shipped' backfill; INSERT append).
  *
  * Scale: d_calendar grows with DISTINCT EVENT TIMESTAMPS (second grain,
  * faithful to the reference), so a forced broadcast would eventually ship
  * a multi-GB build side to every executor. The join is left un-hinted: AQE
  * broadcasts while the calendar is under the threshold and falls back to a
  * shuffle join beyond it — measured 18.7× → near-linear on the 8× probe.
  * Fact ids via Ids.dense (two-phase, no global window), pinned to
  * (date_time, uniq_id) order; the increment continues from
  * offset = |f_sales| like the live PG sequence (SURVEY §2.1 S15).
  */
object Sales {

  private val outCols =
    Seq("id", "date_id", "item_id", "customer_id", "city_id", "quantity",
        "payment_amount")

  /** J1 + surrogate ids → f_sales. */
  def fSales(uol: DataFrame, dCalendar: DataFrame): DataFrame = {
    val dc = dCalendar.select(col("date_id"), col("fact_date"))
    val joined = uol.join(dc, uol("date_time") === dc("fact_date"), "inner")
      .select(col("date_time"), col("uniq_id"), col("date_id"), col("item_id"),
              col("customer_id"), col("city_id"), col("quantity"),
              col("payment_amount"))
    Ids.dense(joined, Seq("date_time", "uniq_id"), "id")
      .select(outCols.head, outCols.tail: _*)
  }

  /** Increment fact: join to the calendar *temp* only (reference quirk),
    * keep status, continue ids from `offset`. */
  def fSalesTemp(uolTemp: DataFrame, dCalendarTemp: DataFrame,
                 offset: Long): DataFrame = {
    val dc = dCalendarTemp.select(col("date_id"), col("fact_date"))
    val joined = uolTemp.join(dc, uolTemp("date_time") === dc("fact_date"), "inner")
      .select(col("date_time"), col("uniq_id"), col("date_id"), col("item_id"),
              col("customer_id"), col("city_id"), col("quantity"),
              col("payment_amount"), col("status"))
    Ids.dense(joined, Seq("date_time", "uniq_id"), "id", offset)
      .select(outCols.head, (outCols.tail :+ "status"): _*)
  }

  /** f_sales_v2 = f_sales backfilled with status='shipped' + increment
    * (rewrite-on-write instead of in-place UPDATE; SURVEY §7.4 H2). */
  def fSalesV2(fSales: DataFrame, fSalesTemp: DataFrame): DataFrame =
    fSales.withColumn("status", lit("shipped")).unionByName(fSalesTemp)
}
