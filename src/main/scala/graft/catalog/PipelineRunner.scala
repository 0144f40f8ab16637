package graft.catalog

import graft.etl.Pipeline
import org.apache.spark.sql.SparkSession

/** End-to-end materializing run of the reference DAG (§3): staging feeds →
  * dims → facts → retention marts, each layer persisted to the warehouse
  * exactly where the reference materializes a table. Running it twice is a
  * no-op on the mart contents (reference README.md:20-22 idempotency
  * property — every table is an overwrite of a deterministic input).
  */
object PipelineRunner {

  val stagingTables: Seq[String] = Seq(
    "user_order_log", "user_order_log_temp", "user_order_log_v2",
    "user_activity_log", "user_activity_log_temp",
    "customer_research", "customer_research_temp", "price_log")

  val martTables: Seq[String] = Seq(
    "d_calendar", "d_calendar_temp", "d_customer", "d_item",
    "f_sales", "f_sales_temp", "f_sales_v2", "d_calendar_weeks",
    "new_cust", "new_cust_compact", "returned_cust", "returned_cust_compact",
    "refunded_cust", "refunded_cust_compact",
    "retention_compact", "f_customer_retention",
    // beyond-reference marts (round 4)
    "d_customer_scd", "sales_rolling_7d", "top_items_city",
    "sales_pivot", "sales_rollup")

  def run(spark: SparkSession, sfDir: String, warehouseRoot: String): Warehouse = {
    val wh = new Warehouse(spark, warehouseRoot)
    // The SHARED memoized instance, not a private `new Pipeline`: the
    // Ids.dense plans are RDD-backed, so a second instance's id frames never
    // canonicalize equal to the first's and CacheManager would cache every
    // staging/dim/fact subplan twice — measurable memory pressure when a
    // bench run materializes the warehouse after the query series has
    // already populated the shared instance (the r4 w_* read-back drag).
    val p = Pipeline.of(spark, sfDir)

    import org.apache.spark.sql.functions.{broadcast, col, date_format}
    // month layout column for the big time-keyed tables: one directory per
    // month so the daily-increment merge and time-range scans prune at the
    // file-listing level (Warehouse.read strips it back off)
    def byMonth(df: org.apache.spark.sql.DataFrame) =
      df.withColumn(Warehouse.PartCol,
                    date_format(col("date_time"), "yyyy-MM"))
    // f_sales carries only the date surrogate; recover the month from the
    // calendar dimension (broadcast-sized join, no extra shuffle)
    def byCalMonth(df: org.apache.spark.sql.DataFrame,
                   cal: org.apache.spark.sql.DataFrame) =
      df.join(broadcast(cal.select(col("date_id"),
        date_format(col("fact_date"), "yyyy-MM").as(Warehouse.PartCol))),
        "date_id")
        .select((df.columns :+ Warehouse.PartCol).map(col).toIndexedSeq: _*)

    wh.overwrite("staging", "user_order_log", p.uol)
    wh.overwrite("staging", "user_order_log_temp", p.uolTemp)
    wh.overwritePartitioned("staging", "user_order_log_v2", byMonth(p.uolV2),
                            Warehouse.PartCol)
    wh.overwrite("staging", "user_activity_log", p.ual)
    wh.overwrite("staging", "user_activity_log_temp", p.ualTemp)
    wh.overwrite("staging", "customer_research", p.research)
    wh.overwrite("staging", "customer_research_temp", p.researchTemp)
    wh.overwrite("staging", "price_log", p.priceLog)

    wh.overwrite("mart", "d_calendar", p.dCalendar)
    wh.overwrite("mart", "d_calendar_temp", p.dCalendarTemp)
    wh.overwrite("mart", "d_customer", p.dCustomer)
    wh.overwrite("mart", "d_item", p.dItem)
    wh.overwritePartitioned("mart", "f_sales",
      byCalMonth(p.fSales, p.dCalendar), Warehouse.PartCol)
    wh.overwrite("mart", "f_sales_temp", p.fSalesTemp)
    // f_sales_v2 exercises the incremental path the reference's daily DAG
    // implies: the (partitioned) history base is laid down once, then the
    // day's increment merges in, rewriting ONLY the month partitions the
    // increment touches (mergePartitioned's dynamic overwrite). Contents
    // are identical to the full p.fSalesV2 overwrite — ids are disjoint,
    // so kept ∪ updates = history ∪ increment.
    wh.overwritePartitioned("mart", "f_sales_v2",
      byCalMonth(p.fSales.withColumn("status",
        org.apache.spark.sql.functions.lit("shipped")), p.dCalendar),
      Warehouse.PartCol)
    wh.mergePartitioned("mart", "f_sales_v2",
      byCalMonth(p.fSalesTemp, p.dCalendarTemp), Seq("id"), Warehouse.PartCol)
    wh.overwrite("mart", "d_calendar_weeks", p.weeks)
    wh.overwrite("mart", "new_cust", p.newCust(true))
    wh.overwrite("mart", "new_cust_compact", p.newCust(false))
    wh.overwrite("mart", "returned_cust", p.returnedCust(true))
    wh.overwrite("mart", "returned_cust_compact", p.returnedCust(false))
    wh.overwrite("mart", "refunded_cust", p.refundedCust(true))
    wh.overwrite("mart", "refunded_cust_compact", p.refundedCust(false))
    wh.overwrite("mart", "retention_compact", p.retentionCompact)
    wh.overwrite("mart", "f_customer_retention", p.fCustomerRetention)
    // beyond-reference marts: SCD2 history, rolling revenue, top-k,
    // pivot and rollup — the round-4 analytics layer, materialized in
    // the same overwrite-idempotent style
    wh.overwrite("mart", "d_customer_scd", graft.etl.Dims.dCustomerScd(p.uolV2))
    wh.overwrite("mart", "sales_rolling_7d",
      graft.ops.Analytics.rollingSales7dOf(p.uol))
    wh.overwrite("mart", "top_items_city",
      graft.ops.Analytics.topItemsPerCityOf(p.uol))
    wh.overwrite("mart", "sales_pivot",
      graft.ops.Analytics.salesStatusPivotOf(p.uolV2))
    wh.overwrite("mart", "sales_rollup",
      graft.ops.Analytics.salesRollupOf(p.uol, p.registerCached))
    wh
  }
}
